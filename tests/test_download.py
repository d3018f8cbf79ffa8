"""HF download + cache resolution (common/download.cpp analogue) — all
network traffic mocked through the injectable fetch hook."""
import json
import os

import pytest

from tpullm.utils import download as dl


REPO = "test-org/test-model"
COMMIT = "c0ffee"


def _tree_entry(path, size=1000, oid=None):
    oid = oid or ("sha-" + path.replace("/", "_"))
    return {"type": "file", "path": path, "size": size,
            "lfs": {"oid": oid, "size": size}}


class FakeHub:
    """In-memory HF endpoint: refs + tree APIs and resolve/ blobs."""

    def __init__(self, files, commit=COMMIT):
        self.files = files  # {repo-path: bytes}
        self.commit = commit
        self.calls = []

    def fetch(self, url, headers, dest_path=None, progress=None):
        self.calls.append(url)
        ep = dl.endpoint()
        assert url.startswith(ep)
        rel = url[len(ep):]
        if rel == f"api/models/{REPO}/refs":
            body = json.dumps({"branches": [
                {"name": "main", "targetCommit": self.commit}]}).encode()
            return 200, {}, body
        if rel == f"api/models/{REPO}/tree/{self.commit}?recursive=true":
            body = json.dumps([_tree_entry(p, len(b))
                               for p, b in self.files.items()]).encode()
            return 200, {}, body
        pre = f"{REPO}/resolve/{self.commit}/"
        if rel.startswith(pre):
            path = rel[len(pre):]
            if path not in self.files:
                return 404, {}, b""
            if dest_path:
                with open(dest_path, "wb") as f:
                    f.write(self.files[path])
                return 200, {}, b""
            return 200, {}, self.files[path]
        return 404, {}, b""


@pytest.fixture
def hub(tmp_path, monkeypatch):
    monkeypatch.setenv("TPULLM_CACHE", str(tmp_path / "hub"))
    monkeypatch.setenv("TPULLM_URL_CACHE", str(tmp_path / "url"))
    files = {
        "README.md": b"# hi",
        "model-Q4_K_M.gguf": b"GGUFq4km",
        "model-Q8_0.gguf": b"GGUFq80",
        "model-F16-00001-of-00002.gguf": b"GGUFf16a",
        "model-F16-00002-of-00002.gguf": b"GGUFf16b",
        "mmproj-model-F16.gguf": b"GGUFmmproj",
    }
    fake = FakeHub(files)
    monkeypatch.setattr(dl, "fetch", fake.fetch)
    return fake


def test_split_repo_tag():
    assert dl.split_repo_tag("org/repo:F16") == ("org/repo", "F16")
    assert dl.split_repo_tag("org/repo") == ("org/repo", "")


def test_gguf_split_info():
    si = dl.gguf_split_info("m-Q4_K_M-00002-of-00003.gguf")
    assert (si.index, si.count, si.tag) == (2, 3, "Q4_K_M")
    si = dl.gguf_split_info("m-IQ2_XS.gguf")
    assert (si.index, si.count, si.tag) == (1, 1, "IQ2_XS")
    assert dl.gguf_split_info("notgguf.bin").count == 0
    assert dl.extract_quant_bits("m-Q4_K_M.gguf") == 4
    assert dl.extract_quant_bits("m-F16.gguf") == 16


def test_default_tag_prefers_q4km(hub):
    res = dl.download_model(REPO)
    assert res.model_path.endswith("model-Q4_K_M.gguf")
    assert os.path.exists(res.model_path)
    with open(res.model_path, "rb") as f:
        assert f.read() == b"GGUFq4km"
    # hub cache layout: blobs + snapshots/<commit>
    assert f"snapshots/{COMMIT}" in res.model_path


def test_explicit_tag_and_file(hub):
    res = dl.download_model(REPO + ":Q8_0")
    assert res.model_path.endswith("model-Q8_0.gguf")
    res = dl.download_model(REPO, hf_file="model-Q8_0.gguf")
    assert res.model_path.endswith("model-Q8_0.gguf")
    with pytest.raises(dl.DownloadError):
        dl.download_model(REPO + ":IQ9")


def test_split_gguf_fetches_all_parts(hub):
    res = dl.download_model(REPO + ":F16")
    assert res.model_path.endswith("00001-of-00002.gguf")
    assert len(res.extra_paths) == 1
    assert res.extra_paths[0].endswith("00002-of-00002.gguf")
    assert all(os.path.exists(p) for p in [res.model_path] + res.extra_paths)


def test_mmproj_discovery(hub):
    res = dl.download_model(REPO + ":F16", want_mmproj=True)
    assert res.mmproj_path.endswith("mmproj-model-F16.gguf")


def test_offline_uses_cache(hub):
    dl.download_model(REPO)  # populate cache
    n = len(hub.calls)
    res = dl.download_model(REPO, offline=True)
    assert res.model_path.endswith("model-Q4_K_M.gguf")
    assert len(hub.calls) == n  # zero network in offline mode


def test_offline_cold_cache_raises(hub):
    with pytest.raises(dl.DownloadError):
        dl.download_model(REPO, offline=True)


def test_second_online_run_skips_blob_download(hub):
    dl.download_model(REPO)
    blob_fetches = [c for c in hub.calls if "/resolve/" in c]
    dl.download_model(REPO)
    blob_fetches2 = [c for c in hub.calls if "/resolve/" in c]
    assert len(blob_fetches2) == len(blob_fetches)  # snapshot hit, API only


def test_list_cached_models(hub):
    dl.download_model(REPO)
    dl.download_model(REPO + ":F16")
    cached = dl.list_cached_models()
    assert (REPO, "Q4_K_M") in cached
    assert (REPO, "F16") in cached
    # split part 2 must not add a duplicate row
    assert len([c for c in cached if c[1] == "F16"]) == 1


def test_url_download_with_etag(tmp_path, monkeypatch):
    monkeypatch.setenv("TPULLM_URL_CACHE", str(tmp_path / "url"))
    calls = []

    def fake(url, headers, dest_path=None, progress=None):
        calls.append(dict(headers))
        if headers.get("If-None-Match") == 'W/"abc"':
            return 304, {}, b""
        if dest_path:
            with open(dest_path, "wb") as f:
                f.write(b"MODELBYTES")
        return 200, {"etag": 'W/"abc"'}, b""

    monkeypatch.setattr(dl, "fetch", fake)
    p1 = dl.download_url("https://example.com/m.gguf")
    assert open(p1, "rb").read() == b"MODELBYTES"
    p2 = dl.download_url("https://example.com/m.gguf")
    assert p2 == p1
    assert calls[1].get("If-None-Match") == 'W/"abc"'
    # offline: no network at all
    monkeypatch.setattr(dl, "fetch", None)
    assert dl.download_url("https://example.com/m.gguf", offline=True) == p1


def test_resolve_model_arg_shorthand(hub, tmp_path):
    # a bare -m that looks like org/repo:TAG resolves through HF
    res = dl.resolve_model_arg("test-org/test-model:Q8_0")
    assert res.model_path.endswith("model-Q8_0.gguf")
    # a real path passes through untouched
    p = tmp_path / "local.gguf"
    p.write_bytes(b"x")
    assert dl.resolve_model_arg(str(p)).model_path == str(p)


def test_find_best_mmproj_dir_walk():
    files = [dl.HfFile(path="sub/model-Q4_0.gguf"),
             dl.HfFile(path="sub/mmproj-F16.gguf"),
             dl.HfFile(path="mmproj-Q8_0.gguf")]
    best = dl.find_best_mmproj(files, "sub/model-Q4_0.gguf")
    assert best.path == "sub/mmproj-F16.gguf"  # same dir wins over parent
    best = dl.find_best_mmproj(files, "model-Q4_0.gguf")
    assert best.path == "mmproj-Q8_0.gguf"  # root model: root mmproj only
