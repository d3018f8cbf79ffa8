"""Model download + HuggingFace cache (-hf / --model-url resolution).

Python-native analogue of the reference's common/download.cpp +
common/hf-cache.cpp: resolves `-hf org/repo[:TAG]` (optionally with a
specific --hf-file) or a raw `--model-url` to local GGUF path(s), with

- the HuggingFace hub cache layout (hub/models--org--repo/{refs,blobs,
  snapshots/<commit>/...}) so caches are shared with huggingface_hub and
  the reference engine (ref: common/hf-cache.cpp:234-360),
- tag -> quant file matching (exact tag, else Q4_K_M then Q8_0, else the
  first model GGUF; mmproj/imatrix files are never "the model"
  — common/download.cpp find_best_model),
- multi-part split GGUF detection (-00001-of-00003) downloading every part
  (common/download.cpp get_split_files),
- closest-quant mmproj discovery in the model's directory or any parent
  (common/download.cpp find_best_mmproj),
- ETag-keyed caching for raw URLs (common/download.cpp read_etag/write_etag),
- full offline mode (cache hits only, zero network).

Network access goes through one injectable `fetch(url, headers) ->
(status, headers, body_bytes | stream)` hook so every path is testable
without egress; the default implementation uses urllib.
"""
from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from dataclasses import dataclass, field

from .log import get_logger

log = get_logger("download")

DEFAULT_ENDPOINT = "https://huggingface.co/"


def cache_dir() -> str:
    """Root of the hub cache (TPULLM_CACHE > HF_HUB_CACHE > default)."""
    for env in ("TPULLM_CACHE", "HF_HUB_CACHE"):
        v = os.environ.get(env)
        if v:
            return v
    hf_home = os.environ.get("HF_HOME")
    if hf_home:
        return os.path.join(hf_home, "hub")
    return os.path.expanduser("~/.cache/huggingface/hub")


def url_cache_dir() -> str:
    """Where raw --model-url downloads land (etag-keyed flat files)."""
    return os.environ.get("TPULLM_URL_CACHE",
                          os.path.join(cache_dir(), "..", "tpullm"))


def endpoint() -> str:
    ep = os.environ.get("HF_ENDPOINT", DEFAULT_ENDPOINT)
    return ep if ep.endswith("/") else ep + "/"


def split_repo_tag(repo_with_tag: str) -> tuple[str, str]:
    """"ggml-org/models:F16" -> ("ggml-org/models", "F16"). The tag is
    optional; a lone trailing ':' yields an empty tag."""
    if ":" in repo_with_tag:
        repo, _, tag = repo_with_tag.rpartition(":")
        return repo, tag
    return repo_with_tag, ""


# ---------------------------------------------------------------------------
# filename classification (split parts, quant tags)

_RE_SPLIT = re.compile(r"^(.+)-(\d{5})-of-(\d{5})$", re.I)
_RE_TAG = re.compile(r"[-.]([A-Z0-9_]+)$", re.I)


@dataclass
class SplitInfo:
    prefix: str = ""
    tag: str = ""
    index: int = 0
    count: int = 0


def gguf_split_info(path: str) -> SplitInfo:
    """Parse "m-Q4_K_M-00002-of-00003.gguf" -> (prefix, tag, index, count).

    Matches the reference's get_gguf_split_info (common/download.cpp:509):
    non-.gguf paths return an empty info; single files get index=count=1."""
    prefix = path
    if not prefix.lower().endswith(".gguf"):
        return SplitInfo()
    prefix = prefix[: -len(".gguf")]
    index = count = 1
    m = _RE_SPLIT.match(prefix)
    if m:
        prefix, index, count = m.group(1), int(m.group(2)), int(m.group(3))
    tag = ""
    mt = _RE_TAG.search(prefix)
    if mt:
        tag = mt.group(1).upper()
    return SplitInfo(prefix, tag, index, count)


def extract_quant_bits(filename: str) -> int:
    """Q4_0 -> 4, F16 -> 16, Q8_K_M -> 8, no-digit tags -> 0."""
    tag = gguf_split_info(filename).tag
    m = re.search(r"\d+", tag)
    return int(m.group(0)) if m else 0


def _is_model_gguf(path: str) -> bool:
    name = path.rsplit("/", 1)[-1]
    return (path.lower().endswith(".gguf")
            and "mmproj" not in name and "imatrix" not in name)


# ---------------------------------------------------------------------------
# fetch layer

class DownloadError(RuntimeError):
    pass


def _default_fetch(url: str, headers: dict[str, str],
                   dest_path: str | None = None,
                   progress=None) -> tuple[int, dict, bytes]:
    """GET `url`. Small responses return the body; with dest_path the body
    streams to that file (returned body is b"")."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            hdrs = {k.lower(): v for k, v in r.headers.items()}
            if dest_path is None:
                return r.status, hdrs, r.read()
            total = int(hdrs.get("content-length", 0) or 0)
            done = 0
            with open(dest_path, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
                    done += len(chunk)
                    if progress:
                        progress(done, total)
            return r.status, hdrs, b""
    except urllib.error.HTTPError as e:  # pragma: no cover - network
        return e.code, {k.lower(): v for k, v in e.headers.items()}, b""
    except urllib.error.URLError as e:  # pragma: no cover - network
        raise DownloadError(f"cannot reach {url}: {e.reason}") from e


# module-level injection point (tests swap this out)
fetch = _default_fetch


def _auth_headers(token: str | None) -> dict[str, str]:
    h = {"User-Agent": "tpullm/1.0"}
    tok = token or os.environ.get("HF_TOKEN", "")
    if tok:
        h["Authorization"] = f"Bearer {tok}"
    return h


# ---------------------------------------------------------------------------
# HF hub cache (layout shared with huggingface_hub; hf-cache.cpp analogue)

@dataclass
class HfFile:
    path: str  # repo-relative path
    url: str = ""
    oid: str = ""  # blob hash (sha or git oid)
    size: int = 0
    local_path: str = ""  # blob path (may not exist yet)
    final_path: str = ""  # snapshot path (exists if cached)
    repo_id: str = ""


def _repo_path(repo_id: str) -> str:
    return os.path.join(cache_dir(), "models--" + repo_id.replace("/", "--"))


def _safe_name(name: str) -> bool:
    parts = name.replace("\\", "/").split("/")
    return all(p not in ("", ".", "..") for p in parts)


def _api_json(url: str, token: str | None):
    status, _, body = fetch(url, _auth_headers(token))
    if status == 401:
        raise DownloadError(f"401 unauthorized for {url} (set HF_TOKEN)")
    if status == 404:
        raise DownloadError(f"404 not found: {url}")
    if status != 200:
        raise DownloadError(f"HTTP {status} for {url}")
    return json.loads(body.decode())


def get_repo_files(repo_id: str, token: str | None = None,
                   revision: str = "main") -> list[HfFile]:
    """Resolve the repo's current commit + full file tree from the HF API,
    persisting refs/ so later offline runs resolve the same snapshot
    (hf-cache.cpp get_repo_files)."""
    if not _safe_name(repo_id) or repo_id.count("/") != 1:
        raise DownloadError(f"invalid repo id: {repo_id}")
    ep = endpoint()
    refs = _api_json(ep + f"api/models/{repo_id}/refs", token)
    commit = ""
    for b in refs.get("branches", []):
        name = b.get("name", "")
        if _safe_name(name):
            if name == revision:
                commit = b.get("targetCommit", "")
            rp = os.path.join(_repo_path(repo_id), "refs")
            os.makedirs(rp, exist_ok=True)
            _write_atomic(os.path.join(rp, name), b.get("targetCommit", ""))
    if not commit:
        raise DownloadError(f"no '{revision}' branch in {repo_id}")

    tree = _api_json(ep + f"api/models/{repo_id}/tree/{commit}?recursive=true",
                     token)
    files: list[HfFile] = []
    blobs = os.path.join(_repo_path(repo_id), "blobs")
    snap = os.path.join(_repo_path(repo_id), "snapshots", commit)
    for item in tree:
        if item.get("type") != "file":
            continue
        path = item.get("path", "")
        if not _safe_name(path):
            continue
        lfs = item.get("lfs") or {}
        oid = lfs.get("oid") or item.get("oid", "")
        f = HfFile(
            path=path,
            url=ep + f"{repo_id}/resolve/{commit}/{path}",
            oid=oid,
            size=int(lfs.get("size") or item.get("size") or 0),
            local_path=os.path.join(blobs, oid) if oid else "",
            repo_id=repo_id,
        )
        fin = os.path.join(snap, path)
        if os.path.exists(fin):
            f.final_path = fin
        files.append(f)
    return files


def get_cached_files(repo_id: str = "") -> list[HfFile]:
    """Enumerate snapshot files already in the cache (offline path). With a
    repo_id, only that repo's newest snapshot; else every cached repo."""
    out: list[HfFile] = []
    root = cache_dir()
    if not os.path.isdir(root):
        return out
    if repo_id:
        dirs = [_repo_path(repo_id)]
    else:
        dirs = [os.path.join(root, d) for d in sorted(os.listdir(root))
                if d.startswith("models--")]
    for rd in dirs:
        rid = (repo_id or
               os.path.basename(rd)[len("models--"):].replace("--", "/", 1))
        snaps = os.path.join(rd, "snapshots")
        if not os.path.isdir(snaps):
            continue
        commit = _ref_commit(rd) or _newest_dir(snaps)
        base = os.path.join(snaps, commit) if commit else ""
        if not base or not os.path.isdir(base):
            continue
        for dirpath, _, names in os.walk(base):
            for n in names:
                full = os.path.join(dirpath, n)
                rel = os.path.relpath(full, base)
                out.append(HfFile(path=rel.replace(os.sep, "/"),
                                  final_path=full, repo_id=rid,
                                  size=_size_of(full)))
    return out


def _size_of(p: str) -> int:
    try:
        return os.path.getsize(p)
    except OSError:
        return 0


def _ref_commit(repo_dir: str, revision: str = "main") -> str:
    p = os.path.join(repo_dir, "refs", revision)
    try:
        with open(p) as f:
            return f.read().strip()
    except OSError:
        return ""


def _newest_dir(path: str) -> str:
    try:
        entries = [(os.path.getmtime(os.path.join(path, d)), d)
                   for d in os.listdir(path)]
    except OSError:
        return ""
    return max(entries)[1] if entries else ""


def _write_atomic(path: str, text: str):
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def finalize_file(f: HfFile) -> str:
    """Blob -> snapshot path (hard link, falling back to copy), returning
    the snapshot path (hf-cache.cpp finalize_file)."""
    if f.final_path and os.path.exists(f.final_path):
        return f.final_path
    commit_dir = os.path.dirname(f.local_path).replace(
        os.sep + "blobs", os.sep + "snapshots")
    # local_path = <repo>/blobs/<oid>; snapshot needs the commit
    repo_dir = os.path.dirname(os.path.dirname(f.local_path))
    commit = _ref_commit(repo_dir)
    if not commit:
        commit = _newest_dir(os.path.join(repo_dir, "snapshots"))
    final = os.path.join(repo_dir, "snapshots", commit, f.path)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    if not os.path.exists(final):
        try:
            os.link(f.local_path, final)
        except OSError:
            shutil.copy2(f.local_path, final)
    f.final_path = final
    del commit_dir
    return final


def _download_blob(f: HfFile, token: str | None, progress=None) -> str:
    """Fetch one repo file into blobs/<oid> then hard-link the snapshot."""
    if f.final_path and os.path.exists(f.final_path):
        return f.final_path
    if not f.local_path:
        raise DownloadError(f"no blob oid for {f.path}")
    os.makedirs(os.path.dirname(f.local_path), exist_ok=True)
    if not os.path.exists(f.local_path):
        tmp = f.local_path + ".downloadInProgress"
        log.info("downloading %s (%.1f MB)", f.path, f.size / 1e6)
        status, _, _ = fetch(f.url, _auth_headers(token), dest_path=tmp,
                             progress=progress)
        if status != 200:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise DownloadError(f"HTTP {status} downloading {f.url}")
        os.replace(tmp, f.local_path)
    return finalize_file(f)


# ---------------------------------------------------------------------------
# model / mmproj selection (download.cpp find_best_model / find_best_mmproj)

def find_best_model(files: list[HfFile], tag: str) -> HfFile | None:
    tags = [tag] if tag else ["Q4_K_M", "Q8_0"]
    for t in tags:
        pat = re.compile(re.escape(t) + r"[.-]", re.I)
        for f in files:
            if _is_model_gguf(f.path) and pat.search(f.path):
                si = gguf_split_info(f.path)
                if si.count > 1 and si.index != 1:
                    continue
                return f
    if not tag:
        for f in files:
            if _is_model_gguf(f.path):
                si = gguf_split_info(f.path)
                if si.count > 1 and si.index != 1:
                    continue
                return f
    return None


def get_split_files(files: list[HfFile], first: HfFile) -> list[HfFile]:
    si = gguf_split_info(first.path)
    if si.count <= 1:
        return [first]
    parts = [f for f in files
             if (gguf_split_info(f.path).count == si.count
                 and gguf_split_info(f.path).prefix == si.prefix)]
    parts.sort(key=lambda f: gguf_split_info(f.path).index)
    if len(parts) != si.count:
        raise DownloadError(
            f"split GGUF {si.prefix}: found {len(parts)}/{si.count} parts")
    return parts


def find_best_mmproj(files: list[HfFile], model_path: str) -> HfFile | None:
    """mmproj in the model's directory or the deepest shared parent,
    preferring the closest quantization bit-width."""
    best = None
    best_depth = -1
    best_diff = 1 << 30
    model_bits = extract_quant_bits(model_path)
    mparts = model_path.split("/")[:-1]
    for f in files:
        name = f.path.rsplit("/", 1)[-1]
        if not f.path.lower().endswith(".gguf") or "mmproj" not in name:
            continue
        fparts = f.path.split("/")[:-1]
        depth = 0
        while (depth < len(mparts) and depth < len(fparts)
               and mparts[depth] == fparts[depth]):
            depth += 1
        if depth < len(fparts):  # mmproj must sit ON the model's dir chain
            continue
        diff = abs(extract_quant_bits(f.path) - model_bits)
        if depth > best_depth or (depth == best_depth and diff < best_diff):
            best, best_depth, best_diff = f, depth, diff
    return best


# ---------------------------------------------------------------------------
# public entry points

@dataclass
class ModelResolution:
    model_path: str = ""
    mmproj_path: str = ""
    extra_paths: list[str] = field(default_factory=list)  # split parts 2..n


def download_model(hf_repo: str = "", hf_file: str = "", url: str = "",
                   token: str | None = None, offline: bool = False,
                   want_mmproj: bool = False,
                   progress=None) -> ModelResolution:
    """Resolve -hf/-mu to local path(s), downloading through the cache.

    Mirrors common_download_model (common/download.cpp): hf_repo (with
    optional :TAG) selects a GGUF by tag; hf_file pins an exact repo path;
    plain `url` uses etag caching. Split GGUFs fetch all parts."""
    res = ModelResolution()
    if url and not hf_repo:
        res.model_path = download_url(url, offline=offline, token=token,
                                      progress=progress)
        return res
    if not hf_repo:
        raise DownloadError("download_model: need hf_repo or url")
    repo, tag = split_repo_tag(hf_repo)
    files: list[HfFile] = []
    if not offline:
        try:
            files = get_repo_files(repo, token)
        except DownloadError as e:
            log.warning("HF API unreachable (%s); trying cache", e)
    if not files:
        files = get_cached_files(repo)
    if not files:
        raise DownloadError(
            f"{repo}: no files (offline={offline}, cache empty)")

    if hf_file:
        primary = next((f for f in files if f.path == hf_file), None)
        if primary is None:
            raise DownloadError(f"{repo}: file not found: {hf_file}")
    else:
        primary = find_best_model(files, tag)
        if primary is None:
            avail = [f.path for f in files if f.path.lower().endswith(".gguf")]
            raise DownloadError(
                f"{repo}: no GGUF matches tag '{tag}'; available: {avail}")

    parts = get_split_files(files, primary)
    paths = [_materialize(f, token, offline, progress) for f in parts]
    res.model_path, res.extra_paths = paths[0], paths[1:]

    if want_mmproj:
        mp = find_best_mmproj(files, primary.path)
        if mp is not None:
            res.mmproj_path = _materialize(mp, token, offline, progress)
    return res


def _materialize(f: HfFile, token, offline, progress=None) -> str:
    if f.final_path and os.path.exists(f.final_path):
        return f.final_path
    if offline:
        raise DownloadError(f"offline: {f.path} not in cache")
    return _download_blob(f, token, progress)


def download_url(url: str, offline: bool = False, token: str | None = None,
                 progress=None) -> str:
    """Raw URL download with ETag-keyed reuse (download.cpp
    common_download_file_single): a cached file is reused when the server
    reports the same ETag (or the fetch fails and the file exists)."""
    name = re.sub(r"[^A-Za-z0-9._-]", "_", url.split("://", 1)[-1])[-120:]
    os.makedirs(url_cache_dir(), exist_ok=True)
    path = os.path.join(url_cache_dir(), name)
    etag_path = path + ".etag"
    if offline:
        if os.path.exists(path):
            return path
        raise DownloadError(f"offline: {url} not cached")
    last = ""
    if os.path.exists(etag_path):
        with open(etag_path) as f:
            last = f.read().strip()
    headers = _auth_headers(token)
    if os.path.exists(path) and last:
        headers["If-None-Match"] = last
    tmp = path + ".downloadInProgress"
    status, hdrs, _ = fetch(url, headers, dest_path=tmp, progress=progress)
    if status == 304 and os.path.exists(path):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return path
    if status != 200:
        try:
            os.remove(tmp)
        except OSError:
            pass
        if os.path.exists(path):
            log.warning("HTTP %s for %s; using cached copy", status, url)
            return path
        raise DownloadError(f"HTTP {status} downloading {url}")
    os.replace(tmp, path)
    etag = hdrs.get("etag", "")
    if etag:
        _write_atomic(etag_path, etag)
    return path


def list_cached_models() -> list[tuple[str, str]]:
    """[(repo, TAG)] for every distinct first-part model GGUF in the cache
    (common_list_cached_models)."""
    seen = set()
    out = []
    for f in get_cached_files():
        si = gguf_split_info(f.path)
        if si.index != 1 or not si.tag or "mmproj" in si.prefix:
            continue
        key = (f.repo_id, si.tag)
        if key not in seen:
            seen.add(key)
            out.append(key)
    return out


def resolve_model_arg(model: str | None, hf_repo: str | None = None,
                      hf_file: str | None = None, url: str | None = None,
                      offline: bool | None = None,
                      want_mmproj: bool = False) -> ModelResolution:
    """Single entry for tools: -m beats -hf beats -mu. A bare -m that looks
    like org/repo[:TAG] (no existing file) is treated as -hf, matching the
    reference CLI's convenience behavior."""
    if offline is None:
        offline = os.environ.get("TPULLM_OFFLINE", "") not in ("", "0")
    if model and not os.path.exists(model) and re.match(
            r"^[\w.-]+/[\w.-]+(:[\w.-]+)?$", model):
        hf_repo, model = model, None
    if model:
        return ModelResolution(model_path=model)
    if hf_repo or url:
        return download_model(hf_repo or "", hf_file or "", url or "",
                              offline=offline, want_mmproj=want_mmproj)
    raise DownloadError("no model specified (-m, -hf, or --model-url)")
