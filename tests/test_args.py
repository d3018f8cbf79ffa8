"""Unified CLI/env/preset arg layer (common/arg.cpp + preset.cpp analogue)."""
import json
import os

import pytest

from tpullm.utils.args import ArgLayer


def _layer():
    ap = ArgLayer("t")
    ap.add("-c", "--ctx-size", type=int, default=2048)
    ap.add("--name", default="x")
    ap.add("--flag", action="store_true", default=False)
    ap.add("-m", "--model", required=True)
    return ap


def test_cli_over_env_over_preset(tmp_path, monkeypatch):
    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({"ctx_size": 512, "name": "pre"}))
    monkeypatch.setenv("TPULLM_CTX_SIZE", "1024")
    args = _layer().parse(["-m", "m.gguf", "--preset", str(preset)])
    assert args.ctx_size == 1024  # env beats preset
    assert args.name == "pre"     # preset beats default
    args = _layer().parse(["-m", "m.gguf", "-c", "333",
                           "--preset", str(preset)])
    assert args.ctx_size == 333   # CLI beats env


def test_env_bool_and_required(monkeypatch):
    monkeypatch.setenv("TPULLM_FLAG", "1")
    monkeypatch.setenv("TPULLM_MODEL", "env.gguf")
    args = _layer().parse([])
    assert args.flag is True and args.model == "env.gguf"
    assert args.ctx_size == 2048  # default


def test_required_missing_errors():
    with pytest.raises(SystemExit):
        _layer().parse([])


def test_unknown_preset_key(tmp_path):
    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({"nope": 1}))
    with pytest.raises(SystemExit):
        _layer().parse(["-m", "m.gguf", "--preset", str(preset)])
