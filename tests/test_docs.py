"""Docs freshness guard: docs/ops.md's generated table must match the code
(scripts/gen_ops_md.py --check). Fails the suite on docs rot — the
round-3/4 verdict item where the support matrix contradicted the code."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ops_md_fresh():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "gen_ops_md.py"),
         "--check"], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
