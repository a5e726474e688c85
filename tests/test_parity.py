"""Cross-parallelism parity (SURVEY §5d): the same budgeted multi-seed
crawl at local[2] and local[8] must produce byte-identical results —
including admission ranks — proven via separate driver processes."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_local2_vs_local8_identical():
    out = {}
    for master in ("local[2]", "local[8]"):
        p = subprocess.run(
            [sys.executable, "/root/repo/tools/parity_check.py", master, "600"],
            capture_output=True, text=True, timeout=600,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("parity ")][-1]
        out[master] = line
    assert out["local[2]"] == out["local[8]"]
