"""The driver contract on bench.py, end-to-end: run the real script
at the smallest SF and assert the properties the driver's tail-capture
parser depends on — the round-1/2 regression (unparseable bench line)
must never come back."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


def test_bench_emits_one_short_final_json_line(tmp_path):
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("no testdata")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_OUT=str(tmp_path),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    # the JSON line is the LAST stdout line (nothing may trail it)
    line = lines[-1]
    assert len(line) < 2200, f"bench line too long ({len(line)} bytes)"
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec"
    assert isinstance(rec["value"], (int, float)) and rec["value"] >= 0
    # "value" LAST so even a head-truncated capture keeps it
    assert line.rstrip("}").rsplit(",", 1)[-1].startswith('"value":')
    assert rec["n_errors"] == 0, rec
    # detail file landed in the overridden dir (NOT the repo artifact)
    detail = json.load(open(tmp_path / "BENCH_EXTENDED.json"))
    assert set(rec["queries"]) == set(detail["queries"])
    assert detail["value"] >= 0
