"""bench.py driver contract: run the headline benchmark at the tiny
scale factor in a subprocess and assert it emits EXACTLY ONE parseable
JSON line with the required fields — the interface the grading driver
consumes (a stray print or a schema drift breaks the round record)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_with_contract_fields():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_PASSES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
        check=True,
    )
    json_lines = [
        l for l in out.stdout.splitlines() if l.startswith("{") and l.endswith("}")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    rec = json.loads(json_lines[0])
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in rec, field
    assert rec["unit"] == "sec" and rec["value"] > 0
    assert isinstance(rec["queries"], dict) and len(rec["queries"]) >= 10
    assert all(v >= 0 for v in rec["queries"].values())
