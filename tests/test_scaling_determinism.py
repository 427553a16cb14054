"""M4: identical outputs at different parallelism levels (SURVEY.md §7
"What's hard" #1 — the scaling-gate prerequisite). Runs the real CLI
(`python -m smart_pdf_md_spark.run`) in subprocesses so each parallelism
level gets its own JVM."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 150


def _run(master: str, tmp, tag: str) -> dict:
    run_dir = str(tmp / f"run_{tag}")
    out = str(tmp / f"out_{tag}")
    summary = str(tmp / f"s_{tag}.json")
    cmd = [sys.executable, "-m", "smart_pdf_md_spark.run",
           "--corpus-size", str(N), "--run-dir", run_dir, "--out", out,
           "--master", master, "--summary-json", summary]
    env = {**os.environ, "PYTHONPATH": REPO}
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode in (0, 1, 4, 9), r.stderr[-3000:]
    with open(summary) as f:
        return {"out": out, **json.load(f)}


@pytest.mark.slow
def test_identical_triples_at_two_parallelism_levels(tmp_path):
    a = _run("local[2]", tmp_path, "p2")
    b = _run("local[8]", tmp_path, "p8")
    assert a["triples"] == b["triples"] > 0
    con = duckdb.connect()
    diff = con.execute(f"""
        SELECT count(*) FROM (
          SELECT subj, pred, obj, obj_raw, entity_id, file_id, content_sha256
          FROM parquet_scan('{a["out"]}/*.parquet')
          EXCEPT
          SELECT subj, pred, obj, obj_raw, entity_id, file_id, content_sha256
          FROM parquet_scan('{b["out"]}/*.parquet')
        )""").fetchone()[0]
    assert diff == 0, f"{diff} triples differ between local[2] and local[8]"
    n_a = con.execute(
        f"SELECT count(*) FROM parquet_scan('{a['out']}/*.parquet')").fetchone()[0]
    assert n_a == a["triples"]
