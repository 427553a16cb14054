"""Measure curate_append's per-batch cost as history grows (r5 VERDICT
next-round #6): N equal-size batches of the sf0.1 documents table are
appended to one run_dir in FRESH JVMs (the daily-run shape); each batch
reports wall seconds plus total shuffle read/write bytes from its own
event log. If the incremental design holds, per-batch cost stays roughly
flat while cumulative history grows N×; the expected residual growth is
the slim columnar scan of history signatures (8-byte band hashes + the
32-slot sig column — never document text, never signature recompute).

Usage:
    python scripts/incremental_curation_bench.py            # 5 batches
    python scripts/incremental_curation_bench.py --batches 8
    python scripts/incremental_curation_bench.py --one <run_dir> <i> <n>
                                                  # internal per-batch mode
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(run_dir: str, i: int, n: int) -> None:
    import time

    sys.path.insert(0, REPO)
    from smart_pdf_md_spark.plans.curation_incremental import curate_append
    from smart_pdf_md_spark.session import build_session

    evdir = os.path.join(run_dir, f"ev_{i}")
    os.makedirs(evdir, exist_ok=True)
    spark = build_session(master="local[8]", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    })
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text", "lang").filter(f"doc_id % {n} = {i}")
    t0 = time.monotonic()
    summary = curate_append(spark, docs, os.path.join(run_dir, "state"))
    wall = time.monotonic() - t0
    spark.stop()

    sr = sw = 0
    for path in glob.glob(os.path.join(evdir, "**", "*"), recursive=True):
        if os.path.isdir(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    w = m.get("Shuffle Write Metrics") or {}
                    r = m.get("Shuffle Read Metrics") or {}
                    sw += w.get("Shuffle Bytes Written", 0)
                    sr += (r.get("Local Bytes Read", 0) +
                           r.get("Remote Bytes Read", 0))
    print(json.dumps({"batch": i, "wall_sec": round(wall, 2),
                      "shuffle_write_mb": round(sw / 1e6, 2),
                      "shuffle_read_mb": round(sr / 1e6, 2),
                      **summary}))


def main() -> int:
    if "--one" in sys.argv:
        k = sys.argv.index("--one")
        run_one(sys.argv[k + 1], int(sys.argv[k + 2]), int(sys.argv[k + 3]))
        return 0
    n = 5
    if "--batches" in sys.argv:
        n = int(sys.argv[sys.argv.index("--batches") + 1])
    run_dir = tempfile.mkdtemp(prefix="inc_cur_bench_")
    print(f"# run_dir={run_dir} batches={n} sf_dir={SF_DIR}", file=sys.stderr)
    for i in range(n):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", run_dir, str(i), str(n)],
            check=True, cwd=REPO)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
