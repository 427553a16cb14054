"""Bloom-vs-exact decontamination crossover (r8 VERDICT next-round #8).

The sandbox benchmark fixtures carry only ~41k distinct 13-grams — a
regime where the exact broadcast shingle set trivially wins. This script
INFLATES the benchmark's distinct gram vocabulary synthetically (unique
per-row tokens, generated in-Spark, excluded from timing) to measure
where the fixed-size Bloom gate (decontaminate_bloom: m_bits/8 bytes of
broadcast state regardless of benchmark size) overtakes the exact path
(broadcast hash set whose JVM footprint grows ~50-100 B/gram).

Discipline: one fresh JVM per (engine, gram-count) run, engines
interleaved within each gram count, 2 rounds each, best-of-2 inside the
JVM, noop full-column materialization. Corpus = $SPARK_GRAFT_SF_DIR
documents. Run idle; record both curves in BENCH/BASELINE.md.

Usage:
    python scripts/bloom_crossover_bench.py [gram_counts_csv] [rounds]
    # default: 40000,400000,2000000,8000000,16000000  2
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
repo, sf_dir, engine = sys.argv[1], sys.argv[2], sys.argv[3]
n_grams = int(sys.argv[4])
sys.path.insert(0, repo)
os.chdir(repo)
from pyspark.sql import functions as F
from smart_pdf_md_spark.session import build_session
from smart_pdf_md_spark.operators.dedup import decontaminate, decontaminate_bloom
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = build_session(master=f"local[{cpus}]")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
    .localCheckpoint(eager=True)

# synthetic benchmark: each row = 13+99 unique tokens -> 100 distinct
# 13-grams per row; tokens are disjoint from the corpus vocabulary, so
# the measured cost is the bench-side structure + probe, not hit volume.
GRAMS_PER_ROW = 100
n_rows = max(1, n_grams // GRAMS_PER_ROW)
bench = (spark.range(n_rows)
         .select(F.array_join(
             F.transform(F.sequence(F.lit(0), F.lit(13 + GRAMS_PER_ROW - 2)),
                         lambda j: F.concat(F.lit("zz"), F.col("id"),
                                            F.lit("_"), j)),
             " ").alias("text"))
         .repartition(cpus).localCheckpoint(eager=True))

def run():
    if engine == "exact":
        out = decontaminate(docs, bench)
    else:
        # m_bits fixed: the whole point is state independent of n_grams.
        # k=5, 2^23 bits = 1 MiB; FP per probe at 16M grams ~ (1-e^-9.5)^5
        out = decontaminate_bloom(docs, bench, m_bits=1 << 23, k=5)
    out.write.format("noop").mode("overwrite").save()

best = None
for _ in range(2):
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print("RESULT " + json.dumps({"engine": engine, "n_grams": n_grams,
                              "sec": round(best, 3)}))
"""


def run_once(engine: str, n_grams: int, repo: str, sf_dir: str) -> float:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, engine, str(n_grams)],
        capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            print(json.dumps(res), flush=True)
            return res["sec"]
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"no RESULT from {engine}@{n_grams}")


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    counts = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else
                               "40000,400000,2000000,8000000,16000000"
                               ).split(",")]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    res: dict = {}
    for g in counts:
        for r in range(rounds):
            order = (("exact", "bloom") if r % 2 == 0
                     else ("bloom", "exact"))
            for eng in order:
                res.setdefault((eng, g), []).append(
                    run_once(eng, g, repo, sf_dir))
    print("\n| distinct 13-grams | exact (s) | bloom (s) |")
    print("|---|---|---|")
    for g in counts:
        e = statistics.median(res[("exact", g)])
        b = statistics.median(res[("bloom", g)])
        print(f"| {g:,} | {e:.2f} | {b:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
