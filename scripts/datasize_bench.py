"""Data-size scaling evidence: the same KG job at 1× and 4× the corpus,
fixed parallelism (local[32]), interleaved rounds → BENCH/BASELINE.md.

Complements scaling_bench.py (cores at fixed data): the north-rule claim
this measures is that the pipeline's per-run FIXED costs — vocabulary-sized
linking/CC driver rounds, session/codegen warmup — amortize as the input
grows, so triples/sec should hold or RISE from 1M to 4M files. A pipeline
hiding an O(n²) stage or a vocabulary leak would instead crater at 4×.

Usage: python scripts/datasize_bench.py [base_n] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SIZES = (BASE_N, BASE_N * 4)
CORES = 32

RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from smart_pdf_md_spark.session import build_session
from smart_pdf_md_spark.plans.pipeline import build_mentions, triples_from_mentions
from smart_pdf_md_spark.operators.extract import mentions_only
from smart_pdf_md_spark.operators.linking import link_edges, checkpointed_vocabulary
from smart_pdf_md_spark.operators.cc import canonical_triples, entity_table
spark = build_session(app_name="datasize", master="local[{cores}]")
corpus = spark.read.parquet({corpus!r})
corpus.count()
spark.range(0, {cores} * 4, numPartitions={cores} * 4).mapInPandas(
    lambda it: (pdf for pdf in it), "id long").count()
NEED = ["file_id", "repo", "path", "kind", "name", "enclosing",
        "content_sha256", "mention_id"]
t0 = time.perf_counter()
m0 = mentions_only(build_mentions(spark, corpus)).select(*NEED).persist()
m0.count()
t1 = time.perf_counter()
m = m0.coalesce(spark.sparkContext.defaultParallelism * 4)
names = checkpointed_vocabulary(m)
edges = link_edges(m, names=names)
ents = entity_table(m, edges, names=names)
canon = canonical_triples(triples_from_mentions(m, distinct=False), ents)
n = canon.count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{"n_files": {n_files}, "triples": n,
      "extract_sec": round(t1 - t0, 3), "elapsed_sec": round(dt, 3),
      "triples_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def _ensure_corpus(n: int) -> str:
    sys.path.insert(0, REPO)
    from smart_pdf_md_spark.corpus import CORPUS_VERSION
    path = os.path.join(REPO, ".bench",
                        f"corpus_v{CORPUS_VERSION}_{n}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        parts = max(512, n // 2000)
        gen = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from smart_pdf_md_spark.session import build_session\n"
            "from smart_pdf_md_spark.corpus import corpus_df\n"
            "spark = build_session(app_name='gen', master='local[32]')\n"
            f"corpus_df(spark, {n}, partitions={parts}).write"
            f".mode('overwrite').parquet({path!r})\n"
            "spark.stop()\n"
        )
        subprocess.run([sys.executable, "-c", gen], cwd=REPO, check=True)
    return path


def main() -> int:
    corpora = {n: _ensure_corpus(n) for n in SIZES}
    runs: dict[int, list[dict]] = {n: [] for n in SIZES}
    for rnd in range(ROUNDS):
        for n in SIZES:  # interleaved
            code = RUNNER.format(repo=REPO, cores=CORES,
                                 corpus=corpora[n], n_files=n)
            r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                               capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                print(r.stderr[-4000:], file=sys.stderr)
                return 1
            line = [x for x in r.stdout.splitlines()
                    if x.startswith("RESULT ")][-1]
            res = json.loads(line[len("RESULT "):])
            runs[n].append(res)
            print(json.dumps({"round": rnd, **res}))

    def med(n, key):
        return statistics.median(x[key] for x in runs[n])

    ratio = round(med(SIZES[1], "triples_per_sec") /
                  med(SIZES[0], "triples_per_sec"), 3)
    report = {
        "cores": CORES,
        "rounds": ROUNDS,
        "sizes": [{
            "n_files": n,
            "triples": runs[n][0]["triples"],
            "elapsed_sec_median": round(med(n, "elapsed_sec"), 2),
            "extract_sec_median": round(med(n, "extract_sec"), 2),
            "triples_per_sec_median": round(med(n, "triples_per_sec"), 1),
            "triples_per_sec_all": [x["triples_per_sec"] for x in runs[n]],
        } for n in SIZES],
        "tps_ratio_4x_over_1x": ratio,
    }
    print(json.dumps(report))

    md = ["", "## Data-size scaling (fixed local[32]; same job, 1× vs 4× corpus)",
          "",
          "| corpus files | triples | median elapsed (s) | median extract (s) | median triples/sec | all runs (tps) |",
          "|---|---|---|---|---|---|"]
    for lv in report["sizes"]:
        md.append(f"| {lv['n_files']} | {lv['triples']} | "
                  f"{lv['elapsed_sec_median']} | {lv['extract_sec_median']} | "
                  f"{lv['triples_per_sec_median']} | "
                  f"{lv['triples_per_sec_all']} |")
    md += ["",
           f"**tps(4×)/tps(1×) = {ratio}** — ≥1 means the per-run fixed "
           "costs (vocabulary-sized linking/CC driver rounds, warmup) "
           "amortize with input size, i.e. no hidden super-linear stage; "
           "interleaved medians of "
           f"{ROUNDS} rounds on the documented ±30%-noise microVM.", ""]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(md))
    print("appended to BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
