"""Per-round cost evidence for the r8 delta-bounded bpe_train
(BENCH/BASELINE.md): train on the sf0.01 documents word table and report
how per-round wall time tracks the affected-word fraction — the claim is
that round cost shrinks as merges specialize, instead of the r7
full-recount's flat per-round full-vocabulary explode.

Usage: python scripts/bpe_round_bench.py [n_merges] [sf_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_pdf_md_spark.operators import bpe as B          # noqa: E402
from smart_pdf_md_spark.session import build_session       # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    # the sf documents tables draw from a ~30-word synthetic vocabulary —
    # useless for affected-fraction evidence; the KG corpus generator's
    # source-code content has a realistically large identifier vocabulary
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = build_session(app_name="bpe-round-bench",
                          master=f"local[{cpus}]")
    from smart_pdf_md_spark.corpus import corpus_df
    docs = corpus_df(spark, n_files).selectExpr("content as text")
    wf = B.word_freq_table(docs).localCheckpoint(eager=True)
    stats: list = []
    merges = B.bpe_train(wf, n_merges=n_merges, round_stats=stats)

    qs = [stats[i:i + max(1, len(stats) // 4)]
          for i in range(0, len(stats), max(1, len(stats) // 4))][:4]

    def agg(chunk):
        return {
            "mean_sec": round(sum(s["sec"] for s in chunk) / len(chunk), 3),
            "mean_affected_frac": round(
                sum(s["affected_words"] / s["vocab_words"]
                    for s in chunk) / len(chunk), 4),
            "mean_exploded_frac": round(
                sum(s["affected_syms"] / max(1, s["vocab_syms"])
                    for s in chunk) / len(chunk), 4),
        }

    print(json.dumps({
        "n_merges_applied": len(merges),
        "vocab_words": stats[0]["vocab_words"] if stats else 0,
        "quartiles": [agg(c) for c in qs if c],
        "first5": [{k: s[k] for k in ("sec", "affected_words", "affected_syms")}
                   for s in stats[:5]],
        "last5": [{k: s[k] for k in ("sec", "affected_words", "affected_syms")}
                  for s in stats[-5:]],
        "n_files": n_files,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
