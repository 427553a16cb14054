"""Per-query isolation bench + plan capture for optimization round 10.

bench.py is FROZEN for driver measurement; this file exists for guide §1
discipline: time each query alone against the noop sink (full column
materialization, no driver collect) and dump .explain("formatted") so plan
claims in OPTIMIZATION_r10.md are reproducible.

Usage:
    python bench_extra.py q1,q2,...        # time (best of N, default 2)
    python bench_extra.py q1 --plans DIR   # also write DIR/<q>.txt plans
    python bench_extra.py all              # every HEADLINE query of bench.py

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_EXTRA_ROUNDS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("BENCH_EXTRA_ROUNDS", "2"))


def main() -> int:
    import bench as bench_mod
    import __spark_entry__ as em
    from smart_pdf_md_spark.session import build_session

    names_arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    plans_dir = None
    if "--plans" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)

    names = bench_mod.HEADLINE if names_arg == "all" else names_arg.split(",")
    names = [n for n in names if n != "kg_pipeline"]

    extra = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}"))
    spark = build_session(app_name="bench-extra", master=f"local[{CPUS}]",
                          extra_conf=extra or None)
    qs = em.queries()
    # warmup: JVM classloading + codegen (the bench.py discipline)
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        if plans_dir is not None:
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        best = None
        for _ in range(ROUNDS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "rounds": ROUNDS,
                      "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
