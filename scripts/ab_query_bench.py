"""Interleaved A/B of individual board queries across two checkouts —
the ab_kg_bench.py discipline generalized to any `queries()` entry
(r6 VERDICT next-round #1/#6: same-code swings on this microVM reach 3×
across windows, so a perf claim is only defensible when both codes run
back-to-back in the same window, in both orders, medians compared).

Usage:
    python scripts/ab_query_bench.py <label_a>:<repo_a> <label_b>:<repo_b> \
        q1,q2,... [rounds] [sf_dir]

Each round launches one fresh JVM per checkout; order alternates per
round (A,B then B,A ...). Within a JVM every query runs twice and the
best is kept (JIT/page-cache warm-up). Prints one JSON line per run plus
a per-query median summary. Run on an idle machine — nothing concurrent.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
repo, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as em
from smart_pdf_md_spark.session import build_session
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = build_session(master=f"local[{cpus}]")
qs = em.queries()
out = {}
for name in names:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        # full materialization of every column (bench.py's cost path) —
        # .count() lets Catalyst prune the expensive expressions
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = {"sec": round(best, 3)}
print("RESULT " + json.dumps(out))
"""


def run_once(label: str, repo: str, names: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run([sys.executable, "-c", _CHILD, repo, sf_dir, names],
                       capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            print(json.dumps({"label": label, **{k: v["sec"]
                                                 for k, v in res.items()}}),
                  flush=True)
            return res
    raise RuntimeError(f"{label} child failed:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    la, ra = sys.argv[1].split(":", 1)
    lb, rb = sys.argv[2].split(":", 1)
    names = sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    samples: dict[str, dict[str, list[float]]] = {la: {}, lb: {}}
    for i in range(rounds):
        order = [(la, ra), (lb, rb)] if i % 2 == 0 else [(lb, rb), (la, ra)]
        for label, repo in order:
            res = run_once(label, repo, names, sf_dir)
            for q, v in res.items():
                samples[label].setdefault(q, []).append(v["sec"])
    summary = {q: {la: round(statistics.median(samples[la][q]), 3),
                   lb: round(statistics.median(samples[lb][q]), 3)}
               for q in samples[la]}
    for q, m in summary.items():
        m["ratio"] = round(m[lb] / m[la], 3) if m[la] else None
    print(json.dumps({"median": summary, "rounds": rounds, "sf": sf_dir}))


if __name__ == "__main__":
    main()
