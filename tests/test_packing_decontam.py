"""Round-5 training-data operators: benchmark decontamination, k-core,
adaptive per-stratum quality filtering, and sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_pdf_md_spark.operators import dedup as D
from smart_pdf_md_spark.operators import textstats as TS
from smart_pdf_md_spark.operators.graph import k_core


def _gram13_sql(arr: str) -> str:
    terms = " || ' ' || ".join(f"{arr}[i+{j}]" for j in range(13))
    return (f"CASE WHEN len({arr}) < 13 THEN []::VARCHAR[] "
            f"ELSE list_distinct(list_transform(range(1, len({arr}) - 11), "
            f"i -> {terms})) END")


def test_decontaminate_known_values_and_duckdb_parity(spark):
    """A doc embedding an exact 13-token benchmark sentence is flagged; a
    clean doc and a sub-13-token doc are not; counts match a DuckDB oracle
    computed over STRING grams (Spark side hashes them — equal counts pin
    that the hashing is semantically invisible)."""
    import duckdb
    import pandas as pd

    bench_sentence = ("the quick brown fox jumps over the lazy dog near "
                      "the stone bridge")  # exactly 13 tokens
    assert len(bench_sentence.split()) == 13
    filler = " ".join(f"w{i}" for i in range(20))
    docs_pd = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{filler} {bench_sentence} {filler}",
                 " ".join(f"clean{i}" for i in range(40)),
                 "too short"],
    })
    bench_pd = pd.DataFrame({
        "bench_id": [100],
        "text": [f"prompt setup {bench_sentence} answer options"],
    })
    docs = spark.createDataFrame(docs_pd)
    bench = spark.createDataFrame(bench_pd)

    got = {r.id: r for r in D.decontaminate(docs, bench).collect()}
    assert got[1].contaminated and got[1].hit_grams >= 1
    assert not got[2].contaminated and got[2].hit_grams == 0
    assert got[3].n_grams == 0 and not got[3].contaminated
    assert 0.0 < got[1].contamination_ratio <= 1.0

    con = duckdb.connect()
    con.register("docs", docs_pd)
    con.register("bench", bench_pd)
    want = con.execute(f"""
    WITH dg AS (
      SELECT doc_id, {_gram13_sql('tk')} AS grams FROM (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
        FROM docs)
    ), bg AS (
      SELECT list_distinct(flatten(list(grams))) AS bgrams FROM (
        SELECT {_gram13_sql('tk')} AS grams FROM (
          SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
          FROM bench))
    )
    SELECT doc_id, len(grams) AS n_grams,
           len(list_filter(grams, g -> list_contains(bgrams, g))) AS hit_grams
    FROM dg CROSS JOIN bg
    """).df().set_index("doc_id")
    for did, r in got.items():
        assert want.loc[did, "n_grams"] == r.n_grams, did
        assert want.loc[did, "hit_grams"] == r.hit_grams, did


def test_decontaminate_clean_corpus_all_clean(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(5)],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, " ".join(f"b{j}" for j in range(30)))], ["bench_id", "text"])
    out = D.decontaminate(docs, bench)
    assert out.count() == 5
    assert out.filter("contaminated").count() == 0


def _py_k_core(edge_list, k):
    """Reference peeling in plain Python."""
    adj: dict[str, set[str]] = {}
    for u, v in edge_list:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def test_k_core_vs_python_peeling(spark):
    """k-core membership AND in-core degrees equal a reference Python
    peeling on a random graph plus a planted 5-clique (a 4-core the random
    background at this density never produces)."""
    import random

    rng = random.Random(41)
    nodes = [f"n{i}" for i in range(40)]
    edge_list = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)}
    clique = ["c0", "c1", "c2", "c3", "c4"]
    edge_list |= {(a, b) for a in clique for b in clique if a < b}
    df = spark.createDataFrame(
        [(u, "E", v) for u, v in edge_list], ["subj", "pred", "obj"])

    for k in (2, 3, 4):
        got = {r.node: r.degree for r in k_core(df, k).collect()}
        assert got == _py_k_core(edge_list, k), f"k={k}"
    assert set(clique) <= set(_py_k_core(edge_list, 4))  # clique survives


@pytest.mark.slow
def test_k_core_delta_peel_deep_cascade(spark):
    """The delta-peel formulation must stay exact through a DEEP peeling
    cascade: a 24-node path peels from both ends one pair per round (~12
    delta rounds, each decrementing exactly the new endpoints) until only
    the planted 4-clique's 2-core remains."""
    path = [(f"p{i}", f"p{i+1}") for i in range(23)]
    clique = ["c0", "c1", "c2", "c3"]
    edges = path + [(a, b) for a in clique for b in clique if a < b]
    edges.append(("p0", "c0"))  # attach the path to the clique
    df = spark.createDataFrame(
        [(u, "E", v) for u, v in edges], ["subj", "pred", "obj"])
    got = {r.node: r.degree for r in k_core(df, 2).collect()}
    assert got == _py_k_core(edges, 2) == {c: 3 for c in clique}


def _py_lpa(edge_list, max_iter=10):
    """Reference implementation of the same deterministic sync rule."""
    adj: dict[str, set[str]] = {}
    for u, v in edge_list:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for n in adj:
            counts: dict[str, int] = {labels[n]: 1}  # self-vote
            for m in adj[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        if new == labels:
            return labels
        labels = new
    return labels


def test_label_propagation_splits_bridged_cliques(spark):
    """Fast LPA representative: two 5-cliques joined by ONE bridge edge —
    a single connected component — get two distinct communities (the
    signal CC cannot produce), matching the reference Python
    implementation of the same deterministic rule."""
    from smart_pdf_md_spark.operators.graph import label_propagation

    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    edge_list = {(x, y) for x in a for y in a if x < y}
    edge_list |= {(x, y) for x in b for y in b if x < y}
    edge_list.add(("a0", "b0"))                       # the bridge
    df = spark.createDataFrame(
        [(u, "E", v) for u, v in edge_list], ["subj", "pred", "obj"])
    got = {r.node: r.label for r in label_propagation(df).collect()}
    assert got == _py_lpa(edge_list)
    assert len({got[x] for x in a}) == 1
    assert len({got[x] for x in b}) == 1
    assert got["a1"] != got["b1"]


@pytest.mark.slow
def test_label_propagation_vs_python_on_random_graph(spark):
    """Deterministic LPA equals the reference Python rule on a random
    graph with self-loops present, and the labeling is identical across
    input partitionings (the tie-break determinism claim)."""
    import random

    from smart_pdf_md_spark.operators.graph import label_propagation

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    edge_list = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(15)}
    edge_list |= {("c0", "c1"), ("c1", "c2"), ("c0", "c2"), ("c2", "n0")}
    df = spark.createDataFrame(
        [(u, "E", v) for u, v in edge_list], ["subj", "pred", "obj"])
    got = {r.node: r.label for r in label_propagation(df).collect()}
    assert got == _py_lpa(edge_list)
    got8 = {r.node: r.label
            for r in label_propagation(df.repartition(8)).collect()}
    assert got8 == got


def test_adaptive_quality_filter_exact_rank_and_duckdb_parity(spark):
    """Top-frac-per-stratum keep set matches DuckDB percent_rank exactly
    (deterministic tie-break by doc_id)."""
    import duckdb

    rows = []
    for lang, base in (("en", 0), ("de", 100)):
        for i in range(6):
            # varying stopword-rich quality: longer, stoppier docs first
            body = ("the is on and of " * (6 - i)) + " ".join(
                f"x{base + i}_{j}" for j in range(5 + i))
            rows.append((base + i, body, lang))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    kept = TS.adaptive_quality_filter(docs, frac=0.5)
    got = {(r.doc_id, r.lang) for r in kept.select("doc_id", "lang").collect()}

    scored = docs.withColumn(
        "quality", TS.quality_cols(F.col("text"))["quality"]) \
        .select("doc_id", "lang", "quality").toPandas()
    con = duckdb.connect()
    con.register("scored", scored)
    want = con.execute("""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 percent_rank() OVER (PARTITION BY lang
                                      ORDER BY quality DESC, doc_id) AS pr
          FROM scored)
        WHERE round(pr + 1e-9, 4) <= 0.5
    """).df()
    assert got == {(r.doc_id, r.lang) for r in want.itertuples(index=False)}
    # exactly ceil-ish half of each 6-doc stratum: pr values 0,.2,.4 <= .5
    assert kept.groupBy("lang").count().toPandas()["count"].tolist() == [3, 3]


def test_pack_sequences_invariants_and_determinism(spark):
    """Every chunk lands in exactly one pack; no pack exceeds the budget
    except overflow singletons; pack_tokens is the exact member sum; and
    the assignment is identical at 1-way and 8-way parallelism."""
    import random

    rng = random.Random(7)
    rows = [(d, c, f"text {d}/{c}", rng.randint(10, 900))
            for d in range(30) for c in range(rng.randint(1, 4))]
    rows.append((99, 0, "giant", 5000))  # overflow chunk
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, chunk_text string, chunk_len int")

    packed = TS.pack_sequences(chunks, budget_tokens=1024, n_buckets=8)
    pdf = packed.toPandas()
    assert len(pdf) == len(rows)  # bijection on chunks
    sums = pdf.groupby("pack_id")["chunk_len"].sum()
    toks = pdf.groupby("pack_id")["pack_tokens"].first()
    assert (sums == toks).all()
    non_overflow = pdf[~pdf["overflow"]]
    assert non_overflow.groupby("pack_id")["chunk_len"].sum().max() <= 1024
    ov = pdf[pdf["overflow"]]
    assert len(ov) == 1 and ov.iloc[0]["pack_tokens"] == 5000
    # overflow pack is a singleton — nothing else joined it
    assert (pdf["pack_id"] == ov.iloc[0]["pack_id"]).sum() == 1

    a = TS.pack_sequences(chunks.repartition(1), budget_tokens=1024,
                          n_buckets=8).toPandas()
    b = TS.pack_sequences(chunks.repartition(8), budget_tokens=1024,
                          n_buckets=8).toPandas()
    key = ["doc_id", "chunk_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[["pack_id", "pack_tokens", "overflow"]].equals(
        b[["pack_id", "pack_tokens", "overflow"]])


def test_pack_sequences_rejects_bad_budget(spark):
    chunks = spark.createDataFrame(
        [(1, 0, "t", 5)],
        "doc_id long, chunk_idx int, chunk_text string, chunk_len int")
    with pytest.raises(ValueError, match="budget_tokens"):
        TS.pack_sequences(chunks, budget_tokens=0)


def test_weighted_sample_deterministic_and_proportional(spark):
    """weighted_sample keeps ~weight fraction per weight level, the
    decision is partitioning-invariant, weight 1 keeps everything,
    weight 0 nothing, and out-of-range weights clamp."""
    from pyspark.sql import functions as F

    rows = [(i, float((i % 4)) / 3.0) for i in range(4000)]  # w ∈ {0,⅓,⅔,1}
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = TS.weighted_sample(df, F.col("w"))
    frac = {r.w: r.n / 1000 for r in
            kept.groupBy("w").agg(F.count("*").alias("n")).collect()}
    assert 0.0 not in frac                      # weight 0 → nothing kept
    assert frac[1.0] == 1.0                    # weight 1 → everything
    assert abs(frac[1 / 3] - 1 / 3) < 0.05 and abs(frac[2 / 3] - 2 / 3) < 0.05

    a = {r.doc_id for r in TS.weighted_sample(
        df.repartition(1), F.col("w")).collect()}
    b = {r.doc_id for r in TS.weighted_sample(
        df.repartition(16), F.col("w")).collect()}
    assert a == b                              # pure function of the row

    clamped = TS.weighted_sample(df, F.col("w") * 10 - 3)  # out of [0,1]
    assert clamped.filter("w = 1.0").count() == 1000  # clamps to 1, keeps all


def test_verify_stage_digests_partitioning_invariant(spark, tmp_path):
    """Cross-run manifest verification: the same rows committed at 1-way
    and 8-way partitioning produce IDENTICAL global digests (XOR folds over
    partitions), and a one-row difference is detected — without reading a
    single data row."""
    from pyspark.sql import functions as F

    from smart_pdf_md_spark.plans.manifests import (
        commit_stage,
        verify_stage_digests,
    )

    df = spark.range(500).select(
        F.concat(F.lit("f"), "id").alias("file_id"),
        (F.col("id") * 7).alias("val"))
    ra, rb, rc_ = (str(tmp_path / d) for d in ("a", "b", "c"))
    commit_stage(df.repartition(1), ra, "triples", ["file_id", "val"])
    commit_stage(df.repartition(8), rb, "triples", ["file_id", "val"])
    commit_stage(df.filter("id <> 250"), rc_, "triples", ["file_id", "val"])

    same = verify_stage_digests(spark, ra, rb, ["triples"])["triples"]
    assert same["match"] and same["rows_a"] == same["rows_b"] == 500
    assert same["digest_a"] == same["digest_b"]

    diff = verify_stage_digests(spark, ra, rc_, ["triples"])["triples"]
    assert not diff["match"] and diff["rows_b"] == 499


def _py_k_truss(edge_list, k):
    """Reference peeling in plain Python: support = common-neighbor count."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    while True:
        adj: dict[str, set[str]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        support = {(u, v): len(adj[u] & adj[v]) for u, v in edges}
        drop = {e for e, s in support.items() if s < k - 2}
        if not drop:
            return support
        edges -= drop


def test_k_truss_small_fast(spark):
    """Fast k-truss representative for the default selection (ADVICE r5:
    the only parity test was slow-marked): a K4 with a pendant tail — the
    3-truss is exactly the K4's 6 edges (support 2 each), the tail edge
    dissolves; bad arguments raise instead of UnboundLocalError."""
    from smart_pdf_md_spark.operators.graph import k_truss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e")]  # + pendant d—e
    df = spark.createDataFrame([(u, "E", v) for u, v in k4],
                               ["subj", "pred", "obj"])
    got = {(r.u, r.v): r.support for r in k_truss(df, 4).collect()}
    assert got == {(u, v): 2 for u, v in k4[:6]}
    with pytest.raises(ValueError, match="max_iter"):
        k_truss(df, 3, max_iter=0)
    with pytest.raises(ValueError, match="k must be"):
        k_truss(df, 1)


@pytest.mark.slow
def test_k_truss_vs_python_peeling(spark):
    """k-truss edges AND in-truss supports equal a reference Python peeling
    on a random graph plus a planted K5 (whose edges each close 3 triangles
    → it survives the 5-truss while the sparse background dissolves)."""
    import random

    from smart_pdf_md_spark.operators.graph import k_truss

    rng = random.Random(43)
    nodes = [f"n{i}" for i in range(30)]
    edge_list = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)}
    clique = ["c0", "c1", "c2", "c3", "c4"]
    edge_list |= {(a, b) for a in clique for b in clique if a < b}
    df = spark.createDataFrame(
        [(u, "E", v) for u, v in edge_list], ["subj", "pred", "obj"])

    for k in (2, 3, 4, 5):
        got = {(r.u, r.v): r.support for r in k_truss(df, k).collect()}
        assert got == _py_k_truss(edge_list, k), f"k={k}"
    # the planted K5 is exactly a 5-truss core
    t5 = _py_k_truss(edge_list, 5)
    assert {(a, b) for a in clique for b in clique if a < b} <= set(t5)


def test_adaptive_quality_filter_sketch_tracks_exact(spark):
    """The sketch form (no per-stratum corpus sort): kept fraction per
    stratum lands in [frac, frac + cut-bucket mass]; bucket-granular
    dominance (no kept doc a full bucket below a dropped doc of its
    stratum); partition-invariant; the plan has no corpus-sized Sort."""
    import io
    from contextlib import redirect_stdout

    import random

    from smart_pdf_md_spark.operators.textstats import (
        adaptive_quality_filter,
        adaptive_quality_filter_sketch,
    )

    rng = random.Random(11)
    stops = "the of and to in it is was for on".split()
    rows = []
    for i in range(400):
        lang = "en" if i % 2 else "de"
        # graded quality: longer + stopword-richer as i grows
        n_stop = 1 + (i % 40)
        body = " ".join(rng.choice(stops) for _ in range(n_stop)) + " " + \
            " ".join(f"w{i}x{j}" for j in range(5 + (i % 60)))
        rows.append((i, body, lang))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    frac, k = 0.8, 64
    got = adaptive_quality_filter_sketch(docs, frac=frac, k=k)
    kept = got.select("doc_id", "lang", "quality", "q_cut").collect()
    n_by = {lg: sum(1 for _, t, l in rows if l == lg) for lg in ("en", "de")}
    kept_by: dict = {}
    for r in kept:
        kept_by.setdefault(r.lang, []).append(r)
        assert r.quality >= r.q_cut or r.quality <= 0
    for lg, rs in kept_by.items():
        f = len(rs) / n_by[lg]
        assert frac - 1e-9 <= f <= 1.0
    # bucket-granular agreement with the exact form: everything the
    # exact filter keeps, the sketch keeps too (it cuts at or below the
    # exact threshold's bucket floor)
    exact_ids = {r.doc_id for r in
                 adaptive_quality_filter(docs, frac=frac).collect()}
    sketch_ids = {r.doc_id for r in kept}
    assert exact_ids <= sketch_ids
    # and the overshoot is bounded by the cut bucket's mass: within each
    # stratum no kept doc sits more than one bucket below the exact cut
    import math
    for lg, rs in kept_by.items():
        exact_min = min(r.quality for r in kept if r.lang == lg and
                        r.doc_id in exact_ids)
        for r in rs:
            if r.quality > 0:
                assert (math.floor(k * math.log2(r.quality)) >=
                        math.floor(k * math.log2(exact_min)) - 1)

    got16 = {r.doc_id for r in adaptive_quality_filter_sketch(
        docs.repartition(16), frac=frac, k=k).collect()}
    assert got16 == sketch_ids                     # partition-invariant

    buf = io.StringIO()
    with redirect_stdout(buf):
        adaptive_quality_filter_sketch(docs, frac=frac, k=k) \
            .explain("formatted")
    plan = buf.getvalue()
    # the histogram walk may sort its (strata x buckets) relation; the
    # corpus stream itself must reach the filter sort-free. The exact
    # form's WindowExec over the full corpus is what we are avoiding —
    # assert no window function consumes the corpus-sized relation (the
    # only Window here partitions the bucket histogram).
    assert "percent_rank" not in plan
