"""Mergeable sketches: HLL register tables + Count-Min frequency tables.

No DuckDB oracle here (xxhash64 has no DuckDB twin — driver-contract
memory rule): the pins are the hash-free sketch INVARIANTS instead —
split-merge equals whole bit-for-bit, partitioning invariance, accuracy
against exact counts, and the one-sided CMS error direction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_pdf_md_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def stream(spark):
    # 20k rows over 5k distinct keys with a skewed head
    df = spark.range(20_000).select(
        F.when(F.col("id") % 4 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 5000)))
        .alias("key"))
    df.persist().count()
    return df


def test_hll_merge_of_splits_is_bitwise_whole(spark, stream):
    """THE mergeable property: sketch(A) ∪ sketch(B) == sketch(A ∪ B)
    register-for-register, and the register table is identical at 1-way
    and 16-way parallelism — so committed sketches from different
    runs/batches union exactly."""
    whole = {(r.bucket, r.rho) for r in SK.hll_registers(stream).collect()}
    a = SK.hll_registers(stream.filter("key < 'k25'"))
    b = SK.hll_registers(stream.filter("key >= 'k25'"))
    merged = {(r.bucket, r.rho) for r in SK.hll_merge(a, b).collect()}
    assert merged == whole
    one = {(r.bucket, r.rho)
           for r in SK.hll_registers(stream.repartition(1)).collect()}
    many = {(r.bucket, r.rho)
            for r in SK.hll_registers(stream.repartition(16)).collect()}
    assert one == many == whole


def test_hll_estimate_accuracy(spark, stream):
    """p=12 → σ ≈ 1.6 %; gate at 5 % on ~4.3k distinct (above the
    linear-counting switch) and at 3 % on a 100-key set (inside it)."""
    exact = stream.distinct().count()
    est = SK.hll_estimate(SK.hll_registers(stream), p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    small = stream.filter("key < 'k11'")  # ~100 keys → linear counting
    ex_s = small.distinct().count()
    est_s = SK.hll_estimate(SK.hll_registers(small), p=12)
    assert abs(est_s - ex_s) / ex_s < 0.03, (est_s, ex_s)


def test_hll_duplicates_do_not_move_registers(spark, stream):
    """Cardinality sketches see DISTINCT keys: unioning the stream with
    itself leaves the register table bit-identical."""
    doubled = stream.unionAll(stream)
    a = {(r.bucket, r.rho) for r in SK.hll_registers(stream).collect()}
    b = {(r.bucket, r.rho) for r in SK.hll_registers(doubled).collect()}
    assert a == b


def test_cms_point_queries_one_sided_and_merge(spark, stream):
    """CMS never underestimates; the hot key reads ~exact on a sparse
    table; merging per-batch tables cell-wise equals the whole-stream
    table; query side returns 0-floor for never-seen keys."""
    table = SK.cms_table(stream, ["key"])
    truth = {r.key: r.n for r in
             stream.groupBy("key").agg(F.count("*").alias("n")).collect()}
    probes = spark.createDataFrame(
        [("hot",), ("k1",), ("k4999",), ("never-seen",)], ["key"])
    got = {r.key: r.est_count
           for r in SK.cms_query(table, probes, ["key"]).collect()}
    assert got["hot"] >= truth["hot"]
    assert got["k1"] >= truth["k1"] and got["k4999"] >= truth["k4999"]
    # 5k hot-count vs w=1024 buckets: collisions add at most a few small
    # keys — the hot estimate stays within 1 % of truth
    assert got["hot"] <= truth["hot"] * 1.01
    assert got["never-seen"] >= 0

    a = SK.cms_table(stream.filter("key < 'k25'"), ["key"])
    b = SK.cms_table(stream.filter("key >= 'k25'"), ["key"])
    merged = {(r.row, r.bucket): r.cnt for r in SK.cms_merge(a, b).collect()}
    whole = {(r.row, r.bucket): r.cnt for r in table.collect()}
    assert merged == whole


def test_sketches_commit_roundtrip(spark, stream, tmp_path):
    """The cross-run story end-to-end: commit a batch's registers via the
    manifest layer, read them back in 'a later run', merge with a new
    batch, and the estimate tracks the union's exact distinct count."""
    from smart_pdf_md_spark.plans.manifests import commit_stage, read_stage

    run_dir = str(tmp_path / "sk")
    batch1 = stream.filter("key < 'k25'")
    batch2 = stream.filter("key >= 'k25'")
    commit_stage(SK.hll_registers(batch1), run_dir, "hll_tokens",
                 ["bucket", "rho"])
    persisted = read_stage(spark, run_dir, "hll_tokens")
    est = SK.hll_estimate(SK.hll_merge(persisted,
                                       SK.hll_registers(batch2)))
    exact = stream.distinct().count()
    assert abs(est - exact) / exact < 0.05


def test_hll_estimate_validates_p_and_handles_dense_tables(spark, stream):
    """ADVICE r6: estimating a p=14 register table with the default p=12
    silently produced a badly skewed cardinality — the observable half of
    that mismatch (bucket id ≥ 2^p) now raises. And a DENSE register table
    (rho = 0 rows materialized for every absent bucket, the docstring's
    valid alternative form) must estimate identically to the sparse one:
    rho-0 rows count as zero registers for linear counting."""
    sparse = SK.hll_registers(stream, p=12)
    with pytest.raises(ValueError, match="larger p"):
        SK.hll_estimate(SK.hll_registers(stream, p=14), p=12)

    m = 1 << 12
    dense = spark.range(m).select(F.col("id").cast("int").alias("bucket")) \
        .join(sparse, "bucket", "left") \
        .select("bucket", F.coalesce("rho", F.lit(0)).alias("rho"))
    est_sparse = SK.hll_estimate(sparse)
    est_dense = SK.hll_estimate(dense)
    assert abs(est_dense - est_sparse) < 1e-6
    exact = stream.distinct().count()
    assert abs(est_dense - exact) / exact < 0.05


def test_bloom_no_false_negatives_and_merge_is_whole(spark):
    """Bloom membership is one-sided: every inserted key tests
    maybe_present (NO false negatives, the property the decontamination
    gate rests on); the FP rate on absent keys stays near theory; and
    merging split-built filters is bitwise identical to building whole."""
    from smart_pdf_md_spark.operators.sketches import (
        bloom_contains,
        bloom_merge,
        bloom_table,
    )

    n, m_bits, k = 2000, 1 << 16, 5
    keys = spark.range(n).selectExpr("concat('key', id) AS key")
    bloom = bloom_table(keys, ["key"], m_bits=m_bits, k=k)
    assert bloom.count() <= m_bits // 64

    present = bloom_contains(bloom, keys, ["key"], m_bits=m_bits, k=k)
    assert present.filter("NOT maybe_present").count() == 0   # one-sided

    absent = spark.range(n).selectExpr("concat('other', id) AS key")
    fp = bloom_contains(bloom, absent, ["key"],
                        m_bits=m_bits, k=k).filter("maybe_present").count()
    # theory at n=2000, m=65536, k=5: (1-e^{-kn/m})^5 ~ 5e-4 → expect ~1
    assert fp <= 25

    half_a = keys.filter("key < 'key5'")       # lexicographic split
    half_b = keys.subtract(half_a)
    merged = bloom_merge(bloom_table(half_a, ["key"], m_bits=m_bits, k=k),
                         bloom_table(half_b, ["key"], m_bits=m_bits, k=k))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, bloom.collect()))


def test_decontaminate_bloom_matches_exact_gate(spark):
    """The Bloom-gated decontamination flags every doc the exact
    broadcast gate flags (no false negatives by construction) and, at
    default sizing, the same clean set on a small corpus."""
    from smart_pdf_md_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    bench_sent = " ".join(f"ev{i}al{i}" for i in range(13))
    docs = spark.createDataFrame(
        [(1, "clean doc " + " ".join(f"w{i}" for i in range(20))),
         (2, "leaky prefix " + bench_sent + " leaky suffix"),
         (3, "short")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, "intro " + bench_sent + " outro")], ["bench_id", "text"])

    exact = {r.id: r for r in decontaminate(docs, bench).collect()}
    bloom = {r.id: r for r in decontaminate_bloom(docs, bench).collect()}
    assert set(exact) == set(bloom)
    for i in exact:
        assert exact[i].contaminated == bloom[i].contaminated, i
        assert exact[i].n_grams == bloom[i].n_grams, i
    assert bloom[2].contaminated and not bloom[1].contaminated
    assert bloom[3].n_grams == 0 and not bloom[3].contaminated


def test_log_histogram_quantiles_relative_error_and_merge(spark):
    """Mergeable quantile state: estimates sit inside the guaranteed
    relative-error band against exact quantiles; split-built histograms
    merge to the whole bit-for-bit; zeros land in the reserved bucket."""
    import numpy as np

    from smart_pdf_md_spark.operators.sketches import (
        log_histogram,
        log_histogram_merge,
        log_histogram_quantiles,
    )

    rng = np.random.default_rng(5)
    vals = rng.lognormal(mean=5.0, sigma=1.5, size=4000)
    df = spark.createDataFrame([(float(v),) for v in vals], ["n_tokens"])

    k = 8
    hist = log_histogram(df, "n_tokens", k=k)
    assert hist.count() <= k * 64 + 1
    qs = [0.1, 0.5, 0.9, 0.99]
    got = log_histogram_quantiles(hist, qs, k=k)
    tol = 2 ** (1.0 / k) - 1          # ≈ 0.0905 at k=8
    for q in qs:
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) / exact <= tol + 1e-9, (q, got[q], exact)

    half_a = df.filter("n_tokens < 150")
    half_b = df.subtract(half_a)
    merged = log_histogram_merge(log_histogram(half_a, "n_tokens", k=k),
                                 log_histogram(half_b, "n_tokens", k=k))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, hist.collect()))

    withz = spark.createDataFrame([(0.0,), (0.0,), (8.0,)], ["n_tokens"])
    hz = log_histogram(withz, "n_tokens", k=k)
    got_z = log_histogram_quantiles(hz, [0.3, 0.99], k=k)
    assert got_z[0.3] == 0.0                       # zeros rank first
    assert abs(got_z[0.99] - 8.0) / 8.0 <= tol


def test_bottomk_sample_merge_and_determinism(spark):
    """Bottom-k/KMV sampling: the k smallest keyed hashes form a uniform
    sample that MERGES — whole-corpus bottom-k ≡ merge of per-shard
    bottom-k's, exactly; the sample is a pure function of the row set
    (partitioning-invariant); md5_48 variant matches a DuckDB
    recomputation row for row (the oracle-able form)."""
    import duckdb
    import pandas as pd

    from smart_pdf_md_spark.operators.sketches import (
        bottomk_merge,
        bottomk_sample,
    )

    rows = [(i, f"doc text number {i}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k = 50

    whole = bottomk_sample(df, k, key_cols=["doc_id"])
    got = [tuple(r) for r in whole.collect()]
    assert len(got) == k
    got16 = [tuple(r) for r in
             bottomk_sample(df.repartition(16), k,
                            key_cols=["doc_id"]).collect()]
    assert got == got16                    # pure function of the set

    a = bottomk_sample(df.filter("doc_id < 1000"), k, key_cols=["doc_id"])
    b = bottomk_sample(df.filter("doc_id >= 1000"), k, key_cols=["doc_id"])
    merged = [tuple(r) for r in bottomk_merge(k, a, b).collect()]
    assert merged == got                   # KMV merge property

    # uniformity smoke: the sampled ids are spread, not clustered
    ids = sorted(r[0] for r in got)
    assert ids[0] < 200 and ids[-1] > 1800

    # oracle-able md5_48 variant vs DuckDB
    pd_df = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", pd_df)
    want = con.execute(r"""
    SELECT doc_id, text,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31)
                || 'bk_v1'), 1, 12) AS BIGINT) AS bk_hash
    FROM docs ORDER BY bk_hash, doc_id LIMIT 50
    """).df()
    got_md5 = (bottomk_sample(df, k, key_cols=["doc_id"],
                              hash_fn="md5_48")
               .toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got_md5, want, check_dtype=False)


def test_mg_heavy_hitters_bounds_and_merge(spark):
    """Misra-Gries summary: ≤ k rows; every estimate is a lower bound
    within N/(k+1) of truth; every key with true count > N/(k+1) is
    present; shard summaries merge with the additive bound."""
    from smart_pdf_md_spark.operators.sketches import mg_merge, mg_summary

    # zipf-ish: key j appears ~ 3000/j times, plus a long singleton tail
    rows = []
    for j in range(1, 21):
        rows += [(f"hot{j}",)] * (3000 // j)
    rows += [(f"tail{i}",) for i in range(4000)]
    import random
    random.Random(5).shuffle(rows)
    df = spark.createDataFrame(rows, ["tok"]).repartition(8)
    n = len(rows)
    truth = {}
    for (t,) in rows:
        truth[t] = truth.get(t, 0) + 1

    k = 32
    summ = {r.key: r.est for r in mg_summary(df, "tok", k).collect()}
    assert len(summ) <= k
    bound = n / (k + 1)
    for key, est in summ.items():
        assert est <= truth[key]                  # lower bound
        assert truth[key] - est <= bound + 1e-9   # MG guarantee
    for key, cnt in truth.items():
        if cnt > bound:
            assert key in summ, (key, cnt, bound)

    # shard-merge keeps the additive bound
    s1 = mg_summary(df.filter(F.xxhash64("tok") % 2 == 0), "tok", k)
    s2 = mg_summary(df.filter(F.xxhash64("tok") % 2 == 1), "tok", k)
    merged = {r.key: r.est for r in mg_merge(k, s1, s2).collect()}
    assert len(merged) <= k
    for key, est in merged.items():
        assert est <= truth[key]
        assert truth[key] - est <= 2 * bound + 1e-9
    for key, cnt in truth.items():
        if cnt > 2 * bound:
            assert key in merged


def test_bottomk_plan_is_take_ordered_not_global_sort(spark):
    """Scale pin: bottom-k compiles to TakeOrderedAndProject (per-
    partition heaps, k-bounded driver merge) — never a global Sort +
    Exchange of the corpus."""
    from smart_pdf_md_spark.operators.sketches import bottomk_sample

    df = spark.range(100000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"))
    plan = bottomk_sample(df, 20, key_cols=["doc_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_grouped_quantiles_accuracy_and_shape(spark):
    """Per-group quantiles from per-group log-histograms, as DataFrame
    ops: every estimate within the 2^(1/k)-1 relative bound of the exact
    per-group percentile; zeros interpolate as 0; invalid q rejected."""
    import pytest

    from smart_pdf_md_spark.operators.sketches import grouped_quantiles

    rows = ([("a", float(i + 1)) for i in range(1000)] +        # 1..1000
            [("b", 2.0 ** (i % 10)) for i in range(500)] +      # log-spread
            [("z", 0.0)] * 10 + [("z", 8.0)] * 10)
    df = spark.createDataFrame(rows, ["g", "v"])
    k = 8
    tol = 2 ** (1.0 / k) - 1
    got = {(r.g, r.q): r.est for r in
           grouped_quantiles(df, "v", "g", [0.5, 0.9], k=k).collect()}

    import numpy as np
    vals = {"a": np.array([v for g, v in rows if g == "a"]),
            "b": np.array([v for g, v in rows if g == "b"]),
            "z": np.array([v for g, v in rows if g == "z"])}
    for g in ("a", "b"):
        for q in (0.5, 0.9):
            # rank semantics (the sketch walks cumulative counts to the
            # rank), not numpy's default linear interpolation
            exact = float(np.quantile(vals[g], q, method="inverted_cdf"))
            assert abs(got[(g, q)] - exact) / exact <= tol + 0.02, \
                (g, q, got[(g, q)], exact)
    assert got[("z", 0.5)] == 0.0            # zero bucket ranks first
    assert abs(got[("z", 0.9)] - 8.0) / 8.0 <= tol

    with pytest.raises(ValueError, match="outside"):
        grouped_quantiles(df, "v", "g", [1.5])
