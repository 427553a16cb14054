"""GPT-3-style quality classifier: planted separation, numpy parity of
the full-batch GD, determinism across partitionings."""

from __future__ import annotations

import numpy as np
import pytest

from smart_pdf_md_spark.operators.classifier import (
    quality_classifier_score,
    train_quality_classifier,
)


def _corpora(spark):
    tgt_rows = [(i, "the curated encyclopedia article explains " +
                 " ".join(f"concept{j} clearly" for j in range(6)))
                for i in range(6)]
    raw_rows = [(100 + i, "click here buy now " +
                 " ".join(f"spamword{j} offer{j}" for j in range(6)))
                for i in range(12)]
    # raw docs that LOOK like the target (should score high)
    raw_rows += [(200 + i, "the curated encyclopedia article explains "
                  + f"concept{i} clearly and concept{i+1} clearly")
                 for i in range(3)]
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    return tgt, raw


def test_quality_classifier_planted_separation(spark):
    tgt, raw = _corpora(spark)
    model = train_quality_classifier(tgt, raw, n_buckets=1 << 12,
                                     iters=25)
    scores = {r.doc_id: r.prob
              for r in quality_classifier_score(raw, model).collect()}
    spam = [scores[100 + i] for i in range(12)]
    lookalike = [scores[200 + i] for i in range(3)]
    tgt_scores = [r.prob
                  for r in quality_classifier_score(tgt, model).collect()]
    # the recipe's invariant is the ORDERING the threshold/pareto-sample
    # acts on: target > target-like raw > spam (lookalikes sat in the
    # negative training set, so their absolute calibration is pulled down)
    assert min(tgt_scores) > max(lookalike)
    assert min(lookalike) > max(spam)
    assert all(p < 0.5 for p in spam)
    assert all(p > 0.5 for p in tgt_scores)


@pytest.mark.slow
def test_quality_classifier_numpy_parity_and_invariance(spark):
    """The distributed GD equals the same full-batch GD run in numpy from
    the operator's OWN feature tables (float tolerances for distributed
    sum reassociation), and repartitioning the inputs moves nothing
    beyond those tolerances."""
    from smart_pdf_md_spark.operators.classifier import _norm_features

    tgt, raw = _corpora(spark)
    nb, iters, lr, l2 = 1 << 10, 15, 2.0, 1e-4
    model = train_quality_classifier(tgt, raw, n_buckets=nb, iters=iters,
                                     lr=lr, l2=l2)

    def feat_mat(df, label):
        rows = _norm_features(df, nb, "text", "doc_id").collect()
        docs = sorted({r.doc_id for r in rows})
        idx = {d: i for i, d in enumerate(docs)}
        X = np.zeros((len(docs), nb))
        for r in rows:
            X[idx[r.doc_id], r.bucket] = r.x
        return X, np.full(len(docs), label, dtype=np.float64)

    Xt, yt = feat_mat(tgt, 1.0)
    Xr, yr = feat_mat(raw, 0.0)
    X, y = np.vstack([Xt, Xr]), np.concatenate([yt, yr])
    n_pos, n_neg = int(yt.size), int(yr.size)
    cw = np.where(y == 1.0, (n_pos + n_neg) / (2.0 * n_pos),
                  (n_pos + n_neg) / (2.0 * n_neg))
    w, b, n = np.zeros(nb), 0.0, len(y)
    for _ in range(iters):
        e = (1.0 / (1.0 + np.exp(-(X @ w + b))) - y) * cw
        w -= lr * ((X.T @ e) / n + l2 * w)
        b -= lr * (e.sum() / n)
    got_w = np.zeros(nb)
    for r in model["weights"].collect():
        got_w[r.bucket] = r.w
    assert np.allclose(got_w, w, atol=1e-9)
    assert abs(model["bias"] - b) < 1e-9

    model8 = train_quality_classifier(tgt.repartition(8),
                                      raw.repartition(8),
                                      n_buckets=nb, iters=iters,
                                      lr=lr, l2=l2)
    got8 = np.zeros(nb)
    for r in model8["weights"].collect():
        got8[r.bucket] = r.w
    assert np.allclose(got8, got_w, atol=1e-9)


@pytest.mark.slow
def test_curation_classifier_stage(spark, tmp_path):
    """classifier_target + classifier_min_prob: the committed stage drops
    pool docs the trained classifier scores below the floor, keeps the
    prob audit column, resumes with unchanged params, and rebuilds when
    the floor moves."""
    from smart_pdf_md_spark.plans.curation import run_curation

    good = ("the story of it is on a hill and for the day it was a good "
            "one in the end with several additional words to pass")
    rows = [(i, good + " curated encyclopedia article explains "
             f"concept{i} clearly and well", "en") for i in range(5)]
    rows += [(100 + i, good + " click here buy now " +
              " ".join(f"spamword{j} offer{j}" for j in range(6)), "en")
             for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    target = spark.createDataFrame(
        [(900 + i, good + " curated encyclopedia article explains "
          f"concept{i} clearly and well") for i in range(4)],
        ["doc_id", "text"])

    run_dir = str(tmp_path / "cur")
    res = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                       dedup_threshold=1.01,
                       classifier_target=target, classifier_min_prob=0.5,
                       classifier_iters=25)
    ids = {r.doc_id for r in res["classifier"].select("doc_id").collect()}
    assert ids == set(range(5))               # spam pool drops
    assert "prob" in res["classifier"].columns
    assert res["summary"]["after_classifier"] == 5
    kept = {r.doc_id for r in res["kept"].select("doc_id").collect()}
    assert kept <= set(range(5))

    res2 = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                        dedup_threshold=1.01,
                        classifier_target=target, classifier_min_prob=0.5,
                        classifier_iters=25)
    assert res2["resumed"]["classifier"] is True

    res3 = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                        dedup_threshold=1.01,
                        classifier_target=target,
                        classifier_min_prob=0.01, classifier_iters=25)
    assert res3["resumed"]["classifier"] is False   # floor moved

    import pytest as _pt
    with _pt.raises(ValueError, match="classifier_target"):
        run_curation(spark, docs, run_dir, classifier_min_prob=0.5)


def test_pareto_keep_determinism_and_distribution(spark):
    """The hash-deterministic pareto keep rule (r8 VERDICT next-round
    #4): same kept set across calls and partitionings; the draw follows
    the Lomax inverse CDF — keep rates match the closed form
    P(keep | prob) = (2 - prob)^(-alpha) within sampling tolerance; a
    higher score keeps strictly more often."""
    from smart_pdf_md_spark.operators.classifier import pareto_keep

    n = 4000
    rows = ([(i, 0.5) for i in range(n)] +
            [(n + i, 0.9) for i in range(n)] +
            [(2 * n + i, 1.0) for i in range(n)])
    scored = spark.createDataFrame(rows, ["doc_id", "prob"])

    kept1 = {r.doc_id for r in
             pareto_keep(scored).filter("kept").collect()}
    kept8 = {r.doc_id for r in
             pareto_keep(scored.repartition(8)).filter("kept").collect()}
    assert kept1 == kept8                     # pure function of the id

    def rate(lo, hi):
        return len([d for d in kept1 if lo <= d < hi]) / n

    # alpha=9: P(X > 1-prob) = (1 + (1-prob))^-9
    assert abs(rate(0, n) - 1.5 ** -9) < 0.01            # ~0.026
    assert abs(rate(n, 2 * n) - 1.1 ** -9) < 0.025       # ~0.424
    assert rate(2 * n, 3 * n) > 0.999                    # prob=1 → keep
    assert rate(0, n) < rate(n, 2 * n) < rate(2 * n, 3 * n)

    import pytest as _pt
    with _pt.raises(ValueError, match="alpha"):
        pareto_keep(scored, alpha=0)


def test_train_sample_frac_contract(spark):
    """train_sample_frac (r8 VERDICT next-round #4): frac=1.0 trains on
    exactly the full pool (weights ≡ the frac=None model); a real sample
    still preserves the planted ordering the keep rules act on; the
    deterministic id-hash means two sampled runs agree bit-for-bit (to
    distributed-sum tolerance); invalid fractions are rejected."""
    import numpy as np

    tgt, raw = _corpora(spark)
    nb, iters = 1 << 10, 15

    def wvec(model):
        w = np.zeros(nb)
        for r in model["weights"].collect():
            w[r.bucket] = r.w
        return w

    full = wvec(train_quality_classifier(tgt, raw, n_buckets=nb,
                                         iters=iters))
    one = wvec(train_quality_classifier(tgt, raw, n_buckets=nb,
                                        iters=iters,
                                        train_sample_frac=1.0))
    assert np.allclose(full, one, atol=1e-9)

    m_a = train_quality_classifier(tgt, raw, n_buckets=nb, iters=iters,
                                   train_sample_frac=0.7)
    m_b = train_quality_classifier(tgt.repartition(8), raw.repartition(8),
                                   n_buckets=nb, iters=iters,
                                   train_sample_frac=0.7)
    assert np.allclose(wvec(m_a), wvec(m_b), atol=1e-9)

    scores = {r.doc_id: r.prob
              for r in quality_classifier_score(raw, m_a).collect()}
    spam = [scores[100 + i] for i in range(12)]
    lookalike = [scores[200 + i] for i in range(3)]
    assert min(lookalike) > max(spam)          # ordering survives sampling

    with pytest.raises(ValueError, match="train_sample_frac"):
        train_quality_classifier(tgt, raw, train_sample_frac=0.0)


@pytest.mark.slow
def test_curation_classifier_pareto_stage(spark, tmp_path):
    """classifier_pareto_alpha: the stochastic keep rule runs as a
    committed stage (train_frac recorded in params), resumes on
    unchanged knobs, rebuilds when alpha moves, and refuses both keep
    rules at once."""
    from smart_pdf_md_spark.plans.curation import run_curation

    good = ("the story of it is on a hill and for the day it was a good "
            "one in the end with several additional words to pass")
    rows = [(i, good + " curated encyclopedia article explains "
             f"concept{i} clearly and well", "en") for i in range(5)]
    rows += [(100 + i, good + " click here buy now " +
              " ".join(f"spamword{j} offer{j}" for j in range(6)), "en")
             for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    target = spark.createDataFrame(
        [(900 + i, good + " curated encyclopedia article explains "
          f"concept{i} clearly and well") for i in range(4)],
        ["doc_id", "text"])

    run_dir = str(tmp_path / "cur")
    kw = dict(dup_ngram_max=None, dedup_threshold=1.01,
              classifier_target=target, classifier_iters=25,
              classifier_train_frac=1.0)
    # pool docs sit in the NEGATIVE training set, so even target-like
    # ones calibrate below 0.5 (the r8 ordering-not-calibration caveat) —
    # pin the rule's MONOTONICITY in alpha, not absolute keep sets: a
    # soft alpha keeps nearly everything, a harsh one strictly less.
    res = run_curation(spark, docs, run_dir,
                       classifier_pareto_alpha=0.02, **kw)
    assert "prob" in res["classifier"].columns
    soft = {r.doc_id for r in res["classifier"].select("doc_id").collect()}
    assert len(soft) >= 8                     # (2-p)^-0.02 ≈ 0.99 each

    res2 = run_curation(spark, docs, run_dir,
                        classifier_pareto_alpha=0.02, **kw)
    assert res2["resumed"]["classifier"] is True
    soft2 = {r.doc_id
             for r in res2["classifier"].select("doc_id").collect()}
    assert soft2 == soft                      # hash-deterministic

    res3 = run_curation(spark, docs, run_dir,
                        classifier_pareto_alpha=30.0, **kw)
    assert res3["resumed"]["classifier"] is False   # alpha moved
    harsh = {r.doc_id
             for r in res3["classifier"].select("doc_id").collect()}
    assert len(harsh) < len(soft)             # harsher alpha keeps less

    with pytest.raises(ValueError, match="exactly one keep rule"):
        run_curation(spark, docs, run_dir, classifier_target=target,
                     classifier_min_prob=0.5, classifier_pareto_alpha=9.0)
    with pytest.raises(ValueError, match="exactly one keep rule"):
        run_curation(spark, docs, run_dir, classifier_target=target)
