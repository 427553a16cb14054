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
