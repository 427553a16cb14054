"""DSIR importance weighting: planted-signal direction, numpy parity on
the log-ratio arithmetic, partitioning invariance, deterministic
Gumbel-top-k resampling."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from smart_pdf_md_spark.operators import importance as IM


def _corpora(spark):
    sci = ["quantum field energy state operator spectrum phase lattice",
           "energy spectrum of the quantum lattice operator phase model",
           "field operator algebra and the energy spectrum of states"]
    cook = ["simmer the onions with butter and add garlic and salt",
            "whisk the eggs with cream then fold in butter and salt"]
    raw_rows = [(i, t) for i, t in enumerate(sci + cook)] + [(97, "")]
    tgt_rows = [(1000 + i, t) for i, t in enumerate(sci)]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    return raw, tgt


def test_dsir_logratio_planted_signal_and_numpy_parity(spark):
    raw, tgt = _corpora(spark)
    got = IM.dsir_logratio(raw, tgt, n_buckets=512).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # empty doc emits no row; science docs score ABOVE cooking docs
    assert set(got.doc_id) == {0, 1, 2, 3, 4}
    sci_min = got[got.doc_id <= 2].log_ratio.min()
    cook_max = got[got.doc_id >= 3].log_ratio.max()
    assert sci_min > cook_max

    # recompute the log-ratio arithmetic in numpy from the operator's own
    # feature tables (xxhash64 has no host-side twin — the parity pins the
    # DISTRIBUTION/JOIN math, the hashing is pinned by invariance below)
    rf = IM.dsir_features(raw, 512).toPandas()
    tf = IM.dsir_features(tgt, 512).toPandas()
    s, B = 1.0, 512
    raw_n = rf.groupby("bucket").cnt.sum()
    tgt_n = tf.groupby("bucket").cnt.sum()
    raw_tot, tgt_tot = raw_n.sum(), tgt_n.sum()
    for _, row in got.iterrows():
        mine = rf[rf.doc_id == row.doc_id]
        lr = sum(
            c * (math.log((tgt_n.get(b, 0) + s) / (tgt_tot + s * B))
                 - math.log((raw_n.get(b, 0) + s) / (raw_tot + s * B)))
            for b, c in zip(mine.bucket, mine.cnt))
        assert abs(row.log_ratio - round(lr + 1e-9, 4)) < 5e-4, row.doc_id
        assert row.n_feats == mine.cnt.sum()


@pytest.mark.slow
def test_dsir_partitioning_invariance_and_resample_determinism(spark):
    raw, tgt = _corpora(spark)
    a = IM.dsir_logratio(raw.repartition(1), tgt, n_buckets=512).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = IM.dsir_logratio(raw.repartition(8), tgt.repartition(4),
                         n_buckets=512).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    scored = IM.dsir_logratio(raw, tgt, n_buckets=512)
    s1 = {r.doc_id for r in IM.dsir_resample(scored, 3).collect()}
    s2 = {r.doc_id
          for r in IM.dsir_resample(scored.repartition(8), 3).collect()}
    assert s1 == s2 and len(s1) == 3

    # near-zero temperature → softmax collapses to argmax: the selection
    # is exactly the top-n by weight
    cold = {r.doc_id
            for r in IM.dsir_resample(scored, 3, temperature=1e-6).collect()}
    top3 = set(np.array(
        scored.toPandas().sort_values(
            ["log_ratio", "doc_id"], ascending=[False, True])
        .doc_id.iloc[:3]))
    assert cold == top3

    # distinct salts decorrelate draws (not necessarily disjoint, but the
    # keys must differ)
    d1 = IM.dsir_resample(scored, 3, salt="a").toPandas()
    d2 = IM.dsir_resample(scored, 3, salt="b").toPandas()
    assert not d1._gumbel_key.equals(d2._gumbel_key)
