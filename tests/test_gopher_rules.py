"""Gopher/MassiveWeb quality-rule battery (Rae et al. 2021 A1.1): each
planted violation trips exactly its own rule, and the full metric table
matches a DuckDB recomputation bit-for-bit (board-candidate SQL twin)."""

from __future__ import annotations

import pandas as pd

from smart_pdf_md_spark.operators.textstats import gopher_rules

_GOOD = ("the story of it is on a hill and that day we have been " +
         " ".join(f"word{i} with more" for i in range(20)))


def _fixture():
    rows = [
        (0, _GOOD),                                   # passes everything
        (1, "the of and to"),                         # too few words
        (2, "the be to of and that have with " +
            " ".join("a b c d e" for _ in range(20))),   # mean len < 3
        (3, _GOOD + " " + "#" * 40),                  # symbol ratio
        (4, "\n".join("• " + _GOOD[:40] for _ in range(10))),  # bullets
        (5, "\n".join(_GOOD[:40] + "..." for _ in range(10))), # ellipsis
        (6, "the of and that " + " ".join("123456" for _ in range(60))),
        (7, " ".join(f"w{i} x{i} y{i}" for i in range(30))),   # no stops
        (8, ""),                                       # empty
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_gopher_rules_planted_violations(spark):
    docs = spark.createDataFrame(_fixture())
    got = {r.id: r for r in gopher_rules(docs).collect()}
    assert got[0].passes
    assert not got[1].r_words and got[1].r_stops
    assert not got[2].r_word_len and got[2].r_words is not None
    assert not got[3].r_symbol and got[3].symbol_ratio > 0.1
    assert not got[4].r_bullet and got[4].bullet_frac == 1.0
    assert not got[5].r_ellipsis and got[5].ellipsis_frac == 1.0
    assert not got[6].r_alpha and got[6].alpha_frac < 0.8
    assert not got[7].r_stops and got[7].stop_hits == 0
    assert not got[8].passes and got[8].n_words == 0
    for i in range(1, 9):
        assert not got[i].passes
    # metrics ride along for threshold tuning
    assert got[0].stop_hits >= 2 and got[0].alpha_frac >= 0.8


def test_gopher_rules_duckdb_parity(spark):
    import duckdb

    docs_pd = _fixture()
    docs = spark.createDataFrame(docs_pd)
    con = duckdb.connect()
    con.register("docs", docs_pd)
    want = con.execute(r"""
    WITH tk AS (
      SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      FROM docs
    ), ln AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)),
                         x -> length(x) > 0) AS ls
      FROM docs
    )
    SELECT tk.doc_id AS id,
      CAST(len(t) AS INT) AS n_words,
      round(CASE WHEN len(t) = 0 THEN 0.0 ELSE
        list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)
        END + 1e-9, 4) AS mean_word_len,
      round(CASE WHEN len(t) = 0 THEN 0.0 ELSE
        ((length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) / 3.0
         + (length(text) - length(replace(text, '…', '')))) / len(t)
        END + 1e-9, 4) AS symbol_ratio,
      round(CASE WHEN len(ls) = 0 THEN 0.0 ELSE
        len(list_filter(ls, x -> starts_with(x, '•') OR
            starts_with(x, '-') OR starts_with(x, '*'))) * 1.0 / len(ls)
        END + 1e-9, 4) AS bullet_frac,
      round(CASE WHEN len(ls) = 0 THEN 0.0 ELSE
        len(list_filter(ls, x -> ends_with(x, '...') OR
            ends_with(x, '…'))) * 1.0 / len(ls)
        END + 1e-9, 4) AS ellipsis_frac,
      round(CASE WHEN len(t) = 0 THEN 0.0 ELSE
        len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
        * 1.0 / len(t) END + 1e-9, 4) AS alpha_frac,
      CAST(len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
           ['the','be','to','of','and','that','have','with'])) AS INT)
        AS stop_hits
    FROM tk JOIN ln USING (doc_id) ORDER BY id
    """).df()
    got = (gopher_rules(docs)
           .select("id", "n_words", "mean_word_len", "symbol_ratio",
                   "bullet_frac", "ellipsis_frac", "alpha_frac",
                   "stop_hits")
           .toPandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_curation_gopher_knob(spark, tmp_path):
    """gopher=True adds the full rule battery to the filter stage's one
    select: a doc failing only a Gopher rule (stop-word-free) drops; the
    knob participates in the params digest (flip rebuilds); default off
    keeps prior behavior."""
    from smart_pdf_md_spark.plans.curation import run_curation

    good = ("the story of it is on a hill and that day we have been " +
            " ".join(f"word{i} with more" for i in range(20)))
    # passes the basic quality score (long, low punct) but has ZERO
    # Gopher stop words -> only the battery catches it
    sneaky = " ".join(f"w{i} x{i} y{i} z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, sneaky, "en")], ["doc_id", "text", "lang"])

    run_dir = str(tmp_path / "cur")
    base = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                        dedup_threshold=1.01)
    assert base["summary"]["after_filter"] == 2       # default: both pass

    res = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                       dedup_threshold=1.01, gopher=True)
    assert res["resumed"]["filtered"] is False        # knob -> rebuild
    ids = {r.doc_id for r in res["filtered"].select("doc_id").collect()}
    assert ids == {1}
    assert res["summary"]["after_filter"] == 1

    res2 = run_curation(spark, docs, run_dir, dup_ngram_max=None,
                        dedup_threshold=1.01, gopher=True)
    assert res2["resumed"]["filtered"] is True
