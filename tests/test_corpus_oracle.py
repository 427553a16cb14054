"""M0: the corpus generator is deterministic; the oracle emits sane goldens."""

from __future__ import annotations

from smart_pdf_md_spark.corpus import FIXED_ROWS, corpus_pandas, generate_batch
from smart_pdf_md_spark.oracle import oracle_mentions, oracle_triples


def test_corpus_deterministic_and_order_independent():
    a = corpus_pandas(100)
    b = generate_batch(reversed(range(100))).sort_values("path").reset_index(drop=True)
    a2 = a.sort_values("path").reset_index(drop=True)
    assert a2.equals(b)


def test_corpus_archetypes_present(corpus_pdf):
    langs = set(corpus_pdf["lang"])
    assert {"python", "javascript", "go", "java", "rust", "ruby",
            "markdown", "binary"} <= langs
    assert (corpus_pdf["content"] == "").any()  # empty files
    assert corpus_pdf["path"].str.startswith("vendor/lib/").any()
    # vendored content is byte-identical across distinct repos
    vend = corpus_pdf[corpus_pdf["path"] == "vendor/lib/mod0.py"]
    if len(vend) > 1:
        assert vend["content"].nunique() == 1
        assert vend["repo"].nunique() > 1
    # mega-repo skew: org0/megarepo holds 30-50% of files
    frac = (corpus_pdf["repo"] == "org0/megarepo").mean()
    assert 0.25 < frac < 0.55
    assert len(corpus_pdf) >= FIXED_ROWS


def test_oracle_golden_shapes(corpus_pdf):
    m = oracle_mentions(corpus_pdf)
    t = oracle_triples(corpus_pdf)
    assert set(m["kind"]) == {"import", "def", "call", "doc_entity"}
    assert set(t["pred"]) == {"IMPORTS", "DEFINES", "CALLS", "MENTIONS"}
    # syntax-error rows took the fallback route
    assert (m["route"] == "regex_fallback").any()
    # binary/empty rows emit nothing
    skipped = corpus_pdf[(corpus_pdf["lang"] == "binary") | (corpus_pdf["content"] == "")]
    assert not m["file_id"].isin(
        {__import__("smart_pdf_md_spark.oracle", fromlist=["file_id_for"]).file_id_for(r.repo, r.path, r.commit)
         for r in skipped.itertuples(index=False)}
    ).any()
    # triples are unique
    assert not t.duplicated().any()


def test_oracle_known_by_construction():
    # Hand-checkable miniature: one python file with known content.
    import pandas as pd
    pdf = pd.DataFrame([{
        "repo": "o/r", "path": "a/b.py", "commit": "c" * 40, "lang": "python",
        "content": '"""Doc `EntX`."""\nimport os\nfrom core.utils import x\n\n'
                   "def alpha(v):\n    return beta(v)\n",
    }])
    t = oracle_triples(pdf)
    got = {tuple(r) for r in t.itertuples(index=False)}
    assert ("o/r/a/b.py", "IMPORTS", "os") in got
    assert ("o/r/a/b.py", "IMPORTS", "core.utils") in got
    assert ("o/r", "DEFINES", "alpha") in got
    assert ("alpha", "CALLS", "beta") in got  # symbol-space CALLS
    assert ("o/r/a/b.py", "MENTIONS", "EntX") in got
    assert len(got) == 5
