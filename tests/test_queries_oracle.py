"""M5: every `queries()` entry vs its DuckDB `oracle_sql()` — the same
comparison the driver runs (row count + column names + order-insensitive
value hash), at sf0.001 for speed. Rows-only entries are smoke-run."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Mirror the driver canonicalizer's hashing exactly: it sorts/uniques via
    # pandas Categorical, which cannot hash list cells. NO coddling (the
    # r1/r2 local-vs-driver divergences both hid behind a list→tuple branch
    # here) — a query returning array columns must fail locally too.
    pd.util.hash_pandas_object(df, index=False)  # raises TypeError on lists
    for c in df.columns:
        s = df[c]
        # normalize ints (spark int32 vs duckdb int64 etc.)
        if str(s.dtype).startswith(("int", "uint", "Int")):
            df[c] = s.astype("int64")
        if str(s.dtype) == "float32":
            df[c] = s.astype("float64")
        if str(s.dtype).startswith("datetime64"):
            t = pd.to_datetime(s).dt.tz_localize(None) if s.dt.tz is not None else s
            df[c] = t.astype("datetime64[ns]")
        if s.dtype == object:
            # decimal.Decimal (duckdb round) → float
            import decimal
            if len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, decimal.Decimal):
                df[c] = s.astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())
# The heaviest rows-only entries run slow-marked: the ORACLE pairs are the
# parity gate the default selection must keep (r4 VERDICT #8); rows-only
# queries only prove "runs + canonicalizes", which the driver's own sweep
# exercises every round anyway. One light rows-only smoke per family stays.
_SLOW_ROWS_ONLY = {"curation_chunks", "ann_topk_ivf", "ann_topk_pq"}
ROWS_ONLY = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ROWS_ONLY else n
    for n in sorted(set(entrymod.queries()) - set(ORACLE_NAMES))
]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    got = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    # dtype-STRICT after canon: the driver's value hash distinguishes int 1
    # from float 1.0 (duckdb sum(int)→HUGEINT→float64 vs spark int64), so a
    # post-canon dtype mismatch here means a driver hash_match=false. _canon
    # only normalizes benign width diffs (int32→int64, float32→float64,
    # Decimal→float, datetime resolution); int-vs-float must fail.
    assert [str(d) for d in got.dtypes] == [str(d) for d in want.dtypes], \
        f"{name}: dtypes {dict(got.dtypes.astype(str))} != {dict(want.dtypes.astype(str))}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    # round-trip the SAME canon the oracle pairs use: the driver
    # canonicalizes rows-only results too (r2: mm_extract_features ran
    # locally but died in the driver's Categorical hash on a list column)
    got = _canon(df.toPandas())
    assert len(df.schema.fields) > 0
    assert len(got) >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {f.name for f in df.schema.fields} == {
        "label", "n_docs", "avg_quality", "avg_tokens", "n_langs", "exemplar_doc"}


def test_pairs_is_exactly_fifty():
    """The driver's correctness sweep caps at 50 queries (dict-order prefix;
    r1 silently lost 3 rows past the cap). Adding a query means merging into
    or replacing an existing slot — this pin makes overflow a test failure
    instead of a silent driver omission."""
    assert len(entrymod._PAIRS) == 50, len(entrymod._PAIRS)
