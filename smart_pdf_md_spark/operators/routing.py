"""Routing & textuality predicates as pure Column expressions (P1/P2).

Reference semantics being re-expressed:
- `is_textual` (core.py:252-274): a page is textual iff its non-whitespace
  char count ≥ min_chars; a file is textual iff textual_pages/total_pages
  ≥ min_ratio; empty/unopenable → False. Here "page" becomes "line".
- routing precedence (core.py:1108-1155): forced engine → mode → auto by
  textuality. Here: unsupported lang or empty content → 'skip'; python →
  'ast' (with runtime SyntaxError fallback to regex inside the extraction
  stage, mirroring the engine fallback chains); other supported → 'regex'.

Everything below is whole-stage-codegen-able (no UDFs): at 100 TB the routing
pass is a single scan with a filter that Catalyst pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.patterns import SUPPORTED_LANGS

# Reference defaults: MIN_CHARS env default is 10 (core.py:42 — the CLI help
# claims 100; the *code* value wins, SURVEY.md §2.2), MIN_RATIO 0.2 (core.py:43).
MIN_CHARS = 10
MIN_RATIO = 0.2

ROUTE_AST = "ast"
ROUTE_REGEX = "regex"
ROUTE_SKIP = "skip"
ROUTE_UNKNOWN_ENGINE = "unknown_engine"


def textuality_cols(df: DataFrame, min_chars: int = MIN_CHARS,
                    min_ratio: float = MIN_RATIO) -> DataFrame:
    """Adds n_lines, text_lines, text_ratio, is_textual (P1)."""
    lines = F.split(F.col("content"), "\n")
    text_lines = F.size(
        F.filter(lines, lambda l: F.length(F.regexp_replace(l, r"\s", "")) >= min_chars)
    )
    n_lines = F.size(lines)
    ratio = text_lines / F.greatest(n_lines, F.lit(1))
    return (
        df.withColumn("n_lines", n_lines)
        .withColumn("text_lines", text_lines)
        .withColumn("text_ratio", F.round(ratio, 6))
        .withColumn(
            "is_textual",
            (F.length(F.col("content")) > 0) & (ratio >= F.lit(min_ratio)),
        )
    )


def route_col(df: DataFrame, forced_route: str | None = None) -> DataFrame:
    """Adds the 'route' column (P2). `forced_route` is the analogue of the
    reference's forced `--engine`: an unknown forced value (including the
    reference quirk `-e auto`) routes everything to 'unknown_engine', which
    the extraction stage surfaces as rc 9 — the reference's "unknown engine"
    error (core.py:1005-1006), NOT the rc-4 unsupported-lang skip
    (taxonomy conflation flagged in VERDICT r1)."""
    if forced_route is not None:
        route = (
            F.lit(forced_route)
            if forced_route in (ROUTE_AST, ROUTE_REGEX, ROUTE_SKIP)
            else F.lit(ROUTE_UNKNOWN_ENGINE)
        )
        return df.withColumn("route", route)
    return df.withColumn(
        "route",
        F.when(
            ~F.col("lang").isin(*SUPPORTED_LANGS) | (F.length(F.col("content")) == 0),
            F.lit(ROUTE_SKIP),
        )
        .when(F.col("lang") == "python", F.lit(ROUTE_AST))
        .otherwise(F.lit(ROUTE_REGEX)),
    )
