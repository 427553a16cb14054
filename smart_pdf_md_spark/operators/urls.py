"""URL filtering — the first gate of every web-scale curation recipe
(RefinedWeb §3.1, Penedo et al. 2023; CCNet; Dolma): normalize the URL,
drop documents from blocked DOMAINS (suffix-matched, so a blocked
``spam.example`` also blocks ``cdn.spam.example``), and score the URL
against a weighted keyword list for softer thresholds.

Spark-first shapes:

- normalization is pure Columns (lowercase scheme/host, strip fragment,
  default ports, trailing slashes, and tracking query params) — rides
  the scan, ANSI-expressible (DuckDB parity in tests);
- domain blocking explodes each host into its O(labels) parent suffixes
  and LEFT SEMI joins the broadcast blocklist — never a per-row loop
  over the list, never a regex alternation that grows with it. The
  blocklist is list-sized; the corpus side is (docs × ~4 suffix) slim
  strings pruned map-side by the broadcast;
- keyword scoring is a bounded sum over the (small, literal) word list,
  evaluated scan-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params stripped by url_normalize (order-insensitively)
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref")


def url_normalize(url: Column) -> Column:
    """Canonical URL form: lowercase scheme+host, strip ``www.``, the
    fragment, default ports (:80/:443), tracking query params
    (TRACKING_PARAMS), an emptied ``?``, and a single trailing slash on a
    non-root path. Pure string/regexp Columns — no UDF, same regex
    dialect subset as DuckDB (parity pinned)."""
    u = F.trim(url)
    # lowercase the scheme://host[:port] prefix only (paths are
    # case-significant): lowered head + original tail
    head = F.lower(F.regexp_extract(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    u2 = F.concat(head, F.substring(u, F.length(head) + 1, F.lit(1 << 30)))
    u2 = F.regexp_replace(u2, r"#.*$", "")                   # fragment
    u2 = F.regexp_replace(u2, r"^(https?://)www\.", r"$1")   # www.
    u2 = F.regexp_replace(u2, r"^(http://[^/:?#]*):80(/|\?|$)", r"$1$2")
    u2 = F.regexp_replace(u2, r"^(https://[^/:?#]*):443(/|\?|$)", r"$1$2")
    for p in TRACKING_PARAMS:
        u2 = F.regexp_replace(u2, rf"([?&]){p}=[^&#]*&?", r"$1")
    u2 = F.regexp_replace(u2, r"[?&]+$", "")                 # emptied query
    u2 = F.regexp_replace(u2, r"\?&", "?")
    u2 = F.regexp_replace(u2, r"(://[^/?#]+/[^?#]*?)/+(\?|$)", r"$1$2")
    return u2


def url_host(url: Column) -> Column:
    """Host of a normalized-or-raw URL, lowercased, port stripped."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def host_suffixes(host: Column, max_labels: int = 6) -> Column:
    """Array of the host's parent suffixes, itself included:
    ``a.b.c`` → [a.b.c, b.c, c] — the relation a blocked-DOMAIN check
    joins on (a block of ``b.c`` blocks every subdomain). Bounded at
    ``max_labels`` labels; pure Columns."""
    parts = F.split(host, r"\.")
    n = F.least(F.size(parts), F.lit(max_labels))
    return F.filter(
        F.transform(F.sequence(F.lit(0), n - 1),
                    lambda i: F.array_join(
                        F.slice(parts, i + 1, F.size(parts)), ".")),
        lambda s: F.length(s) > 0)


def filter_blocked_domains(docs: DataFrame, blocked: DataFrame,
                           url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """Drop docs whose URL host OR any parent domain is in ``blocked``
    (one ``domain`` column). Shape: explode each doc's ≤6 host suffixes,
    LEFT SEMI join the broadcast blocklist to find hits, then LEFT ANTI
    the hit ids off the doc stream — two slim exchanges of (id, suffix)
    strings, blocklist-sized build sides, no corpus regex alternation."""
    sufs = docs.select(F.col(id_col).alias("_id"),
                       F.explode(host_suffixes(url_host(F.col(url_col))))
                       .alias("domain"))
    hit_ids = (sufs.join(F.broadcast(blocked.select(
        F.lower(F.col("domain")).alias("domain")).distinct()), "domain",
        "left_semi").select("_id").distinct())
    return docs.join(hit_ids.withColumnRenamed("_id", id_col),
                     id_col, "left_anti")


def url_keyword_score(url: Column, weights: dict[str, float]) -> Column:
    """Weighted count of blocklist KEYWORDS contained in the lowercased
    URL (the RefinedWeb soft signal — threshold it instead of hard
    domain blocks). The word list is literal and bounded, so the sum is
    a fixed scan-side expression; rounded per the driver contract."""
    if not weights:
        raise ValueError("weights must name at least one keyword")
    low = F.lower(url)
    score = None
    for word, w in sorted(weights.items()):
        term = F.when(low.contains(word.lower()), F.lit(float(w))) \
            .otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return F.round(score + 1e-9, 4)


def dedup_by_url(docs: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact URL-level dedup — the CCNet/RefinedWeb re-crawl step: two
    fetches of the same canonical URL keep only the min-id copy (ties on
    the NORMALIZED form, so ``http://www.a.com/x?utm_source=y`` and
    ``https://a.com/x`` variants collapse when normalization agrees).
    Returns docs + (url_norm, url_dup_count, is_url_keeper); filter on
    ``is_url_keeper``. One hash agg + one join, both keyed on the 8-byte
    xxhash64 of the normalized URL (the dedup_paragraphs exchange
    discipline — URL strings never ride a shuffle as the key)."""
    norm = url_normalize(F.col(url_col))
    keyed = docs.withColumn("url_norm", norm) \
        .withColumn("_uh", F.xxhash64("url_norm"))
    firsts = (keyed.groupBy("_uh")
              .agg(F.min(F.col(id_col)).alias("_keep_id"),
                   F.count("*").alias("url_dup_count")))
    return (keyed.join(firsts, "_uh")
            .withColumn("is_url_keeper", F.col(id_col) == F.col("_keep_id"))
            .drop("_uh", "_keep_id"))
