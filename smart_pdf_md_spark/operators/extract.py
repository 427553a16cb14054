"""Vectorized mention extraction — the engine layer as ONE mapInArrow stage.

Replaces the reference's 24 converter engines + dispatcher + retry driver
(/root/reference/src/smart_pdf_md/core.py:277-1074) with a single
Arrow-batched stage (SURVEY.md §2.6 mapping). Per batch of file rows it:

1. routes (AST for parseable python, regex otherwise — SyntaxError falls back
   to regex, recorded as ``route_used='regex_fallback'``; analogue of the
   borb→pypdf / unopenable-PDF fallbacks, core.py:795-797, 1041-1048);
2. chunks oversized regex-route files into line ranges with geometric backoff
   (R1: the ``--slice`` loop, core.py:1036-1074 — on failure the chunk halves
   and the SAME start retries; at the floor the file gets status
   'backoff_exhausted', the rc-2 analogue);
3. never raises (R3 crash isolation, core.py:1153-1155): failures become
   ``(status, rc)`` columns per file;
4. re-verifies the sha256 lineage invariant against the ingest column.

Fault injection (analogue of SMART_PDF_MD_MARKER_MOCK_FAIL*, core.py:38-44):
- ``KG_MOCK_FAIL=1`` → raise on content containing the poison marker;
- ``KG_MOCK_FAIL_IF_CHUNK_GT=n`` → any chunk larger than n lines fails,
  forcing the backoff path;
- ``KG_MOCK_SLEEP_PER_CHUNK`` / ``KG_MOCK_SLEEP_AST`` → slow-engine sleeps
  (timeout-path tests);
- ``KG_MOCK_FAIL_ONCE=<nonce>`` → the FIRST attempt per worker process (per
  nonce) raises — a transient failure, for pinning that non-'ok' outcomes
  are never memoized.

Scale notes: the stage is embarrassingly parallel per file; the pipeline
repartitions on ``xxhash64(file_id)`` beforehand so a mega-repo cannot pin
one task (J5). ``content`` enters this stage and never leaves it — only
``content_sha256`` survives (column-pruning discipline, SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.patterns import (
    assign_enclosing,
    dedupe_mentions,
    extract_ast_mentions,
    extract_regex_mentions,
)

POISON_MARKER = "__KG_POISON__"
DEFAULT_CHUNK_LINES = 1500
MIN_CHUNK_LINES = 100
# When a per-file budget is set, python files larger than this skip the AST
# parse entirely (status 'timeout'): ast.parse is not preemptible
# in-process, so a pathological giant would blow straight through the
# deadline the caller asked for (r4 VERDICT "what's missing" #3).
AST_TIMEOUT_MAX_BYTES = 2_000_000

FILE_MARKER = "__file__"  # kind value for per-file status rows

# Arrow-stage output; mention_id is appended afterwards as a pure Column
# expr (sha2 in codegen — zero Python cost in the hot loop)
_ARROW_SCHEMA = (
    "file_id string, repo string, path string, commit string, lang string, "
    "content_sha256 string, sha_match boolean, route_used string, "
    "kind string, name string, qualifier string, line int, enclosing string, "
    "span array<int>, status string, rc int"
)
# Full mentions schema (SURVEY §1.2): span = [col_start, col_end) of the
# name token on its line; mention_id = first 16 hex of
# sha256(file_id␟kind␟name␟line) — a stable join key for consumers that
# want to highlight source ranges. Null on '__file__' status rows.
MENTION_SCHEMA = _ARROW_SCHEMA + ", mention_id string"

# status → rc taxonomy (SURVEY.md §2.7 exit-code contract)
RC_OK = 0
RC_EMPTY = 1               # no input (missing-input rc 1)
RC_BACKOFF_EXHAUSTED = 2   # min-slice failure rc 2
RC_UNSUPPORTED = 4         # missing engine dependency rc 4
RC_ERROR = 9               # unhandled per-file error rc 9


class _MockChunkFailure(Exception):
    pass


# worker-process-global: nonces whose one-shot mock failure already fired
_FAIL_ONCE_SEEN: set[str] = set()


class _FileTimeout(Exception):
    """Per-file wall-clock budget exceeded (the reference's -t/--timeout,
    cli.py:331-335 — parsed there but never consulted; given real semantics
    here)."""


def _chunked_regex(content: str, lang: str, chunk_lines: int,
                   fail_if_gt: int | None, deadline: float | None = None,
                   sleep_per_chunk: float = 0.0) -> list[dict] | None:
    """R1 slice loop. Returns None when backoff is exhausted (rc 2); raises
    _FileTimeout past `deadline` — checked at slice boundaries, mirroring
    the reference's slice-granular execution model (a single regex pass is
    not preemptible in-process)."""
    import time as _time

    lines = content.split("\n")
    total = len(lines)
    start, cur = 0, chunk_lines
    out: list[dict] = []
    while start < total:
        if deadline is not None and _time.monotonic() > deadline:
            raise _FileTimeout()
        if sleep_per_chunk:
            _time.sleep(sleep_per_chunk)  # fault injection: slow engine
        end = min(start + cur, total)
        try:
            if fail_if_gt is not None and (end - start) > fail_if_gt:
                raise _MockChunkFailure()
            out.extend(
                extract_regex_mentions("\n".join(lines[start:end]), lang,
                                       line_offset=start)
            )
            start = end  # success advances; cur keeps its (possibly reduced) size
        except _MockChunkFailure:
            if cur <= MIN_CHUNK_LINES:
                return None
            cur = max(MIN_CHUNK_LINES, cur // 2)  # halve, retry same start
    # chunk-local enclosing is wrong across boundaries — recompute globally
    return dedupe_mentions(assign_enclosing(out))


def _extract_one(row, chunk_lines: int, mock_fail: bool,
                 fail_if_gt: int | None, timeout_sec: float | None = None,
                 sleep_per_chunk: float = 0.0,
                 sleep_ast: float = 0.0,
                 fail_once: str = "") -> tuple[list[dict], str, str, int]:
    """→ (mentions, route_used, status, rc). Never raises.

    ``timeout_sec`` is the per-file wall-clock budget (the reference's
    ``-t/--timeout``): enforced cooperatively at slice boundaries of the
    chunked regex loop, around the single-shot regex pass, and around the
    AST parse (which is additionally size-pre-gated — a non-preemptible
    parse of a pathological giant cannot honor any budget, r4 VERDICT
    "what's missing" #3); on expiry the file gets status 'timeout' / rc 9
    (a per-file conversion failure — the run continues, R3 isolation)."""
    content, route, lang = row.content, row.route, row.lang
    if route == "unknown_engine":
        # forced --engine with an unknown value → rc 9, like the reference's
        # "unknown engine" error (core.py:1005-1006); distinct from rc-4 skip
        return [], "unknown_engine", "unknown_engine", RC_ERROR
    if route == "skip":
        if not content:
            return [], "skip", "empty", RC_EMPTY
        return [], "skip", "unsupported_lang", RC_UNSUPPORTED
    import time as _time
    deadline = (_time.monotonic() + timeout_sec) if timeout_sec else None
    try:
        if mock_fail and POISON_MARKER in content:
            raise RuntimeError("mock poison failure")
        if fail_once and fail_once not in _FAIL_ONCE_SEEN:
            _FAIL_ONCE_SEEN.add(fail_once)
            raise RuntimeError("mock transient failure")
        route_used = route
        raw: list[dict] | None = None
        if route == "ast":
            if deadline is not None and len(content) > AST_TIMEOUT_MAX_BYTES:
                raise _FileTimeout()  # size pre-gate: parse can't be budgeted
            if sleep_ast:
                _time.sleep(sleep_ast)  # fault injection: slow AST engine
            if deadline is not None and _time.monotonic() > deadline:
                raise _FileTimeout()
            try:
                raw = extract_ast_mentions(content)
            except SyntaxError:
                route_used = "regex_fallback"
            # post-parse check: a parse that blew the budget still times the
            # file out (the budget is wall-clock, not best-effort)
            if deadline is not None and _time.monotonic() > deadline:
                raise _FileTimeout()
        if raw is None:  # regex route or AST fallback
            if content.count("\n") + 1 > chunk_lines:
                raw = _chunked_regex(content, lang, chunk_lines, fail_if_gt,
                                     deadline, sleep_per_chunk)
                if raw is None:
                    return [], route_used, "backoff_exhausted", RC_BACKOFF_EXHAUSTED
            else:
                if deadline is not None and _time.monotonic() > deadline:
                    raise _FileTimeout()  # ADVICE r4: single-shot path too
                if fail_if_gt is not None and content.count("\n") + 1 > fail_if_gt:
                    return [], route_used, "backoff_exhausted", RC_BACKOFF_EXHAUSTED
                raw = extract_regex_mentions(content, lang)
        return raw, route_used, "ok", RC_OK
    except _FileTimeout:
        return [], route, "timeout", RC_ERROR
    except Exception:
        return [], route, "error", RC_ERROR


def extract_mentions(routed: DataFrame,
                     chunk_lines: int = DEFAULT_CHUNK_LINES,
                     timeout_sec: float | None = None) -> DataFrame:
    """routed(file_id.., route, content) → mention rows + per-file status rows.

    Output contains one ``kind='__file__'`` row per input file (the status
    channel) plus one row per mention. Use :func:`mentions_only` /
    :func:`file_status` to split. ``timeout_sec`` = per-file wall-clock
    budget (reference ``-t/--timeout``; see :func:`_extract_one`).
    """

    # Mock knobs are read on the DRIVER at plan-build time and captured in
    # the closure (Python workers are long-lived and reused, so executor-side
    # os.environ reads would see a stale environment).
    mock_fail = os.environ.get("KG_MOCK_FAIL", "") == "1"
    gt = os.environ.get("KG_MOCK_FAIL_IF_CHUNK_GT", "")
    fail_if_gt = int(gt) if gt else None
    sleep_per_chunk = float(os.environ.get("KG_MOCK_SLEEP_PER_CHUNK", "0") or 0)
    sleep_ast = float(os.environ.get("KG_MOCK_SLEEP_AST", "0") or 0)
    fail_once = os.environ.get("KG_MOCK_FAIL_ONCE", "")

    cols = ("file_id", "repo", "path", "commit", "lang", "content_sha256",
            "sha_match", "route_used", "kind", "name", "qualifier", "line",
            "enclosing", "span", "status", "rc")

    import pyarrow as pa

    out_schema = pa.schema([
        ("file_id", pa.string()), ("repo", pa.string()),
        ("path", pa.string()), ("commit", pa.string()),
        ("lang", pa.string()), ("content_sha256", pa.string()),
        ("sha_match", pa.bool_()), ("route_used", pa.string()),
        ("kind", pa.string()), ("name", pa.string()),
        ("qualifier", pa.string()), ("line", pa.int32()),
        ("enclosing", pa.string()), ("span", pa.list_(pa.int32())),
        ("status", pa.string()), ("rc", pa.int32())])
    out_types = {f.name: f.type for f in out_schema}

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        # mapInArrow, not mapInPandas (r10, guide §4.2): input columns read
        # via .to_pylist() (C path) instead of an Arrow→pandas object-array
        # conversion + itertuples, and output batches assemble from flat
        # Python lists with one typed pa.array call per column — no pandas
        # object-dtype intermediate on either side of the boundary. Values
        # are byte-identical to the previous pandas path (pinned by the
        # P/R gate and an old-vs-new row comparison).
        #
        # Per-PARTITION extraction memo: identical (content, lang, route)
        # triples — vendored duplicates that happen to colocate in a scan
        # split — are parsed once. Zero shuffle, composes with either
        # dedup_content mode (the global variant pays a full content
        # shuffle and is opt-in; this is the free fraction of that win).
        # Keyed by computed sha (collision-safe), capped so a pathological
        # partition of giant distinct files cannot hold every mention list.
        from types import SimpleNamespace

        memo: dict[tuple, tuple] = {}
        MEMO_MAX = 50_000
        for rb in batches:
            col = {n: rb.column(rb.schema.get_field_index(n)).to_pylist()
                   for n in ("file_id", "repo", "path", "commit", "lang",
                             "content_sha256", "route", "content")}
            out: dict[str, list] = {c: [] for c in cols}
            (c_fid, c_repo, c_path, c_commit, c_lang, c_sha, c_match, c_route,
             c_kind, c_name, c_qual, c_line, c_encl, c_span, c_status,
             c_rc) = (out[c] for c in cols)
            for fid, repo, path, commit, lang, sha_in, route, content in zip(
                    col["file_id"], col["repo"], col["path"], col["commit"],
                    col["lang"], col["content_sha256"], col["route"],
                    col["content"]):
                sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                match = sha == sha_in
                key = (sha, lang, route)
                hit = memo.get(key)
                if hit is None:
                    hit = _extract_one(
                        SimpleNamespace(content=content, route=route,
                                        lang=lang),
                        chunk_lines, mock_fail, fail_if_gt,
                        timeout_sec, sleep_per_chunk, sleep_ast, fail_once)
                    # memoize only 'ok': a timeout/transient failure on the
                    # first copy must not condemn every colocated identical
                    # file without its own attempt (ADVICE r4); non-ok
                    # outcomes are cheap to recompute anyway
                    if hit[2] == "ok" and len(memo) < MEMO_MAX:
                        memo[key] = hit
                mentions, route_used, status, rc = hit
                n = len(mentions) + 1
                c_fid.extend([fid] * n)
                c_repo.extend([repo] * n)
                c_path.extend([path] * n)
                c_commit.extend([commit] * n)
                c_lang.extend([lang] * n)
                c_sha.extend([sha_in] * n)
                c_match.extend([match] * n)
                c_route.extend([route_used] * n)
                c_kind.append(FILE_MARKER)
                c_name.append("")
                c_qual.append("")
                c_line.append(0)
                c_encl.append("")
                c_span.append(None)
                c_status.append(status)
                c_rc.append(rc)
                for m in mentions:
                    c_kind.append(m["kind"])
                    c_name.append(m["name"])
                    c_qual.append(m["qualifier"])
                    c_line.append(m["line"])
                    c_encl.append(m["enclosing"])
                    c_span.append(m["span"])
                    c_status.append("ok")
                    c_rc.append(RC_OK)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[c], type=out_types[c]) for c in cols],
                schema=out_schema)

    extracted = routed.mapInArrow(run, schema=_ARROW_SCHEMA)
    return extracted.withColumn("mention_id", mention_id_col())


def mention_id_col():
    """Stable per-mention join key, JVM-side (kind/name/line are unique per
    file after dedupe_mentions, so the id is unique per mention row). A pure
    derivation of columns that exist in every schema version — shared by
    extract_mentions and the resume-time backfill so the two can't drift."""
    return F.when(
        F.col("kind") != FILE_MARKER,
        F.substring(
            F.sha2(F.concat_ws("\x1f", "file_id", "kind", "name",
                               F.col("line").cast("string")), 256), 1, 16))


def ensure_mention_schema(extracted: DataFrame) -> DataFrame:
    """Backfill a pre-r3 committed mentions stage on read (ADVICE r3):
    snapshots committed before span/mention_id existed would otherwise make
    triples_from_mentions raise UNRESOLVED_COLUMN on resume. `mention_id`
    is recomputed with the exact extract-time expression (pure derivation);
    `span` cannot be re-derived without content, so it backfills as null —
    the same value status rows carry. No-op on current-schema frames."""
    if "span" not in extracted.columns:
        extracted = extracted.withColumn(
            "span", F.lit(None).cast("array<int>"))
    if "mention_id" not in extracted.columns:
        extracted = extracted.withColumn("mention_id", mention_id_col())
    return extracted


def mentions_only(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("kind") != FILE_MARKER)


def file_status(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("kind") == FILE_MARKER).select(
        "file_id", "repo", "path", "lang", "content_sha256", "sha_match",
        "route_used", "status", "rc")
