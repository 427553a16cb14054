"""Pure-Python single-process reference extractor ("the reference's triple
set" for the P/R ≥ 0.95 gate, per SURVEY.md §5.2).

Mirrors the reference's own testing approach of comparing engine output
against content planted in generated fixtures
(/root/reference/tests/test_fast_path.py:27-35 asserts output substrings).
Here the whole pipeline is checked instead: the oracle walks the corpus
sequentially (exactly like the reference's `for f in files: process_one(f)`
loop, cli.py:600-612) and emits golden mentions and triples.

Routing semantics replicated from the reference's `process_one`
(core.py:1108-1155): python → AST engine, SyntaxError → regex fallback
(engine fallback chains, core.py:795-797); other supported langs → regex
engine; unsupported/binary → skipped with zero mentions.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from .functions.patterns import (
    SUPPORTED_LANGS,
    extract_ast_mentions,
    extract_regex_mentions,
    triple_for,
)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def file_id_for(repo: str, path: str, commit: str) -> str:
    return hashlib.sha256(f"{repo}\x1f{path}\x1f{commit}".encode("utf-8")).hexdigest()


def oracle_mentions_for_row(repo: str, path: str, commit: str, lang: str,
                            content: str) -> list[dict]:
    """Golden mentions for one file row (route → extract → fallback)."""
    if lang not in SUPPORTED_LANGS or not content:
        return []
    if lang == "python":
        try:
            raw = extract_ast_mentions(content)
            route = "ast"
        except SyntaxError:
            raw = extract_regex_mentions(content, "python")
            route = "regex_fallback"
    else:
        raw = extract_regex_mentions(content, lang)
        route = "regex"
    fid = file_id_for(repo, path, commit)
    sha = sha256_hex(content)
    return [
        {"file_id": fid, "repo": repo, "path": path, "commit": commit,
         "lang": lang, "content_sha256": sha, "route": route,
         "mention_id": mention_id_for(fid, m["kind"], m["name"], m["line"]),
         **m}
        for m in raw
    ]


def mention_id_for(file_id: str, kind: str, name: str, line: int) -> str:
    """Same formula the Spark stage computes JVM-side (extract.py)."""
    return hashlib.sha256(
        f"{file_id}\x1f{kind}\x1f{name}\x1f{line}".encode("utf-8")
    ).hexdigest()[:16]


def oracle_mentions(corpus: pd.DataFrame) -> pd.DataFrame:
    rows: list[dict] = []
    for r in corpus.itertuples(index=False):
        rows.extend(oracle_mentions_for_row(r.repo, r.path, r.commit, r.lang, r.content))
    cols = ["file_id", "repo", "path", "commit", "lang", "content_sha256",
            "route", "kind", "name", "qualifier", "line", "enclosing",
            "span", "mention_id"]
    return pd.DataFrame(rows, columns=cols)


def oracle_triples(corpus: pd.DataFrame) -> pd.DataFrame:
    """Golden (subj, pred, obj) set — deduplicated, like the target sink."""
    mentions = oracle_mentions(corpus)
    seen: set[tuple] = set()
    rows = []
    for r in mentions.itertuples(index=False):
        t = triple_for(r.repo, r.path, r.kind, r.name, r.enclosing)
        if t not in seen:
            seen.add(t)
            rows.append({"subj": t[0], "pred": t[1], "obj": t[2]})
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"])


def precision_recall(emitted: pd.DataFrame, golden: pd.DataFrame) -> tuple[float, float]:
    """P/R on (subj, pred, obj) sets — the J6 correctness join, driver-side."""
    e = {tuple(t) for t in emitted[["subj", "pred", "obj"]].itertuples(index=False)}
    g = {tuple(t) for t in golden[["subj", "pred", "obj"]].itertuples(index=False)}
    if not e or not g:
        return (0.0, 0.0)
    hit = len(e & g)
    return (hit / len(e), hit / len(g))
