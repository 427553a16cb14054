"""Property-based tests (hypothesis) for the extraction semantics layer —
no Spark needed; these pin the invariants the distributed stages rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from smart_pdf_md_spark.functions.patterns import (
    SUPPORTED_LANGS,
    assign_enclosing,
    dedupe_mentions,
    extract_regex_mentions,
)
from smart_pdf_md_spark.operators.extract import _chunked_regex

text_like = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=2000,
)


@settings(max_examples=200, deadline=None)
@given(content=text_like, lang=st.sampled_from(SUPPORTED_LANGS))
def test_regex_extraction_never_throws_and_lines_in_range(content, lang):
    mentions = extract_regex_mentions(content, lang)
    n_lines = content.count("\n") + 1
    for m in mentions:
        assert 1 <= m["line"] <= n_lines
        assert m["kind"] in {"import", "def", "call", "doc_entity"}
        assert m["name"]


@settings(max_examples=100, deadline=None)
@given(content=text_like, lang=st.sampled_from(("python", "javascript", "go")),
       chunk=st.integers(min_value=100, max_value=400))
def test_chunked_equals_whole_file(content, lang, chunk):
    """R1 chunking must be semantically invisible at ANY chunk size —
    the property that makes the backoff loop safe to apply."""
    whole = extract_regex_mentions(content, lang)
    chunked = _chunked_regex(content, lang, chunk, fail_if_gt=None)
    key = lambda m: (m["line"], m["kind"], m["name"], m["enclosing"])  # noqa: E731
    assert sorted(map(key, chunked)) == sorted(map(key, whole))


@settings(max_examples=100, deadline=None)
@given(content=text_like)
def test_extraction_deterministic(content):
    a = extract_regex_mentions(content, "python")
    b = extract_regex_mentions(content, "python")
    assert a == b


@settings(max_examples=100, deadline=None)
@given(lines=st.lists(st.sampled_from(
    ["def alpha(x):", "    beta(x)", "import os", "", "gamma()", "class Z:"]),
    max_size=60))
def test_enclosing_assignment_is_order_independent(lines):
    content = "\n".join(lines)
    m1 = extract_regex_mentions(content, "python")
    # re-running assign_enclosing over a shuffled copy converges to the same
    shuffled = sorted(
        [dict(m) for m in m1], key=lambda m: (m["name"], m["line"]))
    fixed = dedupe_mentions(assign_enclosing(shuffled))
    assert fixed == m1


@given(n_tokens=st.integers(min_value=0, max_value=400),
       chunk=st.integers(min_value=2, max_value=60),
       overlap=st.integers(min_value=0, max_value=59))
@settings(max_examples=30, deadline=None)
def test_chunking_covers_every_token(n_tokens, chunk, overlap):
    """Driver-side mirror of chunk_documents' windowing arithmetic: every
    token lands in >=1 chunk, starts step uniformly, last chunk may be
    short, empty docs produce nothing."""
    import math
    if overlap >= chunk:
        return
    step = chunk - overlap
    starts = [s for s in range(0, max(n_tokens, 1), step) if s < n_tokens]
    if n_tokens == 0:
        assert starts == []
        return
    assert len(starts) == math.ceil(n_tokens / step)
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + chunk, n_tokens)))
    assert covered == set(range(n_tokens))


@settings(max_examples=200, deadline=None)
@given(content=text_like, lang=st.sampled_from(SUPPORTED_LANGS))
def test_regex_spans_point_at_the_name(content, lang):
    """The span of every regex-route mention is exactly the name token's
    [col_start, col_end) on its recorded line — the invariant a KG consumer
    relies on to highlight source ranges."""
    lines = content.split("\n")
    for m in extract_regex_mentions(content, lang):
        a, b = m["span"]
        assert 0 <= a < b
        line = lines[m["line"] - 1]
        assert line[a:b] == m["name"], (m, line)


def test_ast_spans_point_at_the_name_on_corpus_like_code():
    """AST-route spans: exact for every mention kind over representative
    python (defs incl. async/decorated/nested, aliased + dotted imports,
    attribute calls). Doc-entity spans are docstring-relative (excluded)."""
    from smart_pdf_md_spark.functions.patterns import extract_ast_mentions

    code = (
        "import os, json as j\n"
        "from  a.b  import c\n"
        "@deco\n"
        "async def outer(x):\n"
        "    class  Inner:\n"
        "        def meth(self):\n"
        "            return os.path.join(x, helper(x))\n"
        "    return Inner\n"
    )
    lines = code.split("\n")
    for m in extract_ast_mentions(code):
        if m["kind"] == "doc_entity":
            continue
        a, b = m["span"]
        line = lines[m["line"] - 1]
        assert line[a:b] == m["name"], (m, line)
