"""Extraction semantics: the lang/pattern dimension + per-file extractors.

This is the target's analogue of the reference's 24-engine converter library
(/root/reference/src/smart_pdf_md/core.py:277-949) collapsed to exactly two
extractor *families* (SURVEY.md §2.6 mapping):

- **AST family** — Python stdlib `ast` for ``lang='python'`` (imports, defs,
  calls, docstring entities). Raises ``SyntaxError`` for unparseable content;
  the caller falls back to the regex family (the analogue of the reference's
  engine fallback chains, e.g. borb→pypdf at core.py:795-797 and the
  unopenable-PDF single-pass fallback at core.py:1041-1048).
- **Regex family** — batched compiled patterns from the small ``LANG_PATTERNS``
  dimension (broadcast-joined on the Spark side) for every language.

These functions define the semantics once; the pure-Python oracle
(oracle.py) and the Arrow-vectorized Spark stage (operators/extract.py) both
call them, so the P/R gate measures the *distributed assembly* (routing,
chunking, fallback, shuffles), not incidental regex drift.

Mention record: ``(kind, name, qualifier, line, enclosing, span)`` with
``kind ∈ {import, def, call, doc_entity}`` and ``span = [col_start,
col_end)`` — 0-based character columns of the name token on its line (the
SURVEY §1.2 source-range analogue of the reference's per-page offsets,
core.py:264-272). Regex/doc-entity spans come from the match group;
AST spans from node column offsets (best-effort token search for def/import
names, whose AST nodes start at the keyword). For doc entities the span is
relative to the docstring's own line text (the quoted block, not the file
line). Deterministic either way — the oracle shares this code, so the
exact-mentions gate pins spans too.
"""

from __future__ import annotations

import ast
import bisect
import re

# ---------------------------------------------------------------------------
# The small dimension table (broadcast side of J1).
# kind: import | def | call | doc_entity ; group 1 captures the name.
# ---------------------------------------------------------------------------
LANG_PATTERNS: list[dict] = [
    # python
    {"lang": "python", "kind": "import", "regex": r"^\s*import\s+([\w\.]+)", "priority": 0},
    {"lang": "python", "kind": "import", "regex": r"^\s*from\s+([\w\.]+)\s+import\b", "priority": 1},
    {"lang": "python", "kind": "def", "regex": r"^\s*def\s+([A-Za-z_]\w*)", "priority": 0},
    {"lang": "python", "kind": "def", "regex": r"^\s*class\s+([A-Za-z_]\w*)", "priority": 1},
    {"lang": "python", "kind": "call", "regex": r"(?<![\w.])([A-Za-z_]\w*)\s*\(", "priority": 0},
    {"lang": "python", "kind": "doc_entity", "regex": r"`([A-Za-z_][\w\.]*)`", "priority": 0},
    # javascript
    {"lang": "javascript", "kind": "import", "regex": r"""import\s+[^;]*?from\s+['"]([^'"]+)['"]""", "priority": 0},
    {"lang": "javascript", "kind": "import", "regex": r"""require\(\s*['"]([^'"]+)['"]\s*\)""", "priority": 1},
    {"lang": "javascript", "kind": "def", "regex": r"\bfunction\s+([A-Za-z_]\w*)", "priority": 0},
    {"lang": "javascript", "kind": "def", "regex": r"\bclass\s+([A-Za-z_]\w*)", "priority": 1},
    {"lang": "javascript", "kind": "call", "regex": r"(?<![\w.])([A-Za-z_]\w*)\s*\(", "priority": 0},
    # go
    {"lang": "go", "kind": "import", "regex": r"^\s*import\s+\"([^\"]+)\"", "priority": 0},
    {"lang": "go", "kind": "import", "regex": r"^\s+\"([^\"]+)\"\s*$", "priority": 1},  # import ( ... ) block
    {"lang": "go", "kind": "def", "regex": r"^\s*func\s+(?:\([^)]*\)\s*)?([A-Za-z_]\w*)", "priority": 0},
    {"lang": "go", "kind": "call", "regex": r"(?<![\w.])([A-Za-z_]\w*)\s*\(", "priority": 0},
    # markdown: doc entities only
    {"lang": "markdown", "kind": "doc_entity", "regex": r"`([A-Za-z_][\w\.]*)`", "priority": 0},
    # java
    {"lang": "java", "kind": "import", "regex": r"^\s*import\s+(?:static\s+)?([\w\.]+?)(?:\.\*)?\s*;", "priority": 0},
    {"lang": "java", "kind": "def", "regex": r"\b(?:class|interface|enum)\s+([A-Za-z_]\w*)", "priority": 0},
    {"lang": "java", "kind": "call", "regex": r"(?<![\w.])([A-Za-z_]\w*)\s*\(", "priority": 0},
    # rust
    {"lang": "rust", "kind": "import", "regex": r"^\s*use\s+([\w:]+)", "priority": 0},
    {"lang": "rust", "kind": "def", "regex": r"\bfn\s+([A-Za-z_]\w*)", "priority": 0},
    {"lang": "rust", "kind": "def", "regex": r"\b(?:struct|enum|trait)\s+([A-Za-z_]\w*)", "priority": 1},
    {"lang": "rust", "kind": "call", "regex": r"(?<![\w:.])([A-Za-z_]\w*)\s*\(", "priority": 0},
    # ruby
    {"lang": "ruby", "kind": "import", "regex": r"""^\s*require(?:_relative)?\s+['"]([^'"]+)['"]""", "priority": 0},
    {"lang": "ruby", "kind": "def", "regex": r"^\s*def\s+([A-Za-z_]\w*[?!]?)", "priority": 0},
    {"lang": "ruby", "kind": "def", "regex": r"^\s*class\s+([A-Z]\w*)", "priority": 1},
    {"lang": "ruby", "kind": "call", "regex": r"(?<![\w.:])([a-z_]\w*)\s*\(", "priority": 0},
]

SUPPORTED_LANGS = tuple(sorted({p["lang"] for p in LANG_PATTERNS}))

# identifiers before "(" that are never calls
_CALL_STOPWORDS = {
    "python": {"def", "class", "if", "elif", "while", "for", "return", "yield",
               "lambda", "with", "assert", "raise", "not", "and", "or", "in", "print"},
    "javascript": {"function", "if", "for", "while", "return", "switch", "catch",
                   "require", "import", "new", "typeof"},
    "go": {"func", "if", "for", "return", "switch", "make", "len", "cap", "new",
           "import", "package", "range"},
    "java": {"if", "for", "while", "switch", "catch", "return", "new", "super",
             "this", "class", "interface", "enum", "throw", "synchronized"},
    "rust": {"fn", "if", "while", "for", "match", "return", "Some", "Ok", "Err",
             "None", "loop", "unsafe"},
    "ruby": {"def", "if", "while", "unless", "until", "case", "raise", "end",
             "require", "require_relative", "lambda", "proc"},
}
_DEF_KEYWORD_BEFORE = re.compile(
    r"(?:\bdef|\bclass|\bfunction|\bfunc|\bfn|\binterface|\benum|\bstruct|\btrait)\s+$")

_COMPILED: dict[str, list[tuple[str, re.Pattern]]] = {}


def _compiled(lang: str) -> list[tuple[str, re.Pattern]]:
    """Patterns for one lang, compiled once per process (the analogue of the
    reference's lazy per-engine imports, core.py:383-386)."""
    if lang not in _COMPILED:
        pats = sorted((p for p in LANG_PATTERNS if p["lang"] == lang),
                      key=lambda p: (p["kind"], p["priority"]))
        _COMPILED[lang] = [(p["kind"], re.compile(p["regex"], re.MULTILINE)) for p in pats]
    return _COMPILED[lang]


def _line_starts(text: str) -> list[int]:
    starts = [0]
    pos = text.find("\n")
    while pos != -1:
        starts.append(pos + 1)
        pos = text.find("\n", pos + 1)
    return starts


def assign_enclosing(mentions: list[dict]) -> list[dict]:
    """(Re)assign each call's enclosing def = nearest preceding def.

    Also used to merge chunked extractions: chunk line numbers are
    file-absolute, so recomputing over the merged list makes chunked output
    identical to a single whole-file pass."""
    defs = sorted([m for m in mentions if m["kind"] == "def"], key=lambda m: m["line"])
    def_lines = [d["line"] for d in defs]
    for m in mentions:
        if m["kind"] == "call":
            j = bisect.bisect_right(def_lines, m["line"]) - 1
            m["enclosing"] = defs[j]["name"] if j >= 0 else ""
    return mentions


def dedupe_mentions(mentions: list[dict]) -> list[dict]:
    return _dedupe(mentions)


def _dedupe(mentions: list[dict]) -> list[dict]:
    seen: set[tuple] = set()
    out = []
    for m in mentions:
        k = (m["kind"], m["name"], m["line"])
        if k not in seen:
            seen.add(k)
            out.append(m)
    return sorted(out, key=lambda m: (m["line"], m["kind"], m["name"]))


def extract_regex_mentions(content: str, lang: str, line_offset: int = 0) -> list[dict]:
    """Regex-family extraction. ``line_offset`` supports chunked re-entry
    (the R1 slice-backoff analogue: chunk line numbers stay file-absolute,
    like the reference's ``--page_range`` slices, core.py:1049-1073)."""
    if not content or lang not in SUPPORTED_LANGS:
        return []
    starts = _line_starts(content)
    stop = _CALL_STOPWORDS.get(lang, set())
    mentions: list[dict] = []
    for kind, rx in _compiled(lang):
        for m in rx.finditer(content):
            name = m.group(1)
            if kind == "call":
                if name in stop:
                    continue
                if _DEF_KEYWORD_BEFORE.search(content[max(0, m.start(1) - 12):m.start(1)]):
                    continue
            li = bisect.bisect_right(starts, m.start(1))  # 1-based, chunk-local
            ls = starts[li - 1]
            mentions.append({"kind": kind, "name": name, "qualifier": "",
                             "line": li + line_offset, "enclosing": "",
                             "span": [m.start(1) - ls, m.end(1) - ls]})
    # enclosing def for calls: nearest preceding def (regex route can't see
    # scope ends; deterministic heuristic shared with the oracle)
    return _dedupe(assign_enclosing(mentions))


_DOC_ENTITY_RX = re.compile(r"`([A-Za-z_][\w\.]*)`")


def _doc_entities(doc: str, start_line: int) -> list[dict]:
    out = []
    starts = _line_starts(doc)
    for m in _DOC_ENTITY_RX.finditer(doc):
        li = bisect.bisect_right(starts, m.start(1))
        ls = starts[li - 1]
        out.append({"kind": "doc_entity", "name": m.group(1), "qualifier": "",
                    "line": start_line + li - 1, "enclosing": "",
                    "span": [m.start(1) - ls, m.end(1) - ls]})
    return out


def _span_find(lines: list[str], lineno: int, col: int, token: str) -> list[int]:
    """Locate `token` on 1-based line `lineno` at/after column `col` — used
    where the AST node starts at a keyword, not at the name itself. Falls
    back to [col, col+len) when the token isn't literally on that line
    (multiline statements); always deterministic."""
    line = lines[lineno - 1] if 0 < lineno <= len(lines) else ""
    i = line.find(token, col)
    if i < 0:
        i = line.find(token)
    if i < 0:
        return [col, col + len(token)]
    return [i, i + len(token)]


_AST_DEF_TYPES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)


def extract_ast_mentions(content: str) -> list[dict]:
    """AST-family extraction for python. Raises SyntaxError → caller falls
    back to the regex family (route_fallback).

    Traversal is an explicit pre-order stack with inlined child iteration:
    this is the per-file hot loop of the whole extraction stage (profiled:
    recursive iter_child_nodes walk cost ~2.7× ast.parse itself), so the
    generator machinery and isinstance chains are flattened out."""
    tree = ast.parse(content)  # may raise SyntaxError
    lines = content.split("\n")
    mentions: list[dict] = []
    append = mentions.append

    mod_doc = ast.get_docstring(tree, clean=False)
    if mod_doc and tree.body:
        mentions.extend(_doc_entities(mod_doc, tree.body[0].lineno))

    AST = ast.AST
    Import, ImportFrom, Call = ast.Import, ast.ImportFrom, ast.Call
    Name, Attribute = ast.Name, ast.Attribute
    def_types = _AST_DEF_TYPES
    # pre-order DFS: emit at pop, push children reversed so sibling order
    # matches the recursive formulation exactly
    stack: list[tuple[ast.AST, str]] = [(tree, "")]
    pop, push = stack.pop, stack.extend
    while stack:
        node, enclosing = pop()
        t = type(node)
        if t is Import:
            for a in node.names:
                # alias nodes start exactly at the imported name (3.10+)
                append({"kind": "import", "name": a.name, "qualifier": "",
                        "line": node.lineno, "enclosing": "",
                        "span": [a.col_offset, a.col_offset + len(a.name)]})
            continue  # alias children carry nothing extractable
        if t is ImportFrom:
            if node.module:
                append({"kind": "import", "name": node.module, "qualifier": "",
                        "line": node.lineno, "enclosing": "",
                        "span": _span_find(lines, node.lineno,
                                           node.col_offset, node.module)})
            continue
        if t in def_types:
            append({"kind": "def", "name": node.name, "qualifier": "",
                    "line": node.lineno, "enclosing": enclosing,
                    "span": _span_find(lines, node.lineno, node.col_offset,
                                       node.name)})
            doc = ast.get_docstring(node, clean=False)
            if doc and node.body:
                mentions.extend(_doc_entities(doc, node.body[0].lineno))
            enclosing = node.name
        elif t is Call:
            fn = node.func
            tf = type(fn)
            if tf is Name:
                append({"kind": "call", "name": fn.id, "qualifier": "",
                        "line": node.lineno, "enclosing": enclosing,
                        "span": [fn.col_offset, fn.end_col_offset]})
            elif tf is Attribute:
                # the Attribute node ends exactly after the attr token
                append({"kind": "call", "name": fn.attr,
                        "qualifier": ast.unparse(fn.value),
                        "line": node.lineno, "enclosing": enclosing,
                        "span": [max(fn.end_col_offset - len(fn.attr), 0),
                                 fn.end_col_offset]})
        children: list[tuple[ast.AST, str]] = []
        for fname in node._fields:
            field = getattr(node, fname, None)
            if field.__class__ is list:
                for item in field:
                    if isinstance(item, AST):
                        children.append((item, enclosing))
            elif isinstance(field, AST):
                children.append((field, enclosing))
        children.reverse()
        push(children)
    return _dedupe(mentions)


# ---------------------------------------------------------------------------
# Triple materialization rule (shared; pure mapping of mention → s/p/o).
# north_star shapes: (file, IMPORTS, module), (repo, DEFINES, symbol),
# (symbol, CALLS, symbol), (file, MENTIONS, entity).
# ---------------------------------------------------------------------------
PRED_BY_KIND = {"import": "IMPORTS", "def": "DEFINES",
                "call": "CALLS", "doc_entity": "MENTIONS"}


def triple_for(repo: str, path: str, kind: str, name: str, enclosing: str) -> tuple[str, str, str]:
    file_ref = f"{repo}/{path}"
    if kind == "import":
        return (file_ref, "IMPORTS", name)
    if kind == "def":
        return (repo, "DEFINES", name)
    if kind == "call":
        # Symbol-space projection (north_star: `(symbol, CALLS, symbol)`):
        # subj is the enclosing def's bare symbol so both endpoints live in
        # the same vocabulary and the graph composes (two-hop, pagerank).
        # Module-level calls have no enclosing symbol — fall back to the
        # file ref, the only stable container.
        return (enclosing if enclosing else file_ref, "CALLS", name)
    return (file_ref, "MENTIONS", name)
