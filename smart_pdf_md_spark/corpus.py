"""Deterministic synthetic `repo_files` corpus (seed 42).

Plays the role the reference's in-test PDF fixtures play
(/root/reference/tests/test_fast_path.py:13-21 generates its own PDFs;
/root/reference/tests/test_cli_and_paths_more.py:38-50 plants invalid bytes):
a corpus whose golden mentions/triples are computable by construction.

Every attribute of row *i* is a pure function of (SEED, i) via blake2b, so the
generator is order-independent and can run distributed (spark.range →
mapInPandas) — generating a 10^12-row corpus never needs driver-side state.

Schema (authoritative per BASELINE.json input_hint):
    repo:string, path:string, commit:string, lang:string, content:string

Archetype mix (FIXTURES.md §1): textual python ~40%, syntax-error python ~5%,
empty ~5%, js ~12%, java ~6%, go ~6%, rust ~3%, ruby ~3%, markdown ~10%,
binary noise ~5%, vendored duplicates ~5%, plus fixed giant/poison/
include-exclude rows at the lowest indices — every regex-family language
(functions/patterns.py) flows through the full pipeline + P/R gate, not just
unit tests (VERDICT r1 missing #2).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

SEED = 42
# bump when the generated content changes — benchmark corpus caches key on it
CORPUS_VERSION = 2
POISON_MARKER = "__KG_POISON__"

# Closed symbol vocabulary. Each tuple is one *entity*: surface variants that
# canonicalization must merge (char-ngram similar). Golden components are
# known by construction from this table.
SYMBOL_GROUPS: list[tuple[str, ...]] = [
    ("load_data", "loadData", "LoadData"),
    ("parse_config", "parseConfig", "ParseConfig"),
    ("build_index", "buildIndex", "BuildIndex"),
    ("run_query", "runQuery", "RunQuery"),
    ("merge_rows", "mergeRows", "MergeRows"),
    ("scan_table", "scanTable", "ScanTable"),
    ("hash_join", "hashJoin", "HashJoin"),
    ("sort_batch", "sortBatch", "SortBatch"),
    ("write_sink", "writeSink", "WriteSink"),
    ("read_source", "readSource", "ReadSource"),
    ("plan_stage", "planStage", "PlanStage"),
    ("emit_triples", "emitTriples", "EmitTriples"),
    ("link_entity", "linkEntity", "LinkEntity"),
    ("canon_name", "canonName", "CanonName"),
    ("check_sum", "checkSum", "CheckSum"),
    ("route_file", "routeFile", "RouteFile"),
    ("chunk_text", "chunkText", "ChunkText"),
    ("token_izer", "tokenIzer", "TokenIzer"),
    ("skew_salt", "skewSalt", "SkewSalt"),
    ("fix_point", "fixPoint", "FixPoint"),
]
ALL_SYMBOLS: list[str] = [v for g in SYMBOL_GROUPS for v in g]

MODULES: list[str] = [
    "os", "sys", "json", "math", "hashlib", "itertools",
    "core.utils", "core.engine", "net.http", "net.rpc",
    "db.store", "db.index", "fmt", "strings", "lodash", "react",
]

LANGS = ("python", "javascript", "go", "java", "rust", "ruby",
         "markdown", "binary")

# Fixed low-index rows exercising specific reference behaviors.
FIXED_ROWS = 8  # 0..7, see _fixed_row


def _h(*parts: object) -> int:
    """Stable 64-bit hash of SEED + parts (pure, platform-independent)."""
    key = "\x1f".join(str(p) for p in (SEED, *parts)).encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def _pick(seq, *parts: object):
    return seq[_h(*parts) % len(seq)]


def _repo_for(i: int) -> str:
    # Zipf-ish: one mega-repo holds ~40% of files (skew fixture — the
    # analogue of the reference's huge-PDF slice path, core.py:1036-1074).
    if _h(i, "mega") % 100 < 40:
        return "org0/megarepo"
    v = _h(i, "repo")
    return f"org{v % 7}/repo{v % 19 + 1}"


def _commit_for(repo: str) -> str:
    return hashlib.sha1(f"{repo}@snap1".encode()).hexdigest()


def _symbols_for(i: int, n: int, salt: str) -> list[str]:
    return [_pick(ALL_SYMBOLS, i, salt, j) for j in range(n)]


def _python_module(i: int, broken: bool = False, repeats: int = 1) -> str:
    n_imp = 1 + _h(i, "ni") % 4
    n_def = 1 + _h(i, "nd") % 4
    imports = sorted({_pick(MODULES, i, "imp", j) for j in range(n_imp)})
    defs = _symbols_for(i, n_def, "def")
    doc_ents = _symbols_for(i, _h(i, "nde") % 3, "doc")
    lines: list[str] = ['"""Module docs.']
    for e in doc_ents:
        lines.append(f"Mentions :class:`{e}` and `{e}` here.")
    lines.append('"""')
    for m in imports:
        if _h(i, "impstyle", m) % 3 == 0 and "." in m:
            base, _, leaf = m.rpartition(".")
            lines.append(f"from {base} import {leaf}")
        else:
            lines.append(f"import {m}")
    body: list[str] = []
    for j, d in enumerate(defs):
        callees = _symbols_for(i, 1 + _h(i, "nc", j) % 3, f"call{j}")
        body.append(f"def {d}(x):")
        body.append(f'    """Does {d}."""')
        for c in callees:
            body.append(f"    x = {c}(x)")
        body.append("    return x")
        body.append("")
    lines.extend(body * max(repeats, 1))
    if broken:
        lines.append("def broken_tail(:")  # SyntaxError → AST→regex fallback
    return "\n".join(lines)


def _js_module(i: int) -> str:
    n_imp = 1 + _h(i, "jni") % 3
    imports = sorted({_pick(MODULES, i, "jimp", j) for j in range(n_imp)})
    defs = _symbols_for(i, 1 + _h(i, "jnd") % 3, "jdef")
    lines = []
    for m in imports:
        if _h(i, "jstyle", m) % 2 == 0:
            lines.append(f"import {{ x }} from '{m}';")
        else:
            lines.append(f"const m = require('{m}');")
    for j, d in enumerate(defs):
        callees = _symbols_for(i, 1 + _h(i, "jnc", j) % 2, f"jcall{j}")
        lines.append(f"function {d}(a) {{")
        for c in callees:
            lines.append(f"  a = {c}(a);")
        lines.append("  return a;")
        lines.append("}")
    return "\n".join(lines)


def _go_module(i: int) -> str:
    n_imp = 1 + _h(i, "gni") % 3
    imports = sorted({_pick(MODULES, i, "gimp", j) for j in range(n_imp)})
    defs = _symbols_for(i, 1 + _h(i, "gnd") % 3, "gdef")
    lines = ["package main"]
    for m in imports:
        lines.append(f'import "{m}"')
    for j, d in enumerate(defs):
        callees = _symbols_for(i, 1 + _h(i, "gnc", j) % 2, f"gcall{j}")
        lines.append(f"func {d}(x int) int {{")
        for c in callees:
            lines.append(f"\tx = {c}(x)")
        lines.append("\treturn x")
        lines.append("}")
    return "\n".join(lines)


def _java_module(i: int) -> str:
    n_imp = 1 + _h(i, "vni") % 3
    imports = sorted({_pick(MODULES, i, "vimp", j) for j in range(n_imp)})
    # class names use the PascalCase symbol variants (3rd member of each group)
    classes = [_pick([g[2] for g in SYMBOL_GROUPS], i, "vcls", j)
               for j in range(1 + _h(i, "vnd") % 2)]
    lines = [f"import {m};" for m in imports]
    for j, cls in enumerate(classes):
        callees = _symbols_for(i, 1 + _h(i, "vnc", j) % 2, f"vcall{j}")
        lines.append(f"public class {cls} {{")
        lines.append("    public int run(int x) {")
        for c in callees:
            lines.append(f"        x = {c}(x);")
        lines.append("        return x;")
        lines.append("    }")
        lines.append("}")
    return "\n".join(lines)


def _rust_module(i: int) -> str:
    n_imp = 1 + _h(i, "rni") % 3
    imports = sorted({_pick(MODULES, i, "rimp", j).replace(".", "::")
                      for j in range(n_imp)})
    defs = _symbols_for(i, 1 + _h(i, "rnd") % 3, "rdef")
    lines = [f"use {m};" for m in imports]
    for j, d in enumerate(defs):
        callees = _symbols_for(i, 1 + _h(i, "rnc", j) % 2, f"rcall{j}")
        lines.append(f"fn {d}(mut x: i64) -> i64 {{")
        for c in callees:
            lines.append(f"    x = {c}(x);")
        lines.append("    x")
        lines.append("}")
    return "\n".join(lines)


def _ruby_module(i: int) -> str:
    n_imp = 1 + _h(i, "bni") % 3
    imports = sorted({_pick(MODULES, i, "bimp", j) for j in range(n_imp)})
    defs = _symbols_for(i, 1 + _h(i, "bnd") % 3, "bdef")
    lines = [f"require '{m}'" for m in imports]
    for j, d in enumerate(defs):
        callees = _symbols_for(i, 1 + _h(i, "bnc", j) % 2, f"bcall{j}")
        lines.append(f"def {d}(x)")
        for c in callees:
            lines.append(f"  x = {c}(x)")
        lines.append("  x")
        lines.append("end")
    return "\n".join(lines)


def _markdown_doc(i: int) -> str:
    ents = _symbols_for(i, 1 + _h(i, "mde") % 4, "mdoc")
    lines = [f"# Notes {i}", ""]
    for e in ents:
        lines.append(f"The `{e}` helper is documented here.")
    return "\n".join(lines)


def _binary_noise(i: int) -> str:
    raw = hashlib.blake2b(f"{SEED}:{i}:noise".encode(), digest_size=32).digest()
    return "�" + raw.hex() + "\x00\x01�" * 3


def _vendored(j: int) -> tuple[str, str]:
    """Byte-identical file shared across repos (dedup/canon fixture)."""
    return f"vendor/lib/mod{j}.py", _python_module(1_000_000 + j)


def _fixed_row(i: int) -> tuple[str, str, str, str]:
    """(repo, path, lang, content) for fixed fixture rows 0..FIXED_ROWS-1."""
    if i == 0:  # include-glob keeper (tests/test_cli_options_extended.py:22-45)
        return "org1/repo1", "docs/Handbooks/keep.py", "python", _python_module(i)
    if i == 1:  # exclude-glob dropper
        return "org1/repo1", "trash/drafts/drop_draft.py", "python", _python_module(i)
    if i == 2:  # giant regex-route file → intra-UDF chunking (R1)
        return ("org0/megarepo", "big/giant2.js", "javascript",
                "\n".join(_js_module(2 + j) for j in range(600)))
    if i == 3:  # giant python with broken tail → AST→regex fallback + chunking
        return ("org0/megarepo", "big/giant3.py", "python",
                _python_module(3, broken=True, repeats=400))
    if i in (4, 5, 6):  # poison rows — mock-failure mode only
        return ("org2/repo2", f"src/poison{i}.py", "python",
                _python_module(i) + f"\n# {POISON_MARKER}\n")
    # i == 7: empty file
    return "org3/repo3", "src/empty7.py", "python", ""


def _row(i: int) -> dict[str, str]:
    if i < FIXED_ROWS:
        repo, path, lang, content = _fixed_row(i)
        return {"repo": repo, "path": path, "commit": _commit_for(repo),
                "lang": lang, "content": content}

    r = _h(i, "arch") % 100
    repo = _repo_for(i)
    d1 = f"pkg{_h(i, 'd1') % 9}"
    d2 = f"mod{_h(i, 'd2') % 23}"
    if r < 5:  # vendored duplicate subtree, identical across repos
        path, content = _vendored(_h(i, "vend") % 6)
        lang = "python"
    elif r < 40:
        lang, path, content = "python", f"{d1}/{d2}_{i}.py", _python_module(i)
    elif r < 45:
        lang, path = "python", f"{d1}/broken_{i}.py"
        content = _python_module(i, broken=True)
    elif r < 50:
        lang, path, content = "python", f"{d1}/empty_{i}.py", ""
    elif r < 62:
        lang, path, content = "javascript", f"{d1}/{d2}_{i}.js", _js_module(i)
    elif r < 68:
        lang, path, content = "java", f"{d1}/{d2}_{i}.java", _java_module(i)
    elif r < 74:
        lang, path, content = "go", f"{d1}/{d2}_{i}.go", _go_module(i)
    elif r < 77:
        lang, path, content = "rust", f"{d1}/{d2}_{i}.rs", _rust_module(i)
    elif r < 80:
        lang, path, content = "ruby", f"{d1}/{d2}_{i}.rb", _ruby_module(i)
    elif r < 90:
        lang, path, content = "markdown", f"docs/{d2}_{i}.md", _markdown_doc(i)
    elif r < 95:
        lang, path, content = "binary", f"assets/blob_{i}.bin", _binary_noise(i)
    else:
        lang, path, content = "python", f"{d1}/{d2}_{i}.py", _python_module(i)
    return {"repo": repo, "path": path, "commit": _commit_for(repo),
            "lang": lang, "content": content}


def generate_batch(indices: Iterable[int]) -> pd.DataFrame:
    rows = [_row(int(i)) for i in indices]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_pandas(n: int) -> pd.DataFrame:
    """Driver-side corpus for unit tests (small n)."""
    return generate_batch(range(n))


def corpus_df(spark, n: int, partitions: int | None = None):
    """Distributed corpus: spark.range → mapInPandas (scales to any n)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield generate_batch(pdf["id"].tolist())

    schema = "repo string, path string, commit string, lang string, content string"
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=schema)
