"""Per-language extraction-semantics unit tests (the engine-matrix analogue
of /root/reference/tests/test_engines_matrix.py:28-88 — one case per
language family, asserting the planted facts come out)."""

from __future__ import annotations

from smart_pdf_md_spark.functions.patterns import (
    SUPPORTED_LANGS,
    extract_ast_mentions,
    extract_regex_mentions,
)


def _by_kind(ms):
    out = {}
    for m in ms:
        out.setdefault(m["kind"], set()).add(m["name"])
    return out


def test_supported_langs():
    assert set(SUPPORTED_LANGS) >= {"python", "javascript", "go", "markdown",
                                    "java", "rust", "ruby"}


def test_python_ast_vs_regex_agree_on_plain_module():
    src = ("import os\nfrom core.utils import x\n\n"
           "def alpha(v):\n    return beta(v)\n\nclass Gamma:\n    pass\n")
    ast_m = _by_kind(extract_ast_mentions(src))
    rx_m = _by_kind(extract_regex_mentions(src, "python"))
    assert ast_m["import"] == rx_m["import"] == {"os", "core.utils"}
    assert ast_m["def"] == rx_m["def"] == {"alpha", "Gamma"}
    assert ast_m["call"] == rx_m["call"] == {"beta"}


def test_java():
    src = ("import java.util.List;\nimport static org.junit.Assert.*;\n"
           "class Widget {\n  void run() { helper(1); }\n}\n")
    m = _by_kind(extract_regex_mentions(src, "java"))
    assert m["import"] == {"java.util.List", "org.junit.Assert"}
    assert "Widget" in m["def"]
    assert m["call"] == {"helper", "run"} or "helper" in m["call"]


def test_rust():
    src = ("use std::collections::HashMap;\n"
           "struct Point;\nfn dist(p: Point) -> f64 { norm(p) }\n")
    m = _by_kind(extract_regex_mentions(src, "rust"))
    assert "std::collections::HashMap" in m["import"]
    assert m["def"] >= {"Point", "dist"}
    assert "norm" in m["call"]
    assert "fn" not in m.get("call", set())


def test_ruby():
    src = ("require 'json'\nrequire_relative 'util'\n"
           "class Parser\n  def parse!(s)\n    tokenize(s)\n  end\nend\n")
    m = _by_kind(extract_regex_mentions(src, "ruby"))
    assert m["import"] == {"json", "util"}
    assert "Parser" in m["def"] and "parse!" in m["def"]
    assert "tokenize" in m["call"]


def test_go_block_import():
    src = 'package main\nimport (\n\t"fmt"\n\t"net/http"\n)\nfunc main() { fmt.Println(1) }\n'
    m = _by_kind(extract_regex_mentions(src, "go"))
    assert {"fmt", "net/http"} <= m["import"]
    assert "main" in m["def"]


def test_call_enclosing_defs():
    src = "def a(x):\n    f(x)\n\ndef b(y):\n    g(y)\n"
    ms = extract_regex_mentions(src, "python")
    enc = {m["name"]: m["enclosing"] for m in ms if m["kind"] == "call"}
    assert enc == {"f": "a", "g": "b"}
