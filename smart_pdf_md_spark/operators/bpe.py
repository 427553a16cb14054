"""Distributed BPE tokenizer training — Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL 2016):
learn a byte-pair-encoding merge table from the corpus, the vocabulary a
training pipeline ships alongside its data (token budgeting with the
REAL tokenizer instead of the BPE-ish regex proxy, OOV-free encoding).

The Spark shape is the one that survives 100 TB: BPE statistics are a
function of the WORD-FREQUENCY table, not the corpus — so the corpus is
touched exactly ONCE (explode tokens → groupBy word), and every merge
round runs over the vocabulary-bounded (word, n, syms) relation:

- pair counting is one explode of adjacent symbol pairs weighted by the
  word count + a map-side-combinable groupBy — shuffle rows are bounded
  by Σ|word symbols|, which only SHRINKS as merges proceed;
- the argmax pair is a deterministic TakeOrderedAndProject (count DESC,
  pair lexicographic) — one 2-string scalar reaches the driver per round,
  which IS the merge table being learned (driver-sized by definition);
- applying a merge rewrites each word's symbol array (greedy
  left-to-right, the reference semantics) in one Arrow pass over the
  vocabulary; state is checkpointed every round (the cc.py discipline).

Encoding a corpus with the learned table is the same trick in reverse:
encode the DISTINCT-word table once, then join the corpus token stream
against it — the per-document work is an equi-join, never a re-run of
the merge loop over raw text.

Determinism: ties on pair count break lexicographically (the published
reference implementation's dict-order is run-dependent; this one is a
pure function of the word-frequency table — pinned against a Python
reference with the same tie-break in tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import tokens_col

END = "</w>"  # end-of-word sentinel (Sennrich): merges cannot cross words


def word_freq_table(docs: DataFrame, text_col: str = "text",
                    lowercase: bool = True) -> DataFrame:
    """→ (word, n) — the corpus' word-frequency table: the ONE
    corpus-sized pass of BPE training (and of encoding). Whitespace
    tokenization (tokens_col semantics, shared with every other text
    operator here)."""
    toks = tokens_col(F.col(text_col))
    w = F.explode(toks).alias("word")
    out = docs.select(w)
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.groupBy("word").agg(F.count("*").alias("n"))


def _sym_init(word_col) -> object:
    """Initial symbol sequence of a word: its characters + the END mark."""
    return F.concat(F.split(word_col, ""), F.array(F.lit(END)))


def _merge_syms_udf(a: str, b: str):
    merged = a + b

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out
        return syms.map(one)

    return apply_merge


def bpe_train(word_freqs: DataFrame, n_merges: int = 100,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a (word, n) table; returns the
    ordered merge list — the whole artifact (2·n_merges strings, driver-
    sized by definition). Stops early when no adjacent pair reaches
    ``min_pair_count``. See the module docstring for the per-round plan
    shape."""
    state = word_freqs.select("word", "n",
                              _sym_init(F.col("word")).alias("syms")) \
        .localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (state.select(
            "n",
            F.explode(F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s as a, syms[i + 1] as b))"))
            .alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt")))
        top = (pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
               .collect())
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        state = state.select(
            "word", "n",
            _merge_syms_udf(a, b)(F.col("syms")).alias("syms")) \
            .localCheckpoint(eager=True)
    return merges


def bpe_encode_table(word_freqs: DataFrame,
                     merges: list[tuple[str, str]]) -> DataFrame:
    """→ (word, n, bpe_tokens array<string>, n_bpe) — every distinct word
    encoded with the learned merge table, applied IN ORDER (the reference
    semantics). One Arrow pass over the vocabulary; a corpus encodes by
    joining its token stream against this table (never by re-running the
    merge loop over raw text)."""
    ms = list(merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(words: pd.Series) -> pd.Series:
        def one(w):
            s = list(w) + [END]
            for a, b in ms:
                merged, out, i, n = a + b, [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
                if len(s) == 1:
                    break
            return s
        return words.map(one)

    return (word_freqs.select("word", "n",
                              encode(F.col("word")).alias("bpe_tokens"))
            .withColumn("n_bpe", F.size("bpe_tokens")))


def bpe_token_count(docs: DataFrame, encoded_vocab: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    lowercase: bool = True) -> DataFrame:
    """→ (doc_id, n_bpe_tokens, n_oov_words) — per-document token budget
    under the LEARNED tokenizer (the real-vocabulary upgrade of
    textstats.token_count's regex proxy). The corpus token stream joins
    the encoded vocabulary on `word` (broadcast when the vocab fits,
    shuffle otherwise — Catalyst's call); per-doc counts are a
    map-side-combinable sum.

    Words ABSENT from the vocabulary (vocab built on a different corpus or
    lowercase setting) are not silently dropped (ADVICE r7): the join is a
    LEFT join, an OOV word costs its character count + 1 BPE tokens (the
    zero-merge worst case — every char a symbol plus the end-of-word mark,
    exactly what bpe_encode_table would emit for an unseen word before any
    merge applies... an upper bound once merges exist), and the per-doc
    OOV word count surfaces as ``n_oov_words`` so the fallback is loud."""
    toks = tokens_col(F.col(text_col))
    w = F.explode(toks).alias("word")
    stream = docs.select(F.col(id_col).alias("doc_id"), w)
    if lowercase:
        stream = stream.select("doc_id", F.lower("word").alias("word"))
    joined = stream.join(encoded_vocab.select("word", "n_bpe"),
                         "word", "left")
    cost = F.coalesce(F.col("n_bpe"), F.length("word") + 1)
    return (joined.groupBy("doc_id")
            .agg(F.sum(cost).cast("int").alias("n_bpe_tokens"),
                 F.sum(F.col("n_bpe").isNull().cast("int")).cast("int")
                 .alias("n_oov_words")))


def oov_rate(docs: DataFrame, vocab: DataFrame,
             text_col: str = "text", id_col: str = "doc_id",
             lowercase: bool = True) -> DataFrame:
    """→ (doc_id, n_tokens, n_oov, oov_rate) — per-document out-of-
    vocabulary rate against a word table (any (word, ...) relation:
    word_freq_table output filtered by min count, a shipped tokenizer
    vocab, a benchmark lexicon). The corpus-vs-vocabulary fit signal a
    pipeline checks before committing to a tokenizer — high OOV marks
    domains the vocab under-serves. Empty docs emit no row (no tokens to
    judge — the sub-token rule).

    Shape: exploded token stream LEFT-semi-style joined against the
    vocabulary on `word` (broadcast when the vocab fits), then one
    map-side-combinable per-doc count — ANSI-expressible end to end
    (DuckDB parity in tests/test_bpe.py)."""
    toks = tokens_col(F.col(text_col))
    stream = docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(toks).alias("word"))
    if lowercase:
        stream = stream.select("doc_id", F.lower("word").alias("word"))
    marked = stream.join(
        vocab.select("word").distinct().withColumn("_in", F.lit(1)),
        "word", "left")
    return (marked.groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_tokens"),
                 F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                 .cast("int").alias("n_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("n_oov") / F.col("n_tokens")
                                + 1e-9, 4)))
