"""Distributed BPE tokenizer training — Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL 2016):
learn a byte-pair-encoding merge table from the corpus, the vocabulary a
training pipeline ships alongside its data (token budgeting with the
REAL tokenizer instead of the BPE-ish regex proxy, OOV-free encoding).

The Spark shape is the one that survives 100 TB: BPE statistics are a
function of the WORD-FREQUENCY table, not the corpus — so the corpus is
touched exactly ONCE (explode tokens → groupBy word), and every merge
round runs over the vocabulary-bounded (word, n, syms) relation:

- pair counts are a PERSISTED (a, b, cnt) table maintained by DELTAS
  (r8): applying merge (a, b) subtracts the old pair counts of the words
  that contained the pair adjacent and adds their post-merge counts —
  the per-round explode is bounded by the AFFECTED words' symbols, which
  shrinks toward zero as merges specialize, never the full vocabulary;
- the argmax pair is a deterministic TakeOrderedAndProject (count DESC,
  pair lexicographic) — one 2-string scalar reaches the driver per round,
  which IS the merge table being learned (driver-sized by definition);
- applying a merge rewrites the AFFECTED words' symbol arrays (greedy
  left-to-right, the reference semantics) in one Arrow pass; unaffected
  rows ride through a map-only union; state and counts are checkpointed
  every round (the cc.py discipline).

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


def _pair_counts(state: DataFrame, sign: int = 1) -> DataFrame:
    """(a, b, cnt) adjacent-symbol pair counts of a (word, n, syms)
    relation, weighted by word count × ``sign`` (−1 = a subtraction
    delta). One explode + one map-side-combinable groupBy."""
    return (state.select(
        "n",
        F.explode(F.expr(
            "transform(slice(syms, 1, size(syms) - 1), "
            "(s, i) -> struct(s as a, syms[i + 1] as b))"))
        .alias("p"))
        .groupBy("p.a", "p.b")
        .agg((F.lit(sign) * F.sum("n")).alias("cnt")))


def _has_adjacent(a: str, b: str):
    """Boolean Column: syms contains the pair (a, b) adjacent. Pure
    Column construction (no SQL-string interpolation — corpus words can
    contain quotes)."""
    syms = F.col("syms")
    flags = F.transform(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda s, i: (s == F.lit(a)) &
                     (F.element_at(syms, i + 2) == F.lit(b)))
    return F.array_contains(flags, True)


def bpe_train(word_freqs: DataFrame, n_merges: int = 100,
              min_pair_count: int = 2,
              round_stats: list | None = None) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a (word, n) table; returns the
    ordered merge list — the whole artifact (2·n_merges strings, driver-
    sized by definition). Stops early when no adjacent pair reaches
    ``min_pair_count``.

    The merge loop is DELTA-BOUNDED (r7 VERDICT what's-wrong #1 — the
    per-round full recount was 30k+ full-vocabulary explode+agg jobs at a
    real tokenizer's merge count): pair counts live in a persisted
    (a, b, cnt) table; applying merge (a, b) touches only the words whose
    symbol arrays contain the pair adjacent — their old pair counts are
    subtracted, their post-merge counts added, and the counts table is
    re-aggregated (pair-vocabulary-bounded, typically orders of magnitude
    below Σ|word symbols|). The corpus-sized pass stays exactly ONE
    (word_freq_table); per round the only explode runs over the affected
    words, whose total size shrinks toward zero as merges specialize —
    the known scalable Sennrich formulation. The argmax stays a
    deterministic TakeOrderedAndProject on the counts table (count DESC,
    pair lexicographic), so the merge list is bit-identical to the full
    recount (pinned in tests/test_bpe.py).

    ``round_stats``, if a list, receives one dict per applied merge:
    {"affected_words": int, "vocab_words": int} — the measured
    affected-fraction evidence (BENCH/BASELINE.md)."""
    import time

    state = word_freqs.select("word", "n",
                              _sym_init(F.col("word")).alias("syms")) \
        .localCheckpoint(eager=True)
    n_words = state.count()
    # the per-round state update is unaffected ∪ merged — a union ADDS
    # partition counts, so without a coalesce the state doubles its
    # (mostly empty) partitions every round and scheduling overhead grows
    # exponentially with merges; pin it to the input parallelism
    p0 = max(1, state.rdd.getNumPartitions())
    counts = _pair_counts(state).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        t0 = time.perf_counter()
        top = (counts.orderBy(F.desc("cnt"), "a", "b").limit(1)
               .collect())
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        adjacent = _has_adjacent(a, b)
        affected = state.filter(adjacent).localCheckpoint(eager=True)
        merged = affected.select(
            "word", "n",
            _merge_syms_udf(a, b)(F.col("syms")).alias("syms")) \
            .localCheckpoint(eager=True)
        counts = (counts
                  .unionByName(_pair_counts(affected, sign=-1))
                  .unionByName(_pair_counts(merged))
                  .groupBy("a", "b").agg(F.sum("cnt").alias("cnt"))
                  .filter(F.col("cnt") > 0)
                  .localCheckpoint(eager=True))
        state = state.filter(~adjacent).unionByName(merged) \
            .coalesce(p0).localCheckpoint(eager=True)
        if round_stats is not None:
            sizes = affected.agg(
                F.count("*").alias("w"),
                F.coalesce(F.sum(F.size("syms")), F.lit(0)).alias("s")) \
                .collect()[0]
            vocab_syms = state.agg(
                F.sum(F.size("syms"))).collect()[0][0]
            round_stats.append({"affected_words": int(sizes["w"]),
                                "affected_syms": int(sizes["s"]),
                                "vocab_words": n_words,
                                "vocab_syms": int(vocab_syms),
                                "sec": round(time.perf_counter() - t0, 4)})
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
                    lowercase: bool = True,
                    id_cols: list[str] | None = None) -> DataFrame:
    """→ (*ids, n_bpe_tokens, n_oov_words) — per-document token budget
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
    OOV word count surfaces as ``n_oov_words`` so the fallback is loud.

    ``id_cols`` overrides the single ``id_col`` for composite-keyed rows
    — e.g. chunk tables keyed (doc_id, chunk_idx), the real-tokenizer
    budget feeding pack_sequences(len_col="n_bpe_tokens")."""
    keys = list(id_cols) if id_cols else [id_col]
    toks = tokens_col(F.col(text_col))
    w = F.explode(toks).alias("word")
    stream = docs.select(*keys, w)
    if lowercase:
        stream = stream.select(*keys, F.lower("word").alias("word"))
    joined = stream.join(encoded_vocab.select("word", "n_bpe"),
                         "word", "left")
    cost = F.coalesce(F.col("n_bpe"), F.length("word") + 1)
    return (joined.groupBy(*keys)
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


def tokenizer_fertility(docs: DataFrame, encoded_vocab: DataFrame,
                        by: str = "lang", text_col: str = "text",
                        lowercase: bool = True) -> DataFrame:
    """→ (by, n_words, n_bpe_tokens, n_oov_words, tokens_per_word,
    chars_per_token, oov_rate) — per-stratum tokenizer FERTILITY audit:
    how many subword tokens the learned vocabulary spends per word and
    how many characters each token carries, per language/domain. The
    fairness check a multilingual pipeline runs before committing to a
    tokenizer (cf. Petrov et al. 2023, "Language Model Tokenizers
    Introduce Unfairness Between Languages": under-served languages pay
    more tokens for the same content, which costs context window and
    training compute). OOV words cost their zero-merge worst case
    (len+1), counted separately — the bpe_token_count convention.

    One explode + one vocab join + one map-side-combinable groupBy; all
    ratios rounded with the repo's +1e-9 epsilon."""
    toks = tokens_col(F.col(text_col))
    stream = docs.select(F.col(by), F.explode(toks).alias("word"))
    if lowercase:
        stream = stream.select(by, F.lower("word").alias("word"))
    joined = stream.join(encoded_vocab.select("word", "n_bpe"),
                         "word", "left")
    cost = F.coalesce(F.col("n_bpe"), F.length("word") + 1)
    agg = (joined.groupBy(by)
           .agg(F.count("*").cast("long").alias("n_words"),
                F.sum(cost).cast("long").alias("n_bpe_tokens"),
                F.sum(F.col("n_bpe").isNull().cast("int")).cast("long")
                .alias("n_oov_words"),
                F.sum(F.length("word")).cast("long").alias("_chars")))
    return agg.select(
        by, "n_words", "n_bpe_tokens", "n_oov_words",
        F.round(F.col("n_bpe_tokens") / F.col("n_words") + 1e-9, 4)
        .alias("tokens_per_word"),
        F.round(F.col("_chars") / F.col("n_bpe_tokens") + 1e-9, 4)
        .alias("chars_per_token"),
        F.round(F.col("n_oov_words") / F.col("n_words") + 1e-9, 4)
        .alias("oov_rate"))
