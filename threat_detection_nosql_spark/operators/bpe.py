"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The 100 TB shape: BPE iterations never touch the corpus — the corpus
is scanned ONCE into a (word, count) vocabulary (one shuffle keyed on
word), and every merge iteration is an aggregation over that distinct
vocabulary (at web scale ~10^7-10^8 rows, trivially distributed),
exactly how production subword trainers scale. Per iteration the
engine does: one map-combinable pair-count aggregation, a 1-row argmax
collect (bounded driver state — the same per-iteration-scalar pattern
as distributed Lloyd), and a map-side string rewrite of the vocabulary.

Merge application uses a space-delimited symbol string and literal
``replace`` passes: the pattern ``' a b '`` → ``' ab '`` applied to
fixpoint. Java's ``UTF8String.replace`` (Spark) and DuckDB's
``replace`` share leftmost non-overlapping source-scan semantics, so
the oracle replays every merge byte-for-byte. NOTE the one documented
deviation from the reference BPE algorithm: inside an ODD run of ≥ 5
equal symbols ("aaaaa" merging a+a) the non-overlapping scan groups
``aa a aa`` where the canonical left-to-right scan gives
``aa aa a`` — same merge COUNT, different grouping. Both engines
implement the same (deterministic) variant, which is what the oracle
check verifies. ``_N_PASSES = 4`` reaches fixpoint for any word of
≤ ``_MAX_WORD_CHARS`` symbols (brute-verified in tests over random
symbol strings; random worst case is 2 passes).

No analog in the reference (its corpus is an activity log); this is
part of the LLM-training-data surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_WORD_CHARS = 24   # drop pathological tokens (standard practice)
_N_PASSES = 4          # replace passes per merge: fixpoint for <= 24 syms
_WORD_RE = r"[a-z']+"  # pre-tokenization: lowercase words + apostrophes


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, cnt) vocabulary: the ONE corpus-wide shuffle of
    the whole training run. Pre-tokenization (lowercase ``[a-z']+``
    runs) happens map-side inside codegen; the aggregation is
    map-combinable so the shuffle carries distinct words per task, not
    token occurrences."""
    return (docs
            .select(F.explode(
                F.regexp_extract_all(F.lower(text_col), F.lit(_WORD_RE),
                                     F.lit(0)))
                .alias("word"))
            .filter(F.length("word") <= _MAX_WORD_CHARS)
            .groupBy("word")
            .agg(F.count("*").alias("cnt")))


def _initial_segments(words: DataFrame) -> DataFrame:
    """(word, cnt) → (word, cnt, seg): seg is the space-delimited
    character sequence with sentinel spaces at both ends, e.g.
    ``' l o w '`` — the working representation every merge rewrites."""
    chars = F.transform(F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.substring(F.col("word"), i, F.lit(1)))
    return words.select(
        "word", "cnt",
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
        .alias("seg"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word count. The
    explode is over symbols-per-word (≤ ``_MAX_WORD_CHARS``), and the
    aggregation map-combines, so the shuffle carries distinct pairs."""
    toks = F.filter(F.split("seg", " "), lambda x: x != F.lit(""))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(F.slice(toks, 1, n), F.slice(toks, 2, n),
                       lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    return (vocab.select("cnt", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c")))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every segment with the merge (left, right) → left+right:
    ``_N_PASSES`` literal-replace passes reach the fixpoint (no adjacent
    pair survives). Pure map-side expression — no shuffle."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    seg = F.col("seg")
    for _ in range(_N_PASSES):
        seg = F.replace(seg, pat, rep)
    return vocab.select("word", "cnt", seg.alias("seg"))


def bpe_train(words: DataFrame, n_merges: int = 8,
              ) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) vocabulary.

    Returns ``(merges, final_vocab)``: merges is a list of
    ``{rank, left, right, merged, pair_count}`` dicts (rank 1-based,
    argmax ties broken on count DESC, left ASC, right ASC — fully
    deterministic), final_vocab is the lazily-evaluated (word, cnt,
    seg) frame after all merges.

    Iteration state: each round caches the current vocabulary, runs the
    pair-count argmax (a 1-row collect — bounded driver traffic, like
    collecting k centroids per Lloyd round), rewrites map-side, and
    unpersists the previous round's cache. Stops early if no adjacent
    pairs remain (tiny corpora).
    """
    vocab = _initial_segments(words)
    merges: list[dict] = []
    cached: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        vocab = vocab.cache()
        cached.append(vocab)
        best = (_pair_counts(vocab)
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], best[0]["c"]
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": left + right, "pair_count": int(cnt)})
        vocab = _apply_merge(vocab, left, right)
        if len(cached) > 1:
            cached.pop(0).unpersist()
    # materialize the final vocab off the last cached lineage, then
    # release every block this call pinned (call-scoped caches)
    final = vocab.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return merges, final
