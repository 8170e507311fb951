"""BPE tokenizer trainer: oracle parity + pinned merge semantics."""

from __future__ import annotations

import random

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import tokenizer


@pytest.mark.parametrize("name", sorted(tokenizer.QUERIES))
def test_tokenizer_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, tokenizer.QUERIES[name],
                            tokenizer.ORACLES[name])


def test_bpe_learns_planted_merges(spark):
    """A corpus dominated by 'aaab' (15 occurrences) pins the exact
    trajectory: (a,a)=30 wins rank 1 → ' aa a b '; then (aa,a) and
    (a,b) tie at 15 and the left-ASC tie-break picks (a,b) →
    ' aa ab '; then (aa,ab)=15 → ' aaab '. Pair counts are exact
    corpus frequencies at each round."""
    from threat_detection_nosql_spark.operators.bpe import (
        bpe_train, word_counts)
    docs = spark.createDataFrame(
        [(i, "aaab aaab aaab zq") for i in range(5)],
        "doc_id long, text string")
    merges, final = bpe_train(word_counts(docs), n_merges=3)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    # 'aaab' appears 15x: pairs per word = (a,a)x2, (a,b)x1 →
    # (a,a)=30 wins; then ' aa a b ' → (aa,a)=15 beats (a,b)=15 on
    # left ASC tie-break ('a' < 'aa'... actually 'a' < 'aa') so (a,b)
    # wins rank 2; then (aa,ab)? no — ' aa ab ' pairs (aa,ab)=15
    assert got[0] == ("a", "a", 30)
    assert got[1] == ("a", "b", 15)      # tie 15 vs 15: 'a' < 'aa'
    assert got[2] == ("aa", "ab", 15)
    segs = {r["word"]: r["seg"].strip()
            for r in final.collect()}
    assert segs["aaab"] == "aaab"
    assert segs["zq"] == "z q"


def test_replace_passes_reach_fixpoint(spark):
    """_N_PASSES literal-replace passes must eliminate every adjacent
    occurrence of the merged pair for words up to _MAX_WORD_CHARS
    symbols — brute-forced over random symbol strings, comparing the
    Spark fixpoint against Python's identical str.replace semantics."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.operators.bpe import (
        _MAX_WORD_CHARS, _N_PASSES)

    rng = random.Random(42)
    rows = []
    for i in range(300):
        length = rng.randint(1, _MAX_WORD_CHARS)
        syms = [rng.choice(["a", "b", "ab", "c"]) for _ in range(length)]
        rows.append((i, " " + " ".join(syms) + " "))
    pairs = [("a", "a"), ("a", "b"), ("ab", "ab"), ("b", "a")]

    df = spark.createDataFrame(rows, "id long, seg string")
    for left, right in pairs:
        pat, rep = f" {left} {right} ", f" {left}{right} "
        col = F.col("seg")
        for _ in range(_N_PASSES):
            col = F.replace(col, F.lit(pat), F.lit(rep))
        got = {r["id"]: r["out"]
               for r in df.select("id", col.alias("out")).collect()}
        for i, seg in rows:
            want = seg
            while pat in want:
                want = want.replace(pat, rep)
            assert got[i] == want, (seg, left, right)
            assert pat not in got[i]


def test_bpe_family_is_oracle_backed_in_registry():
    """The BPE family must stay oracle-backed (ahead of the rows-only
    park) so any future window rotation can sample it — position inside
    the first 50 is a per-round rotation choice, not an invariant."""
    from threat_detection_nosql_spark.queries import all_oracles, all_queries
    names = list(all_queries())
    oracles = all_oracles()
    for q in ("bpe_merges", "bpe_top_segments"):
        assert q in oracles
        assert q in names
