"""BPE token estimation: trainer determinism, reduction semantics, the
vectorized count UDF vs a pure-Python oracle, and degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_tfdata_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_encode_word,
    bpe_token_count,
    bpe_train,
    _words,
)


def test_trainer_is_deterministic_and_useful():
    assert bpe_train() == DEFAULT_MERGES  # stable across calls/platforms
    assert len(DEFAULT_MERGES) >= 40
    # common english fragments surface early
    early = {"".join(p) for p in DEFAULT_MERGES[:20]}
    assert "th" in early and "in" in early


def test_leftmost_lowest_rank_reduction():
    # ranks: (a,b)=0 merges before (b,c)=1 even when (b,c) appears first
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert bpe_encode_word("bcab", ranks) == ["b", "c", "ab"] or \
        bpe_encode_word("bcab", ranks) == ["bc", "ab"]
    # precisely: step1 merges leftmost lowest rank (a,b) -> b c ab;
    # step2 merges (b,c) -> bc ab
    assert bpe_encode_word("bcab", ranks) == ["bc", "ab"]
    # overlapping occurrences reduce left to right, one per step
    ranks2 = {("a", "a"): 0}
    assert bpe_encode_word("aaa", ranks2) == ["aa", "a"]
    assert bpe_encode_word("aaaa", ranks2) == ["aa", "aa"]
    # unknown pairs leave the word as characters
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]


def test_count_udf_matches_python(spark):
    rows = [
        (0, "the quick brown fox the quick"),
        (1, "   MiXeD   Case\t and \n whitespace  "),
        (2, ""),
        (3, None),
        (4, "singleword"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    ranks = {p: r for r, p in enumerate(DEFAULT_MERGES)}
    for did, text in rows:
        want = sum(len(bpe_encode_word(w, ranks)) for w in _words(text or "") if w)
        assert got[did] == want, (did, got[did], want)
    assert got[2] == 0 and got[3] == 0
    # BPE never splits across whitespace: at least one token per word
    assert got[0] >= len(_words(rows[0][1]))


def test_custom_merges_table(spark):
    df = spark.createDataFrame([(0, "abab ab")], "doc_id long, text string")
    n = df.select(bpe_token_count(F.col("text"), merges=[("a", "b"), ("ab", "ab")])
                  .alias("n")).collect()[0]["n"]
    # "abab" -> ab ab -> abab (1 token); "ab" -> ab (1 token)
    assert n == 2
