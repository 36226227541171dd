"""Aho-Corasick keyword matching: automaton correctness (pure Python,
fuzzed vs replace-count semantics) and the Spark UDF wrapper."""

import random

import pytest
from pyspark.sql import functions as F

from discoverx_spark.functions.keywords import (build_automaton,
                                                count_matches,
                                                make_keyword_match_udf)


def _replace_count(text: str, kw: str) -> int:
    """Leftmost-greedy non-overlapping count — SQL replace() semantics."""
    return (len(text) - len(text.replace(kw, ""))) // len(kw)


def _counts(keywords, text):
    goto, fail, out = build_automaton(keywords)
    return count_matches(goto, fail, out, keywords, text)


def test_basic_counts():
    kws = ["he", "she", "his", "hers"]
    got = _counts(kws, "ushers")
    assert got == [_replace_count("ushers", k) for k in kws]
    # "ushers": she at 1, he at 2 (overlaps she -> still counted: separate
    # keyword), hers at 2
    assert got == [1, 1, 0, 1]


def test_self_overlapping_keyword_greedy():
    kws = ["aa"]
    assert _counts(kws, "aaaa") == [2]        # replace semantics, not 3
    assert _counts(kws, "aaa") == [1]
    kws = ["aba"]
    assert _counts(kws, "ababa") == [1]       # second occurrence overlaps


def test_keyword_substring_of_another():
    kws = ["cat", "catalog"]
    got = _counts(kws, "catalog cat catalogue")
    assert got == [3, 2]


def test_fuzz_vs_replace_count():
    rng = random.Random(42)
    alphabet = "abc "
    kws = ["a", "ab", "ba", "abc", "aab", "b c", "ca"]
    goto, fail, out = build_automaton(kws)
    for _ in range(300):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 60)))
        got = count_matches(goto, fail, out, kws, text)
        want = [_replace_count(text, k) for k in kws]
        assert got == want, f"text={text!r}"


def test_empty_keyword_raises():
    with pytest.raises(ValueError, match="empty"):
        build_automaton(["ok", ""])


def test_udf_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "Spark SPARK spark"), (2, "no hits here"), (3, None)],
        "doc_id long, text string")
    udf = make_keyword_match_udf(["spark", "hits here"])
    out = (df.select("doc_id", F.explode(udf(F.col("text"))).alias("m"))
           .select("doc_id", "m.kw", "m.cnt"))
    got = {(r["doc_id"], r["kw"]): r["cnt"] for r in out.collect()}
    assert got == {(1, "spark"): 3, (2, "hits here"): 1}
