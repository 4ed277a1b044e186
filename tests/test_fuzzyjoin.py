"""Unit tests for the prefix-filtered fuzzy string join
(operators/fuzzyjoin.py): losslessness vs Python brute force."""

from __future__ import annotations

from gcp_serverless_etl_pipeline_lab_spark.operators.fuzzyjoin import (
    fuzzy_best_match,
    fuzzy_string_join,
)


def _grams(s: str) -> set[str]:
    s = s.lower()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _brute(probes, targets, t):
    out = set()
    for pid, p in probes:
        a = _grams(p)
        for tid, q in targets:
            b = _grams(q)
            if not a or not b:
                continue
            j = round(len(a & b) / len(a | b), 4)
            if j >= t:
                out.add((pid, tid, j))
    return out


PROBES = [
    (1, "the quick brown fox"),
    (2, "teh quick brown fox"),  # transposition typo
    (3, "completely different string"),
    (4, "the quick brown fo"),  # deletion
    (5, "ab"),  # too short: no trigrams
]
TARGETS = [
    (10, "the quick brown fox"),
    (11, "the quick brown foxes"),
    (12, "lorem ipsum dolor sit amet"),
    (13, "completely different string!"),
    (14, "the quick brown"),
]


def _spark_pairs(spark, t):
    p = spark.createDataFrame(PROBES, "pid_ bigint, s string")
    q = spark.createDataFrame(TARGETS, "tid_ bigint, s string")
    rows = fuzzy_string_join(p, q, "pid_", "s", "tid_", "s", threshold=t).collect()
    return {(r["pid"], r["tid"], r["jaccard"]) for r in rows}


def test_lossless_vs_brute_force(spark):
    for t in (0.3, 0.6, 0.8, 1.0):
        assert _spark_pairs(spark, t) == _brute(PROBES, TARGETS, t), t


def test_best_match_prefers_higher_jaccard_then_lower_id(spark):
    p = spark.createDataFrame(PROBES[:2], "pid_ bigint, s string")
    q = spark.createDataFrame(TARGETS, "tid_ bigint, s string")
    best = {
        r["pid"]: (r["tid"], r["jaccard"])
        for r in fuzzy_best_match(
            p, q, "pid_", "s", "tid_", "s", threshold=0.3
        ).collect()
    }
    assert best[1][0] == 10 and best[1][1] == 1.0  # exact match wins
    assert best[2][0] == 10  # typo still resolves to the right entity


def test_exact_threshold_one_only_identical_sets(spark):
    pairs = _spark_pairs(spark, 1.0)
    assert pairs == {(1, 10, 1.0)}
