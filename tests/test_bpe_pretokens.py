"""BPE pre-tokenizer: Spark (Java regex), DuckDB (RE2), and Python `re`
must tokenize IDENTICALLY — including the engine-divergence traps the
pattern was written to avoid (vertical tab \\x0B sits inside Java's \\s
but outside RE2's, which is why BPE_PRETOKEN_RE carries an explicit
whitespace class)."""

from __future__ import annotations

import re

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.functions.text import (
    BPE_PRETOKEN_RE,
    bpe_pretokens,
    bpe_pretokens_duck,
)

SLOW = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# printable ASCII + the trap characters: tab/newline/formfeed/CR (in the
# class) and vertical tab \x0B (deliberately NOT whitespace here)
_CHARS = st.sampled_from(
    list("abz AZ09.,'!-_@#\t\n\f\r") + ["\x0b", "'s", "'ll", "don't"]
)
_TEXT = st.lists(_CHARS, min_size=0, max_size=24).map("".join)


def _py_tokens(text: str) -> list[str]:
    return re.findall(BPE_PRETOKEN_RE, text)


def _duck_tokens(text: str) -> list[str]:
    lit = text.replace("'", "''")
    rows = duckdb.sql("SELECT " + bpe_pretokens_duck(f"'{lit}'")).fetchone()
    return list(rows[0])


@SLOW
@given(text=_TEXT)
def test_three_engines_tokenize_identically(spark, text):
    py = _py_tokens(text)
    assert _duck_tokens(text) == py
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(bpe_pretokens(F.col("text")).alias("t"))
        .collect()[0]
    )
    assert list(row["t"]) == py


def test_vertical_tab_is_punct_not_whitespace(spark):
    # the documented trap: \x0B must land in the punct class on EVERY
    # engine (Java's \s would have classified it as whitespace)
    text = "a\x0bb"
    py = _py_tokens(text)
    assert py == ["a", "\x0b", "b"]
    assert _duck_tokens(text) == py
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(bpe_pretokens(F.col("text")).alias("t"))
        .collect()[0]
    )
    assert list(row["t"]) == py
