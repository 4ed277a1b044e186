"""Per-operator edge-case units for the validation chain (SURVEY.md §2.2,
§7.4 risk register): cast-edge parity with Python semantics, id claiming
order for dedup, header handling, arity edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.transform import split_clean_errors
from gcp_serverless_etl_pipeline_lab_spark.operators.validate import (
    ERR_DUPLICATE,
    ERR_INVALID_DATE,
    ERR_INVALID_PQ,
    ERR_MALFORMED,
    ERR_MISSING,
    ERR_NON_NUMERIC_ID,
    ERR_NON_POSITIVE,
    annotate,
)
from gcp_serverless_etl_pipeline_lab_spark.sources.text_csv import lines_from_strings


def route_of(spark, line: str) -> str | None:
    """Run one line through the chain; return its error label (None=clean)."""
    df = annotate(lines_from_strings(spark, [line]))
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]["error"]


CASES = [
    ("1,Widget,9.99,2,2024-01-15", None),
    ("1,Widget,9.99,2,2024/1/5", None),  # strptime accepts non-padded m/d
    ("1,Widget,9.99,2,2024-1-5", None),
    ("01,Widget,9.99,2,2024-01-15", None),  # leading zeros preserved
    ("1,Widget,twenty,2,2024-01-15", ERR_INVALID_PQ),
    ("1,Widget,9.99,5.0,2024-01-15", ERR_INVALID_PQ),  # Python int() rejects '5.0'
    ("1,Widget,9.99,2.5,2024-01-15", ERR_INVALID_PQ),
    ("1,Widget,9.99,+2,2024-01-15", None),  # Python int() accepts '+2'
    ("1,Widget,-9.99,2,2024-01-15", ERR_NON_POSITIVE),
    ("1,Widget,0,2,2024-01-15", ERR_NON_POSITIVE),
    ("1,Widget,9.99,0,2024-01-15", ERR_NON_POSITIVE),
    ("1,Widget,9.99,2,2024-18-01", ERR_INVALID_DATE),  # month 18: semantic parse
    ("1,Widget,9.99,2,2024-02-30", ERR_INVALID_DATE),  # day 30 in Feb
    ("1,Widget,9.99,2,notadate", ERR_INVALID_DATE),
    ('1,"""",9.99,2,2024-01-15', "Invalid product name"),  # quotes-only product
    ("x1,Widget,9.99,2,2024-01-15", ERR_NON_NUMERIC_ID),
    ("-1,Widget,9.99,2,2024-01-15", ERR_NON_NUMERIC_ID),  # isdigit rejects '-1'
    ("1,Widget,9.99", ERR_MALFORMED),
    ("", ERR_MALFORMED),  # empty line → one token → arity fails
    (",,,,", ERR_MISSING),  # five empty tokens → required-field
    ("1,Widget,9.99,2,", ERR_MISSING),
    ("1,Widget,9.99,2,2024-01-15,extra,extra2", None),  # extras ignored
]


@pytest.mark.parametrize("line,expected", CASES)
def test_single_line_routing(spark, line, expected):
    assert route_of(spark, line) == expected


def test_header_dropped_case_insensitive(spark):
    df = annotate(lines_from_strings(spark, ["ID,product,price,quantity,sale_date", "Id,x,y,z,w"]))
    assert df.count() == 0


def test_dedup_first_wins_by_file_order(spark):
    lines = [
        "5,First,1.00,1,2024-01-01",
        "5,Second,2.00,1,2024-01-02",
        "5,Third,3.00,1,2024-01-03",
    ]
    clean, errors = split_clean_errors(annotate(lines_from_strings(spark, lines)))
    kept = clean.collect()
    assert len(kept) == 1 and kept[0].product == "First"
    assert errors.filter(F.col("error") == ERR_DUPLICATE).count() == 2


def test_dedup_id_claimed_even_if_first_row_later_fails(spark):
    """Reference claims the id at the dedup step (dataflow_transform.py:70-74):
    a first occurrence that fails a *later* check still blocks the id."""
    lines = [
        "7,BadPrice,zzz,1,2024-01-01",  # claims id 7, then fails cast
        "7,GoodRow,5.00,1,2024-01-02",  # still a duplicate
    ]
    clean, errors = split_clean_errors(annotate(lines_from_strings(spark, lines)))
    assert clean.count() == 0
    labels = sorted(r.error for r in errors.collect())
    assert labels == [ERR_DUPLICATE, ERR_INVALID_PQ]


def test_dedup_not_claimed_by_missing_field_row(spark):
    """A row failing the required-field check never reaches the dedup step,
    so it does NOT claim its id."""
    lines = [
        "9,,1.00,1,2024-01-01",  # missing product → never claims id 9
        "9,Good,5.00,1,2024-01-02",
    ]
    clean, errors = split_clean_errors(annotate(lines_from_strings(spark, lines)))
    assert clean.count() == 1 and clean.collect()[0].product == "Good"
    assert errors.collect()[0].error == ERR_MISSING


def test_error_precedence_first_check_wins(spark):
    # Row violating cast AND range AND date AND id: cast error reported.
    assert route_of(spark, "x,Widget,bad,0,baddate") == ERR_INVALID_PQ
    # Violating range AND date: range wins.
    assert route_of(spark, "1,Widget,-1,1,baddate") == ERR_NON_POSITIVE
