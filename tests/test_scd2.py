"""Unit tests for the SCD2 history builder (operators/scd2.py)."""

from __future__ import annotations

import datetime as dt

from gcp_serverless_etl_pipeline_lab_spark.operators.scd2 import scd2_history


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _hist(spark, rows):
    df = spark.createDataFrame(
        rows, "k bigint, state string, ts timestamp, id bigint"
    )
    return {
        (r["k"], r["version_n"]): r
        for r in scd2_history(
            df, key_col="k", state_col="state", ts_col="ts", tiebreak_col="id"
        ).collect()
    }


def test_consecutive_duplicates_compress(spark):
    out = _hist(
        spark,
        [
            (1, "a", _ts("2024-01-01T00:00:00"), 1),
            (1, "a", _ts("2024-01-02T00:00:00"), 2),  # no change -> merged
            (1, "b", _ts("2024-01-03T00:00:00"), 3),
            (1, "a", _ts("2024-01-04T00:00:00"), 4),  # back to a = NEW version
        ],
    )
    assert len(out) == 3
    assert out[(1, 1)]["state"] == "a"
    assert out[(1, 1)]["valid_from"] == _ts("2024-01-01T00:00:00")
    assert out[(1, 1)]["valid_to"] == _ts("2024-01-03T00:00:00")
    assert out[(1, 2)]["state"] == "b"
    assert out[(1, 3)]["state"] == "a"
    assert out[(1, 3)]["valid_to"] is None and out[(1, 3)]["is_current"]


def test_exactly_one_current_per_key(spark):
    out = _hist(
        spark,
        [
            (1, "x", _ts("2024-01-01T00:00:00"), 1),
            (1, "y", _ts("2024-01-02T00:00:00"), 2),
            (2, "z", _ts("2024-01-01T00:00:00"), 3),
        ],
    )
    currents = [r for r in out.values() if r["is_current"]]
    assert sorted((r["k"], r["state"]) for r in currents) == [(1, "y"), (2, "z")]
    # closed intervals chain: each valid_to equals the next valid_from
    assert out[(1, 1)]["valid_to"] == out[(1, 2)]["valid_from"]


def test_timestamp_tie_broken_by_id(spark):
    t = _ts("2024-01-01T00:00:00")
    out = _hist(
        spark,
        [
            (1, "b", t, 2),
            (1, "a", t, 1),  # same ts: id order decides -> a first, then b
        ],
    )
    assert out[(1, 1)]["state"] == "a"
    assert out[(1, 2)]["state"] == "b"
    assert out[(1, 2)]["is_current"]


def test_null_state_change_detection(spark):
    out = _hist(
        spark,
        [
            (1, None, _ts("2024-01-01T00:00:00"), 1),
            (1, None, _ts("2024-01-02T00:00:00"), 2),  # null==null -> merged
            (1, "a", _ts("2024-01-03T00:00:00"), 3),
        ],
    )
    assert len(out) == 2
    assert out[(1, 1)]["state"] is None
    assert out[(1, 2)]["state"] == "a"


def test_apply_append_equals_full_rebuild(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.scd2 import (
        scd2_apply_append,
        scd2_history,
    )

    rows = [
        # key 1: history a->b, delta extends b (compresses) then c
        (1, "a", _ts("2024-01-01T00:00:00"), 1),
        (1, "b", _ts("2024-01-02T00:00:00"), 2),
        (1, "b", _ts("2024-01-05T00:00:00"), 10),  # delta, same state
        (1, "c", _ts("2024-01-06T00:00:00"), 11),  # delta, new state
        # key 2: untouched by the delta
        (2, "x", _ts("2024-01-01T00:00:00"), 3),
        # key 3: brand-new key arriving only in the delta
        (3, "z", _ts("2024-01-05T00:00:00"), 12),
    ]
    df = spark.createDataFrame(rows, "k bigint, state string, ts timestamp, id bigint")
    cutoff = _ts("2024-01-04T00:00:00")
    base = scd2_history(
        df.filter(df.ts < cutoff), "k", "state", "ts", "id"
    )
    inc = scd2_apply_append(
        base, df.filter(df.ts >= cutoff), "k", "state", "ts", "id"
    )
    full = scd2_history(df, "k", "state", "ts", "id")
    key = lambda r: (r["k"], r["version_n"], r["state"], r["valid_from"],
                     r["valid_to"], r["is_current"], r["opened_by"])
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))


def test_apply_append_contract_validation(spark):
    """validate_contract=True rejects a delta row whose (ts, tiebreak)
    does not sort strictly after the key's current (valid_from,
    opened_by) — the case where incremental apply silently diverges from
    a full rebuild (phantom extra version)."""
    import pytest

    from gcp_serverless_etl_pipeline_lab_spark.operators.scd2 import (
        scd2_apply_append,
        scd2_history,
    )

    base_rows = [
        (1, "a", _ts("2024-01-01T00:00:00"), 5),
    ]
    base = scd2_history(
        spark.createDataFrame(base_rows, "k bigint, state string, ts timestamp, id bigint"),
        "k", "state", "ts", "id",
    )
    # same ts as the open interval's valid_from, tiebreak BEFORE opened_by
    bad_delta = spark.createDataFrame(
        [(1, "b", _ts("2024-01-01T00:00:00"), 2)],
        "k bigint, state string, ts timestamp, id bigint",
    )
    with pytest.raises(ValueError, match="contract violation"):
        scd2_apply_append(base, bad_delta, "k", "state", "ts", "id", validate_contract=True)
    # a conforming delta passes validation and matches the full rebuild
    good_delta = spark.createDataFrame(
        [(1, "b", _ts("2024-01-02T00:00:00"), 7)],
        "k bigint, state string, ts timestamp, id bigint",
    )
    inc = scd2_apply_append(base, good_delta, "k", "state", "ts", "id", validate_contract=True)
    assert inc.filter("state = 'b' AND is_current").count() == 1
