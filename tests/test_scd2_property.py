"""Property-based tests for the SCD2 builder (hypothesis): engine vs an
independent pure-Python interval spec, and incremental-apply == full
rebuild for every generated append-only split."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_serverless_etl_pipeline_lab_spark.operators.scd2 import (
    scd2_apply_append,
    scd2_history,
)

BASE = dt.datetime(2024, 1, 1)

# small pools force collisions: few keys, few states, coarse timestamps
# (same-ts ties exercised via the id tiebreak)
row = st.tuples(
    st.integers(min_value=1, max_value=3),                    # key
    st.sampled_from(["a", "b", "c", None]),                   # state
    st.integers(min_value=0, max_value=12),                   # hour offset
)


def _spec(rows):
    """Reference semantics: per key, order by (ts, id), compress
    consecutive equal states, intervals close at the next change."""
    out = []
    by_key: dict[int, list] = {}
    for i, (k, s, h) in enumerate(rows):
        by_key.setdefault(k, []).append((BASE + dt.timedelta(hours=h), i, s))
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        versions = []
        prev = object()
        for ts, i, s in evs:
            if versions and s == prev:
                continue
            versions.append([ts, s, i])
            prev = s
        for n, (ts, s, i) in enumerate(versions):
            nxt = versions[n + 1][0] if n + 1 < len(versions) else None
            out.append((k, n + 1, s, ts, nxt, nxt is None, i))
    return sorted(out, key=lambda t: (t[0], t[1]))


def _collect(df):
    return sorted(
        (
            r["k"],
            r["version_n"],
            r["state"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
            r["opened_by"],
        )
        for r in df.collect()
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=16))
def test_history_matches_spec(spark, rows):
    df = spark.createDataFrame(
        [(k, s, BASE + dt.timedelta(hours=h), i) for i, (k, s, h) in enumerate(rows)],
        "k bigint, state string, ts timestamp, id bigint",
    )
    got = _collect(scd2_history(df, "k", "state", "ts", "id"))
    assert got == _spec(rows)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=2, max_size=16), st.integers(min_value=1, max_value=11))
def test_incremental_apply_equals_rebuild(spark, rows, cutoff_h):
    """For ANY time-cutoff split (append-only by construction: base takes
    everything strictly before the cutoff hour), applying the tail as a
    delta to the base history must equal the full rebuild."""
    cutoff = BASE + dt.timedelta(hours=cutoff_h)
    data = [
        (k, s, BASE + dt.timedelta(hours=h), i)
        for i, (k, s, h) in enumerate(rows)
    ]
    schema = "k bigint, state string, ts timestamp, id bigint"
    df = spark.createDataFrame(data, schema)
    base = scd2_history(df.filter(df.ts < cutoff), "k", "state", "ts", "id")
    inc = scd2_apply_append(
        base, df.filter(df.ts >= cutoff), "k", "state", "ts", "id"
    )
    full = scd2_history(df, "k", "state", "ts", "id")
    assert _collect(inc) == _collect(full)
