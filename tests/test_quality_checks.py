"""constraint_report on deliberately dirty data — every constraint type
must fire with the exact violation count."""

from __future__ import annotations

import pytest

from gcp_serverless_etl_pipeline_lab_spark.operators.quality_checks import (
    constraint_report,
)


def test_all_constraint_types_fire(spark):
    rows = [
        (1, 100, "A", 5.0),
        (1, 101, "A", -2.0),   # dup id, negative amount
        (2, None, "B", 3.0),   # null custkey
        (3, 102, "X", 0.0),    # bad domain, non-positive amount
    ]
    df = spark.createDataFrame(rows, "id long, cust long, status string, amount double")
    parent = spark.createDataFrame([(100,), (101,)], "pk long")
    out = constraint_report(
        df,
        not_null=["cust"],
        unique=["id"],
        predicates={"amount_positive": "amount > 0"},
        domains={"status": ["A", "B"]},
        referential={"cust_referential": (parent, "cust", "pk")},
        table="t",
    ).collect()
    got = {r.constraint_name: (r.checked, r.violations) for r in out}
    assert got == {
        "t.cust_not_null": (4, 1),
        "t.id_unique": (4, 1),
        "t.amount_positive": (4, 2),
        "t.status_domain": (4, 1),
        # orphans: NULL cust (no match) + 102 -> 2 of 4 rows
        "t.cust_referential": (4, 2),
    }


def test_no_constraints_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        constraint_report(df)
