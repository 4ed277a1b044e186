"""Property-based test of the validation chain (hypothesis).

An independent pure-Python specification of the reference's documented
routing rules (SURVEY.md §2.2 R1–R9, first failing check wins, global
first-by-file-order dedup; cast pins per operators/validate.py docstring)
is evaluated against the Spark ``when``-cascade on randomized inputs.
Field values draw from pools that stay inside the documented contract
(ASCII numerics, no PEP-515 underscores, pinned date candidates) — the
property is that ENGINE == SPEC on every composition, ordering, and
arity the generator can produce, not just the 26 golden fixture rows.
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_serverless_etl_pipeline_lab_spark.operators.validate import (
    ERR_DUPLICATE,
    ERR_INVALID_DATE,
    ERR_INVALID_PQ,
    ERR_INVALID_PRODUCT,
    ERR_MALFORMED,
    ERR_MISSING,
    ERR_NON_NUMERIC_ID,
    ERR_NON_POSITIVE,
    annotate,
)
from gcp_serverless_etl_pipeline_lab_spark.sources.text_csv import (
    LINE_ID_COL,
    lines_from_strings,
)

_INT_RE = re.compile(r"^[+-]?[0-9]+$")

IDS = ["1", "2", "004", "0010", " 12 ", "twenty", "1.5", "-3", "", "7"]
PRODUCTS = ["Widget", '"Quoted"', "''", '"', "Two Words", "", " Pad ", "x'y"]
PRICES = ["19.99", "-49.99", "0", "5", "1e2", "twenty", " 7.5 ", "+3", ""]
QUANTITIES = ["2", "5.0", "0", "-1", " 9 ", "+4", "word", "", "10"]
DATES = [
    "2024-01-15",
    "2024/01/22",
    "2024-1-5",
    "2024-18-01",
    "2024-02-30",
    "notadate",
    "",
    "2023-12-31",
]
EXTRAS = ["EXTRA", "", "x"]


def _spec_parse_date(s: str) -> bool:
    for fmt in ("%Y-%m-%d", "%Y/%m/%d"):
        try:
            dt.datetime.strptime(s, fmt)
            return True
        except ValueError:
            pass
    return False


def _spec_route(lines: list[str]) -> dict[int, str | None]:
    """Reference routing rules, re-expressed directly from SURVEY.md §2.2.
    Returns {line_index: error or None-for-clean}; header lines absent."""
    out: dict[int, str | None] = {}
    claimed: set[str] = set()
    for i, line in enumerate(lines):
        if line.lower().startswith("id,"):
            continue
        parts = line.split(",")
        fields = [p.strip(" ") for p in parts[:5]]
        if len(parts) < 5:
            out[i] = ERR_MALFORMED
            continue
        id_, product, price_s, qty_s, date_s = fields
        if any(f == "" for f in fields):
            out[i] = ERR_MISSING
            continue
        if id_ in claimed:
            out[i] = ERR_DUPLICATE
            continue
        claimed.add(id_)  # id claimed even if a later check fails
        try:
            price = float(price_s)
        except ValueError:
            price = None
        qty = int(qty_s) if _INT_RE.match(qty_s) else None
        if price is None or qty is None:
            out[i] = ERR_INVALID_PQ
            continue
        if price <= 0 or qty <= 0:
            out[i] = ERR_NON_POSITIVE
            continue
        if not _spec_parse_date(date_s):
            out[i] = ERR_INVALID_DATE
            continue
        if re.sub("[\"']", "", product) == "":
            out[i] = ERR_INVALID_PRODUCT
            continue
        if not re.match(r"^[0-9]+$", id_):
            out[i] = ERR_NON_NUMERIC_ID
            continue
        out[i] = None
    return out


row_strategy = st.one_of(
    # well-formed arity-5..6 rows from the pools
    st.tuples(
        st.sampled_from(IDS),
        st.sampled_from(PRODUCTS),
        st.sampled_from(PRICES),
        st.sampled_from(QUANTITIES),
        st.sampled_from(DATES),
        st.sampled_from(EXTRAS),
    ).map(lambda t: ",".join(t[:5]) + (("," + t[5]) if t[5] else "")),
    # short rows (arity failures)
    st.lists(st.sampled_from(IDS + PRICES), min_size=0, max_size=4).map(
        ",".join
    ),
    # header lines in random positions
    st.just("id,product,price,quantity,sale_date"),
    st.just("ID,PRODUCT,PRICE,QUANTITY,SALE_DATE"),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row_strategy, min_size=0, max_size=30))
def test_engine_matches_spec(spark, lines):
    expected = _spec_route(lines)
    got = {
        r[LINE_ID_COL]: r["error"]
        for r in annotate(lines_from_strings(spark, lines)).collect()
    }
    assert got == expected
