"""JSONL source/sink semantics (sources/jsonl.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "doc_id bigint, text string, score double"


def test_roundtrip_types_and_values(spark, tmp_path):
    rows = [
        (1, 'quote " and backslash \\ and newline-free', 0.5),
        (2, "unicode é中文", -1.25),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "c")
    write_jsonl(df, out, shards=2)
    # shard control: exactly 2 part files
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 2
    back, corrupt = split_corrupt(read_jsonl(spark, out, SCHEMA))
    assert corrupt.count() == 0
    got = sorted((r.doc_id, r.text, r.score) for r in back.collect())
    assert got == sorted(rows)
    back.unpersist()


def test_corrupt_lines_routed_not_fatal(spark, tmp_path):
    df = spark.createDataFrame([(1, "ok", 1.0)], SCHEMA)
    out = str(tmp_path / "c")
    write_jsonl(df, out)
    with open(os.path.join(out, "bad.json"), "w") as f:
        f.write("{broken\n")
        f.write("also broken\n")
    clean, corrupt = split_corrupt(read_jsonl(spark, out, SCHEMA))
    assert clean.count() == 1
    bad = sorted(r.raw_line for r in corrupt.collect())
    assert bad == sorted(["{broken", "also broken"])
    assert "_corrupt_record" not in clean.columns
    clean.unpersist()


def test_explicit_schema_no_inference_extra_fields_ignored(spark, tmp_path):
    # extra JSON fields are dropped by the explicit schema (no inference
    # pass); missing fields are null
    out = str(tmp_path / "c")
    os.makedirs(out)
    with open(os.path.join(out, "d.json"), "w") as f:
        f.write('{"doc_id": 7, "text": "x", "score": 2.0, "extra": "zzz"}\n')
        f.write('{"doc_id": 8}\n')
    clean, corrupt = split_corrupt(read_jsonl(spark, out, SCHEMA))
    rows = {r.doc_id: r for r in clean.collect()}
    assert corrupt.count() == 0
    assert rows[7].text == "x" and "extra" not in clean.columns
    assert rows[8].text is None and rows[8].score is None
    clean.unpersist()


def test_csv_rfc_vs_naive_split_quoted_comma(spark, tmp_path):
    """SURVEY.md §1.3: the reference's naive split REJECTS a quoted-comma
    row (extra fields -> failed float cast), while standards-mode CSV
    accepts it. The engine ships both semantics; this pins the contrast."""
    from gcp_serverless_etl_pipeline_lab_spark.sources.csv_rfc import (
        read_csv_rfc,
        split_corrupt,
    )

    p = tmp_path / "quoted.csv"
    p.write_text(
        'id,product,price\n'
        '1,"Bluetooth Speaker, Portable",59.99\n'
        "2,Plain Product,10.0\n"
    )
    back = read_csv_rfc(spark, str(p), "id bigint, product string, price double")
    clean, corrupt = split_corrupt(back)
    rows = {r["id"]: r for r in clean.collect()}
    assert corrupt.count() == 0
    assert rows[1]["product"] == "Bluetooth Speaker, Portable"
    assert rows[1]["price"] == 59.99
    back.unpersist()


def test_csv_rfc_doubled_quote_roundtrip(spark, tmp_path):
    from gcp_serverless_etl_pipeline_lab_spark.sources.csv_rfc import (
        read_csv_rfc,
        split_corrupt,
        write_csv_rfc,
    )

    df = spark.createDataFrame(
        [(1, 'He said "hi", twice'), (2, "plain")], "id bigint, s string"
    )
    out = str(tmp_path / "rt")
    write_csv_rfc(df, out, shards=1)
    clean, corrupt = split_corrupt(read_csv_rfc(spark, out, "id bigint, s string"))
    got = {r["id"]: r["s"] for r in clean.collect()}
    assert got == {1: 'He said "hi", twice', 2: "plain"}
    assert corrupt.count() == 0


def test_csv_rfc_empty_vs_null_roundtrip(spark, tmp_path):
    """Empty string and null are distinct on disk (quoted "" vs unquoted
    empty field) and after the round trip — the fix for the default-option
    collapse where both read back as null."""
    from gcp_serverless_etl_pipeline_lab_spark.sources.csv_rfc import (
        read_csv_rfc,
        split_corrupt,
        write_csv_rfc,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None)], "id bigint, s string"
    )
    out = str(tmp_path / "en")
    write_csv_rfc(df, out, shards=1)
    clean, corrupt = split_corrupt(read_csv_rfc(spark, out, "id bigint, s string"))
    got = {r["id"]: r["s"] for r in clean.collect()}
    assert got == {1: "a", 2: "", 3: None}
    assert corrupt.count() == 0
