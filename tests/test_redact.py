"""PII redaction + domain quota sampling semantics (operators/redact.py)."""

from __future__ import annotations

from gcp_serverless_etl_pipeline_lab_spark.operators.redact import (
    EMAIL_TOKEN,
    IP_TOKEN,
    domain_quota_sample,
    redact_pii,
)


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_redact_counts_and_tokens(spark):
    df = _rows(
        spark,
        [
            (1, "mail a.b+c@sub.example.org and peer 192.168.0.1 done"),
            (2, "no pii here"),
            (3, "two mails x@y.io z@w.ai one ip 10.0.0.255"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_emails, out[1].n_ips) == (1, 1)
    assert EMAIL_TOKEN in out[1].text_redacted and IP_TOKEN in out[1].text_redacted
    assert "example.org" not in out[1].text_redacted
    assert (out[2].n_emails, out[2].n_ips) == (0, 0)
    assert out[2].text_redacted == "no pii here"
    assert (out[3].n_emails, out[3].n_ips) == (2, 1)


def test_redact_order_email_before_ip(spark):
    # u@10.0.0.1 is NOT an email per the pattern (TLD must be alphabetic),
    # so its dotted-quad redacts as an IP; a real email whose local part
    # precedes an IP-looking domain label (u@mail10.0.0.1.example.com)
    # matches the email pattern and consumes the digits with it — the
    # emails-first order contract in the docstring.
    df = _rows(
        spark,
        [
            (1, "ping u@10.0.0.1 ok"),
            (2, "mail u@mail10.0.0.1.example.com ok"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_emails, out[1].n_ips) == (0, 1)
    assert out[1].text_redacted == f"ping u@{IP_TOKEN} ok"
    assert (out[2].n_emails, out[2].n_ips) == (1, 0)
    assert out[2].text_redacted == f"mail {EMAIL_TOKEN} ok"


def test_domain_quota_deterministic_and_capped(spark):
    data = [(i, f"src{i % 3}") for i in range(100)]
    df = _rows(spark, data, "doc_id bigint, source string")
    out1 = sorted((r.source, r.doc_id, r.quota_rank) for r in
                  domain_quota_sample(df, quota=5).collect())
    out2 = sorted((r.source, r.doc_id, r.quota_rank) for r in
                  domain_quota_sample(df.repartition(7), quota=5).collect())
    assert out1 == out2, "survivors must not depend on partitioning"
    per_src: dict = {}
    for s, _, rk in out1:
        per_src.setdefault(s, []).append(rk)
    assert set(per_src) == {"src0", "src1", "src2"}
    for ranks in per_src.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_domain_quota_small_domain_keeps_all(spark):
    df = _rows(spark, [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, source string")
    out = domain_quota_sample(df, quota=10).collect()
    assert len(out) == 3
