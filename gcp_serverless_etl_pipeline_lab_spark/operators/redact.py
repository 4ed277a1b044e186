"""PII redaction over a text column — scrub-before-train hygiene.

A training-data pipeline must strip personally-identifying strings before
text reaches a model. This operator covers the regex-expressible tier
(emails, IPv4 addresses) — the tier that is pure JVM-side expression work:
`regexp_replace` / `regexp_extract_all` evaluate map-side during the scan,
no shuffle, no UDF, and the patterns below are written in the common
subset of Java regex (Spark) and RE2 (DuckDB oracle) so both engines
redact identically. NER-based redaction (names, addresses) would slot in
as an Arrow `mapInPandas` stage like operators/multimodal.py — model
inference is out of scope for the engine.

Scale notes: linear scan, zero shuffle — the redaction column rides the
same projection as any other derived column; at 100 TB the only concern
is regex cost per byte, which is why the patterns are anchored,
backtrack-free character classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Common Java-regex / RE2 subset: no lookbehind, no possessive quantifiers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Adds (out_col, n_emails, n_ips): the text with every email and
    IPv4 literal replaced by a typed placeholder token, plus per-row match
    counts (count FIRST, then replace — order matters once the
    placeholder itself would no longer match).

    Emails are redacted before IPs, so a dotted-quad consumed by an email
    match (possible when the domain has an alphabetic TLD after
    IP-looking labels) counts once, as the email. A bare ``u@10.0.0.1``
    is NOT an email per the pattern (the TLD must be alphabetic); its
    dotted-quad redacts as an IP.
    """
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    redacted_email = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    n_ips = F.size(
        F.regexp_extract_all(redacted_email, F.lit(IPV4_RE), F.lit(0))
    )
    return df.withColumn("n_emails", n_emails.cast("bigint")).withColumn(
        "n_ips", n_ips.cast("bigint")
    ).withColumn(
        out_col, F.regexp_replace(redacted_email, IPV4_RE, IP_TOKEN)
    )


def domain_quota_sample(
    df: DataFrame,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-domain cap: keep at most ``quota`` rows per
    domain, chosen by ascending 60-bit hash of the id (a stable
    pseudo-random draw — re-running or re-partitioning picks the SAME
    survivors, unlike ``rand()``-ranked sampling).

    The canonical mixing-control op for web-scale corpora: one domain
    (or one crawl bucket) must not dominate the training mix. Plan: one
    shuffle by domain; rank inside each domain; Spark's WindowGroupLimit
    pushes the ``rank <= quota`` cut below the final sort at scale. A
    pathologically hot domain still funnels its rows through one window
    partition — at 100 TB pre-filter with a cheap per-domain count and
    hash-threshold (sampling.py) so only near-quota domains rank; kept
    exact here because quota selection must be exact, not approximate.

    Returns the surviving rows with their ``quota_rank`` (1-based).
    """
    from pyspark.sql import Window

    from ..functions.hashing import h60

    w = Window.partitionBy(domain_col).orderBy(
        h60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= quota)
    )
