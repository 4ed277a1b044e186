"""Text-analysis building blocks for the training-data pipeline extensions.

All pure built-in column expressions (whole-stage-codegen'd, no Python in
the hot path). Where an operator needs the DuckDB oracle to agree
value-for-value, the paired `*_duck` helper emits the equivalent DuckDB SQL
snippet built from the same formula.

Scale notes (100 TB design point):
- Everything here is per-row map-side work — no shuffle, fully parallel;
  cost is bounded by bytes scanned.
- Word n-gram / shingle sets are built as array columns via
  `transform(sequence(...))` rather than explode+groupBy, so signature
  computation never shuffles the corpus (only downstream candidate
  generation does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic toy marker sets — a real system ships
# fastText-style models; the *operator shape* (score-per-language →
# argmax with stable tiebreak) is what matters here.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "de", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

TOKEN_RE = "[a-z]+|[0-9]+"  # BPE-ish: alpha runs and digit runs


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on single spaces)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ", -1)


def word_ngrams_sql(tokens_expr: str, n: int) -> str:
    """Spark-SQL: distinct word n-grams of a token array, as an array.

    Guarded with ``if(size >= n, ..., array())`` because Spark's
    ``sequence(1, 0)`` generates a DESCENDING [1, 0] rather than an empty
    array.
    """
    gram = " , ".join(f"element_at({tokens_expr}, i + {j})" for j in range(n))
    return (
        f"IF(size({tokens_expr}) >= {n},"
        f" array_distinct(transform(sequence(1, size({tokens_expr}) - {n - 1}),"
        f" i -> concat_ws(' ', {gram}))),"
        f" CAST(array() AS array<string>))"
    )


def word_ngrams_duck(tokens_expr: str, n: int) -> str:
    """DuckDB: the identical distinct word n-gram list (1-based lists;
    ``range(a, b)`` is half-open so the bound is ``len - n + 2``)."""
    gram = " || ' ' || ".join(f"{tokens_expr}[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, CASE WHEN len({tokens_expr}) >= {n}"
        f" THEN len({tokens_expr}) - {n - 2} ELSE 1 END),"
        f" i -> {gram}))"
    )


# GPT-2-style pre-tokenizer, ASCII subset: contraction suffixes, optionally
# space-prefixed letter runs / digit runs / punctuation runs, residual
# whitespace runs. Deliberately restricted to constructs Java regex (Spark,
# JVM-side regexp_extract_all) and RE2 (DuckDB oracle) compile IDENTICALLY:
# no \p{L} classes, no lookarounds (RE2 has neither), leftmost-first
# alternation in both, and an EXPLICIT whitespace class — Java's \s
# includes vertical tab \x0B, RE2's does not, so \s itself is not
# engine-identical. The real GPT-2 pattern adds \p{L}/\p{N} and a
# trailing-space lookahead; the *operator shape* — count BPE pre-tokens as
# one vectorized regexp pass, zero Python — is identical.
BPE_WS = " \\t\\n\\f\\r"  # engine-identical whitespace class body
BPE_PRETOKEN_RE = (
    "'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+"
    f"| ?[^a-zA-Z0-9{BPE_WS}]+|[{BPE_WS}]+"
)


def bpe_pretokens(text: Column | str) -> Column:
    """BPE pre-token array of a string column (one JVM regex pass)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_pretokens_duck(text_expr: str) -> str:
    """DuckDB: the identical pre-token list (RE2; same pattern verbatim)."""
    lit = BPE_PRETOKEN_RE.replace("'", "''")
    return f"regexp_extract_all({text_expr}, '{lit}')"


def url_host(url: Column | str) -> Column:
    """Host of a URL via the JVM built-in ``parse_url`` (strips scheme,
    userinfo, port, path/query/fragment) — zero Python, codegen'd."""
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("HOST"))


def url_host_duck(url_expr: str) -> str:
    """DuckDB twin of ``url_host`` (RE2 component grammar — authority
    after ``scheme://`` with optional userinfo, host stops at
    ``: / ? #``). Divergence caveat: Spark's parse_url validates via
    java.net.URI and returns NULL for RFC-invalid hosts (e.g. an
    underscore label) that this permissive extraction still returns —
    the twins agree only on RFC-valid host characters ``[a-zA-Z0-9.-]``,
    so sanitize inputs to that set before comparing cross-engine (the
    harness query does). Hive's parse_url exposes no PORT part, so port
    detection goes through the authority (see harness.corpus)."""
    return (
        f"regexp_extract({url_expr},"
        " '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)"
    )


def registrable_domain(host: Column) -> Column:
    """Last two host labels ('sub.a.example.com' -> 'example.com') — the
    toy stand-in for a public-suffix-list lookup; the GROUPING shape
    (domain-level rollups for mixing/quota decisions) is what matters."""
    return F.substring_index(host, ".", -2)


def registrable_domain_duck(host_expr: str) -> str:
    return f"regexp_extract({host_expr}, '([^.]+[.][^.]+)$', 1)"
