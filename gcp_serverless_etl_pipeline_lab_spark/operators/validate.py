"""R1–R9 — the validation chain as a single-pass ``when``-cascade.

Reference behavior (`dataflow/dataflow_transform.py:37-125`): each raw line
either becomes a clean row or exactly one error record labeled with the
FIRST failing check, in this order:

    header-drop → tokenize/trim → arity → required-fields → dedup →
    numeric cast → positive range → date parse → product clean → id digits

The reference's dedup is bundle-local per worker
(`dataflow_transform.py:67-74`, with the code itself noting global dedup
needs a GroupByKey). We implement the stated intent — GLOBAL
first-occurrence-wins by file order — and preserve the subtle ordering
semantic that an id is *claimed* at the dedup step: a row that passes the
required-field check consumes its id even if it later fails a cast, so a
subsequent row with the same id is still routed to
``Duplicate id in this bundle``.

Everything is built-in column expressions — no Python UDFs — so the whole
cascade runs inside one whole-stage-codegen span; the only shuffle is the
hash-partition on the dedup key (unavoidable for a global dedup; ineligible
rows get a per-row synthetic key so the null-key partition can't skew).

Deliberate cast-semantics pins (SURVEY.md §7.4):
- ``float(price_str)``  → lenient ``cast('double')`` (null on fail).
- ``int(quantity_str)`` → Python ``int()`` rejects ``'5.0'`` while Spark's
  string→int cast truncates it, so we gate with ``^[+-]?[0-9]+$`` before
  casting to bigint.
- ``strptime`` accepts non-zero-padded month/day, so the Spark formats are
  ``yyyy-M-d`` / ``yyyy/M/d`` (CORRECTED parser: month 18 → null → error).
- Python numeric-literal extensions are DELIBERATELY rejected: ``int('1_0')``
  and ``float('1_0.5')`` succeed in CPython (PEP 515 underscore grouping),
  and ``str.isdigit()`` accepts unicode digits (e.g. ``'٥'``), but the
  ``_INT_RE`` gate and Spark's double cast route such rows to
  ``Invalid price or quantity`` / ``Non-numeric id``. These are CSV-exotic
  inputs the reference never exercises; ASCII-only numerics are the
  documented contract (same pin class as the ``'5.0'`` int gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.text_csv import LINE_COL, LINE_ID_COL

ERROR_COL = "error"

ERR_MALFORMED = "Malformed row, not enough fields"
ERR_MISSING = "Missing required field"
ERR_DUPLICATE = "Duplicate id in this bundle"
ERR_INVALID_PQ = "Invalid price or quantity"
ERR_NON_POSITIVE = "Non-positive price or quantity"
ERR_INVALID_DATE = "Invalid sale_date"
ERR_INVALID_PRODUCT = "Invalid product name"
ERR_NON_NUMERIC_ID = "Non-numeric id"

ALL_ERRORS = (
    ERR_MALFORMED,
    ERR_MISSING,
    ERR_DUPLICATE,
    ERR_INVALID_PQ,
    ERR_NON_POSITIVE,
    ERR_INVALID_DATE,
    ERR_INVALID_PRODUCT,
    ERR_NON_NUMERIC_ID,
)

_INT_RE = "^[+-]?[0-9]+$"
_DIGITS_RE = "^[0-9]+$"


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (c != F.lit(""))


def tokenize(df: DataFrame, line_col: str = LINE_COL) -> DataFrame:
    """R1+R2: drop header lines, naive split(',').

    Per-token trim happens at field extraction (``annotate``) instead of a
    higher-order ``transform`` over the array: HOF lambdas evaluate
    interpreted (outside whole-stage codegen) and the cascade references
    the array many times, which measured ~6× slower end-to-end at sf0.1.
    Plain ``split`` + ``trim(element_at(...))`` stays fully codegen'd.
    """
    no_header = df.filter(~F.lower(F.col(line_col)).startswith("id,"))
    return no_header.withColumn("_parts", F.split(F.col(line_col), ",", -1))


def annotate(raw: DataFrame, line_col: str = LINE_COL) -> DataFrame:
    """Annotate raw lines with parsed/cleaned fields and an ``error`` column.

    Input:  DataFrame[value: string, _line_id: long] (see sources.text_csv).
    Output: one row per non-header input line, with typed clean columns and
    ``error`` null iff the row is clean. Callers split it once (R12).
    """
    df = tokenize(raw, line_col)

    # R4 positional projection + R2 trim; element_at is 1-based and null
    # past the end. (Like the reference's str.strip + DuckDB trim, ASCII
    # space trimming; exotic unicode whitespace is out of scope.)
    df = (
        df.withColumn("_id_raw", F.trim(F.element_at("_parts", 1)))
        .withColumn("_product_raw", F.trim(F.element_at("_parts", 2)))
        .withColumn("_price_raw", F.trim(F.element_at("_parts", 3)))
        .withColumn("_quantity_raw", F.trim(F.element_at("_parts", 4)))
        .withColumn("_date_raw", F.trim(F.element_at("_parts", 5)))
    )

    arity_ok = F.size("_parts") >= 5
    fields_ok = (
        _nonempty(F.col("_id_raw"))
        & _nonempty(F.col("_product_raw"))
        & _nonempty(F.col("_price_raw"))
        & _nonempty(F.col("_quantity_raw"))
        & _nonempty(F.col("_date_raw"))
    )

    # R6 global dedup: only rows past arity+required-fields claim an id.
    # The window partitions on (eligible, key); ineligible rows key on their
    # own line id so they hash-spread instead of skewing one null bucket.
    #
    # Round-15 optimization (guide §2.3, project before the exchange): the
    # window is the cascade's ONE shuffle, and it used to carry the full
    # `_parts` split array (the widest column — per-element UnsafeArray
    # overhead on top of re-shipping every field's bytes a second time)
    # plus cast/derived columns computed below it. The explicit select
    # here drops `_parts` (its consumers — the five field extracts and
    # the arity bit — are already materialized) and the casts/date/regex
    # columns are now computed ABOVE the window, so they never ride the
    # exchange either. `~fields_ok` in the cascade's second arm is
    # spelled `~eligible`: the first arm already caught `~arity_ok`, and
    # eligible = arity_ok & fields_ok, so they are equivalent there.
    eligible = arity_ok & fields_ok
    df = df.select(
        line_col,
        LINE_ID_COL,
        "_id_raw",
        "_product_raw",
        "_price_raw",
        "_quantity_raw",
        "_date_raw",
        arity_ok.alias("_arity_ok"),
        eligible.alias("_dedup_eligible"),
        F.when(eligible, F.col("_id_raw"))
        .otherwise(F.col(LINE_ID_COL).cast("string"))
        .alias("_dedup_key"),
    )
    first_line = F.min(LINE_ID_COL).over(
        Window.partitionBy("_dedup_eligible", "_dedup_key")
    )
    df = df.withColumn(
        "_is_dup", F.col("_dedup_eligible") & (F.col(LINE_ID_COL) > first_line)
    )

    # R7 numeric casts (lenient; see module docstring for the int gate).
    price = F.col("_price_raw").cast("double")
    quantity = F.when(
        F.col("_quantity_raw").rlike(_INT_RE), F.col("_quantity_raw").cast("bigint")
    )
    # R8 multi-format date parse; CORRECTED parser → null on semantic errors.
    sale_date = F.coalesce(
        F.to_date("_date_raw", "yyyy-M-d"), F.to_date("_date_raw", "yyyy/M/d")
    )
    # R9a/R9b string cleaning.
    product_clean = F.regexp_replace(F.col("_product_raw"), "[\"']", "")
    id_ok = F.col("_id_raw").rlike(_DIGITS_RE)

    df = (
        df.withColumn("_price", price)
        .withColumn("_quantity", quantity)
        .withColumn("_sale_date", sale_date)
        .withColumn("_product_clean", product_clean)
    )

    # Ordered short-circuit: first failing check wins (Catalyst never
    # reorders a when-chain).
    error = (
        F.when(~F.col("_arity_ok"), ERR_MALFORMED)
        .when(~F.col("_dedup_eligible"), ERR_MISSING)
        .when(F.col("_is_dup"), ERR_DUPLICATE)
        .when(F.col("_price").isNull() | F.col("_quantity").isNull(), ERR_INVALID_PQ)
        .when((F.col("_price") <= 0) | (F.col("_quantity") <= 0), ERR_NON_POSITIVE)
        .when(F.col("_sale_date").isNull(), ERR_INVALID_DATE)
        .when(F.col("_product_clean") == "", ERR_INVALID_PRODUCT)
        .when(~id_ok, ERR_NON_NUMERIC_ID)
    )
    return df.withColumn(ERROR_COL, error).drop("_is_dup")
