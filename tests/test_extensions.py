"""Unit tests for the training-data-pipeline extensions: the cross-dialect
hash primitive, multimodal Arrow plumbing, and LSH recall sanity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.functions.hashing import (
    h60,
    h60_duck,
    h60_sql,
)
from gcp_serverless_etl_pipeline_lab_spark.operators import multimodal, similarity
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table


def test_h60_matches_duckdb(spark):
    values = ["", "hello", "a,b c", "0|three gram token", "ünïcode"]
    sdf = spark.createDataFrame([(v,) for v in values], ["s"])
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", h60("s").alias("h")).collect()
    }
    exp_expr = h60_duck("s")
    con = duckdb.connect()
    for v in values:
        expected = con.execute(
            f"SELECT {exp_expr} FROM (SELECT ? AS s)", [v]
        ).fetchone()[0]
        assert got[v] == expected, v
    # the SQL-snippet spelling agrees with the Column spelling
    snippet = h60_sql("'hello'")
    r = spark.sql(f"SELECT {snippet} AS h").collect()[0]["h"]
    assert r == got["hello"]


def test_h60_nonnegative_60bit(spark):
    mx = (
        load_table(spark, SF_SMOKE, "documents")
        .select(h60("text").alias("h"))
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .collect()[0]
    )
    assert mx["mn"] >= 0
    assert mx["mx"] < 1 << 60


def test_embeddings_unit_norm(spark):
    # similarity search treats cosine == dot; assert the precondition.
    norms = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select(
            F.expr(
                "abs(aggregate(embedding, CAST(0 AS DOUBLE),"
                " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) - 1.0) AS d"
            )
        )
        .agg(F.max("d").alias("mx"))
        .collect()[0]["mx"]
    )
    assert norms < 1e-5


def test_multimodal_payload_features_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    media = multimodal.attach_fake_payload(docs)
    out = multimodal.payload_features(media)
    assert [f.name for f in out.schema] == [
        "doc_id", "n_bytes", "first_byte", "checksum", "width", "height",
    ]
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["n_bytes"] == 16 for r in rows)
    assert all(0 <= r["first_byte"] <= 255 for r in rows)
    assert all(0 <= r["checksum"] < multimodal.CHECKSUM_MOD for r in rows)


def test_multimodal_frame_fanout(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    video = multimodal.attach_fake_frames(docs)
    # payload really is NUM_FRAMES * 16 bytes
    n_bytes = video.select(F.length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in n_bytes] == [multimodal.NUM_FRAMES * 16]
    out = multimodal.sample_frames(video)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("frame_idx").alias("idx")
    )
    rows = per_doc.collect()
    assert all(r["n"] == 3 for r in rows)  # frames 0, 3, 6
    assert all(sorted(r["idx"]) == [0, 3, 6] for r in rows)


def test_multimodal_real_decode_import_gated():
    """decode_image_real is a REAL Pillow-backed path (round 6): without
    Pillow it fails fast with an actionable ImportError; with Pillow it
    decodes (covered end-to-end in tests/test_multimodal_real.py)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="Pillow"):
            multimodal.decode_image_real(b"\x00" * 16)
    else:
        img = multimodal.decode_image_real(_tiny_png())
        assert img.width >= 1


def _tiny_png() -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (1, 1)).save(buf, format="PNG")
    return buf.getvalue()


def test_multitable_lsh_recall_at_least_0_9(spark):
    """Multi-table LSH must recover >= 90% of the true top-5 pairs on the
    test corpus — the single-table recall ceiling is the documented gap it
    closes. Deterministic: planes and corpus are both fixed."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, 64, k=5).collect()
    }
    mt = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_topk_multitable(
            emb, queries, 64, k=5, tables=8, planes_per_table=2
        ).collect()
    }
    recall = len(mt & bf) / len(bf)
    assert recall >= 0.9, f"multi-table recall {recall:.2f} < 0.9"


def test_lsh_recall_against_bruteforce(spark):
    """sign-LSH is approximate: every (query, neighbor) it returns must
    also score identically in brute force, and returned neighbors must
    share the query's bucket."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in similarity.brute_force_topk(emb, queries, 64, k=emb.count()).collect()
    }
    lsh = similarity.lsh_topk(emb, queries, 64, k=5).collect()
    assert lsh, "LSH returned nothing — buckets degenerate"
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        assert key in bf
        assert abs(bf[key] - r["score"]) < 1e-9


def test_pack_sequences_invariants(spark):
    """Every doc packed exactly once; no sequence exceeds the budget unless
    it holds a single oversized document; sequence ids are dense per shard."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [
            # shard 0 (ids % 4 == 0): 60+50 fit in 100; 70 starts new seq
            (0, " ".join(["w"] * 60)),
            (4, " ".join(["w"] * 50)),
            (8, " ".join(["w"] * 70)),
            # shard 1: one oversized doc (150 > 100) alone, then a small one
            (1, " ".join(["w"] * 150)),
            (5, " ".join(["w"] * 10)),
        ],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, max_tokens=100, shards=4)
    rows = {r.doc_id: r for r in packed.collect()}
    assert len(rows) == 5  # every doc assigned exactly once
    # 60 alone fits; +50 would be 110 > 100 -> new seq; +70 would be 120 -> new
    assert (rows[0].seq_id, rows[4].seq_id, rows[8].seq_id) == (0, 1, 2)
    # oversized doc occupies its own sequence; next doc starts a new one
    assert rows[1].seq_id == 0 and rows[1].n_tokens == 150
    assert rows[5].seq_id == 1


def test_chunk_documents_geometry(spark):
    """Every token covered; consecutive chunks share exactly `overlap`
    tokens; short docs yield one chunk; chunk text round-trips."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.chunking import (
        chunk_documents,
    )

    words = [f"w{i}" for i in range(50)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc only")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=20, overlap=5)
    rows = sorted(
        (r.doc_id, r.chunk_id, r.chunk_tokens, r.chunk_text)
        for r in out.collect()
    )
    # doc 1: stride 15, ceil((50-5)/15)=3 chunks: [0:20], [15:35], [30:50]
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2]
    assert [r[2] for r in d1] == [20, 20, 20]
    assert d1[0][3].split(" ") == words[0:20]
    assert d1[1][3].split(" ") == words[15:35]
    assert d1[2][3].split(" ") == words[30:50]
    # overlap: last 5 of chunk 0 == first 5 of chunk 1
    assert d1[0][3].split(" ")[-5:] == d1[1][3].split(" ")[:5]
    # doc 2: single chunk, intact text
    d2 = [r for r in rows if r[0] == 2]
    assert len(d2) == 1 and d2[0][3] == "short doc only" and d2[0][2] == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.chunking import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    try:
        chunk_documents(docs, max_tokens=10, overlap=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_contamination_report_thresholds(spark):
    """A train doc containing an eval doc's 7-word span shares exactly
    3 distinct 5-gram shingles; unrelated docs share none; min_shared
    gates the flag."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.decontaminate import (
        contamination_report,
    )

    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the full 7-word eval span -> 3 shared 5-grams
            (1, "intro words alpha beta gamma delta epsilon zeta eta outro"),
            # shares only a 5-word span -> 1 shared 5-gram
            (2, "x alpha beta gamma delta epsilon y"),
            (3, "totally unrelated text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    r3 = {r.doc_id: r.n_shared for r in contamination_report(train, evalset, n=5, min_shared=3).collect()}
    assert r3 == {1: 3}
    r1 = {r.doc_id: r.n_shared for r in contamination_report(train, evalset, n=5, min_shared=1).collect()}
    assert r1 == {1: 3, 2: 1}


def test_mix_corpus_allowlist_and_determinism(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.mixing import mix_corpus

    docs = load_table(spark, SF_SMOKE, "documents")
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    mixed = mix_corpus(docs, weights)
    kept_sources = {r.source for r in mixed.select("source").distinct().collect()}
    # allowlist: unlisted and zero-weight sources vanish entirely
    assert kept_sources <= {"src0", "src1"}
    # weight 1.0 keeps everything
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert mixed.filter(F.col("source") == "src0").count() == n_src0
    # deterministic: same rows on re-evaluation after a repartition
    a = sorted(r.doc_id for r in mixed.collect())
    b = sorted(r.doc_id for r in mix_corpus(docs.repartition(7), weights).collect())
    assert a == b
    try:
        mix_corpus(docs, {"src0": 1.5})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_temperature_mixture_rates_math_and_sampling(spark):
    """T=0.5 temperature resampling: rate_i = sqrt(n_min/n_i) (smallest
    source keeps all), expected kept ∝ sqrt(n_i); sampling is
    deterministic in doc_id and within binomial noise of the expected
    counts; invalid inputs rejected."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from gcp_serverless_etl_pipeline_lab_spark.operators.mixing import (
        mix_corpus_temperature,
        temperature_mixture_rates,
    )

    counts = {"web": 40_000, "code": 10_000, "books": 2_500}
    rates = temperature_mixture_rates(counts, 0.5)
    assert rates["books"] == 1.0
    assert abs(rates["code"] - 0.5) < 1e-6
    assert abs(rates["web"] - math.sqrt(2_500 / 40_000)) < 1e-6
    with pytest.raises(ValueError, match="temperature"):
        temperature_mixture_rates(counts, 0.0)
    with pytest.raises(ValueError, match="positive"):
        temperature_mixture_rates({"a": 0}, 0.5)
    assert temperature_mixture_rates({}, 0.5) == {}

    rows = [(i, "web" if i % 5 != 0 else "code") for i in range(5000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mix_corpus_temperature(docs, 0.5)
    got = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["code"] == 1000  # smallest source keeps everything
    # web keeps ~ sqrt(1000/4000) = 0.5 of 4000 -> 2000 ± binomial noise
    assert abs(got["web"] - 2000) < 150, got
    # deterministic: identical membership on a re-run
    again = {r["source"]: r["n"] for r in mix_corpus_temperature(docs, 0.5).groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == got


def test_dyadic_pow_matches_pow_and_duckdb_chain():
    """dyadic_pow (round-10 verdict task 4): for every dyadic exponent
    k/2^m the sqrt/multiply chain agrees with libm pow to float
    tolerance, and DuckDB replaying dyadic_pow_sql's spelling reproduces
    the chain BIT-FOR-BIT — the property that makes any dyadic-T mixture
    cross-engine hash-exact."""
    import math
    import struct

    import duckdb

    from gcp_serverless_etl_pipeline_lab_spark.operators.mixing import (
        _dyadic_exponent,
        dyadic_pow,
        dyadic_pow_sql,
    )

    assert _dyadic_exponent(0.5) == (1, 1)
    assert _dyadic_exponent(0.25) == (1, 2)
    assert _dyadic_exponent(0.375) == (3, 3)
    assert _dyadic_exponent(0.3) is None  # 0.3 is not dyadic

    con = duckdb.connect()
    xs = [0.0625, 0.1, 1 / 3, 0.5, 0.999, 1.0, 7.0, 12345.678]
    for k, m in [(1, 1), (1, 2), (3, 3), (5, 4), (7, 3)]:
        for x in xs:
            py = dyadic_pow(x, k, m)
            assert abs(py - x ** (k / (1 << m))) <= 4 * abs(py) * 2**-52
            (duck,) = con.sql(
                f"SELECT {dyadic_pow_sql(f'CAST({x!r} AS DOUBLE)', k, m)}"
            ).fetchone()
            assert struct.pack("<d", py) == struct.pack("<d", duck), (
                k, m, x, py, duck,
            )


def test_temperature_mixture_arbitrary_dyadic_t_proportions(spark):
    """Realized kept counts at T=0.75 approach n_i^0.75 within binomial
    noise, and rates come from the exact dyadic chain (not pow)."""
    from pyspark.sql import functions as F

    from gcp_serverless_etl_pipeline_lab_spark.operators.mixing import (
        dyadic_pow,
        mix_corpus_temperature,
        temperature_mixture_rates,
    )

    counts = {"web": 40_000, "code": 10_000, "books": 2_500}
    rates = temperature_mixture_rates(counts, 0.75)
    assert rates["books"] == 1.0
    for src, n in counts.items():
        want = dyadic_pow(2_500 / n, 1, 2) if n != 2_500 else 1.0
        assert abs(rates[src] - want) <= 1e-6

    rows = [(i, "web" if i % 5 != 0 else "code") for i in range(5000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: r["n"]
        for r in mix_corpus_temperature(docs, 0.75)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["code"] == 1000
    # web keeps (1000/4000)^0.25 ≈ 0.7071 of 4000 ≈ 2828 ± binomial noise
    assert abs(got["web"] - 2828) < 150, got
    # kept ratio web/code ≈ (4000/1000)^0.75 = 2.83 (the p ∝ n^T law)
    assert abs(got["web"] / got["code"] - 4**0.75) < 0.3


def test_exact_rational_threshold_integer_and_duckdb(spark):
    """Non-dyadic rational temperatures (round 15, closes the carried
    exactness item): the 1e-6-grid threshold for rate = (n_min/n)^(p/q)
    is computed by a pure-INTEGER inequality — verified against an
    exact Fraction reference over random (counts, p, q), against DuckDB
    replaying the same inequality in HUGEINT, and end-to-end through
    mix_corpus_temperature with the tuple spelling."""
    import random
    from fractions import Fraction

    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from gcp_serverless_etl_pipeline_lab_spark.operators.mixing import (
        MIX_MOD,
        _exact_rational_threshold,
        exact_rational_threshold_sql,
        mix_corpus_temperature,
        temperature_mixture_rates,
    )

    def ref(n_min, n, p, q):
        target = Fraction(2 * MIX_MOD) ** q * Fraction(n_min, n) ** p
        lo, hi = 0, MIX_MOD
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if Fraction(2 * mid - 1) ** q <= target:
                lo = mid
            else:
                hi = mid - 1
        return lo

    rng = random.Random(15)
    con = duckdb.connect()
    for _ in range(200):
        q = rng.randint(1, 5)
        p = rng.randint(1, q)
        n_min = rng.randint(1, 10**6)
        n = rng.randint(n_min, 10**7)
        t = _exact_rational_threshold(n_min, n, p, q)
        assert t == ref(n_min, n, p, q), (n_min, n, p, q)
        # the SQL spelling is bounded by HUGEINT (int128); the Python
        # path is unbounded bigint. Cross-check DuckDB only where the
        # products fit — the documented domain (small p/q, the shape
        # real mixtures use; the a0m oracle runs p=2, q=3).
        if (2 * MIX_MOD + 1) ** q * n**p < 2**127:
            (duck,) = con.sql(
                "SELECT "
                + exact_rational_threshold_sql(str(n), str(n_min), p, q)
            ).fetchone()
            assert t == duck, (n_min, n, p, q, t, duck)
    # the smallest source keeps everything; tuple spelling validates
    counts = {"web": 40_000, "code": 10_000, "books": 2_500}
    rates = temperature_mixture_rates(counts, (1, 3))
    assert rates["books"] == 1.0
    # rate_code = (2500/10000)^(2/3) = 0.25^(2/3) ~ 0.39685
    assert abs(rates["code"] - 0.25 ** (2 / 3)) < 2e-6
    with pytest.raises(ValueError, match="tuple temperature"):
        temperature_mixture_rates(counts, (0, 3))
    with pytest.raises(ValueError, match="tuple temperature"):
        temperature_mixture_rates(counts, (4, 3))
    # T = num/den == 1 keeps natural proportions (rate 1.0 everywhere)
    assert set(temperature_mixture_rates(counts, (3, 3)).values()) == {1.0}
    # end-to-end: deterministic membership, expected kept ∝ n^(1/3)
    rows = [(i, "web" if i % 5 != 0 else "code") for i in range(5000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mix_corpus_temperature(docs, (1, 3))
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got["code"] == 1000
    # web keeps (1000/4000)^(2/3) of 4000 ~ 1587 ± binomial noise
    assert abs(got["web"] - 1587) < 150, got
    again = {
        r["source"]: r["n"]
        for r in mix_corpus_temperature(docs, (1, 3))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == got
