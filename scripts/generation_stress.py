"""Generation-count stress (round-10 verdict task 7): SCALE_STRESS's
volume rows answer "what happens at 10x the data"; this script answers
the orthogonal question the index lifecycle exists for — "what happens
after N nightly appends at FIXED total volume". The sf0.1 corpus is
split into N equal slices, built+appended as N generations, and the
SAME probe batch is timed against the 1-, 16-, and 64-generation
layouts, then against the 64-generation index after compaction.

Probe plans union one artifact scan per generation, so wall and plan
size grow with nights elapsed until compact folds them back — the
numbers here justify compact_index / compact_ann_index and the nightly
loop's compact_every policy.

Results land under the "generation_growth" key of SCALE_STRESS.json
(scale_stress.py's merge preserves foreign top-level keys).

Run:  python scripts/generation_stress.py            (~5 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gcp_serverless_etl_pipeline_lab_spark.operators import (  # noqa: E402
    annindex,
    incremental,
    lexindex,
)
from gcp_serverless_etl_pipeline_lab_spark.session import get_session  # noqa: E402
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GENS = (1, 16, 64)
MAX_DF = 1000
EMB_DIM = 64
IVF_K = 8


def _min2(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        e = round(time.perf_counter() - t0, 2)
        best = e if best is None else min(best, e)
    return best


def _text_index_with_gens(spark, docs, n_gens: int, root: str) -> str:
    path = os.path.join(root, f"tidx_g{n_gens}")
    base = docs.filter(F.pmod(F.col("doc_id"), n_gens) == 0)
    incremental.build_base_index(base, path, max_df=MAX_DF)
    for g in range(1, n_gens):
        incremental.append_to_index(
            spark,
            docs.filter(F.pmod(F.col("doc_id"), n_gens) == g),
            path,
            increment_id=f"slice-{g}",
        )
    return path


def _ann_index_with_gens(spark, emb, model, n_gens: int, root: str) -> str:
    path = os.path.join(root, f"aidx_g{n_gens}")
    annindex.build_ann_index(
        emb.filter(F.pmod(F.col("vec_id"), n_gens) == 0),
        path,
        EMB_DIM,
        model=model,
    )
    for g in range(1, n_gens):
        annindex.append_ann_index(
            spark,
            emb.filter(F.pmod(F.col("vec_id"), n_gens) == g),
            path,
            increment_id=f"slice-{g}",
        )
    return path


def _lex_index_with_gens(spark, docs, n_gens: int, root: str) -> str:
    path = os.path.join(root, f"lidx_g{n_gens}")
    lexindex.build_lexical_index(
        docs.filter(F.pmod(F.col("doc_id"), n_gens) == 0), path
    )
    for g in range(1, n_gens):
        lexindex.append_lexical_index(
            spark,
            docs.filter(F.pmod(F.col("doc_id"), n_gens) == g),
            path,
            increment_id=f"slice-{g}",
        )
    return path


def main() -> None:
    spark = get_session(app_name="generation_stress")
    root = tempfile.mkdtemp(prefix="gen_stress_")
    docs = load_table(spark, BASE_SF, "documents").select("doc_id", "text")
    emb = load_table(spark, BASE_SF, "embeddings").select("vec_id", "embedding")
    probe = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    # one pinned model for every ANN layout: generation count is the only
    # variable under test
    from gcp_serverless_etl_pipeline_lab_spark.operators.similarity import (
        kmeans_centroids,
    )

    model = kmeans_centroids(emb, EMB_DIM, k=IVF_K, iters=2, sample_rate=1.0)

    text_rows: dict[str, dict] = {}
    ann_rows: dict[str, dict] = {}
    lex_rows: dict[str, dict] = {}
    for n in GENS:
        tpath = _text_index_with_gens(spark, docs, n, root)
        sec = _min2(
            lambda: incremental.classify_batch_vs_index(
                spark, probe, tpath
            ).write.format("noop").mode("overwrite").save()
        )
        text_rows[f"g{n}"] = {"probe_sec": sec}
        print(f"text g{n}: probe {sec}s", file=sys.stderr)

        apath = _ann_index_with_gens(spark, emb, model, n, root)
        sec = _min2(
            lambda: annindex.query_ann_index(
                spark, queries, apath, k=5, nprobe=3
            ).write.format("noop").mode("overwrite").save()
        )
        ann_rows[f"g{n}"] = {"probe_sec": sec}
        print(f"ann g{n}: probe {sec}s", file=sys.stderr)

        lpath = _lex_index_with_gens(spark, docs, n, root)
        sec = _min2(
            lambda: lexindex.bm25_topk_from_index(
                spark, lpath, ["join", "filter", "vector"], k=10
            ).write.format("noop").mode("overwrite").save()
        )
        lex_rows[f"g{n}"] = {"probe_sec": sec}
        print(f"lex g{n}: probe {sec}s", file=sys.stderr)

    # tiered folds (round-11 verdict task 5): the nightly maintenance
    # window under max_generations_to_fold=K vs the full rewrite — each
    # K runs on a fresh copy of the 64-generation layout (compaction
    # mutates the index), so the rows are directly comparable. Probe
    # parity for partial folds is pinned by
    # tests/test_index_append.py::test_tiered_fold_preserves_probes...;
    # what's measured here is the WALL the policy pays per night.
    t64 = os.path.join(root, "tidx_g64")
    tiered: dict[str, float] = {}
    for K in (4, 8, 16):
        work = os.path.join(root, f"tidx_g64_k{K}")
        shutil.copytree(t64, work)
        t0 = time.perf_counter()
        incremental.compact_index(spark, work, max_generations_to_fold=K)
        tiered[f"fold_k{K}_sec"] = round(time.perf_counter() - t0, 2)
        shutil.rmtree(work, ignore_errors=True)
        print(f"text g64 tiered K={K}: {tiered[f'fold_k{K}_sec']}s", file=sys.stderr)
    text_rows["g64_tiered_fold"] = tiered

    # compaction folds the worst layout back to one generation — probe
    # cost must return to ~g1
    t0 = time.perf_counter()
    incremental.compact_index(spark, t64)
    text_compact_sec = round(time.perf_counter() - t0, 2)
    sec = _min2(
        lambda: incremental.classify_batch_vs_index(
            spark, probe, t64
        ).write.format("noop").mode("overwrite").save()
    )
    text_rows["g64_compacted"] = {
        "probe_sec": sec,
        "compact_sec": text_compact_sec,
    }
    print(f"text g64 compacted: probe {sec}s", file=sys.stderr)

    # round-12: tiered folds for the OTHER two compactors (the family
    # completion) — same fresh-copy-per-K discipline; parity pinned by
    # tests/test_tiered_folds_round12.py, measured here is the wall
    l64 = os.path.join(root, "lidx_g64")
    lex_tiered: dict[str, float] = {}
    for K in (4, 8, 16):
        work = os.path.join(root, f"lidx_g64_k{K}")
        shutil.copytree(l64, work)
        t0 = time.perf_counter()
        lexindex.compact_lexical_index(spark, work, max_generations_to_fold=K)
        lex_tiered[f"fold_k{K}_sec"] = round(time.perf_counter() - t0, 2)
        shutil.rmtree(work, ignore_errors=True)
        print(f"lex g64 tiered K={K}: {lex_tiered[f'fold_k{K}_sec']}s", file=sys.stderr)
    lex_rows["g64_tiered_fold"] = lex_tiered

    t0 = time.perf_counter()
    lexindex.compact_lexical_index(spark, l64)
    lex_compact_sec = round(time.perf_counter() - t0, 2)
    sec = _min2(
        lambda: lexindex.bm25_topk_from_index(
            spark, l64, ["join", "filter", "vector"], k=10
        ).write.format("noop").mode("overwrite").save()
    )
    lex_rows["g64_compacted"] = {
        "probe_sec": sec,
        "compact_sec": lex_compact_sec,
    }
    print(f"lex g64 compacted: probe {sec}s", file=sys.stderr)

    a64 = os.path.join(root, "aidx_g64")
    ann_tiered: dict[str, float] = {}
    for K in (4, 8, 16):
        work = os.path.join(root, f"aidx_g64_k{K}")
        shutil.copytree(a64, work)
        t0 = time.perf_counter()
        annindex.compact_ann_index(spark, work, max_generations_to_fold=K)
        ann_tiered[f"fold_k{K}_sec"] = round(time.perf_counter() - t0, 2)
        shutil.rmtree(work, ignore_errors=True)
        print(f"ann g64 tiered K={K}: {ann_tiered[f'fold_k{K}_sec']}s", file=sys.stderr)
    ann_rows["g64_tiered_fold"] = ann_tiered

    t0 = time.perf_counter()
    annindex.compact_ann_index(spark, a64)
    ann_compact_sec = round(time.perf_counter() - t0, 2)
    sec = _min2(
        lambda: annindex.query_ann_index(
            spark, queries, a64, k=5, nprobe=3
        ).write.format("noop").mode("overwrite").save()
    )
    ann_rows["g64_compacted"] = {
        "probe_sec": sec,
        "compact_sec": ann_compact_sec,
    }
    print(f"ann g64 compacted: probe {sec}s", file=sys.stderr)

    out_path = os.path.join(REPO, "SCALE_STRESS.json")
    payload = {
        "note": (
            "probe wall vs generation count at FIXED total volume "
            f"({BASE_SF}); g64_compacted = the 64-generation index after "
            "compact_index/compact_ann_index — probe cost must return to ~g1"
        ),
        "text_index_probe": text_rows,
        "ann_index_probe": ann_rows,
        "lex_index_probe": lex_rows,
    }
    if os.path.isfile(out_path):
        with open(out_path) as fh:
            blob = json.load(fh)
    else:
        blob = {}
    blob["generation_growth"] = payload
    with open(out_path, "w") as fh:
        json.dump(blob, fh, indent=1)
    print(json.dumps(payload, indent=1))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
