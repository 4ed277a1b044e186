"""ONE nightly driver for the whole index family (round-12 verdict
task 5): three idempotent loops existed — ``dedup_stream.
run_nightly_loop`` (text near-dup index), ``ann_stream.
run_nightly_ann_loop`` (vectors), ``retrieval_stream.
run_nightly_retrieval_loop`` (lex + ANN) — each with its own inbox.
An operator feeding the same corpus increments to all of them ran three
pickups, three resolutions, and three cross-increment guards over the
same files. ``run_nightly`` is the composition: ONE inbox scan, ONE
deterministic resolution and dedup guard per increment, then every
configured index appended under the SAME increment_id — the per-index
manifest ledgers remain the only checkpoint, so a crash between any two
appends and a re-call fills in exactly the missing legs.

Crash-stable order per increment: **lexical → ANN → text**. Lex-first
keeps the hybrid-serving invariant (every ANN vector is a doc the BM25
leg has indexed) true at every failure point; the text near-dup index
is a consumer-independent artifact and goes last — a crash before it
leaves retrieval fully consistent and the text leg pending, which the
replay completes. The replay re-resolves the SAME rows because the
dedup guard excludes the increment's own committed lex generation
(``indexed_doc_ids(..., exclude_increment_id=...)``), and lex
compaction PROTECTS increments any sibling leg hasn't applied yet
(``protect_increments``) so that exclusion can never stop matching
while a leg is pending — the round-12 advice hazard, closed
structurally.

The per-leg ledgers stay per-index deliberately: a shared external
ledger would be a second source of truth to keep consistent with three
manifests; here each index's manifest remains self-describing and the
driver derives "pending" by set difference at run time."""

from __future__ import annotations

from pyspark.sql import functions as F


def run_nightly(
    spark,
    input_dir: str,
    lex_index_path: str | None = None,
    ann_index_path: str | None = None,
    text_index_path: str | None = None,
    merged_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_min_age_seconds: float | None = None,
    max_generations_to_fold: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedding_col: str = "embedding",
    consistency_scope: str = "new",
    telemetry_queries: int | None = None,
) -> dict:
    """One iteration of the unified nightly maintenance across every
    configured index. Pickup contract: every immediate child of
    ``input_dir`` (parquet file or dir carrying (doc_id, text[,
    embedding])) is ONE increment; the child's name is its
    ``increment_id`` in every configured manifest.

    Per increment, in crash-stable order:

    1. resolve deterministically (one row per doc_id, min_by content
       key — ``retrieval_stream._resolve_increment``);
    2. cross-increment dedup guard against the LEXICAL index's doclist
       when a lex index is configured (doc-bucket-pruned probe,
       excluding the increment's own committed generation so replays
       re-resolve identically); with no lex index, against the TEXT
       index's stored hashes (content-exact guard — the dedup loop's
       discipline);
    3. land the resolved rows in ``merged_dir/<increment_id>`` when
       given (overwrite — replay-stable; the merged corpus is what a
       full index rebuild would consume), then append: lexical, ANN
       (vec_id = doc_id; one retry across the benign model-epoch
       fence), text near-dup — each skipped when its ledger already
       holds the id.

    Maintenance: each configured index folds on its own ``compact_every``
    threshold (tiered by ``max_generations_to_fold``); the lexical fold
    protects increments pending in ANY sibling leg; the ANN drift flag
    and the hybrid consistency check run exactly as in the retrieval
    loop. Crash-matrix pytest: tests/test_unified_nightly.py replays
    after a kill between every adjacent pair of per-increment commits.

    Returns {"appended_lex": [...], "appended_ann": [...],
    "appended_text": [...], "skipped": [...], "new_docs": n,
    "duplicate_docs": n, "compacted": {"lex": gen|None, "ann":
    gen|None, "text": gen|None}, "ann_docs_missing_from_lex": 0,
    "rebuild_recommended": bool|None, "max_drift_ratio": float|None,
    "vacuumed": [relpaths]}."""
    import os

    from .retrieval_stream import _resolve_increment

    if lex_index_path is None and ann_index_path is None and text_index_path is None:
        raise ValueError("run_nightly needs at least one index path")

    def _applied(load, path):
        man = load(path)
        return {
            g.get("increment_id") for g in man["generations"]
        } | set(man.get("compacted_increments", []))

    lex_applied: set = set()
    ann_applied: set = set()
    text_applied: set = set()
    if lex_index_path is not None:
        from ..operators.lexindex import _load_lex_manifest

        lex_applied = _applied(_load_lex_manifest, lex_index_path)
    if ann_index_path is not None:
        from ..operators.annindex import _load_ann_manifest

        ann_applied = _applied(_load_ann_manifest, ann_index_path)
    if text_index_path is not None:
        from ..operators.incremental import _load_manifest

        text_applied = _applied(_load_manifest, text_index_path)

    appended_lex: list[str] = []
    appended_ann: list[str] = []
    appended_text: list[str] = []
    skipped: list[str] = []
    n_new = 0
    n_dup = 0
    children = sorted(
        name
        for name in (os.listdir(input_dir) if os.path.isdir(input_dir) else [])
        if not name.startswith((".", "_"))
    )
    for name in children:
        lex_done = lex_index_path is None or name in lex_applied
        text_done = text_index_path is None or name in text_applied
        raw = spark.read.parquet(os.path.join(input_dir, name))
        has_vec = ann_index_path is not None and embedding_col in raw.columns
        ann_done = not has_vec or name in ann_applied
        if lex_done and ann_done and text_done:
            skipped.append(name)
            continue
        inc = _resolve_increment(raw, id_col, text_col, embedding_col, has_vec)
        # cross-increment dedup guard — one probe feeds every leg
        if lex_index_path is not None:
            from ..operators.lexindex import indexed_doc_ids

            dup = indexed_doc_ids(
                spark,
                lex_index_path,
                inc.select(F.col(id_col).alias("doc_id")),
                exclude_increment_id=name,
            )
            inc = inc.join(
                dup.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
            )
        elif text_index_path is not None:
            from ..operators.incremental import exact_dups_vs_index

            seen = exact_dups_vs_index(
                spark,
                inc.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                ),
                text_index_path,
            )
            inc = inc.join(
                seen.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
            )
        from ..operators.bpetrain import (
            _checkpointed_rdd_id,
            _unpersist_rdd_ids,
        )

        inc = inc.localCheckpoint(eager=True)
        _inc_rdd = _checkpointed_rdd_id(inc)
        n_inc = inc.count()
        n_dup += max(raw.select(id_col).distinct().count() - n_inc, 0)
        if merged_dir is not None and n_inc > 0 and not (
            lex_done and ann_done and text_done
        ):
            # merged corpus BEFORE any index commit (replay-stable
            # overwrite): an id present in any ledger is guaranteed to
            # have its corpus rows landed — the dedup loop's ordering
            inc.write.mode("overwrite").parquet(os.path.join(merged_dir, name))
        counted = False
        if lex_index_path is not None and not lex_done:
            from ..operators.lexindex import append_lexical_index

            if append_lexical_index(
                spark, inc, lex_index_path, increment_id=name,
                id_col=id_col, text_col=text_col,
            ):
                appended_lex.append(name)
                n_new += n_inc
                counted = True
        if has_vec and not ann_done:
            from ..operators.annindex import (
                ModelEpochChangedError,
                append_ann_index,
            )

            vecs = inc.select(
                F.col(id_col).alias("vec_id"),
                F.col(embedding_col).alias("embedding"),
            )
            try:
                did = append_ann_index(
                    spark, vecs, ann_index_path, increment_id=name
                )
            except ModelEpochChangedError:
                did = append_ann_index(
                    spark, vecs, ann_index_path, increment_id=name
                )
            if did:
                appended_ann.append(name)
        if text_index_path is not None and not text_done:
            from ..operators.incremental import append_to_index

            if append_to_index(
                spark,
                inc.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                ),
                text_index_path,
                increment_id=name,
            ):
                appended_text.append(name)
                if not counted and lex_index_path is None:
                    n_new += n_inc
        if _inc_rdd is not None:
            _unpersist_rdd_ids(spark.sparkContext, {_inc_rdd})

    compacted: dict = {"lex": None, "ann": None, "text": None}
    rebuild = None
    drift = None
    served_overlap = None
    missing = 0
    vacuumed: list[str] = []
    if lex_index_path is not None:
        from ..operators.incremental import _split_fold_slice
        from ..operators.lexindex import (
            _load_lex_manifest,
            compact_lexical_index,
        )

        # protect lex-applied increments pending in ANY sibling leg —
        # the replay guard's exclusion must keep matching them
        lex_now = _load_lex_manifest(lex_index_path)
        lex_ids = {
            g.get("increment_id")
            for g in lex_now["generations"]
            if g.get("increment_id") is not None
        }
        pending: set = set()
        if ann_index_path is not None:
            from ..operators.annindex import _load_ann_manifest

            pending |= lex_ids - _applied(_load_ann_manifest, ann_index_path)
        if text_index_path is not None:
            from ..operators.incremental import _load_manifest

            pending |= lex_ids - _applied(_load_manifest, text_index_path)
        if (
            compact_every is not None
            and len(lex_now["generations"]) >= compact_every
        ):
            fold, _ = _split_fold_slice(
                lex_now["generations"], max_generations_to_fold, pending
            )
            if len(fold) >= 2:
                compacted["lex"] = compact_lexical_index(
                    spark, lex_index_path,
                    max_generations_to_fold=max_generations_to_fold,
                    protect_increments=pending,
                )
    if ann_index_path is not None:
        from ..operators.annindex import (
            _load_ann_manifest,
            ann_drift_report,
            compact_ann_index,
        )

        if (
            compact_every is not None
            and len(_load_ann_manifest(ann_index_path)["generations"])
            >= compact_every
        ):
            compacted["ann"] = compact_ann_index(
                spark, ann_index_path,
                max_generations_to_fold=max_generations_to_fold,
            )
        # serve-time telemetry (round-12 verdict task 7): observe the
        # recall the serving path delivers tonight and record it BEFORE
        # the drift report read, so decay flips rebuild_recommended the
        # night it is measured
        if telemetry_queries:
            from ..operators.annindex import (
                record_serving_overlap,
                serving_overlap_probe,
            )

            served_overlap = serving_overlap_probe(
                spark, ann_index_path, n_queries=telemetry_queries
            )
            if served_overlap is not None:
                record_serving_overlap(
                    ann_index_path, served_overlap,
                    n_queries=telemetry_queries, k=10, nprobe=3,
                )
        rep = ann_drift_report(ann_index_path)
        rebuild = rep["rebuild_recommended"]
        drift = rep["max_ratio"]
    if text_index_path is not None:
        from ..operators.incremental import _load_manifest, compact_index

        if (
            compact_every is not None
            and len(_load_manifest(text_index_path)["generations"])
            >= compact_every
        ):
            compacted["text"] = compact_index(
                spark, text_index_path,
                max_generations_to_fold=max_generations_to_fold,
            )
    if ann_index_path is not None and lex_index_path is not None:
        from ..operators.annindex import (
            _load_ann_manifest,
            _materialize_missing_veclists,
            _read_veclist,
        )
        from ..operators.lexindex import indexed_doc_ids

        ann_man = _load_ann_manifest(ann_index_path)
        if consistency_scope == "full":
            check_gens = ann_man["generations"]
        elif consistency_scope == "new":
            tonight = set(appended_ann)
            check_gens = [
                g
                for g in ann_man["generations"]
                if g.get("increment_id") in tonight
                or (compacted["ann"] is not None and g["gen"] == compacted["ann"])
            ]
        else:
            check_gens = []
        if check_gens:
            sub = dict(ann_man, generations=check_gens)
            vl = _read_veclist(spark, ann_index_path, sub)
            if vl is None:
                _materialize_missing_veclists(spark, ann_index_path)
                vl = _read_veclist(spark, ann_index_path, sub)
            ann_ids = vl.select(F.col("vec_id").alias("doc_id"))
            present = indexed_doc_ids(spark, lex_index_path, ann_ids)
            missing = ann_ids.join(present, "doc_id", "left_anti").count()
        if missing:
            raise RuntimeError(
                f"hybrid consistency violated: {missing} doc_ids are in "
                f"the ANN index at {ann_index_path} but not in the "
                f"lexical index at {lex_index_path}"
            )
    if vacuum_min_age_seconds is not None:
        from ..operators.incremental import vacuum_index

        for tag, p in (
            ("", lex_index_path),
            ("ann:", ann_index_path),
            ("text:", text_index_path),
        ):
            if p is not None:
                vacuumed += [
                    f"{tag}{rel}" for rel in vacuum_index(p, vacuum_min_age_seconds)
                ]
    return {
        "appended_lex": appended_lex,
        "appended_ann": appended_ann,
        "appended_text": appended_text,
        "skipped": skipped,
        "new_docs": n_new,
        "duplicate_docs": n_dup,
        "compacted": compacted,
        "ann_docs_missing_from_lex": missing,
        "rebuild_recommended": rebuild,
        "max_drift_ratio": drift,
        "served_overlap": served_overlap,
        "vacuumed": vacuumed,
    }
