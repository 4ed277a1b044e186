"""connected_components / resolve_clusters: multi-hop closure the harness
corpus can't exercise (its dup clusters have diameter <= 2)."""

from __future__ import annotations

import pytest

from gcp_serverless_etl_pipeline_lab_spark.operators.cluster import (
    connected_components,
    resolve_clusters,
    symmetrize_edges,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_path_graph_collapses_to_min_label(spark):
    # 0-1-2-...-29: one component, diameter 29 — pointer jumping must
    # converge well inside the iteration cap.
    cc = connected_components(_pairs(spark, [(i, i + 1) for i in range(29)]))
    rows = {r.doc_id: r.cluster_id for r in cc.collect()}
    assert rows == {i: 0 for i in range(30)}


def test_two_components_and_reversed_edges(spark):
    # Component {10,11,12} given backwards, component {5,7} forwards,
    # duplicate edge both ways.
    edges = [(12, 11), (11, 10), (5, 7), (7, 5)]
    cc = connected_components(_pairs(spark, edges))
    rows = {r.doc_id: r.cluster_id for r in cc.collect()}
    assert rows == {10: 10, 11: 10, 12: 10, 5: 5, 7: 5}


def test_ring_and_star(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]  # 0..5
    star = [(100, m) for m in (101, 102, 103)]
    cc = connected_components(_pairs(spark, ring + star))
    rows = {r.doc_id: r.cluster_id for r in cc.collect()}
    assert all(rows[i] == 0 for i in range(6))
    assert all(rows[m] == 100 for m in (100, 101, 102, 103))


def test_resolve_clusters_sizes_and_order(spark):
    out = resolve_clusters(_pairs(spark, [(3, 1), (1, 2), (9, 8)])).collect()
    assert [(r.cluster_id, r.doc_id, r.n_members) for r in out] == [
        (1, 1, 3),
        (1, 2, 3),
        (1, 3, 3),
        (8, 8, 2),
        (8, 9, 2),
    ]


def test_symmetrize_drops_self_loops(spark):
    edges = symmetrize_edges(_pairs(spark, [(4, 4), (4, 5)])).collect()
    assert sorted((r.src, r.dst) for r in edges) == [(4, 5), (5, 4)]


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(20)]), max_iter=1)
