"""Sequence-level (substring) dedup: targeted semantics on a tiny corpus.

The oracle-parity sweep (test_oracle_parity / correctness_full) covers the
sf0.01 corpus; these cases pin the semantics the sweep can't isolate:
first-wins ordering, overlap coverage union, sub-threshold spans, and the
short-document guard.
"""

from __future__ import annotations

import pytest

from gcp_serverless_etl_pipeline_lab_spark.operators.seqdedup import (
    drop_repeated_spans,
    repeated_spans,
    window_hashes,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


W8 = dict(w=8, stride=4, min_docs=2)

# An 8-token span shared verbatim by three docs at different offsets that
# are all multiples of the stride (4), plus unique filler.
SHARED = "alpha beta gamma delta epsilon zeta eta theta"


@pytest.fixture(scope="module")
def corpus(spark):
    u = lambda i, n: " ".join(f"u{i}x{j}" for j in range(n))  # noqa: E731
    return _mkdocs(
        spark,
        [
            (1, f"{SHARED} {u(1, 8)}"),          # span at p=0 (first)
            (2, f"{u(2, 4)} {SHARED} {u(2, 8)}"),  # span at p=4
            (3, f"{u(3, 8)} {SHARED}"),          # span at p=8
            (4, u(4, 20)),                        # no repeats
            (5, "short doc"),                     # < w tokens: no windows
        ],
    )


def test_window_hashes_counts_and_guard(spark, corpus):
    occ = window_hashes(corpus, w=8, stride=4).collect()
    # doc 5 (2 tokens) emits nothing; doc 1 has 16 tokens -> p in {0,4,8}
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r.doc_id, []).append(r.p)
    assert 5 not in by_doc
    assert sorted(by_doc[1]) == [0, 4, 8]
    assert sorted(by_doc[4]) == [0, 4, 8, 12]


def test_repeated_span_first_wins(spark, corpus):
    rep = repeated_spans(corpus, **W8).collect()
    hits = [r for r in rep if r.span_text == SHARED]
    assert len(hits) == 1
    r = hits[0]
    assert r.n_docs == 3 and r.n_occ == 3
    # global first occurrence = smallest (doc_id, pos)
    assert (r.first_doc, r.first_pos) == (1, 0)


def test_survivors_drop_all_but_first(spark, corpus):
    out = {r.doc_id: r for r in drop_repeated_spans(corpus, **W8).collect()}
    # doc 1 keeps the span (first occurrence), nothing dropped
    assert out[1].n_spans_dropped == 0
    assert out[1].kept_text.startswith(SHARED)
    # docs 2 and 3 lose exactly the 8 span tokens
    assert out[2].n_spans_dropped == 1
    assert out[2].n_tokens - out[2].kept_tokens == 8
    assert SHARED not in out[2].kept_text
    assert out[3].n_spans_dropped == 1
    assert SHARED not in out[3].kept_text
    # untouched docs pass through verbatim
    assert out[4].kept_tokens == out[4].n_tokens == 20
    assert out[5].kept_text == "short doc"


def test_survivors_overlap_union(spark):
    # Two docs repeat a 12-token run; with w=8/stride=4 the run matches as
    # two OVERLAPPING windows (p and p+4) in the later doc — coverage must
    # union to 12 dropped tokens, not 16.
    run = " ".join(f"r{j}" for j in range(12))
    docs = _mkdocs(
        spark,
        [
            (10, f"{run} " + " ".join(f"a{j}" for j in range(4))),
            (11, f"{run} " + " ".join(f"b{j}" for j in range(4))),
        ],
    )
    out = {r.doc_id: r for r in drop_repeated_spans(docs, **W8).collect()}
    assert out[10].n_spans_dropped == 0
    assert out[11].n_spans_dropped == 2
    assert out[11].n_tokens - out[11].kept_tokens == 12
    assert out[11].kept_text == " ".join(f"b{j}" for j in range(4))


def test_single_doc_repeat_not_cross_doc(spark):
    # A span repeated twice WITHIN one doc only: n_docs == 1 < min_docs,
    # so it is neither reported nor dropped.
    span = " ".join(f"s{j}" for j in range(8))
    docs = _mkdocs(spark, [(20, f"{span} {span}")])
    assert repeated_spans(docs, **W8).count() == 0
    out = drop_repeated_spans(docs, **W8).collect()[0]
    assert out.n_spans_dropped == 0 and out.kept_tokens == 16


def test_winnow_alignment_independent(spark):
    # A 12-token run shared at MISALIGNED offsets (shift by 1, which
    # stride-8 tiling cannot match) must still produce a shared winnowed
    # fingerprint: guarantee holds for runs >= w + k - 1 = 7 tokens.
    from gcp_serverless_etl_pipeline_lab_spark.operators.seqdedup import (
        winnow_repeated_report,
    )

    run = " ".join(f"r{j}" for j in range(12))
    docs = _mkdocs(
        spark,
        [
            (1, f"{run} " + " ".join(f"a{j}" for j in range(4))),
            (2, "zzz " + run),  # shifted by ONE token
        ],
    )
    # tiled windows (w=8, stride=4) find nothing at this alignment
    tiled = repeated_spans(docs, w=8, stride=4, min_docs=2).count()
    assert tiled == 0
    rep = winnow_repeated_report(docs, k=4, w=4, min_docs=2).collect()
    assert len(rep) >= 1
    assert all(r.n_docs == 2 for r in rep)
    # first occurrence is in doc 1 (smaller doc_id)
    assert all(r.first_doc == 1 for r in rep)


def test_winnow_density_and_dedup(spark):
    # Selected fingerprints are deduped per doc and much sparser than the
    # exhaustive gram set (~2/(w+1) of grams in expectation).
    from gcp_serverless_etl_pipeline_lab_spark.operators.seqdedup import (
        winnow_fingerprints,
    )

    text = " ".join(f"t{j}" for j in range(200))
    docs = _mkdocs(spark, [(1, text)])
    fps = winnow_fingerprints(docs, k=4, w=4).collect()
    n_grams = 200 - 4 + 1
    assert 0 < len(fps) < n_grams * 0.8
    assert len({(r.p, r.h) for r in fps}) == len(fps)


def test_winnow_short_doc_guard(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.seqdedup import (
        winnow_fingerprints,
    )

    docs = _mkdocs(spark, [(1, "a b c d e f")])  # 6 < k + w - 1 = 7
    assert winnow_fingerprints(docs, k=4, w=4).count() == 0
