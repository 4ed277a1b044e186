"""Distributed BPE merge training (operators/bpetrain.py) vs a
pure-Python reference implementation of Sennrich-style BPE — merge
table, tie-breaking, early stop, and the greedy-leftmost apply
(merged tokens immediately eligible)."""

from __future__ import annotations

from collections import Counter

from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
    apply_bpe_merges,
    train_bpe_merges,
)


def _ref_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w in words:
            out: list = []
            for s in words[w]:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    return merges, words


def _ref_tokens(text: str, merges) -> list[str]:
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b, *_ in merges:
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        toks.extend(syms)
    return toks


TEXTS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that cattle chatter shatters the theme",
    "low lower lowest slow slower slowest",
    "aaa aaaa baa",  # overlap traps: (a,a) on runs must merge leftmost
]


def test_merge_table_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = train_bpe_merges(df, n_merges=8, min_pair_count=2)
    want, _ = _ref_bpe(TEXTS, 8, 2)
    assert got == want and len(got) == 8


def test_delta_rounds_equal_full_recount(spark):
    """The incremental (delta pair-count) spelling must produce the
    IDENTICAL merge table to the full-recount spelling — integer delta
    maintenance is exact, including across early stops and overlap
    traps; run deep enough (10 merges) that merged tokens themselves
    merge again."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    fast = train_bpe_merges(df, n_merges=10, min_pair_count=1, incremental=True)
    slow = train_bpe_merges(df, n_merges=10, min_pair_count=1, incremental=False)
    assert fast == slow
    want, _ = _ref_bpe(TEXTS, 10, 1)
    assert fast == want


def test_early_stop_below_min_pair_count(spark):
    df = spark.createDataFrame([("q w e r t y",)], "text string")
    # every word is one char: no pairs at all -> zero merges
    assert train_bpe_merges(df, n_merges=5, min_pair_count=2) == []
    df2 = spark.createDataFrame([("ab ab cd",)], "text string")
    # (a,b) count 2 passes; after merging, best remaining pair (c,d)
    # count 1 < min -> stop at exactly one merge
    got = train_bpe_merges(df2, n_merges=5, min_pair_count=2)
    assert got == [("a", "b", 2)]


def test_oracle_floors_like_engine_early_stop(spark, tmp_path):
    """The registered a0f_bpe_train_merges DuckDB oracle must stop at the
    SAME min_pair_count floor as the engine: on a corpus whose best pair
    drops below 2 after one merge, both sides return exactly one merge
    row (an oracle without the floor would keep merging count-1 noise
    pairs for all remaining unrolled rounds and hash-mismatch)."""
    import duckdb

    from gcp_serverless_etl_pipeline_lab_spark.harness._registry import QUERIES
    from oracle_util import compare

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, "ab ab cd"), (2, "xq")], "doc_id bigint, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    q = QUERIES["a0f_bpe_train_merges"]
    got = q.builder(spark, sf_dir)
    rows = got.collect()
    assert [(r["lhs"], r["rhs"], r["pair_count"]) for r in rows] == [("a", "b", 2)]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    ok, msg = compare(got, con.sql(q.oracle).df())
    assert ok, msg


def test_apply_matches_reference_tokenization(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = train_bpe_merges(df, n_merges=6, min_pair_count=2)
    out = {r["text"]: r for r in apply_bpe_merges(df, merges).collect()}
    for t in TEXTS:
        want = _ref_tokens(t, merges)
        assert list(out[t]["tokens"]) == want, t
        assert out[t]["n_tokens"] == len(want)


def test_stored_model_roundtrip_and_tokenize(spark, tmp_path):
    """save_bpe_model/load_bpe_model/tokenize_with_stored_model: the
    artifact round-trips the merge table exactly (order included) and
    tokenizing from the stored model equals tokenizing from the live
    one."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        load_bpe_model,
        save_bpe_model,
        tokenize_with_stored_model,
    )

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = train_bpe_merges(df, n_merges=6, min_pair_count=2)
    path = str(tmp_path / "bpe_model.json")
    save_bpe_model(merges, path, meta={"n_merges": 6})
    assert load_bpe_model(path) == merges
    live = sorted(
        (r["text"], list(r["tokens"]), r["n_tokens"])
        for r in apply_bpe_merges(df, merges).collect()
    )
    stored = sorted(
        (r["text"], list(r["tokens"]), r["n_tokens"])
        for r in tokenize_with_stored_model(df, path).collect()
    )
    assert live == stored
    # commit is atomic-replace: a second save overwrites cleanly
    save_bpe_model(merges[:2], path)
    assert load_bpe_model(path) == merges[:2]


def test_greedy_leftmost_run_semantics(spark):
    """'aaa' under merge (a,a): leftmost pair merges first and the merged
    token is immediately eligible — ['aa', 'a'], never ['a', 'aa'] and
    never a three-way 'aaa' in one round."""
    df = spark.createDataFrame([("aaa aa",)], "text string")
    merges = train_bpe_merges(df, n_merges=1, min_pair_count=1)
    assert merges == [("a", "a", 3)]  # aaa contributes 2 (overlapping), aa 1
    rows = {r["text"]: list(r["tokens"]) for r in apply_bpe_merges(df, merges).collect()}
    assert rows["aaa aa"] == ["aa", "a", "aa"]


def test_join_back_apply_matches_chained(spark):
    """Round-11 verdict task 2: the depth-bounded join-back tokenization
    (fold distinct words, join arrays back, flatten in word order) is
    row-identical to the chained per-occurrence fold — with and without
    a caller-supplied row key, including empty/whitespace-only rows."""
    texts = TEXTS + ["", "   ", "aaa aaa aaa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, _ = _ref_bpe(TEXTS, 6)
    chained = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in apply_bpe_merges(df, merges, via_word_table=False).collect()
    }
    for rid in ("doc_id", None):
        jb = {
            r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
            for r in apply_bpe_merges(
                df, merges, via_word_table=True, row_id_col=rid
            ).collect()
        }
        assert jb == chained
    # column contract preserved (original cols..., tokens, n_tokens)
    out = apply_bpe_merges(df, merges, via_word_table=True)
    assert out.columns == ["doc_id", "text", "tokens", "n_tokens"]


def test_auto_route_and_deep_fold_checkpointing(spark):
    """At/above DEEP_APPLY_THRESHOLD merges the apply auto-routes to the
    join-back spelling, and the chunked word-table fold (checkpoint
    truncation) changes nothing about the result."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        DEEP_APPLY_THRESHOLD,
        apply_merges_to_word_table,
        word_symbol_table,
    )

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    # synthesize a deep merge table: real merges then inert ones (pairs
    # that never occur) to cross the threshold without changing tokens
    merges, _ = _ref_bpe(TEXTS, 6)
    deep = merges + [(f"Z{i}", f"Y{i}", 1) for i in range(DEEP_APPLY_THRESHOLD)]
    shallow_out = {
        (r["text"], tuple(r["tokens"]), r["n_tokens"])
        for r in apply_bpe_merges(df, merges, via_word_table=False).collect()
    }
    deep_out = {
        (r["text"], tuple(r["tokens"]), r["n_tokens"])
        for r in apply_bpe_merges(df, deep).collect()  # auto-routes
    }
    assert deep_out == shallow_out
    # three fold spellings, one output: single-pass nested-HOF (default,
    # round-12), chunk-checkpointed chained, unchunked chained
    words = word_symbol_table(df)
    a = {
        (r["word"], tuple(r["syms"]))
        for r in apply_merges_to_word_table(words, deep).collect()
    }
    b = {
        (r["word"], tuple(r["syms"]))
        for r in apply_merges_to_word_table(
            words, deep, checkpoint_every=8, single_pass=False
        ).collect()
    }
    c = {
        (r["word"], tuple(r["syms"]))
        for r in apply_merges_to_word_table(
            words, deep, checkpoint_every=None, single_pass=False
        ).collect()
    }
    assert a == b == c


def test_checkpoint_freeing_targets_only_its_own_rdds(spark):
    """Round-12 advice fix: superseded-checkpoint freeing captures each
    localCheckpoint's OWN persisted-RDD id off the frame
    (_checkpointed_rdd_id) instead of diffing the global persistent-RDD
    map — a bystander frame persisted by a concurrent thread can never
    be claimed and unpersisted mid-training. Deterministic stand-in for
    the race: a bystander persisted BEFORE training (inside any
    hypothetical snapshot/diff window) must survive the whole run with
    its blocks intact."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        _checkpointed_rdd_id,
    )

    sc = spark.sparkContext
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")

    # direct capture returns exactly the persisted block id
    pre = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    cp = df.localCheckpoint(eager=True)
    post = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    cid = _checkpointed_rdd_id(cp)
    assert cid in (post - pre)
    # non-checkpointed plans have no LogicalRDD: capture declines (None)
    assert _checkpointed_rdd_id(df.select("text")) is None
    cp.unpersist() if hasattr(cp, "unpersist") else None
    sc._jsc.getPersistentRDDs().get(cid).unpersist(False)

    bystander = df.localCheckpoint(eager=True)
    bid = _checkpointed_rdd_id(bystander)
    got = train_bpe_merges(df, n_merges=4, incremental=True)
    assert len(got) == 4
    live = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    assert bid in live, "training freed a checkpoint it does not own"
    assert bystander.count() == len(TEXTS)  # blocks intact, not just listed
    sc._jsc.getPersistentRDDs().get(bid).unpersist(False)
