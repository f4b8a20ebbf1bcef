"""Skew-salting and bucketed co-located joins: result parity + plan shape."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from iceberg_matrix_spark.operators.scale import (
    bucketed_equijoin,
    salted_aggregate,
    write_bucketed,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.plans import shuffle_count, sort_merge_join_count
from iceberg_matrix_spark.sources.testdata import load_table


def test_salted_aggregate_equals_plain_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {"n": ("count", "l_returnflag"), "mx": ("max", "l_quantity")},
        salt_buckets=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.max("l_quantity").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_aggregate_is_two_stage(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = salted_aggregate(li, ["l_returnflag"], {"n": ("count", "l_returnflag")})
    # heavy salted exchange + tiny combine exchange
    assert shuffle_count(df) == 2


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    d1, d2 = tempfile.mkdtemp(prefix="bkt-"), tempfile.mkdtemp(prefix="bkt-")
    write_bucketed(orders, "bkt_orders", "o_orderkey", buckets=8, path=d1)
    write_bucketed(li, "bkt_lineitem", "o_orderkey", buckets=8, path=d2)
    try:
        joined = bucketed_equijoin(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
        # same bucket spec both sides → no exchange anywhere in the plan
        assert shuffle_count(joined) == 0
        assert sort_merge_join_count(joined) == 1
        # and the join is still correct
        expect = orders.join(li, "o_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_salted_join_equals_plain_join_under_skew(spark):
    from iceberg_matrix_spark.operators.scale import salted_join

    # one hot key owning 90% of the left side
    left = local_df(spark, 
        [(1 if i < 900 else i, float(i)) for i in range(1000)], "k bigint, v double"
    )
    right = local_df(spark, 
        [(i, f"r{i}") for i in range(0, 1000, 3)], "k bigint, name string"
    )
    plain = {(r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, on=["k"], salt_buckets=8).collect()
    }
    assert salted == plain
    # salt column never leaks into the output
    assert "__salt" not in salted_join(left, right, on=["k"]).columns


def test_amplifier_preserves_within_replica_structure(spark, sf_dir):
    """The sweep amplifier (operators/sweep.py) must keep each replica
    isomorphic to the source corpus while making replicas disjoint:
    - replica 0 is the identity (amplify at factor=1 == source);
    - within-replica shingle-Jaccard pairs replicate exactly per replica;
    - embeddings: within-replica cosine is sign-flip invariant, so the
      near-dup pair count scales exactly linearly."""
    from iceberg_matrix_spark.operators.dedup import ngram_jaccard_pairs
    from iceberg_matrix_spark.operators.similarity import embedding_neardup_pairs
    from iceberg_matrix_spark.operators.sweep import (
        amplify_documents,
        amplify_embeddings,
    )

    docs = load_table(spark, sf_dir, "documents")
    base_pairs = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    amp = amplify_documents(docs, 3)
    assert amp.count() == docs.count() * 3
    # ids unique after re-key
    assert amp.select("doc_id").distinct().count() == amp.count()
    amp_pairs = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(amp, threshold=0.5).collect()
    }
    expect = {
        (a * 3 + r, b * 3 + r) for (a, b) in base_pairs for r in range(3)
    }
    assert amp_pairs == expect

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    base_nd = {
        (r["id1"], r["id2"])
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    amp_e = amplify_embeddings(spark, emb, 3)
    assert amp_e.count() == 600
    amp_nd = {
        (r["id1"], r["id2"])
        for r in embedding_neardup_pairs(amp_e, threshold=0.4).collect()
    }
    # within-replica pairs replicate EXACTLY (shared sign flip preserves
    # cosine); cross-replica pairs are dim-64 background collisions —
    # present by design (see sweep.py docstring), but each replica's
    # internal structure must be isomorphic to the source corpus
    same_replica = {
        (a, b) for (a, b) in amp_nd if a % 3 == b % 3
    }
    expect_e = {
        (a * 3 + r, b * 3 + r) for (a, b) in base_nd for r in range(3)
    }
    assert same_replica == expect_e


def test_amplifier_is_deterministic(spark, sf_dir):
    from iceberg_matrix_spark.operators.sweep import _sign_rows, amplify_documents

    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = amplify_documents(docs, 4).orderBy("doc_id").collect()
    b = amplify_documents(docs, 4).orderBy("doc_id").collect()
    assert a == b
    assert _sign_rows(5, 16) == _sign_rows(5, 16)
    assert _sign_rows(5, 16)[0][1] == [1.0] * 16


def test_hll_estimate_tracks_exact_distinct(spark, sf_dir):
    """The deterministic-layout HLL estimate must land within the
    standard-error envelope of the exact per-group distinct count
    (1.04/√256 ≈ 6.5% relative error at one sigma; assert 4 sigma)."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.scale import hll_distinct_sketch
    from iceberg_matrix_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.nd
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    est = {
        r.event_type: r.distinct_est
        for r in hll_distinct_sketch(
            ev, "event_type", "user_id", corrected=True
        ).collect()
    }
    assert set(est) == set(exact)
    for g, nd in exact.items():
        assert abs(est[g] - nd) <= 0.26 * nd + 3, (g, nd, est[g])


def test_hll_registers_merge_like_shards(spark, sf_dir):
    """Shard-merge law: the sketch of a union equals the per-bucket MAX
    of shard sketches — computing HLL over two disjoint halves and over
    the whole corpus must agree on every output row (what lets 1000
    executors combine 256-byte states instead of re-reading data)."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.scale import hll_distinct_sketch
    from iceberg_matrix_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    whole = {
        (r.event_type): (r.harmonic_num, r.distinct_est)
        for r in hll_distinct_sketch(ev, "event_type", "user_id").collect()
    }
    union = ev.filter(F.col("event_id") % 2 == 0).unionAll(
        ev.filter(F.col("event_id") % 2 != 0)
    )
    re_merged = {
        (r.event_type): (r.harmonic_num, r.distinct_est)
        for r in hll_distinct_sketch(union, "event_type", "user_id").collect()
    }
    assert whole == re_merged


def test_events_amplifier_scales_counts_exactly_linearly(spark, sf_dir):
    """The events amplifier re-keys users per replica with histories
    untouched, so funnel step counts and path-shape user counts must be
    EXACTLY base × factor — the property that makes the event-family
    sweep's 'wall ∝ factor' claim meaningful."""
    from iceberg_matrix_spark.operators.sweep import amplify_events
    from iceberg_matrix_spark.operators.timeseries import (
        event_funnel,
        user_event_paths,
    )
    from iceberg_matrix_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    amp = amplify_events(ev, 3)
    assert amp.count() == ev.count() * 3
    assert amp.select("user_id").distinct().count() == (
        ev.select("user_id").distinct().count() * 3
    )
    base_funnel = {r.step: r.n_users for r in event_funnel(ev).collect()}
    amp_funnel = {r.step: r.n_users for r in event_funnel(amp).collect()}
    assert amp_funnel == {k: 3 * v for k, v in base_funnel.items()}
    base_paths = {
        r.path: r.n_users for r in user_event_paths(ev, top=5).collect()
    }
    amp_paths = {
        r.path: r.n_users for r in user_event_paths(amp, top=5).collect()
    }
    assert amp_paths == {k: 3 * v for k, v in base_paths.items()}


def test_cms_never_undercounts_and_is_tight_on_heavy_tokens(spark, sf_dir):
    """The count-min guarantee: est ≥ exact for every probe, with the
    absent probe's estimate pure collision mass (small vs the corpus),
    and heavy probes estimated within the ε·N one-row bound."""
    from iceberg_matrix_spark.operators.scale import (
        CMS_WIDTH,
        _CMS_PROBES,
        cms_token_estimates,
    )
    from iceberg_matrix_spark.functions.text import token_count
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = docs.agg(F.sum(token_count("text"))).collect()[0][0]
    rows = {r.token: r for r in cms_token_estimates(docs, _CMS_PROBES).collect()}
    assert set(rows) == set(_CMS_PROBES)
    for t, r in rows.items():
        assert r.overcount >= 0, (t, r)
        assert r.cms_est >= r.exact_n
        # single-row CMS bound: overcount ≤ N/width per row; min over 3
        # rows only helps. Allow 4x slack for hash unevenness.
        assert r.overcount <= 4 * n_tokens / CMS_WIDTH + 1, (t, r, n_tokens)
    assert rows["zz_absent_zz"].exact_n == 0


def test_cms_absent_probe_with_empty_cell_estimates_zero(spark):
    """Canonical count-min semantics (ADVICE r7 #2): a probe whose grid
    cells include an untouched (zero) counter must estimate 0 — the
    sketch PROVES the token absent. On a 3-token corpus the absent
    probe's three cells cannot all collide with the nine live cells, so
    the min must reach an empty cell; the old inner-join form minned
    over non-empty cells only and reported collision mass instead."""
    from iceberg_matrix_spark.operators.scale import cms_token_estimates
    from iceberg_matrix_spark.session import local_df

    docs = local_df(spark, [(1, "aaa bbb ccc")], "doc_id bigint, text string")
    rows = {
        r.token: r
        for r in cms_token_estimates(docs, ["aaa", "zz_absent_zz"]).collect()
    }
    assert rows["aaa"].cms_est >= rows["aaa"].exact_n == 1
    assert rows["zz_absent_zz"].cms_est == 0
    assert rows["zz_absent_zz"].exact_n == 0


# ---------------------------------------------------------------------------
# Injectable storage root + scratch reaping (VERDICT r11 #2, round 12)
# ---------------------------------------------------------------------------


def test_storage_root_is_injectable_and_operator_still_correct(spark, tmp_path):
    """A persist-backed operator must write its intermediates under a
    NON-default root when one is injected (the multi-node contract: a
    driver-local tempfile path is unreadable by remote executors) and
    produce identical results there."""
    from iceberg_matrix_spark import storage
    from iceberg_matrix_spark.operators.dedup import persisted_shingle_sets

    docs = local_df(
        spark,
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps")],
        "doc_id bigint, text string",
    )
    baseline = sorted(
        (r["doc_id"], sorted(r["sh_hashed"]))
        for r in persisted_shingle_sets(docs, k=2)[0].collect()
    )
    storage.set_storage_root(str(tmp_path))
    try:
        out, size = persisted_shingle_sets(docs, k=2)
        rows = sorted(
            (r["doc_id"], sorted(r["sh_hashed"])) for r in out.collect()
        )
        assert rows == baseline and size > 0
        session_dirs = [p for p in tmp_path.iterdir() if p.name.startswith("imx-session-")]
        assert len(session_dirs) == 1
        assert any(
            d.name.startswith("shingle-sets-") for d in session_dirs[0].iterdir()
        )
    finally:
        storage.set_storage_root(None)


def test_scratch_dirs_are_reaped_to_a_bounded_generation_count(spark, tmp_path):
    """N calls to a scratch-backed operator must leave a BOUNDED number
    of scratch dirs (keep=2), not N — the r11 unbounded-tmp-growth fix."""
    import os

    from iceberg_matrix_spark import storage
    from iceberg_matrix_spark.operators.scale import persisted_small_hint

    docs = local_df(spark, [(i, i * 10) for i in range(20)], "k bigint, v bigint")
    storage.set_storage_root(str(tmp_path))
    try:
        for i in range(5):
            hinted = persisted_small_hint(docs, "reap-probe-")
            assert hinted.count() == 20  # newest generation always readable
        [session] = [p for p in tmp_path.iterdir() if p.name.startswith("imx-session-")]
        probes = [d for d in session.iterdir() if d.name.startswith("reap-probe-")]
        assert len(probes) == 2, sorted(p.name for p in probes)
    finally:
        storage.set_storage_root(None)
