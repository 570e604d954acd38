"""Semantic invariants for the corpus-assembly ops (functions/packing.py):
sequence packing, domain mixing, duplication-cluster stats. Oracle
equality is covered by tools/check.py; these tests pin the properties
the oracle can't express (conservation, contiguity, determinism,
rate bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.functions.packing import PACK_BUDGET, approx_tokens
from nt_etl_order_book_spark.tables import load_table


def _q(name):
    return registry.all_specs()[name].fn


def test_seq_pack_conserves_tokens_and_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r.source: (r.n, r.toks)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(approx_tokens(F.col("text"))).alias("toks"),
        )
        .collect()
    }
    packs = _q("seq_pack")(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    shards: dict[tuple, list] = {}
    for r in packs:
        by_source.setdefault(r.source, []).append(r)
        shards.setdefault((r.source, r.bucket), []).append(r)
    assert set(by_source) == set(truth)
    for source, rows in by_source.items():
        n_docs, toks = truth[source]
        assert sum(r.n_docs for r in rows) == n_docs
        assert sum(r.pack_tokens for r in rows) == toks
    for rows in shards.values():
        # pack ids are contiguous from 0 within each (source, bucket)
        # shard — a FIXTURE property, not a general one: it holds
        # because every fixture doc is shorter than the budget, so every
        # pack contains at least one doc start. A doc longer than the
        # whole budget would leave start-less (unemitted) pack ids —
        # that general case is covered by the brute-force property test
        # (tests/test_property.py::test_pack_sequences_matches_bruteforce).
        ids = sorted(r.pack_id for r in rows)
        assert ids == list(range(len(rows)))
        # doc_id ranges of consecutive packs must not interleave
        by_id = sorted(rows, key=lambda r: r.pack_id)
        for a, b in zip(by_id, by_id[1:]):
            assert a.last_doc_id < b.first_doc_id


def test_seq_pack_nonfinal_packs_reach_budget(spark, sf_dir):
    # Every pack except the last per (source, bucket) shard must span at
    # least the budget boundary: the next pack's first doc starts at a
    # cumulative offset >= (pack_id+1)*budget.
    packs = _q("seq_pack")(spark, sf_dir).collect()
    by_shard: dict[tuple, list] = {}
    for r in packs:
        by_shard.setdefault((r.source, r.bucket), []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.pack_id)
        cum = 0
        for r in rows[:-1]:
            cum += r.pack_tokens
            # cum = offset where the next pack's first doc starts
            assert cum >= (r.pack_id + 1) * PACK_BUDGET


def test_domain_mix_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r.source: r.toks
        for r in docs.groupBy("source")
        .agg(F.sum(approx_tokens(F.col("text"))).alias("toks"))
        .collect()
    }
    floor_tokens = min(totals.values())
    out1 = {r.source: (r.n_docs_kept, r.tokens_kept) for r in _q("domain_mix")(spark, sf_dir).collect()}
    out2 = {r.source: (r.n_docs_kept, r.tokens_kept) for r in _q("domain_mix")(spark, sf_dir).collect()}
    assert out1 == out2  # deterministic — no RNG anywhere
    # The floor domain keeps everything (rate 1); others never exceed
    # their own total and hover near the floor in expectation. The hash
    # Bernoulli has variance, so only assert the hard bounds.
    for source, (n_kept, toks_kept) in out1.items():
        assert toks_kept <= totals[source]
    floor_sources = [s for s, t in totals.items() if t == floor_tokens]
    for s in floor_sources:
        assert out1[s][1] == totals[s]


def test_dup_cluster_stats_conserves_paragraphs(spark, sf_dir):
    from nt_etl_order_book_spark.functions.dedup import paragraphs

    docs = load_table(spark, sf_dir, "documents")
    n_pars = paragraphs(docs).count()
    rows = _q("dup_cluster_stats")(spark, sf_dir).collect()
    assert sum(r.n_paragraphs for r in rows) == n_pars
    assert all(r.n_paragraphs == r.cluster_size * r.n_clusters for r in rows)
    assert min(r.cluster_size for r in rows) >= 1


def test_seq_pack_plan_single_exchange(spark, sf_dir):
    # The groupBy(source, bucket, pack_id) must reuse the window's
    # hash(source, bucket) partitioning: exactly one shuffle in the plan.
    df = _q("seq_pack")(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_seq_pack_window_shards_scale_with_buckets(spark, sf_dir):
    # Scale gate for the low-cardinality-source ceiling: the window must
    # partition by (source, bucket), never source alone, so the number of
    # window shards grows with the corpus (doc_id range), not with the
    # handful of source values.
    df = _q("seq_pack")(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    (win_line,) = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    assert "source" in win_line and "bucket" in win_line
    shards = df.select("source", "bucket").distinct().count()
    sources = df.select("source").distinct().count()
    assert shards > sources  # 500 docs / 128-doc buckets -> 4 buckets/source


def test_domain_mix_plan_broadcasts_small_sides(spark, sf_dir):
    df = _q("domain_mix")(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
