"""Schema-contract audits: the data-quality queries a warehouse runs
nightly over its landed tables — referential integrity (orphan foreign
keys) and key uniqueness. The reference pipeline enforces these
implicitly through Postgres constraints on the tick store (reference:
postgres_client.py CREATE TABLE path, UNIQUE/PK clauses); a lakehouse
has no engine-enforced constraints, so the audit IS the constraint.

Scale shape: every audit row is a census over one child-parent key
pair or one candidate key — joins carry only the key columns (project
then join, so a 100 TB fact contributes key-width bytes to the
shuffle), dim-sized parents broadcast, and the output is a handful of
rows regardless of input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table

# (relation label, child table, child key, parent table, parent key,
#  parent is dim-sized -> broadcast)
_FK_RELATIONS = (
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    # the ML-table edge: every embedding must point at a landed document
    # (a dangling vector is a re-embed-or-drop item). Both sides are
    # fact-sized at scale -> keys-only shuffle join, not broadcast.
    ("embeddings.vec_id -> documents", "embeddings", "vec_id", "documents", "doc_id", False),
)


def _fk_sql(rel: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
    SELECT '{rel}' AS rel, COUNT(*) AS n_child,
           CAST(SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p ON c.{ckey} = p.{pkey}
    """


@register(
    "referential_integrity_audit",
    "\nUNION ALL\n".join(_fk_sql(*r[:5]) for r in _FK_RELATIONS) + "\nORDER BY rel",
    doc=(
        "Orphan-FK census over the six declared "
        "relationships (star schema + the embeddings->documents ML edge): for each child->parent edge, total child rows "
        "and rows whose key has no parent. Each branch projects the "
        "single key column before joining (ReadSchema is one column on "
        "both sides), parents distinct to key-grain first; dim-sized "
        "parents broadcast, the orders parent is a keys-only shuffle "
        "join. The count and orphan-sum come from ONE aggregate per "
        "branch (left join + null indicator, not a separate anti-join "
        "pass), and the union output is exactly six rows. This is "
        "the lakehouse replacement for the PK/FK constraints the "
        "reference gets from Postgres DDL."
    ),
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for rel, child, ckey, parent, pkey, dim in _FK_RELATIONS:
        c = load_table(spark, sf_dir, child).select(ckey)
        p = load_table(spark, sf_dir, parent).select(pkey).distinct()
        if dim:
            p = F.broadcast(p)
        branch = (
            c.join(p, c[ckey] == p[pkey], "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0)).alias("n_orphans"),
            )
            .select(F.lit(rel).alias("rel"), "n_child", "n_orphans")
        )
        out = branch if out is None else out.unionAll(branch)
    return out.orderBy("rel")


# (audit label, table, key columns)
_UNIQUE_KEYS = (
    ("customer.c_custkey", "customer", ("c_custkey",)),
    ("documents.doc_id", "documents", ("doc_id",)),
    ("events.event_id", "events", ("event_id",)),
    ("lineitem.(l_orderkey,l_linenumber)", "lineitem", ("l_orderkey", "l_linenumber")),
    ("orders.o_orderkey", "orders", ("o_orderkey",)),
    ("part.p_partkey", "part", ("p_partkey",)),
    ("supplier.s_suppkey", "supplier", ("s_suppkey",)),
)


def _uk_sql(rel: str, table: str, keys: tuple[str, ...]) -> str:
    keylist = ", ".join(keys)
    return f"""
    SELECT '{rel}' AS key_name, COUNT(*) AS n_rows,
           (SELECT COUNT(*) FROM (SELECT DISTINCT {keylist} FROM {table}) d) AS n_keys,
           COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT {keylist} FROM {table}) d)
             AS n_dup_rows
    FROM {table}
    """


@register(
    "uniqueness_audit",
    "\nUNION ALL\n".join(_uk_sql(*r) for r in _UNIQUE_KEYS) + "\nORDER BY key_name",
    doc=(
        "Candidate-key uniqueness census across every table that "
        "declares one (incl. lineitem's composite key): row count vs "
        "distinct-key count and the dup-row surplus. Per branch one "
        "keys-only distinct aggregate (partial combine makes the "
        "shuffle carry unique keys per upstream partition, not rows); "
        "output is one row per audited key. n_dup_rows > 0 is the "
        "ingest-retry smoking gun the streaming layer's idempotent "
        "sink exists to prevent — this query is its batch-side check."
    ),
)
def q_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for rel, table, keys in _UNIQUE_KEYS:
        t = load_table(spark, sf_dir, table).select(*keys)
        # struct-wrap the key so NULL-bearing key tuples still count as
        # distinct values (SELECT DISTINCT semantics, matching the
        # oracle) — bare COUNT(DISTINCT a, b) drops any-NULL rows.
        branch = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("n_keys"),
        ).select(
            F.lit(rel).alias("key_name"),
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys")).alias("n_dup_rows"),
        )
        out = branch if out is None else out.unionAll(branch)
    return out.orderBy("key_name")


SPLIT_CUTOFF = "2024-01-16 00:00:00"


@register(
    "split_leakage_audit",
    f"""
    WITH pre AS (
      SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '{SPLIT_CUTOFF}'
    ),
    post AS (
      SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '{SPLIT_CUTOFF}'
    )
    SELECT (SELECT COUNT(*) FROM pre) AS n_train_entities,
           (SELECT COUNT(*) FROM post) AS n_test_entities,
           (SELECT COUNT(*) FROM pre WHERE user_id IN (SELECT user_id FROM post))
             AS n_leaked,
           ROUND(CAST((SELECT COUNT(*) FROM pre WHERE user_id IN (SELECT user_id FROM post))
                      AS DOUBLE)
                 / nullif((SELECT COUNT(*) FROM post), 0), 6) AS leakage_frac
    """,
    doc=(
        "Temporal-split entity-leakage audit: after cutting a "
        "train/test split at a timestamp, how many entities appear on "
        "BOTH sides — the standard check before claiming a temporal "
        "holdout is entity-disjoint (user-level leakage silently "
        "inflates eval scores; the ML-data twin of "
        "contamination_span's textual leakage). Two date-pruned "
        "distinct-key aggregates (the predicate reaches the scan, so "
        "each side reads only its half) and a keys-only semi-join; "
        "1-row census output. Fractions double-over-exact-ints."
    ),
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(SPLIT_CUTOFF).cast("timestamp")
    pre = ev.filter(F.col("ts") < cutoff).select("user_id").distinct()
    post = ev.filter(F.col("ts") >= cutoff).select("user_id").distinct()
    leaked = pre.join(post, "user_id", "left_semi")
    counts = (
        pre.agg(F.count(F.lit(1)).alias("n_train_entities"))
        .crossJoin(post.agg(F.count(F.lit(1)).alias("n_test_entities")))
        .crossJoin(leaked.agg(F.count(F.lit(1)).alias("n_leaked")))
    )
    return counts.select(
        "n_train_entities",
        "n_test_entities",
        "n_leaked",
        F.round(
            F.col("n_leaked").cast("double") / F.nullif(F.col("n_test_entities"), F.lit(0)), 6
        ).alias("leakage_frac"),
    )


@register(
    "label_balance",
    """
    WITH c AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS k FROM c
    )
    SELECT c.label, c.n,
           ROUND(CAST(c.n AS DOUBLE) / (SELECT total FROM tot), 6) AS frac,
           ROUND(POWER(CAST(c.n AS DOUBLE)
                       - CAST((SELECT total FROM tot) AS DOUBLE) / (SELECT k FROM tot), 2)
                 / (CAST((SELECT total FROM tot) AS DOUBLE) / (SELECT k FROM tot)), 6)
             AS chi2_term
    FROM c
    """,
    doc=(
        "Class-balance audit over the labeled embedding corpus: per "
        "label its count, share, and chi-square contribution against "
        "the uniform expectation — the imbalance tripwire run before "
        "any stratified sampling or per-class metric is trusted "
        "(compare hhi_concentration, the market-share analog). One "
        "label-grain aggregate; the 1-row totals broadcast back; "
        "chi-square terms are identical double expressions over exact "
        "integers in both engines, 6 dp."
    ),
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("total"), F.count(F.lit(1)).alias("k"))
    exp = F.col("total").cast("double") / F.col("k")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("frac"),
            F.round(F.pow(F.col("n").cast("double") - exp, F.lit(2)) / exp, 6).alias(
                "chi2_term"
            ),
        )
    )


@register(
    "winsorize_stats",
    """
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    ),
    clipped AS (
      SELECT e.event_type,
             LEAST(GREATEST(e.value, c.p01), c.p99) AS w,
             CASE WHEN e.value < c.p01 OR e.value > c.p99 THEN 1 ELSE 0 END AS clip
      FROM events e JOIN cuts c ON c.event_type = e.event_type
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(clip) AS BIGINT) AS n_clipped,
           ROUND(CAST(SUM(CAST(w AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean,
           ROUND(CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
                 - POWER(CAST(SUM(CAST(w AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 2), 6)
             AS winsorized_var
    FROM clipped GROUP BY event_type
    """,
    doc=(
        "Winsorized moments per message type: clip to the exact "
        "[p01, p99] band, then mean/variance of the clipped values and "
        "the clip count — the outlier-robust preprocessing statistic "
        "(feature normalization that a single fat-fingered print "
        "cannot move; anomaly_zscore FLAGS outliers, this measures "
        "with them neutralized). Exact percentile cutoffs collapse to "
        "a |types|-row broadcast joined back onto one more scan; "
        "moments accumulate as DECIMAL (w² at (38,12) for the "
        "headroom); variance via the closed E[w²]-E[w]² form over "
        "those exact components. At 100 TB the cutoffs swap to "
        "percentile_approx (the interarrival_stats trade-off)."
    ),
)
def q_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # grouped sort-based exact percentiles (see aggregates.
    # grouped_exact_percentile_boundaries) — not the builtin whose
    # per-group counts-map merges in one reducer.
    from nt_etl_order_book_spark.operators.aggregates import (
        grouped_exact_percentile_boundaries,
    )

    cuts = grouped_exact_percentile_boundaries(
        ev, ["event_type"], "value", [0.01, 0.99]
    ).select("event_type", F.col("q1").alias("p01"), F.col("q2").alias("p99"))
    return _winsorized_moments(ev, cuts)


# GK sketch accuracy for winsorize_stats_approx (rank error ≤ n/acc
# per cutoff, so the clip count moves by at most 2·n/acc).
WINSOR_SKETCH_ACCURACY = 10_000


@register(
    "winsorize_stats_approx",
    None,  # GK sketch state merges in task-completion order → rows-only;
    # cutoff rank-error and clip-count bounds asserted in
    # tests/test_operators.py on a uniform constructed corpus.
    doc=(
        "The 100 TB form of winsorize_stats, as runnable code: [p01, "
        "p99] cutoffs from one-pass mergeable GK sketches "
        f"(approx_percentile, accuracy {WINSOR_SKETCH_ACCURACY} → each "
        f"cutoff within n/{WINSOR_SKETCH_ACCURACY} ranks of exact, so "
        "n_clipped deviates by ≤ 2·n/accuracy) instead of the exact "
        "per-group percentile whose partial state is a counts-map over "
        "distinct values; identical broadcast-clip-and-fold tail."
    ),
)
def q_winsorize_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pcts = F.approx_percentile(
        "value", F.array(F.lit(0.01), F.lit(0.99)), F.lit(WINSOR_SKETCH_ACCURACY)
    )
    cuts = ev.groupBy("event_type").agg(
        pcts.getItem(0).cast("double").alias("p01"),
        pcts.getItem(1).cast("double").alias("p99"),
    )
    return _winsorized_moments(ev, cuts)


def _winsorized_moments(ev: DataFrame, cuts: DataFrame) -> DataFrame:
    """Clip-to-band + robust-moments tail shared by the exact and approx
    cutoff variants: broadcast the |types|-row cutoff frame back onto one
    more scan, clip, fold DECIMAL moments."""
    clipped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias("w"),
        F.when((F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")), 1)
        .otherwise(0)
        .alias("clip"),
    )
    mean = F.sum(F.col("w").cast("decimal(30,6)")).cast("double") / F.count(F.lit(1))
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("clip").cast("bigint").alias("n_clipped"),
        F.round(mean, 6).alias("winsorized_mean"),
        F.round(
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
            - F.pow(mean, F.lit(2)),
            6,
        ).alias("winsorized_var"),
    )


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Key-level diff of two table versions: one row per key present in
    either side, with status ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` — the CDC-validation / migration-sign-off primitive
    (did the rewrite of a 100 TB table change anything it shouldn't?).

    Scale shape: each side collapses to (key, row-digest) BEFORE the
    join — the digest is a sha2 over the concatenated non-key columns
    (NULL-tagged so NULL vs '' cannot collide), so the full-outer join
    shuffles keys + 32-byte digests, never rows. Multi-row keys are
    digested order-independently (sum of per-row digest prefixes), so
    the diff is well-defined even when the key is not unique.
    """
    def digested(df: DataFrame) -> DataFrame:
        val_cols = [c for c in df.columns if c not in key_cols]
        tagged = [
            F.coalesce(F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null"))
            for c in sorted(val_cols)
        ]
        row_d = F.sha2(F.concat_ws("\x1f", *tagged), 256)
        # order-independent per-key digest: sum of 56-bit prefixes
        part = F.conv(F.substring(row_d, 1, 14), 16, 10).cast("decimal(38,0)")
        return df.groupBy(*key_cols).agg(
            F.sum(part).alias("_digest"), F.count(F.lit(1)).alias("_rows")
        )

    b = digested(before).withColumnsRenamed({"_digest": "_bd", "_rows": "_bn"})
    a = digested(after).withColumnsRenamed({"_digest": "_ad", "_rows": "_an"})
    joined = b.join(a, key_cols, "full_outer")
    status = (
        F.when(F.col("_bd").isNull(), F.lit("added"))
        .when(F.col("_ad").isNull(), F.lit("removed"))
        .when(
            (F.col("_bd") == F.col("_ad")) & (F.col("_bn") == F.col("_an")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def table_diff_summary(before: DataFrame, after: DataFrame, key_cols: list[str]) -> DataFrame:
    """Census of table_diff statuses (4 rows max)."""
    return table_diff(before, after, key_cols).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_keys")
    )


# Deterministic before/after event-slice fixture for the registered
# table_diff queries: BEFORE drops keys divisible by 97, AFTER drops
# keys divisible by 89 and perturbs value on keys divisible by 13 —
# so all four statuses occur and the oracle can derive them by direct
# column comparison (no digest replication needed; the digest is an
# internal device, the CONTRACT is key->status).
_DIFF_DROP_BEFORE = 97
_DIFF_DROP_AFTER = 89
_DIFF_CHANGE = 13

_DIFF_SLICES_SQL = f"""
    WITH b AS (
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_id % {_DIFF_DROP_BEFORE} <> 0
    ),
    a AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_id % {_DIFF_CHANGE} = 0 THEN value + 1.0 ELSE value END AS value
      FROM events WHERE event_id % {_DIFF_DROP_AFTER} <> 0
    ),
    j AS (
      SELECT COALESCE(b.event_id, a.event_id) AS event_id,
             CASE WHEN b.event_id IS NULL THEN 'added'
                  WHEN a.event_id IS NULL THEN 'removed'
                  WHEN b.user_id IS NOT DISTINCT FROM a.user_id
                   AND b.event_type IS NOT DISTINCT FROM a.event_type
                   AND b.value IS NOT DISTINCT FROM a.value THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM b FULL OUTER JOIN a ON b.event_id = a.event_id
    )
"""


def _diff_slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    before = ev.filter(F.col("event_id") % _DIFF_DROP_BEFORE != 0)
    after = ev.filter(F.col("event_id") % _DIFF_DROP_AFTER != 0).withColumn(
        "value",
        F.when(
            F.col("event_id") % _DIFF_CHANGE == 0, F.col("value") + F.lit(1.0)
        ).otherwise(F.col("value")),
    )
    return before, after


@register(
    "table_diff",
    _DIFF_SLICES_SQL + "SELECT event_id, status FROM j WHERE status <> 'unchanged'",
    doc=(
        "CDC / migration sign-off as a query: key-level diff of two "
        "versions of the events table (deterministic slice fixture), "
        "reporting every added / removed / changed key. The engine side "
        "collapses each side to (key, order-independent row digest) "
        "before a full-outer join — keys + 32-byte digests shuffle, "
        "never rows — which is what makes the same sign-off runnable "
        "against a 100 TB table pair. The oracle derives the identical "
        "statuses by direct NULL-safe column comparison, so the hash "
        "match also certifies the digest scheme introduces no false "
        "positives/negatives on this corpus."
    ),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    before, after = _diff_slices(spark, sf_dir)
    return table_diff(before, after, ["event_id"]).filter(F.col("status") != "unchanged")


@register(
    "table_diff_summary",
    _DIFF_SLICES_SQL + "SELECT status, COUNT(*) AS n_keys FROM j GROUP BY status",
    doc=(
        "Census of table_diff statuses over the same before/after event "
        "slices (≤4 rows) — includes the 'unchanged' cardinality the "
        "detail query filters out, so together the pair proves both the "
        "exact exception keys and the total key accounting."
    ),
)
def q_table_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    before, after = _diff_slices(spark, sf_dir)
    return table_diff_summary(before, after, ["event_id"])
