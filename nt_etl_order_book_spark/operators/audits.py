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
        "Orphan-FK census over the star schema's five declared "
        "relationships: for each child->parent edge, total child rows "
        "and rows whose key has no parent. Each branch projects the "
        "single key column before joining (ReadSchema is one column on "
        "both sides), parents distinct to key-grain first; dim-sized "
        "parents broadcast, the orders parent is a keys-only shuffle "
        "join. The count and orphan-sum come from ONE aggregate per "
        "branch (left join + null indicator, not a separate anti-join "
        "pass), and the union output is exactly five rows. This is "
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
