"""session.checkpoint_frame: the cluster-reality switch between
localCheckpoint (local/test, executor-pinned blocks) and reliable
checkpoint() (cluster, survives executor loss / dynamic-allocation
scale-in). Both flavors must truncate lineage to a LogicalRDD scan and
produce identical results; the iterative consumers (connected
components, IVF codebook) must work under either."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from nt_etl_order_book_spark.session import checkpoint_frame


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture()
def restore_checkpoint_dir(spark):
    """Undo setCheckpointDir after the test: the SparkContext is
    session-scoped, and leaving a dir set would silently flip EVERY
    later checkpoint_frame call in the suite to the reliable flavor
    (writing into this test's stale tmp_path) — the localCheckpoint
    path would stop being exercised. PySpark has no public unset, so
    the restore goes through the Scala var's generated setter."""
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    yield
    if prev is None:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        assert sc.getCheckpointDir() is None
    else:
        sc.setCheckpointDir(prev)


def test_checkpoint_frame_truncates_lineage_both_flavors(spark, tmp_path, restore_checkpoint_dir):
    df = (
        spark.range(100)
        .select((F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    # Flavor 1: no checkpoint dir on the context -> localCheckpoint.
    assert spark.sparkContext.getCheckpointDir() is None
    local = checkpoint_frame(df, eager=True)
    assert "LogicalRDD" in _plan(local)
    # Flavor 2: checkpoint dir set -> reliable checkpoint(); blocks must
    # actually land in the directory (that is what survives executor loss).
    ckpt_dir = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    reliable = checkpoint_frame(df, eager=True)
    assert "LogicalRDD" in _plan(reliable)
    assert glob.glob(os.path.join(ckpt_dir, "**", "part-*"), recursive=True)
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, reliable.collect()))


def test_connected_components_converges_under_reliable_checkpoint(spark, tmp_path, restore_checkpoint_dir):
    from nt_etl_order_book_spark.functions.dedup import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "a long, b long"
    )
    labels = {r.x: r.label for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_distributed_rank_under_reliable_checkpoint(spark, tmp_path, restore_checkpoint_dir):
    # The rank decompositions eagerly checkpoint their ranked frame
    # inside query CONSTRUCTION; under a cluster-style checkpoint dir
    # that becomes a reliable checkpoint write job. The lifted rank must
    # still equal the builtin ROW_NUMBER, keys=[] (the gini path)
    # included.
    from pyspark.sql import Window

    from nt_etl_order_book_spark.operators.windows import distributed_rank

    spark.sparkContext.setCheckpointDir(str(tmp_path / "dr_ckpt"))
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("cls"),
        F.pmod(F.col("id") * 7919, F.lit(977)).alias("v"),
    )
    order = [F.asc("v"), F.asc("k")]
    got = {
        (r.k, r._rnk)
        for r in distributed_rank(df, ["cls"], order).select("k", "_rnk").collect()
    }
    w = Window.partitionBy("cls").orderBy(*order)
    want = {
        (r.k, r.rn)
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want
    gglob = {
        (r.k, r._rnk)
        for r in distributed_rank(df, [], order).select("k", "_rnk").collect()
    }
    wglob = {
        (r.k, r.rn)
        for r in df.select(
            "k", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert gglob == wglob
