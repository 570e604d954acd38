"""Similarity search over embeddings — SURVEY §2.10 [X].

`embeddings.embedding` is array<float> (64-dim). Dot products and norms
are higher-order-function expressions (zip_with + aggregate) — fully
JVM-side, no Python in the scoring loop.

Scale design: brute-force top-k broadcasts the (small) query set and
scans the corpus once — the right baseline. The LSH variant buckets by
signed random-projection signature so each query only meets its bucket;
at 100 TB you shard the corpus by bucket and the scan is pruned to
matching buckets (the classic IVF/LSH trade: recall vs pruning).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_etl_order_book_spark.functions.artifacts import artifact_path, ensure_published
from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.session import checkpoint_frame, spread
from nt_etl_order_book_spark.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 play the role of query vectors

# Fixed pseudo-random hyperplanes for the LSH variant: element j of
# plane (t, i) is a deterministic hash-derived value in [-1, 1).
# Multiple small tables instead of one selective one: two similar
# vectors need to agree on all N_PLANES signs in ANY of the N_TABLES
# tables, which is what gives LSH its recall.
N_PLANES = 5
N_TABLES = 8  # 8 tables × 32 buckets of 5-bit signatures
# Multi-probe: each query also probes every bucket at Hamming distance 1
# from its signature (flip one of the N_PLANES bits). Probing happens on
# the tiny broadcast query side — the corpus scan stays pruned — and
# lifts recall@5 from ≈0.58 (single-probe) without adding tables.
N_PROBE_BITS = N_PLANES


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential left-to-right fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # nullif: a zero-norm vector (null-padded / failed encoder) scores
    # null rather than raising DIVIDE_BY_ZERO under ANSI mode.
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# Sub-partitions per query for the two-phase top-k tail. For the
# exact-scan ops the scored set is |corpus| × |queries| rows; a single
# Window.partitionBy("qid") funnels that into only |queries| tasks, each
# sorting a corpus-sized slice — the stage-dominating skew/spill at
# 100× scale even though the scan parallelizes. Phase 1 ranks within
# (qid, vec_id % TOPK_SALTS) so each query's scores fan across
# TOPK_SALTS tasks; any global top-k row is top-k within its own
# sub-partition under the same total order (cos_sim DESC, vec_id ASC —
# vec_id is unique per qid), so the ≤ TOPK_SALTS×k survivors provably
# contain the answer and phase 2's tiny window reproduces the
# single-window result EXACTLY (the oracle IS the single-window form;
# the driver hash check is the equivalence proof). Same pattern as
# stratified_sample (sampling.py).
TOPK_SALTS = 32


def topk_per_query(scored: DataFrame, k: int = TOP_K, *, pruned: bool = False) -> DataFrame:
    """Per-query top-k over (qid, vec_id, cos_sim) rows — shared tail of
    every similarity variant (exact, LSH, IVF, PQ). Extra columns on
    `scored` ride through untouched.

    pruned=False (exact-scan callers, |corpus|×|queries| input): two-phase
    salted ranking so each query's scores fan across TOPK_SALTS tasks.
    pruned=True (LSH/IVF/PQ candidate sets, already bucketed/probed small
    per query): single window — the salt phase would add a second
    shuffle+sort over a set that is bounded by construction, which is
    pure overhead (measured 1.7–2.0× on the r6 bench)."""
    order = [F.desc("cos_sim"), F.asc("vec_id")]
    w2 = Window.partitionBy("qid").orderBy(*order)
    if pruned:
        return scored.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)
    clash = {"_tk_salt", "_tk_rn1"}.intersection(scored.columns)
    if clash:
        # Mirrors the salted_join guard: silently overwriting (then
        # dropping) a caller column of the same name corrupts the result.
        raise ValueError(f"topk_per_query: input already has reserved column(s) {sorted(clash)}")
    salted = scored.withColumn("_tk_salt", F.pmod(F.col("vec_id"), F.lit(TOPK_SALTS)))
    w1 = Window.partitionBy("qid", "_tk_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_tk_rn1", F.row_number().over(w1))
        .filter(F.col("_tk_rn1") <= k)
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("_tk_salt", "_tk_rn1")
    )


@register(
    "cosine_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS evec
      FROM embeddings
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(q.qvec, e.evec), p -> p[1] * p[2]))
               / nullif(sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
                        * sqrt(list_sum(list_transform(e.evec, x -> x * x))), 0),
               6
             ) AS cos_sim
      FROM q JOIN e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc=(
        "Brute-force cosine top-k: query set broadcast against the corpus, "
        "score via zip_with/aggregate HOFs, rank per query. cos rounded to "
        "6dp (both engines) so accumulation order can't flip the hash."
    ),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Norms are per-vector, not per-pair: compute each side's norm once in
    # its own projection instead of re-deriving the corpus norm for every
    # query it meets (×N_QUERIES waste), and the query norm per corpus row.
    corpus = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("enorm"))
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("enorm").alias("qnorm"),
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qvec"), F.col("embedding"))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_query(scored)


def _plane_vals(table: int, i: int) -> list[float]:
    """Deterministic hyperplane (table, i) components: md5-derived in
    Python at plan-build time, so signature evaluation does no per-row
    plane construction."""
    import hashlib

    vals = []
    for j in range(64):
        digest = hashlib.md5(f"ntspark-plane:{table}:{i}:{j}".encode()).digest()
        vals.append((int.from_bytes(digest[:8], "big") % 2_000_001) / 1_000_000.0 - 1.0)
    return vals


# The full [table][plane][dim] hyperplane tensor. r9 collapsed the
# N_TABLES × N_PLANES separate 64-literal arrays (~10k expression nodes
# whose ANALYSIS, not execution, dominated the query) into one nested
# F.lit; r16 moves the tensor out of the expression tree entirely —
# PySpark lowers a nested-list lit to CreateArray-of-CreateArray, still
# ~2,600 Literal nodes that EVERY downstream Dataset re-analyzes
# (measured: 1.6-2.1 s of the query's wall was driver-side plan
# construction, single-threaded at any cluster size). planes_frame
# ships the same tensor as ONE broadcast row — the codebook pattern
# (cents_frame) — so the plan carries a column reference instead.
_PLANES: list[list[list[float]]] = [
    [_plane_vals(t, i) for i in range(N_PLANES)] for t in range(N_TABLES)
]


def planes_frame(spark: SparkSession) -> DataFrame:
    """The hyperplane tensor as a 1-row broadcastable frame (~20 KB):
    data in a LocalRelation instead of thousands of literal expression
    nodes in every consumer's analyzed plan."""
    return spark.createDataFrame([(_PLANES,)], "planes array<array<array<double>>>")


def rp_signatures(vec: Column, planes: Column) -> Column:
    """Array of N_TABLES signed-projection signatures (N_PLANES bits
    each) — bit i of table t's signature is sign(vec · plane(t, i)),
    identical values to the per-plane expression form this replaces.
    ``planes`` is planes_frame's column, attached via broadcast."""
    return F.transform(
        planes,
        lambda tp: F.aggregate(
            F.transform(
                tp,
                # shiftleft's DSL binding wants a Python int for the bit
                # count; call_function passes the lambda index Column.
                lambda p, i: F.when(
                    dot(vec, p) >= 0, F.call_function("shiftleft", F.lit(1), i)
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )


@register(
    "ann_lsh_topk",
    None,  # bucketing is hash-specific → rows-only check; recall vs cosine_topk is asserted in tests.
    doc=(
        "ANN via signed-random-projection LSH: corpus bucketed in "
        f"{N_TABLES} hash tables of {N_PLANES}-bit signatures; each query "
        "probes its own bucket plus every Hamming-distance-1 bucket "
        "(multi-probe), then exact rescoring + top-k. The pruned-scan "
        "scale path for similarity search."
    ),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread (r15 optimization round): the signature projection is
    # N_TABLES×N_PLANES plane dots per row — the query's dominant CPU —
    # and runs in the scan's one task on the single-row-group fixture.
    # The query branch's copy of the exchange carries only the
    # vec_id < N_QUERIES rows (the filter pushes below the
    # repartition), so the fork costs nothing; no-op at scale.
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    corpus = emb.crossJoin(F.broadcast(planes_frame(spark))).select(
        "vec_id", "embedding", rp_signatures(F.col("embedding"), F.col("planes")).alias("sigs")
    )
    banded = corpus.select(
        "vec_id", "embedding", F.posexplode("sigs").alias("table", "sig")
    )
    # Multi-probe expansion on the QUERY side only: 1 exact bucket +
    # N_PROBE_BITS single-bit-flip buckets per (query, table). The
    # broadcast grows ×(1+N_PROBE_BITS) on ~N_QUERIES rows — free — while
    # the corpus side still meets only matching buckets.
    probe_sigs = F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(N_PROBE_BITS)]
    )
    q = (
        banded.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.col("table").alias("qtable"),
            F.explode(probe_sigs).alias("qsig"),
        )
    )
    cands = (
        banded.join(
            F.broadcast(q),
            (F.col("table") == F.col("qtable"))
            & (F.col("sig") == F.col("qsig"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "qvec", "vec_id", "embedding")
        .dropDuplicates(["qid", "vec_id"])  # a pair can collide in several tables: score once
    )
    scored = cands.select(
        "qid", "vec_id", F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos_sim")
    )
    # Candidate set is bounded by the LSH buckets — single-phase tail.
    return topk_per_query(scored, pruned=True)


N_CELLS = 16  # IVF partitions (coarse quantizer size)
# Cells probed per query. Recall on an ISOTROPIC corpus (like the test
# fixture — measured same-label vs cross-label cosine are both ≈0) is
# bounded by the probed mass ≈ N_PROBE/N_CELLS regardless of codebook
# quality — candidates are already exact-cosine ranked, so re-ranking
# buys nothing; probe mass is the ONLY recall lever on this corpus.
# IVF's recall advantage only exists when the corpus clusters (see
# test_ivf_recall_on_clustered_corpus). The r5 probe sweep at sf0.01
# measured 8→0.76, 9→0.80, 10→0.86, 11→0.94, 12→0.96; 11/16 clears
# the 0.85 floor with margin at no measured wall cost (sf0.1 warm:
# 1.9 s, recall 0.92). The scan-prune ratio here (16/11 ≈ 1.5×) is
# fixture-sized: production runs thousands of cells with
# N_PROBE/N_CELLS ≪ 1, and on a clustered corpus the same codebook
# reaches ≥0.9 at 4/16 (the clustered-corpus test), so deployments
# tune DOWN from this adversarial-fixture setting.
N_PROBE = 11
# One Lloyd pass over the training sample: the clustered-corpus recall
# test (tests/test_skew_and_ann.py) gates codebook quality at ≥0.9 and
# still measures 1.0 with a single pass — the second pass bought no
# recall at 2× the training cost (r2→r3 bench trim).
KMEANS_ITERS = 1
TRAIN_MOD = 10  # k-means trains on ~1/TRAIN_MOD of the corpus (hash-sampled)


def unit_vector(vec: Column) -> Column:
    """L2-normalize (zero vectors → null elements, never a divide error)."""
    n = norm(vec)
    return F.transform(vec, lambda v: v.cast("double") / F.nullif(n, F.lit(0.0)))


def nearest_cell(vec: Column, cents: Column) -> Column:
    """Argmin over a UNIT-NORM centroid array — one HOF fold per row,
    ZERO shuffle.

    `cents` is an array<struct<cell,cvec>> attached to every row via a
    broadcast of a single-row frame; the fold keeps the (cell, dot) pair
    with the highest dot product (ties → lowest cell id). Centroids are
    unit vectors (spherical k-means), and the row's own norm scales all
    cells equally, so argmax(dot) ≡ argmax(cosine) with neither norm
    computed — a third of the fold work. Replaces the round-1
    broadcast-join×N_CELLS + Window.partitionBy(vec_id) ranking, which
    shuffled corpus×N_CELLS expanded rows just to pick a max.

    Delegates to _nearest_cell_sim (defined with semdedup, which also
    needs the winning dot) so the tiebreak/init sentinel lives in ONE
    fold — a divergence there would silently disagree on cell
    boundaries between IVF assignment and the SemDeDup census.
    """
    return _nearest_cell_sim(vec, cents)["cell"]


def kmeans_refine(train: DataFrame, cents_arr: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """Spherical-k-means Lloyd iterations, fully distributed, no driver
    collect.

    Assignment: HOF argmin over the broadcast centroid array (narrow).
    Update: posexplode to (cell, pos, x) then groupBy(cell, pos).avg —
    map-side partial aggregation collapses each partition to ≤
    N_CELLS×dim rows before the shuffle, so the exchange carries KBs
    regardless of corpus size. New centroids are re-normalized
    (spherical k-means: the mean direction is the cosine-metric
    centroid) and re-collapse to a single-row array frame.

    Each iteration ends in a checkpoint (reliable when the session has a
    checkpoint dir, local otherwise — session.checkpoint_frame): the
    codebook is one row of KBs, but its lineage grows a full Lloyd pass
    per iteration — truncating it keeps Catalyst from re-optimizing (and
    re-running) the whole nested training plan under every downstream
    consumer (measured 2-3× on the end-to-end query). The checkpoint is
    LAZY (eager=False): building the query plan must run no jobs —
    training executes once, on the first downstream action, and later
    consumers reuse the materialized blocks.
    """
    for _ in range(iters):
        assigned = train.crossJoin(F.broadcast(cents_arr)).select(
            F.col("embedding"),
            nearest_cell(F.col("embedding"), F.col("cents")).alias("cell"),
        )
        cents_arr = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", unit_vector(F.transform(F.col("pm"), lambda s: s["m"])).alias("cvec"))
            .agg(F.collect_list(F.struct("cell", "cvec")).alias("cents"))
        )
        cents_arr = checkpoint_frame(cents_arr, eager=False)
    return cents_arr


def ivf_codebook(emb: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """Trained IVF coarse quantizer as a 1-row array<struct<cell,cvec>>
    frame (checkpointed — see kmeans_refine).

    Seed centroids are the first ``n_cells`` vectors, collapsed to ONE
    row — broadcasting this single row attaches the whole codebook to
    every corpus row with no expansion. Refinement runs on a
    deterministic 1/TRAIN_MOD hash-sample: k-means quality needs a
    representative sample, not the full corpus — at 100 TB that is the
    difference between cheap sample passes and full-corpus passes, with
    identical codebook quality.
    """
    seed = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.struct(
                F.col("vec_id").alias("cell"), unit_vector(F.col("embedding")).alias("cvec")
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cents"))
    )
    train = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(TRAIN_MOD)) == 0).select("embedding")
    return kmeans_refine(train, seed)


# Above this codebook size the IVF-PQ training paths auto-select the
# Arrow-batched numpy assignment (ivf_codebook_rows +
# ivf_residuals_arrow): the HOF argmin fold is O(C·D) INTERPRETED per
# row — free at the 16-cell fixture (and it keeps the registered plans
# 100% JVM, which tests/test_plans.py gates), but ~hours over a
# 2M-vector encode at the measured-optimal √N ≈ 1414 cells (PERF.md
# r13). 64 sits comfortably between the two regimes: the fixture and
# every registered query stay JVM-side, while any DEPLOY.md §2-sized
# codebook gets the BLAS matmul form faiss uses.
ARROW_CELLS_THRESHOLD = 64


def ivf_cells() -> int:
    """Effective coarse-quantizer size for the IVF-PQ train/apply
    lifecycle: ``SPARK_GRAFT_IVF_CELLS`` if set — DEPLOY.md §2's
    N_CELLS ~ √N sizing made executable without editing source — else
    the N_CELLS fixture default. The artifact cache key folds this in
    (_ivfpq_index_path), so switching cell counts can never serve an
    index built at a different geometry."""
    raw = os.environ.get("SPARK_GRAFT_IVF_CELLS")
    if raw is None:
        return N_CELLS
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"SPARK_GRAFT_IVF_CELLS={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(f"SPARK_GRAFT_IVF_CELLS must be >= 1, got {val}")
    return val


def ivf_probe() -> int:
    """Cells probed per query: ``SPARK_GRAFT_IVF_PROBE`` if set, else
    the N_PROBE fixture default. The matching knob to
    SPARK_GRAFT_IVF_CELLS (r14 ADVICE): a deployment resizing to √N
    cells tunes probe count WITH the cell count — probed mass is
    probe/cells, and recall at a fixed probe=11 would otherwise depend
    entirely on how well the corpus clusters. Same validation pattern
    as ivf_cells; values above the cell count are harmless (F.slice
    past the array end returns the whole array — full scan)."""
    raw = os.environ.get("SPARK_GRAFT_IVF_PROBE")
    if raw is None:
        return N_PROBE
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"SPARK_GRAFT_IVF_PROBE={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(f"SPARK_GRAFT_IVF_PROBE must be >= 1, got {val}")
    return val


def cents_frame(spark: SparkSession, cent_rows: list) -> DataFrame:
    """The 1-row broadcastable codebook frame (ivf_codebook's schema)
    rebuilt from driver-side [(cell, cvec), ...] rows — the bridge from
    the Arrow-trained codebook back to the JVM query side, which
    broadcasts the same single row either way."""
    return (
        spark.createDataFrame(cent_rows, "cell long, cvec array<double>")
        .agg(F.collect_list(F.struct("cell", "cvec")).alias("cents"))
    )


def ivf_codebook_rows(emb: DataFrame, n_cells: int) -> list:
    """Large-codebook spherical k-means, returning the codebook as
    driver-side ``[(cell, cvec), ...]`` rows.

    Same conventions as ivf_codebook — seeds are the first ``n_cells``
    vec_ids (unit-normalized), KMEANS_ITERS Lloyd passes over the
    deterministic 1/TRAIN_MOD hash-sample — with the per-row argmin run
    as Arrow-batched numpy matmul (mapInPandas) instead of the
    interpreted HOF fold, which is O(C·D) per row and impractical past
    a few dozen cells. Per-cell partial sums reduce map-side (each
    partition emits ≤ cells rows), the (cell, pos) shuffle carries
    C×D doubles regardless of corpus size, and the centroid UPDATE
    finishes at the driver — C×D ≈ 700 KB at 1414×64, the same
    "query-side state" the 1-row codebook frame carries; never
    corpus-sized. Two deviations from the JVM path, both deliberate:

    - Empty cells keep their previous centroid (kmeans_refine's
      collect_list silently drops them — harmless at 16 fixture cells,
      but at √N cells a dropped cell would shrink the codebook).
    - Not bit-identical: BLAS partial sums accumulate in a different
      order than the JVM aggregation, so centroids can differ in the
      last ulps and near-tie assignments can flip. The consumers are
      recall-floored (tools/check.py --recall), not hash-matched, by
      contract.
    """
    import numpy as np
    import pandas as pd

    seed_rows = emb.filter(F.col("vec_id") < n_cells).select("vec_id", "embedding").collect()
    if not seed_rows:
        raise ValueError(f"no seed vectors with vec_id < {n_cells}")
    if len(seed_rows) != n_cells:
        # A shortfall (SPARK_GRAFT_IVF_CELLS larger than the corpus, or
        # a sparse vec_id space below n_cells) would silently train a
        # SMALLER codebook while the artifact cache key still claims
        # ivfpq_c{n_cells} — self-consistent results under a mislabeled
        # geometry (r14 ADVICE). Fail loudly, mirroring the empty-seed
        # check: the caller sizes cells to the corpus, not vice versa.
        raise ValueError(
            f"ivf_codebook_rows: {len(seed_rows)} seed vectors with "
            f"vec_id < {n_cells}, need exactly {n_cells} — is "
            "SPARK_GRAFT_IVF_CELLS larger than the corpus (or the "
            "vec_id space sparse below n_cells)?"
        )
    cents = np.array(
        [r["embedding"] for r in sorted(seed_rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cents = cents / norms
    train = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(TRAIN_MOD)) == 0).select(
        "embedding"
    )
    for _ in range(KMEANS_ITERS):
        c_bc = cents  # closure snapshot for this pass

        def partials(batches):
            for pdf in batches:
                if pdf.empty:
                    continue  # np.stack raises on an empty Arrow batch
                x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                idx = np.argmax(x @ c_bc.T, axis=1)
                cells, inv = np.unique(idx, return_inverse=True)
                sums = np.zeros((len(cells), x.shape[1]))
                np.add.at(sums, inv, x)
                yield pd.DataFrame({"cell": cells, "cnt": np.bincount(inv), "s": list(sums)})

        agg = (
            train.mapInPandas(partials, "cell long, cnt long, s array<double>")
            .select("cell", "cnt", F.posexplode("s").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("cnt").alias("cnt"), F.sum("x").alias("sx"))
            .collect()
        )
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents))
        for r in agg:
            sums[r["cell"], r["pos"]] = r["sx"]
            cnts[r["cell"]] = r["cnt"]  # same per-cell total on every pos row
        nonempty = cnts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / cnts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = new / norms
    return [(int(i), [float(v) for v in row]) for i, row in enumerate(cents)]


def ivf_codebook_state(emb: DataFrame, n_cells: int | None = None) -> tuple:
    """(cents_arr frame, cent_rows-or-None): the auto-selected codebook
    for the IVF-PQ training paths (r13 verdict item 2). At or below
    ARROW_CELLS_THRESHOLD the JVM HOF path trains (rows is None — the
    plan stays 100% whole-stage codegen and nothing is collected);
    above it the Arrow k-means trains and the driver-side rows ride
    along so ivf_residuals_auto can take the matmul assignment without
    re-collecting the frame."""
    n = ivf_cells() if n_cells is None else n_cells
    if n <= ARROW_CELLS_THRESHOLD:
        return ivf_codebook(emb, n), None
    rows = ivf_codebook_rows(emb, n)
    return cents_frame(emb.sparkSession, rows), rows


def ivf_assign(emb: DataFrame, cents_arr: DataFrame) -> DataFrame:
    """Full-corpus cell assignment: one narrow projection, zero shuffle.
    The row norm is per-vector, not per-pair — computed once here so
    downstream per-candidate scoring is a single dot fold, not
    dot + 2 norms."""
    return emb.crossJoin(F.broadcast(cents_arr)).select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("enorm"),
        nearest_cell(F.col("embedding"), F.col("cents")).alias("cell"),
    )


def write_ivf_index(emb: DataFrame, cents_arr: DataFrame, path: str) -> None:
    """Persist the corpus as an on-disk IVF index: assignment rows
    written `partitionBy("cell")`, one parquet directory per cell.

    This is the 100 TB form of `ann_ivf_topk`'s claim made testable: a
    probe read with `cell` predicates prunes at the DIRECTORY level
    (PartitionFilters in the scan, asserted in tests), so each query
    batch reads ~N_PROBE/N_CELLS of the stored bytes — no job touches
    the unprobed cells at all.

    The overwrite is deliberately STATIC — pinned per-write below, not
    inherited from the session (a deployment that sets
    spark.sql.sources.partitionOverwriteMode=dynamic globally must not
    change rebuild semantics): an index rebuild replaces the WHOLE
    path. Dynamic partition overwrite would keep any cell directory the
    new assignment no longer populates (codebook drift can empty a
    cell), and probe reads would then return vec_ids from the previous
    build. Incremental upserts belong to a table format with deletes
    (Delta/Iceberg), not raw parquet."""
    (
        ivf_assign(emb, cents_arr)
        # Keyed on cell so each task writes whole cell directories —
        # the narrow assignment keeps the scan partitioning, so an
        # unkeyed partitionBy write sprays tasks×cells tiny files (see
        # ivfpq_train: measured 3× probe-wall cost at 2M vectors).
        .repartition(emb.sparkSession.sparkContext.defaultParallelism, "cell")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell")
        .parquet(path)
    )


@register(
    "ann_ivf_topk",
    None,  # centroid assignment is implementation-specific → rows-only.
    doc=(
        f"ANN via IVF (inverted file): k-means-refined coarse quantizer "
        f"({N_CELLS} cells, {KMEANS_ITERS} Lloyd iterations on a "
        f"deterministic 1/{TRAIN_MOD} hash-sample); corpus assigned to its "
        "nearest cell by a zero-shuffle HOF argmin over the broadcast "
        f"centroid array; each query scores only its {N_PROBE} nearest "
        "cells. At 100 TB you persist the corpus bucketed by cell "
        "(write_ivf_index: partitionBy('cell'); partition pruning on "
        "probe reads is plan-asserted in tests) and probing prunes the "
        "scan to ~N_PROBE/N_CELLS of the data."
    ),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents_arr = ivf_codebook(emb)
    # spread ONLY the assignment input: the argmin fold and the
    # per-candidate dot products downstream of the cell join are the
    # query's CPU, and on the single-row-group fixture they otherwise
    # run as ONE task (measured: an 0.8 s single-task stage inside the
    # 2.0 s wall, r15 optimization round). The training/query branches
    # stay on the raw scan so the exchange isn't duplicated under every
    # consumer of `emb`.
    assigned = ivf_assign(spread(emb, "vec_id"), cents_arr)
    # Each query probes its N_PROBE nearest refined cells. Probe selection
    # is a HOF over the SAME broadcast codebook array the assignment uses:
    # sort (−dot, cell) ascending ≡ (dot desc, cell asc) and slice the
    # head — replaces the earlier crossJoin(cent_rows) + Window rank,
    # which cost an extra broadcast exchange and a window shuffle just to
    # pick 4 of 16 cells per query.
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        norm(F.col("embedding")).alias("qnorm"),
    )
    by_sim = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (-dot(F.col("qvec"), c["cvec"])).alias("neg_sim"),
                c["cell"].alias("cell"),
            ),
        )
    )
    probes = q.crossJoin(F.broadcast(cents_arr)).select(
        "qid",
        "qvec",
        "qnorm",
        F.explode(
            F.transform(F.slice(by_sim, 1, ivf_probe()), lambda s: s["cell"])
        ).alias("cell"),
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qvec"), F.col("embedding"))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        )
    )
    # IVF candidates are pruned to the probed cells: at production cell
    # counts (~sqrt(N) cells, n_probe << cells) each query meets
    # |corpus|*n_probe/n_cells rows — bounded, so the salted phase-1
    # window is pure overhead here (it cost +67% on the r6 bench at
    # sf0.1 where the candidate sets are tiny).
    return topk_per_query(scored, pruned=True)


@register(
    "embed_norm_stats",
    """
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(MIN(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS min_norm,
           ROUND(MAX(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Vector-column hygiene stats: L2 norm range per label (HOF expressions over array<float>).",
)
def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.min(nrm), 6).alias("min_norm"),
        F.round(F.max(nrm), 6).alias("max_norm"),
    )


DEDUP_COS_TAU = 0.3  # fixture-calibrated: isotropic 64-dim corpus tops out ≈0.47
# Blocks larger than this are EXCLUDED from the exact pass: within-block
# cost is block², so one oversized block is the quadratic cliff (measured
# 87× wall at 10× data before the cap). Oversized blocks belong to the
# approximate path (ann_lsh_topk's banding) — same contract as
# MAX_SHINGLE_DF / max_bucket in the text-dedup family.
MAX_BLOCK = 10_000


@register(
    "embed_cosine_dedup",
    f"""
    WITH sized AS (
      SELECT vec_id, label, embedding,
             COUNT(*) OVER (PARTITION BY label) AS bsz
      FROM embeddings
    ),
    e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      FROM sized WHERE bsz <= {MAX_BLOCK}
    )
    SELECT a.vec_id AS a, b.vec_id AS b, a.label,
           ROUND(
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
             / nullif(a.nrm * b.nrm, 0), 6
           ) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
          / nullif(a.nrm * b.nrm, 0) >= {DEDUP_COS_TAU}
    """,
    doc=(
        "Embedding-cosine near-dup pairs via BLOCKING: exact all-pairs "
        "cosine within each metadata block (label), threshold "
        f"{DEDUP_COS_TAU}. The classic record-linkage shape: the join "
        "shuffles once on the blocking key, so cost is sum of block² — "
        f"blocks over {MAX_BLOCK} rows are excluded (quadratic guard) "
        "and belong to the approximate path (ann_lsh_topk's banding); "
        "production subdivides with finer keys (label × coarse bucket)."
    ),
)
def q_embed_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Quadratic guard as a broadcast blocklist (same shape as the
    # decontamination DF cap): the list of OVERSIZED labels is tiny, and
    # the aggregate shuffles partial counts, never rows.
    big = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > MAX_BLOCK)
        .select("label")
    )
    emb = emb.join(F.broadcast(big), "label", "left_anti")
    # Norms once per row, BEFORE the self-join (not per pair).
    e = emb.select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm"))
    # Explicit label-keyed repartition of the PROBE side only (r15
    # optimization round): the planner broadcasts the b side at fixture
    # size, so the quadratic per-label probe otherwise runs in the
    # single-row-group scan's one task (measured: a ~1.6 s near-single-
    # task pair stage). An explicit REPARTITION_BY_COL is exempt from
    # AQE byte-based coalescing (the exchange carries KBs; the join
    # OUTPUT is what explodes) and at cluster scale — where b exceeds
    # the broadcast threshold and the join becomes shuffle-based — it
    # is exactly the distribution the join needs, so no extra exchange
    # appears. The b branch stays unpartitioned: repartitioning a
    # build-side that feeds a broadcast would move the corpus for
    # nothing.
    a = e.repartition(spark.sparkContext.defaultParallelism, "label").select(
        F.col("vec_id").alias("a"), "label",
        F.col("embedding").alias("va"), F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b"), "label",
        F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    # r15 optimization round, examined and left as the plain label join:
    # salting it via operators/skew.salted_join (b side replicated 16×)
    # was measured WORSE at sf0.1 (1.76 → 2.06 s interleaved) — the
    # replication exchange outweighs the extra parallelism while blocks
    # stay under MAX_BLOCK. A deployment whose label blocks approach the
    # cap (quadratic pair mass per reducer) should switch to
    # salted_join(a, b, "label"); it is row-identical by the pinned
    # skew-join contract.
    return (
        a.join(b, "label")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "label", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= DEDUP_COS_TAU)
    )


# int8 quantization ladder for embedding compression: 255 steps between
# the per-dimension corpus min and max (asymmetric affine, the faiss
# SQ8 shape). Rounding is written FLOOR(x + 0.5) in BOTH engines —
# identical IEEE ops — instead of engine ROUND(), whose half-way rule
# differs across SQL dialects.
QUANT_STEPS = 255.0


@register(
    "embed_quantize_stats",
    f"""
    WITH dims AS (
      SELECT vec_id, label, t.pos, CAST(embedding[t.pos] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)
    ),
    stats AS (SELECT pos, MIN(x) AS xmin, MAX(x) AS xmax FROM dims GROUP BY pos),
    errs AS (
      SELECT d.vec_id, d.label,
             CASE WHEN s.xmax > s.xmin THEN
               ABS(d.x - (s.xmin
                 + FLOOR((d.x - s.xmin) / ((s.xmax - s.xmin) / {QUANT_STEPS}) + 0.5)
                   * ((s.xmax - s.xmin) / {QUANT_STEPS})))
             ELSE 0.0 END AS err
      FROM dims d JOIN stats s USING (pos)
    )
    SELECT label,
           COUNT(DISTINCT vec_id) AS n_vecs,
           ROUND(MAX(err), 6) AS max_abs_err,
           ROUND(CAST(SUM(CAST(err AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
    FROM errs GROUP BY label
    """,
    doc=(
        "Embedding int8-quantization audit: per-dimension asymmetric "
        f"affine codes ({QUANT_STEPS:.0f} steps between the corpus "
        "min/max of each dimension — the faiss SQ8 shape), reporting "
        "max and mean absolute reconstruction error per label — the "
        "go/no-go check before compressing a 100 TB embedding store "
        "4x for ANN serving. The per-dimension stats frame is "
        "dim-cardinality (64 rows) regardless of corpus size and "
        "broadcasts back onto the dimension stream; error terms "
        "accumulate as DECIMAL(38,18); every float op (scale, code, "
        "dequant, |err|) is a correctly-rounded IEEE expression "
        "written identically in both engines."
    ),
)
def q_embed_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), F.col("xf").cast("double").alias("x"))
    stats = dims.groupBy("pos").agg(F.min("x").alias("xmin"), F.max("x").alias("xmax"))
    scale = (F.col("xmax") - F.col("xmin")) / F.lit(QUANT_STEPS)
    deq = F.col("xmin") + F.floor((F.col("x") - F.col("xmin")) / scale + 0.5) * scale
    err = F.when(F.col("xmax") > F.col("xmin"), F.abs(F.col("x") - deq)).otherwise(0.0)
    return (
        dims.join(F.broadcast(stats), "pos")
        .select("vec_id", "label", err.alias("err"))
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vecs"),
            F.round(F.max("err"), 6).alias("max_abs_err"),
            F.round(
                F.sum(F.col("err").cast("decimal(38,18)")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_err"),
        )
    )


@register(
    "embed_centroid_stats",
    """
    WITH dims AS (
      SELECT vec_id, label, t.pos, CAST(embedding[t.pos] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)
    ),
    cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
      FROM dims GROUP BY label, pos
    ),
    parts AS (
      SELECT d.vec_id, d.label,
             CAST(SUM(CAST(d.x * c.m AS DECIMAL(38,18))) AS DOUBLE) AS dotc,
             CAST(SUM(CAST(d.x * d.x AS DECIMAL(38,18))) AS DOUBLE) AS nx2,
             CAST(SUM(CAST(c.m * c.m AS DECIMAL(38,18))) AS DOUBLE) AS nc2
      FROM dims d JOIN cent c USING (label, pos)
      GROUP BY d.vec_id, d.label
    ),
    coss AS (
      SELECT vec_id, label,
             CASE WHEN nx2 > 0 AND nc2 > 0
                  THEN dotc / (sqrt(nx2) * sqrt(nc2)) END AS c
      FROM parts
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(38,18))) AS DOUBLE) / COUNT(c), 6)
             AS avg_cos_to_centroid,
           ROUND(MIN(c), 6) AS min_cos_to_centroid
    FROM coss GROUP BY label
    """,
    doc=(
        "Embedding cluster-tightness audit: per-label centroid "
        "(elementwise mean) and each vector's cosine to its own "
        "centroid, reported as per-label count / mean / worst cosine — "
        "the drift and mislabel detector run before trusting label "
        "blocking (embed_cosine_dedup) or training an IVF codebook on "
        "a label-sharded 100 TB embedding store. The centroid frame is "
        "label x dim cardinality (KBs) regardless of corpus size and "
        "broadcasts back onto the dimension stream; every sum "
        "accumulates as DECIMAL(38,18) so the result is "
        "partition-order independent; zero-norm vectors yield NULL "
        "cosine and are excluded from the mean (COUNT(c) semantics in "
        "both engines)."
    ),
)
def q_embed_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id", "label", (F.col("pos0") + 1).alias("pos"), F.col("xf").cast("double").alias("x")
    )
    dec = "decimal(38,18)"
    cent = dims.groupBy("label", "pos").agg(
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count(F.lit(1))).alias("m")
    )
    parts = (
        dims.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("x") * F.col("m")).cast(dec)).cast("double").alias("dotc"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("nx2"),
            F.sum((F.col("m") * F.col("m")).cast(dec)).cast("double").alias("nc2"),
        )
    )
    cos_c = F.when(
        (F.col("nx2") > 0) & (F.col("nc2") > 0),
        F.col("dotc") / (F.sqrt(F.col("nx2")) * F.sqrt(F.col("nc2"))),
    )
    return (
        parts.select("vec_id", "label", cos_c.alias("c"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("c").cast(dec)).cast("double") / F.count("c"), 6
            ).alias("avg_cos_to_centroid"),
            F.round(F.min("c"), 6).alias("min_cos_to_centroid"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the ADC-scan variant (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search", public paper; the
# faiss IndexPQ shape). Complements IVF: IVF prunes WHICH rows are
# scanned, PQ compresses WHAT a scan reads — at 100 TB the corpus scan
# side of a query batch reads PQ_M small ints per vector (the codes)
# instead of the raw float array, a ~32× byte reduction at these
# parameters, and the two compose (IVF-PQ) by encoding residuals per cell.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces; PQ_M * PQ_DSUB = embedding dim (64)
PQ_DSUB = 8
PQ_K = 16  # centroids per subspace → 4-bit codes
# ADC candidates per query that get an exact-cosine re-rank. ADC scores
# are approximate (32-bit codes); re-ranking a small candidate set from
# the raw vectors restores exactness for the survivors — the standard
# two-stage PQ serving shape. 200 is calibrated on the ISOTROPIC fixture
# (the worst case for any quantizer — true cosine gaps are ≈1σ of the
# ADC error, so the candidate set has to be wide: measured recall@5
# 0.82→0.86 over CAND 50→100 at sf0.01, 0.66→0.84 over 100→200 at
# sf0.1). Re-rank cost is CAND×dim per query — negligible next to the
# code scan at any corpus size. On clustered corpora (the realistic
# case) the codebook concentrates and far narrower CANDs reach the same
# recall — deployments tune DOWN from this adversarial setting, as with
# N_PROBE. PQ_K stays at 16: larger K needs a larger k-means train
# sample than the fixture provides (measured WORSE at K=32/64 on
# sf0.01's 50-vector sample — empty/overfit cells).
PQ_CAND = 200


def _subvecs(vec: Column) -> Column:
    """Split a PQ_M*PQ_DSUB vector into PQ_M double sub-vectors."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda s: F.transform(F.slice(vec, s * PQ_DSUB + 1, PQ_DSUB), lambda x: x.cast("double")),
    )


def _nearest_pos(sv: Column, cents: Column) -> Column:
    """0-based ARRAY POSITION of the L2-nearest centroid — one HOF fold,
    zero shuffle (the PQ twin of nearest_cell).

    Positions, not centroid labels: codes index straight into the
    query-side lookup table built from the SAME cents array, so the two
    stay aligned by construction even when Lloyd leaves cells empty.
    argmin ‖sv − c‖² ≡ argmin (‖c‖² − 2·sv·c) with ‖c‖² precomputed per
    centroid — the row's own norm is constant across cells.
    """
    indexed = F.transform(cents, lambda c, i: F.struct(i.alias("pos"), c.alias("c")))
    init = F.struct(F.lit(-1).alias("pos"), F.lit(float("inf")).alias("d"))

    def step(acc: Column, e: Column) -> Column:
        d = e["c"]["n2"] - F.lit(2.0) * dot(sv, e["c"]["cvec"])
        better = (d < acc["d"]) | ((d == acc["d"]) & (e["pos"] < acc["pos"]))
        return F.when(better, F.struct(e["pos"].alias("pos"), d.alias("d"))).otherwise(acc)

    return F.aggregate(indexed, init, step)["pos"]


def _pq_collapse(rows: DataFrame) -> DataFrame:
    """(sub, pos, cvec) rows → 1-row `books` frame:
    array (by sub) of array of struct<pos, cvec, n2>."""
    return (
        rows.select(
            "sub",
            F.struct(
                F.col("pos"), F.col("cvec"), dot(F.col("cvec"), F.col("cvec")).alias("n2")
            ).alias("c"),
        )
        .groupBy("sub")
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cents"))).alias("bs"))
        .select(F.transform(F.col("bs"), lambda b: b["cents"]).alias("books"))
    )


def pq_codebook(emb: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """Per-subspace L2 k-means codebooks as one broadcastable row.

    Seeds = the first PQ_K vectors' sub-slices (same convention as
    ivf_codebook); Lloyd refinement runs on the deterministic
    1/TRAIN_MOD hash-sample, all PQ_M subspaces trained in ONE grouped
    pass (keys (sub, pos, dim) — the update exchange carries at most
    PQ_M×PQ_K×PQ_DSUB rows per partition, KBs at any corpus size).
    Checkpointed per iteration like the IVF codebook (lineage cut).
    """
    seed = emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("pos"),
        F.posexplode(_subvecs(F.col("embedding"))).alias("sub", "cvec"),
    )
    books = _pq_collapse(seed)
    train = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(TRAIN_MOD)) == 0).select(
        F.posexplode(_subvecs(F.col("embedding"))).alias("sub", "sv")
    )
    for _ in range(iters):
        assigned = train.crossJoin(F.broadcast(books)).select(
            "sub",
            "sv",
            _nearest_pos(F.col("sv"), F.element_at(F.col("books"), F.col("sub") + 1)).alias("pos"),
        )
        rows = (
            assigned.select("sub", "pos", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "pos", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub", "pos")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("sub", "pos", F.transform("dm", lambda s: s["m"]).alias("cvec"))
        )
        books = checkpoint_frame(_pq_collapse(rows), eager=False)
    return books


def pq_encode(emb: DataFrame, books: DataFrame) -> DataFrame:
    """(vec_id, enorm, codes): each vector compressed to PQ_M positional
    codes — the persisted form of a PQ index (PQ_M small ints + one
    double per vector; at 100 TB THIS is what ADC scans read, not the
    raw floats).

    The trailing repartition is a SHUFFLE BARRIER (same defense as
    winnow_hashes / minhash signatures): the ADC scan references `codes`
    once per query in the scoring fan-out, and without a materialization
    boundary CollapseProject inlines the whole PQ_M×PQ_K argmin encode
    into every query pair — a per-row cost multiplied by the query-batch
    size. The shuffled payload IS the compressed representation, exactly
    what an index build writes.
    """
    enc = emb.crossJoin(F.broadcast(books)).select(
        "vec_id",
        norm(F.col("embedding")).alias("enorm"),
        F.transform(
            _subvecs(F.col("embedding")),
            lambda sv, s: _nearest_pos(sv, F.element_at(F.col("books"), s + 1)),
        ).alias("codes"),
    )
    return enc.repartition(emb.sparkSession.sparkContext.defaultParallelism, "vec_id")


def _query_lut(vec: Column, books: Column) -> Column:
    """lut[sub][pos] = dot(vec_sub, centroid) over the SAME books array
    the codes index into — position-aligned by construction. Shared by
    the PQ and IVF-PQ query sides (a tuning change must hit both)."""
    return F.transform(
        _subvecs(vec),
        lambda sv, s: F.transform(F.element_at(books, s + 1), lambda c: dot(sv, c["cvec"])),
    )


def _adc(lut: Column, codes: Column) -> Column:
    """Asymmetric-distance score: Σ_sub lut[sub][codes[sub]] — PQ_M
    array lookups per (query, vector) pair, no vector math."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.element_at(lut, s + 1), F.element_at(codes, s + 1) + 1),
    )


def _topk_candidates(scored: DataFrame, cand: int) -> DataFrame:
    """Top `cand` (qid, vec_id) by approx_cos, vec_id tiebreak."""
    w = Window.partitionBy("qid").orderBy(F.desc("approx_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cand)
        .select("qid", "vec_id")
    )


def _exact_rerank(emb: DataFrame, cands: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a small candidate set against the raw
    vectors (broadcast both tiny sides) → top-K. Shared PQ/IVF-PQ tail:
    only ADC survivors pay full-precision math."""
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rer = (
        emb.join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    # ADC survivors are ≤ PQ_RERANK per query by construction.
    return topk_per_query(rer, pruned=True)



@register(
    "ann_pq_topk",
    None,  # codebook/code assignment is implementation-specific → rows-only;
    # quantitative guard = tools/check.py --recall vs the exact oracle.
    doc=(
        f"ANN via product quantization + ADC scan (faiss IndexPQ shape): "
        f"{PQ_M} subspaces × {PQ_K} L2-k-means centroids (4-bit codes, "
        f"32 bits/vector vs 2048 raw), corpus encoded once behind a "
        "shuffle barrier, queries build a per-subspace dot-product "
        "lookup table against the SAME broadcast codebook, and the scan "
        f"scores codes by {PQ_M} table lookups per pair (asymmetric "
        f"distance). Top-{PQ_CAND} ADC candidates per query get an "
        f"exact-cosine re-rank from the raw vectors → top-{TOP_K}. At "
        "100 TB the scan side reads ~32× fewer bytes than raw floats "
        "and composes with IVF cell pruning (IVF-PQ)."
    ),
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebook(emb)
    # spread (r15 optimization round): the PQ_M×PQ_K argmin encode runs
    # BEFORE its shuffle barrier, i.e. in the single-row-group scan's
    # one task (measured: a 0.9 s single-task stage); the codebook
    # training branch stays on the raw scan. No-op at scale.
    enc = pq_encode(spread(emb, "vec_id"), books)
    # N_QUERIES rows × PQ_M×PQ_K doubles: broadcasts.
    q = emb.filter(F.col("vec_id") < N_QUERIES).crossJoin(F.broadcast(books)).select(
        F.col("vec_id").alias("qid"),
        norm(F.col("embedding")).alias("qnorm"),
        _query_lut(F.col("embedding"), F.col("books")).alias("lut"),
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                _adc(F.col("lut"), F.col("codes"))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0))
            ).alias("approx_cos"),
        )
    )
    return _exact_rerank(emb, _topk_candidates(scored, PQ_CAND))


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" — public paper): k-means
# cluster the embedding space, call within-cluster pairs above a cosine
# threshold semantic duplicates, and keep the cluster member FARTHEST
# from its centroid (the paper's diversity-preserving survivor rule).
# The learned-cluster twin of embed_cosine_dedup's metadata blocking —
# it needs no label column, which is the realistic web-corpus case.
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = DEDUP_COS_TAU  # same fixture calibration as embed_cosine_dedup


def _nearest_cell_sim(vec: Column, cents: Column) -> Column:
    """(cell, sim) of the best unit-norm centroid — nearest_cell's fold,
    keeping the winning dot product (sim = ‖vec‖·cos_to_centroid)."""
    init = F.struct(F.lit(-1).cast("long").alias("cell"), F.lit(-1e300).alias("sim"))

    def step(acc: Column, c: Column) -> Column:
        s = dot(vec, c["cvec"])
        better = (s > acc["sim"]) | ((s == acc["sim"]) & (c["cell"] < acc["cell"]))
        return F.when(better, F.struct(c["cell"].alias("cell"), s.alias("sim"))).otherwise(acc)

    return F.aggregate(cents, init, step)


@register(
    "semdedup",
    None,  # k-means-cell-dependent → rows-only; the survivor rule is
    # exactness-tested on a constructed corpus in tests/test_skew_and_ann.py.
    doc=(
        "SemDeDup (Abbas et al. 2023): per-k-means-cell semantic-dup "
        f"audit. Vectors assigned to {N_CELLS} spherical-k-means cells "
        "by the zero-shuffle HOF argmin (ivf_codebook reused); within a "
        f"cell, pairs with cosine ≥ {SEMDEDUP_TAU} are semantic dups "
        "and the member FARTHEST from the centroid survives (the "
        "paper's diversity rule; vec_id tiebreak). Returns per-cell "
        "(n_vecs, n_dup_pruned, n_kept). Within-cell cost is cell² — "
        f"cells over {MAX_BLOCK} rows are excluded (same quadratic "
        "guard as embed_cosine_dedup); production scales N_CELLS with "
        "the corpus so cells stay bounded, which is also what keeps "
        "k-means assignment the only corpus-sized pass."
    ),
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_etl_order_book_spark.session import checkpoint_frame

    emb = load_table(spark, sf_dir, "embeddings")
    cents_arr = ivf_codebook(emb)
    # spread (r15 optimization round): the corpus-sized HOF argmin below
    # otherwise runs in the single-row-group scan's one task (measured:
    # a 0.5-0.6 s single-task checkpoint-materialization stage); the
    # codebook training branch stays on the raw scan. No-op at scale.
    scored = spread(emb, "vec_id").crossJoin(F.broadcast(cents_arr)).select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("enorm"),
        _nearest_cell_sim(F.col("embedding"), F.col("cents")).alias("best"),
    )
    # cos to own centroid: centroids are unit vectors, so best.sim is
    # ‖v‖·cos — one division, no second fold. Checkpointed (r9): FOUR
    # consumers (cell census, both pair sides, final inventory join)
    # otherwise each re-run the corpus-sized HOF-argmin assignment —
    # measured 4.0-4.5 s → 2.8-3.6 s at sf0.1 (the remainder is the
    # per-call codebook training, shared with every IVF query).
    assigned = checkpoint_frame(
        scored.select(
            "vec_id",
            "embedding",
            "enorm",
            F.col("best.cell").alias("cell"),
            (F.col("best.sim") / F.nullif(F.col("enorm"), F.lit(0.0))).alias("ccos"),
        )
    )
    # Quadratic guard: oversized cells are excluded from PAIRING only —
    # the inventory below still reports them (capped = true, zero
    # prunes) so Σ n_vecs always reconciles with the corpus. Dropping
    # the rows outright (the embed_cosine_dedup shape, whose output IS
    # pairs) would silently undercount here, where the output is a
    # per-cell census.
    big = (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > MAX_BLOCK)
        .select("cell")
    )
    # Explicit cell-keyed repartition before the pair self-join (r15
    # optimization round, guide §2.5): the join's shuffle carries KBs
    # (|corpus| rows of metadata), so AQE's byte-based coalescing
    # squeezes it to 1-2 tasks — but the join OUTPUT is quadratic per
    # cell (measured: a 2.2 s near-single-task pair-scoring stage at
    # sf0.1). An explicit REPARTITION_BY_COL is exempt from AQE
    # coalescing and is the exact distribution the join needs, so no
    # extra exchange appears; per-cell work still lands in one task
    # (the MAX_BLOCK cap bounds it), but distinct cells now score in
    # parallel. defaultParallelism scales with the cluster.
    pairable = assigned.join(F.broadcast(big), "cell", "left_anti").repartition(
        spark.sparkContext.defaultParallelism, "cell"
    )
    a = pairable.select(
        "cell",
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        F.col("enorm").alias("na"),
        F.col("ccos").alias("ca"),
    )
    b = pairable.select(
        "cell",
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        F.col("enorm").alias("nb"),
        F.col("ccos").alias("cb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    # a is PRUNED when some same-cell partner b is a semantic dup and b
    # sits farther from the centroid (loses the survivor rule to b);
    # vec_id breaks exact ccos ties deterministically.
    pruned = (
        a.join(b, "cell")
        .filter(F.col("a") != F.col("b"))
        .filter(cos >= SEMDEDUP_TAU)
        .filter(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("b") < F.col("a")))
        )
        .select("cell", F.col("a").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(pruned.select("vec_id", F.lit(1).alias("is_pruned")), "vec_id", "left")
        .join(F.broadcast(big.select("cell", F.lit(True).alias("capped"))), "cell", "left")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.coalesce(F.col("is_pruned"), F.lit(0))).cast("bigint").alias("n_dup_pruned"),
            F.coalesce(F.first("capped"), F.lit(False)).alias("capped"),
        )
        .select(
            "cell",
            "n_vecs",
            "n_dup_pruned",
            (F.col("n_vecs") - F.col("n_dup_pruned")).cast("bigint").alias("n_kept"),
            "capped",
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composition the two building blocks exist for (faiss
# IndexIVFPQ; Jégou et al. 2011 §IV) — IVF prunes WHICH cells a query
# scans, PQ compresses WHAT the scan reads, and the codes encode the
# RESIDUAL (vector − its cell centroid) so the quantizer spends its
# 32 bits on the within-cell remainder instead of re-describing the cell.
# At 100 TB this is the deployed shape: the index is the cell-partitioned
# residual-code table (write_ivf_index's layout, PQ_M bytes + a norm per
# vector), a query batch touches N_PROBE/N_CELLS of it and reads ~32×
# fewer bytes per touched row.
# ---------------------------------------------------------------------------

# ADC candidates re-ranked exactly per query. Same isotropic-fixture
# calibration story as PQ_CAND: measured recall@5 at CAND 100→200 was
# 0.78→0.92 (sf0.01) and 0.64→0.86 (sf0.1); the compounding of IVF's
# probed-mass cap and ADC ordering error is exactly why IndexIVFPQ
# deployments re-rank a generous candidate set from stored raw vectors.
IVFPQ_CAND = 200


def _cell_cvec(cents: Column, cell: Column) -> Column:
    """Centroid vector for a cell id out of the broadcast codebook array."""
    return F.element_at(F.filter(cents, lambda c: c["cell"] == cell), 1)["cvec"]


def ivfpq_residuals(emb: DataFrame, cents_arr: DataFrame) -> DataFrame:
    """(vec_id, cell, enorm, embedding=residual): each vector minus its
    cell centroid — the PQ training/encode input. vec_id rides along so
    pq_codebook's seed/sample conventions apply unchanged; enorm is the
    ORIGINAL norm (the cosine denominator downstream)."""
    assigned = ivf_assign(emb, cents_arr)
    return assigned.crossJoin(F.broadcast(cents_arr)).select(
        "vec_id",
        "cell",
        "enorm",
        F.zip_with(
            F.col("embedding"),
            _cell_cvec(F.col("cents"), F.col("cell")),
            lambda x, c: x.cast("double") - c,
        ).alias("embedding"),
    )


def ivf_residuals_arrow(emb: DataFrame, cent_rows: list) -> DataFrame:
    """(vec_id, cell, enorm, embedding=residual) — ivfpq_residuals'
    contract computed the LARGE-CODEBOOK way: Arrow-batched numpy
    matmul instead of the per-row HOF argmin fold.

    The HOF path above is the right shape for fixture codebooks
    (N_CELLS=16: O(C·D) interpreted per row is free, and the plan stays
    100% JVM — the registered queries keep it). Production sizes
    N_CELLS ~ √N with the corpus (DEPLOY.md §2) — thousands of cells —
    where an interpreted fold is O(hours) over a 2M-row encode and the
    industry form is a BLAS matmul: X @ C.T, argmax rows (faiss's
    IndexIVF assignment). This is that form: one mapInPandas pass
    (the sanctioned Arrow boundary, same as multimodal decode), numpy
    doing C·D work per row at matmul throughput. Semantics mirror
    nearest_cell to floating-point tolerance: argmax(dot) over unit
    centroids, ties → the LOWEST cell id (cent_rows are sorted by
    cell; np.argmax returns the first maximum). NOT guaranteed
    bit-identical: BLAS matmul sums in a different order than the
    sequential HOF fold, so a near-tie dot can flip the argmax between
    the two paths — harmless for ANN quality (the flipped vector is
    equidistant to both cells) and exactly the tolerance level the
    parity test asserts (tests/test_skew_and_ann.py).

    ``cent_rows`` is the codebook as driver-side [(cell, cvec), ...] —
    query-side state, C×D doubles (≈700 KB at 1414×64), the same object
    the HOF path ships as a broadcast 1-row frame. Reached from the
    registered IVF-PQ paths only above ARROW_CELLS_THRESHOLD via
    ivf_residuals_auto (the fixture's 16-cell codebook keeps the
    JVM-only plan; tests/test_plans.py gates that boundary); also
    driven directly by tools/measure_ann_cells.py for the √N-cell
    scale probe.
    """
    import numpy as np
    import pandas as pd

    rows = sorted(cent_rows, key=lambda r: int(r[0]))
    cells_np = np.array([int(c) for c, _ in rows], dtype=np.int64)
    cents_np = np.array([list(map(float, v)) for _, v in rows], dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue  # np.stack raises on an empty Arrow batch
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            idx = np.argmax(x @ cents_np.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": cells_np[idx],
                    "enorm": np.sqrt((x * x).sum(axis=1)),
                    "embedding": list(x - cents_np[idx]),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell long, enorm double, embedding array<double>"
    )


def ivf_residuals_auto(emb: DataFrame, cents_arr: DataFrame, cent_rows: list | None) -> DataFrame:
    """Residual-assignment dispatch for the IVF-PQ training paths (r13
    verdict item 2): the HOF fold (100% JVM plan, zero Python boundary)
    when ivf_codebook_state stayed on the fixture path (cent_rows is
    None), the Arrow matmul when it trained the large codebook. The two
    paths agree to floating-point tolerance (pinned at the switch
    boundary in tests/test_skew_and_ann.py); consumers are
    recall-floored, not hash-matched, by contract."""
    if cent_rows is None:
        return ivfpq_residuals(emb, cents_arr)
    return ivf_residuals_arrow(emb, cent_rows)


def ivfpq_encode(resid: DataFrame, books: DataFrame) -> DataFrame:
    """(vec_id, cell, enorm, codes): the IVF-PQ index rows — residual
    positional codes behind the same shuffle barrier as pq_encode."""
    enc = resid.crossJoin(F.broadcast(books)).select(
        "vec_id",
        "cell",
        "enorm",
        F.transform(
            _subvecs(F.col("embedding")),
            lambda sv, s: _nearest_pos(sv, F.element_at(F.col("books"), s + 1)),
        ).alias("codes"),
    )
    return enc.repartition(resid.sparkSession.sparkContext.defaultParallelism, "vec_id")


def write_ivfpq_index(emb: DataFrame, cents_arr: DataFrame, books: DataFrame, path: str) -> None:
    """Persist the IVF-PQ index: residual-code rows `partitionBy("cell")`
    — write_ivf_index's directory layout with PQ_M small ints + one
    norm per vector instead of the raw floats, so a probe read prunes
    at the directory level AND reads ~32× fewer bytes per surviving
    row. Same deliberately-STATIC overwrite (a rebuild replaces the
    whole path; dynamic mode would leave stale cell dirs when codebook
    drift empties a cell). The codebooks themselves are single-row
    frames the caller persists/broadcasts separately — they are the
    query-side state, not scan data."""
    (
        ivfpq_encode(ivfpq_residuals(emb, cents_arr), books)
        # Keyed on cell so each task writes whole cell directories —
        # see ivfpq_train: the unkeyed write sprays tasks×cells tiny
        # files, which tripled the probe wall at 2M vectors (per-file
        # open/footer overhead on every probed cell).
        .repartition(emb.sparkSession.sparkContext.defaultParallelism, "cell")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell")
        .parquet(path)
    )


@register(
    "ann_ivfpq_topk",
    None,  # codebooks/codes are implementation-specific → rows-only;
    # quantitative guard = tools/check.py --recall.
    doc=(
        f"ANN via IVF-PQ (faiss IndexIVFPQ shape): spherical-k-means "
        f"coarse quantizer routes each vector to a cell (zero-shuffle "
        f"HOF argmin, shared with ann_ivf_topk), PQ codebooks train on "
        f"the RESIDUALS (vector − centroid) and compress each vector to "
        f"{PQ_M * 4} bits; a query probes its {N_PROBE}/{N_CELLS} "
        "nearest cells and scores their codes as dot(q, centroid) + "
        "ADC(residual codes) — cell pruning and byte compression "
        f"compose. Top-{IVFPQ_CAND} candidates re-rank exact → "
        f"top-{TOP_K}."
    ),
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents_arr, cent_rows = ivf_codebook_state(emb)
    # Residuals staged once (r9): both consumers — PQ codebook training
    # (sampled collect) and the full encode pass — otherwise re-run the
    # corpus-sized argmin-assignment + centroid-subtract pipeline.
    # Measured 3.7-4.0 s → 3.0-3.2 s at sf0.1, results identical. At
    # index-build scale this is the materialized residual table
    # IndexIVFPQ training reads anyway.
    # spread (r15 optimization round): the argmin+subtract pipeline and
    # everything downstream of the checkpoint (encode, ADC scoring)
    # otherwise run in the single-row-group scan's one task; the
    # checkpointed RDD keeps the spread partitioning, so the encode and
    # query stages inherit the parallelism (no-op at scale).
    resid = checkpoint_frame(ivf_residuals_auto(spread(emb, "vec_id"), cents_arr, cent_rows))
    books = pq_codebook(resid)
    enc = ivfpq_encode(resid, books)
    return ivfpq_query(emb, cents_arr, books, enc)


def ivfpq_query(
    emb: DataFrame, cents_arr: DataFrame, books: DataFrame, enc: DataFrame
) -> DataFrame:
    """IVF-PQ query side, shared by the self-contained `ann_ivfpq_topk`
    (in-memory index frames) and the persisted-index `ann_ivfpq_apply`
    (frames read back from parquet): probe cells exactly like
    ann_ivf_topk, but keep the query-centroid dot (the coarse term of
    the score) per probe, and build ONE residual LUT per query against
    the same broadcast books. The probe→codes step is an equi-join on
    `cell`; when `enc` is the cell-partitioned on-disk index, Catalyst's
    dynamic partition pruning turns the broadcast probe side into a
    directory-level PartitionFilter on the scan (plan-asserted in
    tests/test_ann_lifecycle.py) — a query batch never reads the
    unprobed cells."""
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        norm(F.col("embedding")).alias("qnorm"),
    )
    by_sim = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (-dot(F.col("qvec"), c["cvec"])).alias("neg_sim"),
                c["cell"].alias("cell"),
            ),
        )
    )
    probes = (
        q.crossJoin(F.broadcast(cents_arr))
        .crossJoin(F.broadcast(books))
        .select(
            "qid",
            "qnorm",
            F.explode(F.slice(by_sim, 1, ivf_probe())).alias("probe"),
            _query_lut(F.col("qvec"), F.col("books")).alias("lut"),
        )
        .select(
            "qid",
            "qnorm",
            F.col("probe.cell").alias("cell"),
            (-F.col("probe.neg_sim")).alias("q_dot_cent"),
            "lut",
        )
    )
    scored = (
        enc.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                (F.col("q_dot_cent") + _adc(F.col("lut"), F.col("codes")))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0))
            ).alias("approx_cos"),
        )
    )
    return _exact_rerank(emb, _topk_candidates(scored, IVFPQ_CAND))


def ivfpq_train(emb: DataFrame, path: str) -> None:
    """Train the IVF-PQ state ONCE and persist all of it under `path`:

    - ``cents.parquet`` — the 1-row coarse-quantizer codebook frame
      (query-side state, broadcast at probe time),
    - ``books.parquet`` — the 1-row per-subspace PQ codebook frame
      (query-side state, broadcast at probe time),
    - ``index/`` — the residual-code rows ``partitionBy("cell")``
      (scan-side state: write_ivfpq_index's layout — PQ_M small ints +
      one norm per vector, directory per cell, static overwrite),
    Completion marking and atomicity live in artifacts.ensure_published
    (the caller): this function only writes the state tree under
    ``path``, which in the apply lifecycle is a scratch dir that is
    atomically renamed into place with the ``_TRAINED`` marker already
    inside — readers can never observe a half-built index, and
    concurrent first-touch builders resolve by rename (the loser
    discards its identical deterministic state). A cluster deployment
    still makes index builds an explicit, serialized pipeline step —
    rebuilds replace the whole path, as with write_ivf_index.

    This is the train-once/apply-many half the registry's
    self-contained-query contract couldn't show (DEPLOY.md §2): at
    100 TB the codebooks train on the hash-sample once, the corpus
    encodes once, and every query batch afterwards pays only the probe
    cost (`ann_ivfpq_apply`), never the two k-means trainings.

    Codebook size comes from ivf_cells() (SPARK_GRAFT_IVF_CELLS, else
    the N_CELLS fixture default); above ARROW_CELLS_THRESHOLD the
    training auto-selects the Arrow assignment path, which is what
    makes DEPLOY.md §2's √N sizing executable — registered training at
    the measured-optimal 1414 cells completes in minutes instead of
    the HOF fold's hours (r13 verdict item 2).
    """
    cents_arr, cent_rows = ivf_codebook_state(emb)
    resid = checkpoint_frame(ivf_residuals_auto(emb, cents_arr, cent_rows))
    books = pq_codebook(resid)
    cents_arr.write.mode("overwrite").parquet(f"{path}/cents.parquet")
    books.write.mode("overwrite").parquet(f"{path}/books.parquet")
    # One shuffle keyed on cell so each task writes whole cell
    # directories. Unconditional (r14): writing partitionBy("cell")
    # from vec_id-partitioned data sprays tasks×cells tiny files at
    # EVERY codebook size — measured at 2M vectors/16 cells, the
    # 512-file spray tripled the steady-state probe wall (19.9 s vs
    # 5.8 s against the cell-keyed 16-file layout) purely on per-file
    # open/footer overhead.
    enc = ivfpq_encode(resid, books).repartition(
        emb.sparkSession.sparkContext.defaultParallelism, "cell"
    )
    (
        enc.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell")
        .parquet(f"{path}/index")
    )


# Session-scoped serving-frame cache (r14 verdict item 3): the
# registered apply path re-ran `spark.read.parquet` on every call —
# re-listing the cell-partitioned index tree (one directory per cell:
# 1414 dirs at the measured-optimal √N geometry) and re-deriving the
# partition schema, which put the warm registered call at 4.0-4.8 s
# against the probe tool's 1.12 s holding frames across calls on the
# SAME index. A plain bounded LRU keyed by (session identity, path,
# marker identity), NOT a WeakKeyDictionary on the session: a cached
# DataFrame strongly references its SparkSession, so weak keying would
# never collect anything (value → key cycle, r15 review) while
# PRETENDING to be leak-free. The global bound is the real guarantee:
# at most _SERVE_CACHE_MAX entries process-wide, LRU-evicted, so
# stopped sessions' frames linger at worst until eviction. Marker
# identity = the _TRAINED file's CONTENT (a per-build uuid written by
# ensure_published) + (st_dev, st_ino): content changes on every
# in-place rebuild (crashed-build recovery recreates the marker; the
# cached frames' file listing would point at replaced part files) and
# survives warm-hit utime touches; the inode pair alone is reusable
# after a reap (r15 review).
_SERVE_CACHE_MAX = 4
_SERVE_CACHE: dict = {}


def _session_key(spark: SparkSession) -> str:
    """A stable, non-referencing identity for the session: DataFrames
    are session-bound, so frames cached under one session must never
    be served to another (same JVM, different SparkSession). The JVM
    sessionUUID is unique per session; fall back to id() if the
    private accessor moves."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:
        return f"id:{id(spark)}"


def _serving_frames(spark: SparkSession, path: str):
    """(cents, books, enc) DataFrames for a published IVF-PQ index at
    ``path``, cached — see _SERVE_CACHE. The marker read doubles as
    the existence check: a path reaped between ensure_published and
    here surfaces as FileNotFoundError, and the caller's contract
    (artifacts.reap_stale docstring) is to retry through
    ensure_published."""
    marker = os.path.join(path, "_TRAINED")
    st = os.stat(marker)
    with open(marker) as fh:
        build_id = fh.read(64)
    token = (_session_key(spark), path, build_id, st.st_dev, st.st_ino)
    hit = _SERVE_CACHE.pop(token, None)  # pop+reinsert = LRU bump
    if hit is None:
        hit = (
            spark.read.parquet(f"{path}/cents.parquet"),
            spark.read.parquet(f"{path}/books.parquet"),
            spark.read.parquet(f"{path}/index"),
        )
        while len(_SERVE_CACHE) >= _SERVE_CACHE_MAX:
            _SERVE_CACHE.pop(next(iter(_SERVE_CACHE)))
    _SERVE_CACHE[token] = hit
    return hit


def _ivfpq_index_path(sf_dir: str) -> str:
    """Deterministic per-corpus index location: real path PLUS a
    content fingerprint of the embeddings parquet folded into the key
    (artifacts.artifact_path), under a per-user 0700 cache root
    overridable via SPARK_GRAFT_INDEX_DIR (local paths only). Path
    collisions and in-place corpus regeneration both map to distinct
    keys — the two silent-wrong-answer routes
    tests/test_ann_lifecycle.py guards. The effective cell count rides
    in the kind prefix: a deployment that resizes
    SPARK_GRAFT_IVF_CELLS must retrain, never be served an index built
    at a different geometry (its probe side would slice N_PROBE of the
    WRONG codebook)."""
    return artifact_path(f"ivfpq_c{ivf_cells()}", sf_dir, "embeddings")


@register(
    "ann_ivfpq_apply",
    None,  # codebooks/codes are implementation-specific → rows-only;
    # quantitative guard = tools/check.py --recall (same 0.75 floor as
    # the self-contained ann_ivfpq_topk it shares its query side with).
    doc=(
        "IVF-PQ SERVING: the train-once/apply-many lifecycle of "
        "ann_ivfpq_topk (bpe_merges→bpe_encode shape). First call per "
        "corpus trains and persists the full index state (ivfpq_train: "
        "coarse + PQ codebooks as 1-row parquet frames, residual codes "
        "partitionBy('cell')); every later call — the steady state a "
        "deployment lives in — reads the codebooks back as broadcast "
        "frames and probes the on-disk index, paying only the probe "
        "cost, never the two k-means trainings. The probe equi-join on "
        "`cell` dynamic-partition-prunes the index scan to the probed "
        "directories (plan-asserted), then exact re-rank from the raw "
        "vectors as usual."
    ),
)
def q_ann_ivfpq_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Same guard as bpe_merges_cached: the persisted lifecycle is
    # local-FS only (content fingerprint stats the parquet tree), so a
    # corpus that isn't a real local path — remote URI sf_dir, tests
    # monkeypatching load_table — trains inline (the self-contained
    # ann_ivfpq_topk composition) instead of raising FileNotFoundError
    # out of corpus_fingerprint.
    if not os.path.exists(os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")):
        cents_arr, cent_rows = ivf_codebook_state(emb)
        resid = checkpoint_frame(ivf_residuals_auto(emb, cents_arr, cent_rows))
        books = pq_codebook(resid)
        return ivfpq_query(emb, cents_arr, books, ivfpq_encode(resid, books))
    from pyspark.errors import AnalysisException

    path = ensure_published(_ivfpq_index_path(sf_dir), lambda p: ivfpq_train(emb, p))
    try:
        cents_arr, books, enc = _serving_frames(spark, path)
    except (FileNotFoundError, AnalysisException):
        # Reaped in the ensure_published→read window (reap_stale's
        # documented residual race): the marker stat raises
        # FileNotFoundError, but the same race landing one step later
        # surfaces from spark.read.parquet as AnalysisException
        # (PATH_NOT_FOUND) — both mean "rebuild once and read fresh"
        # (r15 review).
        path = ensure_published(_ivfpq_index_path(sf_dir), lambda p: ivfpq_train(emb, p))
        cents_arr, books, enc = _serving_frames(spark, path)
    return ivfpq_query(emb, cents_arr, books, enc)


@register(
    "ann_filtered_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS evec
      FROM embeddings
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(q.qvec, e.evec), p -> p[1] * p[2]))
               / nullif(sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
                        * sqrt(list_sum(list_transform(e.evec, x -> x * x))), 0),
               6
             ) AS cos_sim
      FROM q JOIN e ON e.vec_id <> q.qid AND e.label <> q.qlabel
    ),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc=(
        "FILTERED vector search: top-k nearest neighbors restricted by "
        "a metadata predicate — here label <> query's label, i.e. the "
        "hard-negative-mining query of contrastive training (closest "
        "vectors that are NOT the query's class), and the general "
        "shape every vector store must serve (search within tenant / "
        "language / date range). The predicate composes into the scan "
        "as an ordinary Catalyst filter BEFORE scoring — pre-filtering, "
        "which keeps top-k exact, vs the post-filter-then-hope "
        "recall loss a bucketed index suffers when the filter is "
        "selective; at 100 TB the play is partitioning the index by "
        "the filter column (write_ivf_index's partitionBy pattern) so "
        "pre-filtering prunes files, not rows."
    ),
)
def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("enorm")
    )
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
        F.col("enorm").alias("qnorm"),
    )
    scored = (
        corpus.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("qlabel")),
        )
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qvec"), F.col("embedding"))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_query(scored)


# Pairwise-similarity census: sample modulus and histogram width.
HIST_SAMPLE_MOD = 4
HIST_BUCKETS = 20


@register(
    "pairwise_cosine_histogram",
    f"""
    WITH s AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % {HIST_SAMPLE_MOD} = 0
    ),
    scored AS (
      SELECT ROUND(
               list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
               / nullif(sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.v, x -> x * x))), 0),
               6) AS cos_sim
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    )
    SELECT LEAST(CAST(FLOOR((cos_sim + 1.0) * {HIST_BUCKETS} / 2.0) AS BIGINT),
                 {HIST_BUCKETS - 1}) AS bucket,
           COUNT(*) AS n_pairs,
           ROUND(MIN(cos_sim), 6) AS lo,
           ROUND(MAX(cos_sim), 6) AS hi
    FROM scored GROUP BY 1
    """,
    doc=(
        "Pairwise-cosine distribution over a deterministic corpus "
        "sample — the embedding-space health census (collapsed "
        "histogram = mode collapse / bad normalization; the standard "
        "pre-dedup diagnostic before choosing semdedup/embed_cosine "
        "thresholds). Sample by vec_id modulus keeps the quadratic "
        "pair count bounded and REPRODUCIBLE (no rand()): n/MOD "
        "vectors -> ~(n/MOD)^2/2 pairs; at 100 TB the modulus scales "
        "with corpus size to hold the pair budget constant. Pairs via "
        "broadcast self-join (a.vec_id < b.vec_id), dot/norm HOFs "
        "JVM-side, cosine ROUNDED 6 dp BEFORE bucketing so the "
        "floor-bucket edge cannot sit on a 1-ulp cross-engine "
        "difference (the cosine_topk discipline); bucket k covers "
        "[-1 + k/10, ...), cos=1.0 clamped into the top bucket."
    ),
)
def q_pairwise_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.filter(F.col("vec_id") % HIST_SAMPLE_MOD == 0).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    # spread ONLY the a branch (r15 optimization round): the
    # |sample|²/2 dot products run downstream of it, single-task on the
    # single-row-group fixture; the broadcast b branch stays on the raw
    # scan so the exchange is not duplicated (no-op at scale).
    a = spread(
        s.select(
            F.col("vec_id").alias("aid"),
            F.col("embedding").alias("av"),
            F.col("nrm").alias("an"),
        ),
        "aid",
    )
    b = s.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"), F.col("nrm").alias("bn"))
    cos = F.round(
        dot(F.col("av"), F.col("bv")) / F.nullif(F.col("an") * F.col("bn"), F.lit(0.0)), 6
    )
    scored = (
        a.join(F.broadcast(b), F.col("aid") < F.col("bid"))
        .select(cos.alias("cos_sim"))
    )
    bucket = F.least(
        F.floor((F.col("cos_sim") + 1.0) * HIST_BUCKETS / 2.0).cast("bigint"),
        F.lit(HIST_BUCKETS - 1),
    )
    return scored.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min("cos_sim"), 6).alias("lo"),
        F.round(F.max("cos_sim"), 6).alias("hi"),
    )


KNN_EVAL_K = 5
KNN_QUERY_MOD = 10  # every 10th vector plays the held-out query role
# Accuracy-sample size. The eval set is bounded ABSOLUTELY at this many
# queries, not as a corpus fraction: a fractional query set makes the
# scored-pair count quadratic in corpus size (measured 5.8x wall at 10x
# data before the cap), while a fixed sample keeps the eval cost linear
# and a 200-query binomial accuracy estimate carries a ±0.07 95% CI at
# worst — ample for the go/no-go this probe answers at any corpus size.
KNN_EVAL_SAMPLE = 200
KNN_QUERY_CAP = KNN_QUERY_MOD * KNN_EVAL_SAMPLE


@register(
    "knn_label_eval",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS true_label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0 AND vec_id < {KNN_QUERY_CAP}
    ),
    e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS evec
      FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} <> 0
    ),
    scored AS (
      SELECT q.qid, q.true_label, e.label,
             ROUND(
               list_sum(list_transform(list_zip(q.qvec, e.evec), p -> p[1] * p[2]))
               / nullif(sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
                        * sqrt(list_sum(list_transform(e.evec, x -> x * x))), 0),
               6) AS cos_sim,
             e.vec_id
      FROM q CROSS JOIN e
    ),
    topk AS (
      SELECT qid, true_label, label FROM (
        SELECT qid, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id ASC) AS rn
        FROM scored
      ) WHERE rn <= {KNN_EVAL_K}
    ),
    votes AS (
      SELECT qid, true_label, label, COUNT(*) AS v FROM topk
      GROUP BY qid, true_label, label
    ),
    pred AS (
      SELECT qid, true_label, label AS pred_label FROM (
        SELECT qid, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY v DESC, label ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT COUNT(*) AS n_queries,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred
    """,
    doc=(
        "k-NN label-consistency evaluation: hold out every "
        f"{KNN_QUERY_MOD}th vector, predict its label by majority vote "
        f"of its {KNN_EVAL_K} nearest corpus neighbors (cosine), and "
        "report accuracy — the standard embedding-quality probe "
        "(labels that k-NN can't recover from the geometry are labels "
        "the embedding doesn't encode; run before trusting semdedup / "
        "label-blocked dedup). Same broadcast-queries × corpus-scan "
        "shape as cosine_topk (cos rounded 6 dp before ranking, "
        "unique vec_id tiebreak); majority vote = a second ROW_NUMBER "
        "over the ≤k×|labels| vote table with a label tiebreak, so "
        "the prediction is deterministic under vote ties in both "
        "engines. Output is a 1-row census."
    ),
)
def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm"))
    q = base.filter(
        (F.col("vec_id") % KNN_QUERY_MOD == 0) & (F.col("vec_id") < KNN_QUERY_CAP)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qn"),
    )
    # spread ONLY the corpus side (r15 optimization round): the
    # |corpus|×|queries| dot products run downstream of this branch,
    # and on the single-row-group fixture the scan is one task. The
    # query branch stays on the raw scan so the exchange is not
    # duplicated under both consumers of `base` (no-op at scale).
    e = spread(base.filter(F.col("vec_id") % KNN_QUERY_MOD != 0), "vec_id")
    cos = F.round(
        dot(F.col("qvec"), F.col("embedding")) / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        6,
    )
    scored = e.join(F.broadcast(q)).select(
        "qid", "true_label", "label", cos.alias("cos_sim"), "vec_id"
    )
    # Same two-phase tail as every similarity variant: the scored set is
    # |corpus| × |queries| rows, so the single-window form would funnel
    # it into |queries| tasks (see topk_per_query).
    topk = topk_per_query(scored, k=KNN_EVAL_K)
    votes = topk.groupBy("qid", "true_label", "label").agg(F.count(F.lit(1)).alias("v"))
    wv = Window.partitionBy("qid").orderBy(F.desc("v"), F.asc("label"))
    pred = votes.withColumn("rn", F.row_number().over(wv)).filter(F.col("rn") == 1)
    correct = F.sum(F.when(F.col("label") == F.col("true_label"), 1).otherwise(0))
    return pred.agg(
        F.count(F.lit(1)).alias("n_queries"),
        correct.cast("bigint").alias("n_correct"),
        F.round(correct.cast("double") / F.count(F.lit(1)), 6).alias("accuracy"),
    )


@register(
    "embedding_drift",
    """
    WITH exploded AS (
      SELECT label, vec_id % 2 AS half,
             generate_subscripts(embedding, 1) AS dim,
             UNNEST(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val
      FROM embeddings
    ),
    means AS (
      SELECT label, half, dim,
             CAST(SUM(CAST(val AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
      FROM exploded GROUP BY label, half, dim
    ),
    paired AS (
      SELECT a.label, a.dim, a.m AS ma, b.m AS mb
      FROM means a JOIN means b
        ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
    ),
    comp AS (
      SELECT label,
             CAST(SUM(CAST(ma * mb AS DECIMAL(38,18))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(ma * ma AS DECIMAL(38,18))) AS DOUBLE) AS na,
             CAST(SUM(CAST(mb * mb AS DECIMAL(38,18))) AS DOUBLE) AS nb
      FROM paired GROUP BY label
    ),
    sizes AS (
      SELECT label,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM embeddings GROUP BY label
    )
    SELECT c.label, s.n_a, s.n_b,
           ROUND(c.dot / nullif(sqrt(c.na) * sqrt(c.nb), 0.0), 6) AS centroid_cos
    FROM comp c JOIN sizes s ON s.label = c.label
    """,
    doc=(
        "Embedding drift audit: per label, the cosine between the "
        "centroids of two corpus halves (vec_id parity = the "
        "deterministic stand-in for before/after an embedder upgrade "
        "or a crawl epoch) — centroid_cos near 1 means the class "
        "geometry is stable; a drop is the re-embed/re-index tripwire "
        "that invalidates IVF codebooks and semdedup thresholds. "
        "Scale shape: ONE posexplode to (label, half, dim) grain "
        "collapsing immediately into the per-dim mean aggregate "
        "(|labels| x 2 x dim rows — tiny regardless of corpus size), "
        "then a label-grain closed-form cosine over DECIMAL component "
        "sums; the half-centroid join is on the already-collapsed "
        "mean table. Per-dim means divide decimal-exact sums by "
        "exact counts, so both engines feed identical doubles into "
        "the cosine."
    ),
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "val"),
    ).select("label", "half", (F.col("dim0") + 1).alias("dim"), "val")
    # Cache the per-(label, half, dim) means (r15 optimization round):
    # the a/b halves fork this frame and Catalyst re-planned the
    # posexplode+aggregate subtree under each (executed plan: 0
    # ReusedExchange, two corpus explodes). .cache() (the simhash_dedup
    # pattern) materializes it inside the single action with no extra
    # serial job; the frame is |labels|×2×|dims| rows — KB-scale at any
    # corpus size.
    means = exploded.groupBy("label", "half", "dim").agg(
        (F.sum(F.col("val").cast("decimal(38,18)")).cast("double") / F.count(F.lit(1))).alias("m")
    ).cache()
    a = means.filter(F.col("half") == 0).select("label", "dim", F.col("m").alias("ma"))
    b = means.filter(F.col("half") == 1).select("label", "dim", F.col("m").alias("mb"))

    def dec(c):  # noqa: ANN001
        return F.sum(c.cast("decimal(38,18)")).cast("double")

    comp = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            dec(F.col("ma") * F.col("mb")).alias("dot"),
            dec(F.col("ma") * F.col("ma")).alias("na"),
            dec(F.col("mb") * F.col("mb")).alias("nb"),
        )
    )
    sizes = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    return comp.join(sizes, "label").select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("dot") / F.nullif(F.sqrt(F.col("na")) * F.sqrt(F.col("nb")), F.lit(0.0)), 6
        ).alias("centroid_cos"),
    )
