#!/usr/bin/env python
"""Measure the N_CELLS ~ sqrt(N) IVF-PQ probe-flattening claim (r12
verdict item 3: every other scale claim carries a datum; this one was
"standard IVF practice" prose).

The r12 1000x apply probe held the fixture's N_CELLS=16, so probed
mass was N_PROBE/16 ~= 69% of the corpus and the probe wall grew
linearly with it (2 s -> 11-14 s per corpus decade). Production sizes
the cell count ~ sqrt(N) (DEPLOY.md S2), which shrinks the probed
fraction as the corpus grows. This tool builds the SAME on-disk IVF-PQ
index layout over the same 2M-vector corpus at several (n_cells,
n_probe) settings and records, per setting:

  - one-time train+persist wall through the REGISTERED path
    (ivfpq_train with SPARK_GRAFT_IVF_CELLS=n_cells; above
    ARROW_CELLS_THRESHOLD ivf_codebook_state auto-selects the Arrow
    numpy assignment -- the HOF argmin fold is O(C*D) interpreted per
    row, hours at 1414 cells; the Arrow matmul is the production form,
    see ivf_residuals_arrow's docstring),
  - steady-state probe wall, best-of-3 full-evaluation consumes,
  - EPSILON-recall@TOP_K against exact brute-force cosine ground truth
    (numpy-partial top-k, computed once per corpus): a returned id
    counts as a hit if its TRUE cosine >= the query's exact k-th-best
    cosine - 1e-3. Exact-id recall is ill-conditioned on this corpus
    BY CONSTRUCTION: each base vector has 999 perturbed copies whose
    cosines to the query differ in the 4th decimal, far below PQ
    quantization resolution, so "the" top-5 ids are an arbitrary pick
    among ~1000 equally-good answers (measured: exact-id recall ~0.12
    for ANY candidate set of the right cluster). Score-tolerance
    recall is the standard tie-heavy-corpus fix (BigANN-style) and is
    what a dedup/retrieval consumer actually needs — members of the
    right cluster, not one blessed id,
  - probed index fraction (n_probe / n_cells).

Corpus: tools/gen_scale_corpus.py --embeddings --copies 1000
/tmp/emb1000x (copy-major ids: codebook seeds = first n_cells vec_ids
are DISTINCT unperturbed base vectors; queries vec_id < N_QUERIES are
base vectors whose 999 perturbed copies form natural clusters).

Usage:
  SPARK_DRIVER_MEMORY=48g python tools/measure_ann_cells.py \
      [corpus_dir] [--configs 16:11,1414:11,1414:32]

Prints one JSON line per config plus a markdown table at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import nt_etl_order_book_spark.functions.similarity as sim
from nt_etl_order_book_spark.session import get_spark, tune_session
from nt_etl_order_book_spark.tables import load_table

WORK = "/tmp/ann_cells_probe"


def build_index(spark, emb, n_cells: int, path: str) -> float:
    """Train+persist through the REGISTERED path: ivfpq_train with
    SPARK_GRAFT_IVF_CELLS set — ivf_codebook_state auto-selects the
    Arrow assignment above ARROW_CELLS_THRESHOLD (r14: the probe now
    measures exactly what a deployment following DEPLOY.md §2 runs,
    not a tool-private fork of it; the former tool-local k-means moved
    into the package as sim.ivf_codebook_rows)."""
    t0 = time.time()
    old = os.environ.get("SPARK_GRAFT_IVF_CELLS")
    os.environ["SPARK_GRAFT_IVF_CELLS"] = str(n_cells)
    try:
        sim.ivfpq_train(emb, path)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_IVF_CELLS", None)
        else:
            os.environ["SPARK_GRAFT_IVF_CELLS"] = old
    return round(time.time() - t0, 1)


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def exact_topk(spark, emb) -> tuple[dict, dict]:
    """Ground truth: brute-force cosine top-TOP_K per query, numpy
    partial top-k per Arrow batch then a driver merge of the ~batches x
    queries x k candidate rows. Returns (top-id sets, epsilon floors):
    the floor is each query's exact k-th-best cosine - EPS, the
    score-tolerance hit threshold."""
    k = sim.TOP_K
    q_rows = (
        emb.filter(F.col("vec_id") < sim.N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in q_rows])
    qv = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    qv_n = qv / np.linalg.norm(qv, axis=1, keepdims=True)

    def part(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
            sims = xn @ qv_n.T  # (B, Q)
            vids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_c = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                mask = vids != qids[j]
                cand = np.where(mask)[0]
                take = cand[np.argsort(-col[cand])[: k + 4]]
                out_q.extend([qids[j]] * len(take))
                out_v.extend(vids[take])
                out_c.extend(col[take])
            yield pd.DataFrame({"qid": out_q, "vec_id": out_v, "cos": out_c})

    cand = emb.select("vec_id", "embedding").mapInPandas(
        part, "qid long, vec_id long, cos double"
    ).toPandas()
    truth, floors = {}, {}
    for qid, grp in cand.groupby("qid"):
        top = grp.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        truth[int(qid)] = set(int(v) for v in top["vec_id"])
        floors[int(qid)] = float(top["cos"].min()) - EPS
    return truth, floors


EPS = 1e-3  # score tolerance: a hit is any id within EPS of the k-th exact cosine


def recall_of(spark, emb, result_df, truth, floors) -> tuple[float, float]:
    """(epsilon_recall, exact_id_recall) of a probe result. Epsilon:
    re-scores the returned ids against the raw vectors exactly and
    counts those at-or-above the query's k-th-best-cosine - EPS."""
    got_rows = result_df.select("qid", "vec_id").collect()
    got = {}
    for r in got_rows:
        got.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    need = sorted({v for s in got.values() for v in s} | set(truth))
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin([int(x) for x in need])).select(
            "vec_id", "embedding"
        ).collect()
    }
    q_rows = (
        emb.filter(F.col("vec_id") < sim.N_QUERIES).select("vec_id", "embedding").collect()
    )
    qv = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in q_rows}
    eps_hits = id_hits = total = 0
    for q, t in truth.items():
        total += len(t)
        qn = qv[q] / np.linalg.norm(qv[q])
        for v in got.get(q, set()):
            x = vecs[v]
            c = float(qn @ (x / np.linalg.norm(x)))
            if c >= floors[q]:
                eps_hits += 1
        id_hits += len(got.get(q, set()) & t)
    return round(min(eps_hits, total) / total, 3), round(id_hits / total, 3)


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    corpus = argv[0] if argv else "/tmp/emb1000x"
    configs = "16:11,1414:11,1414:32"
    if "--configs" in sys.argv:
        configs = sys.argv[sys.argv.index("--configs") + 1]
    pairs = [tuple(int(x) for x in c.split(":")) for c in configs.split(",")]

    spark = tune_session(get_spark("ann-cells-probe", shuffle_partitions=32))
    emb = load_table(spark, corpus, "embeddings")
    n_corpus = emb.count()
    print(f"# corpus {corpus}: {n_corpus} vectors", file=sys.stderr)
    t0 = time.time()
    truth, floors = exact_topk(spark, emb)
    print(f"# exact ground truth in {time.time() - t0:.1f}s", file=sys.stderr)

    os.makedirs(WORK, exist_ok=True)
    results = []
    corpus_tag = f"{os.path.basename(corpus.rstrip('/'))}_{n_corpus}"
    for n_cells, n_probe in pairs:
        # Keyed by corpus AND cell count: a cached index from another
        # corpus served here would probe the wrong vec_ids entirely.
        path = os.path.join(WORK, f"ivfpq_{corpus_tag}_c{n_cells}")
        train_s = None
        if not os.path.exists(f"{path}/index/_SUCCESS"):
            shutil.rmtree(path, ignore_errors=True)
            train_s = build_index(spark, emb, n_cells, path)
            print(f"# c{n_cells}: trained+persisted in {train_s}s", file=sys.stderr)
        ca = spark.read.parquet(f"{path}/cents.parquet")
        books = spark.read.parquet(f"{path}/books.parquet")
        enc = spark.read.parquet(f"{path}/index")
        old_probe = sim.N_PROBE
        sim.N_PROBE = n_probe
        try:
            runs = []
            for _ in range(3):
                t0 = time.time()
                n = consume(sim.ivfpq_query(emb, ca, books, enc))
                runs.append(round(time.time() - t0, 2))
            rec, rec_id = recall_of(
                spark, emb, sim.ivfpq_query(emb, ca, books, enc), truth, floors
            )
        finally:
            sim.N_PROBE = old_probe
        # Release the dropped frames' localCheckpoint RDD blocks between
        # configs (same hygiene as bench.py): without it the 4th config
        # of a four-point session measured probe runs INCREASING
        # 7.1→13.0 s — driver-held lineage/blocks from three prior
        # builds squeezing the session, not the config under test.
        import gc

        gc.collect()
        spark.catalog.clearCache()
        rec_row = {
            "n_cells": n_cells,
            "n_probe": n_probe,
            "probed_fraction": round(n_probe / n_cells, 4),
            "train_s": train_s,
            "probe_runs_s": runs,
            "probe_best_s": min(runs),
            "recall_eps": rec,
            "recall_exact_id": rec_id,
            "rows_out": n,
            "corpus": n_corpus,
        }
        results.append(rec_row)
        print(json.dumps(rec_row))

    print(
        "\n| n_cells | n_probe | probed frac | train (1x) | probe best-of-3 "
        "| eps-recall@5 | exact-id recall |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['n_cells']} | {r['n_probe']} | {r['probed_fraction']:.2%} "
            f"| {r['train_s'] if r['train_s'] is not None else 'cached'} s "
            f"| {r['probe_best_s']} s | {r['recall_eps']} | {r['recall_exact_id']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
