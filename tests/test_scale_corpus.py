"""The --tpch fact-volume generator's FK-exactness, pinned.

PERF.md's r10 volume table rests on the claim that the synthetic N×
corpus is FK-EXACT: every copied lineitem row still joins its copied
order (o_orderkey/l_orderkey = id*N+copy on BOTH sides), dims ride
through unchanged, so any revenue-style group answer scales by exactly
N. If a schema change or key-collision bug broke that, the probe would
silently measure a different (smaller) join — this pins the invariant
at sf0.001 so the probe's evidence stays trustworthy.
"""

from __future__ import annotations

import importlib.util
import os

from nt_etl_order_book_spark import registry

# Load the generator by file path rather than sys.path.insert(tools/):
# a session-long prepend would let generic tools/ module names shadow
# same-named imports in tests collected later.
_GEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "gen_scale_corpus.py",
)
_spec = importlib.util.spec_from_file_location("gen_scale_corpus", _GEN_PATH)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
gen_tpch = _mod.gen_tpch


def test_tpch_volume_corpus_scales_answers_exactly(spark, sf_dir, tmp_path):
    out = str(tmp_path / "tpch2x")
    gen_tpch(spark, sf_dir, out, n_copies=2)
    fn = registry.queries()["composite_regional_revenue"]
    base = {
        (r.region, r.nation): (r.n_orders, r.revenue)
        for r in fn(spark, sf_dir).collect()
    }
    big = {
        (r.region, r.nation): (r.n_orders, r.revenue)
        for r in fn(spark, out).collect()
    }
    assert base.keys() == big.keys()
    for k, (n, rev) in base.items():
        n2, rev2 = big[k]
        assert n2 == 2 * n, f"{k}: n_orders {n2} != 2x{n}"
        assert abs(rev2 - 2 * rev) <= 1e-6 * abs(rev2), f"{k}: revenue not exactly 2x"


gen_embeddings = _mod.gen_embeddings


def test_embeddings_corpus_copy_major_and_perturbed(spark, sf_dir, tmp_path):
    # The --embeddings ANN-scale regime (r13): copy 0 must be the
    # UNPERTURBED base corpus under copy-major ids (queries and
    # codebook seeds keep their meaning), later copies must differ
    # from their base by a small deterministic perturbation (clusters,
    # not exact dups), and labels must ride through.
    import math

    out = str(tmp_path / "emb3x")
    gen_embeddings(spark, sf_dir, out, n_copies=3)
    base = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    big = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(f"{out}/embeddings.parquet").collect()
    }
    n = len(base)
    assert len(big) == 3 * n
    for vid, (vec, lab) in base.items():
        # copy 0 bit-identical, same label
        assert big[vid] == (vec, lab)
        for copy in (1, 2):
            pvec, plab = big[copy * n + vid]
            assert plab == lab
            assert pvec != vec, "perturbed copy is an exact dup"
            dist = math.sqrt(sum((a - b) ** 2 for a, b in zip(pvec, vec)))
            # ±0.02/dim uniform → ‖noise‖ ≤ 0.02·√64 = 0.16 on unit vectors
            assert 0 < dist <= 0.17, f"perturbation {dist} outside design band"
    # determinism: a second run writes identical bytes-level content
    out2 = str(tmp_path / "emb3x_again")
    gen_embeddings(spark, sf_dir, out2, n_copies=3)
    again = {
        r.vec_id: (list(r.embedding), r.label)
        for r in spark.read.parquet(f"{out2}/embeddings.parquet").collect()
    }
    assert again == big
