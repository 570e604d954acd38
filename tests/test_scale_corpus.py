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
