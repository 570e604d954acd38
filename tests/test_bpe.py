"""bpe_merges exactness: the distributed merge table must EQUAL a
pure-Python reference BPE (same greedy-merge and tiebreak rules) on the
fixture corpus — the rows-only contract's quantitative guard, same role
as the recall audit for the ANN ops."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.functions.bpe import EOW, N_BPE_MERGES


def _greedy_merge(syms: tuple[str, ...], l: str, r: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return tuple(out)


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, str, int]]:
    from nt_etl_order_book_spark.functions.bpe import BPE_MAX_WORD_CHARS

    wc = Counter(
        w for t in texts for w in t.split(" ") if w != "" and len(w) <= BPE_MAX_WORD_CHARS
    )
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in wc.items():
        vocab[tuple(list(w) + [EOW])] = vocab.get(tuple(list(w) + [EOW]), 0) + f
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        (l, r), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, l, r, l + r, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            m = _greedy_merge(syms, l, r)
            nxt[m] = nxt.get(m, 0) + f
        vocab = nxt
    return merges


def test_bpe_merge_table_matches_pure_python_reference(spark):
    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
    want = _ref_bpe(texts, N_BPE_MERGES)
    got = [
        (r.rank, r.l, r.r, r.merged, r.pair_count)
        for r in registry.all_specs()["bpe_merges"].fn(spark, sf).orderBy("rank").collect()
    ]
    assert got == want


def test_bpe_greedy_merge_overlap_semantics(spark):
    # 'aaa' under (a,a) must merge left-to-right non-overlapping:
    # ('aa', 'a') — the reference-BPE rule the fold encodes.
    from pyspark.sql import functions as F

    from nt_etl_order_book_spark.functions.bpe import _merge_pair

    df = spark.createDataFrame([(["a", "a", "a", EOW],)], "syms array<string>")
    out = df.select(
        _merge_pair(F.col("syms"), F.lit("a"), F.lit("a")).alias("m")
    ).first()
    assert out.m == ["aa", "a", EOW]
    out2 = df.select(
        _merge_pair(F.col("syms"), F.lit("x"), F.lit("y")).alias("m")
    ).first()
    assert out2.m == ["a", "a", "a", EOW]


def test_bpe_word_length_cap_bites(spark):
    # One un-spaced 10k-char blob (minified-JS / base64 shape) must be
    # EXCLUDED from training: the merge fold is O(len^2) per word per
    # round, so without the cap this one row owns a task for hours.
    # With it, training completes promptly and learns from the natural
    # words only.
    import time

    from nt_etl_order_book_spark.functions.bpe import bpe_train

    blob = "ab" * 5000
    rows = [(i, f"the cat sat {blob}" if i == 0 else "the cat sat on the mat")
            for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.time()
    merges = bpe_train(docs, n_merges=3).collect()
    assert time.time() - t0 < 60
    learned = {(m.l, m.r) for m in merges}
    # the blob's ('a','b') pair would dominate every count if admitted
    assert ("a", "b") not in learned


def test_bpe_train_stops_cleanly_when_pairs_run_out(spark):
    # Single-char words fully merge in two rounds ((a,</w>) and
    # (b,</w>)); the third round has NO pairs left. Training must stop
    # early with 2 rows instead of emptying the word table and padding
    # the merge table with ghost rounds.
    from nt_etl_order_book_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "b a b")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=5).orderBy("rank").collect()
    assert [(m.rank, m.merged) for m in merges] == [(1, f"a{EOW}"), (2, f"b{EOW}")]


def test_bpe_encode_matches_pure_python_apply(spark):
    # Train on a small constructed corpus, then verify the per-source
    # fertility against a pure-Python train+apply with the same greedy
    # rules (merge list applied in rank order to each word).
    texts = {
        "sA": ["low low lower lowest", "low lowest newer"],
        "sB": ["newer newest wider", "low low low"],
    }
    docs = spark.createDataFrame(
        [(i, t, src) for i, (src, ts) in enumerate(sorted(texts.items())) for t in ts],
        "doc_id long, text string, source string",
    ).selectExpr("doc_id * 10 + doc_id as doc_id", "text", "source")
    all_texts = [t for ts in texts.values() for t in ts]
    merges = _ref_bpe(all_texts, N_BPE_MERGES)

    def encode(word):
        syms = tuple(list(word) + [EOW])
        for _rank, l, r, _m, _c in merges:
            syms = _greedy_merge(syms, l, r)
        return len(syms)

    want = {}
    for src, ts in texts.items():
        words = [w for t in ts for w in t.split(" ") if w]
        want[src] = (len(words), sum(encode(w) for w in words))

    from nt_etl_order_book_spark.functions import bpe as bpemod

    orig = bpemod.load_table
    try:
        bpemod.load_table = lambda _s, _d, name: docs
        got = {
            r.source: (r.n_words, r.n_subwords, r.fertility)
            for r in registry.all_specs()["bpe_encode"].fn(spark, "_").collect()
        }
    finally:
        bpemod.load_table = orig
    for src, (nw, ns) in want.items():
        assert got[src][0] == nw
        assert got[src][1] == ns
        assert got[src][2] == round(ns / nw, 6)


def test_bpe_encode_warm_path_lifecycle(spark, sf_dir, tmp_path, monkeypatch):
    # bpe_encode's merge table rides the persisted-artifact lifecycle
    # (bpe_merges_cached, same template as the IVF-PQ serving index).
    # Pin the three claims: cold call trains + publishes, warm call is
    # a pure cache hit with the identical answer, and a crashed build
    # (marker missing) retrains.
    import os

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions.artifacts import artifact_path

    qs = registry.queries()
    key = lambda r: (r.source, r.n_words, r.n_subwords, r.fertility, r.n_long_words)
    cold = sorted(key(r) for r in qs["bpe_encode"](spark, sf_dir).collect())

    path = artifact_path("bpe", sf_dir, "documents")
    assert os.path.exists(os.path.join(path, "_TRAINED"))
    merges = pq.read_table(os.path.join(path, "merges.parquet")).to_pylist()
    assert len(merges) == N_BPE_MERGES

    def mtimes():
        return {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _dirs, files in os.walk(path)
            for f in files
        }

    before = mtimes()
    warm = sorted(key(r) for r in qs["bpe_encode"](spark, sf_dir).collect())
    assert warm == cold
    # Zero DATA files rewritten; the _TRAINED marker's mtime advances
    # by design (r14: warm hits refresh it so reap_stale's age means
    # "since last use", never reaping a live artifact mid-read).
    marker = os.path.join(path, "_TRAINED")
    after = mtimes()
    assert {k: v for k, v in after.items() if k != marker} == {
        k: v for k, v in before.items() if k != marker
    }
    assert after[marker] >= before[marker]

    os.remove(os.path.join(path, "_TRAINED"))
    retrained = sorted(key(r) for r in qs["bpe_encode"](spark, sf_dir).collect())
    assert retrained == cold
    assert os.path.exists(os.path.join(path, "_TRAINED"))
