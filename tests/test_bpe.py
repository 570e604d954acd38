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
    wc = Counter(w for t in texts for w in t.split(" ") if w != "")
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
