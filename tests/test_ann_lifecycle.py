"""The IVF-PQ train-once/apply-many lifecycle (ann_ivfpq_apply), pinned.

DEPLOY.md §2's 100 TB serving shape is: train the codebooks once,
persist codebooks + cell-partitioned residual codes, and serve every
later query batch from the persisted state without retraining. These
tests pin the four claims that make that shape trustworthy:

1. the persisted-index query side returns the SAME top-k as the
   self-contained ann_ivfpq_topk (it is the same ivfpq_query over the
   same state, round-tripped through parquet);
2. the second call is a pure cache hit — nothing under the index path
   is rewritten;
3. a missing _TRAINED marker (crashed build) forces a retrain;
4. the probe's equi-join on `cell` dynamic-partition-prunes the on-disk
   index scan (the directory-level pruning the partitionBy layout
   exists for);
5. a corpus regenerated IN PLACE maps to a new content-keyed index dir
   and retrains (never serves the stale index);
6. the cache root is per-user 0700 by default and remote URI roots are
   rejected loudly (the lifecycle is local-FS by design).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_apply_matches_selfcontained_and_caches(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions.similarity import _ivfpq_index_path

    qs = registry.queries()
    want = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_topk"](spark, sf_dir).collect()}

    first = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    assert first == want

    path = _ivfpq_index_path(sf_dir)
    assert os.path.exists(os.path.join(path, "_TRAINED"))
    before = _mtimes(path)
    assert before  # cents + books + index files actually persisted

    # Second call: pure cache hit — same answer, zero DATA files
    # rewritten. The _TRAINED marker's mtime advances by design (r14:
    # warm hits refresh it so reap_stale's age means "since last use").
    second = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    assert second == first
    after = _mtimes(path)
    assert {k: v for k, v in after.items() if k != "_TRAINED"} == {
        k: v for k, v in before.items() if k != "_TRAINED"
    }
    assert after["_TRAINED"] >= before["_TRAINED"]

    # Crashed build (marker missing, data dirs present) must retrain:
    # the marker is written LAST, so its absence is the only signal a
    # build needs.
    os.remove(os.path.join(path, "_TRAINED"))
    third = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    assert third == want
    assert os.path.exists(os.path.join(path, "_TRAINED"))


def test_apply_index_cache_is_keyed_per_corpus(spark, sf_dir, tmp_path, monkeypatch):
    # The cache key is the corpus directory's real path. If that keying
    # broke, a second corpus would silently serve the FIRST corpus's
    # persisted index — returning vec_ids that may not even exist in
    # the corpus being queried. Pin: two corpora under the same index
    # root get distinct index dirs, and each corpus's apply answer
    # equals its own self-contained run.
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions.similarity import _ivfpq_index_path
    from nt_etl_order_book_spark.tables import load_table

    # Second corpus: the first 300 of sf0.001's 500 vectors — a strict
    # subset, so a cross-corpus index leak would surface vec_ids >= 300.
    sub_dir = str(tmp_path / "subset_corpus")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") < 300).write.parquet(f"{sub_dir}/embeddings.parquet")

    assert _ivfpq_index_path(sf_dir) != _ivfpq_index_path(sub_dir)

    qs = registry.queries()
    full = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    sub = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sub_dir).collect()}
    assert all(v < 300 for _q, v in sub)
    sub_want = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_topk"](spark, sub_dir).collect()}
    full_want = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_topk"](spark, sf_dir).collect()}
    assert sub == sub_want
    assert full == full_want
    # The two answers genuinely differ (the subset lost some true
    # neighbors), so the assertion above isn't vacuous.
    assert sub != full


def test_apply_retrains_on_inplace_corpus_regeneration(spark, sf_dir, tmp_path, monkeypatch):
    # Content drift: a corpus REGENERATED AT THE SAME PATH (e.g.
    # gen_scale_corpus rewriting a testdata dir) must map to a fresh
    # index key and retrain — serving the stale index would return
    # vec_ids that may not exist in the corpus anymore. The cache key
    # folds a (names, sizes, mtimes) fingerprint of the embeddings
    # parquet into the digest, so the rewrite changes the key.
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions.similarity import _ivfpq_index_path
    from nt_etl_order_book_spark.tables import load_table

    corpus = str(tmp_path / "drift_corpus")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.write.parquet(f"{corpus}/embeddings.parquet")

    qs = registry.queries()
    first = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, corpus).collect()}
    key_before = _ivfpq_index_path(corpus)

    # Rewrite in place with a strict subset: any stale-index leak
    # surfaces as vec_ids >= 300 in the new answer.
    emb.filter(F.col("vec_id") < 300).write.mode("overwrite").parquet(
        f"{corpus}/embeddings.parquet"
    )
    assert _ivfpq_index_path(corpus) != key_before
    second = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, corpus).collect()}
    assert all(v < 300 for _q, v in second)
    want = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_topk"](spark, corpus).collect()}
    assert second == want
    assert second != first


def test_artifact_root_rejects_remote_and_defaults_private(tmp_path, monkeypatch):
    import pytest

    from nt_etl_order_book_spark.functions.artifacts import artifact_root

    # Remote roots break the local-FS lifecycle (os.rename publish,
    # Python marker checks) — must fail loudly, not retrain forever.
    for bad in ("hdfs://nn:8020/idx", "s3a://bucket/idx"):
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", bad)
        with pytest.raises(ValueError, match="local-FS only"):
            artifact_root()

    # Unset → per-user dir under TMPDIR, created 0700 (not a shared
    # world-writable location another user could pre-seed).
    monkeypatch.delenv("SPARK_GRAFT_INDEX_DIR", raising=False)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    root = artifact_root()
    assert root.startswith(str(tmp_path))
    assert str(os.getuid()) in os.path.basename(root)
    assert (os.stat(root).st_mode & 0o777) == 0o700


def test_apply_probe_prunes_index_partitions(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    qs = registry.queries()
    df = qs["ann_ivfpq_apply"](spark, sf_dir)  # trains into tmp idx dir
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The cell-partitioned index scan must carry a dynamic pruning
    # expression in its PartitionFilters: the broadcast probe side
    # (qid × probed cell) decides at runtime which cell directories the
    # scan reads — N_PROBE/N_CELLS of the stored bytes, never the rest.
    # Match the index scan by its column signature (codes + cell) — the
    # Location path is unusable here because plan output truncates
    # metadata strings (spark.sql.maxMetadataStringLength=100) and
    # tmp_path is long. No other scan in this plan carries `codes`.
    idx_scans = [
        line
        for line in plan.splitlines()
        if "FileScan parquet" in line and "codes#" in line and "cell#" in line
    ]
    assert idx_scans, "on-disk index scan missing from the executed plan"
    assert any("dynamicpruning" in line for line in idx_scans), (
        "index scan is not dynamic-partition-pruned:\n" + "\n".join(idx_scans)
    )


def test_index_cache_is_keyed_by_cell_count(sf_dir, monkeypatch):
    # r14: SPARK_GRAFT_IVF_CELLS resizes the coarse quantizer. The
    # cache key must fold the effective cell count in — otherwise a
    # resized deployment is served an index built at the OLD geometry,
    # whose probe side would slice N_PROBE of the wrong codebook.
    from nt_etl_order_book_spark.functions.similarity import _ivfpq_index_path

    monkeypatch.delenv("SPARK_GRAFT_IVF_CELLS", raising=False)
    default_key = _ivfpq_index_path(sf_dir)
    assert "ivfpq_c16_" in os.path.basename(default_key)
    monkeypatch.setenv("SPARK_GRAFT_IVF_CELLS", "1414")
    assert _ivfpq_index_path(sf_dir) != default_key


def test_index_cell_dirs_hold_one_file_each(spark, sf_dir, tmp_path, monkeypatch):
    # Layout pin (r14): ivfpq_train keys the index write on cell, so a
    # cell directory is written by exactly one task → one data file.
    # The unkeyed write sprayed tasks×cells tiny files and tripled the
    # 2M-vector probe wall on per-file open/footer overhead (PERF.md
    # r14) — this pins the fix at fixture scale.
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions.similarity import _ivfpq_index_path

    qs = registry.queries()
    qs["ann_ivfpq_apply"](spark, sf_dir).collect()  # trains into tmp idx
    index = os.path.join(_ivfpq_index_path(sf_dir), "index")
    cell_dirs = [d for d in os.listdir(index) if d.startswith("cell=")]
    assert cell_dirs, "no cell directories written"
    for d in cell_dirs:
        parts = [f for f in os.listdir(os.path.join(index, d)) if f.endswith(".parquet")]
        assert len(parts) == 1, f"{d}: {len(parts)} files (spray regression)"


def test_apply_serving_cache_hits_and_invalidates_on_rebuild(spark, sf_dir, tmp_path, monkeypatch):
    # r14 verdict item 3: the registered serving path re-ran
    # spark.read.parquet per call (re-listing one directory per cell —
    # 1414 at the measured-optimal geometry), putting the warm call at
    # 4.0-4.8 s vs the probe tool's 1.12 s holding frames. The frames
    # are now cached per (session, path, marker identity). Pins: (1) a
    # repeat call returns the SAME frame objects, (2) warm marker
    # touches do NOT invalidate (mtime advances, inode doesn't), (3) an
    # in-place REBUILD (marker recreated → new inode) does invalidate —
    # the cached file listing would point at replaced part files —
    # and the post-rebuild answer still matches the self-contained run.
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions import similarity as sim
    from nt_etl_order_book_spark.functions.artifacts import _touch_marker

    qs = registry.queries()
    first = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    path = sim._ivfpq_index_path(sf_dir)

    f1 = sim._serving_frames(spark, path)
    assert sim._serving_frames(spark, path) is f1, "repeat call must be a cache hit"
    _touch_marker(path)  # warm-path lease refresh...
    assert sim._serving_frames(spark, path) is f1, "marker touch must not invalidate"

    # Crashed-marker rebuild: ensure_published replaces the whole tree
    # (new part files, new marker inode) — the cache must drop f1, not
    # serve a listing of deleted files.
    os.remove(os.path.join(path, "_TRAINED"))
    second = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    assert second == first
    assert sim._serving_frames(spark, path) is not f1, "rebuild must invalidate the cache"


def test_apply_retries_when_index_reaped_in_flight(spark, sf_dir, tmp_path, monkeypatch):
    # The reap_stale residual race, reader side (r15): reap_stale's
    # contract says an apply path that hits FileNotFoundError between
    # resolving the path and reading frames retries through
    # ensure_published. Force the race deterministically: first
    # _serving_frames call reaps the whole artifact dir then raises the
    # same error the stat would; the query must rebuild and answer
    # correctly, not propagate the error.
    import shutil

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    from nt_etl_order_book_spark.functions import similarity as sim

    qs = registry.queries()
    want = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_topk"](spark, sf_dir).collect()}

    real_frames = sim._serving_frames
    state = {"raced": False}

    def racing_frames(s, path):
        if not state["raced"]:
            state["raced"] = True
            shutil.rmtree(path, ignore_errors=True)  # the reaper wins
            raise FileNotFoundError(path)
        return real_frames(s, path)

    monkeypatch.setattr(sim, "_serving_frames", racing_frames)
    got = {(r.qid, r.vec_id) for r in qs["ann_ivfpq_apply"](spark, sf_dir).collect()}
    assert state["raced"], "race branch was not exercised"
    assert got == want
    path = sim._ivfpq_index_path(sf_dir)
    assert os.path.exists(os.path.join(path, "_TRAINED")), "index not rebuilt"


def test_serving_cache_globally_bounded_and_session_scoped(spark, tmp_path):
    # r15 review: the first cut keyed a WeakKeyDictionary by session,
    # but cached DataFrames strongly reference their session (value →
    # key cycle), so nothing was ever collected. The cache is now a
    # plain global LRU whose BOUND is the guarantee; pins: (1) the
    # cache never exceeds _SERVE_CACHE_MAX process-wide, (2) repeat
    # resolution is an identity hit, (3) a sibling session (shared
    # context, own session state) is never served another session's
    # frames — DataFrames are session-bound.
    import os as _os

    from nt_etl_order_book_spark.functions import similarity as sim

    sim._SERVE_CACHE.clear()
    df = spark.range(1)
    paths = []
    for i in range(sim._SERVE_CACHE_MAX + 2):
        p = str(tmp_path / f"idx{i}")
        df.write.parquet(f"{p}/cents.parquet")
        df.write.parquet(f"{p}/books.parquet")
        df.write.parquet(f"{p}/index")
        with open(_os.path.join(p, "_TRAINED"), "w") as fh:
            fh.write(f"build{i}\n")
        paths.append(p)
        sim._serving_frames(spark, p)
        assert len(sim._SERVE_CACHE) <= sim._SERVE_CACHE_MAX
    f_last = sim._serving_frames(spark, paths[-1])
    assert sim._serving_frames(spark, paths[-1]) is f_last
    sib = spark.newSession()
    assert sim._session_key(sib) != sim._session_key(spark)
    assert sim._serving_frames(sib, paths[-1]) is not f_last
    sim._SERVE_CACHE.clear()
