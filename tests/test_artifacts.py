"""Pure-Python pins for the persisted-artifact lifecycle's race and
hygiene branches (functions/artifacts.py) — the paths the Spark-level
lifecycle tests (test_ann_lifecycle.py, test_bpe.py) can't force:
losing the publish race, replacing a crashed unmarked build, and the
foreign-owned-root refusal. No SparkSession needed."""

from __future__ import annotations

import os

import pytest

from nt_etl_order_book_spark.functions.artifacts import (
    artifact_root,
    corpus_fingerprint,
    ensure_published,
    is_published,
)


def _build(path: str, payload: str):
    os.makedirs(path)
    with open(os.path.join(path, "data.txt"), "w") as fh:
        fh.write(payload)


def test_publish_is_atomic_and_idempotent(tmp_path):
    final = str(tmp_path / "artifact")
    got = ensure_published(final, lambda p: _build(p, "v1"))
    assert got == final and is_published(final)
    assert open(os.path.join(final, "data.txt")).read() == "v1"
    # Second call: already published → build must NOT run.
    ensure_published(final, lambda p: (_ for _ in ()).throw(AssertionError("rebuilt")))


def test_losing_the_publish_race_discards_the_loser(tmp_path, monkeypatch):
    # Simulate: while our build runs, a concurrent builder publishes
    # the same final path first. Our os.rename fails; we must keep the
    # winner's (marked) artifact and remove our scratch.
    final = str(tmp_path / "artifact")

    def build_then_lose(scratch):
        _build(scratch, "loser")
        _build(final, "winner")
        with open(os.path.join(final, "_TRAINED"), "w") as fh:
            fh.write("ok\n")

    ensure_published(final, build_then_lose)
    assert open(os.path.join(final, "data.txt")).read() == "winner"
    assert not [d for d in os.listdir(tmp_path) if ".tmp." in d], "loser scratch left behind"


def test_crashed_unmarked_build_is_replaced(tmp_path):
    # A dir at final WITHOUT the marker is a crashed build: no reader
    # trusts it, and the next builder must replace it wholesale.
    final = str(tmp_path / "artifact")
    _build(final, "half-written")
    assert not is_published(final)
    ensure_published(final, lambda p: _build(p, "fresh"))
    assert is_published(final)
    assert open(os.path.join(final, "data.txt")).read() == "fresh"


def test_fingerprint_changes_on_rewrite_and_raises_on_missing(tmp_path):
    f = tmp_path / "corpus.parquet"
    f.write_text("aaa")
    fp1 = corpus_fingerprint(str(f))
    os.utime(f, ns=(1, 1))  # same bytes, different mtime → regenerated
    assert corpus_fingerprint(str(f)) != fp1
    with pytest.raises(FileNotFoundError):
        corpus_fingerprint(str(tmp_path / "nope.parquet"))


def test_artifact_root_refuses_foreign_owned_dir(tmp_path, monkeypatch):
    if not hasattr(os, "getuid"):
        pytest.skip("no uid semantics on this platform")
    root = tmp_path / "idx"
    root.mkdir()
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(root))
    real_stat = os.stat

    def foreign_stat(path, *a, **kw):
        st = real_stat(path, *a, **kw)
        if os.fspath(path) == str(root):
            class _St:
                st_uid = st.st_uid + 1
                st_mode = st.st_mode

            return _St()
        return st

    monkeypatch.setattr(os, "stat", foreign_stat)
    with pytest.raises(PermissionError, match="foreign-owned"):
        artifact_root()
