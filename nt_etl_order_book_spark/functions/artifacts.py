"""Persisted-artifact lifecycle for the train-once/apply-many paths.

The IVF-PQ serving index (`ann_ivfpq_apply`) and the BPE merge table
(`bpe_encode`'s warm path) share the same deployment shape: an
expensive deterministic training step whose output should be built
ONCE per corpus and read back by every later query batch. This module
owns the three pieces that make that shape trustworthy on a shared
box and honest about content drift:

1. **Content-keyed cache location** (`artifact_path`): the key folds a
   cheap fingerprint of the corpus parquet (relative file names +
   sizes + mtimes) into the digest alongside the real path. A corpus
   regenerated *in place* (same path, new bytes — e.g.
   tools/gen_scale_corpus.py rewriting a testdata dir) therefore maps
   to a NEW artifact dir and retrains, instead of silently serving an
   index whose vec_ids no longer match the corpus. Stale keys are just
   dead directories under the cache root, reapable by age.

2. **Private per-user root** (`artifact_root`): defaults to
   ``$TMPDIR/spark_graft_indexes_<uid>`` created with mode 0700 —
   never a shared world-writable path another user (or a leftover
   run) could pre-seed with a tampered index the apply path would
   trust blindly. ``SPARK_GRAFT_INDEX_DIR`` still overrides, but a
   value carrying a URI scheme (``hdfs://``, ``s3a://``) is rejected
   with an explicit error: this lifecycle is local-FS by design
   (os.rename atomicity, Python-side marker checks). A cluster
   deployment keys the same decision off a manifest table or the
   final write's own _SUCCESS and serializes builds as a pipeline
   step — see DEPLOY.md §2.

3. **Atomic publish** (`ensure_published`): builders write into a
   pid-suffixed scratch dir; the completion marker is written inside
   the scratch BEFORE one ``os.rename`` moves the whole tree into
   place. Readers can therefore never observe a half-built artifact —
   the published path either doesn't exist yet or is complete. A
   concurrent builder that loses the rename race sees the winner's
   marker and discards its own scratch (both trained the same
   deterministic state). The one remaining non-atomic window is
   replacing a CRASHED build (dir present, no marker): its rmtree is
   safe because no reader ever trusts an unmarked dir.

No reference analog: the 727-LoC ingest reference has no derived
artifacts at all; this is the serving half the Spark engine adds.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile

_MARKER = "_TRAINED"
_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def artifact_root() -> str:
    """The cache root: ``SPARK_GRAFT_INDEX_DIR`` if set (local paths
    only), else a per-user 0700 dir under the system temp dir."""
    root = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if root is None:
        uid = os.getuid() if hasattr(os, "getuid") else 0
        root = os.path.join(tempfile.gettempdir(), f"spark_graft_indexes_{uid}")
    elif _URI_SCHEME.match(root):
        raise ValueError(
            f"SPARK_GRAFT_INDEX_DIR={root!r}: the persisted-artifact "
            "lifecycle is local-FS only (os.rename atomic publish, "
            "Python-side marker checks). On a cluster, make index/"
            "tokenizer builds an explicit pipeline step keyed off a "
            "manifest table — see DEPLOY.md §2."
        )
    os.makedirs(root, mode=0o700, exist_ok=True)
    # exist_ok doesn't verify WHO owns a pre-existing dir: on a shared
    # box another user could have pre-created the default path and
    # would then own every "trusted" index under it. Refuse to serve
    # artifacts out of a root we don't own.
    if hasattr(os, "getuid") and os.stat(root).st_uid != os.getuid():
        raise PermissionError(
            f"artifact cache root {root!r} is owned by uid "
            f"{os.stat(root).st_uid}, not this process (uid "
            f"{os.getuid()}); refusing to trust foreign-owned indexes. "
            "Set SPARK_GRAFT_INDEX_DIR to a directory you own."
        )
    return root


def corpus_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a parquet file/dir: sha256 over the
    sorted (relpath, size, mtime_ns) listing. Never reads data bytes —
    O(file count) stat calls — yet catches any in-place regeneration
    (parquet writers always produce fresh mtimes and part names)."""
    h = hashlib.sha256()
    if not os.path.exists(path):
        # An empty fingerprint would alias every missing corpus onto one
        # cache key — the exact silent-collision class the key exists to
        # prevent. Callers gate warm paths on existence first.
        raise FileNotFoundError(f"corpus path does not exist: {path!r}")
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}\x00{st.st_size}\x00{st.st_mtime_ns}".encode())
        return h.hexdigest()
    for dirpath, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            rel = os.path.relpath(p, path)
            h.update(f"{rel}\x00{st.st_size}\x00{st.st_mtime_ns}\x00".encode())
    return h.hexdigest()


def artifact_path(kind: str, sf_dir: str, table: str) -> str:
    """Deterministic artifact dir for (kind, corpus): readable basename
    plus an 8-hex digest of the full real path AND the source table's
    content fingerprint. Path alone can collide after separator
    flattening (`/a/b_c` vs `/a/b/c`) and goes stale when the corpus
    is rewritten in place; the combined digest closes both
    silent-wrong-answer routes (tests/test_ann_lifecycle.py)."""
    real = os.path.realpath(sf_dir)
    fp = corpus_fingerprint(os.path.join(real, f"{table}.parquet"))
    digest = hashlib.sha256(f"{real}\x00{fp}".encode()).hexdigest()[:8]
    return os.path.join(artifact_root(), f"{kind}_{os.path.basename(real)}_{digest}")


def is_published(path: str) -> bool:
    return os.path.exists(os.path.join(path, _MARKER))


def ensure_published(final: str, build) -> str:
    """Return ``final`` with a complete artifact under it, building via
    ``build(scratch_dir)`` if needed. Publish is one atomic rename;
    losing a concurrent race discards the loser's scratch."""
    if is_published(final):
        return final
    scratch = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(scratch, ignore_errors=True)
    build(scratch)
    with open(os.path.join(scratch, _MARKER), "w") as fh:
        fh.write("ok\n")
    try:
        os.rename(scratch, final)
    except OSError:
        if is_published(final):
            # Concurrent builder won the rename; its artifact is the
            # same deterministic state — keep it, drop ours.
            shutil.rmtree(scratch, ignore_errors=True)
        else:
            # Crashed leftover (dir present, no marker): no reader
            # trusts an unmarked dir, so replacing it is safe.
            shutil.rmtree(final, ignore_errors=True)
            os.rename(scratch, final)
    return final
