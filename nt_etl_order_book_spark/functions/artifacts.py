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
   pid+uuid-suffixed scratch dir (two threads of one process never
   collide); the completion marker is written inside the scratch
   BEFORE one ``os.rename`` moves the whole tree into place. Readers
   can therefore never observe a half-built artifact — the published
   path either doesn't exist yet or is complete. A concurrent builder
   that loses the rename race sees the winner's marker and discards
   its own scratch (both trained the same deterministic state).
   Replacing a CRASHED build (dir present, no marker) runs as a
   bounded retry loop so two concurrent recoverers converge on one
   published artifact instead of the loser raising; the rmtree is
   safe because no reader ever trusts an unmarked dir. Stale keys are
   reaped by age via ``reap_stale`` (tools/reap_artifacts.py).

No reference analog: the 727-LoC ingest reference has no derived
artifacts at all; this is the serving half the Spark engine adds.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile
import time
import uuid

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


_FOOTER_BYTES = 4096


def _stat_and_tail(h, name: str, p: str) -> None:
    """Fold one file's (name, size, mtime_ns) AND its tail bytes into
    the running digest. The tail is the parquet FOOTER — row-group
    offsets, column statistics, created_by — which differs for any
    rewrite with different content, so a restore that preserves
    timestamps and happens to match sizes (cp -p, rsync -t, tar) still
    maps to a fresh cache key. Fixed-size read (≤4 KiB/file), so the
    fingerprint stays O(file count) cheap, never a data scan."""
    st = os.stat(p)
    h.update(f"{name}\x00{st.st_size}\x00{st.st_mtime_ns}\x00".encode())
    try:
        with open(p, "rb") as fh:
            fh.seek(max(0, st.st_size - _FOOTER_BYTES))
            h.update(fh.read(_FOOTER_BYTES))
    except OSError:
        pass  # unreadable tail → stat fields alone, as before


def corpus_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a parquet file/dir: sha256 over the
    sorted (relpath, size, mtime_ns) listing PLUS each file's last
    4 KiB (the parquet footer). O(file count) stats + one fixed-size
    tail read per file — never a data scan — yet catches in-place
    regeneration (fresh mtimes/part names) AND timestamp-preserving
    restores whose content differs but sizes collide (the footer's
    row-group stats differ)."""
    h = hashlib.sha256()
    if not os.path.exists(path):
        # An empty fingerprint would alias every missing corpus onto one
        # cache key — the exact silent-collision class the key exists to
        # prevent. Callers gate warm paths on existence first.
        raise FileNotFoundError(f"corpus path does not exist: {path!r}")
    if os.path.isfile(path):
        _stat_and_tail(h, os.path.basename(path), path)
        return h.hexdigest()
    for dirpath, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            _stat_and_tail(h, os.path.relpath(p, path), p)
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


def _touch_marker(path: str) -> None:
    """Refresh the marker mtime on a warm-path hit, so reap_stale's
    published-entry age means "hours since last USE", not "since
    build". Without this a still-current index for an unchanged corpus
    would be reaped at the age horizon even while readers that just
    resolved the path are mid-scan (r13 ADVICE). Best-effort: losing a
    race with the reaper just means this hit doesn't extend the
    lease — the next ensure_published call rebuilds."""
    try:
        os.utime(os.path.join(path, _MARKER))
    except OSError:
        pass


def ensure_published(final: str, build) -> str:
    """Return ``final`` with a complete artifact under it, building via
    ``build(scratch_dir)`` if needed. Publish is one atomic rename;
    losing a concurrent race discards the loser's scratch.

    The scratch path carries pid AND a uuid so two threads of one
    driver process building the same artifact never share (and never
    rmtree) each other's in-progress tree. Recovery from a CRASHED
    leftover (dir present, no marker) is a bounded retry loop: each
    failed rename re-checks whether a concurrent builder published a
    complete artifact in the window (keep theirs, drop ours) before
    clearing the unmarked dir and trying again — two concurrent
    recoverers converge instead of the loser raising ENOTEMPTY.

    Every warm return refreshes the marker mtime (``_touch_marker``) so
    the reap horizon counts from last use, not from build time."""
    if is_published(final):
        _touch_marker(final)
        return final
    scratch = f"{final}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    shutil.rmtree(scratch, ignore_errors=True)
    try:
        build(scratch)
        with open(os.path.join(scratch, _MARKER), "w") as fh:
            # A unique build id, not a constant: readers that cache
            # loaded state use the marker CONTENT as the build-identity
            # token (similarity._serving_frames). Inode numbers alone
            # are reusable — a reap-then-rebuild can hand the new
            # marker the freed inode and a content-free token would
            # serve stale cached file listings (r15 review). utime
            # touches (warm-hit lease refresh) change mtime but never
            # content, so the token is stable across warm hits and
            # distinct across rebuilds.
            fh.write(uuid.uuid4().hex + "\n")
        for attempt in range(8):
            try:
                os.rename(scratch, final)
                return final
            except OSError:
                if is_published(final):
                    # Concurrent builder won the rename; its artifact
                    # is the same deterministic state — keep it.
                    _touch_marker(final)
                    return final
                # Crashed leftover (dir present, no marker). We never
                # rmtree the LIVE slot: between the marker check above
                # and a delete, a concurrent builder could complete its
                # rename and we'd destroy a just-published artifact a
                # reader already resolved (r13 ADVICE TOCTOU). Instead,
                # atomically rename the dir ASIDE to a unique graveyard
                # path — if a winner occupied the slot in the window we
                # moved the WHOLE published tree, detect the marker in
                # the graveyard and move it straight back.
                grave = f"{final}.grave.{os.getpid()}.{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(final, grave)
                except OSError:
                    continue  # slot vanished/contended — loop re-checks
                if is_published(grave):
                    try:
                        os.rename(grave, final)
                        _touch_marker(final)
                        return final
                    except OSError:
                        # Another party filled the slot while the
                        # winner's tree sat in our graveyard. Only drop
                        # the grave if the slot now holds a PUBLISHED
                        # (equivalent, deterministic) artifact. If the
                        # occupant is UNMARKED (a third party parked
                        # another crashed leftover), deleting the grave
                        # here could destroy the only published copy
                        # and leave the exhaust-fallback rename to die
                        # on ENOTEMPTY (r14 ADVICE) — instead leave the
                        # grave parked and loop: our own scratch is an
                        # equivalent state still eligible to publish,
                        # and an abandoned published grave ages out via
                        # reap_stale's marker-mtime horizon.
                        if is_published(final):
                            shutil.rmtree(grave, ignore_errors=True)
                            _touch_marker(final)
                            return final
                        continue
                shutil.rmtree(grave, ignore_errors=True)
        # 8 straight lost races without a published winner appearing:
        # something is repeatedly parking unmarked state in the slot.
        os.rename(scratch, final)
        return final
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def reap_stale(
    max_age_hours: float = 72.0, root: str | None = None, dry_run: bool = False
) -> list[str]:
    """Delete stale entries under the artifact cache root and return
    the paths removed. Two classes are reaped (the "reapable by age"
    contract in the module docstring):

    - **Unmarked dirs** (crashed builds / orphaned ``*.tmp.*`` scratch)
      older than ``max_age_hours`` — age is the dir's own mtime, so an
      in-progress build (minutes old) always survives.
    - **Published dirs** whose ``_TRAINED`` marker mtime is older than
      ``max_age_hours``. The marker is touched on every warm-path hit
      (``_touch_marker``), so this age is "hours since last USE" — a
      still-current index an apply path keeps resolving never goes
      stale, while dead keys from rewritten corpora (which nothing
      resolves anymore) age out. Pass a very large value to reap only
      crashed scratch.

    ``dry_run=True`` runs the identical scan (including the
    vanished-mid-scan OSError guard) but skips the deletes — the one
    scan serves both the tool's ``--dry-run`` listing and the real
    reap, so the two can't drift.

    Best-effort: races with a concurrent builder are absorbed by
    ``ignore_errors`` (a builder that loses its dir mid-build retries
    through ensure_published's recovery loop on its next call)."""
    base = root if root is not None else artifact_root()
    cutoff = time.time() - max_age_hours * 3600.0
    reaped: list[str] = []
    try:
        entries = sorted(os.listdir(base))
    except FileNotFoundError:
        return reaped
    for name in entries:
        path = os.path.join(base, name)
        if not os.path.isdir(path):
            continue
        marker = os.path.join(path, _MARKER)
        try:
            stamp = os.stat(marker).st_mtime if os.path.exists(marker) else os.stat(path).st_mtime
        except OSError:
            continue  # vanished mid-scan (concurrent reaper/builder)
        if stamp < cutoff:
            # Re-stat the marker IMMEDIATELY before acting (r14
            # ADVICE): between the scan above and this point, a
            # warm-path hit may have refreshed the marker mtime
            # (_touch_marker) — deleting on the scan-time stamp would
            # reap an artifact a reader just resolved. The re-stat
            # shrinks the race window from scan→delete to stat→delete;
            # the residual window is covered by the reader-side
            # contract: apply paths that hit a missing-path error
            # mid-read retry through ensure_published, which rebuilds.
            # Runs in BOTH modes so the dry-run listing and the real
            # reap apply identical logic (the one-scan contract).
            try:
                fresh = (
                    os.stat(marker).st_mtime
                    if os.path.exists(marker)
                    else os.stat(path).st_mtime
                )
            except OSError:
                continue  # vanished since the scan — nothing to reap
            if fresh >= cutoff:
                continue  # touched since the scan — still in use
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
            reaped.append(path)
    return reaped
