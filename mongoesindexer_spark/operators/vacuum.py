"""Snapshot expiry + orphan-file removal — Iceberg ``expire_snapshots`` /
``remove_orphan_files`` analog for the ParquetCatalog index layout.

Why it must exist: every incremental sync overwrites ``term_dict`` /
``completion`` / ``global_stats`` (one new snapshot dir each), compaction
replaces the flat/segment/doc_stats generations, and crash recovery rolls
logs back past already-written dirs.  All superseded dirs stay on disk —
by design, so readers holding an older snapshot keep working — but nothing
ever reclaimed them; a year of hourly syncs would leak ~26k snapshot dirs
per overwritten table, and at 100 TB the dead compaction generations are
full corpus copies.  (The catalog/recovery docstrings have always said
"until vacuumed"; this is that vacuum.)

Safety contract:
* runs only driver-side filesystem metadata ops — no Spark job, no data
  read, so it's safe on the serving path between syncs;
* a pending sync intent journal is healed FIRST (the journal's rollback
  targets pre-batch snapshot ids whose dirs and log entries expiry would
  destroy — vacuuming across a crashed sync without recovery would turn a
  recoverable index into a corrupt one);
* the orphan sweep (dirs referenced by NO table log) is skipped while a
  build is in progress: a crashed build's resume consumes half-encoded,
  not-yet-registered segment files that lineage marks done per-partition;
* deletion is double-guarded: a dir is removed only if it lies UNDER the
  index root and no live snapshot dir equals it or lives inside it.

Single-writer assumption (same as the reference's cron loop): do not run
vacuum concurrently with a build/sync/compaction on the same index.
Readers in OTHER processes pinned to pre-vacuum snapshots must re-open
(get_engine does this automatically on its next call — the snapshot
version advanced); that is Iceberg's expire-snapshots contract too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..sources import fsio
from ..sources.catalog import ParquetCatalog


def _live_entries(log: list[dict]) -> list[dict]:
    """The entries a fresh reader would see (same fold as
    ParquetCatalog._live_dirs, minus since/as_of)."""
    live: list[dict] = []
    for e in log:
        if e["op"] == "overwrite":
            live = [e]
        else:
            live.append(e)
    return live


def _resolve(cat: ParquetCatalog, table: str, e: dict) -> str:
    if e.get("ext") or os.path.isabs(e["dir"]):
        return e["dir"]
    return os.path.join(cat.root, table, e["dir"])


def _build_in_progress(index_dir: str, filesystem=None) -> bool:
    """True when any lineage stage exists without its _COMPLETE marker —
    the signature of an interrupted build whose resume still needs
    unregistered on-disk artifacts."""
    root = os.path.join(index_dir, "_lineage")
    for stage in fsio.list_subdirs(root, filesystem):
        if not fsio.exists(os.path.join(root, stage, "_COMPLETE.json"),
                           filesystem):
            return True
    return False


def vacuum_index(spark: SparkSession, index_dir: str,
                 filesystem=None) -> dict:
    """Expire superseded snapshots of every catalog table under
    ``index_dir`` and delete their directories, plus any directory no
    table log references (crash leftovers from builds, syncs, rollbacks
    and compactions).  Returns removal counts."""
    cat = ParquetCatalog(index_dir, filesystem)

    # 1. heal a crashed sync before touching any history it may need
    recovered = False
    if fsio.exists(os.path.join(index_dir, "_sync_journal.json"),
                   filesystem):
        from ..streaming.incremental import IncrementalIndexer
        IncrementalIndexer(index_dir, filesystem=filesystem).recover(spark)
        recovered = True

    tables = cat.list_tables()
    dead_dirs: list[str] = []
    live_dirs: set[str] = set()
    for t in tables:
        log = cat._read_log(t)
        live = _live_entries(log)
        live_ids = {id(e) for e in live}
        for e in log:
            (live_dirs.add if id(e) in live_ids else
             dead_dirs.append)(_resolve(cat, t, e))
        if len(live) < len(log):
            cat._commit(t, live)

    # external entries are stored ABSOLUTE in the log (local mode), while
    # the caller may name the index relatively — resolve both sides the
    # same way or the containment check below rejects every ext dir.
    # Remote-filesystem paths are opaque strings: no abspath.
    def _norm(p: str) -> str:
        return os.path.normpath(
            p if filesystem is not None else os.path.abspath(p))

    root = _norm(index_dir)
    live_norm = {_norm(p) for p in live_dirs}

    def _deletable(path: str) -> bool:
        p = _norm(path)
        if p in live_norm or p == root:
            return False
        try:
            if os.path.commonpath([root, p]) != root:
                return False        # outside the index root — never touch
        except ValueError:          # different drives / mixed abs-rel
            return False
        # a live dir nested inside would die with its parent
        return not any(l.startswith(p + os.sep) for l in live_norm)

    removed: list[str] = []

    def _remove(path: str) -> None:
        if _deletable(path) and fsio.is_dir(path, filesystem):
            fsio.remove_dir(path, filesystem)
            removed.append(_norm(path))

    # 2. expired, formerly log-referenced dirs
    for p in dead_dirs:
        _remove(p)

    # 3. orphan sweep — dirs on disk that NO log references.  Skipped
    # while a build is mid-flight (its resume artifacts are unregistered
    # by design until the stage completes).
    orphans_skipped = _build_in_progress(index_dir, filesystem)
    if not orphans_skipped:
        for t in tables:
            tdir = os.path.join(root, t)
            for d in fsio.list_subdirs(tdir, filesystem):
                if d.startswith("snap-"):
                    _remove(os.path.join(tdir, d))
        # external generations: segment dirs and compaction generations
        # (register_external targets).  A generation dir with ANY live
        # child survives via the nested-live guard in _deletable.
        for sub in ("segments", "compacted"):
            base = os.path.join(root, sub)
            for d in fsio.list_subdirs(base, filesystem):
                _remove(os.path.join(base, d))

    return {"vacuumed": True, "removed_dirs": len(removed),
            "expired_snapshots": len(dead_dirs),
            "orphan_sweep": not orphans_skipped,
            "recovered_sync": recovered}
