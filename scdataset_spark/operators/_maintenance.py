"""Mutual exclusion between in-flight index deliveries and compaction.

Every persisted ingest index (the ANN/PQ index, the dedup band index,
the streaming unique gate's key index) has two writers: the
``foreachBatch`` delivery callback (append) and the compaction verb
(rewrite + swap).  Both are crash-safe *individually* — appends commit
via a last-written sidecar/marker, compaction keeps a ``__precompact``
backup until the rewrite is read back and verified — but nothing
enforced the documented "compaction MUST run quiescent" contract: a
compaction that starts AFTER a delivery's precompact check but BEFORE
its appends can rename the data out from under the in-flight append
(ADVICE r13).  This module is that enforcement: a lock DIRECTORY
(``mkdir`` is atomic on POSIX and object-store FUSE mounts) taken for
the duration of a delivery or a compaction, so the two verbs exclude
each other and concurrent deliveries from two streams exclude each
other.

Staleness: a crashed holder leaves the lock behind.  The lock records
its owner (host, pid, role); acquisition auto-reclaims a lock whose
owner process is dead ON THE SAME HOST (the local[*] / single-driver
posture this repo tests).  Across drivers on shared storage, pid
liveness is not observable — the error message tells the operator to
verify quiescence and delete the lock directory manually, which is the
same judgement call every file-based lease system bottoms out at.
"""

from __future__ import annotations

import os
import socket

LOCK_SUFFIX = "__maintenance_lock"  # SIBLING of the index dir: the
# band/gate compactions swap the index ROOT itself (rename path→backup,
# tmp→path), so a lock inside the index would ride along with the swap
# and leave the fresh root unlocked mid-compaction; a sibling survives
# every component- and root-level rename (same address scheme as the
# ``__precompact`` backups).


def _owner_path(lock: str) -> str:
    return os.path.join(lock, "owner")


def acquire_maintenance_lock(index_path: str, role: str) -> str | None:
    """Take the index's maintenance lock for ``role`` ("delivery" or
    "compaction").  Returns the lock path to pass to
    :func:`release_maintenance_lock` (in a ``finally``).  Raises
    RuntimeError if another delivery/compaction holds it and its owner
    cannot be proven dead."""
    if not os.path.isdir(index_path):
        # no index directory: let the caller raise its own (clearer)
        # missing-index error instead of a lock-acquisition failure
        return None
    import time

    lock = index_path.rstrip("/") + LOCK_SUFFIX
    for attempt in (0, 1):
        try:
            os.mkdir(lock)
            with open(_owner_path(lock), "w") as f:
                f.write(f"{socket.gethostname()}\n{os.getpid()}\n{role}\n")
            return lock
        except FileExistsError:
            host = pid = prev_role = None
            for read_try in (0, 1):
                try:
                    with open(_owner_path(lock)) as f:
                        host, raw_pid, prev_role = f.read().split("\n")[:3]
                    pid = int(raw_pid)
                    break
                except (OSError, ValueError):
                    # owner file momentarily absent/garbled: a holder may
                    # be BETWEEN its mkdir and its owner write (or a
                    # release between rename steps) — re-read once after
                    # a beat before treating it as unprovable
                    host = pid = prev_role = None
                    if read_try == 0:
                        time.sleep(0.2)
            if (
                attempt == 0
                and host == socket.gethostname()
                and pid is not None
            ):
                try:
                    os.kill(pid, 0)
                except ProcessLookupError:
                    # Same-host owner is dead: reclaim by RENAMING the
                    # stale lock aside — rename is atomic, so of N
                    # concurrent reclaimers exactly ONE succeeds and the
                    # rest fall through to the retry mkdir (a blind
                    # remove+rmdir here would let a second contender
                    # delete the first's freshly-acquired lock and both
                    # would "hold" it — the very race this module
                    # exists to prevent).
                    stale = f"{lock}.stale.{os.getpid()}"
                    try:
                        os.rename(lock, stale)
                    except OSError:
                        continue  # someone else reclaimed (or holder woke)
                    else:
                        # The rename is atomic but NOT conditional: a second
                        # contender can reclaim-and-reacquire between our
                        # liveness probe and our rename, so what we just
                        # renamed aside may be its fresh LIVE lock (ADVICE
                        # r14).  Verify the renamed dir still names the
                        # (host, pid) we proved dead before destroying it;
                        # anything else — a different owner, or an owner
                        # file not written yet — gets put back.
                        try:
                            with open(_owner_path(stale)) as f:
                                s_host, s_pid = f.read().split("\n")[:2]
                            proven = s_host == host and int(s_pid) == pid
                        except (OSError, ValueError):
                            proven = False  # mid-acquisition: not provably stale
                        if proven:
                            import shutil

                            shutil.rmtree(stale, ignore_errors=True)
                            continue
                        try:
                            os.rename(stale, lock)  # restore the live lock
                        except OSError:
                            raise RuntimeError(
                                f"lost a reclaim race on {lock}: a live lock "
                                f"was renamed aside to {stale} and the lock "
                                "path was re-taken before it could be "
                                "restored.  Verify nothing is writing this "
                                "index, then delete both directories."
                            ) from None
                        # restored: fall through to attempt 1, which will
                        # re-read the (live) owner and raise the standard
                        # in-flight-holder error or acquire after release
                        continue
                except PermissionError:
                    pass  # alive but not ours
            raise RuntimeError(
                f"index at {index_path} has an in-flight "
                f"{prev_role or 'delivery/compaction'} "
                f"(lock {lock}, owner {host} pid {pid}); a {role} must not "
                "run concurrently.  If the owner crashed on another host, "
                "verify nothing is writing this index and delete the lock "
                "directory."
            )
    raise AssertionError("unreachable")


def namespaced_batch_tag(run_id: str | None, batch_id) -> int:
    """The stored batch tag shared by every replay-guarded ingest index
    (band index, ANN ``_ingested_ids`` sidecar): Spark batch ids are
    only unique within one checkpoint lineage, so an optional ``run_id``
    (the streaming query's stable id, or the checkpoint path) is folded
    into the tag — ``(crc32(run_id) & 0x7fffffff) << 32 | batch_id`` —
    making "same tag" mean "a true replay of the same delivery in the
    same lineage".  ``run_id=None`` keeps the legacy raw-batch-id
    semantics.  ONE definition on purpose: the tag format is an on-disk
    contract, and two drifting copies would silently mis-read each
    other's sidecars."""
    if run_id is None:
        return int(batch_id)
    import zlib

    ns = zlib.crc32(str(run_id).encode()) & 0x7FFFFFFF
    return (ns << 32) | (int(batch_id) & 0xFFFFFFFF)


def warn_if_legacy_tag_collision(index_df, raw_tag: int, index_desc: str) -> None:
    """One-shot hazard warning for the ``run_id=None`` ingest default
    (ADVICE r14): with raw batch tags, the own-batch replay exclusion
    cannot tell a TRUE replay (same checkpoint lineage re-delivering
    batch N) from a NEW lineage whose batch N collides with a previous
    run's — in the second case the previous run's batch-N novels are
    wrongly excluded from the novelty screen and their near-duplicates
    are waved through.  Call sites invoke this once per callback
    instance (first delivery only — the hazard manifests at the low
    batch ids a fresh checkpoint restarts from) when ``run_id`` is
    None; the probe is a LIMIT-1 existence check on the already-pruned
    index frame.  A warning here is ambiguous BY CONSTRUCTION (a same-
    lineage replay also matches); passing ``run_id`` is what removes
    the ambiguity, which is exactly what the message says."""
    from pyspark.sql import functions as F

    if index_df.where(F.col("batch_id") == int(raw_tag)).limit(1).count():
        import warnings

        warnings.warn(
            f"{index_desc} already contains rows tagged batch_id="
            f"{int(raw_tag)} while run_id=None: if this stream is a NEW "
            "checkpoint lineage (fresh checkpoint dir), those rows are a "
            "PREVIOUS run's appends and are being wrongly excluded from "
            "the novelty screen — their near-duplicates will pass as "
            "novel.  Pass run_id (the streaming query's stable id or the "
            "checkpoint path) to namespace batch tags per lineage.  If "
            "this is a replay within the same lineage, the exclusion is "
            "correct and this warning is benign.",
            stacklevel=3,
        )


def check_batch_tag_dtype(df, index_desc: str, compact_hint: str) -> None:
    """Refuse to append next to a pre-r14 index whose stored
    ``batch_id`` is still INT32 (ADVICE r14).  The documented migration
    is "compact once before resuming ingest" — but nothing ENFORCED it:
    an append would write BIGINT files next to the INT32 ones, and the
    mixed directory only fails at the NEXT read (probe or compaction),
    by which point the "compact once" escape hatch itself reads the
    mixed types and may fail too.  Called with the index/sidecar frame
    at probe time, BEFORE any append, so the failure arrives while the
    directory is still uniformly typed and the hint still works."""
    from pyspark.sql.types import LongType

    dt = df.schema["batch_id"].dataType
    if not isinstance(dt, LongType):
        raise RuntimeError(
            f"{index_desc} stores batch_id as {dt.simpleString()} "
            "(written by a pre-r14 build); appending would mix it with "
            "BIGINT files in one directory, which parquet refuses at the "
            f"next read.  Run {compact_hint} once first — the rewrite "
            "normalizes the column to BIGINT."
        )


def index_file_stats(component_path: str) -> tuple[int, int, float]:
    """(data_files, partition_dirs, files_per_dir) for one persisted
    index component — the compaction-decision signal shared by all
    three ingest indexes (unique gate: ``{index_dir}/{col}``, band
    index: its root, ANN/PQ: ``{path}/cells``).  Every streaming
    delivery appends ~one file per bucket/cell-group it touches, so
    files_per_dir ≈ deliveries since the last compaction, and the
    measured cost of letting it grow is file-LISTING time at probe
    start: the sf1000e decade row (BENCH_SCALE.md r13) shows a ~7x
    file multiplication driving a 73.8 → 13.0 s listing-cold probe
    (5.7x), recovered by a compaction costing about one build's
    writes.  Pure filesystem walk — no Spark job, so the decide loop
    can run on a scheduler tick."""
    import os

    # no lock/backup filtering needed: the lock dir and the
    # __precompact/__compacting dirs are all SIBLINGS of the walk
    # roots (gate {index_dir}/{col}, band root, ANN {path}/cells),
    # never inside them
    n_files = 0
    dirs = set()
    for root, _dnames, fnames in os.walk(component_path):
        for f in fnames:
            if f.endswith(".parquet"):
                n_files += 1
                dirs.add(root)
    n_dirs = max(1, len(dirs))
    return n_files, n_dirs, n_files / n_dirs


def compaction_due(component_path: str, files_per_dir_threshold: float = 8.0) -> bool:
    """The documented WHEN-to-compact decision for the persisted ingest
    indexes: compact once the mean data-file count per partition
    directory passes ``files_per_dir_threshold``.  Default 8 — the
    measured sf1000e row (BENCH_SCALE.md r13) hit its 5.7x listing-cold
    probe penalty at ~7x file multiplication, so 8 compacts right as
    the penalty becomes measurable while keeping compaction frequency
    ~1 per 8 deliveries (compaction cost ≈ one build's write volume).
    Deployments with slower object-store listings should lower it; the
    gate-index sf100d audit (r13) showed key-sorted compacted buckets
    also tighten row-group pruning, so compaction is never a pure
    listing play."""
    return index_file_stats(component_path)[2] > files_per_dir_threshold


def release_maintenance_lock(lock: str | None) -> None:
    if lock is None:
        return
    # rename-aside then delete: the lock DISAPPEARS atomically, so a
    # concurrent acquirer never observes a half-released lock (an
    # owner-less dir would read as "unprovable owner" and fail a live
    # streaming delivery with a spurious RuntimeError)
    import shutil

    gone = f"{lock}.released.{os.getpid()}"
    try:
        os.rename(lock, gone)
    except OSError:
        return  # already reclaimed/released
    shutil.rmtree(gone, ignore_errors=True)
