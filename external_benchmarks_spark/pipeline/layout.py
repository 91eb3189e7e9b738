"""Layout fingerprinting: build a derived on-disk layout ONCE per source
version, reuse it for every query.

A derived layout (bucketed join tables, the BM25 inverted index, an IVF
partitioning) amortizes a shuffle/index build across many queries — but
only if queries can PROVE the layout still matches the source and skip
the rebuild. The fingerprint is driver-side file metadata of the source
(relative path, size, mtime_ns for every file under each source path):
no Spark job, O(#files), and any rewrite of the source data changes it.
At 100 TB the same contract is carried by a table format's snapshot /
transaction id (Delta/Iceberg); file stat metadata is the plain-parquet
equivalent.

Usage:
    fp = source_fingerprint([src_dir])
    if not layout_is_current(layout_path, fp):
        <build layout into layout_path>
        record_layout(layout_path, fp)

``layout_is_current`` is False when the marker is missing, unreadable,
or disagrees — a partially-written layout (crashed build) never passes,
because the marker is written only after a completed build.
"""

from __future__ import annotations

import hashlib
import json
import os

_MARKER = "_layout_fingerprint.json"


def source_fingerprint(paths: list[str], extra: object = None) -> str:
    """Stable digest of the source files' (path, size, mtime_ns).

    ``extra`` folds layout parameters (bucket counts, schema version)
    into the fingerprint so a parameter change also triggers a rebuild.
    """
    entries = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.startswith(("_", ".")):
                        continue  # markers/checksums, not data
                    full = os.path.join(root, f)
                    st = os.stat(full)
                    entries.append(
                        (os.path.relpath(full, p), st.st_size, st.st_mtime_ns)
                    )
        elif os.path.exists(p):
            st = os.stat(p)
            entries.append((os.path.basename(p), st.st_size, st.st_mtime_ns))
        else:
            entries.append((p, -1, -1))
    payload = json.dumps({"files": entries, "extra": extra}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


def layout_is_current(layout_path: str, fingerprint: str) -> bool:
    marker = os.path.join(layout_path, _MARKER)
    try:
        with open(marker) as fh:
            return json.load(fh).get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def record_layout(layout_path: str, fingerprint: str) -> None:
    os.makedirs(layout_path, exist_ok=True)
    marker = os.path.join(layout_path, _MARKER)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"fingerprint": fingerprint}, fh)
    os.replace(tmp, marker)


def invalidate_layout(layout_path: str) -> None:
    """Drop the marker (e.g. after an in-place mutation of the layout
    that the fingerprint cannot see, like an incremental append that
    makes the layout CURRENT for a NEW source version — the appender
    re-records with the new fingerprint instead)."""
    try:
        os.remove(os.path.join(layout_path, _MARKER))
    except OSError:
        pass


# ---------------------------------------------------------------------------
# Writer liveness gate, shared by the journal-less orphan-deletion sites
# (recover_refresh, recover_append): a staging/pending dir with no journal
# is pure housekeeping to delete — UNLESS a live writer is mid-staging
# right now (its staging write plus pre-journal work can exceed any fixed
# mtime gate at 100 TB scale; deleting under it makes the writer's swap
# loop retire staged dirty cells as drained — permanent row loss). The
# writer claims a pid file before staging and releases it after the
# commit; recovery treats a claimed-and-alive writer as live regardless
# of orphan age. Cross-host claims (a real cluster's driver moved) can't
# be liveness-probed — they fall back to the age gate, which the claim's
# own mtime refreshes at claim time.
# ---------------------------------------------------------------------------

_WRITER_LOCK = "_writer.lock.json"


def claim_writer(root: str) -> None:
    import socket

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, _WRITER_LOCK)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"pid": os.getpid(), "host": socket.gethostname()}, fh)
    os.replace(tmp, path)


def release_writer(root: str) -> None:
    try:
        os.remove(os.path.join(root, _WRITER_LOCK))
    except OSError:
        pass


def writer_alive(root: str) -> bool:
    """True when a claim file names a process on THIS host that is still
    running. A dead-pid or unreadable claim returns False (the crash the
    journal-less branch exists to clean up); a foreign-host claim returns
    False too — the caller's age gate (refreshed by the claim write
    itself) is the cross-host fallback."""
    import socket

    path = os.path.join(root, _WRITER_LOCK)
    try:
        with open(path) as fh:
            j = json.load(fh)
        if j.get("host") != socket.gethostname():
            return False
        try:
            os.kill(int(j["pid"]), 0)
        except PermissionError:
            return True  # exists, other uid — still alive
        except (ProcessLookupError, ValueError, TypeError):
            return False
        return True
    except (OSError, ValueError, TypeError):
        return False


# ---------------------------------------------------------------------------
# The two-rename swap protocol, shared by every layout-maintenance site
# (partition compaction, store compaction, component-map compaction,
# centroid refresh, driver-side one-file publishes). One implementation
# so no swap site can ship without its recovery half again.
# ---------------------------------------------------------------------------


def recover_partition_swaps(root: str) -> bool:
    """Crash recovery for PER-PARTITION swaps inside ``root``: a
    ``.compacting.<dir>`` trash whose live partner vanished means the
    crash hit between the two renames — restore it; otherwise the new
    files landed and the trash drops. A ``.retiring.<dir>`` trash is a
    RETIREMENT in flight (all rows already published elsewhere) and is
    always deleted — restoring it would resurrect rows that live in
    other partitions now (the refresh drained-cell case). Idempotent;
    call before reading or rewriting a root that per-partition swaps
    maintain. Returns True when anything was restored or dropped (the
    caller should refresh any catalog file-index over ``root``)."""
    import shutil

    changed = False
    if not os.path.isdir(root):
        return changed
    for d in list(os.listdir(root)):
        if d.startswith(".retiring."):
            shutil.rmtree(os.path.join(root, d))
            changed = True
        elif d.startswith(".compacting."):
            live = os.path.join(root, d[len(".compacting."):])
            trash = os.path.join(root, d)
            if os.path.exists(live):
                shutil.rmtree(trash)
            else:
                os.rename(trash, live)
            changed = True
    return changed


def swap_partition_dir(root: str, name: str, staged: str | None) -> None:
    """Publish one partition dir: live -> .compacting.<name> trash,
    staged -> live, drop trash. ``staged=None`` retires the partition
    (all rows moved away) under the DISTINCT ``.retiring.<name>`` marker
    so a crash mid-retirement is never mistaken for a crashed swap and
    restored. Pair with :func:`recover_partition_swaps`."""
    import shutil

    live = os.path.join(root, name)
    mark = ".compacting." if staged is not None else ".retiring."
    trash = os.path.join(root, f"{mark}{name}")
    if os.path.isdir(live):
        os.rename(live, trash)
    if staged is not None and os.path.isdir(staged):
        os.rename(staged, live)
    shutil.rmtree(trash, ignore_errors=True)


def recover_dir_swap(path: str) -> bool:
    """Crash recovery for WHOLE-DIRECTORY swaps of ``path``: sibling
    ``<path>.trash`` / ``<path>.compacting`` restored when the live dir
    vanished, dropped when it survived. Idempotent; call before reading
    or rewriting an artifact that :func:`swap_dir` maintains. Returns
    True when anything was restored or dropped."""
    import shutil

    changed = False
    for suffix in (".trash", ".compacting"):
        t = path + suffix
        if os.path.isdir(t):
            if os.path.isdir(path):
                shutil.rmtree(t)
            else:
                os.rename(t, path)
            changed = True
    return changed


def swap_dir(path: str, staged: str) -> None:
    """Publish a whole directory: live -> <path>.trash, staged -> live,
    drop trash. Pair with :func:`recover_dir_swap`."""
    import shutil

    trash = path + ".trash"
    shutil.rmtree(trash, ignore_errors=True)
    if os.path.isdir(path):
        os.rename(path, trash)
    os.rename(staged, path)
    shutil.rmtree(trash, ignore_errors=True)


def publish_parquet_atomic(path: str, table) -> None:
    """Publish a tiny driver-resident pyarrow ``table`` as a one-file
    parquet DIRECTORY at ``path`` (tmp write + whole-dir swap). Spark
    jobs must never write driver-resident kilobytes — a 16-row
    LocalRelation with array columns costs ~6 s through the V1 writer
    (per-row Python->JVM conversion); pyarrow does it in ~5 ms with the
    identical read-back schema."""
    import shutil
    import uuid

    import pyarrow.parquet as pq

    recover_dir_swap(path)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(
        table, os.path.join(tmp, f"part-00000-{uuid.uuid4().hex}.parquet")
    )
    swap_dir(path, tmp)
