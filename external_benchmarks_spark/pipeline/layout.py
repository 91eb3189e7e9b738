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
