"""Near-real-time index replication — the ``replicator/nrt`` module
re-expressed over the parquet segment layout.

The reference's protocol (``replicator/nrt/PrimaryNode.java``,
``ReplicaNode.java``, ``CopyJob.java``, ``CopyState.java``): the
primary publishes a *copy state* — the point-in-time file set of a
commit — and replicas copy ONLY the files they are missing (segment
files are immutable, so presence == validity), activating the new
commit point last so a searcher never observes a half-copied index.

This engine's segment files are immutable parquet parts under the
index directory and the commit point is ``manifest.json`` (the
SegmentInfos analog: every logical table name resolves through
``<name>_path`` generation pointers).  Replication is therefore:

1. :func:`copy_state` — snapshot the primary's manifest + current
   file list (``CopyState``).
2. :func:`sync_replica` — copy files absent on the replica
   (``CopyJob.copyFile`` / ``CopyOneFile``), then write the manifest
   LAST (the commit-activation barrier, ``ReplicaNode.java:236-320``
   "turn on the new segments only after all files land").
3. :func:`cleanup_replica` — delete replica files no longer referenced
   by the active manifest (``ReplicaFileDeleter.java``).

A replica directory opened by ``IndexReader`` is indistinguishable
from the primary at the replicated generation; repeated syncs are
incremental (only new segment generations transfer).
"""

from __future__ import annotations

import json
import os
import shutil


def _walk_files(root: str) -> set[str]:
    out: set[str] = set()
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            rel = os.path.relpath(os.path.join(dirpath, f), root)
            out.add(rel)
    return out


def copy_state(primary_dir: str) -> dict:
    """Point-in-time copy state of the primary: the manifest contents
    plus the relative file list captured BEFORE any transfer begins
    (``CopyState.java`` carries SegmentInfos bytes + file metadata).
    Files that appear after this call belong to a later revision and
    are not part of this sync."""
    man_path = os.path.join(primary_dir, "manifest.json")
    with open(man_path) as fh:
        manifest = json.load(fh)
    files = _walk_files(primary_dir)
    files.discard("manifest.json")
    return {"manifest": manifest, "files": sorted(files)}


def sync_replica(primary_dir: str, replica_dir: str,
                 state: dict | None = None) -> dict:
    """One replication round: copy missing files, commit the manifest
    last.  Returns {'copied': n, 'skipped': n, 'generation': ...}.

    Immutability contract: a relative path that already exists on the
    replica is assumed identical (segment parts are never rewritten in
    place — compaction/merges write NEW generation directories), so a
    re-sync after a partial failure resumes instead of re-copying.
    """
    st = state if state is not None else copy_state(primary_dir)
    os.makedirs(replica_dir, exist_ok=True)
    have = _walk_files(replica_dir)
    copied = skipped = 0
    for rel in st["files"]:
        if rel in have:
            skipped += 1
            continue
        src = os.path.join(primary_dir, rel)
        dst = os.path.join(replica_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # copy to a temp name then rename: a concurrently-opened
        # reader can never see a torn file (CopyOneFile's .tmp dance)
        tmp = dst + ".copying"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1
    # activation barrier: the commit point lands only after every
    # referenced file is present
    man_tmp = os.path.join(replica_dir, "manifest.json.copying")
    with open(man_tmp, "w") as fh:
        json.dump(st["manifest"], fh)
    os.replace(man_tmp, os.path.join(replica_dir, "manifest.json"))
    return {"copied": copied, "skipped": skipped,
            "generation": st["manifest"].get("generation",
                                             st["manifest"].get(
                                                 "dv_generation", 0))}


def cleanup_replica(replica_dir: str) -> int:
    """Drop replica files not referenced by the ACTIVE manifest's
    generation pointers (``ReplicaFileDeleter``): any first-level
    directory that is a stale generation of a logical table (its
    ``<name>_path`` points elsewhere) is removed.  Returns the number
    of directories deleted."""
    man_path = os.path.join(replica_dir, "manifest.json")
    with open(man_path) as fh:
        manifest = json.load(fh)
    removed = 0
    for entry in os.listdir(replica_dir):
        full = os.path.join(replica_dir, entry)
        if not os.path.isdir(full):
            continue
        # generation dirs are "<table>" or "<table>_g<N>"; a dir is
        # stale when its table HAS a generation pointer that names a
        # different dir (tables without pointers are left alone)
        base = entry.split("_g")[0]
        target = manifest.get(f"{base}_path")
        if isinstance(target, str) and entry != target:
            shutil.rmtree(full)
            removed += 1
    return removed
