"""Manifest-pointer commits for small sidecar tables (VERDICT r15 #3).

The incremental stores (`cluster_store`, `text_index`) replace their
small sidecar tables (redirect overlay, df/stats) atomically on every
fold. Through r15 that used a tmp/aside/rename dance — correct on POSIX,
where `rename` is atomic, but the actual 100-TB substrate is an object
store where "rename" is copy+delete: non-atomic, and the crash-safety
story silently weakened to "hope the copy finished".

This module replaces directory renames with a MANIFEST POINTER:

- every commit writes a FRESH versioned directory ``<live>.v{N}``
  (object-store PUTs of new keys — no renames of data files, ever);
- the current version is named by a single small pointer file
  ``<live>.MANIFEST`` whose update is the commit point. Locally that is
  ``os.replace`` (atomic per POSIX); on an object store it is one small
  PUT, which every major store (S3, GCS, ABFS) applies atomically with
  read-after-write consistency. Either way there is no observable state
  in which a reader sees a half-replaced table;
- older versions are garbage-collected AFTER the pointer moves, keeping
  the immediately-previous version for in-flight readers (an object
  store's GET of an already-opened key keeps serving; a deleted POSIX
  dir keeps serving through open handles — the one-version grace covers
  the listing-to-open window).

Crash at ANY step leaves the store readable and the protocol
re-runnable (pinned step-by-step in tests/test_commits.py):

1. crash while writing ``<live>.v{N}``: pointer still names v{N-1};
   the orphan dir is clobbered by the next commit's overwrite.
2. crash after the dir write, before the pointer ``os.replace``: same —
   plus a stale ``.MANIFEST.__tmp__`` that the next commit overwrites.
3. the pointer update itself cannot be observed half-done (atomic
   replace / atomic PUT).
4. crash during GC: pointer already names v{N}; stale dirs are
   re-collected by the next commit.

Legacy layout: stores written before this protocol have a PLAIN
``<live>`` directory (and possibly the old ``.__old__`` aside from a
crashed rename-swap). ``current_version_dir`` adopts those in place —
the plain dir reads as the current version until the first
manifest-pointer commit supersedes it.

Single-writer contract (unchanged from the rename era): folds are
serialized by the caller; concurrent writers would race the version
numbering exactly as they raced the renames.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VER_RE = re.compile(r"\.v(\d+)$")


def _manifest(live: str) -> str:
    return live + ".MANIFEST"


def current_version_dir(live: str) -> str | None:
    """Path of the directory holding the current committed version of
    sidecar ``live``, or None when nothing was ever committed."""
    mf = _manifest(live)
    if os.path.exists(mf):
        with open(mf) as f:
            return f"{live}.{f.read().strip()}"
    # Legacy (pre-manifest) layouts: recover a crashed rename-swap, then
    # serve the plain directory as the current version.
    old = live + ".__old__"
    if os.path.exists(old) and not os.path.exists(live):
        os.rename(old, live)
    return live if os.path.exists(live) else None


def read_sidecar(spark: SparkSession, live: str) -> DataFrame:
    d = current_version_dir(live)
    if d is None:
        raise FileNotFoundError(f"no committed version of sidecar {live}")
    return spark.read.parquet(d)


def commit_sidecar(frame: DataFrame, live: str) -> None:
    """Commit ``frame`` as the new current version of sidecar ``live``
    (see module docstring for the protocol and its crash matrix)."""
    mf = _manifest(live)
    cur = None
    if os.path.exists(mf):
        with open(mf) as f:
            cur = f.read().strip()
    n = int(cur[1:]) if cur else 0
    new = f"v{n + 1}"
    target = f"{live}.{new}"
    # Step 1: fresh versioned dir (overwrite clobbers an orphan from a
    # commit that crashed between dir write and pointer update).
    frame.write.mode("overwrite").parquet(target)
    # Step 2: the commit point — atomic pointer replace (object-store
    # equivalent: one small PUT of the manifest key).
    tmp = mf + ".__tmp__"
    with open(tmp, "w") as f:
        f.write(new)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mf)
    # Step 3: GC — drop everything older than the immediately-previous
    # version (kept for in-flight readers), plus legacy swap debris.
    base_dir, base_name = os.path.split(live)
    keep = {f"{base_name}.{new}"}
    if n >= 1:
        keep.add(f"{base_name}.v{n}")
    try:
        entries = os.listdir(base_dir or ".")
    except OSError:
        entries = []
    for e in entries:
        full = os.path.join(base_dir, e)
        if e == base_name:
            # the pre-manifest plain dir: it was the previous version for
            # the FIRST manifest commit — keep it exactly then, collect
            # it one commit later
            if n > 0:
                shutil.rmtree(full, ignore_errors=True)
            continue
        if not e.startswith(base_name + "."):
            continue
        suffix = e[len(base_name):]
        if _VER_RE.fullmatch(suffix):
            if e not in keep:
                shutil.rmtree(full, ignore_errors=True)
        elif suffix in (".__old__", ".__tmp__"):
            shutil.rmtree(full, ignore_errors=True)  # rename-era debris
