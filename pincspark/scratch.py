"""Pid-keyed /tmp scratch directories with safe dead-owner sweeping.

The correctness driver, bench.py, and ad-hoc sessions can run the same
query CONCURRENTLY in different processes, and a returned DataFrame reads
its scratch dir LAZILY — a shared path lets one process rmtree/rename it
between another's plan build and collection (the r9 q87 defect class).
Keying the dir by pid isolates processes; this helper also sweeps
leftovers from DEAD pids so /tmp never accumulates copies, while touching
ONLY entries that match the caller's own ``<base>-<digits>`` naming
scheme (ADVICE r10 #4: a sweep that removed any unrecognized name under a
shared root would delete a concurrent process's differently-named
directory). A recycled pid keeps its directory one round longer; the
caller's own pre-clean (this function removes the CURRENT pid's leftovers
too) handles it.
"""

from __future__ import annotations

import os
import re
import shutil


def pid_scratch(root: str, base: str, suffixes: tuple[str, ...] = ()) -> str:
    """Return a fresh ``{root}/{base}-{pid}`` scratch path: sweeps dead-pid
    siblings matching the naming scheme (plus crash-residue ``suffixes``,
    e.g. ``(".__tmp__", ".__old__")``), then removes any leftover of the
    CURRENT pid so the caller starts clean. The directory itself is NOT
    created — writers (e.g. ``df.write.parquet``) expect to create it."""
    scratch = os.path.join(root, f"{base}-{os.getpid()}")
    if os.path.isdir(root):
        alt = "|".join(re.escape(s) for s in suffixes)
        swept = re.compile(
            re.escape(base) + r"-(\d+)" + (f"(?:{alt})?" if alt else "") + "$"
        )
        for entry in os.listdir(root):
            m = swept.match(entry)
            if m is None:
                continue  # not our naming scheme: leave it alone
            try:
                os.kill(int(m.group(1)), 0)  # raises if the pid is gone
            except ProcessLookupError:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            except PermissionError:
                pass  # live pid under another uid: leave it
            except (OverflowError, ValueError):
                # A digit suffix too large for the OS pid type (someone
                # else's '<base>-99999999999999999999' under the shared
                # /tmp root) is not ours: skip it rather than crash the
                # sweep (ADVICE r11 #1).
                pass
    for leftover in [scratch] + [scratch + s for s in suffixes]:
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    return scratch
