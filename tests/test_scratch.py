"""pid_scratch sweep semantics (pincspark/scratch.py).

The shared /tmp scratch root is world-writable: the sweep must remove
only dead-pid siblings that match the caller's own naming scheme, must
never crash on adversarial names (ADVICE r11 #1: a digit suffix too
large for the OS pid type), and must pre-clean the current pid's own
leftovers.
"""

import os

from pincspark.scratch import pid_scratch


def test_returns_pid_keyed_path_and_does_not_create_it(tmp_path):
    p = pid_scratch(str(tmp_path), "sf0.1")
    assert p == os.path.join(str(tmp_path), f"sf0.1-{os.getpid()}")
    assert not os.path.exists(p)


def _dead_pid() -> int:
    """A real, just-reaped child pid: guaranteed dead, not yet recycled."""
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    return proc.pid


def test_sweeps_dead_pid_and_own_leftover(tmp_path):
    dead = tmp_path / f"sf0.1-{_dead_pid()}"
    dead.mkdir()
    own = tmp_path / f"sf0.1-{os.getpid()}"
    own.mkdir()
    (own / "leftover.parquet").write_text("x")
    other_scheme = tmp_path / "unrelated-123"
    other_scheme.mkdir()
    p = pid_scratch(str(tmp_path), "sf0.1")
    assert not dead.exists()  # dead sibling swept
    assert not os.path.exists(p)  # own leftover pre-cleaned
    assert other_scheme.exists()  # different base: untouched


def test_overflow_pid_suffix_is_skipped_not_crashed(tmp_path):
    """ADVICE r11 #1: '<base>-<digits>' with a suffix too large for a C
    long used to crash os.kill(int(...), 0) with OverflowError and fail
    every q87/q93 build. It is not our directory — skip it."""
    hostile = tmp_path / "sf0.1-99999999999999999999"
    hostile.mkdir()
    p = pid_scratch(str(tmp_path), "sf0.1")
    assert hostile.exists()  # not ours: left alone
    assert p.endswith(f"-{os.getpid()}")


def test_crash_residue_suffixes_are_swept_for_dead_pids(tmp_path):
    residue = tmp_path / f"st-{_dead_pid()}.__tmp__"
    residue.mkdir()
    pid_scratch(str(tmp_path), "st", suffixes=(".__tmp__", ".__old__"))
    assert not residue.exists()
