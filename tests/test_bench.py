"""Unit tests for bench.py's data-driven measurement guards.

No Spark: these exercise the pure-python adjudication logic that decides
whether a recorded run is trustworthy. The mid-run load-wave detector
exists because the pre-run loadavg guard cannot see a wave that arrives
DURING the run, and a post-run loadavg check would self-flag (the
bench's own 32 threads dominate the trailing 5-min average) — so the
signal is the shape of the data itself: external load inflates the
whole catalog roughly uniformly, which a handful of genuine per-query
regressions cannot do.
"""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


def _catalog(n=40, base=1.0):
    return {f"q{i:02d}": base for i in range(n)}


def test_clean_run_not_flagged():
    best = _catalog()
    # Typical clean jitter: most queries within ~1.2x of best.
    timings = {q: t * 1.15 for q, t in best.items()}
    assert bench._uniform_inflation(timings, best) is None


def test_cold_cache_first_pass_not_flagged():
    # Post-reboot cold page cache was measured at a ~1.16 catalog median
    # (bench_history r6) — must stay below the flag line.
    best = _catalog()
    timings = {q: t * 1.2 for q, t in best.items()}
    assert bench._uniform_inflation(timings, best) is None


def test_wave_run_flagged_at_observed_ratio():
    # The observed r6 wave run replayed at a 1.43 catalog median.
    best = _catalog()
    timings = {q: t * 1.43 for q, t in best.items()}
    assert bench._uniform_inflation(timings, best) == 1.43


def test_genuine_regressions_do_not_move_the_median():
    # Five queries regress 5x while the rest of the catalog sits at its
    # bests: real regressions, not a wave — the median must not flag,
    # leaving the per-query regression harness to report them.
    best = _catalog()
    timings = dict(best)
    for q in list(best)[:5]:
        timings[q] = best[q] * 5.0
    assert bench._uniform_inflation(timings, best) is None


def test_too_few_comparable_queries_returns_none():
    best = _catalog(n=10)
    timings = {q: t * 2.0 for q, t in best.items()}
    assert bench._uniform_inflation(timings, best) is None


def test_sub_floor_bests_excluded():
    # best <= 0.2s queries are noise-dominated and excluded from the
    # ratio pool (same floor the regression harness uses).
    best = {f"q{i:02d}": 0.1 for i in range(40)}
    timings = {q: 1.0 for q in best}
    assert bench._uniform_inflation(timings, best) is None


def test_replay_detector_over_recorded_history():
    """CAUSAL replay of the mid-run wave detector over the committed
    bench_history.jsonl (ADVICE r6 #3: the synthetic-ratio tests above pin
    thresholds, but the claim 'the detector classifies the recorded history
    correctly' needs the actual recorded rows). Bests are min-tracked over
    PRIOR rows only — exactly what the live harness saw at each round; a
    global-best replay would misclassify early rounds' slower CODE as
    waves. The first 31 sf0.1 rows are frozen history: the detector must
    flag exactly the four adjudicated wave runs (r4-r6 rounds where a
    drained load wave inflated the catalog uniformly) and wave none of the
    known-clean rows."""
    import json

    hist = os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl")
    rows = [json.loads(l) for l in open(hist) if l.strip()]
    sf_rows = [r for r in rows if r.get("sf") == 0.1]
    assert len(sf_rows) >= 31, "frozen history prefix missing"

    flagged = []
    best: dict[str, float] = {}
    for i, r in enumerate(sf_rows):
        if bench._uniform_inflation(r.get("queries", {}), best) is not None:
            flagged.append(i)
        for q, t in r.get("queries", {}).items():
            if q not in best or t < best[q]:
                best[q] = t

    frozen = [i for i in flagged if i < 31]
    assert frozen == [2, 18, 25, 28], frozen


def test_recorded_median_ignores_contamination_once_resampled():
    """VERDICT r9 #2: once adaptive resampling engages, the recorded value
    is the median of the fastest majority — a resample taken to ESCAPE a
    contended sample must never be averaged with the contamination it
    escaped. Replays r9's actual recorded query_runs: the all-sample median
    put q24 at 0.867 (2.26x flag vs best 0.384) when three of its five
    samples sat at ~0.45s."""
    r9 = {
        "q24_nmea_validate": ([0.481, 0.96, 0.43, 1.528, 0.867], 0.384),
        "q32_static_voyage_sql": ([0.484, 1.225, 0.449, 0.786, 0.644], 0.353),
        "q34_static_report_sql": ([0.483, 2.165, 0.473, 0.909, 0.886], 0.4),
        "q38_repetition_rules": ([1.79, 3.831, 2.064, 2.202, 1.858], 1.313),
        "q29_rollup_summary": ([2.372, 0.957, 3.675, 1.012, 1.235], 0.74),
        "q37_decontamination": ([2.188, 11.512, 1.98, 2.504, 1.957], 1.46),
    }
    for q, (runs, best) in r9.items():
        rec = bench._recorded_median(runs)
        assert rec <= 1.5 * best, (q, rec, best)  # none re-flags
        # and never below the run minimum (no fabricated speed)
        assert rec >= min(runs)


def test_recorded_median_keeps_genuine_regressions_visible():
    # A real steady-state slowdown shows in EVERY sample, including the
    # fastest majority: the robust median must still record it.
    assert bench._recorded_median([2.1, 2.3, 2.0, 2.2, 2.15]) >= 2.0
    # Stable 3-sample runs (resampling never engaged) keep the plain median.
    assert bench._recorded_median([1.0, 1.2, 1.1]) == 1.1


def test_calib_scaled_regression_threshold():
    """r10: flag thresholds scale by the measured box-drift ratio so an
    all-time best set in the box's fastest era cannot generate permanent
    drift-noise flags (r9 shipped 10). A genuine >1.5x-beyond-drift
    regression still flags."""
    best = {"q1": 1.0, "q2": 1.0}
    timings = {"q1": 1.6, "q2": 2.5}
    # box at best-era speed: both flag as before
    assert set(bench._flag_regressions(timings, best)) == {"q1", "q2"}
    # 17% measured drift: 1.6 is inside 1.5*1.17, 2.5 is a real regression
    assert set(bench._flag_regressions(timings, best, 1.17)) == {"q2"}


def test_calib_baseline_skips_experiment_and_flagged_rows(tmp_path, monkeypatch):
    import json

    hist = tmp_path / "h.jsonl"
    rows = [
        {"sf": 0.1, "cpu_calib_s": 0.10, "cpu_calib_mt_s": 0.20,
         "contended": True},               # flagged: excluded
        {"sf": 0.1, "cpu_calib_s": 0.11, "cpu_calib_mt_s": 0.21,
         "warmup_mode": "small"},          # experiment: excluded
        {"sf": 0.1, "cpu_calib_s": 0.16, "cpu_calib_mt_s": 0.30},
        {"sf": 0.1, "cpu_calib_s": 0.17, "cpu_calib_mt_s": 0.28},
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    monkeypatch.setattr(bench, "_hist_path", lambda: str(hist))
    assert bench._calib_baseline(0.1) == (0.16, 0.28)


def test_untimed_queries_are_registered_and_windowed():
    """UNTIMED_QUERIES must name real catalog queries (a rename would
    silently re-time them) and stay correctness-gated elsewhere."""
    from pincspark.plans.queries import QUERIES

    for q in bench.UNTIMED_QUERIES:
        assert q in QUERIES, q


def test_rebaselined_query_ignores_pre_epoch_bests(tmp_path):
    """A deliberate plan change (e.g. q27's r7 oversized-block guard)
    resets that query's regression baseline: history rows older than the
    rebaseline epoch — including all rows from before the "ts" field
    existed — are excluded from its best, while other queries keep their
    full history."""
    import json

    hist = tmp_path / "h.jsonl"
    rows = [
        {"sf": 0.1, "queries": {"q27_embedding_dups": 0.685, "q01": 0.5}},
        {"ts": 2e9, "sf": 0.1,
         "queries": {"q27_embedding_dups": 1.1, "q01": 0.6}},
        {"ts": 2e9, "sf": 0.001,  # other sf never contributes
         "queries": {"q27_embedding_dups": 0.1, "q01": 0.1}},
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rows))
    assert "q27_embedding_dups" in bench._REBASELINED  # the r7 entry
    best = bench._best_per_query(0.1, str(hist))
    assert best["q27_embedding_dups"] == 1.1  # pre-cap 0.685 excluded
    assert best["q01"] == 0.5  # non-rebaselined query keeps full history


def test_best_clean_history_skips_small_catalog_rows(tmp_path, monkeypatch):
    """min-by-value across history once surfaced a 32-query row as "best"
    against a 63-query run — smaller catalogs, not faster code. Rows
    more than 2 queries short of the current catalog are excluded."""
    import json

    hist = tmp_path / "h.jsonl"
    small = {"sf": 0.1, "value": 50.0,
             "queries": {f"q{i}": 1.0 for i in range(32)}}
    full = {"sf": 0.1, "value": 63.0,
            "queries": {f"q{i}": 1.0 for i in range(63)}}
    hist.write_text(json.dumps(small) + "\n" + json.dumps(full) + "\n")
    monkeypatch.setattr(bench, "_hist_path", lambda: str(hist))
    got = bench._best_clean_history(0.1, n_queries=63)
    assert got is not None and got["value"] == 63.0  # small row excluded
    legacy = bench._best_clean_history(0.1)  # no size known -> old behavior
    assert legacy["value"] == 50.0


def test_retry_load_guard_ignores_own_5min_residue(monkeypatch):
    """A retry attempt judges contention on the 1-min loadavg only: the
    5-min average unavoidably carries the bench's own just-finished
    attempt, which made every retry self-flag contended (r7 measured
    attempts 2-3 at l5 6+ with steady timings)."""
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 8.0, 8.0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip backoff
    _, contended_first = bench._load_guard()
    assert contended_first  # first attempt: l5 8.0 rightly flags
    _, contended_retry = bench._load_guard(ignore_l5=True)
    assert not contended_retry  # retry: quiet l1 is the honest signal


def test_drain_load_returns_when_l1_quiet(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 9.0, 9.0))
    t0 = __import__("time").time()
    bench._drain_load(max_wait=5.0)
    assert __import__("time").time() - t0 < 1.0  # no pointless sleeping


def test_scale_probe_query_list_tracks_catalog():
    """scripts/scale_probe.py names catalog queries in a plain list; a
    rename in the catalog would otherwise break the probe only at its
    next manual run."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_probe.py"),
    )
    probe = iu.module_from_spec(spec)
    spec.loader.exec_module(probe)
    from pincspark.plans.queries import QUERIES

    missing = [q for q in probe.DEFAULT_QUERIES if q not in QUERIES]
    assert not missing, f"scale_probe names unknown queries: {missing}"


def test_flag_regressions_prefers_rolling_median():
    """r11 (VERDICT r10 #4): queries with a rolling-median baseline flag
    against it WITHOUT calib scaling (the last-k-clean median already
    absorbs box drift); queries too new for one fall back to best x calib.
    This closes the drift-cap blind spot: at calib 1.341 the old bar sat
    at 2.01x best — indistinguishable from the driver's own 2x bar."""
    best = {"q_old": 1.0, "q_new": 1.0}
    rolling = {"q_old": 1.3}  # healthy rounds sit ~1.26x above best here
    # 1.9x best but only 1.46x the rolling median: drift-class, no flag
    # even at a calib ratio that would have hidden real regressions.
    timings = {"q_old": 1.9, "q_new": 1.2}
    assert bench._flag_regressions(timings, best, 1.341, rolling) == {}
    # 2.0x the rolling median: flags regardless of calib drift.
    timings = {"q_old": 2.6, "q_new": 1.2}
    flags = bench._flag_regressions(timings, best, 1.341, rolling)
    assert set(flags) == {"q_old"} and flags["q_old"]["rolling_median"] == 1.3
    # no rolling baseline: the calib-scaled best bar still applies.
    timings = {"q_old": 1.0, "q_new": 2.5}
    assert set(bench._flag_regressions(timings, best, 1.341, rolling)) == {"q_new"}


def test_rolling_median_replay_of_committed_history(tmp_path):
    """CAUSAL replay of the new flag scheme over the committed history
    (the VERDICT r10 #4 done-criterion): for each official round row, build
    the rolling baseline from the rows BEFORE it, re-estimate the row's
    per-query values with the current fastest-majority estimator over its
    raw samples, and flag at 1.5x.

    Expected classification (adjudicated in r10's forensics):
    - r8 official: q27's bimodal IVF cold-build (the one real measurement
      defect of that era, fixed in r9 by at-sf warmup) flags at ~1.67x.
    - r9 official: the shipped q24/q34 flags were resample contamination +
      drift — re-estimated they sit <=1.3x; NO flags. q54's 'step'
      re-estimates to ~1.17x: drift-class, consistent with its clean
      stage profile.
    - r10 official (calib_drift 1.341, the blind-spot row): NO flags.
    """
    import json

    hist = os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl")
    rows = [json.loads(l) for l in open(hist) if l.strip()]
    sf_rows = [r for r in rows if r.get("sf") == 0.1]
    officials = {  # frozen history rows, keyed by their immutable ts
        1786786048.2: "r8",
        1786795657.6: "r9",
        1786816722.7: "r10",
    }
    seen = {}
    for i, r in enumerate(sf_rows):
        if r.get("ts") not in officials:
            continue
        tag = officials[r["ts"]]
        prior = tmp_path / f"prior_{tag}.jsonl"
        prior.write_text("".join(json.dumps(x) + "\n" for x in sf_rows[:i]))
        rolling = bench._rolling_median_baseline(0.1, str(prior))
        qr = r.get("query_runs", {})
        timings = {
            q: bench._recorded_median(qr[q]) if qr.get(q) else t
            for q, t in r.get("queries", {}).items()
        }
        flags = bench._flag_regressions(timings, {}, 1.0, rolling)
        seen[tag] = set(flags)
    assert seen["r8"] == {"q27_embedding_dups"}, seen["r8"]
    assert seen["r9"] == set(), seen["r9"]
    assert seen["r10"] == set(), seen["r10"]


def test_prior_intersection_totals(tmp_path):
    """ADVICE r10 #2: totals compared across rounds must be restricted to
    the common query set — a query moved to UNTIMED or newly added must
    not read as a speedup/slowdown."""
    import json

    hist = tmp_path / "h.jsonl"
    prior = {
        "ts": 1.0, "sf": 0.1, "value": 3.0,
        "queries": {"qa": 1.0, "qb": 1.0, "q_untimed_now": 1.0},
    }
    hist.write_text(json.dumps(prior) + "\n")
    # current run dropped q_untimed_now and added q_new
    timings = {"qa": 1.1, "qb": 0.9, "q_new": 5.0}
    out = bench._prior_intersection_totals(timings, 0.1, str(hist))
    assert out["n_common"] == 2
    assert out["prior_total_common"] == 2.0
    assert out["total_common"] == 2.0  # like-for-like: flat, not 2x slower


def test_composite_minima_never_publishes_contended_attempt(tmp_path, monkeypatch):
    """VERDICT r14 #1: when every attempt flags, the official row is the
    per-query MINIMA across attempts — a single contended attempt (even the
    one with the lowest catalog total) can never own the headline. The
    flagship's ratio forms are recomputed from the attempt that produced
    the minimum flagship, using that attempt's own same-box twin + calib."""
    monkeypatch.setattr(bench, "_hist_path", lambda: str(tmp_path / "h.jsonl"))
    # Attempt 1: contended wave — lowest TOTAL but worst flagship (the r14
    # failure shape). Attempt 2: retry — faster flagship, slower elsewhere.
    a1 = {
        "value": 4.877, "queries": {"ais_flagship": 3.877, "q01": 1.0},
        "contended": True, "loadavg_1min": 5.4,
        "reference_batch_seconds": 1.373,
        "reference_batch_seconds_samebox": 2.079,
        "untimed_correctness_queries": ["q87"],
    }
    h1 = {
        "queries": {"ais_flagship": 3.877, "q01_pricing_summary": 1.0},
        "calib_drift_ratio": 1.35, "loadavg_1min": 5.4, "contended": True,
    }
    a2 = {
        "value": 4.051, "queries": {"ais_flagship": 2.551, "q01": 1.5},
        "suspect_uniform_inflation": 1.44,
        "reference_batch_seconds": 1.373,
        "reference_batch_seconds_samebox": 1.9,
        "untimed_correctness_queries": ["q87"],
    }
    h2 = {
        "queries": {"ais_flagship": 2.551, "q01_pricing_summary": 1.5},
        "calib_drift_ratio": 1.3, "loadavg_1min": 3.0, "contended": False,
    }
    final = bench._composite_result([a1, a2], [h1, h2], 0.1)
    assert final["composite_minima"] is True
    assert final["all_attempts_flagged"] == 2
    # per-query minima: flagship from attempt 2, q01 from attempt 1
    assert final["queries"]["ais_flagship"] == 2.551
    assert final["queries"]["q01"] == 1.0
    assert final["value"] == round(2.551 + 1.0, 3)
    # all three ratio forms, from the min-flagship attempt's session
    assert final["flagship_vs_reference_ratio"] == round(2.551 / 1.373, 3)
    assert final["flagship_vs_reference_ratio_driftnorm"] == round(
        2.551 / 1.3 / 1.373, 3
    )
    assert final["reference_batch_seconds_samebox"] == 1.9
    assert final["flagship_vs_reference_ratio_samebox"] == round(2.551 / 1.9, 3)
    # contended only when ALL attempts were; loadavg reports min + max
    assert "contended" not in final
    assert final["loadavg_1min"] == 3.0
    assert final["loadavg_1min_max"] == 5.4
    assert final["untimed_correctness_queries"] == ["q87"]


def test_composite_baselines_are_pre_session_snapshot(tmp_path, monkeypatch):
    """ADVICE r15 #3: by the time _composite_result runs, main() has
    already appended this session's attempt rows to bench_history — and
    _best_per_query does not filter contended rows — so recomputing the
    baselines there compares the composite minima against the very
    attempts being summarized (for newly registered queries best ==
    composite min by construction, and the inflation flag can never
    fire). The fix: main() snapshots the baselines BEFORE the attempt
    loop and passes them through; _composite_result must use the
    snapshot and never re-read history."""
    monkeypatch.setattr(bench, "_hist_path", lambda: str(tmp_path / "h.jsonl"))

    def _boom(*a, **k):
        raise AssertionError("baseline recomputed from post-append history")

    monkeypatch.setattr(bench, "_best_per_query", _boom)
    monkeypatch.setattr(bench, "_rolling_median_baseline", _boom)

    # 24 queries, all uniformly 1.5x their pre-session best of 1.0s: a
    # classic whole-catalog wave. With the snapshot the inflation flag
    # fires; with post-append history the session's own rows would BE the
    # bests (ratio 1.0) and it structurally could not.
    names = [f"q{i:02d}_x" for i in range(1, 25)]
    timings = {n: 1.5 for n in names}
    a = {"value": 36.0, "queries": dict(timings), "contended": True}
    h = {"queries": dict(timings), "contended": True, "loadavg_1min": 5.0}
    pre_best = {n: 1.0 for n in names}
    final = bench._composite_result([a], [h], 0.1, baselines=(pre_best, {}))
    assert final["suspect_uniform_inflation"] == 1.5
    assert final["composite_minima"] is True


def test_composite_replay_of_r14_all_flagged_session():
    """Replay the ACTUAL r14 bench session (the last three attempt rows in
    committed bench_history.jsonl, all flagged at drift 1.35): the old
    min-by-total selection published attempt 1's flagship 3.877 (raw ratio
    2.824); the composite must carry the session minimum 2.551 instead."""
    import json

    rows = [
        r
        for r in bench._iter_history(0.1, bench._hist_path())
        if 1786906000 <= r.get("ts", 0) <= 1786908000 and r.get("attempt")
    ]
    if len(rows) != 3:  # history file trimmed/regenerated — nothing to replay
        import pytest

        pytest.skip("r14 attempt rows not present in history")
    attempts = [
        {
            "value": r["value"],
            "queries": {"ais_flagship": r["queries"]["ais_flagship"]},
            "contended": r.get("contended", False),
        }
        for r in rows
    ]
    final = bench._composite_result(attempts, rows, 0.1)
    flagships = [r["queries"]["ais_flagship"] for r in rows]
    assert final["queries"]["ais_flagship"] == min(flagships) == 2.551
    # the composite total is <= every single attempt's total
    assert final["value"] <= min(r["value"] for r in rows)
    # the r14 defect: min-by-total picked attempt 1 (worst flagship)
    old_pick = min(rows, key=lambda r: r["value"])
    assert old_pick["queries"]["ais_flagship"] == 3.877  # what used to ship
