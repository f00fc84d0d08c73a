"""bench._measure_pair validity + calibration rules: impossible or
floor-unconfirmed pairs auto-retry; reps taken in a noisy host epoch
(calibration token inflated) are discarded from the estimator; the
artifact flags epoch_noisy only when the host never calmed (round-2
lesson: an impossible 1.202 efficiency shipped in the artifact of
record; round-4 lesson: a real 0.83 efficiency shipped as 0.553 because
noisy reps poisoned the min)."""

from __future__ import annotations

import pytest

import bench


def _scripted(times, monkeypatch, floor=0.25):
    """Fake _subprocess_job popping scripted cpus -> [sec or (sec, token)]
    entries; a scripted token above bench.CAL_THRESHOLD*floor marks the
    rep dirty."""
    monkeypatch.setattr(bench, "_ALL_TOKENS", [floor])
    seq = {k: list(v) for k, v in times.items()}

    def fake(job, changes, cpus, n_batches, work):
        entry = seq[cpus].pop(0)
        sec, tok = entry if isinstance(entry, tuple) else (entry, floor)
        return {"cpus": cpus, "sec": sec, "tokens": [tok]}

    monkeypatch.setattr(bench, "_subprocess_job", fake)


def test_clean_pair_no_retry(monkeypatch):
    _scripted({8: [40.0, 41.0, 42.0], 2: [150.0, 155.0]}, monkeypatch)
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2)
    assert len(big) == 3 and len(small) == 2 and not noisy
    compact, detail = bench._pair_summary(big, small, 1e6, noisy)
    assert 0.8 < compact["efficiency"] <= 1.0 and compact["efficiency_valid"]


def test_superlinear_retries_until_confirmed(monkeypatch):
    # both planned small reps land high -> min-per-level says eff 1.25
    # (impossible); retries run until the small floor confirms, and the
    # RESOLVED pair is a valid artifact (noisy=False: the host calmed)
    _scripted(
        {8: [40.0, 40.0, 40.0, 40.0, 40.0], 2: [200.0, 210.0, 150.0, 155.0]},
        monkeypatch,
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2, max_extra=2)
    assert len(small) == 4  # two retry pairs ran
    assert not noisy
    compact, _ = bench._pair_summary(big, small, 1e6, noisy)
    assert compact["efficiency"] == pytest.approx((150.0 / 40.0) / 4, abs=1e-3)


def test_retry_budget_exhausted_flags_noisy(monkeypatch):
    # the small-side floor never confirms within the budget -> epoch_noisy
    _scripted(
        {8: [40.0] * 6, 2: [200.0, 150.0, 110.0, 80.0, 60.0]}, monkeypatch
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2, max_extra=3)
    assert noisy
    assert len(small) == 5


def test_calibration_discards_dirty_reps(monkeypatch):
    # a small-side rep taken during a host burst (token 2x the floor)
    # shows an absurdly FAST time (burst ended mid-run); without the
    # calibration gate it would fake efficiency 0.19 — the clean subset
    # yields the true 0.94
    _scripted(
        {8: [40.0, 41.0, 40.5], 2: [(30.0, 0.5), 150.0, 152.0]},
        monkeypatch,
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 2, 2, max_extra=1)
    assert not noisy
    compact, detail = bench._pair_summary(big, small, 1e6, noisy)
    assert compact["efficiency"] == pytest.approx((150.0 / 40.0) / 4, abs=1e-3)
    assert detail["clean_small"] == 2 and len(detail["reps_small"]) == 3
    assert [r["clean"] for r in detail["reps_small"]] == [False, True, True]


def test_all_dirty_falls_back_to_all_reps(monkeypatch):
    # if NO rep is clean the estimator falls back to min over everything
    # (still published; noisy flag tells the reader) rather than crashing
    _scripted(
        {8: [(40.0, 0.6), (41.0, 0.6)], 2: [(150.0, 0.6), (151.0, 0.6)]},
        monkeypatch, floor=0.25,
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 2, 2, max_extra=0)
    assert noisy
    compact, detail = bench._pair_summary(big, small, 1e6, noisy)
    assert compact["efficiency"] == pytest.approx((150.0 / 40.0) / 4, abs=1e-3)
    assert detail["clean_small"] == 0 and detail["clean_big"] == 0


def test_no_scaling_reps_short_circuits(monkeypatch):
    _scripted({8: [40.0, 41.0, 42.0]}, monkeypatch)
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 0)
    assert len(big) == 3 and small == [] and not noisy
