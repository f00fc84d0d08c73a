"""bench._measure_pair validity rule: superlinear or over-spread pairs
auto-retry and are flagged epoch_noisy (round-2 lesson: an impossible
1.202 efficiency shipped in the artifact of record)."""

from __future__ import annotations

import bench


def _scripted(times):
    """Fake _subprocess_job: pops scripted (job, cpus) -> seconds."""
    seq = {k: list(v) for k, v in times.items()}

    def fake(job, changes, cpus, n_batches, work):
        return seq[cpus].pop(0)

    return fake


def test_clean_pair_no_retry(monkeypatch):
    monkeypatch.setattr(bench, "_subprocess_job",
                        _scripted({8: [40.0, 41.0, 42.0], 2: [150.0, 155.0]}))
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2)
    assert len(big) == 3 and len(small) == 2 and not noisy
    assert 0.8 < (min(small) / min(big)) / 4 <= 1.0


def test_superlinear_triggers_retry(monkeypatch):
    # both small reps land in a noisy epoch -> min-per-level says eff 1.25
    # (impossible); the retry pair must run and the artifact flag as noisy
    monkeypatch.setattr(
        bench, "_subprocess_job",
        _scripted({8: [40.0, 40.0, 40.0, 40.0, 40.0], 2: [200.0, 210.0, 150.0, 155.0]}),
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2, max_extra=2)
    assert noisy
    assert len(small) == 4  # retried until the small-side floor confirmed
    eff = (min(small) / min(big)) / 4
    assert 0 < eff <= 1.0


def test_unconfirmed_floor_triggers_retry(monkeypatch):
    # big-side min (40) is a lone outlier among 90s reps: the floor is not
    # confirmed until a second rep lands within 15% of it
    monkeypatch.setattr(
        bench, "_subprocess_job",
        _scripted({8: [40.0, 95.0, 90.0, 41.0, 97.0], 2: [150.0, 155.0, 150.0, 151.0]}),
    )
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 2, max_extra=2)
    assert noisy
    # one retry pair confirmed the floor (41 within 15% of 40); loop stopped
    assert len(big) == 4 and len(small) == 3
    assert min(big) == 40.0


def test_no_scaling_reps_short_circuits(monkeypatch):
    monkeypatch.setattr(bench, "_subprocess_job", _scripted({8: [40.0, 41.0, 42.0]}))
    big, small, noisy = bench._measure_pair("pipeline", "c", "w", 3, 0)
    assert len(big) == 3 and small == [] and not noisy
