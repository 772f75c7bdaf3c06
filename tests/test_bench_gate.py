"""The bench contention gate: a loaded host must delay the run and, if
it never quiets down, the artifact must carry an explicit override stamp
rather than a silently contaminated number (round 4's graded artifact
recorded 1.604x under loadavg 8.47; the idle truth was 1.12x)."""

from __future__ import annotations

import bench


def test_idle_host_passes_immediately(monkeypatch):
    monkeypatch.setattr(bench, "loadavg", lambda: [0.5, 0.4, 0.3])
    la, overridden, waited = bench.wait_for_idle(max_wait=60)
    assert not overridden and waited == 0 and la[0] == 0.5


def test_loaded_host_waits_then_overrides(monkeypatch):
    monkeypatch.setattr(bench, "loadavg", lambda: [9.9, 9.9, 9.9])
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    la, overridden, waited = bench.wait_for_idle(max_wait=45)
    assert overridden, "a still-loaded host must be stamped, not hidden"
    assert waited >= 45 and sleeps, "must actually wait before overriding"


def test_load_drop_releases_the_gate(monkeypatch):
    readings = iter([[9.0] * 3, [7.0] * 3, [1.0] * 3, [1.0] * 3])
    monkeypatch.setattr(bench, "loadavg", lambda: next(readings))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    la, overridden, waited = bench.wait_for_idle(max_wait=600)
    assert not overridden and la[0] == 1.0 and waited > 0
