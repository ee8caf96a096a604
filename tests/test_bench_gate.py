"""bench.py per-toolchain Laplacian gate.

The driver runs bench.py unattended at round end; if the backend miscompiles
the forward Laplacian (observed on the 2026-08-18 axon stack: 85 Ha
local-energy error on-chip, PASS on CPU) the bench must demote itself to the
batched-tangent path rather than time a program that computes wrong numbers.
"""
import json
import os
import subprocess

import pytest

import bench


def test_pick_laplacian_healthy_backend():
    # On the CPU test backend both kinetic paths agree at f32 round-off, so
    # the gate must keep the fast path.
    assert bench.pick_laplacian() == "forward"


def test_cpu_baseline_cache_keyed_by_laplacian(tmp_path, monkeypatch):
    cache = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CPU_CACHE", str(cache))

    def boom(*a, **k):
        raise AssertionError("must not re-measure on a laplacian-matched hit")

    cache.write_text(json.dumps(
        {"cpu_steps_per_sec": 123.0, "laplacian": "forward"}))
    monkeypatch.setattr(subprocess, "run", boom)
    # Matching laplacian: served from cache.
    assert bench.cpu_baseline(laplacian="forward") == 123.0
    # Demoted laplacian invalidates the cache -> re-measure path is taken
    # (the patched subprocess.run raising proves it got past the cache; the
    # broad except in cpu_baseline converts it to the honest None).
    assert bench.cpu_baseline(laplacian="default") is None


def test_legacy_cache_assumed_forward(tmp_path, monkeypatch):
    # Caches written before the gate lack the key; they were measured with
    # the then-hardcoded forward path.
    cache = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CPU_CACHE", str(cache))
    cache.write_text(json.dumps({"cpu_steps_per_sec": 7.0}))
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: pytest.fail("cache should hit"))
    assert bench.cpu_baseline(laplacian="forward") == 7.0
