"""Backend trust gate (diagnostics.cross_device_check).

CPU-vs-CPU must agree EXACTLY (the subprocess reference and the conftest
backend are the same XLA CPU compiler on identical shared inputs), which
pins the input-sharing mechanics: params serialized/restored bit-exact,
positions and quadrature keys identical. On a real chip the same call is the
per-box physics-trust gate (scripts/probe_el_cross_device.py).
"""

import numpy as np

from aiqmc_tpu import diagnostics


def test_cross_device_check_cpu_self_agrees():
    report = diagnostics.cross_device_check(modes=("real",), batch=8,
                                            verbose=False)
    assert report["ok"] is True
    rows = {r["name"]: r for r in report["modes"]["real"]}
    # Same backend on both sides -> not just within-tolerance but exact.
    assert rows["logabs"]["max"] == 0.0
    assert rows["sign"]["max"] == 0.0
    assert rows["E_L"]["max"] == 0.0
    assert rows["clipped_mean_el"]["max"] == 0.0


def test_xdev_compare_flags_bulk_corruption():
    # A synthetic backend whose outputs are shifted in BULK must fail, even
    # though each individual shift is small compared to near-node outliers.
    batch = 16
    rng = np.random.RandomState(0)
    ref = {"logabs": rng.randn(batch), "ph": np.sign(rng.randn(batch)),
           "el": rng.randn(batch) - 5.0}
    here = {"logabs": ref["logabs"] + 0.01,  # 10x the 2e-3 median tol
            "ph": ref["ph"], "el": ref["el"]}
    ok, _ = diagnostics._xdev_compare("real", here, ref, verbose=False)
    assert ok is False


def test_xdev_compare_tolerates_single_near_node_outlier():
    batch = 32
    rng = np.random.RandomState(1)
    ref = {"logabs": rng.randn(batch), "ph": np.sign(rng.randn(batch)),
           "el": rng.randn(batch) - 5.0}
    here = {k: np.array(v, copy=True) for k, v in ref.items()}
    # One walker deep near a node: huge amplified diff, healthy bulk.
    here["logabs"][7] += 0.5
    here["el"][7] += 40.0
    ok, _ = diagnostics._xdev_compare("real", here, ref, verbose=False)
    assert ok is True
