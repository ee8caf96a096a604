"""vmc_convergence_fit recovers a known power-law plateau from noisy legs."""

import gzip
import os

import numpy as np

from aiqmc_tpu.utils import analysis_tools


def _write_leg(path, steps, e_inf, amp, alpha, rng, gz=False):
    lines = ["step,energy,variance,pmove,ewmean,ewstd,guard_rejected"]
    for t in steps:
        e = e_inf + amp * t ** (-alpha) + rng.normal(0, 0.003)
        lines.append(f"{t},{e},0.02,0.5,{e},0.01,0")
    payload = "\n".join(lines) + "\n"
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(payload)
    else:
        with open(path, "w") as f:
            f.write(payload)


def test_convergence_fit_recovers_plateau(tmp_path):
    e_inf, amp, alpha = -5.425, 2.0, 0.8
    rng = np.random.RandomState(0)
    p1 = os.path.join(tmp_path, "leg1.csv")
    p2 = os.path.join(tmp_path, "leg2.csv.gz")
    _write_leg(p1, np.arange(1, 20000), e_inf, amp, alpha, rng)
    _write_leg(p2, np.arange(20000, 40000), e_inf, amp, alpha, rng, gz=True)
    fit = analysis_tools.vmc_convergence_fit(
        [p1, p2], t_min=2000, window=1000,
        targets=(200000,), target_energies=(-5.42,))
    assert abs(fit["e_inf"] - e_inf) < 3 * (fit["e_inf_err"]
                                            + fit["e_inf_sys"] + 5e-4)
    assert abs(fit["alpha"] - alpha) < 0.3
    # Predicted energy at 2e5 iters is between the last window and e_inf.
    pred = fit["predicted"][200000]
    assert e_inf < pred < e_inf + amp * 20000 ** (-alpha)
    # Iteration count needed to hit -5.42 is finite and past the data.
    t_needed = fit["iters_for"][-5.42]
    exact = (amp / (-5.42 - e_inf)) ** (1 / alpha)
    assert 0.5 * exact < t_needed < 2.0 * exact
    # A bar below the asymptote is unreachable.
    unreachable = analysis_tools.vmc_convergence_fit(
        [p1, p2], t_min=2000, window=1000, target_energies=(-5.43,))
    assert unreachable["iters_for"][-5.43] == float("inf")
