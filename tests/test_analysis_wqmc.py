"""Analysis helpers + WQMC objective through the driver."""

import numpy as np

from aiqmc_tpu.utils import analysis_tools


def test_read_and_estimate(tmp_path):
    p = tmp_path / "train_states.csv"
    rng = np.random.RandomState(0)
    with open(p, "w") as f:
        f.write("step,energy,variance,pmove\n")
        for t in range(200):
            f.write(f"{t},{-1.0 + 0.1 * rng.normal():.6f},0.1,0.5\n")
    est = analysis_tools.estimate_energy(str(p))
    assert abs(est["energy"] + 1.0) < 0.05
    assert est["stderr"] > 0
    assert est["nsamples"] == 160


def test_robust_estimators(tmp_path):
    rng = np.random.RandomState(1)
    clean = -5.4 + 0.01 * rng.normal(size=60)
    blocks = clean.copy()
    blocks[37] = -5.876          # the runs/c_dmc_big outlier, to the digit
    rs = analysis_tools.robust_block_stats(blocks)
    assert rs["noutliers"] == 1
    assert abs(rs["mean"] - clean[np.arange(60) != 37].mean()) < 1e-12
    # The naive mean is dragged ~8 mHa by the outlier; the robust one is not.
    assert abs(blocks.mean() - rs["mean"]) > 0.005

    p = tmp_path / "train_states.csv"
    with open(p, "w") as f:
        f.write("step,energy,variance,pmove\n")
        for t in range(200):
            e = -1.0 + 0.01 * rng.normal()
            if t == 150:
                e = 1823.5   # the runs/diamond_tabc eval outlier
            f.write(f"{t},{e:.6f},0.1,0.5\n")
    est = analysis_tools.robust_estimate_energy(str(p))
    assert est["noutliers"] == 1
    assert abs(est["energy"] + 1.0) < 0.01
    naive = analysis_tools.estimate_energy(str(p))
    assert abs(naive["energy"] + 1.0) > 1.0   # naive is destroyed


def test_mad_mask_degenerate():
    # Constant samples: mad == 0 must not reject everything.
    x = np.full(10, 2.5)
    assert analysis_tools.mad_outlier_mask(x).all()
    # Non-finite samples always drop.
    x = np.array([1.0, np.nan, 1.0, np.inf, 1.0])
    assert analysis_tools.mad_outlier_mask(x).sum() == 3


def test_wqmc_objective_driver(tmp_path):
    from aiqmc_tpu.configs import diatomic
    from aiqmc_tpu import train

    cfg = diatomic.h2()
    cfg.batch_size = 8
    cfg.optim.iterations = 2
    cfg.optim.objective = "wqmc"
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()


def test_tabc_average(tmp_path):
    """Weighted twist combination: exact mean and quadrature error."""
    rng = np.random.RandomState(2)
    paths = []
    means = [-9.7, -9.1]
    for i, mu in enumerate(means):
        p = tmp_path / f"twist{i}.csv"
        with open(p, "w") as f:
            f.write("step,energy,variance,pmove\n")
            for t in range(400):
                f.write(f"{t},{mu + 0.02 * rng.normal():.6f},0.1,0.5\n")
        paths.append(str(p))
    out = analysis_tools.tabc_average([(2.0, paths[0]), (6.0, paths[1])])
    # Weighted mean of the per-twist robust estimates, weights 2:6.
    expect = (2.0 * out["per_twist"][0]["energy"]
              + 6.0 * out["per_twist"][1]["energy"]) / 8.0
    assert abs(out["energy"] - expect) < 1e-12
    assert abs(out["energy"] - (2 * -9.7 + 6 * -9.1) / 8) < 0.01
    q = np.sqrt((2 * out["per_twist"][0]["stderr"]) ** 2
                + (6 * out["per_twist"][1]["stderr"]) ** 2) / 8.0
    assert abs(out["stderr"] - q) < 1e-15


def test_dmc_tau_extrapolation(tmp_path):
    """Synthetic DMC traces with E(tau) = -5.43 + 0.8 tau + noise: the
    weighted fit must recover the intercept within its own error bar."""
    import csv as csv_mod
    import numpy as np
    from aiqmc_tpu.utils import analysis_tools

    rng = np.random.RandomState(0)
    runs = []
    for tau in (0.01, 0.02, 0.04):
        path = tmp_path / f"dmc_{tau}.csv"
        with open(path, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=["block", "energy", "weight"])
            w.writeheader()
            for b in range(400):
                e = -5.43 + 0.8 * tau + 0.003 * rng.randn()
                w.writerow({"block": b, "energy": e, "weight": 1.0})
        runs.append((tau, str(path)))
    out = analysis_tools.dmc_tau_extrapolation(runs)
    assert abs(out["e0"] - (-5.43)) < 4 * out["e0_err"] + 1e-4
    assert abs(out["slope"] - 0.8) < 0.12
    assert abs(out["slope"] - 0.8) < 4 * out["slope_err"] + 1e-3
    # Data generated from the linear model: chi2/dof must be O(1).
    assert out["dof"] == 1
    assert out["chi2_dof"] < 10.0
