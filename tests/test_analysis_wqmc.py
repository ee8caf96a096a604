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
