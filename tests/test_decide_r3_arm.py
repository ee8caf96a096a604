"""decide_r3_arm.py picks the right campaign arm from synthetic probe CSVs
(the overnight queue scripts/queue_r2k.sh trusts its one-word output)."""

import csv
import importlib.util
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "decide_r3_arm.py")


def _write_run(run_dir, energies, variances):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "train_states.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "energy", "variance", "pmove", "ewmean", "ewstd"])
        for i, (e, v) in enumerate(zip(energies, variances)):
            w.writerow([i, e, v, 0.9, e, 0.01])


def _decide(tmp_path):
    """Runs the script against a fake runs/ dir by copying it under tmp."""
    # The script resolves RUNS relative to its own location; run a patched
    # copy that points at the temp dir instead.
    src = open(SCRIPT).read()
    src = src.replace(
        'RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),\n'
        '                    "runs")',
        'RUNS = %r' % str(tmp_path))
    patched = tmp_path / "decide_patched.py"
    patched.write_text(src)
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, str(patched)], capture_output=True,
                         text=True, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_no_data_falls_back_to_fresh(tmp_path):
    assert _decide(tmp_path) == "fresh"


def test_lrboost_wins_when_it_breaks_the_plateau(tmp_path):
    rng = np.random.default_rng(0)
    e = -5.420 + 0.002 * rng.standard_normal(2000)
    _write_run(tmp_path / "c_kfac_lrboost", e, np.full(2000, 0.02))
    assert _decide(tmp_path) == "lrboost"


def test_flat_lrboost_and_healthy_spring_picks_spring(tmp_path):
    rng = np.random.default_rng(1)
    e_lr = -5.4155 + 0.002 * rng.standard_normal(2000)  # plateau, no win
    _write_run(tmp_path / "c_kfac_lrboost", e_lr, np.full(2000, 0.02))
    e_sp = -5.4150 + 0.002 * rng.standard_normal(700)
    _write_run(tmp_path / "c_spring_probe2", e_sp, np.full(700, 0.03))
    assert _decide(tmp_path) == "spring"


def test_creeping_spring_is_rejected(tmp_path):
    rng = np.random.default_rng(2)
    e_lr = -5.4155 + 0.002 * rng.standard_normal(2000)
    _write_run(tmp_path / "c_kfac_lrboost", e_lr, np.full(2000, 0.02))
    # probe-1 failure mode: energy drifts below-plateau-then-up is fine, the
    # signature is VARIANCE creep past the guard ceiling.
    e_sp = np.concatenate([
        -5.4155 + 0.002 * rng.standard_normal(350),
        -5.48 + 0.05 * rng.standard_normal(350)])
    v_sp = np.concatenate([np.full(350, 0.02), np.full(350, 1.5)])
    _write_run(tmp_path / "c_spring_probe2", e_sp, v_sp)
    assert _decide(tmp_path) == "fresh"
