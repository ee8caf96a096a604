"""Pick the round-3 flagship arm from the decision-tree probe results.

ROADMAP.md round-3 plan: the 67k-iteration KFAC plateau (-5.41563(6)) cannot
be closed by plain continuation; two cheap probes decide the campaign:

  arm A (lrboost): runs/c_kfac_lrboost — 4k-iteration continuation with the
    upstream-FermiNet lr schedule (delay 10000 = 3x lr at t=67k). Wins if the
    robust tail energy breaks below -5.417 Ha (clears the plateau by ~2 sigma
    of its scatter).
  arm B (spring): runs/c_spring_probe2 — SPRING continuation at damping 0.1.
    Viable if it holds the plateau WITHOUT the variance creep that killed
    probe 1 (tail median <= -5.405 and median batch variance <= 0.25 Ha^2,
    the guard ceiling).
  arm C (fresh): neither probe moved — the gap is schedule/feature-level
    from scratch (run_c_ccecp_kfac_fstream.py / run_c_ccecp_psiformer.py).

Prints the chosen arm name on the last line: "lrboost" | "spring" | "fresh".
Diagnostics go to stderr so `$(python decide_r3_arm.py)` captures one word.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiqmc_tpu.utils import analysis_tools

RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs")
PLATEAU = -5.41563          # 67k-iteration robust plateau (BASELINE.md)
LRBOOST_WIN = -5.417        # clears the plateau decisively
SPRING_MEDIAN_OK = -5.405   # tracks the plateau (probe 1 drifted to -5.51)
SPRING_VAR_CEILING = 0.25   # guard.var_ceiling used by the probe


def _read(run_dir):
    csv_path = os.path.join(run_dir, "train_states.csv")
    if not os.path.exists(csv_path):
        return None
    stats = analysis_tools.read_train_stats(csv_path)
    if not stats or stats["energy"].size < 300:
        return None
    return stats


def lrboost_verdict():
    stats = _read(os.path.join(RUNS, "c_kfac_lrboost"))
    if stats is None:
        return None, {"lrboost": "no data"}
    est = analysis_tools.robust_estimate_energy(
        os.path.join(RUNS, "c_kfac_lrboost", "train_states.csv"),
        burn_fraction=0.5)
    win = est["energy"] <= LRBOOST_WIN
    return win, {"lrboost_energy": est["energy"],
                 "lrboost_stderr": est["stderr"], "lrboost_win": win}


def spring_verdict():
    run = os.path.join(RUNS, "c_spring_probe2")
    stats = _read(run)
    if stats is None:
        return None, {"spring": "no data"}
    e = stats["energy"]
    v = stats["variance"]
    tail = slice(int(0.7 * e.size), None)
    med_e = float(np.median(e[tail]))
    med_v = float(np.median(v[tail]))
    ok = (med_e <= SPRING_MEDIAN_OK) and (med_v <= SPRING_VAR_CEILING)
    return ok, {"spring_tail_median": med_e, "spring_tail_var": med_v,
                "spring_ok": ok}


def main():
    lr_win, d1 = lrboost_verdict()
    sp_ok, d2 = spring_verdict()
    diag = {**d1, **d2, "plateau": PLATEAU}
    if lr_win:
        arm = "lrboost"
    elif sp_ok:
        arm = "spring"
    else:
        arm = "fresh"
    diag["arm"] = arm
    print(json.dumps(diag), file=sys.stderr)
    print(arm)


if __name__ == "__main__":
    main()
