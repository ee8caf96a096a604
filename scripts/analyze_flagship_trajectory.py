"""Flagship-arm trajectory extrapolation (VERDICT round-3 item 1 fallback).

Concatenates every committed leg trace of a run (artifacts/<run>/
train_states.t*.csv.gz + the live runs/<run>/train_states.csv if present),
fits the power-law plateau E(t) = E_inf + A t^-alpha
(utils.analysis_tools.vmc_convergence_fit), and reports:

  * the fitted asymptote E_inf (stat + alpha-scan systematic),
  * the predicted energy at 2e5 iterations (the published-FermiNet budget
    for C ccECP VMC -5.4254 at this exact (512,32)x4/16-det capacity),
  * the iteration count the -5.425 bar would cost (inf if below E_inf).

Usage: python scripts/analyze_flagship_trajectory.py [run] [t_min] [window]
"""
import glob
import sys

from aiqmc_tpu.utils import analysis_tools

run = sys.argv[1] if len(sys.argv) > 1 else "c_kfac_wide"
t_min = float(sys.argv[2]) if len(sys.argv) > 2 else 3000.0
window = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

traces = sorted(glob.glob(f"artifacts/{run}/train_states.t*.csv.gz"))
traces += glob.glob(f"runs/{run}/train_states.csv")
print(f"{run}: {len(traces)} trace files")
for t in traces:
    print("  ", t)

fit = analysis_tools.vmc_convergence_fit(
    traces, t_min=t_min, window=window,
    targets=(50_000, 100_000, 200_000, 500_000),
    target_energies=(-5.420, -5.422, -5.425))

print(f"\nfit over t in [{fit['t_range'][0]:.0f}, {fit['t_range'][1]:.0f}], "
      f"{fit['n_windows']} windows, chi2/dof = {fit['chi2_dof']:.2f}")
print(f"E_inf   = {fit['e_inf']:.5f} +- {fit['e_inf_err']:.5f} (stat) "
      f"+- {fit['e_inf_sys']:.5f} (alpha-scan sys)")
print(f"alpha   = {fit['alpha']:.2f}, A = {fit['amplitude']:.4f}")
for t, e in fit["predicted"].items():
    print(f"E({t:>7,d}) = {e:.5f} Ha")
for v, t in fit["iters_for"].items():
    msg = f"{t:,.0f} iters" if t != float("inf") else \
        "UNREACHABLE (below fitted asymptote)"
    print(f"bar {v:.3f} Ha -> {msg}")
