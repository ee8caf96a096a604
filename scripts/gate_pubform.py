"""Flagship decision gate (ADVICE r4): pubform vs baseline arm at matched t.

Prints exactly one token on stdout — ``SWITCH`` or ``CONTINUE`` — for the
master queue; diagnostics go to stderr. Pure stdlib+numpy (no jax, no
aiqmc_tpu import: safe to run between chip legs).

Comparator: the f-stream arm where its committed traces overlap pubform's
current t, else the 2x-wide arm's from-scratch trace (the f-stream t<9579
trace was not retained in artifacts; both arms' round-4 power-law asymptotes
agree to 0.3 mHa, so either is a fair matched-t baseline at early t).

Usage: python scripts/gate_pubform.py [gate_mha=20] [gate_t=4000]
"""
import glob
import gzip
import io
import os
import sys

import numpy as np

GATE_MHA = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
GATE_T = float(sys.argv[2]) if len(sys.argv) > 2 else 4000.0
WINDOW = 500  # steps averaged at the matched-t point


def load_trace(run):
    """Concatenated (step, energy) from artifacts + live runs CSVs."""
    rows = {}
    paths = sorted(glob.glob(f"artifacts/{run}/train_states.t*.csv.gz"))
    live = f"runs/{run}/train_states.csv"
    for p in paths + ([live] if os.path.exists(live) else []):
        try:
            if p.endswith(".gz"):
                with gzip.open(p, "rt") as f:
                    txt = f.read()
            else:
                with open(p) as f:
                    txt = f.read()
            data = np.genfromtxt(io.StringIO(txt), delimiter=",", names=True,
                                 invalid_raise=False)
            if data.size == 0:
                continue
            steps = np.atleast_1d(data["step"])
            energies = np.atleast_1d(data["energy"])
            for s, e in zip(steps, energies):
                if np.isfinite(s) and np.isfinite(e):
                    rows[int(s)] = float(e)
        except Exception as exc:  # a truncated/malformed leg must not gate
            print(f"gate: skipped {p}: {exc}", file=sys.stderr)
    if not rows:
        return np.zeros((0, 2))
    steps = np.array(sorted(rows))
    return np.stack([steps, np.array([rows[s] for s in steps])], axis=1)


def window_median(trace, t):
    sel = (trace[:, 0] > t - WINDOW) & (trace[:, 0] <= t)
    if sel.sum() < 50:
        return None
    return float(np.median(trace[sel, 1]))


def main():
    pub = load_trace("c_pubform")
    if pub.shape[0] == 0:
        print("gate: no pubform trace yet", file=sys.stderr)
        print("CONTINUE")
        return
    t = pub[-1, 0]
    if t < GATE_T:
        print(f"gate: t={t:.0f} < gate_t={GATE_T:.0f}", file=sys.stderr)
        print("CONTINUE")
        return
    pub_e = window_median(pub, t)
    base_name, base_e = None, None
    for cand in ("c_kfac_fstream", "c_kfac_wide"):
        tr = load_trace(cand)
        if tr.shape[0] == 0:
            continue
        e = window_median(tr, t)
        if e is not None:
            base_name, base_e = cand, e
            break
    if pub_e is None or base_e is None:
        print("gate: insufficient matched-t overlap", file=sys.stderr)
        print("CONTINUE")
        return
    diff_mha = (pub_e - base_e) * 1000.0
    print(f"gate: t={t:.0f} pubform={pub_e:.5f} {base_name}={base_e:.5f} "
          f"diff={diff_mha:+.2f} mHa (gate {GATE_MHA} mHa)", file=sys.stderr)
    print("SWITCH" if diff_mha > GATE_MHA else "CONTINUE")


if __name__ == "__main__":
    main()
