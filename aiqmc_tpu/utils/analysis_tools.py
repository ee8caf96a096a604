"""Training-log analysis helpers.

Capability parity with ref ``ferminet/utils/analysis_tools.py:47-113``: load a
train_states.csv, report reblocked energy estimates and equilibration-aware
means (pandas-free; numpy + csv only).
"""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np

from aiqmc_tpu.utils.statistics import blocked_error


def read_train_stats(path: str) -> Dict[str, np.ndarray]:
    """Reads a train_states.csv into {column: array} (non-numeric -> nan)."""
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = {}
    if not rows:
        return out
    for key in rows[0]:
        vals = []
        for r in rows:
            try:
                vals.append(float(r[key]))
            except (TypeError, ValueError):
                vals.append(np.nan)
        out[key] = np.asarray(vals)
    return out


def estimate_energy(path: str, burn_fraction: float = 0.2,
                    block_size: Optional[int] = None) -> Dict[str, float]:
    """Equilibration-discarded mean energy with reblocked error bars."""
    stats = read_train_stats(path)
    e = stats["energy"]
    e = e[np.isfinite(e)]
    tail = e[int(len(e) * burn_fraction):]
    return {
        "energy": float(tail.mean()),
        "stderr": blocked_error(tail, block_size),
        "sigma": float(tail.std()),
        "nsamples": int(tail.size),
    }


def mad_outlier_mask(x: np.ndarray, nmad: float = 5.0) -> np.ndarray:
    """True for samples within ``nmad`` scaled MADs of the median.

    The per-step/per-block energy distribution of a QMC run is fat-tailed (a
    walker pinned near a node, a population fluctuation in DMC): a single
    pathological sample can dominate the naive mean — e.g. one -5.876 block
    shifted a 60-block DMC mean by 15 mHa (BASELINE.md, runs/c_dmc_big). The
    MAD-based mask is the standard robust filter: 1.4826*MAD estimates sigma
    for a Gaussian core, so nmad=5 keeps ~all clean samples.
    """
    x = np.asarray(x)
    finite = np.isfinite(x)
    if not finite.any():
        return finite
    med = np.median(x[finite])
    mad = np.median(np.abs(x[finite] - med)) * 1.4826
    if mad == 0.0:
        return finite
    return finite & (np.abs(x - med) <= nmad * mad)


def robust_estimate_energy(path: str, burn_fraction: float = 0.2,
                           block_size: Optional[int] = None,
                           nmad: float = 5.0) -> Dict[str, float]:
    """`estimate_energy` with MAD outlier rejection on the tail samples."""
    stats = read_train_stats(path)
    e = stats["energy"]
    e = e[np.isfinite(e)]
    tail = e[int(len(e) * burn_fraction):]
    mask = mad_outlier_mask(tail, nmad)
    kept = tail[mask]
    return {
        "energy": float(kept.mean()),
        "stderr": blocked_error(kept, block_size),
        "sigma": float(kept.std()),
        "median": float(np.median(tail)),
        "nsamples": int(kept.size),
        "noutliers": int(tail.size - kept.size),
    }


def tabc_average(runs, burn_fraction: float = 0.2,
                 nmad: float = 5.0) -> Dict[str, float]:
    """Twist-averaged boundary-condition energy over twist-trained runs.

    TABC (ref capability ceiling: ferminet/pbc twist handling; Lin, Zong &
    Ceperley 2001): E_TABC = sum_k w_k E_k / sum_k w_k over the inequivalent
    twists of a Monkhorst-Pack grid, with w_k the symmetry multiplicities
    (e.g. the fcc 2x2x2 grid has two classes, weights 2:6). Each run's energy
    comes from `robust_estimate_energy`; errors combine in quadrature with
    the same weights.

    Args:
      runs: iterable of (weight, train_states_csv_path).
    """
    wsum = 0.0
    esum = 0.0
    var = 0.0
    per_twist = []
    for weight, path in runs:
        est = robust_estimate_energy(path, burn_fraction=burn_fraction,
                                     nmad=nmad)
        wsum += weight
        esum += weight * est["energy"]
        var += (weight * est["stderr"]) ** 2
        per_twist.append({"weight": weight, **est})
    return {
        "energy": esum / wsum,
        "stderr": float(np.sqrt(var) / wsum),
        "per_twist": per_twist,
    }


def robust_block_stats(blocks: np.ndarray, nmad: float = 5.0
                       ) -> Dict[str, float]:
    """Robust mean/stderr over DMC block energies (MAD-trimmed)."""
    blocks = np.asarray(blocks, dtype=float)
    mask = mad_outlier_mask(blocks, nmad)
    kept = blocks[mask]
    return {
        "mean": float(kept.mean()),
        "stderr": float(kept.std() / np.sqrt(max(1, kept.size))),
        "median": float(np.median(blocks[np.isfinite(blocks)])),
        "nblocks": int(kept.size),
        "noutliers": int(blocks.size - kept.size),
    }


def excited_state_summary(path: str, states: int,
                          burn_fraction: float = 0.2,
                          degeneracy_tol: float = 5e-3) -> Dict[str, object]:
    """Spectroscopy summary of a NES-VMC excited-states run.

    Consumes the per-state energy columns and the S^2 / dipole STATE-MATRIX
    columns the train loop logs for ``cfg.system.states`` runs
    (``s2_ij``, ``dipole_{x,y,z}_ij``) and reports, per excited state k:

      * the vertical excitation energy dE_k = E_k - E_0 (Ha),
      * <S^2>_k (state purity / multiplicity diagnostic),
      * the transition dipole strength |<0|r|k>|^2 and the length-gauge
        oscillator strength f_0k = (2/3) dE_k |<0|r|k>|^2.

    NES-VMC states are unnormalised and non-orthogonal, so a single
    off-diagonal matrix element carries normalisation factors; the PRODUCT
    O_0k * O_k0 of the Monte-Carlo state-matrix expectations cancels them
    exactly (Pfau, Axelrod, Huang & Cassella 2023, "Natural excited states
    of quantum systems" — the same recipe the upstream applies to its
    observable matrices), giving the physical |<0|O|k>|^2 per component.

    Degenerate subtlety (measured on the Li showcase): the product identity
    assumes the trained states are the (orthogonal) eigenstates. Within a
    DEGENERATE multiplet (e.g. the three Li 2P components) the NES objective
    only enforces linear independence, so the converged states are arbitrary
    non-orthogonal mixtures and the raw-basis product can even go
    systematically negative. Both estimator matrices converge to
    S^{-1}·O_phys in the trained basis, so a similarity transform by the
    eigenvectors V of the energy matrix moves every observable matrix into
    the (orthogonal up to degeneracy) eigenbasis, where the product identity
    holds state-by-state; within a residual quasi-degenerate block the
    block-SUM of products is invariant under the remaining basis freedom and
    equals the total line strength into the multiplet. This routine
    therefore (a) transforms the dipole matrices by V before forming
    products and (b) also reports block-summed strengths for clusters closer
    than ``degeneracy_tol``.
    """
    stats = read_train_stats(path)
    burn = int(len(stats["energy"]) * burn_fraction)

    def col_mean(name):
        v = stats[name][burn:]
        v = v[np.isfinite(v)]
        return float(v.mean()) if v.size else float("nan")

    energies = [col_mean(f"energy_state_{k}") for k in range(states)]
    out: Dict[str, object] = {"energies": energies}
    eigvecs = None
    if f"energy_mat_{0}{0}" in stats:
        # Eigen-decomposition of the mean energy matrix: NES-VMC states are
        # non-orthogonal, so the raw diagonal mixes states; diagonalising
        # E[M^{-1} H M] (Pfau et al. 2023 eq. for the energy estimator)
        # unmixes them. The eigenVECTORS define the change of basis every
        # observable matrix must follow (see docstring).
        mat = np.array([[col_mean(f"energy_mat_{i}{j}")
                         for j in range(states)] for i in range(states)])
        w, v = np.linalg.eig(mat)
        # The mean energy matrix is noisy and non-symmetric, so quasi-
        # degenerate states can produce a complex-conjugate eigenpair; taking
        # .real of everything downstream would then silently discard
        # imaginary parts of uncontrolled size (ADVICE round-4). Detect and
        # surface it: report the relative imaginary magnitude and warn so a
        # degenerate-noise artefact is not read as a physical strength.
        imag_rel = float(np.max(np.abs(w.imag)) /
                         max(np.max(np.abs(w.real)), 1e-300))
        if imag_rel > 1e-8:
            out["energy_eig_imag_rel"] = imag_rel
        if imag_rel > 1e-3:
            import warnings
            warnings.warn(
                "excited_state_summary: energy-matrix eigenvalues have "
                f"relative imaginary magnitude {imag_rel:.2e} (noisy quasi-"
                "degenerate block); eigenbasis-transformed dipole strengths "
                "for the affected block are unreliable — trust only the "
                "block-summed multiplet strengths.")
        order = np.argsort(w.real)
        out["energies_eig"] = w.real[order].tolist()
        eigvecs = v[:, order]
    if f"s2_{0}{0}" in stats:
        out["s2"] = [col_mean(f"s2_{k}{k}") for k in range(states)]
    if f"dipole_x_{0}{0}" in stats:
        e_for_de = out.get("energies_eig", energies)
        dip = {}
        for d in "xyz":
            m = np.array([[col_mean(f"dipole_{d}_{i}{j}")
                           for j in range(states)] for i in range(states)])
            if eigvecs is not None:
                m = np.linalg.solve(eigvecs, m @ eigvecs).real
            dip[d] = m
        transitions = []
        for k in range(1, states):
            de = e_for_de[k] - e_for_de[0]
            d2 = sum(dip[d][0, k] * dip[d][k, 0] for d in "xyz")
            transitions.append({
                "state": k,
                "excitation_ha": de,
                "dipole_strength": d2,
                "oscillator_strength": 2.0 / 3.0 * de * d2,
            })
        out["transitions"] = transitions
        # Quasi-degenerate multiplets: per-state strengths inside a block
        # depend on the residual basis freedom; their block SUM does not.
        blocks, cur = [], [1]
        for k in range(2, states):
            if abs(e_for_de[k] - e_for_de[cur[-1]]) < degeneracy_tol:
                cur.append(k)
            else:
                blocks.append(cur)
                cur = [k]
        blocks.append(cur)
        multiplets = []
        for blk in blocks:
            if len(blk) < 2:
                continue
            d2 = sum(dip[d][0, k] * dip[d][k, 0] for d in "xyz" for k in blk)
            de = float(np.mean([e_for_de[k] for k in blk])) - e_for_de[0]
            multiplets.append({
                "states": list(blk),
                "excitation_ha": de,
                "dipole_strength_total": d2,
                "oscillator_strength_total": 2.0 / 3.0 * de * d2,
            })
        if multiplets:
            out["multiplets"] = multiplets
    return out


def vmc_convergence_fit(traces, t_min: float = 2000.0,
                        window: int = 1000, nmad: float = 5.0,
                        targets=(), target_energies=()):
    """Power-law extrapolation of a (multi-leg) VMC optimisation trajectory.

    KFAC/natural-gradient VMC under a 1/(1+t/t0) learning-rate schedule
    approaches its plateau as E(t) ~ E_inf + A * t^(-alpha) (empirically
    alpha ~ 0.5-1.5 on this workload; the round-2 flagship moved 1/t-slow,
    BASELINE.md 67k row). Fitting that tail answers the question a fixed
    session budget cannot: where does THIS arm converge, and how many
    iterations would a given bar cost?

    For fixed alpha the model is LINEAR in (E_inf, A), so the fit is a scan
    over alpha with a closed-form weighted least-squares solve per value —
    no optimiser, deterministic, and the covariance of (E_inf, A) at the
    best alpha gives the quoted uncertainty (alpha-scan spread is folded in
    as a systematic: the e_inf range over alphas within chi2_min + 1).

    Args:
      traces: iterable of train_states.csv paths (gzipped ok) covering
        successive legs of one run; concatenated on their step column.
      t_min: discard steps below this (the power law only holds past the
        early transient).
      window: iteration width of the robust averaging windows.
      targets: iterations at which to report the predicted energy.
      target_energies: energies (Ha) for which to report the predicted
        iteration count (inf if below the fitted asymptote).

    Returns dict with e_inf, e_inf_err (stat), e_inf_sys (alpha-scan
    spread), alpha, amplitude, chi2_dof, windows used, predictions.
    """
    import gzip

    steps_all, e_all = [], []
    for path in traces:
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt") as f:
            rows = list(csv.DictReader(f))
        for r in rows:
            try:
                steps_all.append(float(r["step"]))
                e_all.append(float(r["energy"]))
            except (KeyError, TypeError, ValueError):
                continue
    steps = np.asarray(steps_all)
    e = np.asarray(e_all)
    order = np.argsort(steps, kind="stable")
    steps, e = steps[order], e[order]
    keep = np.isfinite(e) & (steps >= t_min)
    steps, e = steps[keep], e[keep]
    if steps.size < 10:
        raise ValueError("not enough samples past t_min for a fit")

    # Robust window means (MAD-trimmed; QMC per-step energies are fat-tailed).
    t_w, y_w, s_w = [], [], []
    lo = steps.min()
    while lo < steps.max():
        hi = lo + window
        m = (steps >= lo) & (steps < hi)
        if m.sum() >= window // 4:
            kept = e[m][mad_outlier_mask(e[m], nmad)]
            t_w.append(float(steps[m].mean()))
            y_w.append(float(kept.mean()))
            s_w.append(float(kept.std() / np.sqrt(kept.size)))
        lo = hi
    t_w = np.asarray(t_w)
    y_w = np.asarray(y_w)
    s_w = np.maximum(np.asarray(s_w), 1e-12)
    if t_w.size < 4:
        raise ValueError("fewer than 4 fit windows; widen the trace")

    w = 1.0 / s_w ** 2
    best = None
    scan = []
    for alpha in np.linspace(0.2, 2.5, 231):
        x = t_w ** (-alpha)          # E = e_inf + A x: linear LSQ
        W = w.sum()
        xw, yw = (w * x).sum(), (w * y_w).sum()
        xx, xy = (w * x * x).sum(), (w * x * y_w).sum()
        det = W * xx - xw * xw
        if det <= 0:
            continue
        e_inf = (xx * yw - xw * xy) / det
        amp = (W * xy - xw * yw) / det
        chi2 = float((w * (y_w - e_inf - amp * x) ** 2).sum())
        scan.append((alpha, e_inf, amp, chi2, float(np.sqrt(xx / det))))
        if best is None or chi2 < best[3]:
            best = scan[-1]
    alpha, e_inf, amp, chi2, e_inf_err = best
    dof = max(1, t_w.size - 3)
    # Window errors only capture sampling noise; trajectory wiggle (lr-phase
    # changes, restore transients) shows up as chi2/dof > 1. Inflate the
    # parameter errors by sqrt(chi2/dof) (standard GLS error scaling) and
    # widen the alpha-scan acceptance band by the same factor, so the quoted
    # uncertainties reflect the actual scatter, not the nominal error bars.
    scale = max(1.0, chi2 / dof)
    e_inf_err *= float(np.sqrt(scale))
    # Systematic from the alpha scan: e_inf range over chi2 <= chi2_min + scale.
    ok = [s[1] for s in scan if s[3] <= chi2 + scale]
    e_inf_sys = float((max(ok) - min(ok)) / 2.0) if len(ok) > 1 else 0.0

    def predict(t):
        return float(e_inf + amp * t ** (-alpha))

    def iters_for(energy):
        if amp <= 0 or energy <= e_inf:
            return float("inf")
        return float((amp / (energy - e_inf)) ** (1.0 / alpha))

    return {
        "e_inf": float(e_inf), "e_inf_err": float(e_inf_err),
        "e_inf_sys": e_inf_sys, "alpha": float(alpha),
        "amplitude": float(amp), "chi2_dof": chi2 / dof,
        "n_windows": int(t_w.size),
        "t_range": (float(t_w.min()), float(t_w.max())),
        "predicted": {int(t): predict(t) for t in targets},
        "iters_for": {float(v): iters_for(v) for v in target_energies},
    }


def dmc_tau_extrapolation(runs, nmad: float = 5.0):
    """Linear time-step extrapolation of DMC energies to tau -> 0.

    Fixed-node DMC carries an O(tau) bias (Umrigar, Nightingale & Runge
    1993); production practice is to run 2-3 time steps and extrapolate.
    The reference ships no analysis for this (its DMC examples run a single
    tau); this closes that workflow gap.

    Args:
      runs: iterable of (tau, dmc_states_csv_path); each CSV is the DMC
        driver's block trace (block, energy, weight).

    Returns:
      {"e0": intercept (tau -> 0 energy), "e0_err": its standard error from
       the weighted least squares, "slope": dE/dtau, "per_tau": [...]}.
    """
    taus, means, errs = [], [], []
    per_tau = []
    for tau, path in runs:
        stats = read_train_stats(path)
        blocks = stats["energy"]
        blocks = blocks[np.isfinite(blocks)]
        # Discard the first 20% (projection transient), robust-trim the rest.
        blocks = blocks[int(0.2 * len(blocks)):]
        r = robust_block_stats(blocks, nmad=nmad)
        taus.append(float(tau))
        means.append(r["mean"])
        errs.append(max(r["stderr"], 1e-12))
        per_tau.append({"tau": float(tau), **r})
    if len(taus) < 2:
        raise ValueError("tau extrapolation needs >= 2 time steps")
    t = np.asarray(taus)
    y = np.asarray(means)
    w = 1.0 / np.asarray(errs) ** 2
    # Weighted least squares y = e0 + slope * tau.
    W = np.sum(w)
    tw, yw = np.sum(w * t), np.sum(w * y)
    tt, ty = np.sum(w * t * t), np.sum(w * t * y)
    det = W * tt - tw * tw
    e0 = (tt * yw - tw * ty) / det
    slope = (W * ty - tw * yw) / det
    e0_err = float(np.sqrt(tt / det))
    slope_err = float(np.sqrt(W / det))
    resid = y - (e0 + slope * t)
    chi2 = float(np.sum(w * resid ** 2))
    dof = len(taus) - 2
    return {"e0": float(e0), "e0_err": e0_err,
            "slope": float(slope), "slope_err": slope_err,
            "chi2": chi2, "dof": dof,
            "chi2_dof": chi2 / dof if dof > 0 else float("nan"),
            "per_tau": per_tau}
