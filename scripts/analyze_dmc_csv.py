"""Final energy from a (possibly legged) DMC run's DMC_states.csv.

The wedge-tolerant queues run DMC as restartable legs appending to one block
CSV (aiqmc_tpu/dmc/driver.py writer `append=` on restart), so per-leg script
prints only cover the last leg; this reads the stitched trace, discards the
equilibration transient, weights blocks by their recorded population weight,
and reports robust (MAD-trimmed) and reblocked error bars.

Usage: python scripts/analyze_dmc_csv.py <dmc_save_dir_or_csv> [burn_fraction]
"""
import os
import sys

import numpy as np

from aiqmc_tpu.utils.analysis_tools import read_train_stats, robust_block_stats
from aiqmc_tpu.utils.statistics import blocked_error

path = sys.argv[1]
burn = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
if os.path.isdir(path):
    path = os.path.join(path, "DMC_states.csv")

stats = read_train_stats(path)
e, w = stats["energy"], stats["weight"]
ok = np.isfinite(e) & np.isfinite(w)
e, w = e[ok], w[ok]
n = len(e)
tail_e, tail_w = e[int(n * burn):], w[int(n * burn):]

plain = float(np.average(tail_e, weights=tail_w))
rb = robust_block_stats(tail_e)
print("blocks: %d total, %d after %.0f%% burn" % (n, len(tail_e), burn * 100))
print("weighted mean %.5f Ha | unweighted %.5f +- %.5f (reblocked) Ha"
      % (plain, tail_e.mean(), blocked_error(tail_e, None)))
print("robust (MAD-trimmed): %.5f +- %.5f Ha (median %.5f, %d/%d kept)"
      % (rb["mean"], rb["stderr"], rb["median"], rb["nblocks"], len(tail_e)))
