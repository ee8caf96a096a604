"""DMC time-step bias study on the C ccECP atom: rerun run_c_ccecp_dmc at a
smaller tau and compare the mixed estimator (linear tau -> 0 extrapolation
with the tau=0.02 run in runs/c_dmc5).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_dmc_tau.py <vmc_ckpt_dir> <tau> [blocks] [save]
"""
import subprocess
import sys

ckpt = sys.argv[1]
tau = sys.argv[2]
blocks = sys.argv[3] if len(sys.argv) > 3 else "60"
save = sys.argv[4] if len(sys.argv) > 4 else f"/root/repo/runs/c_dmc_tau{tau}"

subprocess.run(
    [sys.executable, "-u", "scripts/run_c_ccecp_dmc.py", ckpt, blocks, "40",
     save, tau], check=True)
