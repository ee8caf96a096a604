"""Cross-DEVICE local-energy oracle: chip vs CPU on IDENTICAL inputs.

Thin CLI over ``aiqmc_tpu.diagnostics.cross_device_check`` (the backend trust
gate — see that module for the methodology and the 2026-08-18 bf16-precision
incident it catches). Chip queues grep this script's stdout for
"CROSS-DEVICE PASS" before running any physics stage.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_el_cross_device.py [real|pair|both]
"""
import sys

sys.path.insert(0, "/root/repo")

from aiqmc_tpu import diagnostics


def main():
    modes_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
    modes = ("real", "pair") if modes_arg == "both" else (modes_arg,)
    report = diagnostics.cross_device_check(modes=modes, verbose=True)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
