from aiqmc_tpu.sampling.init_electrons import init_electrons  # noqa: F401
