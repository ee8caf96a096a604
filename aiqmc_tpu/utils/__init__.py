from aiqmc_tpu.utils.utils import select_output  # noqa: F401
