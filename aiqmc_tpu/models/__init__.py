"""Wavefunction models (ref AIQMCrelease3/wavefunction_Ynlm/*)."""

from aiqmc_tpu.models.network import (  # noqa: F401
    AINetData,
    Network,
    make_ai_net,
)
from aiqmc_tpu.models.spin_indices import (  # noqa: F401
    jastrow_indices_ee,
    jastrow_indices_ae,
    spin_indices_h,
)
