"""Pure-function ops: evidence activation, Dirichlet/EDL math, fusion rules,
Gaussian PoE, contrastive losses, annealing schedulers.

All functions are jit-/vmap-/grad-friendly: no Python-level data-dependent
control flow, explicit RNG keys, float32 math (TPU matmuls may still use
bf16 inputs upstream; loss math stays f32 for calibration parity).
"""

from .evidence import (
    evidence_activation,
    cml_fusion,
    avg_fusion,
    disentangled_fusion,
    joint_fusion,
    discounted_belief_fusion,
    AGGREGATIONS,
)
from .dirichlet import (
    dirichlet_kl_to_uniform,
    edl_digamma_loss,
    dc_loss,
    avg_trusted_loss,
    single_evidential_loss,
    dirichlet_uncertainties,
)
from .gaussian import (
    reparameterize,
    gaussian_kl_standard,
    product_of_experts,
)
from .contrastive import supcon_loss, ortho_loss
from .schedulers import linear_schedule, exponential_schedule
