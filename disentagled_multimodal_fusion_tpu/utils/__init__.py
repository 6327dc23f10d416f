"""Reference-API compatibility surface.

The reference exposes its op toolbox as a flat ``utils`` module
(reference: utils.py). Users migrating from it can keep their imports:

    from disentagled_multimodal_fusion_tpu.utils import (
        activation_function, get_cml_fusion, discounted_belief_fusion, ...)

Each name maps onto the pure-JAX implementation in ``ops``; signatures
accept the same positional arguments (arrays are jnp instead of torch).
"""

from ..ops.evidence import (
    evidence_activation as activation_function,
    cml_fusion as get_cml_fusion,
    avg_fusion as get_avg_fusion,
    disentangled_fusion as get_disentangled_fusion,
    joint_fusion as get_joint_fusion,
    discounted_belief_fusion,
)
from ..ops.augment import augment_data, identity_fn as _identity  # noqa: F401
from ..ops.augment import noise, random_drop, swap
from ..ops.schedulers import exponential_schedule, linear_schedule


class LinearScheduler:
    """Stateful wrapper matching utils.py:15-29."""

    def __init__(self, start_value, end_value, n_iterations, start_iteration=0):
        self.args = (start_value, end_value, n_iterations, start_iteration)

    def __call__(self, iteration):
        return linear_schedule(iteration, *self.args)


class ExponentialScheduler:
    """Stateful wrapper matching utils.py:31-42."""

    def __init__(self, start_value, end_value, n_iterations, start_iteration=0, base=10):
        self.args = (start_value, end_value, n_iterations, start_iteration, base)

    def __call__(self, iteration):
        return exponential_schedule(iteration, *self.args)
