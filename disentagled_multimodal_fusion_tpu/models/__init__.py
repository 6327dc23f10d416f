"""flax.linen model zoo.

* ``layers``          — MLP / EvidentialNN head / encoder zoo (Identity, Image, Audio, Text)
* ``dmvae``           — N-modal DMVAE backbone with PoE shared/private split
* ``disentangledssl`` — 2-modal contrastive disentangler (SupCon + ortho + vMF heads)
* ``probes``          — evidential probes over frozen backbone embeddings
* ``baselines``       — LateFusion / IntermediateFusion evidential baselines
* ``fusions``         — generic fusion-op library (Concat .. LowRankTensorFusion ..)
"""

from .layers import MLP, EvidentialNN, IdentityEncoder, ImageEncoder, AudioEncoder, TextEncoder
from .dmvae import DMVAE, dmvae_loss
from .probes import EvidentialProbe, DisentangledEvidentialProbe
from .baselines import LateFusion, IntermediateFusion
from .disentangledssl import DisentangledSSL
