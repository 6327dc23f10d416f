"""disentagled_multimodal_fusion_tpu — TPU-native disentangled multimodal fusion.

A brand-new JAX / XLA / pjit / Pallas framework with the capabilities of the
PyTorch reference `Hassan-Sarwat/disentagled_multimodal_fusion`:

* ``ops``      — pure-function evidence / Dirichlet / Gaussian / contrastive math
* ``models``   — flax.linen model zoo (DMVAE, DisentangledSSL, probes, baselines)
* ``core``     — jitted device-resident training harness (scan-per-epoch), checkpointing
* ``parallel`` — TPU mesh construction and dp/tp sharding rules
* ``data``     — multi-view .mat loaders, synthetic generators, LUMA pipeline
* ``eval``     — subjective-model evaluation + metrics flattening/reporting
* ``runners``  — entry points matching the reference's run.py / run_synthetic.py / run_luma.py
"""

__version__ = "0.1.0"
