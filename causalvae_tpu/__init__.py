"""causalvae_tpu — a TPU-native causal-VAE framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
``bjo5029/causal-vae`` research stack (see SURVEY.md): causal VAEs over the
structural model T -> M -> X with exogenous style Z, on-device morphological
measurement, batched do-intervention counterfactual decoding, k-fold /
ensemble / Monte-Carlo parallelism over a TPU mesh, and the full analysis
suite (mechanism validity, residual leakage, mediation, uncertainty, SNR,
latent translation, cascade sensitivity).

Layout:
  config    — dataclass config tree (replaces per-package CONFIG dicts)
  models    — flax modules: the causal-VAE family, ViT backbone, heads
  ops       — morphology measurement (host + on-device), fused losses,
              Pallas kernels
  data      — input pipelines (MNIST/IDX, vessel tiff, synthetic fixtures)
  train     — jitted train steps, adversarial two-optimizer step, k-fold
              driver, orbax checkpointing + torch-port smart loader
  parallel  — device mesh + sharding helpers (DP batch axis, fold/ensemble
              vmap axes)
  scm       — abduct/do/decode intervention engine, ensemble decode,
              uncertainty extraction
  analysis  — evaluation pipelines with the reference's CSV/PNG artifact
              contracts
  cli       — entry points (train / analyze / evaluate / counterfactual)
"""

__version__ = "0.1.0"
