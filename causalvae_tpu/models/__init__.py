"""Flax model zoo: the causal-VAE family over the structural model T->M->X.

Components (SURVEY.md §2.1 inventory):
  CausalConvVAE     — C1/C4: MNIST causal VAE, deterministic or Gaussian
                      mechanism head
  LatentDiscriminator — C2: adversarial z->T head
  SimpleClassifier  — C3: external CNN eval classifier
  ConditionalVAE    — C5: T->X CVAE (no M)
  MDecoder          — C6: M->X / (M,T)->X conditional-independence probes
  CausalVesselVAE   — C7: full-res vessel causal VAE (CNN)
  ViTVAE            — C8: hybrid conv-stem ViT VAE backbone
  CausalViTVAE      — C9: causal adapter wrapper around ViTVAE
  CausalBioVAE      — C10: compact resolution-agnostic cascade VAE
  MorphPredictor / DAGMechanism — the latent causal-mechanism layer
"""

from causalvae_tpu.models.mechanism import DAGMechanism, MorphPredictor
from causalvae_tpu.models.vae import (
    CausalBioVAE,
    CausalConvVAE,
    CausalVesselVAE,
    ConditionalVAE,
    MDecoder,
    VAEOutput,
    reparameterize,
)
from causalvae_tpu.models.heads import LatentDiscriminator, SimpleClassifier
from causalvae_tpu.models.vit import CausalViTVAE, ViTVAE

__all__ = [
    "CausalBioVAE",
    "CausalConvVAE",
    "CausalVesselVAE",
    "CausalViTVAE",
    "ConditionalVAE",
    "DAGMechanism",
    "LatentDiscriminator",
    "MDecoder",
    "MorphPredictor",
    "SimpleClassifier",
    "VAEOutput",
    "ViTVAE",
    "reparameterize",
]
