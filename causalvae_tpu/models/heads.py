"""Auxiliary heads: adversarial latent discriminator + external classifier."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from causalvae_tpu.models.vae import conv


class LatentDiscriminator(nn.Module):
    """Adversarial head z -> T logits (C2, ref mnist_test/01_baseline_causal_vae/
    models.py:93-111): Dense 64 - LeakyReLU(0.2) - Dense 64 - LeakyReLU(0.2)
    - Dense t_dim."""

    t_dim: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.leaky_relu(nn.Dense(64, dtype=self.dtype)(z), 0.2)
        h = nn.leaky_relu(nn.Dense(64, dtype=self.dtype)(h), 0.2)
        return nn.Dense(self.t_dim, dtype=self.dtype)(h)


class SimpleClassifier(nn.Module):
    """External CNN eval classifier (C3, ref mnist_test/01 models.py:74-91):
    conv5x5 -> pool -> conv5x5 -> pool -> fc 320->50->10; returns the 50-d
    feature (for t-SNE) and log-softmax logits."""

    n_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv(10, 5, 1, 0, dtype=self.dtype)(x)
        h = nn.relu(nn.max_pool(h, (2, 2), strides=(2, 2)))
        h = conv(20, 5, 1, 0, dtype=self.dtype)(h)
        h = nn.relu(nn.max_pool(h, (2, 2), strides=(2, 2)))
        h = h.reshape(h.shape[0], -1)
        feature = nn.relu(nn.Dense(50, dtype=self.dtype)(h))
        out = nn.Dense(self.n_classes, dtype=self.dtype)(feature)
        return feature, nn.log_softmax(out, axis=-1)
