"""The latent causal-mechanism layer: T -> M.

The reference hard-wires the fixed 3-node graph T -> M -> X into each model's
forward; its mechanism is an MLP M' = f(T), either deterministic
(ref mnist_test/01_baseline_causal_vae/models.py:33-37) or a Gaussian head
P(M|T) = N(mu(T), sigma^2(T)) (ref mnist_test/06_model_experiment/
models.py:34-39, vessel_analysis/00_core/models.py:53-60, and with BatchNorm in
causal_cascade/models.py:34-41).

``MorphPredictor`` covers all of those. ``DAGMechanism`` generalizes the layer
to an explicit masked-adjacency structural equation over named factor groups —
one batched on-device op (a mask * weight matmul), per the BASELINE.json north
star — and reduces exactly to MorphPredictor for the T->M graph.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class MorphPredictor(nn.Module):
    """MLP mechanism T -> M with optional Gaussian (mu, logvar) head.

    hidden:       widths of the shared trunk
    gaussian:     False -> deterministic M' (ref 01 models.py:33-37);
                  True  -> (m_mu, m_logvar) heads (ref 06 models.py:34-39)
    activation:   'relu' (mnist) or 'leaky_relu' (vessel, slope 0.2)
    bn_layers:    hidden-layer indices followed by BatchNorm1d; the cascade
                  mechanism_net norms its first hidden layer only
                  (ref causal_cascade/models.py:34-41)
    logvar_clip:  vessel clamps m_logvar to [-10, 10]
                  (ref vessel_analysis/00_core/models.py:156)
    """

    m_dim: int
    hidden: Sequence[int] = (128,)
    gaussian: bool = False
    activation: str = "relu"
    bn_layers: Sequence[int] = ()
    logvar_clip: Optional[float] = 10.0
    dtype: jnp.dtype = jnp.float32

    def _act(self, x):
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=0.2)
        return nn.relu(x)

    @nn.compact
    def __call__(self, t: jnp.ndarray, train: bool = False):
        h = t.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            h = nn.Dense(width, dtype=self.dtype, name=f"shared_{i}")(h)
            if i in self.bn_layers:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"shared_bn_{i}",
                    dtype=self.dtype,
                )(h)
            h = self._act(h)
        if not self.gaussian:
            return nn.Dense(self.m_dim, dtype=self.dtype, name="out")(h)
        m_mu = nn.Dense(self.m_dim, dtype=self.dtype, name="mu")(h)
        m_logvar = nn.Dense(self.m_dim, dtype=self.dtype, name="logvar")(h)
        if self.logvar_clip is not None:
            m_logvar = jnp.clip(m_logvar, -self.logvar_clip, self.logvar_clip)
        return m_mu, m_logvar

    def mean(self, t: jnp.ndarray):
        """Mean prediction only (ref 06 models.py:52-55 helper)."""
        out = self(t)
        return out[0] if self.gaussian else out


class DAGMechanism(nn.Module):
    """Masked-adjacency structural-equation layer over named factor groups.

    Factors are concatenated blocks of one vector; ``adjacency[i, j] = 1``
    allows factor i to influence factor j. Each factor j is produced by an MLP
    over the masked concatenation of its parents — computed for all factors in
    one batched matmul pass (mask applied to the input projection), so the op
    lands on the MXU whole.

    With factors=(('t', t_dim), ('m', m_dim)) and adjacency t->m this is
    exactly MorphPredictor; larger graphs generalize the reference's fixed
    T->M->X (SURVEY.md §0 'latent causal-mechanism layer').
    """

    factors: Sequence[Tuple[str, int]]
    adjacency: jnp.ndarray  # (n_factors, n_factors) 0/1, parents -> children
    hidden: int = 64
    gaussian: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, values: jnp.ndarray):
        """values: (..., sum(dims)) concatenated factor values (parents set).

        Returns predictions for every factor (same layout); roots reproduce
        their input. With gaussian=True returns (mu, logvar)."""
        import numpy as np

        dims = [d for _, d in self.factors]
        total = sum(dims)
        n = len(dims)
        adj_np = np.asarray(self.adjacency)
        # per-factor input mask over the concatenated vector (static constant)
        col_factor = np.concatenate(
            [np.full((d,), i, np.int32) for i, d in enumerate(dims)]
        )
        in_mask = jnp.asarray(adj_np[col_factor, :], self.dtype)  # (total, n)
        x = values.astype(self.dtype)

        # one grouped projection: for each child j, W_j (total -> hidden) with
        # masked rows; realized as a single (total, n*hidden) matmul
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (total, n * self.hidden), self.dtype
        )
        b1 = self.param("b1", nn.initializers.zeros, (n * self.hidden,), self.dtype)
        mask1 = jnp.repeat(in_mask, self.hidden, axis=1)  # (total, n*hidden)
        h = jnp.dot(x, w1 * mask1) + b1
        h = nn.relu(h)
        h = h.reshape(*x.shape[:-1], n, self.hidden)

        heads = 2 if self.gaussian else 1
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (n, self.hidden, heads * max(dims)), self.dtype
        )
        b2 = self.param("b2", nn.initializers.zeros, (n, heads * max(dims)), self.dtype)
        out = jnp.einsum("...nh,nhd->...nd", h, w2) + b2

        def gather(which: int):
            parts = []
            for i, d in enumerate(dims):
                parts.append(out[..., i, which * max(dims) : which * max(dims) + d])
            return jnp.concatenate(parts, axis=-1)

        has_parents = adj_np.sum(axis=0) > 0
        keep = jnp.asarray(
            np.concatenate([np.full((d,), bool(has_parents[i])) for i, d in enumerate(dims)])
        )
        mu = jnp.where(keep, gather(0), x)
        if not self.gaussian:
            return mu
        logvar = jnp.where(keep, jnp.clip(gather(1), -10.0, 10.0), 0.0)
        return mu, logvar
