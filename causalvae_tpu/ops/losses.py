"""Loss functions for every workload — pure-XLA, fully fusable.

Each function mirrors one of the reference's loss recipes exactly (citations
inline). Everything is written to live inside a single jitted train step so
XLA fuses the elementwise work into the surrounding convolutions/reductions;
the vessel ELBO additionally has a fused Pallas kernel variant in
ops/kernels/elbo.py used on TPU for the full-resolution case.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _wsum(per_elem: Array, w: Optional[Array]) -> Array:
    """Full sum, or per-sample sums weighted by ``w`` (shape (B,)).

    ``w`` carries validity masks for padded batches (e.g. ragged k-fold val
    sets padded to a common length): weight 0 removes a sample from every
    reduction exactly, so padded entries never bias metrics."""
    if w is None:
        return jnp.sum(per_elem)
    axes = tuple(range(1, per_elem.ndim))
    return jnp.sum(jnp.sum(per_elem, axis=axes) * w.astype(jnp.float32))


def bce_sum(recon: Array, x: Array, w: Optional[Array] = None) -> Array:
    """Summed binary cross-entropy, torch F.binary_cross_entropy semantics
    (log clamped at -100; ref mnist_test/01 train.py:70)."""
    r = recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    logr = jnp.maximum(jnp.log(r), -100.0)
    log1mr = jnp.maximum(jnp.log1p(-r), -100.0)
    return _wsum(-(x * logr + (1.0 - x) * log1mr), w)


def kld_sum(mu: Array, logvar: Array, w: Optional[Array] = None) -> Array:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar))  (ref train.py:71)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * _wsum(1.0 + logvar - mu * mu - jnp.exp(logvar), w)


def mse_sum(a: Array, b: Array, w: Optional[Array] = None) -> Array:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return _wsum(d * d, w)


def gaussian_nll_sum(
    m: Array, m_mu: Array, m_logvar: Array, w: Optional[Array] = None
) -> Array:
    """0.5 * sum(logvar + (m - mu)^2 / var) — the probabilistic morph loss
    (ref mnist_test/06 train.py:73-80, vessel train_kfold.py:43-47)."""
    m = m.astype(jnp.float32)
    m_mu = m_mu.astype(jnp.float32)
    m_logvar = m_logvar.astype(jnp.float32)
    return 0.5 * _wsum(m_logvar + (m - m_mu) ** 2 / jnp.exp(m_logvar), w)


def discriminator_ce(logits: Array, t_idx: Array) -> Array:
    """Mean cross-entropy for the D step (ref mnist_test/01 train.py:56)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, t_idx[:, None], axis=1))


def confusion_kl(logits: Array, t_dim: int) -> Array:
    """KL(uniform || softmax(logits)), batchmean — the VAE's confusion loss
    driving D's output to uniform (ref mnist_test/01 train.py:78-85, torch
    F.kl_div(log_probs, uniform, reduction='batchmean'))."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    u = 1.0 / t_dim
    per_elem = u * (jnp.log(jnp.float32(u)) - logp)
    return jnp.sum(per_elem) / logits.shape[0]


def mnist_vae_loss(
    out,
    x: Array,
    m: Array,
    d_logits_fake: Array,
    *,
    beta: float = 1.0,
    lambda_adv: float = 10.0,
    lambda_morph: float = 100.0,
    t_dim: int = 10,
    w: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Full MNIST adversarial VAE objective (ref mnist_test/01 train.py:65-89):
    BCE_sum + beta*KLD + 100*MSE(m_hat, m) + 100*lambda_adv*confusion."""
    loss_recon = bce_sum(out.recon_x, x, w)
    loss_kld = kld_sum(out.mu, out.logvar, w) * beta
    loss_morph = mse_sum(out.m_hat, m, w) * lambda_morph
    loss_adv = confusion_kl(d_logits_fake, t_dim) * lambda_adv * 100.0
    total = loss_recon + loss_kld + loss_morph + loss_adv
    return total, {
        "loss": total,
        "recon": loss_recon,
        "kld": loss_kld,
        "morph": loss_morph,
        "adv": loss_adv,
    }


def mnist_bayes_vae_loss(
    out, x: Array, m: Array, d_logits_fake: Array,
    *, beta: float = 1.0, lambda_adv: float = 10.0, t_dim: int = 10,
) -> Tuple[Array, Dict[str, Array]]:
    """Bayesian variant: morph MSE replaced by Gaussian NLL
    (ref mnist_test/06 train.py:73-80)."""
    loss_recon = bce_sum(out.recon_x, x)
    loss_kld = kld_sum(out.mu, out.logvar) * beta
    loss_morph = gaussian_nll_sum(m, out.m_mu, out.m_logvar)
    loss_adv = confusion_kl(d_logits_fake, t_dim) * lambda_adv * 100.0
    total = loss_recon + loss_kld + loss_morph + loss_adv
    return total, {
        "loss": total,
        "recon": loss_recon,
        "kld": loss_kld,
        "morph": loss_morph,
        "adv": loss_adv,
    }


def vessel_recon_terms(
    recon: Array, x: Array, w: Optional[Array] = None
) -> Tuple[Array, Array]:
    """Weighted MSE + background sparsity for vessel images
    (ref vessel_analysis/01_train/train_kfold.py:20-46).

    pos_weight = clamp((1 - pos_frac) / pos_frac, 1, 50) from the batch's own
    foreground fraction (stop-gradient, matching torch.no_grad); weight map
    1 + (pos_weight - 1) * x; sparsity = sum |recon| where x < 0.1. With a
    sample mask ``w`` the foreground fraction is computed over valid samples
    only and masked samples drop out of both reductions."""
    recon = recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    if w is None:
        n_pos = jnp.sum(x)
        size = jnp.float32(x.size)
    else:
        wb = w.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        n_pos = jnp.sum(x * wb)
        size = jnp.sum(w.astype(jnp.float32)) * (x.size / x.shape[0])
    pos_fraction = n_pos / (size + 1e-6)
    pw = (1.0 - pos_fraction) / (pos_fraction + 1e-6)
    pos_weight = jax.lax.stop_gradient(jnp.clip(pw, 1.0, 50.0))
    weight = 1.0 + (pos_weight - 1.0) * x
    recon_loss = _wsum((recon - x) ** 2 * weight, w)
    sparsity = _wsum(jnp.abs(recon) * (x < 0.1), w)
    return recon_loss, sparsity


def vessel_loss(
    out, x: Array, m: Array,
    *, beta: float = 0.5, lambda_morph: float = 10000.0, lambda_sparsity: float = 0.3,
    w: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Total vessel objective (ref train_kfold.py:66-71):
    recon + beta*KLD + lambda_morph*NLL + 0.3*sparsity.

    The image terms run through the single-pass Pallas reduction on TPU
    (ops/kernels/elbo.py; XLA fallback elsewhere). A sample mask ``w``
    (padded-batch eval) routes through the XLA formulation."""
    if w is None:
        from causalvae_tpu.ops.kernels.elbo import vessel_recon_terms_fused

        recon_loss, sparsity = vessel_recon_terms_fused(out.recon_x, x)
    else:
        recon_loss, sparsity = vessel_recon_terms(out.recon_x, x, w)
    loss_kld = kld_sum(out.mu, out.logvar, w)
    loss_morph = gaussian_nll_sum(m, out.m_mu, out.m_logvar, w)
    total = recon_loss + beta * loss_kld + lambda_morph * loss_morph + lambda_sparsity * sparsity
    return total, {
        "loss": total,
        "recon": recon_loss,
        "kld": loss_kld,
        "morph": loss_morph,
        "sparsity": sparsity,
    }


def cvae_loss(recon: Array, x: Array, mu: Array, logvar: Array, *, beta: float = 1.0):
    """Standard CVAE: BCE_sum + beta*KLD (ref mnist_test/03 cvae_train.py:28-47)."""
    loss_recon = bce_sum(recon, x)
    loss_kld = kld_sum(mu, logvar) * beta
    total = loss_recon + loss_kld
    return total, {"loss": total, "recon": loss_recon, "kld": loss_kld}


def cascade_loss(out, x: Array, m: Array, *, gamma: float = 2000.0):
    """MSE_sum + gamma*MSE(m_hat, m)_sum + KLD (ref causal_cascade/train.py:5-17)."""
    loss_recon = mse_sum(out.recon_x, x)
    loss_m = mse_sum(out.m_hat, m)
    loss_kld = kld_sum(out.mu, out.logvar)
    total = loss_recon + gamma * loss_m + loss_kld
    return total, {"loss": total, "recon": loss_recon, "morph": loss_m, "kld": loss_kld}


def vit_vae_loss(recon: Array, x: Array, mu: Array, logvar: Array, *, beta: float = 1.0):
    """Mean MSE + beta * mean KLD (ref latent_translator/engine.py:22-29)."""
    recon = recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    recon_loss = jnp.mean((recon - x) ** 2)
    kld = -0.5 * jnp.mean(
        1.0 + logvar.astype(jnp.float32) - mu.astype(jnp.float32) ** 2
        - jnp.exp(logvar.astype(jnp.float32))
    )
    total = recon_loss + beta * kld
    return total, {"loss": total, "recon": recon_loss, "kld": kld}
