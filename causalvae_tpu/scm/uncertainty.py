"""Uncertainty extraction, SNR, and MC sampling — batched on device.

Covers the reference's uncertainty pipeline (SURVEY.md A8/A12/A14/A15, I4):
σ(T) heatmaps from the Gaussian mechanism head, ensemble-averaged aleatoric σ
per treatment, pairwise discriminative scores and SNR in real units, and
Monte-Carlo decode sampling. Each reference script loops folds/treatments in
Python; here each quantity is a single vmapped computation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def morph_sigma(model, variables, t: Array, logvar_clip: float = 10.0) -> Tuple[Array, Array]:
    """(m_mu, m_sigma) of P(M|T) for a batch of conditions — the per-digit /
    per-treatment uncertainty table (ref mnist_test/06 visualize.py:322-379,
    vessel analyze_vessel.py:27-66). σ = exp(0.5 · clamp(logvar))."""
    m_mu, m_logvar = model.apply(
        variables, t, method=lambda mdl, tt: mdl.morph(tt)
    )
    sigma = jnp.exp(0.5 * jnp.clip(m_logvar, -logvar_clip, logvar_clip))
    return m_mu, sigma


def all_conditions_sigma(model, variables, t_dim: int) -> Tuple[Array, Array]:
    """Mechanism (mu, sigma) for every one-hot condition at once."""
    return morph_sigma(model, variables, jnp.eye(t_dim, dtype=jnp.float32))


def ensemble_sigma_by_treatment(model, stacked_variables, t_dim: int):
    """Fold-mean aleatoric σ per (treatment, feature) — the
    uncertainty_by_treatment.csv quantity (ref vessel_analysis/
    05_analyze_uncertainty/extract_uncertainty_by_treatment.py:68-117).
    Returns (mu_mean, sigma_mean) of shape (t_dim, m_dim)."""
    t = jnp.eye(t_dim, dtype=jnp.float32)

    def one(v):
        return morph_sigma(model, v, t)

    mus, sigmas = jax.vmap(one)(stacked_variables)  # (K, T, m)
    return mus.mean(axis=0), sigmas.mean(axis=0)


def pairwise_snr(
    mu: Array, sigma: Array, scale: Optional[Array] = None
) -> Array:
    """SNR[i, j, f] = |mu_i - mu_j| / sqrt(sigma_i^2 + sigma_j^2) per feature
    for all treatment pairs at once (ref vessel_analysis/05_analyze_uncertainty/
    calculate_stats_and_snr.py:80-139). ``scale`` (per-feature std of the
    StandardScaler) converts Δμ and σ to real units first — the ratio is
    scale-invariant but the reported deltas are not."""
    if scale is not None:
        mu = mu * scale
        sigma = sigma * scale
    d = jnp.abs(mu[:, None, :] - mu[None, :, :])
    s = jnp.sqrt(sigma[:, None, :] ** 2 + sigma[None, :, :] ** 2 + 1e-12)
    return d / s


def discriminative_score(mu: Array, sigma: Array) -> Array:
    """Pairwise |μ_A - μ_B| / sqrt(σ_A² + σ_B²), the vessel 'discriminative
    power' matrix (ref analyze_vessel.py:131-190) — same math as SNR, kept as
    its own name to mirror the reference's two entry points."""
    return pairwise_snr(mu, sigma)


def significant_changes(
    snr: np.ndarray,
    mu_real: np.ndarray,
    group_names,
    feature_names,
    baseline: Optional[int] = None,
    top_k: int = 10,
) -> list:
    """Top-k |SNR| (treatment pair, feature) records (ref
    find_significant_changes.py:54-112). Returns dicts ready for CSV."""
    n_t = snr.shape[0]
    rows = []
    for i in range(n_t):
        js = range(n_t) if baseline is None else [baseline]
        for j in js:
            if i == j:
                continue
            for f in range(snr.shape[-1]):
                rows.append(
                    {
                        "treatment": group_names[i],
                        "vs": group_names[j],
                        "feature": feature_names[f],
                        "snr": float(snr[i, j, f]),
                        "delta": float(mu_real[i, f] - mu_real[j, f]),
                    }
                )
    rows.sort(key=lambda r: -abs(r["snr"]))
    return rows[:top_k]


def mc_decode_stats(
    model, variables, m: Array, mu: Array, logvar: Array, rng: jax.Array, n_mc: int = 100
) -> Tuple[Array, Array]:
    """Monte-Carlo decode over z ~ N(mu, sigma^2): (pixel mean, pixel std).

    The reference's MC-sampling uncertainty (BASELINE.json north star) done as
    one vmap over samples."""
    from causalvae_tpu.models.vae import reparameterize
    from causalvae_tpu.scm.intervene import decode

    keys = jax.random.split(rng, n_mc)

    def one(k):
        z = reparameterize(k, mu, logvar)
        return decode(model, variables, m, z)

    recons = jax.vmap(one)(keys)  # (MC, B, H, W, C)
    return recons.mean(axis=0), recons.std(axis=0)


def feature_stats_real_units(
    m_norm_by_treatment: Dict[int, np.ndarray],
    scaler_mean: np.ndarray,
    scaler_scale: np.ndarray,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Per-treatment per-feature mean/std in raw measurement units (the
    feature_stats.csv stage, ref calculate_stats_and_snr.py:14-79)."""
    out = {}
    for t, m_norm in m_norm_by_treatment.items():
        real = m_norm * scaler_scale + scaler_mean
        out[t] = {"mean": real.mean(axis=0), "std": real.std(axis=0)}
    return out
