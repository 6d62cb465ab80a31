"""Measurement-based feature importance (A5), phase comparison (A6).

Phase 2 re-measures morphology on *generated* counterfactual images and ranks
features by how much they move across conditions (ref mnist_test/
03_measurement_approach/analyze_counterfactual.py:13-129, analyze_cvae.py:
13-166). The generation sweep and the re-measurement both run on device: the
sweep is a vmapped decode (scm/intervene), the measurement the vmapped JAX
morphology extractor (ops/morphology) — the reference's per-image skimage loop
(its hot path) disappears.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def measure_generated(images: jnp.ndarray, n_features: int = 16) -> jnp.ndarray:
    """Vmapped on-device morphology over generated images.

    images: (..., H, W, 1) in [0, 1]; returns (..., n_features)."""
    from causalvae_tpu.ops import morphology

    flat = images.reshape((-1,) + images.shape[-3:])[..., 0]
    fn = morphology.features16_batch if n_features == 16 else morphology.features12_batch
    feats = fn(flat)
    return feats.reshape(images.shape[:-3] + (n_features,))


def phase2_importance(
    decode_fn,
    z_samples: jnp.ndarray,
    t_dim: int,
    *,
    n_features: int = 16,
    feature_names: Optional[Sequence[str]] = None,
) -> Dict:
    """Fixed z pool, sweep all conditions, re-measure, rank by the mean-over-
    samples of std-across-conditions (A5, ref analyze_counterfactual.py:93-102).

    decode_fn(t_onehot (T, t_dim), z (S, z_dim)) -> (T, S, H, W, 1): the model-
    specific batched counterfactual generator (CVAE decode or causal decode
    through the mechanism)."""
    t_eye = jnp.eye(t_dim, dtype=jnp.float32)
    images = decode_fn(t_eye, z_samples)  # (T, S, H, W, 1)
    feats = measure_generated(images, n_features)  # (T, S, F)
    sens = np.asarray(feats.std(axis=0).mean(axis=0))  # std across T, mean over S
    order = np.argsort(-sens)
    names = list(feature_names) if feature_names else [f"f{i}" for i in range(len(sens))]
    return {
        "sensitivity": {names[i]: float(sens[i]) for i in order},
        "ranking": [names[i] for i in order],
        "features": np.asarray(feats),
    }


def pairwise_cohens_d(
    feats_a: np.ndarray, feats_b: np.ndarray, feature_names: Sequence[str]
) -> Dict:
    """Cohen's d per feature between two conditions' generated measurements
    (ref analyze_cvae.py:129-146 1-vs-7 comparison)."""
    mean_a, mean_b = feats_a.mean(axis=0), feats_b.mean(axis=0)
    var_a, var_b = feats_a.var(axis=0), feats_b.var(axis=0)
    pooled = np.sqrt((var_a + var_b) / 2.0 + 1e-12)
    d = (mean_b - mean_a) / pooled
    order = np.argsort(-np.abs(d))
    return {
        "cohens_d": {feature_names[i]: float(d[i]) for i in order},
        "ranking": [feature_names[i] for i in order],
    }


def minmax_normalize(values: np.ndarray) -> np.ndarray:
    lo, hi = values.min(), values.max()
    return (values - lo) / (hi - lo) if hi > lo else np.zeros_like(values)


def compare_phases(
    phase1: Dict, phase2: Dict, feature_names: Sequence[str]
) -> Dict:
    """Min-max-normalized side-by-side comparison of phase-1 (mechanism
    sensitivity) and phase-2 (measured sensitivity) rankings (A6, ref
    mnist_test/04_phase_comparison/compare_importance_methods.py)."""
    common = [n for n in feature_names if n in phase1["sensitivity"] and n in phase2["sensitivity"]]
    v1 = minmax_normalize(np.asarray([phase1["sensitivity"][n] for n in common]))
    v2 = minmax_normalize(np.asarray([phase2["sensitivity"][n] for n in common]))
    agreement = float(np.corrcoef(v1, v2)[0, 1]) if len(common) > 1 else float("nan")
    return {
        "features": common,
        "phase1_norm": {n: float(v) for n, v in zip(common, v1)},
        "phase2_norm": {n: float(v) for n, v in zip(common, v2)},
        "rank_correlation": agreement,
    }


def perturbation_importance(
    decode_fn, m_base: jnp.ndarray, z_base: jnp.ndarray, *,
    delta: float = 1.0, n_random: int = 8, rng: Optional[jax.Array] = None,
    feature_names: Optional[Sequence[str]] = None,
) -> Dict:
    """Visual-perturbation importance: mean L2 image change from perturbing
    each feature by +delta over random (m, z) draws (A12, ref
    vessel_analysis/03_evaluate_vessel/analyze_vessel.py:68-129).

    decode_fn(m (B, F), z (B, Z)) -> (B, H, W, 1)."""
    m_dim = m_base.shape[-1]
    if rng is not None:
        idx = jax.random.randint(rng, (n_random,), 0, m_base.shape[0])
        ms, zs = m_base[idx], z_base[idx]
    else:
        ms, zs = m_base[:n_random], z_base[:n_random]
    base = decode_fn(ms, zs)

    def perturb(f):
        m_p = ms.at[:, f].add(delta)
        out = decode_fn(m_p, zs)
        return jnp.sqrt(jnp.sum((out - base) ** 2, axis=(1, 2, 3))).mean()

    changes = np.asarray(jax.vmap(perturb)(jnp.arange(m_dim)))
    order = np.argsort(-changes)
    names = list(feature_names) if feature_names else [f"f{i}" for i in range(m_dim)]
    return {
        "image_change": {names[i]: float(changes[i]) for i in order},
        "ranking": [names[i] for i in order],
    }
