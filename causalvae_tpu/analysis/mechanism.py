"""Mechanism validity & sensitivity analyses (A1, A4, A18, A8).

All device math is batched; verdict logic mirrors the reference's thresholds.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def r2_per_feature(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Sklearn-style R² per feature column."""
    ss_res = ((target - pred) ** 2).sum(axis=0)
    ss_tot = ((target - target.mean(axis=0)) ** 2).sum(axis=0)
    return 1.0 - ss_res / np.where(ss_tot == 0, 1.0, ss_tot)


def mechanism_validity(
    model, variables, m: np.ndarray, t: np.ndarray, feature_names: Sequence[str],
    pass_threshold: float = 0.5,
) -> Dict:
    """R²/MSE of M̂ = f(T) vs measured M per feature over a test set; PASS if
    average R² > 0.5 (A1, ref mnist_test/02_mechanism_analysis/
    analyze_mechanism.py:13-70)."""
    from causalvae_tpu.scm.intervene import predict_m

    m_hat = np.asarray(predict_m(model, variables, jnp.asarray(t)))
    r2 = r2_per_feature(m_hat, m)
    mse = ((m_hat - m) ** 2).mean(axis=0)
    avg_r2 = float(r2.mean())
    return {
        "r2": {n: float(v) for n, v in zip(feature_names, r2)},
        "mse": {n: float(v) for n, v in zip(feature_names, mse)},
        "avg_r2": avg_r2,
        "verdict": "PASS" if avg_r2 > pass_threshold else "FAIL",
    }


def phase1_importance(model, variables, t_dim: int, feature_names: Sequence[str]) -> Dict:
    """Phase-1 sensitivity: std across conditions of MorphPredictor(eye(T))
    per feature, ranked (A4, ref analyze_importance.py:11-71)."""
    from causalvae_tpu.scm.intervene import predict_m

    preds = np.asarray(
        predict_m(model, variables, jnp.eye(t_dim, dtype=jnp.float32))
    )  # (T, m)
    sens = preds.std(axis=0)
    order = np.argsort(-sens)
    return {
        "sensitivity": {feature_names[i]: float(sens[i]) for i in order},
        "ranking": [feature_names[i] for i in order],
        "predictions": preds,
    }


def cascade_sensitivity(
    model, variables, t_dim: int, control_idx: int, feature_names: Sequence[str]
) -> Dict:
    """M̂(T_i) − M̂(control) per condition with abs-importance ranking
    (A18, ref causal_cascade/analyze.py:6-42)."""
    from causalvae_tpu.scm.intervene import predict_m

    preds = np.asarray(
        predict_m(model, variables, jnp.eye(t_dim, dtype=jnp.float32))
    )
    delta = preds - preds[control_idx : control_idx + 1]
    importance = np.abs(delta).mean(axis=0)
    order = np.argsort(-importance)
    return {
        "delta": delta,
        "importance": {feature_names[i]: float(importance[i]) for i in order},
        "ranking": [feature_names[i] for i in order],
    }


def uncertainty_table(
    model, variables, t_dim: int, feature_names: Sequence[str]
) -> Dict:
    """σ of P(M|T) per condition x feature + most/least certain per condition
    (A8, ref mnist_test/06_model_experiment/visualize.py:322-379)."""
    from causalvae_tpu.scm.uncertainty import all_conditions_sigma

    mu, sigma = all_conditions_sigma(model, variables, t_dim)
    sigma = np.asarray(sigma)
    rows = []
    for t in range(t_dim):
        rows.append(
            {
                "condition": t,
                "most_certain": feature_names[int(sigma[t].argmin())],
                "least_certain": feature_names[int(sigma[t].argmax())],
                "sigma_min": float(sigma[t].min()),
                "sigma_max": float(sigma[t].max()),
            }
        )
    return {"mu": np.asarray(mu), "sigma": sigma, "per_condition": rows}
