"""K-fold evaluation & ensemble pairwise reports (A10, A11).

Per-fold per-feature R² + mean aleatoric σ on each fold's val split, fold
aggregation (mean/std/CV), and the 19x19 ensemble pairwise treatment report
(ref vessel_analysis/02_evaluate_kfold/analyze_kfold.py:17-265,
kfold_pairwise.py:80-127, analyze_pairwise_filtered.py:41-116). Fold loops are
vmapped over stacked parameters; the pairwise matrix is one broadcast.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from causalvae_tpu.analysis.mechanism import r2_per_feature


def per_fold_validation_r2(
    model, stacked_variables, plan, m: np.ndarray, t: np.ndarray,
    feature_names: Sequence[str],
) -> Dict:
    """R²(m_mu vs m) per feature on each fold's val split, plus fold-mean σ
    (A10, ref analyze_kfold.py:17-67)."""
    from causalvae_tpu.scm.uncertainty import morph_sigma

    n_folds = plan.n_folds
    r2s, sigmas = [], []
    for f in range(n_folds):
        idx = plan.val_idx[f]
        vars_f = jax.tree.map(lambda a: a[f], stacked_variables)
        mu, sigma = morph_sigma(model, vars_f, jnp.asarray(t[idx]))
        r2s.append(r2_per_feature(np.asarray(mu), m[idx]))
        sigmas.append(np.asarray(sigma).mean(axis=0))
    r2s = np.stack(r2s)      # (K, F)
    sigmas = np.stack(sigmas)
    mean, std = r2s.mean(axis=0), r2s.std(axis=0)
    cv = std / np.where(np.abs(mean) > 1e-9, np.abs(mean), 1.0)
    return {
        "per_fold_r2": r2s,
        "per_fold_sigma": sigmas,
        "aggregate": {
            feature_names[i]: {
                "r2_mean": float(mean[i]), "r2_std": float(std[i]),
                "cv": float(cv[i]), "sigma_mean": float(sigmas.mean(0)[i]),
            }
            for i in range(len(feature_names))
        },
    }


def ensemble_pairwise_report(
    model, stacked_variables, t_dim: int,
    group_names: Sequence[str], feature_names: Sequence[str],
) -> List[Dict]:
    """All treatment pairs x features: ensemble-mean M̂ difference
    (A11, ref kfold_pairwise.py:80-127 -> all_pairwise_report.csv rows)."""
    from causalvae_tpu.scm.ensemble import ensemble_predict_m

    t_eye = jnp.eye(t_dim, dtype=jnp.float32)
    mu_mean, mu_std = ensemble_predict_m(model, stacked_variables, t_eye)
    mu_mean = np.asarray(mu_mean)  # (T, F)
    rows = []
    for i in range(t_dim):
        for j in range(t_dim):
            if i == j:
                continue
            diff = mu_mean[i] - mu_mean[j]
            for f, name in enumerate(feature_names):
                rows.append({
                    "treatment_a": group_names[i], "treatment_b": group_names[j],
                    "feature": name, "diff": float(diff[f]),
                    "abs_diff": float(abs(diff[f])),
                })
    return rows


_CONC_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(nM|uM|ug|mg|µM|µg)", re.IGNORECASE)


def parse_treatment_name(name: str) -> Dict:
    """Split 'Drug 10nM'-style group names into (drug, concentration) for the
    filtered pairwise views (ref analyze_pairwise_filtered.py:41-80)."""
    m = _CONC_RE.search(name)
    conc = float(m.group(1)) if m else None
    unit = m.group(2) if m else None
    drug = _CONC_RE.sub("", name).strip(" -_")
    return {"drug": drug, "concentration": conc, "unit": unit}


def filter_pairwise(
    rows: List[Dict], *, mode: str, baseline_names: Sequence[str] = ("PBS", "isotype")
) -> List[Dict]:
    """Filtered pairwise views (ref analyze_pairwise_filtered.py:41-116):
    'efficacy'       — drug vs named baselines
    'dose_response'  — same drug, different concentration
    'vs_baseline'    — any treatment vs each baseline name."""
    out = []
    for r in rows:
        a = parse_treatment_name(r["treatment_a"])
        b = parse_treatment_name(r["treatment_b"])
        is_baseline_b = any(bn.lower() in r["treatment_b"].lower() for bn in baseline_names)
        if mode == "efficacy" and is_baseline_b:
            out.append(r)
        elif mode == "dose_response" and a["drug"] == b["drug"] and a["concentration"] != b["concentration"]:
            out.append(r)
        elif mode == "vs_baseline" and is_baseline_b:
            out.append(r)
    return out


def top_k_per_pair(rows: List[Dict], k: int = 3) -> Dict:
    """Top-k |diff| features per treatment pair (ref analyze_vessel.py 19x19
    top-3 report)."""
    by_pair: Dict = {}
    for r in rows:
        by_pair.setdefault((r["treatment_a"], r["treatment_b"]), []).append(r)
    return {
        pair: sorted(rs, key=lambda r: -r["abs_diff"])[:k]
        for pair, rs in by_pair.items()
    }
