"""Vessel model evaluation reports (A12–A16).

Per-treatment predictions + aleatoric uncertainty extraction, discriminative
feature ensembles (RandomForest + variance + ANOVA-F), full vs-baseline
reports, reliability gating — the CSV contracts of SURVEY.md §3.4 preserved:
predictions_by_treatment.csv, uncertainty_by_treatment.csv, feature_stats.csv,
pairwise_snr.csv, all_pairwise_report.csv, significant_changes.csv.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def predictions_by_treatment(
    model, variables, x: np.ndarray, m: np.ndarray, t: np.ndarray,
    t_idx: np.ndarray, group_names: Sequence[str], feature_names: Sequence[str],
    batch_size: int = 16,
) -> Dict:
    """Run all samples through the model, aggregate m_mu per treatment
    (A14, ref plot_predictions_by_treatment.py:17-388). Rows for
    predictions_by_treatment.csv: one per (treatment, feature) with mean/std."""
    mus = []
    key = jax.random.PRNGKey(0)
    for s in range(0, len(x), batch_size):
        out = model.apply(
            variables, jnp.asarray(x[s : s + batch_size]),
            jnp.asarray(m[s : s + batch_size]), jnp.asarray(t[s : s + batch_size]),
            rng=key, train=False,
        )
        mus.append(np.asarray(out.m_mu))
    mus = np.concatenate(mus)  # (N, F)

    rows, table = [], {}
    for g in range(len(group_names)):
        sel = t_idx == g
        if not sel.any():
            continue
        mean, std = mus[sel].mean(axis=0), mus[sel].std(axis=0)
        table[g] = {"mean": mean, "std": std, "n": int(sel.sum())}
        for f, name in enumerate(feature_names):
            rows.append({
                "treatment": group_names[g], "feature": name,
                "mean": float(mean[f]), "std": float(std[f]), "n": int(sel.sum()),
            })
    return {"rows": rows, "by_treatment": table, "per_sample_mu": mus}


def uncertainty_by_treatment_rows(
    model, stacked_variables, group_names: Sequence[str],
    feature_names: Sequence[str],
) -> List[Dict]:
    """uncertainty_by_treatment.csv rows: fold-mean aleatoric σ per
    (treatment, feature) (A14, ref extract_uncertainty_by_treatment.py:68-117)."""
    from causalvae_tpu.scm.uncertainty import ensemble_sigma_by_treatment

    mu, sigma = ensemble_sigma_by_treatment(
        model, stacked_variables, len(group_names)
    )
    mu, sigma = np.asarray(mu), np.asarray(sigma)
    return [
        {
            "treatment": group_names[g], "feature": feature_names[f],
            "pred_mean": float(mu[g, f]), "aleatoric_sigma": float(sigma[g, f]),
        }
        for g in range(len(group_names))
        for f in range(len(feature_names))
    ]


def discriminative_feature_ensemble(
    mus: np.ndarray, t_idx: np.ndarray, feature_names: Sequence[str], seed: int = 42
) -> Dict:
    """RandomForest importance + variance + ANOVA-F over per-sample predicted
    morphology, averaged rank (A13, ref analyze_discriminative_features.py:14-179)."""
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.feature_selection import f_classif

    rf = RandomForestClassifier(n_estimators=100, random_state=seed)
    rf.fit(mus, t_idx)
    rf_imp = rf.feature_importances_
    variance = mus.var(axis=0)
    f_stat, _ = f_classif(mus, t_idx)
    f_stat = np.nan_to_num(f_stat)

    def rank(v):
        order = np.argsort(-v)
        r = np.empty_like(order)
        r[order] = np.arange(len(v))
        return r

    avg_rank = (rank(rf_imp) + rank(variance) + rank(f_stat)) / 3.0
    order = np.argsort(avg_rank)
    return {
        "rf_importance": {feature_names[i]: float(rf_imp[i]) for i in range(len(feature_names))},
        "variance": {feature_names[i]: float(variance[i]) for i in range(len(feature_names))},
        "anova_f": {feature_names[i]: float(f_stat[i]) for i in range(len(feature_names))},
        "consensus_ranking": [feature_names[i] for i in order],
    }


def full_report_vs_baseline(
    mu: np.ndarray, sigma: np.ndarray, baseline_idx: int,
    group_names: Sequence[str], feature_names: Sequence[str],
) -> List[Dict]:
    """Every treatment vs the baseline group: per-feature Δμ and
    discriminative score (A12, ref analyze_vessel.py:192-313)."""
    rows = []
    for g in range(len(group_names)):
        if g == baseline_idx:
            continue
        d = mu[g] - mu[baseline_idx]
        score = np.abs(d) / np.sqrt(sigma[g] ** 2 + sigma[baseline_idx] ** 2 + 1e-12)
        for f, name in enumerate(feature_names):
            rows.append({
                "treatment": group_names[g], "baseline": group_names[baseline_idx],
                "feature": name, "delta": float(d[f]), "score": float(score[f]),
            })
    return rows


def reliability_gate(
    r2_by_treatment_feature: np.ndarray, sigma_by_treatment_feature: np.ndarray,
    group_names: Sequence[str], feature_names: Sequence[str],
    *, reliable_sigma: float = 0.6, unreliable_sigma: float = 0.8,
) -> List[Dict]:
    """σ-gated reliability classification per (treatment, feature):
    σ ≤ 0.6 reliable, σ > 0.8 unreliable (A16, ref
    plot_detailed_reliability.py:116-205)."""
    rows = []
    for g in range(len(group_names)):
        for f in range(len(feature_names)):
            s = float(sigma_by_treatment_feature[g, f])
            cat = ("reliable" if s <= reliable_sigma
                   else "unreliable" if s > unreliable_sigma else "marginal")
            rows.append({
                "treatment": group_names[g], "feature": feature_names[f],
                "r2": float(r2_by_treatment_feature[g, f]),
                "sigma": s, "category": cat,
            })
    return rows


def m_influence_check(
    model, variables, x, m, t, *, shift: float = 10.0, rng=None
) -> Dict:
    """Decoder-uses-M diagnostic: decode with M vs M+shift; mean |Δpixels| <
    1e-4 -> 'CRITICAL: decoder ignoring M'; also reports first-layer |W|
    mass on M vs Z columns (I5, ref check_m_influence.py:14-86)."""
    import jax

    from causalvae_tpu.scm.intervene import abduct, decode

    key = rng if rng is not None else jax.random.PRNGKey(0)
    z = abduct(model, variables, x, m, t)
    base = decode(model, variables, m, z)
    shifted = decode(model, variables, m + shift, z)
    diff = float(jnp.abs(shifted - base).mean())

    # first decoder layer weight mass: columns [0:m_dim] vs [m_dim:].
    # Only layers whose input is concat([m, z]) with M FIRST qualify
    # (CausalBioVAE's dec_input consumes concat([z, m_hat]) and its decode
    # signature differs — this I5 diagnostic targets the vessel/MNIST models).
    flat = variables["params"]
    w = None
    for name in ("dec_fc", "dec_fc1", "dec_adapter_fc1"):
        if name in flat:
            w = np.asarray(flat[name]["kernel"])
            break
    ratio = None
    if w is not None:
        m_dim = m.shape[-1]
        m_mass = np.abs(w[:m_dim]).mean()
        z_mass = np.abs(w[m_dim:]).mean()
        ratio = float(m_mass / (z_mass + 1e-12))
    verdict = "CRITICAL: decoder ignoring M" if diff < 1e-4 else "OK"
    return {"mean_pixel_diff": diff, "m_to_z_weight_ratio": ratio, "verdict": verdict}


def fix_csv_names(csv_path: str, group_names: Sequence[str]) -> int:
    """Rewrite numeric Treatment_From/Treatment_To indices in a pairwise
    report CSV into group names, in place (ref vessel_analysis/
    02_evaluate_kfold/fix_csv_names.py:11-68). Returns the number of cells
    rewritten; non-numeric columns are left untouched."""
    import csv

    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return 0
    fixed = 0
    for col in ("Treatment_From", "Treatment_To"):
        if col not in rows[0]:
            continue
        try:
            vals = [int(float(r[col])) for r in rows]
        except ValueError:
            continue  # already names
        for r, v in zip(rows, vals):
            if 0 <= v < len(group_names):
                r[col] = group_names[v]
                fixed += 1
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return fixed
