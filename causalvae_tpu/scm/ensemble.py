"""Ensemble (k-fold) inference as a stacked-parameter vmap axis.

The reference loads 5 fold checkpoints and loops over them in Python
(ref vessel_analysis/04_generate_counterfactual/ensemble_reconstruction.py:
16-166, 03_evaluate_vessel/check_mechanism_z_perm.py:79-154). Here fold
parameters are stacked along a leading axis and every ensemble op is one vmap
— the 'ensemble-parallel' runtime of SURVEY.md §2.6 (folds can also be laid
out across mesh devices by sharding the stacked axis)."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from causalvae_tpu.parallel.mesh import stack_params


def stack_fold_variables(variable_trees: Sequence[Any]) -> Any:
    """Stack per-fold flax variable trees along a new leading member axis."""
    return stack_params(variable_trees)


def ensemble_apply(fn: Callable, stacked_variables, *args):
    """vmap fn over the member axis of stacked variables; args broadcast."""
    return jax.vmap(lambda v: fn(v, *args))(stacked_variables)


def ensemble_decode(model, stacked_variables, m, z):
    """(mean, per-pixel std) of the ensemble reconstruction — the uncertainty
    map of I4 (ref ensemble_reconstruction.py:54-92)."""
    recons = ensemble_apply(
        lambda v, mm, zz: model.apply(v, mm, zz, method=model.decode),
        stacked_variables, m, z,
    )  # (K, B, H, W, C)
    return recons.mean(axis=0), recons.std(axis=0)


def ensemble_predict_m(model, stacked_variables, t):
    """Ensemble-mean mechanism prediction (A11 pairwise reports aggregate
    this across folds, ref kfold_pairwise.py:80-127)."""
    preds = ensemble_apply(
        lambda v, tt: model.apply(v, tt, method=model.predict_m),
        stacked_variables, t,
    )  # (K, B, m)
    return preds.mean(axis=0), preds.std(axis=0)


def ensemble_morph_distribution(model, stacked_variables, t):
    """Per-fold (m_mu, m_sigma) of the Gaussian mechanism head; used for
    aleatoric uncertainty extraction (A14, ref
    extract_uncertainty_by_treatment.py:68-117)."""

    def one(v, tt):
        m_mu, m_logvar = model.apply(v, tt, method=lambda mdl, t_: mdl.morph(t_))
        return m_mu, jnp.exp(0.5 * jnp.clip(m_logvar, -10.0, 10.0))

    m_mu, m_sigma = ensemble_apply(one, stacked_variables, t)
    return m_mu, m_sigma  # (K, B, m) each
