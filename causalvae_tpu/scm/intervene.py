"""The abduction / intervention / prediction engine, batched on-device.

The reference performs counterfactuals by hand-invoking decoder pieces in
Python loops (ref vessel_analysis/04_generate_counterfactual/
generate_counterfactual.py:15-118, mnist_test/01 visualize.py:12-99,
check_mnist_counterfactual.py:83-109). Here the three-step pattern

    ABDUCTION    z ~ q(z | x, m, t)     (mean or sampled)
    INTERVENTION do(M := m')  or  do(T := t') with m' = f(t')
    PREDICTION   x' = decode(m', z)

is a single vmapped computation over sources x targets x sweep points, so a
whole intervention grid is one device launch (the BASELINE.json 'batched
on-device do-intervention' op).

All helpers are model-agnostic: any model exposing ``encode(x, m, t)``,
``decode(m, z)`` and ``predict_m(t)`` methods works (CausalConvVAE,
CausalVesselVAE, CausalViTVAE).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def abduct(
    model, variables, x: Array, m: Array, t: Array,
    rng: Optional[jax.Array] = None,
) -> Array:
    """Infer the exogenous style z. Mean abduction by default (ref
    visualize.py:81-84 uses mu); pass rng to sample instead (ref
    generate_counterfactual.py:54-55)."""
    mu, logvar = model.apply(variables, x, m, t, method=model.encode)
    if rng is None:
        return mu
    from causalvae_tpu.models.vae import reparameterize

    return reparameterize(rng, mu, logvar)


def decode(model, variables, m: Array, z: Array) -> Array:
    return model.apply(variables, m, z, method=model.decode)


def predict_m(model, variables, t: Array) -> Array:
    """Mechanism mean M' = f(T) (do(T) propagation through the SCM)."""
    return model.apply(variables, t, method=model.predict_m)


def do_t_grid(
    model, variables, x: Array, m: Array, t: Array, t_targets: Array,
    rng: Optional[jax.Array] = None,
) -> Array:
    """do(T) intervention grid (I1, ref mnist_test/01 visualize.py:12-99).

    For every source sample (abducted z) and every target condition t':
    m' = f(t'); x' = decode(m', z). Returns (n_sources, n_targets, H, W, C);
    one fused device computation."""
    z = abduct(model, variables, x, m, t, rng)  # (S, z)
    m_targets = predict_m(model, variables, t_targets)  # (T, m)

    def one_target(m_t):
        mt = jnp.broadcast_to(m_t[None, :], (z.shape[0], m_t.shape[0]))
        return decode(model, variables, mt, z)  # (S, H, W, C)

    grid = jax.vmap(one_target)(m_targets)  # (T, S, H, W, C)
    return jnp.swapaxes(grid, 0, 1)


def intervention_matrix(
    model, variables, m: Array, t_targets: Array
) -> Array:
    """The per-(source, target) Orig/Pred/Diff morphology table of the 10x10
    intervention CSV (ref visualize.py:12-51): orig = the source's measured
    M, pred = the mechanism's M'(t_target), diff = pred - orig.

    m: (S, F) source morphology; t_targets: (T, t_dim).
    Returns (S, T, 3, F) stacked [orig, pred, diff]."""
    pred = predict_m(model, variables, t_targets)  # (T, F)
    orig = jnp.broadcast_to(m[:, None, :], (m.shape[0],) + pred.shape)
    predb = jnp.broadcast_to(pred[None], orig.shape)
    return jnp.stack([orig, predb, predb - orig], axis=2)


def do_m_sweep(
    model, variables, x: Array, m: Array, t: Array,
    feature_idx: Array, sweep_values: Array,
    rng: Optional[jax.Array] = None,
) -> Array:
    """do(M_f := v) sweep (I2, ref check_mnist_counterfactual.py:83-109 and
    generate_counterfactual.py:77-108): clone m, set feature f to each value,
    decode with the abducted z. Returns (S, n_features_swept, n_values, H, W, C)."""
    z = abduct(model, variables, x, m, t, rng)  # (S, z)

    def per_feature(f):
        def per_value(v):
            m_prime = m.at[:, f].set(v)
            return decode(model, variables, m_prime, z)

        return jax.vmap(per_value)(sweep_values)  # (V, S, H, W, C)

    out = jax.vmap(per_feature)(feature_idx)  # (F, V, S, H, W, C)
    return jnp.transpose(out, (2, 0, 1, 3, 4, 5))


def z_permute_decode(
    model, variables, x: Array, m: Array, t: Array, perm: Array,
    z_scale: float = 1.0,
) -> Array:
    """Swap exogenous z across the batch, keep each sample's own M'
    (I3, ref mnist_test/02 visualize_z_permute.py:39-52; the vessel variant
    additionally scales z, ref check_mechanism_z_perm.py:79-154). Digit/vessel
    identity must follow M, not z."""
    z = abduct(model, variables, x, m, t) * z_scale
    m_hat = predict_m(model, variables, t)
    return decode(model, variables, m_hat, z[perm])


def m_z_cross_grid(model, variables, x: Array, m: Array, t: Array) -> Array:
    """Full M x Z cross grid: decode(m_i, z_j) for all pairs (ref vessel
    check_mechanism_z_perm.py:98-126). Returns (n_m, n_z, H, W, C)."""
    z = abduct(model, variables, x, m, t)
    m_hat = predict_m(model, variables, t)

    def row(m_i):
        mi = jnp.broadcast_to(m_i[None], (z.shape[0], m_i.shape[0]))
        return decode(model, variables, mi, z)

    return jax.vmap(row)(m_hat)


def mediation_contributions(
    model, variables,
    m_a: Array, m_b: Array,
    z_pool_a: Array, z_pool_b: Array,
    rng: jax.Array, n_mc: int = 50,
) -> dict:
    """Monte-Carlo mediation decomposition of the image change A -> B
    (I7, ref mnist_test/05_feature_analysis/analyze_mediation.py:120-201):
    total change ||x_B - x_A||, M-swap contribution, Z-swap contribution, and
    per-feature single-swap contributions. z_a is bootstrapped from class A's
    abducted-z pool and z_b from class B's (ref :128-134 z_a_list/z_b_list —
    two distinct pools, not one). m_a/m_b are the mechanism outputs
    morph_predictor(t) per the reference. All MC samples decode in one vmap."""
    m_dim = m_a.shape[-1]
    ka, kb = jax.random.split(rng)
    z_as = z_pool_a[jax.random.randint(ka, (n_mc,), 0, z_pool_a.shape[0])]
    z_bs = z_pool_b[jax.random.randint(kb, (n_mc,), 0, z_pool_b.shape[0])]

    def one(z_a, z_b):
        base = decode(model, variables, m_a[None], z_a[None])[0]
        full = decode(model, variables, m_b[None], z_b[None])[0]
        m_swap = decode(model, variables, m_b[None], z_a[None])[0]
        z_swap = decode(model, variables, m_a[None], z_b[None])[0]
        total = jnp.linalg.norm(full - base)

        def feat(f):
            m_f = m_a.at[f].set(m_b[f])
            single = decode(model, variables, m_f[None], z_a[None])[0]
            return jnp.linalg.norm(single - base)

        per_feature = jax.vmap(feat)(jnp.arange(m_dim))
        return (
            total,
            jnp.linalg.norm(m_swap - base),
            jnp.linalg.norm(z_swap - base),
            per_feature,
        )

    totals, m_contrib, z_contrib, per_feature = jax.vmap(one)(z_as, z_bs)
    safe = jnp.where(totals > 0, totals, 1.0)
    return {
        "total": totals,
        "m_contribution_pct": 100.0 * m_contrib / safe,
        "z_contribution_pct": 100.0 * z_contrib / safe,
        "feature_contribution_pct": 100.0 * per_feature / safe[:, None],
    }


def diff_map(model, variables, x: Array, m: Array, t: Array,
             *, shift: float = 5.0, rng: Optional[jax.Array] = None) -> Array:
    """|decode(M+shift, z) - decode(M, z)| per pixel (I6, ref
    vessel_analysis/04_generate_counterfactual/visualize_diff.py:15-84)."""
    z = abduct(model, variables, x, m, t, rng)
    base = decode(model, variables, m, z)
    shifted = decode(model, variables, m + shift, z)
    return jnp.abs(shifted - base)
