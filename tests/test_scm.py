"""SCM-layer tests: intervention engine, ensembles, uncertainty, mediation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.scm import ensemble as E
from causalvae_tpu.scm import intervene as I
from causalvae_tpu.scm import uncertainty as U

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def model_and_vars():
    model = CausalConvVAE(z_dim=6, gaussian_mechanism=True, decode_real_m=True)
    x = jnp.zeros((4, 28, 28, 1))
    m = jnp.zeros((4, 12))
    t = jnp.eye(10)[:4].astype(jnp.float32)
    variables = model.init({"params": KEY}, x, m, t, rng=KEY)
    return model, variables, (np.random.default_rng(0)
                              .random((4, 28, 28, 1)).astype(np.float32))


def test_abduct_mean_vs_sample(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((4, 12)); t = jnp.eye(10)[:4].astype(jnp.float32)
    z_mean = I.abduct(model, variables, jnp.asarray(x), m, t)
    z_samp = I.abduct(model, variables, jnp.asarray(x), m, t, rng=KEY)
    assert z_mean.shape == (4, 6)
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_samp))


def test_do_t_grid_shape_and_z_held_fixed(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((4, 12)); t = jnp.eye(10)[:4].astype(jnp.float32)
    grid = I.do_t_grid(model, variables, jnp.asarray(x), m, t,
                       jnp.eye(10, dtype=jnp.float32))
    assert grid.shape == (4, 10, 28, 28, 1)
    # same z + same target morphology => identical decode across sources with
    # equal z is NOT expected, but each (source, target) must differ across
    # targets when the mechanism output differs
    assert float(jnp.abs(grid[:, 0] - grid[:, 1]).max()) >= 0.0


def test_do_m_sweep_monotone_input(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((2, 12)); t = jnp.eye(10)[:2].astype(jnp.float32)
    sweep = jnp.linspace(-2, 2, 5)
    out = I.do_m_sweep(model, variables, jnp.asarray(x[:2]), m, t,
                       jnp.arange(3), sweep)
    assert out.shape == (2, 3, 5, 28, 28, 1)


def test_z_permute_moves_style(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((4, 12)); t = jnp.eye(10)[:4].astype(jnp.float32)
    perm = jnp.asarray([1, 0, 3, 2])
    out = I.z_permute_decode(model, variables, jnp.asarray(x), m, t, perm)
    out_scaled = I.z_permute_decode(model, variables, jnp.asarray(x), m, t,
                                    perm, z_scale=0.0)
    assert out.shape == (4, 28, 28, 1)
    # z_scale=0 must produce a z-independent decode
    assert not np.allclose(np.asarray(out), np.asarray(out_scaled))


def test_m_z_cross_grid(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((3, 12)); t = jnp.eye(10)[:3].astype(jnp.float32)
    grid = I.m_z_cross_grid(model, variables, jnp.asarray(x[:3]), m, t)
    assert grid.shape == (3, 3, 28, 28, 1)


def test_mediation_contributions(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((12,))
    # distinct per-class style pools (ref z_a_list / z_b_list)
    z_pool_a = jax.random.normal(KEY, (20, 6))
    z_pool_b = jax.random.normal(jax.random.fold_in(KEY, 1), (20, 6)) + 2.0
    res = I.mediation_contributions(
        model, variables, m, m + 1.0, z_pool_a, z_pool_b, KEY, n_mc=8,
    )
    assert res["m_contribution_pct"].shape == (8,)
    assert res["feature_contribution_pct"].shape == (8, 12)
    assert np.isfinite(np.asarray(res["total"])).all()


def test_ensemble_stack_and_decode(model_and_vars):
    model, variables, x = model_and_vars
    v2 = jax.tree.map(lambda a: a * 1.05, variables)
    stacked = E.stack_fold_variables([variables, v2])
    m = jnp.ones((2, 12)); z = jnp.ones((2, 6))
    mean, std = E.ensemble_decode(model, stacked, m, z)
    assert mean.shape == (2, 28, 28, 1) and std.shape == (2, 28, 28, 1)
    assert float(std.max()) > 0.0  # members differ -> nonzero uncertainty


def test_ensemble_predict_m(model_and_vars):
    model, variables, _ = model_and_vars
    stacked = E.stack_fold_variables([variables, variables])
    t = jnp.eye(10, dtype=jnp.float32)
    mean, std = E.ensemble_predict_m(model, stacked, t)
    assert mean.shape == (10, 12)
    np.testing.assert_allclose(np.asarray(std), 0.0, atol=1e-6)  # identical members


def test_morph_sigma_and_snr(model_and_vars):
    model, variables, _ = model_and_vars
    mu, sigma = U.all_conditions_sigma(model, variables, 10)
    assert mu.shape == (10, 12) and sigma.shape == (10, 12)
    assert (np.asarray(sigma) > 0).all()
    snr = U.pairwise_snr(mu, sigma)
    assert snr.shape == (10, 10, 12)
    np.testing.assert_allclose(np.asarray(snr)[np.arange(10), np.arange(10)], 0.0,
                               atol=1e-5)


def test_mc_decode_stats(model_and_vars):
    model, variables, x = model_and_vars
    m = jnp.zeros((2, 12)); t = jnp.eye(10)[:2].astype(jnp.float32)
    mu, logvar = model.apply(variables, jnp.asarray(x[:2]), m, t,
                             method=model.encode)
    mean, std = U.mc_decode_stats(model, variables, m, mu, logvar, KEY, n_mc=8)
    assert mean.shape == (2, 28, 28, 1)
    assert float(std.mean()) > 0.0


def test_diff_map(model_and_vars):
    from causalvae_tpu.scm.intervene import diff_map

    model, variables, x = model_and_vars
    m = jnp.zeros((4, 12))
    t = jnp.eye(10)[:4].astype(jnp.float32)
    d = diff_map(model, variables, jnp.asarray(x), m, t, shift=5.0)
    assert d.shape == x.shape
    assert float(d.min()) >= 0.0


def test_intervention_matrix_orig_pred_diff(model_and_vars):
    model, variables, _ = model_and_vars
    m = jnp.asarray(np.random.default_rng(0).standard_normal((4, 12)),
                    jnp.float32)
    mat = I.intervention_matrix(model, variables, m, jnp.eye(10, dtype=jnp.float32))
    assert mat.shape == (4, 10, 3, 12)
    np.testing.assert_allclose(np.asarray(mat[:, :, 0]),  # orig = source m
                               np.broadcast_to(np.asarray(m)[:, None], (4, 10, 12)))
    np.testing.assert_allclose(np.asarray(mat[:, :, 2]),
                               np.asarray(mat[:, :, 1] - mat[:, :, 0]), atol=1e-6)
