"""Shape/initialization smoke tests for the flax model zoo, plus numerical
checks of loss functions against torch (the reference's framework, CPU)."""

import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causalvae_tpu import models as M
from causalvae_tpu.ops import losses as L


KEY = jax.random.PRNGKey(0)


def test_causal_conv_vae_shapes():
    model = M.CausalConvVAE()
    x = jnp.zeros((4, 28, 28, 1))
    m = jnp.zeros((4, 12))
    t = jnp.zeros((4, 10))
    variables = model.init({"params": KEY}, x, m, t, rng=KEY)
    out = model.apply(variables, x, m, t, rng=KEY)
    assert out.recon_x.shape == (4, 28, 28, 1)
    assert out.m_hat.shape == (4, 12)
    assert out.mu.shape == (4, 10) and out.logvar.shape == (4, 10)
    assert out.m_mu is None
    # sigmoid output in (0, 1)
    assert float(out.recon_x.min()) >= 0.0 and float(out.recon_x.max()) <= 1.0


def test_causal_conv_vae_bayes_shapes():
    model = M.CausalConvVAE(gaussian_mechanism=True, decode_real_m=True)
    x = jnp.zeros((2, 28, 28, 1))
    m = jnp.ones((2, 12))
    t = jnp.zeros((2, 10))
    variables = model.init({"params": KEY}, x, m, t, rng=KEY)
    out = model.apply(variables, x, m, t, rng=KEY)
    assert out.m_mu.shape == (2, 12) and out.m_logvar.shape == (2, 12)
    # decode_real_m: recon must depend on m, not m_hat
    out2 = model.apply(variables, x, m + 1.0, t, rng=KEY)
    assert not np.allclose(np.asarray(out.recon_x), np.asarray(out2.recon_x))


def test_conditional_vae_shapes():
    model = M.ConditionalVAE()
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2, 10))
    variables = model.init({"params": KEY}, x, t, rng=KEY)
    recon, mu, logvar = model.apply(variables, x, t, rng=KEY)
    assert recon.shape == (2, 28, 28, 1)
    assert mu.shape == (2, 10)


def test_mdecoder_shapes():
    probe = M.MDecoder()
    m = jnp.zeros((2, 12))
    t = jnp.zeros((2, 10))
    v1 = probe.init(KEY, m)
    assert probe.apply(v1, m).shape == (2, 28, 28, 1)
    v2 = probe.init(KEY, m, t)
    assert probe.apply(v2, m, t).shape == (2, 28, 28, 1)


def test_heads_shapes():
    d = M.LatentDiscriminator()
    v = d.init(KEY, jnp.zeros((3, 10)))
    assert d.apply(v, jnp.zeros((3, 10))).shape == (3, 10)
    c = M.SimpleClassifier()
    v = c.init(KEY, jnp.zeros((3, 28, 28, 1)))
    feat, logp = c.apply(v, jnp.zeros((3, 28, 28, 1)))
    assert feat.shape == (3, 50) and logp.shape == (3, 10)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_vessel_vae_shapes_tiny():
    # tiny 128x128-equivalent: grid (1, 1) -> input 128x128
    model = M.CausalVesselVAE(z_dim=16, grid_hw=(1, 1))
    x = jnp.zeros((2, 128, 128, 1))
    m = jnp.zeros((2, 12))
    t = jnp.zeros((2, 19))
    variables = model.init({"params": KEY}, x, m, t, rng=KEY, train=True)
    out, mutated = model.apply(
        variables, x, m, t, rng=KEY, train=True, mutable=["batch_stats"]
    )
    assert out.recon_x.shape == (2, 128, 128, 1)
    assert out.mu.shape == (2, 16)
    assert "batch_stats" in mutated
    # eval mode uses running stats, no mutation
    out_eval = model.apply(variables, x, m, t, rng=KEY, train=False)
    assert out_eval.recon_x.shape == (2, 128, 128, 1)


def test_cascade_vae_shapes():
    model = M.CausalBioVAE(z_dim=8)
    x = jnp.zeros((2, 64, 64, 1))
    m = jnp.zeros((2, 12))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": KEY}, x, m, t, rng=KEY, train=True)
    out, _ = model.apply(variables, x, m, t, rng=KEY, train=True, mutable=["batch_stats"])
    assert out.recon_x.shape == (2, 64, 64, 1)
    assert out.m_hat.shape == (2, 12)


@pytest.mark.slow
def test_vit_vae_shapes_tiny():
    model = M.ViTVAE(img_size=(64, 64), latent_dim=32, embed_dim=64, depth=2, mlp_dim=128)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init({"params": KEY, "dropout": KEY}, x, rng=KEY, train=True)
    recon, _, mu, logvar = model.apply(
        variables, x, rng=KEY, train=True,
        rngs={"dropout": KEY}, mutable=["batch_stats"],
    )[0]
    assert recon.shape == (2, 64, 64, 1)
    assert mu.shape == (2, 32)
    # grid: 64/32 = 2 -> 2*2+1 = 5 tokens
    assert variables["params"]["pos_embedding"].shape == (1, 5, 64)


@pytest.mark.slow
def test_causal_vit_vae_shapes_tiny():
    model = M.CausalViTVAE(
        img_size=(64, 64), z_dim=16, vit_latent_dim=32, embed_dim=64, depth=2, mlp_dim=128
    )
    x = jnp.zeros((2, 64, 64, 1))
    m = jnp.zeros((2, 12))
    t = jnp.zeros((2, 19))
    variables = model.init({"params": KEY, "dropout": KEY}, x, m, t, rng=KEY, train=True)
    out, _ = model.apply(
        variables, x, m, t, rng=KEY, train=True,
        rngs={"dropout": KEY}, mutable=["batch_stats"],
    )
    assert out.recon_x.shape == (2, 64, 64, 1)
    assert out.mu.shape == (2, 16)
    assert out.m_mu.shape == (2, 12)


@pytest.mark.slow
def test_vit_vae_remat_equivalence():
    # remat_blocks only changes what the backward holds vs recomputes; the
    # outputs and gradients must be bit-identical to the non-remat model.
    kw = dict(img_size=(32, 32), latent_dim=16, embed_dim=64, depth=2, mlp_dim=96)
    base = M.ViTVAE(**kw)
    remat = M.ViTVAE(**kw, remat_blocks=True)
    x = jax.random.normal(KEY, (2, 32, 32, 1))
    variables = base.init({"params": KEY, "dropout": KEY}, x, rng=KEY, train=True)

    def loss(model, params):
        (recon, _, mu, logvar), _ = model.apply(
            {**variables, "params": params}, x, rng=KEY, train=True,
            rngs={"dropout": KEY}, mutable=["batch_stats"],
        )
        return jnp.sum(recon ** 2) + jnp.sum(mu ** 2) + jnp.sum(logvar ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    assert jnp.allclose(l0, l1)
    chex.assert_trees_all_close(g0, g1, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_vit_vae_fused_stages_equivalence():
    # fused_stages folds BN-apply+LeakyReLU into the consuming convs
    # (ops/kernels/stage.py); same params -> same outputs/grads/batch_stats
    # as the classic composition (up to f32 re-association).
    kw = dict(img_size=(64, 64), latent_dim=16, embed_dim=64, depth=1, mlp_dim=96)
    base = M.ViTVAE(**kw, fused_stages=False)
    fused = M.ViTVAE(**kw, fused_stages=True)
    x = jax.random.normal(KEY, (2, 64, 64, 1))
    variables = base.init({"params": KEY, "dropout": KEY}, x, rng=KEY, train=True)

    def run(model, params):
        (recon, _, mu, logvar), updates = model.apply(
            {**variables, "params": params}, x, rng=KEY, train=True,
            rngs={"dropout": KEY}, mutable=["batch_stats"],
        )
        return recon, mu, logvar, updates["batch_stats"]

    r0, mu0, lv0, bs0 = run(base, variables["params"])
    r1, mu1, lv1, bs1 = run(fused, variables["params"])
    chex.assert_trees_all_close(r0, r1, rtol=2e-4, atol=2e-4)
    chex.assert_trees_all_close(bs0, bs1, rtol=1e-5, atol=1e-6)

    def loss(model):
        return lambda p: jnp.sum(run(model, p)[0] ** 2)

    g0 = jax.grad(loss(base))(variables["params"])
    g1 = jax.grad(loss(fused))(variables["params"])
    chex.assert_trees_all_close(g0, g1, rtol=5e-3, atol=5e-3)


def test_reparameterize_statistics():
    mu = jnp.full((20000,), 2.0)
    logvar = jnp.full((20000,), jnp.log(4.0))
    z = M.reparameterize(jax.random.PRNGKey(1), mu, logvar)
    assert abs(float(z.mean()) - 2.0) < 0.05
    assert abs(float(z.std()) - 2.0) < 0.05


def test_dag_mechanism_reduces_to_t_to_m():
    import numpy as np

    mech = M.DAGMechanism(
        factors=(("t", 10), ("m", 12)),
        adjacency=((0, 1), (0, 0)),  # t -> m
        hidden=32,
    )
    v = mech.init(KEY, jnp.zeros((4, 22)))
    tm = jax.random.normal(KEY, (4, 22))
    out = mech.apply(v, tm)
    assert out.shape == (4, 22)
    # root factor t passes through unchanged
    np.testing.assert_allclose(np.asarray(out[:, :10]), np.asarray(tm[:, :10]), rtol=1e-6)
    # m depends on t
    tm2 = tm.at[:, :10].add(1.0)
    out2 = mech.apply(v, tm2)
    assert not np.allclose(np.asarray(out[:, 10:]), np.asarray(out2[:, 10:]))
    # m does NOT depend on its own input slot (no m->m edge)
    tm3 = tm.at[:, 10:].add(1.0)
    out3 = mech.apply(v, tm3)
    np.testing.assert_allclose(np.asarray(out[:, 10:]), np.asarray(out3[:, 10:]), rtol=1e-6)


# ---------------------------------------------------------------- losses


def test_losses_against_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    recon = rng.uniform(0.01, 0.99, (8, 784)).astype(np.float32)
    x = rng.uniform(0, 1, (8, 784)).astype(np.float32)
    mu = rng.normal(size=(8, 10)).astype(np.float32)
    logvar = rng.normal(scale=0.3, size=(8, 10)).astype(np.float32)

    tr, tx = torch.tensor(recon), torch.tensor(x)
    want_bce = float(F.binary_cross_entropy(tr, tx, reduction="sum"))
    got_bce = float(L.bce_sum(jnp.asarray(recon), jnp.asarray(x)))
    assert got_bce == pytest.approx(want_bce, rel=1e-4)

    tmu, tlv = torch.tensor(mu), torch.tensor(logvar)
    want_kld = float(-0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp()))
    got_kld = float(L.kld_sum(jnp.asarray(mu), jnp.asarray(logvar)))
    assert got_kld == pytest.approx(want_kld, rel=1e-5)

    logits = rng.normal(size=(8, 10)).astype(np.float32)
    tl = torch.tensor(logits)
    target = torch.full_like(tl, 0.1)
    want_conf = float(
        F.kl_div(F.log_softmax(tl, dim=1), target, reduction="batchmean")
    )
    got_conf = float(L.confusion_kl(jnp.asarray(logits), 10))
    assert got_conf == pytest.approx(want_conf, rel=1e-4)

    t_idx = rng.integers(0, 10, size=8)
    want_ce = float(F.cross_entropy(tl, torch.tensor(t_idx)))
    got_ce = float(L.discriminator_ce(jnp.asarray(logits), jnp.asarray(t_idx)))
    assert got_ce == pytest.approx(want_ce, rel=1e-5)

    m = rng.normal(size=(8, 12)).astype(np.float32)
    m_mu = rng.normal(size=(8, 12)).astype(np.float32)
    m_lv = rng.normal(scale=0.3, size=(8, 12)).astype(np.float32)
    tm, tmm, tmlv = torch.tensor(m), torch.tensor(m_mu), torch.tensor(m_lv)
    want_nll = float(0.5 * torch.sum(tmlv + (tm - tmm) ** 2 / tmlv.exp()))
    got_nll = float(
        L.gaussian_nll_sum(jnp.asarray(m), jnp.asarray(m_mu), jnp.asarray(m_lv))
    )
    assert got_nll == pytest.approx(want_nll, rel=1e-5)


def test_vessel_recon_terms_against_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(1)
    x = (rng.uniform(0, 1, (2, 32, 32, 1)) > 0.8).astype(np.float32)
    recon = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)

    tx, tr = torch.tensor(x), torch.tensor(recon)
    mse = (tr - tx) ** 2
    n_pos = tx.sum()
    pos_fraction = n_pos / (tx.numel() + 1e-6)
    calculated = (1.0 - pos_fraction) / (pos_fraction + 1e-6)
    pos_weight = torch.clamp(calculated, min=1.0, max=50.0)
    weight = 1.0 + (pos_weight - 1.0) * tx
    want_recon = float(torch.sum(mse * weight))
    want_sparsity = float(torch.sum(torch.abs(tr) * (tx < 0.1).float()))

    got_recon, got_sparsity = L.vessel_recon_terms(jnp.asarray(recon), jnp.asarray(x))
    assert float(got_recon) == pytest.approx(want_recon, rel=1e-4)
    assert float(got_sparsity) == pytest.approx(want_sparsity, rel=1e-4)
