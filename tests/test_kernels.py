"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

Each fused kernel must match its unfused XLA formulation bit-closely, in both
value and gradient (the kernels carry custom VJPs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causalvae_tpu.ops.kernels import attention as ka
from causalvae_tpu.ops.kernels import elbo as ke


def test_fused_vessel_terms_value():
    rng = np.random.default_rng(0)
    x = (rng.random((2, 96, 128, 1)) > 0.8).astype(np.float32)
    recon = rng.random((2, 96, 128, 1)).astype(np.float32)
    rl_f, sp_f = ke.vessel_recon_terms_fused(
        jnp.asarray(recon), jnp.asarray(x), force_pallas=True
    )
    rl_r, sp_r = ke.reference_terms(jnp.asarray(recon), jnp.asarray(x))
    np.testing.assert_allclose(float(rl_f), float(rl_r), rtol=1e-5)
    np.testing.assert_allclose(float(sp_f), float(sp_r), rtol=1e-5)


def test_fused_vessel_terms_grad():
    rng = np.random.default_rng(1)
    x = (rng.random((1, 64, 128, 1)) > 0.8).astype(np.float32)
    recon = rng.random((1, 64, 128, 1)).astype(np.float32)

    def loss_fused(r):
        rl, sp = ke.vessel_recon_terms_fused(r, jnp.asarray(x), force_pallas=True)
        return rl + 0.3 * sp

    def loss_ref(r):
        rl, sp = ke.reference_terms(r, jnp.asarray(x))
        return rl + 0.3 * sp

    g_f = jax.grad(loss_fused)(jnp.asarray(recon))
    g_r = jax.grad(loss_ref)(jnp.asarray(recon))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "n,b,h",
    # (b*h) chosen to hit every head-grouping path of the pallas grid:
    # bh=8 -> GROUP_BH=4 groups, bh=6 -> the 2-group fallback, bh=3 -> g=1
    [(17, 2, 4), (128, 2, 4), (241, 2, 4), (64, 2, 3), (64, 1, 3)],
)
def test_flash_attention_value(n, b, h):
    rng = np.random.default_rng(2)
    d = 32
    q = rng.standard_normal((b, h, n, d)).astype(np.float32)
    k = rng.standard_normal((b, h, n, d)).astype(np.float32)
    v = rng.standard_normal((b, h, n, d)).astype(np.float32)
    got = ka.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), force_pallas=True
    )
    want = ka._xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 1.0 / np.sqrt(d)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def _ref_dropout_attention(q, k, v, rate, seed):
    """Host-side reference of the in-kernel dropout semantics: torch-style
    dropout AFTER softmax, mask = the kernel's counter-based hash evaluated at
    global coordinates (identical to the blockwise evaluation by construction)."""
    b, h, n, d = q.shape
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    p = jax.nn.softmax(logits, axis=-1)
    keeps = []
    for bh in range(b * h):
        bits = ka.dropout_keep(jnp.uint32(seed), bh, 0, 0, (n, n))
        keeps.append(ka.keep_from_bits(bits, rate))
    keep = jnp.stack(keeps).reshape(b, h, n, n)
    p = jnp.where(keep, p, 0.0) / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@pytest.mark.parametrize("n", [17, 241])
def test_flash_attention_dropout_value(n):
    rng = np.random.default_rng(5)
    b, h, d, rate, seed = 1, 2, 32, 0.1, 1234
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    got = ka.flash_attention(
        q, k, v, dropout_rate=rate, dropout_seed=jnp.uint32(seed),
        force_pallas=True,
    )
    want = _ref_dropout_attention(q, k, v, rate, seed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # a different seed must change the output; rate=0 must match no-dropout
    got2 = ka.flash_attention(
        q, k, v, dropout_rate=rate, dropout_seed=jnp.uint32(seed + 1),
        force_pallas=True,
    )
    assert not np.allclose(np.asarray(got), np.asarray(got2))


def test_flash_attention_dropout_grad():
    rng = np.random.default_rng(6)
    b, h, n, d, rate, seed = 1, 2, 40, 16, 0.25, 77
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )

    def f_flash(q, k, v):
        out = ka.flash_attention(
            q, k, v, dropout_rate=rate, dropout_seed=jnp.uint32(seed),
            force_pallas=True,
        )
        return jnp.sum(out**2)

    def f_ref(q, k, v):
        return jnp.sum(_ref_dropout_attention(q, k, v, rate, seed) ** 2)

    g_f = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_flash_attention_dropout_keep_fraction():
    # the hash must deliver ~Bernoulli(1-rate) keeps
    bits = ka.dropout_keep(jnp.uint32(99), 3, 0, 0, (256, 256))
    frac = float(jnp.mean(ka.keep_from_bits(bits, 0.1).astype(jnp.float32)))
    assert abs(frac - 0.9) < 0.01, frac


def test_flash_attention_grad():
    rng = np.random.default_rng(3)
    b, h, n, d = 1, 2, 40, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(ka.flash_attention(q, k, v, force_pallas=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(ka._xla_attention(q, k, v, 1.0 / np.sqrt(d)) ** 2)

    g_f = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)
