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


# --------------------------------------------------------------------------
# Fused affine+LeakyReLU+conv stage (ops/kernels/stage.py)
# --------------------------------------------------------------------------


def _stage_case(seed, b, h, w, ci, co, k, pad_lo, prologue=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    mul = jnp.asarray(rng.standard_normal(ci).astype(np.float32)) if prologue else None
    add = jnp.asarray(rng.standard_normal(ci).astype(np.float32)) if prologue else None
    wgt = jnp.asarray((rng.standard_normal((k, k, ci, co)) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    return x, mul, add, wgt, bias


@pytest.mark.parametrize("k,pad_lo", [(3, 1), (2, 0), (2, 1)])
def test_stage_kernel_value(k, pad_lo):
    from causalvae_tpu.ops.kernels import stage as ks

    x, mul, add, wgt, bias = _stage_case(0, 2, 8, 12, 128, 64, k, pad_lo)
    y_pallas = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                                  pad_lo=pad_lo, force_pallas=True)
    y_ref = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                               pad_lo=pad_lo, force_pallas=False)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_kernel_value_no_prologue():
    from causalvae_tpu.ops.kernels import stage as ks

    x, _, _, wgt, bias = _stage_case(1, 2, 6, 10, 128, 32, 3, 1, prologue=False)
    y_pallas = ks.affine_act_conv(x, None, None, wgt, bias, force_pallas=True)
    y_ref = ks.affine_act_conv(x, None, None, wgt, bias, force_pallas=False)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_kernel_vs_unfused_composition():
    # the folded affine must equal the original BN-normalize -> leaky -> conv
    # composition: y = conv(leaky((x - mean)*inv*scale + bias_bn))
    from causalvae_tpu.ops.kernels import stage as ks

    rng = np.random.default_rng(2)
    b, h, w, ci, co = 2, 8, 12, 128, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    mean = jnp.asarray(rng.standard_normal(ci).astype(np.float32))
    var = jnp.asarray(np.abs(rng.standard_normal(ci)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(ci).astype(np.float32))
    bn_bias = jnp.asarray(rng.standard_normal(ci).astype(np.float32))
    wgt = jnp.asarray((rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32))

    inv = jax.lax.rsqrt(var + 1e-5)
    xhat = (x - mean) * (inv * scale) + bn_bias
    a = jnp.where(xhat >= 0, xhat, 0.2 * xhat)
    y_unfused = jax.lax.conv_general_dilated(
        a, wgt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    mul = inv * scale
    add = bn_bias - mean * mul
    y_fused = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                                 force_pallas=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_unfused),
                               rtol=2e-5, atol=2e-5)


def test_stage_kernel_grad():
    from causalvae_tpu.ops.kernels import stage as ks

    x, mul, add, wgt, bias = _stage_case(3, 2, 6, 8, 128, 32, 3, 1)

    def f(impl):
        def loss(x, mul, add, wgt, bias):
            y = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                                   force_pallas=impl)
            return jnp.sum(y ** 2)
        return loss

    g_p = jax.grad(f(True), argnums=(0, 1, 2, 3, 4))(x, mul, add, wgt, bias)
    g_r = jax.grad(f(False), argnums=(0, 1, 2, 3, 4))(x, mul, add, wgt, bias)
    for a, b_ in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_stage_bwd_kernel_vs_xla_vjp():
    # the fused backward kernel must reproduce the vjp of the reference
    # composition: dx, dmul, dadd, dW, db
    from causalvae_tpu.ops.kernels import stage as ks

    x, mul, add, wgt, bias = _stage_case(5, 3, 8, 12, 128, 64, 3, 1)
    dy = jnp.asarray(np.random.default_rng(6)
                     .standard_normal((3, 8, 12, 64)).astype(np.float32))

    _, vjp_fn = jax.vjp(
        lambda *p: ks._ref_fwd(0.2, 1, True, *p), x, mul, add, wgt, bias)
    dx_r, dmul_r, dadd_r, dw_r, db_r = vjp_fn(dy)

    dx, dw, db, dmul, dadd = ks._stage_bwd_call(
        x, dy, mul, add, wgt, slope=0.2, pad_lo=1, has_prologue=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db).ravel(), np.asarray(db_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dmul).ravel(), np.asarray(dmul_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dadd).ravel(), np.asarray(dadd_r), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,pad_lo", [(2, 0), (2, 1)])
def test_stage_bwd_kernel_k2(k, pad_lo):
    from causalvae_tpu.ops.kernels import stage as ks

    x, mul, add, wgt, bias = _stage_case(7, 2, 6, 10, 128, 32, k, pad_lo)
    dy = jnp.asarray(np.random.default_rng(8)
                     .standard_normal((2, 6, 10, 32)).astype(np.float32))
    _, vjp_fn = jax.vjp(
        lambda *p: ks._ref_fwd(0.01, pad_lo, True, *p), x, mul, add, wgt, bias)
    dx_r, dmul_r, dadd_r, dw_r, db_r = vjp_fn(dy)
    dx, dw, db, dmul, dadd = ks._stage_bwd_call(
        x, dy, mul, add, wgt, slope=0.01, pad_lo=pad_lo, has_prologue=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dmul).ravel(), np.asarray(dmul_r), rtol=1e-4, atol=1e-4)


def test_stage_kernel_channel_chunking(monkeypatch):
    # wide outputs accumulate in channel chunks; force chunking at test size
    from causalvae_tpu.ops.kernels import stage as ks

    x, mul, add, wgt, bias = _stage_case(9, 2, 8, 16, 128, 512, 3, 1)
    y_ref = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                               force_pallas=False)
    monkeypatch.setattr(ks, "_ACC_BYTES", 8 * 16 * 128 * 4)  # -> 4 chunks
    y_pallas = ks.affine_act_conv(x, mul, add, wgt, bias, slope=0.2,
                                  force_pallas=True)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
