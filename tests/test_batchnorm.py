"""FusedBatchNorm must be numerically interchangeable with nn.BatchNorm
(values, gradients, running-stat updates) so ported torch checkpoints and the
torch-parity loss tests keep holding with the lane-dense TPU reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from causalvae_tpu.ops.kernels.batchnorm import FusedBatchNorm, bn_train

pytestmark = pytest.mark.quick


def _pair():
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    fused = FusedBatchNorm(momentum=0.9, epsilon=1e-5)
    return ref, fused


@pytest.mark.parametrize("shape", [(4, 6, 10, 16), (8, 32), (2, 5, 5, 7)])
def test_train_values_and_stats_match_flax(shape):
    ref, fused = _pair()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape) * 2 + 1,
                    jnp.float32)
    v_ref = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # identical param/collection structure
    assert jax.tree.structure(v_ref) == jax.tree.structure(
        fused.init(jax.random.PRNGKey(0), x, use_running_average=False))
    y_ref, mut_ref = ref.apply(v_ref, x, use_running_average=False,
                               mutable=["batch_stats"])
    y_f, mut_f = fused.apply(v_ref, x, use_running_average=False,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_eval_matches_flax():
    ref, fused = _pair()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 6, 6, 8)),
                    jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v = {"params": v["params"],
         "batch_stats": {"mean": jnp.asarray(np.random.rand(8), jnp.float32),
                         "var": jnp.asarray(np.random.rand(8) + 0.5, jnp.float32)}}
    y_ref = ref.apply(v, x, use_running_average=True)
    y_f = fused.apply(v, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_train_gradients_match_flax():
    ref, fused = _pair()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 5, 9, 16)),
                    jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # non-trivial scale/bias so dscale/dbias paths are exercised
    v = {"params": {"scale": jnp.asarray(np.random.rand(16) + 0.5, jnp.float32),
                    "bias": jnp.asarray(np.random.rand(16), jnp.float32)}}

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply({"params": params}, xx, use_running_average=False,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y) * jnp.cos(0.3 * y))

        return jax.grad(f, argnums=(0, 1))(v["params"], x)

    (gp_ref, gx_ref) = loss(ref)
    (gp_f, gx_f) = loss(fused)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_ref[k]),
                                   rtol=1e-4, atol=1e-5)


def test_bn_train_bf16_output_dtype():
    fused = FusedBatchNorm(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, 4, 8)),
                    jnp.bfloat16)
    v = fused.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, mut = fused.apply(v, x, use_running_average=False,
                         mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    assert mut["batch_stats"]["mean"].dtype == jnp.float32


def test_bn_train_second_order_safety():
    """bn_train under jit + vmap composes (kfold stacks models via vmap)."""
    x = jnp.asarray(np.random.default_rng(4).standard_normal((3, 2, 8, 8, 16)),
                    jnp.float32)
    scale = jnp.ones((3, 16)); bias = jnp.zeros((3, 16))

    @jax.jit
    def f(x, s, b):
        return jax.vmap(lambda xx, ss, bb: bn_train(xx, ss, bb, 1e-5, False)[0]
                        )(x, s, b).sum()

    assert np.isfinite(float(f(x, scale, bias)))


def test_bn_train_pallas_interpret_matches_jnp():
    """The Pallas lane-dense path (interpret mode on CPU) must agree with the
    jnp formulation — values, stats, and grads — including under vmap (the
    kfold driver vmaps the train step over stacked fold params)."""
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 8, 8, 16)),
                    jnp.float32)
    scale = jnp.asarray(np.random.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(np.random.rand(16), jnp.float32)

    yp, mp, vp = bn_train(x, scale, bias, 1e-5, True)
    yr, mr, vr = bn_train(x, scale, bias, 1e-5, False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mr), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vr), rtol=1e-5, atol=1e-7)

    def g(use_pallas):
        def f(x, s, b):
            y, _, _ = bn_train(x, s, b, 1e-5, use_pallas)
            return jnp.sum(jnp.sin(y))

        return jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)

    for a, b in zip(g(True), g(False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # vmap over a stacked fold axis
    xs = jnp.stack([x, x + 0.5])
    ss = jnp.stack([scale, scale * 1.1])
    bs = jnp.stack([bias, bias - 0.2])
    yv = jax.vmap(lambda xx, s_, b_: bn_train(xx, s_, b_, 1e-5, True)[0])(xs, ss, bs)
    yw = jax.vmap(lambda xx, s_, b_: bn_train(xx, s_, b_, 1e-5, False)[0])(xs, ss, bs)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(yw), rtol=1e-5, atol=1e-6)


def test_bn_groups_phase_equivalence():
    """groups=4 on a phase-space tensor == spatial BN after depth_to_space."""
    from causalvae_tpu.ops.subpixel import depth_to_space_2x

    x_ph = jnp.asarray(np.random.default_rng(8).standard_normal((2, 6, 10, 4 * 8)),
                       jnp.float32)
    scale = jnp.asarray(np.random.rand(8) + 0.5, jnp.float32)
    bias = jnp.asarray(np.random.rand(8), jnp.float32)
    y_ph, m_ph, v_ph = bn_train(x_ph, scale, bias, 1e-5, False, 4)
    x_sp = depth_to_space_2x(x_ph)
    y_sp, m_sp, v_sp = bn_train(x_sp, scale, bias, 1e-5, False)
    np.testing.assert_allclose(np.asarray(m_ph), np.asarray(m_sp), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_ph), np.asarray(v_sp), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(depth_to_space_2x(y_ph)),
                               np.asarray(y_sp), rtol=1e-5, atol=1e-6)


def test_bn_train_dense_channels_use_jnp_path():
    """C % 128 == 0 (phase-packed dense activations) must NOT take the
    Pallas lane path — XLA partitions those reductions well and pallas_call's
    operand layout constraints would force relayout copies of conv outputs."""
    from causalvae_tpu.ops.kernels.batchnorm import _pallas_ok

    assert not _pallas_ok(jnp.zeros((2, 8, 8, 256)))
