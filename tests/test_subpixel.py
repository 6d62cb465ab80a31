"""SubpixelConvTranspose2x must be numerically interchangeable with the
dilated nn.ConvTranspose formulation (same params, same output), so ported
torch checkpoints keep working when the decoder runs the TPU-friendly
lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax import linen as nn

from causalvae_tpu.models.vae import conv_t
from causalvae_tpu.ops.subpixel import SubpixelConvTranspose2x, phase_kernel_2x

pytestmark = pytest.mark.quick


def dilated_conv_t(features):
    """The nn.ConvTranspose formulation conv_t used before the subpixel
    dispatch (torch ConvTranspose2d(3, 2, 1, output_padding=1))."""
    return nn.ConvTranspose(features, (3, 3), strides=(2, 2),
                            padding=((1, 2), (1, 2)), transpose_kernel=True)


def test_conv_t_dispatches_to_subpixel():
    assert isinstance(conv_t(8, 3, 2, 1, output_padding=1),
                      SubpixelConvTranspose2x)


@pytest.mark.parametrize("c_in,c_out,hw", [(16, 8, (6, 10)), (3, 5, (9, 7))])
def test_matches_conv_transpose(c_in, c_out, hw):
    ref = dilated_conv_t(c_out)
    sub = SubpixelConvTranspose2x(c_out)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, *hw, c_in)),
                    jnp.float32)
    variables = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(variables, x)
    got = sub.apply(variables, x)  # identical param tree
    assert got.shape == want.shape == (2, 2 * hw[0], 2 * hw[1], c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    c_in, c_out = 4, 6
    ref = dilated_conv_t(c_out)
    sub = SubpixelConvTranspose2x(c_out)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 5, c_in)),
                    jnp.float32)
    variables = ref.init(jax.random.PRNGKey(2), x)

    def loss(mod):
        def f(v, xx):
            y = mod.apply(v, xx)
            return jnp.sum(jnp.sin(y))

        return jax.grad(f, argnums=(0, 1))(variables, x)

    (gv_ref, gx_ref) = loss(ref)
    (gv_sub, gx_sub) = loss(sub)
    np.testing.assert_allclose(np.asarray(gx_sub), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gv_sub), jax.tree.leaves(gv_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_phase_kernel_layout():
    """Phase (a, b) block must land at channels [(a*2+b)*C, ...) and carry
    the single center tap W[1,1] for phase (0, 0)."""
    w = jnp.asarray(np.random.default_rng(2).standard_normal((3, 3, 2, 3)),
                    jnp.float32)
    pk = phase_kernel_2x(w)
    assert pk.shape == (2, 2, 3, 8)
    # phase (0,0): only tap (di=0, dj=0) with W[1,1]; other taps zero
    np.testing.assert_allclose(np.asarray(pk[0, 0, :, 0:2]),
                               np.asarray(w[1, 1]).T)
    assert np.all(np.asarray(pk[1, :, :, 0:2]) == 0)
    assert np.all(np.asarray(pk[:, 1, :, 0:2]) == 0)
