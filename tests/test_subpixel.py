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


def test_lift_once_matches_fine_grid_conv():
    """lift_once: a stride-1 conv on grid 2G == the lifted conv on grid G
    applied to the packed tensor, for both kernel forms used (K3 pad 1,
    K2 pad (0,1))."""
    from causalvae_tpu.ops.subpixel import (
        depth_to_space_2x, lift_once, same_conv, space_to_depth_2x,
    )

    rng = np.random.default_rng(0)
    for k, pl in ((3, 1), (2, 0), (2, 1)):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, 5, 4)), jnp.float32)
        want = same_conv(x, w, pl)
        wl, pll = lift_once(w, pl)
        got = depth_to_space_2x(same_conv(space_to_depth_2x(x), wl, pll))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=f"k={k} pl={pl}")


def test_consume_once_matches_strided_conv():
    """consume_once: a stride-2 K3 pad-1 conv == the consumed stride-1 conv
    on the packed input."""
    from causalvae_tpu.ops.subpixel import consume_once, same_conv, space_to_depth_2x

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wc, plc = consume_once(w, 1)
    got = same_conv(space_to_depth_2x(x), wc, plc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _vit_pair(img=(64, 96), dropout=0.1, dec_res_stages=3):
    from causalvae_tpu.models.vit import ViTVAE

    kw = dict(img_size=img, latent_dim=24, embed_dim=32, depth=1, heads=2,
              mlp_dim=48, dropout=dropout, dec_res_stages=dec_res_stages)
    return ViTVAE(packed=True, **kw), ViTVAE(packed=False, **kw)


@pytest.mark.slow
@pytest.mark.parametrize("n_res", [3, 4], ids=["vessel_3res", "translator_4res"])
def test_vit_packed_matches_spatial(n_res):
    """The phase-packed ViTVAE (stem + decoder) must match the spatial
    formulation with the same parameters — full forward, train and eval.
    Covers both reference decoder variants (3 ResBlocks = vessel,
    4 = latent-translator)."""
    packed, spatial = _vit_pair(dec_res_stages=n_res)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 96, 1)),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = spatial.init(rngs, x, rng=jax.random.PRNGKey(2), train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(
        packed.init(rngs, x, rng=jax.random.PRNGKey(2), train=False))
    bs = jax.tree.map(
        lambda a: a + 0.05 * np.random.default_rng(1)
        .standard_normal(a.shape).astype(np.float32),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    # eval
    out_p = packed.apply(variables, x, rng=jax.random.PRNGKey(3))
    out_s = spatial.apply(variables, x, rng=jax.random.PRNGKey(3))
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # train (dropout=0 so the attention path is deterministic); batch_stats
    # updates must agree too
    packed0, spatial0 = _vit_pair(dropout=0.0, dec_res_stages=n_res)
    op, mp = packed0.apply(variables, x, rng=jax.random.PRNGKey(3), train=True,
                           rngs={"dropout": jax.random.PRNGKey(4)},
                           mutable=["batch_stats"])
    os_, ms = spatial0.apply(variables, x, rng=jax.random.PRNGKey(3), train=True,
                             rngs={"dropout": jax.random.PRNGKey(4)},
                             mutable=["batch_stats"])
    for a, b in zip(op, os_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-4)
    for a, b in zip(jax.tree.leaves(mp), jax.tree.leaves(ms)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vit_packed_gradients_match_spatial():
    packed, spatial = _vit_pair(dropout=0.0)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 64, 96, 1)),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = spatial.init(rngs, x, rng=jax.random.PRNGKey(2), train=False)

    def loss(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, rng=jax.random.PRNGKey(3), train=True,
                rngs={"dropout": jax.random.PRNGKey(4)},
                mutable=["batch_stats"])
            recon, xin, mu, logvar = out
            return (jnp.sum(recon ** 2) + jnp.sum(mu ** 2)
                    + jnp.sum(logvar ** 2)) / 1e3

        return jax.grad(f)(variables["params"])

    gp, gs = loss(packed), loss(spatial)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    for (kp, a), (_, b) in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp))


def test_space_to_depth_n_matches_nested():
    from causalvae_tpu.ops.subpixel import (
        depth_to_space_2x, depth_to_space_n, space_to_depth_2x,
        space_to_depth_n,
    )

    x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 16, 24, 3)),
                    jnp.float32)
    for n in (0, 1, 2, 3):
        want = x
        for _ in range(n):
            want = space_to_depth_2x(want)
        got = space_to_depth_n(x, n)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(depth_to_space_n(got, n)),
                                      np.asarray(x))
    # numpy input works too (host-side packing in the input pipeline)
    got_np = space_to_depth_n(np.asarray(x), 2)
    np.testing.assert_array_equal(got_np, np.asarray(space_to_depth_n(x, 2)))


def test_vit_packed_io_matches():
    """packed_io consumes a host-packed image and returns a packed recon that
    unpacks to the spatial model's output; mu/logvar identical."""
    from causalvae_tpu.models.vit import ViTVAE
    from causalvae_tpu.ops.subpixel import depth_to_space_n, space_to_depth_n

    kw = dict(img_size=(64, 96), latent_dim=24, embed_dim=32, depth=1,
              heads=2, mlp_dim=48, dropout=0.0)
    ref = ViTVAE(packed=True, **kw)
    pio = ViTVAE(packed=True, packed_io=True, **kw)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 64, 96, 1)),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = ref.init(rngs, x, rng=jax.random.PRNGKey(2), train=False)
    out_r = ref.apply(variables, x, rng=jax.random.PRNGKey(3))
    out_p = pio.apply(variables, space_to_depth_n(x, 3),
                      rng=jax.random.PRNGKey(3))
    recon_p = depth_to_space_n(out_p[0], 3)
    np.testing.assert_allclose(np.asarray(recon_p), np.asarray(out_r[0]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(out_p[2:], out_r[2:]):  # mu, logvar
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_vessel_vae_packed_matches_spatial():
    """CausalVesselVAE (C7) phase-packed encoder/decoder vs the spatial
    formulation: same params, same outputs and batch_stats updates."""
    from causalvae_tpu.models.vae import CausalVesselVAE

    kw = dict(m_dim=5, t_dim=4, z_dim=16, grid_hw=(1, 1))  # 128x128 input
    packed, spatial = CausalVesselVAE(packed=True, **kw), \
        CausalVesselVAE(packed=False, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 1)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((2, 5)), jnp.float32)
    t = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 2]])
    variables = spatial.init({"params": jax.random.PRNGKey(0)}, x, m, t,
                             rng=jax.random.PRNGKey(1), train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(
        packed.init({"params": jax.random.PRNGKey(0)}, x, m, t,
                    rng=jax.random.PRNGKey(1), train=False))
    for train in (False, True):
        kw2 = dict(rng=jax.random.PRNGKey(3), train=train)
        if train:
            out_p, mut_p = packed.apply(variables, x, m, t,
                                        mutable=["batch_stats"], **kw2)
            out_s, mut_s = spatial.apply(variables, x, m, t,
                                         mutable=["batch_stats"], **kw2)
            for a, b in zip(jax.tree.leaves(mut_p), jax.tree.leaves(mut_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=2e-4)
        else:
            out_p = packed.apply(variables, x, m, t, **kw2)
            out_s = spatial.apply(variables, x, m, t, **kw2)
        # train-mode recon runs through 13 batch-stat normalizations of a
        # random-init net: the 1e-7-level reordered-summation differences in
        # the stats amplify; stats themselves agree to 2e-4 (checked above)
        tol = 2e-2 if train else 2e-4
        for a, b in zip(out_p, out_s):
            if a is None:
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=tol, atol=tol,
                                       err_msg=f"train={train}")


def test_lift_flat_matches_fine_grid_conv():
    """lift_flat: a stride-1 pad-1 K3 conv on the real grid == the flat
    (lh, lw)-lifted conv applied to the flat-packed tensor."""
    from causalvae_tpu.ops.subpixel import (
        lift_flat, pack_flat, same_conv, same_conv2, unpack_flat,
    )

    rng = np.random.default_rng(3)
    for lh, lw in ((1, 0), (2, 1), (3, 2)):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)), jnp.float32)
        want = same_conv(x, w, 1)
        wl, pad = lift_flat(w, 1, lh, lw)
        got = unpack_flat(same_conv2(pack_flat(x, lh, lw), wl, pad), lh, lw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"lh={lh} lw={lw}")


def test_convt2_flat_matches_conv_transpose():
    """convt2_flat: ConvTranspose2d(3,2,1,op=1) on the real grid == the flat
    kernel on the (lh, lw)-packed input, output flat (lh+1, lw+1)-packed."""
    from causalvae_tpu.ops.subpixel import (
        convt2_flat, pack_flat, same_conv2, unpack_flat,
    )

    rng = np.random.default_rng(4)
    for lh, lw in ((1, 0), (2, 1)):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
        ref = dilated_conv_t(4)
        variables = ref.init(jax.random.PRNGKey(5), x)
        want = ref.apply(variables, x)
        w = variables["params"]["kernel"]
        pk, pad = convt2_flat(w, lh, lw)
        xp = pack_flat(x, lh, lw)
        got = unpack_flat(same_conv2(xp, pk, pad), lh + 1, lw + 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"lh={lh} lw={lw}")


def test_flat_boundary_transforms():
    """iso2_to_flat21 / flat32_to_iso3 are exact relayouts of the same real
    tensor (vs pack_flat / space_to_depth_n ground truth)."""
    from causalvae_tpu.ops.subpixel import (
        flat32_to_iso3, iso2_to_flat21, pack_flat, space_to_depth_n,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(iso2_to_flat21(space_to_depth_n(x, 2))),
        np.asarray(pack_flat(x, 2, 1)))
    np.testing.assert_array_equal(
        np.asarray(flat32_to_iso3(pack_flat(x, 3, 2))),
        np.asarray(space_to_depth_n(x, 3)))
