"""Subpixel (phase-decomposed) stride-2 transposed convolution.

``ConvTranspose2d(k=3, s=2, p=1, output_padding=1)`` — the decoder upsampler
used throughout the model zoo (ref vessel_analysis/00_core/vit_backbone.py:
119-153 decoder stack) — is mathematically a set of four small convolutions,
one per output phase (a, b) in {0,1}^2:

    out[2m+a, 2n+b] = sum_{di,dj in {0,1}} x[m+di, n+dj] * W[a+1-2di, b+1-2dj]

(taps with kernel index outside [0, 3) are zero). Lowering it this way — one
2x2 conv producing 4*C_out channels, then a depth-to-space reshape — instead
of XLA's input-dilated convolution matters on TPU: the dilated form makes the
backward pass spatially ``reverse`` the full-resolution cotangent (a ~500 MB
round-trip at 768x1280) and pushes awkward strided windows onto the MXU,
while the subpixel form is a plain dense conv in both directions.

The phase kernel is gathered from the standard ConvTranspose parameter at
trace time (a static 3x3 -> 2x2x4 rearrangement, free at runtime), so
checkpoints, port maps, and initializers are exactly those of
``nn.ConvTranspose(transpose_kernel=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def phase_kernel_2x(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_out, C_in) transpose-layout kernel -> (2, 2, C_in, 4*C_out).

    Output channel layout is ``(a*2 + b) * C_out + c`` matching
    :func:`depth_to_space_2x`. ``transpose_kernel=True`` stores W with the
    same orientation torch does, i.e. the correlation taps used in the
    formula above (no flip needed — validated against nn.ConvTranspose in
    tests/test_subpixel.py).
    """
    k, k2, c_out, c_in = w.shape
    assert (k, k2) == (3, 3), "phase decomposition is for k=3, s=2, p=1, op=1"
    blocks = []
    for a in (0, 1):
        for b in (0, 1):
            taps = []
            for di in (0, 1):
                row = []
                for dj in (0, 1):
                    ki, kj = a + 1 - 2 * di, b + 1 - 2 * dj
                    if 0 <= ki < 3 and 0 <= kj < 3:
                        row.append(w[ki, kj])  # (C_out, C_in)
                    else:
                        row.append(jnp.zeros_like(w[0, 0]))
                taps.append(row)
            # (2, 2, C_out, C_in) -> (2, 2, C_in, C_out)
            blocks.append(jnp.stack([jnp.stack(r) for r in taps]).transpose(0, 1, 3, 2))
    return jnp.concatenate(blocks, axis=-1)  # (2, 2, C_in, 4*C_out)


def depth_to_space_2x(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C) with channel blocks as 2x2 phases."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def conv3x3_phase_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel of a pad-1 3x3 conv on the UPSAMPLED grid, re-expressed as a
    pad-1 3x3 conv on the phase-space tensor.

    For up[2p+a, 2q+b, c] = y[p, q, (a*2+b)*C+c] (the phase layout), a 3x3
    correlation out[2m+a', 2n+b'] = sum_{u,v} up[2m+a'+u-1, 2n+b'+v-1] W[u,v]
    becomes out_ph[m+du, n+dv] contributions with u = 2*du + 1 + a - a'
    (valid when 0 <= u < 3), so the phase kernel has spatial support
    du, dv in {-1, 0, 1} — again 3x3, half the taps structurally zero.

    w: (3, 3, C_in, C_out) -> (3, 3, 4*C_in, 4*C_out), channel layout
    (a*2+b)*C + c on both sides (matching :func:`depth_to_space_2x`).
    """
    k, k2, c_in, c_out = w.shape
    assert (k, k2) == (3, 3)
    zero = jnp.zeros_like(w[0, 0])  # (C_in, C_out)
    rows = []
    for du in (-1, 0, 1):
        cols = []
        for dv in (-1, 0, 1):
            in_blocks = []
            for a in (0, 1):
                for b in (0, 1):
                    out_blocks = []
                    for ap in (0, 1):
                        for bp in (0, 1):
                            u = 2 * du + 1 + a - ap
                            v = 2 * dv + 1 + b - bp
                            if 0 <= u < 3 and 0 <= v < 3:
                                out_blocks.append(w[u, v])
                            else:
                                out_blocks.append(zero)
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))  # (4C_in, 4C_out)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (3, 3, 4C_in, 4C_out)


def space_to_depth_n(x, n: int):
    """n nested applications of :func:`space_to_depth_2x` as ONE
    reshape-transpose-reshape (one copy instead of n): channel nesting
    outer->inner is [level n .. level 1], level k carrying bit k-1 of the
    spatial offset. Works on jnp and numpy arrays alike."""
    if n == 0:
        return x
    b, h, w, c = x.shape
    f = 1 << n
    bits = x.reshape(b, h // f, *([2] * n), w // f, *([2] * n), c)
    # (B, H', oh_{n-1}..oh_0, W', ow_{n-1}..ow_0, C) ->
    # (B, H', W', oh_{n-1}, ow_{n-1}, .., oh_0, ow_0, C)
    perm = [0, 1, n + 2]
    for k in range(n):
        perm += [2 + k, n + 3 + k]
    perm += [2 * n + 3]
    bits = bits.transpose(*perm)
    return bits.reshape(b, h // f, w // f, f * f * c)


def depth_to_space_n(y, n: int):
    """Inverse of :func:`space_to_depth_n` (== n nested depth_to_space_2x)."""
    if n == 0:
        return y
    b, h, w, c4 = y.shape
    f = 1 << n
    c = c4 // (f * f)
    bits = y.reshape(b, h, w, *([2, 2] * n), c)
    # (B, H', W', oh_{n-1}, ow_{n-1}, .., oh_0, ow_0, C) ->
    # (B, H', oh_{n-1}..oh_0, W', ow_{n-1}..ow_0, C)
    perm = [0, 1]
    for k in range(n):
        perm += [3 + 2 * k]
    perm += [2]
    for k in range(n):
        perm += [4 + 2 * k]
    perm += [3 + 2 * n]
    bits = bits.transpose(*perm)
    return bits.reshape(b, h * f, w * f, c)


def space_to_depth_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W, C) -> (B, H, W, 4C); inverse of :func:`depth_to_space_2x`
    (new phase blocks outermost)."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def lift_once(w: jnp.ndarray, pad_lo: int):
    """Re-express a same-size stride-1 KxK conv on grid 2G as a conv on grid
    G whose input AND output both gain one 2x2 phase-packing level (new
    phases outermost in both channel dims).

    For out[2m+a'] = sum_u in[2m+a'+u-pad_lo] W[u] and in[2p+a] = ph[p, a]:
    p = m + du with u = 2*du + pad_lo + a - a' (parity-constrained), so the
    lifted kernel has spatial taps du and blocks W[u, v] wherever the phase
    parities line up. Returns (w', pad_lo'): (K', K', 4C_in, 4C_out) with
    pad (pad_lo', K'-1-pad_lo') keeping same-size semantics on grid G.
    Self-similar for this codebase's convs: K3 pad 1 -> K3 pad 1;
    K2 pad 0 -> K2 pad 0; K2 pad 1 -> K2 pad 1."""
    k = w.shape[0]
    dus = sorted({
        (u - pad_lo - a + ap) // 2
        for a in (0, 1) for ap in (0, 1) for u in range(k)
        if (u - pad_lo - a + ap) % 2 == 0
    })
    zero = jnp.zeros_like(w[0, 0])
    rows = []
    for du in dus:
        cols = []
        for dv in dus:
            in_blocks = []
            for a in (0, 1):
                for b in (0, 1):
                    out_blocks = []
                    for ap in (0, 1):
                        for bp in (0, 1):
                            u = 2 * du + pad_lo + a - ap
                            v = 2 * dv + pad_lo + b - bp
                            out_blocks.append(
                                w[u, v] if 0 <= u < k and 0 <= v < k else zero)
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows), -dus[0]


def consume_once(w: jnp.ndarray, pad_lo: int):
    """Re-express a stride-2 KxK conv (grid 2G -> grid G) as a same-size
    stride-1 conv on grid G that CONSUMES one 2x2 phase level of its input
    (input channels x4; output stays unpacked).

    out[n] = sum_u in[2n+u-pad_lo]; in[2p+phi] = ph[p, phi] ->
    p = n + du with u = 2*du + pad_lo + phi (parity-constrained).
    Returns (w', pad_lo'): (K', K', 4C_in, C_out)."""
    k = w.shape[0]
    dus = sorted({
        (u - pad_lo - phi) // 2
        for phi in (0, 1) for u in range(k)
        if (u - pad_lo - phi) % 2 == 0
    })
    zero = jnp.zeros_like(w[0, 0])
    rows = []
    for du in dus:
        cols = []
        for dv in dus:
            in_blocks = []
            for phi in (0, 1):
                for psi in (0, 1):
                    u = 2 * du + pad_lo + phi
                    v = 2 * dv + pad_lo + psi
                    in_blocks.append(
                        w[u, v] if 0 <= u < k and 0 <= v < k else zero)
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows), -dus[0]


def same_conv(x: jnp.ndarray, w: jnp.ndarray, pad_lo: int) -> jnp.ndarray:
    """Same-size NHWC conv with pad (pad_lo, K-1-pad_lo) on both axes."""
    k = w.shape[0]
    pad = ((pad_lo, k - 1 - pad_lo), (pad_lo, k - 1 - pad_lo))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def phase_conv3x3(x_ph: jnp.ndarray, w: jnp.ndarray,
                  bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply a pad-1 3x3 conv (weights for the upsampled grid) directly on a
    phase-space tensor: (B, H, W, 4C_in) -> (B, H, W, 4C_out)."""
    pk = conv3x3_phase_kernel(w)
    y = jax.lax.conv_general_dilated(
        x_ph, pk.astype(x_ph.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        c_out = w.shape[-1]
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


class SubpixelConvTranspose2x(nn.Module):
    """Drop-in replacement for ``nn.ConvTranspose(features, (3, 3),
    strides=(2, 2), padding=((0, 1), (0, 1)), transpose_kernel=True)`` (torch
    ConvTranspose2d(3, 2, 1, output_padding=1)) — identical parameters
    ("kernel" (3, 3, C_out, C_in), "bias" (C_out,)), identical math, lowered
    as a 2x2 conv + depth-to-space."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, phase_output: bool = False,
                 in_levels: int = 0, use_pallas: bool = False) -> jnp.ndarray:
        """in_levels: number of 2x2 phase-packing levels already applied to
        ``x``. Output gains one more level (phase_output=True) or unpacks
        fully (phase_output=False, only valid at in_levels=0)."""
        c_in = x.shape[-1] // (4 ** in_levels)
        # same name/shape/init as nn.ConvTranspose(transpose_kernel=True)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.features, c_in)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        pk, pl = phase_kernel_2x(kernel), 0  # K2, pad (0, 1)
        for _ in range(in_levels):
            pk, pl = lift_once(pk, pl)
        bias_t = (jnp.tile(jnp.asarray(bias, self.dtype), 4 ** (in_levels + 1))
                  if bias is not None else
                  jnp.zeros((pk.shape[-1],), self.dtype))
        if use_pallas:
            # fused_stages opt-in: route through the stage kernel (no
            # prologue — these consume raw ResBlock outputs) so the decoder
            # chain stays on default layouts between Pallas stages instead
            # of relayout-copying at every XLA-conv boundary
            # (ops/kernels/stage.py).
            from causalvae_tpu.ops.kernels.stage import affine_act_conv

            y = affine_act_conv(x, None, None, pk, bias_t, pad_lo=pl,
                                use_pallas=True)
        else:
            y = same_conv(x, pk, pl) + bias_t
        if phase_output:
            return y  # packed in_levels+1 times
        assert in_levels == 0, "unpacked output only supported at in_levels=0"
        return depth_to_space_2x(y)


class PhaseableConv3x3(nn.Module):
    """A pad-1 3x3 conv with nn.Conv's parameter names/shapes/init that can
    also be applied directly to a phase-packed tensor (``levels`` packing
    levels on input AND output; follow with depth_to_space_2x per level).
    Used for the decoder output head and ResBlock convs so full-resolution,
    narrow-channel convolutions — pathological on the 128-lane TPU layout —
    run on a coarse grid with dense channels."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, levels: int = 0,
                 prologue=None) -> jnp.ndarray:
        c_in = x.shape[-1] // (4 ** levels)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        pk, pl = kernel, 1
        for _ in range(levels):
            pk, pl = lift_once(pk, pl)
        bias_t = jnp.tile(bias, 4 ** levels) if levels else bias
        if prologue is not None:
            # (mul, add, slope) — fold the preceding BatchNorm-apply +
            # LeakyReLU into this conv's input read (ops/kernels/stage.py).
            # Prologues only exist under the models' fused_stages opt-in,
            # so this requests the (budget-gated) Pallas kernels.
            from causalvae_tpu.ops.kernels.stage import affine_act_conv

            mul, add, slope = prologue
            return affine_act_conv(x, mul, add, pk, bias_t, slope=slope,
                                   pad_lo=pl, use_pallas=True)
        y = same_conv(x, pk, pl)
        return y + bias_t


class LiftableStemConv(nn.Module):
    """Stride-2 KxK pad-1 conv (nn.Conv-compatible params; torch-equivalent
    output size for K in {3, 4}) that can consume one phase-packing level of
    its input and carry the remaining ``in_levels - 1`` levels through to its
    output. The space-to-depth stem: pack the input image k times, then each
    stride-2 conv consumes a level — every stem activation keeps >= 128
    dense channels."""

    features: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_levels: int = 0,
                 prologue=None) -> jnp.ndarray:
        c_in = x.shape[-1] // (4 ** in_levels)
        k = self.ksize
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        if in_levels == 0:
            assert prologue is None, "prologue fusion needs the lifted form"
            # torch Conv2d(k, stride=2, padding=1): pad (1, 1) for k=3/4
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias
        pk, pl = consume_once(kernel, 1)
        for _ in range(in_levels - 1):
            pk, pl = lift_once(pk, pl)
        bias_t = jnp.tile(bias, 4 ** (in_levels - 1))
        if prologue is not None:
            # fold the preceding BatchNorm-apply + LeakyReLU into this conv
            # (ops/kernels/stage.py) — see PhaseableConv3x3.
            from causalvae_tpu.ops.kernels.stage import affine_act_conv

            mul, add, slope = prologue
            return affine_act_conv(x, mul, add, pk, bias_t, slope=slope,
                                   pad_lo=pl, use_pallas=True)
        y = same_conv(x, pk, pl)
        return y + bias_t


# --------------------------------------------------------------------------
# Anisotropic ("flat-offset") phase packing
# --------------------------------------------------------------------------
#
# The isotropic lift above adds one 2x2 level per application, so the packed
# channel count per REAL channel is 4^L while the kernel's structural-zero
# inflation is also 4^L. For narrow stages (C_real = 16) lane-density
# (C >= 128) forces L = 2 -> 16x-inflated MXU work. Packing the two axes
# UNEVENLY reaches the same channel count with fewer total levels of
# inflation: (lh, lw) = (2, 1) gives 8 phases (C = 128 at C_real = 16) with
# only 2^(lh+lw) = 8x inflation — half the zero work, still lane-dense.
#
# MEASURED at the flagship (768x1280 batch-8 bf16 vessel step, v5e, round 3):
# rewiring the last two decoder stages through flat(2,1)/flat(3,2) cut
# XLA-counted flops 3.77 -> 2.75 TF/step but grew HBM traffic
# 27.7 -> 36.1 GB/step (relayout copies + fusion breaks around the
# non-standard padding), and the step — HBM-bound at 71% of roofline —
# regressed 47.5 -> 49.0 ms. The decoder therefore keeps the isotropic
# level-2/3 forms; these ops stay available (equivalence-tested in
# tests/test_subpixel.py) for MXU-bound shapes where the flop cut wins.
#
# Convention ("flat" layout): a tensor packed (lh, lw) stores
#   packed[b, p, q, (r * 2^lw + s) * C + c] = real[b, 2^lh p + r, 2^lw q + s, c]
# with r, s PLAIN integer offsets (no per-level bit interleaving). All
# builders below construct kernels at trace time from the standard base
# parameters, exactly like the isotropic path.


def lift_flat(w: jnp.ndarray, pad_lo: int, lh: int, lw: int):
    """Stride-1 same-size KxK conv re-expressed on a (lh, lw)-packed grid.

    w: (K, K, C_in, C_out) -> (K_h', K_w', P*C_in, P*C_out), P = 2^(lh+lw),
    channel blocks in flat-offset order. Returns (w', (pad_h', pad_w')).
    Derivation: real_row_out = 2^lh m + r'; tap u hits real_row_in =
    real_row_out + u - pad_lo = 2^lh (m + dp) + r  =>  u = pad_lo +
    2^lh dp + r - r'."""
    k = w.shape[0]
    fh, fw = 1 << lh, 1 << lw
    zero = jnp.zeros_like(w[0, 0])

    def taps(f):
        return sorted({
            (u - pad_lo - r + rp) // f
            for r in range(f) for rp in range(f) for u in range(k)
            if (u - pad_lo - r + rp) % f == 0
        })

    dps, dqs = taps(fh), taps(fw)
    rows = []
    for dp in dps:
        cols = []
        for dq in dqs:
            in_blocks = []
            for r in range(fh):
                for s in range(fw):
                    out_blocks = []
                    for rp in range(fh):
                        for sp in range(fw):
                            u = pad_lo + fh * dp + r - rp
                            v = pad_lo + fw * dq + s - sp
                            out_blocks.append(
                                w[u, v] if 0 <= u < k and 0 <= v < k else zero)
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows), (-dps[0], -dqs[0])


def convt2_flat(w: jnp.ndarray, lh: int, lw: int):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) on a (lh, lw)-flat-packed input,
    producing the (lh+1, lw+1)-flat-packed output ON THE SAME GRID.

    w: (3, 3, C_out, C_in) transpose-layout (the standard parameter) ->
    (K_h', K_w', 2^(lh+lw) C_in, 2^(lh+lw+2) C_out). New output offset bit is
    the LSB (out_off = 2*r_in-phase-of-source? no: off_out = 2 r + a), i.e.
    real_out_row = 2 real_in_row + a with taps W2[a][di], di = 2^lh dp +
    r'' - r in {0, 1} (phase decomposition of the file header)."""
    k, k2, c_out, c_in = w.shape
    assert (k, k2) == (3, 3)
    fh, fw = 1 << lh, 1 << lw
    zero_oc = jnp.zeros_like(w[0, 0])  # (C_out, C_in)

    def w2(a, di):  # 1-D phase taps: kernel index ki = a + 1 - 2*di
        ki = a + 1 - 2 * di
        return ki if 0 <= ki < 3 else None

    dps = sorted({(di - rr) // fh for rr in range(1 - fh, fh) for di in (0, 1)
                  if (di - rr) % fh == 0})
    dqs = sorted({(di - rr) // fw for rr in range(1 - fw, fw) for di in (0, 1)
                  if (di - rr) % fw == 0})
    rows = []
    for dp in dps:
        cols = []
        for dq in dqs:
            in_blocks = []
            for r_in in range(fh):          # input H offset (source row'')
                for s_in in range(fw):
                    out_blocks = []
                    for r_src in range(fh):  # the r in off_out = 2 r + a
                        for a in (0, 1):
                            for s_src in range(fw):
                                for b in (0, 1):
                                    di = fh * dp + r_in - r_src
                                    dj = fw * dq + s_in - s_src
                                    ki = w2(a, di) if di in (0, 1) else None
                                    kj = w2(b, dj) if dj in (0, 1) else None
                                    out_blocks.append(
                                        jnp.transpose(w[ki, kj])
                                        if ki is not None and kj is not None
                                        else jnp.transpose(zero_oc))
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows), (-dps[0], -dqs[0])


def pack_flat(x: jnp.ndarray, lh: int, lw: int) -> jnp.ndarray:
    """(B, 2^lh H, 2^lw W, C) -> (B, H, W, 2^(lh+lw) C) flat-offset order."""
    b, hh, ww, c = x.shape
    fh, fw = 1 << lh, 1 << lw
    y = x.reshape(b, hh // fh, fh, ww // fw, fw, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // fh, ww // fw, fh * fw * c)


def unpack_flat(y: jnp.ndarray, lh: int, lw: int) -> jnp.ndarray:
    b, h, w, cc = y.shape
    fh, fw = 1 << lh, 1 << lw
    c = cc // (fh * fw)
    x = y.reshape(b, h, w, fh, fw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * fh, w * fw, c)


def same_conv2(x: jnp.ndarray, w: jnp.ndarray, pad: "tuple[int, int]") -> jnp.ndarray:
    """Same-size NHWC conv with independent per-axis pad_lo values."""
    kh, kw = w.shape[0], w.shape[1]
    p = ((pad[0], kh - 1 - pad[0]), (pad[1], kw - 1 - pad[1]))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def iso2_to_flat21(x: jnp.ndarray) -> jnp.ndarray:
    """Isotropic level-2 packed (H', W', 16C) -> flat (lh=2, lw=1) packed
    (H', 2W', 8C) of the SAME real tensor: the coarse column bit moves into
    the W axis. Pure reshape/transpose (one relayout copy)."""
    b, h, w, cc = x.shape
    c = cc // 16
    # iso nesting: ((a2, b2), (a1, b1)) outer->inner; row = 2 a2 + a1,
    # col = 2 b2 + b1
    y = x.reshape(b, h, w, 2, 2, 2, 2, c)        # a2 b2 a1 b1 c
    y = y.transpose(0, 1, 2, 4, 3, 5, 6, 7)      # -> W | b2 | a2 a1 b1 c
    return y.reshape(b, h, 2 * w, 8 * c)         # off = (2 a2 + a1) * 2 + b1


def flat32_to_iso3(y: jnp.ndarray) -> jnp.ndarray:
    """Flat (lh=3, lw=2) packed (H', 2W', 32C) -> isotropic level-3 packed
    (H', W', 64C) (the ``space_to_depth_n(x, 3)`` layout): the W-axis parity
    becomes the coarse column bit b3."""
    b, h, w2, cc = y.shape
    c = cc // 32
    w = w2 // 2
    z = y.reshape(b, h, w, 2, 2, 2, 2, 2, 2, c)  # W | qb | r2 r1 r0 s1 s0 c
    # iso L3 nesting outer->inner: (a3 b3)(a2 b2)(a1 b1) with a3=r2, b3=qb,
    # a2=r1, b2=s1, a1=r0, b1=s0
    z = z.transpose(0, 1, 2, 4, 3, 5, 7, 6, 8, 9)
    return z.reshape(b, h, w, 64 * c)
