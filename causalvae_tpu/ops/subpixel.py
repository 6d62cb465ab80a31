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
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        # same name/shape/init as nn.ConvTranspose(transpose_kernel=True)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.features, c_in)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        pk = phase_kernel_2x(kernel)
        y = jax.lax.conv_general_dilated(
            x, pk,
            window_strides=(1, 1),
            padding=((0, 1), (0, 1)),  # taps reach x[m+1, n+1]; zero edge
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = depth_to_space_2x(y)
        if bias is not None:
            out = out + jnp.asarray(bias, self.dtype)
        return out
