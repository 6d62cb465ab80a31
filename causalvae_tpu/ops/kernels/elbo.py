"""Fused vessel reconstruction-loss reduction (Pallas TPU kernel).

The vessel objective's image terms (SURVEY.md T2, ref
vessel_analysis/01_train/train_kfold.py:20-46) touch every pixel twice in a
naive formulation:

    recon_loss = sum((recon - x)^2 * (1 + (pos_weight - 1) * x))
    sparsity   = sum(|recon| * (x < 0.1))

At 768x1280 float32 these are HBM-bandwidth bound. The kernel streams both
images through VMEM once and produces both sums in a single pass (one read of
recon, one read of x, no intermediate materialization). The data-dependent
``pos_weight`` is computed outside from the batch foreground fraction (a single
XLA reduction over x, stop-gradient per the reference's torch.no_grad) and fed
as an SMEM scalar.

The op is differentiable via a custom VJP whose backward is pure elementwise
XLA (fuses into the surrounding backprop):

    d(recon_loss)/d(recon) = 2 * (recon - x) * weight
    d(sparsity)/d(recon)   = sign(recon) * (x < 0.1)

Off-TPU the public entry point falls back to the identical XLA formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
BLOCK_ROWS = 512  # (512, 128) f32 blocks = 256 KiB per operand


def _xla_terms(recon, x, pos_weight):
    recon = recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    weight = 1.0 + (pos_weight - 1.0) * x
    recon_loss = jnp.sum((recon - x) ** 2 * weight)
    sparsity = jnp.sum(jnp.abs(recon) * (x < 0.1))
    return recon_loss, sparsity


def _kernel(pw_ref, recon_ref, x_ref, out_ref):
    from jax.experimental import pallas as pl

    pw = pw_ref[0]
    r = recon_ref[:]
    x = x_ref[:]
    d = r - x
    weight = 1.0 + (pw - 1.0) * x
    rl = jnp.sum(d * d * weight)
    sp = jnp.sum(jnp.abs(r) * (x < 0.1).astype(jnp.float32))

    # TPU grid steps run sequentially on one core: accumulate both sums into a
    # single SMEM cell pair (a per-step-partials output would need an (8, 128)
    # tile, which Mosaic rejects for a (grid, 2) array).
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    out_ref[0, 0] += rl
    out_ref[0, 1] += sp


def _pallas_terms(recon_flat: jnp.ndarray, x_flat: jnp.ndarray, pos_weight):
    """recon_flat/x_flat: (rows, 128) float32, rows % BLOCK_ROWS == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = recon_flat.shape[0]
    grid = rows // BLOCK_ROWS
    pw = jnp.reshape(pos_weight.astype(jnp.float32), (1,))
    partials = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (BLOCK_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=7 * rows * LANE,
            bytes_accessed=2 * rows * LANE * 4 + grid * 8,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(pw, recon_flat, x_flat)
    return partials[0, 0], partials[0, 1]


def _flatten_pad(a: jnp.ndarray) -> jnp.ndarray:
    """Flatten to (rows, 128) with zero padding to a BLOCK_ROWS multiple."""
    flat = a.reshape(-1)
    n = flat.shape[0]
    chunk = BLOCK_ROWS * LANE
    pad = (-n) % chunk
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, LANE)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused(recon, x, pos_weight):
    rf = _flatten_pad(recon.astype(jnp.float32))
    xf = _flatten_pad(x.astype(jnp.float32))
    rl, sp = _pallas_terms(rf, xf, pos_weight)
    return jnp.stack([rl, sp])


def _fused_fwd(recon, x, pos_weight):
    out = _fused(recon, x, pos_weight)
    return out, (recon, x, pos_weight)


def _fused_bwd(res, g):
    recon, x, pos_weight = res
    recon32 = recon.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    weight = 1.0 + (pos_weight - 1.0) * x32
    d_recon = (
        g[0] * 2.0 * (recon32 - x32) * weight
        + g[1] * jnp.sign(recon32) * (x32 < 0.1)
    ).astype(recon.dtype)
    d_x = (
        g[0] * (-2.0 * (recon32 - x32) * weight + (recon32 - x32) ** 2 * (pos_weight - 1.0))
    ).astype(x.dtype)
    return d_recon, d_x, jnp.zeros_like(pos_weight)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def vessel_recon_terms_fused(
    recon: jnp.ndarray, x: jnp.ndarray, *, force_pallas: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused version of ops.losses.vessel_recon_terms.

    Computes pos_weight = clamp((1-posfrac)/posfrac, 1, 50) from the batch
    (ref train_kfold.py:27-36, stop-gradient), then one single-pass kernel for
    both weighted-MSE and sparsity sums. Falls back to XLA off-TPU."""
    x32 = x.astype(jnp.float32)
    pos_fraction = jnp.sum(x32) / (x32.size + 1e-6)
    pos_weight = jax.lax.stop_gradient(
        jnp.clip((1.0 - pos_fraction) / (pos_fraction + 1e-6), 1.0, 50.0)
    )
    if force_pallas or _on_tpu():
        out = _fused(recon, x, pos_weight)
        return out[0], out[1]
    return _xla_terms(recon, x, pos_weight)


def reference_terms(recon, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unfused XLA path (for parity tests and non-TPU backends)."""
    x32 = x.astype(jnp.float32)
    pos_fraction = jnp.sum(x32) / (x32.size + 1e-6)
    pos_weight = jax.lax.stop_gradient(
        jnp.clip((1.0 - pos_fraction) / (pos_fraction + 1e-6), 1.0, 50.0)
    )
    return _xla_terms(recon, x, pos_weight)
