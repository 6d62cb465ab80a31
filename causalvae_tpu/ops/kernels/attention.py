"""Fused (flash-style) multi-head attention for the ViT encoder (Pallas TPU).

The only attention in the workload is the ViT-VAE encoder over gh*gw + 1
tokens (961 at 768x1280, 241 at 384x640 — SURVEY.md §5 'long-context'). The
kernel computes softmax(Q K^T / sqrt(d)) V blockwise with an online softmax so
the (N, N) score matrix never hits HBM; padding to the 128-lane grid is masked
with -inf scores.

Grid: (batch * heads, q_blocks); each program streams all k-blocks for one
q-block through VMEM. Backward is a custom VJP that recomputes attention in
plain XLA (at <=1K tokens the recompute is cheap and fuses into backprop);
off-TPU the public entry falls back to the same XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _kernel(n_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    from jax.experimental import pallas as pl

    n_valid = n_ref[0]
    q = q_ref[0].astype(jnp.float32) * scale  # (BLOCK_Q, D)
    n_kblocks = k_ref.shape[1] // BLOCK_K

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        ks = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_K)
        col = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        s = jnp.where(col < n_valid, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((BLOCK_Q, d), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, n_kblocks, body, (acc0, m0, l0))
    # Padded q rows have all-masked scores (l == 0); emit zeros there.
    out = acc / jnp.where(l_fin > 0.0, l_fin, 1.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_attention(q, k, v, n_valid: int, scale: float):
    """q/k/v: (BH, Npad, D) with Npad % 128 == 0 and D % 128 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_pad, d = q.shape
    n_arr = jnp.full((1,), n_valid, jnp.int32)
    grid = (bh, n_pad // BLOCK_Q)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d,
            bytes_accessed=4 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(n_arr, q, k, v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _flash(q, k, v):
    b, h, n, d = q.shape
    n_pad = _round_up(n, BLOCK_Q)
    d_pad = _round_up(d, 128)

    def prep(a):
        a = jnp.pad(a, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))
        return a.reshape(b * h, n_pad, d_pad)

    out = _pallas_attention(prep(q), prep(k), prep(v), n, float(1.0 / np.sqrt(d)))
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


def _flash_fwd(q, k, v):
    return _flash(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, force_pallas: bool = False
) -> jnp.ndarray:
    """Fused MHA: inputs (B, H, N, D), output (B, H, N, D).

    Uses the Pallas kernel on TPU, XLA softmax-attention elsewhere."""
    if force_pallas or _on_tpu():
        return _flash(q, k, v)
    scale = 1.0 / np.sqrt(q.shape[-1])
    return _xla_attention(q, k, v, scale)
