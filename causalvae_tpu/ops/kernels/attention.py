"""Fused (flash-style) multi-head attention for the ViT encoder (Pallas TPU).

The only attention in the workload is the ViT-VAE encoder over gh*gw + 1
tokens (961 at 768x1280, 241 at 384x640 — SURVEY.md §5 'long-context'). The
kernel computes softmax(Q K^T / sqrt(d)) V blockwise with an online softmax so
the (N, N) score matrix never hits HBM; padding to the 128-lane grid is masked
with -inf scores.

Training dropout on the attention probabilities (ref vessel_analysis/00_core/
vit_backbone.py:30, torch nn.MultiheadAttention(dropout=0.1)) runs INSIDE the
kernel: the Bernoulli mask is a counter-based hash of the global
(seed, head, row, col) coordinates — a murmur3-style 32-bit mixer in plain
integer VPU ops — so forward and backward regenerate bit-identical masks
blockwise without ever materializing an (N, N) mask in HBM, and the same code
runs under the Pallas interpreter on CPU. Dropout is applied after
normalization (torch semantics): out = sum_k keep*softmax(s)_k*v_k / (1-rate).

Backward is a blockwise flash backward (two Pallas kernels: dq over q-blocks,
dk/dv over k-blocks) recomputing probabilities from the saved logsumexp.
Off-TPU the public entry falls back to XLA attention with a jax.random mask
(same distribution; bitwise parity with the kernel is tested via
force_pallas + interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30
LSE_PAD = 1e30  # logsumexp sentinel for fully-masked (padded) query rows


# --------------------------------------------------------------------------
# Counter-based Bernoulli mask (portable: plain integer ops)
# --------------------------------------------------------------------------

_M1 = 0x9E3779B1  # golden-ratio odd constants for coordinate mixing
_M2 = 0x85EBCA77
_M3 = 0xC2B2AE3D


def _mix32(h):
    """murmur3 finalizer: full-avalanche 32-bit mixer."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def dropout_keep(seed, bh, row0, col0, shape):
    """Keep-mask block: shape (rows, cols) bool, a pure function of the GLOBAL
    coordinates (seed, batch*head, row0+i, col0+j) — identical whether called
    from the forward kernel, the backward kernels, or host-side test code."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(col0)
    h = (
        r * jnp.uint32(_M1)
        ^ c * jnp.uint32(_M2)
        ^ jnp.uint32(bh) * jnp.uint32(_M3)
    ) + jnp.uint32(seed)
    return _mix32(h)


def keep_from_bits(bits, rate: float):
    """bits >= rate*2^32  (P[drop] = rate exactly up to 2^-32 quantization)."""
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= thresh


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                rate: float):
    from jax.experimental import pallas as pl

    n_valid = meta_ref[0]
    seed = meta_ref[1]
    bh = pl.program_id(0)
    qi = pl.program_id(1)
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
        # normalizer uses the UNdropped probabilities (torch applies dropout
        # after softmax); only the value accumulation is masked
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            bits = dropout_keep(seed, bh, qi * BLOCK_Q, kb * BLOCK_K, p.shape)
            p = jnp.where(keep_from_bits(bits, rate), p, 0.0)
        acc = acc * alpha + jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((BLOCK_Q, d), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, n_kblocks, body, (acc0, m0, l0))
    # Padded q rows have all-masked scores (l == 0); emit zeros / LSE sentinel.
    valid = l_fin > 0.0
    out = acc / jnp.where(valid, l_fin, 1.0)
    if rate > 0.0:
        out = out / (1.0 - rate)
    o_ref[0] = out.astype(o_ref.dtype)
    lse = jnp.where(valid, m_fin + jnp.log(jnp.where(valid, l_fin, 1.0)), LSE_PAD)
    lse_ref[0] = lse  # (BLOCK_Q, 1)


# --------------------------------------------------------------------------
# Backward kernels (recompute p from saved logsumexp, flash-style)
# --------------------------------------------------------------------------


def _bwd_dq_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                   dq_ref, *, scale: float, rate: float):
    from jax.experimental import pallas as pl

    n_valid = meta_ref[0]
    seed = meta_ref[1]
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BLOCK_Q, 1)
    delta = jnp.sum(do * o, axis=1, keepdims=True)  # rowsum(dO ∘ O)
    n_kblocks = k_ref.shape[1] // BLOCK_K
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    def body(kb, dq):
        ks = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = jnp.exp(s - lse)  # normalized probs; 0 on padded rows/cols
        dp = jax.lax.dot_general(
            do, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            bits = dropout_keep(seed, bh, qi * BLOCK_Q, kb * BLOCK_K, p.shape)
            dp = jnp.where(keep_from_bits(bits, rate), dp * inv_keep, 0.0)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, ks, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    d = q_ref.shape[-1]
    dq = jax.lax.fori_loop(0, n_kblocks, body, jnp.zeros((BLOCK_Q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, *, scale: float, rate: float):
    from jax.experimental import pallas as pl

    n_valid = meta_ref[0]
    seed = meta_ref[1]
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    ks = k_ref[0].astype(jnp.float32)  # (BLOCK_K, D)
    vs = v_ref[0].astype(jnp.float32)
    col = kb * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Q, BLOCK_K), 1)
    n_qblocks = q_ref.shape[1] // BLOCK_Q
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    def body(qi, carry):
        dk, dv = carry
        qs = q_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        dos = do_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        os_ = o_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * BLOCK_Q, BLOCK_Q), :]  # (BLOCK_Q, 1)
        s = scale * jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = jnp.exp(s - lse)  # (BLOCK_Q, BLOCK_K)
        if rate > 0.0:
            bits = dropout_keep(seed, bh, qi * BLOCK_Q, kb * BLOCK_K, p.shape)
            keep = keep_from_bits(bits, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        dv = dv + jax.lax.dot_general(
            pd, dos, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            dos, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        delta = jnp.sum(dos * os_, axis=1, keepdims=True)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    d = q_ref.shape[-1]
    z = jnp.zeros((BLOCK_K, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_qblocks, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(q, k, v, meta, scale: float, rate: float):
    """q/k/v: (BH, Npad, D), Npad % 128 == 0, D % 128 == 0 -> (o, lse)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_pad, d = q.shape
    grid = (bh, n_pad // BLOCK_Q)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d,
            bytes_accessed=4 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=_interpret(),
    )(meta, q, k, v)


def _bwd_call(q, k, v, do, o, lse, meta, scale: float, rate: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_pad, d = q.shape
    blk = lambda b, i: (b, i, 0)
    full = lambda b, i: (b, 0, 0)
    common = dict(interpret=_interpret())
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, rate=rate),
        grid=(bh, n_pad // BLOCK_Q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_Q, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * n_pad * n_pad * d,
            bytes_accessed=6 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        **common,
    )(meta, q, k, v, do, o, lse)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, rate=rate),
        grid=(bh, n_pad // BLOCK_K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * n_pad * n_pad * d,
            bytes_accessed=8 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        **common,
    )(meta, q, k, v, do, o, lse)
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom_vjp plumbing
# --------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prep(a, n_pad, d_pad):
    b, h, n, d = a.shape
    a = jnp.pad(a, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))
    return a.reshape(b * h, n_pad, d_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(rate, q, k, v, seed):
    out, _ = _flash_fwd(rate, q, k, v, seed)
    return out


def _flash_fwd(rate, q, k, v, seed):
    b, h, n, d = q.shape
    n_pad = _round_up(n, BLOCK_Q)
    d_pad = _round_up(d, 128)
    scale = float(1.0 / np.sqrt(d))
    meta = jnp.stack([jnp.int32(n), seed.astype(jnp.int32)])
    qp, kp, vp = (_prep(a, n_pad, d_pad) for a in (q, k, v))
    o, lse = _fwd_call(qp, kp, vp, meta, scale, rate)
    out = o.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    return out, (qp, kp, vp, o, lse, meta, (b, h, n, d))


def _flash_bwd(rate, res, g):
    qp, kp, vp, o, lse, meta, (b, h, n, d) = res
    n_pad, d_pad = qp.shape[1], qp.shape[2]
    scale = float(1.0 / np.sqrt(d))
    gp = _prep(g, n_pad, d_pad)
    dq, dk, dv = _bwd_call(qp, kp, vp, gp, o, lse, meta, scale, rate)
    unprep = lambda a: a.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    dseed = np.zeros((), jax.dtypes.float0)
    return unprep(dq), unprep(dk), unprep(dv), dseed


_flash.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


def _xla_attention(q, k, v, scale, rate: float = 0.0, seed=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if rate > 0.0:
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed.astype(jnp.uint32)), 1.0 - rate, probs.shape
        )
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray | None = None,
    force_pallas: bool = False,
) -> jnp.ndarray:
    """Fused MHA: inputs (B, H, N, D), output (B, H, N, D).

    dropout_rate > 0 applies attention-probability dropout inside the kernel
    (requires ``dropout_seed``, a scalar int array — derive it per step from
    the flax dropout rng). Uses the Pallas kernel on TPU; elsewhere falls back
    to XLA attention with a jax.random mask of the same distribution."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    rate = float(dropout_rate)
    if force_pallas or _on_tpu():
        seed = jnp.zeros((), jnp.int32) if dropout_seed is None else dropout_seed
        return _flash(rate, q, k, v, seed)
    scale = 1.0 / np.sqrt(q.shape[-1])
    return _xla_attention(q, k, v, scale, rate, dropout_seed)
