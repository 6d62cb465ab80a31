"""Fused multi-head attention for the ViT encoder (Pallas TPU).

The only attention in the workload is the ViT-VAE encoder over gh*gw + 1
tokens (961 at 768x1280, 241 at 384x640 — SURVEY.md §5 'long-context'). At
these lengths the whole K/V row fits in VMEM, so each kernel instance
computes its scores in a SINGLE pass — one (BLOCK_Q, N) dot, one exp, one
row-sum — instead of the classic online-softmax block loop: the rescaling
bookkeeping (running max / alpha / accumulator rescale per 128-wide block)
costs more VPU time than it saves at N ~ 1k, and the (N, N) score matrix
still never touches HBM.

Training dropout on the attention probabilities (ref vessel_analysis/00_core/
vit_backbone.py:30, torch nn.MultiheadAttention(dropout=0.1)) runs INSIDE the
kernel. Mask bits come from the TPU hardware PRNG, seeded per 128x128 score
tile with the global (seed, head, row0, col0) coordinates so the forward and
both backward kernels regenerate bit-identical masks regardless of which grid
axis iterates the tile. The Pallas interpreter has no TPU PRNG, so interpret
mode (and host-side test references) uses a counter-based murmur3-style hash
of the same coordinates — a pure function of position, identical across any
block partitioning. Dropout is applied after normalization (torch semantics):
out = sum_k keep*softmax(s)_k*v_k / (1-rate).

Backward recomputes probabilities from the saved logsumexp in ONE fused
kernel per (batch*head) — the whole (N, N) plane fits in VMEM, so dq, dk and
dv share a single recompute of p. Off-TPU the public entry falls back to XLA
attention with a jax.random mask (same distribution; bitwise mask parity with
the kernel is tested via force_pallas + interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_Q = 128   # PRNG tile rows — fixed: dropout masks are keyed per 128x128
BLOCK_K = 128   # PRNG tile cols — score tile, identical across fwd/bwd kernels
# Grid block sizes (independent of the PRNG tile): fewer, larger kernel
# instances amortize Mosaic's per-instance overhead — at the flagship shape
# (64 bh x 1024 tokens) a 128-row forward grid is 512 instances of ~30 us of
# VPU work each, and instance overhead dominated the measured kernel time.
FWD_ROWS = 512  # q rows per forward instance (VMEM: 2 x (512, N) f32 + bits)
BWD_ROWS = 512  # q rows per backward instance (3 x (512, N) f32 temporaries)
# Heads per kernel instance: the per-(batch*head) work at the flagship shape
# (N=1024, D=32) is only ~70 MFLOP of MXU + a few VPU passes, so per-instance
# overhead is still visible after the 512-row blocks; an inner fori_loop over
# GROUP_BH heads cuts the instance count another GROUP_BH x while the VMEM
# block (GROUP_BH, rows/N, D) stays small (D is tiny). PRNG tiles are keyed by
# the GLOBAL bh index, so masks are unchanged.
GROUP_BH = 4
# Scoped-VMEM cap for the Mosaic kernels: the GROUP_BH-unrolled backward's
# stack peaks just over the 16 MB default in the full-step graph (16.21 MB at
# the flagship shape — layout-dependent), well under the chip's 128 MB VMEM.
VMEM_LIMIT = 64 * 1024 * 1024
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


def _hw_tile_bits(seed, bh, row0, col0):
    """One (BLOCK_Q, BLOCK_K) tile of bits from the TPU hardware PRNG.

    Mosaic takes at most 2 seed scalars: mix the 4 tile coordinates down with
    the same odd-constant scheme as the portable hash (scalar ops). The tile
    shape/order is FIXED so any kernel regenerates identical bits for a tile."""
    from jax.experimental.pallas import tpu as pltpu

    s1 = jnp.uint32(seed) + jnp.uint32(bh) * jnp.uint32(_M3)
    s2 = jnp.uint32(row0) * jnp.uint32(_M1) ^ jnp.uint32(col0) * jnp.uint32(_M2)
    pltpu.prng_seed(s1, s2)
    return pltpu.prng_random_bits((BLOCK_Q, BLOCK_K)).astype(jnp.uint32)


def _keep_bits(seed, bh, row0, col0, shape, *, interpret: bool):
    """Uniform mask bits for a (rows, cols) score region starting at
    (row0, col0). rows/cols must be multiples of the 128x128 tile."""
    if interpret:
        return dropout_keep(seed, bh, row0, col0, shape)
    rows, cols = shape
    tiles = [
        jnp.concatenate(
            [_hw_tile_bits(seed, bh, row0 + i, col0 + j)
             for j in range(0, cols, BLOCK_K)], axis=1)
        for i in range(0, rows, BLOCK_Q)
    ]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)


def keep_from_bits(bits, rate: float):
    """bits >= rate*2^32  (P[drop] = rate exactly up to 2^-32 quantization)."""
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= thresh


# --------------------------------------------------------------------------
# Forward kernel (single pass: full K/V row in VMEM)
# --------------------------------------------------------------------------


def _fwd_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                rate: float, interpret: bool, group: int):
    from jax.experimental import pallas as pl

    n_valid = meta_ref[0]
    seed = meta_ref[1]
    g0 = pl.program_id(0)
    qi = pl.program_id(1)
    n_pad = k_ref.shape[1]
    rows = q_ref.shape[1]
    for j in range(group):  # static unroll; Mosaic reuses dead temporaries
        bh = g0 * group + j
        q = q_ref[j]  # (rows, D), input dtype — MXU takes bf16 natively
        ks = k_ref[j]  # (N, D)
        s = scale * jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (rows, N) f32
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        # normalizer uses the UNdropped probabilities (torch applies dropout
        # after softmax); only the value accumulation is masked
        l = jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            bits = _keep_bits(seed, bh, qi * rows, 0, p.shape,
                              interpret=interpret)
            p = jnp.where(keep_from_bits(bits, rate), p, 0.0)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, D)
        # Padded q rows have all-masked scores (l == 0); emit zeros / sentinel.
        valid = l > 0.0
        out = acc / jnp.where(valid, l, 1.0)
        if rate > 0.0:
            out = out / (1.0 - rate)
        o_ref[j] = out.astype(o_ref.dtype)
        lse_ref[j] = jnp.where(valid, m + jnp.log(jnp.where(valid, l, 1.0)),
                               LSE_PAD)


# --------------------------------------------------------------------------
# Backward kernels (recompute p from saved logsumexp)
# --------------------------------------------------------------------------


def _bwd_fused_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, rate: float,
                      interpret: bool):
    """Fused backward: dq, dk and dv from ONE recompute of p.

    Grid is (batch*head / GROUP, q-chunks): each instance handles GROUP heads'
    CHUNK_Q row band of the score plane (three (CHUNK_Q, N) f32 temporaries
    per head — the full (N, N) plane at f32 blew the 16 MB scoped-VMEM limit),
    writes its dq bands and accumulates partial dk/dv into the revisited
    full-row output blocks."""
    from jax.experimental import pallas as pl

    n_valid = meta_ref[0]
    seed = meta_ref[1]
    g0 = pl.program_id(0)
    ci = pl.program_id(1)
    group = q_ref.shape[0]
    chunk = q_ref.shape[1]
    n_pad = k_ref.shape[1]
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for j in range(group):  # static unroll; Mosaic reuses dead temporaries
        bh = g0 * group + j
        q = q_ref[j]           # (CHUNK, D)
        k = k_ref[j]           # (N, D)
        v = v_ref[j]
        do = do_ref[j].astype(jnp.float32)
        o = o_ref[j].astype(jnp.float32)
        lse = lse_ref[j]       # (CHUNK, 1)

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (CHUNK, N)
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_pad), 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do.astype(v_ref.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, N)
        if rate > 0.0:
            bits = _keep_bits(seed, bh, ci * chunk, 0, p.shape,
                              interpret=interpret)
            keep = keep_from_bits(bits, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pd = p
        delta = jnp.sum(do * o, axis=1, keepdims=True)  # (CHUNK, 1)
        ds = (p * (dp - delta)).astype(q_ref.dtype)
        dv_part = jax.lax.dot_general(
            pd.astype(do_ref.dtype), do_ref[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, D)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_part = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, D)
        dq_ref[j] = (dq * scale).astype(dq_ref.dtype)

        @pl.when(ci == 0)
        def _init():
            dk_ref[j] = (dk_part * scale).astype(dk_ref.dtype)
            dv_ref[j] = dv_part.astype(dv_ref.dtype)

        @pl.when(ci > 0)
        def _acc():
            dk_ref[j] += (dk_part * scale).astype(dk_ref.dtype)
            dv_ref[j] += dv_part.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _group(bh: int) -> int:
    for g in (GROUP_BH, 2, 1):
        if bh % g == 0:
            return g
    return 1


def _fwd_call(q, k, v, meta, scale: float, rate: float):
    """q/k/v: (BH, Npad, D), Npad % 128 == 0 -> (o, lse)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_pad, d = q.shape
    rows = FWD_ROWS if n_pad % FWD_ROWS == 0 else BLOCK_Q
    g = _group(bh)
    grid = (bh // g, n_pad // rows)
    interp = _interpret()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, interpret=interp,
                          group=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, rows, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, rows, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, rows, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
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
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interp,
    )(meta, q, k, v)


def _bwd_call(q, k, v, do, o, lse, meta, scale: float, rate: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_pad, d = q.shape
    chunk = min(n_pad, BWD_ROWS)
    g = _group(bh)
    blk = lambda b, i: (b, i, 0)
    full = lambda b, i: (b, 0, 0)
    interp = _interpret()
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, rate=rate,
                          interpret=interp),
        grid=(bh // g, n_pad // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, chunk, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, chunk, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, chunk, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, chunk, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, chunk, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_pad * n_pad * d,
            bytes_accessed=9 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interp,
    )(meta, q, k, v, do, o, lse)


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
    d_pad = _round_up(d, 8)
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
