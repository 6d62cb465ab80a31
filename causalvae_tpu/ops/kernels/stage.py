"""Fused BN-apply + LeakyReLU + KxK conv stage (Pallas TPU).

The flagship decoder/stem are chains of [conv -> BatchNorm -> LeakyReLU ->
conv] (ref vessel_analysis/00_core/vit_backbone.py:7-19, 100-153). Under XLA
the normalize+activation between two convolutions is a standalone elementwise
pass: the full activation makes an extra HBM round-trip (~1.1 GB/step of the
768x1280 flagship forward), and the measured forward runs at only ~42% of the
HBM roofline while the backward sits at ~92% (scripts/flagship_breakdown.py).

This kernel folds the normalize+activation into the CONSUMING convolution:

    y = conv_KxK(leaky_relu(x * mul + add, slope)) + bias

where ``mul = inv*scale`` and ``add = bias_bn - mean*inv*scale`` are the
per-channel BatchNorm affine vectors (computed from this step's batch
statistics by ops/kernels/batchnorm.py — tiny (C,) work that stays in XLA).
The normalized tensor never exists in HBM. The conv is a same-size stride-1
KxK correlation with pad (pad_lo, K-1-pad_lo) — the form every phase-packed
decoder/stem conv takes after the subpixel lowering (ops/subpixel.py):
callers pass the ALREADY-LIFTED kernel and packed-width (tiled) vectors.

Kernel geometry: the image rides FLAT as (H*W, C) rows — each of the K*K
conv taps is then a 1-D shifted row-slice (flat offset o = dr*W + dc), a
column-wrap mask (targets whose source column crosses a row edge), and ONE
plain (M, Ci) x (Ci, Co) MXU matmul. This keeps every dot in the 2-D
single-contracting-dim form Mosaic lowers natively (multi-M-dim dots over
2-D offset slices both miscompile/verify-fail on current Mosaic). The grid
runs over the batch; tap matmuls accumulate into an f32 VMEM scratch (same
accumulation discipline as XLA's conv).

The backward kernel produces every cotangent (dx, dW, db, dmul, dadd) from
ONE pass over (x, dy) per image: da via the transposed-correlation taps, the
activation recomputed in VMEM for the weight gradient, per-channel
reductions accumulated across the sequential batch grid.

Differentiation: jax.custom_vjp — backward is the fused kernel where shapes
allow (stage_bwd_ok), else jax.vjp of the XLA reference formulation (the
unused primal recompute is dead-code-eliminated). Gradients are exactly
those of the reference composition; the batch-statistics terms flow through
(mul, add) outside this op.

MEASURED OUTCOME (and why this is opt-in, not the default): at the 768x1280
b8 bf16 flagship, isolated-op microbenchmarks showed several stages faster
fused (scripts/stage_shape_probe.py), but the END-TO-END train step is
slower — 53.1 ms with every budget-admitted stage fused and 51.9 ms with
only the microbench winners, vs 46.2 ms pure-XLA (scripts/
stage_fused_check.py, stage_winners_probe.py, real v5e). In-graph, XLA
already fuses the normalize+activation into the producing op's epilogue and
schedules conv HLOs better than a per-stage custom call boundary allows;
the microbench's standalone "XLA reference" overstated the fusible slack.
The kernels stay equivalence-tested (f32 exact via the XLA-path fold; bf16
at the same distance from an f32 oracle as XLA's own bf16 chain) and
VMEM-budget-gated, engaged only via the models' ``fused_stages=True`` /
``use_pallas=True`` opt-in for elementwise-bound regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Whole batch in one kernel instance when its block is small (per-instance
# overhead dominates sub-MB blocks); one image per instance otherwise.
_SMALL_BLOCK_BYTES = 4 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
# f32 tap accumulator budget; wider outputs are computed in channel chunks
_ACC_BYTES = 16 * 1024 * 1024
# Elementwise work (activation prologue, masks, casts, per-channel
# reductions) runs in row BANDS of ~this many f32 bytes per temporary, so
# Mosaic's live vector state — and therefore its register-allocator spill
# slots — stays band-sized. Hardware calibration: the full-image formulation
# spilled 74.3 MB on the hw=15360 ci=256 backward (f32 temporaries the size
# of the whole image); banded temporaries cap that at ~a few MB.
_BAND_BYTES = 2 * 1024 * 1024


def _band_rows(hw: int, ci: int) -> int:
    """Rows per elementwise band: ~_BAND_BYTES of f32 per (rows, Ci) temp."""
    return max(256, min(hw, _BAND_BYTES // (ci * 4)))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fwd_vmem_estimate(hw: int, ci: int, co: int, k: int, itemsize: int) -> int:
    """Scoped-VMEM model of the forward kernel, calibrated on hardware (the
    structural part of the measured dec_res_3 backward OOM matched this model
    within ~2%): in/out/weight blocks double-buffered, the activated-input
    scratch, the f32 tap accumulator, plus a banded-temporary allowance
    (elementwise work runs in _band_rows bands, so spills stay band-sized)."""
    in_block = hw * ci * itemsize
    out_block = hw * co * itemsize
    w_bytes = k * k * ci * co * itemsize
    a_scratch = hw * ci * itemsize
    chunk = co
    while hw * chunk * 4 > _ACC_BYTES and chunk % 2 == 0:
        chunk //= 2
    acc = hw * chunk * 4
    temps = 4 * _band_rows(hw, ci) * ci * 4
    return 2 * in_block + 2 * out_block + 2 * w_bytes + a_scratch + acc + temps


def _bwd_vmem_estimate(hw: int, ci: int, co: int, k: int, itemsize: int) -> int:
    """Scoped-VMEM model of the backward kernel: x/dy/dx blocks
    double-buffered, dW f32 double-buffered, the f32 da scratch, the
    activated-input scratch, and banded f32 temporaries."""
    in_block = hw * ci * itemsize
    dy_block = hw * co * itemsize
    dw_bytes = k * k * ci * co * 4
    da = hw * ci * 4
    a_scratch = hw * ci * itemsize
    temps = 4 * _band_rows(hw, ci) * ci * 4
    return (2 * in_block + 2 * dy_block + 2 * in_block + 2 * dw_bytes
            + da + a_scratch + temps)


# margins under the 100 MB scoped-VMEM cap the kernels request, calibrated
# by the scripts/stage_shape_probe.py hardware sweep: every flagship shape
# the forward budget admits compiled; the hw=15360 ci=co=256 K3 backward
# (estimate 80.0 MB) still blew the stack, so the backward budget sits
# below it while keeping the measured-good 69 MB stem2 backward.
_VMEM_BUDGET = 80 * 1024 * 1024
_BWD_VMEM_BUDGET = 72 * 1024 * 1024
# K3 forwards at large HW measured SLOWER fused than XLA on hardware
# (res3a 59 vs 31 ms, res3b 345 vs 67 ms — the 9-tap banded slicing at
# unaligned +/-(W+-1) flat offsets dominates), while K2 forwards at the same
# HW are faster (ct4a 226 vs 397 ms) and K3 *backwards* are faster
# (res3a 37 vs 60 ms). The forward gate excludes K3 beyond this HW.
_FWD_K3_HW_LIMIT = 8192


def _stage_common_ok(x: jnp.ndarray, kernel: jnp.ndarray) -> bool:
    """Shared gate: single-chip TPU NHWC stages in bfloat16 (the production
    dtype — Mosaic's f32 matmul ignores the multi-pass precision request,
    measured ~2e-3 relative error vs XLA's f32 conv, so f32 keeps the XLA
    composition) with lane-dense channels (C_in % 128 == 0, as the
    phase-packed formulation guarantees) and sublane-aligned rows
    (W % 8 == 0 — flat (H*W, C) reshapes stay layout no-ops). On
    multi-device meshes the XLA formulation is kept so GSPMD partitions the
    graph (same policy as ops/kernels/batchnorm.py)."""
    if x.ndim != 4 or kernel.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    try:
        single = jax.device_count() == 1
    except Exception:  # pragma: no cover
        single = False
    if not (single and _on_tpu()):
        return False
    ci = x.shape[-1]
    return ci % 128 == 0 and x.shape[2] % 8 == 0


def stage_ok(x: jnp.ndarray, kernel: jnp.ndarray) -> bool:
    """Forward-kernel gate: common checks, the measured K3-at-large-HW
    exclusion, accumulator chunkability, and the scoped-VMEM budget
    (:func:`_fwd_vmem_estimate`)."""
    if not _stage_common_ok(x, kernel):
        return False
    b, h, w, ci = x.shape
    k = kernel.shape[0]
    co = kernel.shape[-1]
    if k >= 3 and h * w > _FWD_K3_HW_LIMIT:
        return False
    # wide outputs are processed in channel chunks (f32 accumulator stays
    # <= _ACC_BYTES); chunking needs a 128-aligned split
    if h * w * co * 4 > _ACC_BYTES and co % 256 != 0:
        return False
    return _fwd_vmem_estimate(h * w, ci, co, k, x.dtype.itemsize) <= _VMEM_BUDGET


def stage_bwd_ok(x: jnp.ndarray, kernel: jnp.ndarray) -> bool:
    """Backward-kernel gate — independent of the forward decision (a stage
    can pair an XLA forward with the fused backward: res3a measured 1.6x
    faster fused-backward but 2x slower fused-forward). Needs x, dy, dx,
    the f32 da scratch AND the activation scratch resident — budgeted by
    :func:`_bwd_vmem_estimate`."""
    if not _stage_common_ok(x, kernel):
        return False
    b, h, w, ci = x.shape
    k = kernel.shape[0]
    co = kernel.shape[-1]
    return (_bwd_vmem_estimate(h * w, ci, co, k, x.dtype.itemsize)
            <= _BWD_VMEM_BUDGET)


def _dot_precision(dtype) -> jax.lax.Precision:
    """f32 Mosaic matmuls default to ONE bf16 MXU pass (~8e-3 relative error
    vs XLA's f32 convolution); request full precision for f32 operands. bf16
    operands are native MXU inputs — default is exact."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _taps(k: int, pad_lo: int, w_dim: int):
    """Static per-tap geometry in flat row space: (u, v, flat offset o,
    column shift dc). Target rows j in [max(0,-o), HW-max(0,o)) read source
    j+o; targets whose column c(j)+dc wraps a row edge are masked."""
    out = []
    for u in range(k):
        for v in range(k):
            dr, dc = u - pad_lo, v - pad_lo
            out.append((u, v, dr * w_dim + dc, dc))
    return out


def _col_mask(r0: int, r1: int, w_dim: int, dc: int, dtype):
    """(r1-r0, 1) 0/1 mask over target flat rows [r0, r1): row j contributes
    iff its source column c(j)+dc stays inside the image row. The mask is
    exact 0/1, so a bf16 multiply is lossless."""
    if dc == 0:
        return None
    col = (jax.lax.broadcasted_iota(jnp.int32, (r1 - r0, 1), 0) + r0) % w_dim
    return ((col + dc >= 0) & (col + dc < w_dim)).astype(dtype)


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------


def _stage_kernel(x_ref, mul_ref, add_ref, w_ref, b_ref, o_ref, a_ref,
                  acc_ref, *, slope: float, pad_lo: int, w_dim: int,
                  group: int, has_prologue: bool):
    """x_ref: (group, HW, Ci); w_ref: (K, K, Ci, Co); o_ref: (group, HW, Co);
    a_ref: activated-input scratch (HW, Ci) in x dtype (prologue computed
    ONCE per image, in row bands, instead of per tap); acc_ref: f32
    (HW, co_chunk) scratch (wide outputs run in channel chunks); mul/add:
    (1, Ci) f32; b: (1, Co) f32. All elementwise work is banded
    (:func:`_band_rows`) so Mosaic's live vector state stays band-sized."""
    k = w_ref.shape[0]
    hw = x_ref.shape[1]
    ci = x_ref.shape[-1]
    co = o_ref.shape[-1]
    chunk = acc_ref.shape[-1]
    band = _band_rows(hw, ci)
    prec = _dot_precision(x_ref.dtype)
    for g in range(group):  # static unroll; Mosaic reuses dead temporaries
        if has_prologue:
            for r0 in range(0, hw, band):
                r1 = min(hw, r0 + band)
                pre = (x_ref[g, r0:r1, :].astype(jnp.float32) * mul_ref[0]
                       + add_ref[0])
                a_ref[r0:r1, :] = jnp.where(
                    pre >= 0.0, pre, slope * pre).astype(a_ref.dtype)

        def src(j0, j1):
            return a_ref[j0:j1, :] if has_prologue else x_ref[g, j0:j1, :]

        for c0 in range(0, co, chunk):
            # 2-D slice of the (1, Co) ref: 1-D value slices lower to an
            # unsupported gather in Mosaic
            acc_ref[...] = jnp.broadcast_to(b_ref[:, c0:c0 + chunk],
                                            acc_ref.shape)
            for u, v, o, dc in _taps(k, pad_lo, w_dim):
                j0, j1 = max(0, -o), hw - max(0, o)
                for r0 in range(j0, j1, band):
                    r1 = min(j1, r0 + band)
                    xs = src(r0 + o, r1 + o)
                    m = _col_mask(r0, r1, w_dim, dc, x_ref.dtype)
                    if m is not None:
                        xs = xs * m  # 0/1 mask: exact in any dtype
                    acc_ref[r0:r1, :] += jax.lax.dot_general(
                        xs, w_ref[u, v, :, c0:c0 + chunk],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
            for r0 in range(0, hw, band):
                r1 = min(hw, r0 + band)
                o_ref[g, r0:r1, c0:c0 + chunk] = (
                    acc_ref[r0:r1, :].astype(o_ref.dtype))


def _stage_call(x, mul, add, w, b, *, slope: float, pad_lo: int,
                has_prologue: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, wd, ci = x.shape
    k, _, _, co = w.shape
    hw = h * wd
    # group counts BOTH block sides: in+out blocks are double-buffered, so a
    # cheap input with a wide output (dec_ct_3: 3.9 MB in, 7.9 MB out per
    # image) must still run one image per instance
    group = (bsz if hw * (ci + co) * x.dtype.itemsize <= _SMALL_BLOCK_BYTES
             else 1)
    chunk = co
    while hw * chunk * 4 > _ACC_BYTES and chunk % 2 == 0:
        chunk //= 2
    y = pl.pallas_call(
        functools.partial(_stage_kernel, slope=slope, pad_lo=pad_lo,
                          w_dim=wd, group=group, has_prologue=has_prologue),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, hw, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, hw, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, co), x.dtype),
        scratch_shapes=[
            # activated-input scratch (minimal tile when no prologue)
            pltpu.VMEM((hw, ci) if has_prologue else (8, 128), x.dtype),
            pltpu.VMEM((hw, chunk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hw * k * k * ci * co,
            bytes_accessed=(bsz * hw * (ci + co) * x.dtype.itemsize
                            + k * k * ci * co * w.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x.reshape(bsz, hw, ci), mul.reshape(1, ci).astype(jnp.float32),
      add.reshape(1, ci).astype(jnp.float32), w.astype(x.dtype),
      b.reshape(1, co).astype(jnp.float32))
    return y.reshape(bsz, h, wd, co)


# --------------------------------------------------------------------------
# Backward kernel: dx, dW, db, dmul, dadd from ONE pass over (x, dy)
# --------------------------------------------------------------------------
#
# Under XLA the backward of [affine -> leaky -> conv] is several passes: the
# activation ``a`` is rematerialized to HBM for the weight gradient, the
# conv-transpose reads dy and writes da, the mask/scale chain re-reads x, and
# the per-channel reductions read da again. The fused kernel reads x and dy
# ONCE per image, recomputes a/mask in VMEM, and produces every cotangent:
#
#   da     = conv_same(dy, rot180(W)^T)          (dgrad taps, MXU)
#   dx     = da * leaky'(pre) * mul              (VPU)
#   dW[uv] = a_slice^T @ dy_slice                (wgrad taps, MXU)
#   db     = sum dy;  dmul = sum(da*leaky'*x);  dadd = sum(da*leaky')


def _stage_bwd_kernel(x_ref, dy_ref, mul_ref, add_ref, w_ref,
                      dx_ref, dw_ref, db_ref, dmul_ref, dadd_ref,
                      da_ref, a_ref, *, slope: float, pad_lo: int,
                      w_dim: int, has_prologue: bool):
    """x_ref/dx_ref: (1, HW, Ci); dy_ref: (1, HW, Co); w_ref/dw_ref:
    (K, K, Ci, Co) (dw f32, accumulated across the batch grid); db/dmul/dadd:
    (1, C) f32 accumulated; da_ref: f32 (HW, Ci) scratch; a_ref: recomputed
    activation scratch (HW, Ci) in x dtype. Every elementwise pass runs in
    row bands (:func:`_band_rows`) so f32 temporaries — and Mosaic's
    register-spill slots, measured at 74 MB for the full-image formulation
    on the hw=15360 ci=256 stage — stay band-sized."""
    from jax.experimental import pallas as pl

    k = w_ref.shape[0]
    hw = x_ref.shape[1]
    ci = x_ref.shape[-1]
    band = _band_rows(hw, ci)
    prec = _dot_precision(x_ref.dtype)
    i = pl.program_id(0)

    # dgrad: da = conv(dy, W') with W'[u,v] = W[k-1-u, k-1-v]^T and
    # pad_lo' = k-1-pad_lo (the transpose of a same-size correlation).
    for r0 in range(0, hw, band):
        r1 = min(hw, r0 + band)
        da_ref[r0:r1, :] = jnp.zeros((r1 - r0, ci), da_ref.dtype)
    for u, v, o, dc in _taps(k, k - 1 - pad_lo, w_dim):
        j0, j1 = max(0, -o), hw - max(0, o)
        for r0 in range(j0, j1, band):
            r1 = min(j1, r0 + band)
            dys = dy_ref[0, r0 + o:r1 + o, :]
            m = _col_mask(r0, r1, w_dim, dc, dys.dtype)
            if m is not None:
                dys = dys * m  # 0/1 mask: exact in any dtype
            da_ref[r0:r1, :] += jax.lax.dot_general(
                dys, w_ref[k - 1 - u, k - 1 - v],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

    # elementwise chain (recomputed activation -> a_ref, dx, per-channel
    # reduction partials), banded; the band partials accumulate in registers
    # (tiny (1, C) vectors).
    db_acc = jnp.zeros(db_ref.shape, jnp.float32)
    dmul_acc = jnp.zeros(dmul_ref.shape, jnp.float32)
    dadd_acc = jnp.zeros(dadd_ref.shape, jnp.float32)
    for r0 in range(0, hw, band):
        r1 = min(hw, r0 + band)
        if has_prologue:
            xb = x_ref[0, r0:r1, :].astype(jnp.float32)
            pre = xb * mul_ref[0] + add_ref[0]
            gate = jnp.where(pre >= 0.0, 1.0, slope)
            a_ref[r0:r1, :] = (pre * gate).astype(a_ref.dtype)
            dab = da_ref[r0:r1, :] * gate
            dx_ref[0, r0:r1, :] = (dab * mul_ref[0]).astype(dx_ref.dtype)
            dmul_acc += jnp.sum(dab * xb, axis=0)[None, :]
            dadd_acc += jnp.sum(dab, axis=0)[None, :]
        else:
            dx_ref[0, r0:r1, :] = da_ref[r0:r1, :].astype(dx_ref.dtype)
        db_acc += jnp.sum(
            dy_ref[0, r0:r1, :].astype(jnp.float32), axis=0)[None, :]
    db_part, dmul_part, dadd_part = db_acc, dmul_acc, dadd_acc

    def act(j0, j1):
        return a_ref[j0:j1, :] if has_prologue else x_ref[0, j0:j1, :]

    # wgrad: dW[u,v] = a_slice^T @ dy_slice over the valid target range,
    # band partials accumulated into one (Ci, Co) f32 register value.
    for u, v, o, dc in _taps(k, pad_lo, w_dim):
        j0, j1 = max(0, -o), hw - max(0, o)
        dw_part = jnp.zeros(dw_ref.shape[2:], jnp.float32)
        for r0 in range(j0, j1, band):
            r1 = min(j1, r0 + band)
            a_s = act(r0 + o, r1 + o)
            m = _col_mask(r0, r1, w_dim, dc, a_s.dtype)
            if m is not None:
                a_s = a_s * m  # 0/1 mask: exact in any dtype
            dw_part += jax.lax.dot_general(
                a_s, dy_ref[0, r0:r1, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (Ci, Co)

        @pl.when(i == 0)
        def _init(u=u, v=v, dw_part=dw_part):
            dw_ref[u, v] = dw_part

        @pl.when(i > 0)
        def _acc(u=u, v=v, dw_part=dw_part):
            dw_ref[u, v] += dw_part

    @pl.when(i == 0)
    def _init_vecs():
        db_ref[...] = db_part
        dmul_ref[...] = dmul_part
        dadd_ref[...] = dadd_part

    @pl.when(i > 0)
    def _acc_vecs():
        db_ref[...] += db_part
        dmul_ref[...] += dmul_part
        dadd_ref[...] += dadd_part


def _stage_bwd_call(x, dy, mul, add, w, *, slope: float, pad_lo: int,
                    has_prologue: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, wd, ci = x.shape
    k, _, _, co = w.shape
    hw = h * wd
    dx, dw, db, dmul, dadd = pl.pallas_call(
        functools.partial(_stage_bwd_kernel, slope=slope, pad_lo=pad_lo,
                          w_dim=wd, has_prologue=has_prologue),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hw, ci), x.dtype),
            jax.ShapeDtypeStruct((k, k, ci, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hw, ci), jnp.float32),  # da
            # recomputed activation (minimal tile when no prologue)
            pltpu.VMEM((hw, ci) if has_prologue else (8, 128), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * hw * k * k * ci * co,
            bytes_accessed=2 * bsz * hw * (ci + co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x.reshape(bsz, hw, ci), dy.reshape(bsz, hw, co),
      mul.reshape(1, ci).astype(jnp.float32),
      add.reshape(1, ci).astype(jnp.float32), w.astype(x.dtype))
    return dx.reshape(bsz, h, wd, ci), dw, db, dmul, dadd


# --------------------------------------------------------------------------
# XLA reference formulation (fallback + backward)
# --------------------------------------------------------------------------


def _ref_fwd(slope, pad_lo, has_prologue, x, mul, add, w, b):
    if has_prologue:
        pre = x.astype(jnp.float32) * mul.astype(jnp.float32) \
            + add.astype(jnp.float32)
        a = jnp.where(pre >= 0.0, pre, slope * pre).astype(x.dtype)
    else:
        a = x
    k = w.shape[0]
    pad = ((pad_lo, k - 1 - pad_lo), (pad_lo, k - 1 - pad_lo))
    y = jax.lax.conv_general_dilated(
        a, w.astype(a.dtype), window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused(slope, pad_lo, has_prologue, use_fwd, use_bwd, x, mul, add, w, b):
    y, _ = _fused_fwd(slope, pad_lo, has_prologue, use_fwd, use_bwd,
                      x, mul, add, w, b)
    return y


def _fused_fwd(slope, pad_lo, has_prologue, use_fwd, use_bwd,
               x, mul, add, w, b):
    if use_fwd:
        y = _stage_call(x, mul, add, w, b, slope=slope, pad_lo=pad_lo,
                        has_prologue=has_prologue, interpret=not _on_tpu())
    else:
        y = _ref_fwd(slope, pad_lo, has_prologue, x, mul, add, w, b)
    return y, (x, mul, add, w, b)


def _fused_bwd(slope, pad_lo, has_prologue, use_fwd, use_bwd, res, dy):
    x, mul, add, w, b = res
    if use_bwd:
        dx, dw, db, dmul, dadd = _stage_bwd_call(
            x, dy, mul, add, w, slope=slope, pad_lo=pad_lo,
            has_prologue=has_prologue, interpret=not _on_tpu())
        return (dx, dmul.reshape(mul.shape).astype(mul.dtype),
                dadd.reshape(add.shape).astype(add.dtype),
                dw.astype(w.dtype), db.reshape(b.shape).astype(b.dtype))
    # vjp of the reference composition: the (unused) primal recompute is dead
    # code XLA eliminates; what remains is exactly today's backward graph —
    # conv-transpose dx chain, wgrad on the recomputed activation, and the
    # per-channel dmul/dadd reductions that carry the batch-statistics terms
    # back into the BatchNorm outside this op.
    _, vjp_fn = jax.vjp(
        lambda *p: _ref_fwd(slope, pad_lo, has_prologue, *p), x, mul, add, w, b)
    return vjp_fn(dy)


_fused.defvjp(_fused_fwd, _fused_bwd)


def affine_act_conv(x, mul, add, kernel, bias, *, slope: float = 0.01,
                    pad_lo: int = 1, use_pallas: bool = False,
                    force_pallas: bool | None = None):
    """y = conv_same(leaky_relu(x*mul + add, slope), kernel) + bias.

    x: (B, H, W, Ci) NHWC; mul/add: (Ci,) f32 per-(packed-)channel affine
    (pass None for both to skip the prologue); kernel: (K, K, Ci, Co) — the
    already-lifted phase kernel; bias: (Co,) (packed-width-tiled by caller).

    Implementation selection:
      - default: the XLA composition — measured FASTER end-to-end at the
        768x1280 flagship (46.2 ms vs 53.1/51.9 ms fused; in-graph XLA fuses
        the normalize+activation into neighboring ops, which the isolated-op
        microbenchmarks of scripts/stage_shape_probe.py could not see);
      - ``use_pallas=True`` (models' ``fused_stages=True`` opt-in): the
        Pallas kernels where :func:`stage_ok`/:func:`stage_bwd_ok` admit
        them (per-side, scoped-VMEM-budgeted so the opt-in cannot OOM);
      - ``force_pallas`` pins both sides unconditionally (kernel tests).
    """
    has_prologue = mul is not None
    if not has_prologue:
        ci = x.shape[-1]
        mul = jnp.ones((ci,), jnp.float32)
        add = jnp.zeros((ci,), jnp.float32)
    if force_pallas is not None:  # pinned (tests): both sides follow the pin
        use_fwd = use_bwd = force_pallas
    elif use_pallas:  # opt-in: fwd and bwd gate independently
        use_fwd, use_bwd = stage_ok(x, kernel), stage_bwd_ok(x, kernel)
    else:  # default: XLA composition
        use_fwd = use_bwd = False
    return _fused(float(slope), int(pad_lo), bool(has_prologue),
                  bool(use_fwd), bool(use_bwd), x, mul, add, kernel, bias)
