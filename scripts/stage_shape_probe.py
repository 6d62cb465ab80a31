"""Per-shape TPU probe for the fused stage kernels at FLAGSHIP geometry.

For every stage shape the 768x1280 packed CausalViTVAE routes through
affine_act_conv, compile + time (a) the Pallas fused kernel and (b) the XLA
reference composition, forward and backward, each in its own try/except so a
single Mosaic VMEM blow-up reports instead of killing the sweep. Prints an
incremental table; exit code 0 iff every shape the stage_ok/stage_bwd_ok
policy would FUSE actually compiles and is not slower than XLA.

Ref workload: vessel_analysis/00_core/vit_backbone.py:74-156 stem/decoder
stages after the subpixel packing (ops/subpixel.py).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from causalvae_tpu.ops.kernels import stage as ks

# (name, h, w, ci, co, k, pad_lo) — every unique affine_act_conv instance in
# the flagship graph (traced via jax.eval_shape on CausalViTVAE init)
SHAPES = [
    ("stem1",  96, 160, 512,  256, 2, 1),
    ("stem2",  96, 160, 256,  128, 2, 1),
    ("dec_fc", 24,  40, 256,  512, 2, 0),
    ("res1",   48,  80, 128,  128, 3, 1),
    ("ct2",    48,  80, 128,  256, 2, 0),
    ("res2",   48,  80, 256,  256, 3, 1),
    ("ct3",    48,  80, 256,  512, 2, 0),
    ("res3a",  96, 160, 128,  128, 3, 1),
    ("ct4a",   96, 160, 128,  256, 2, 0),
    ("res3b",  96, 160, 256,  256, 3, 1),
    ("ct4",    96, 160, 256, 1024, 2, 0),
    ("out",    96, 160, 1024,  64, 3, 1),
]
BATCH = 8
SLOPE = 0.2


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)  # sync via fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1e3


def probe(name, h, w, ci, co, k, pad_lo):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((BATCH, h, w, ci)), dt)
    mul = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    add = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal(co), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((BATCH, h, w, co)), dt)
    hw = h * w
    fuse_f = ks._fwd_vmem_estimate(hw, ci, co, k, 2) <= ks._VMEM_BUDGET
    fuse_b = ks._bwd_vmem_estimate(hw, ci, co, k, 2) <= ks._VMEM_BUDGET
    row = {"policy": f"fwd={'F' if fuse_f else 'x'} bwd={'F' if fuse_b else 'x'}"}

    f_ref = jax.jit(lambda *p: ks._ref_fwd(SLOPE, pad_lo, True, *p))
    row["fwd_xla"] = timed(f_ref, x, mul, add, wgt, bias)

    try:
        f_pal = jax.jit(lambda *p: ks._stage_call(
            *p, slope=SLOPE, pad_lo=pad_lo, has_prologue=True,
            interpret=False))
        row["fwd_pal"] = timed(f_pal, x, mul, add, wgt, bias)
        y_p, y_r = f_pal(x, mul, add, wgt, bias), f_ref(x, mul, add, wgt, bias)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                    - y_r.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(y_r.astype(jnp.float32))) + 1e-9))
        row["fwd_err"] = err
    except Exception as e:
        row["fwd_pal"] = f"ERR {type(e).__name__}: {str(e)[:120]}"

    b_ref = jax.jit(lambda xx, dd: jax.vjp(
        lambda *p: ks._ref_fwd(SLOPE, pad_lo, True, *p),
        xx, mul, add, wgt, bias)[1](dd))
    row["bwd_xla"] = timed(b_ref, x, dy)

    try:
        b_pal = jax.jit(lambda xx, dd: ks._stage_bwd_call(
            xx, dd, mul, add, wgt, slope=SLOPE, pad_lo=pad_lo,
            has_prologue=True, interpret=False))
        row["bwd_pal"] = timed(b_pal, x, dy)
        dxp = b_pal(x, dy)[0]
        dxr = b_ref(x, dy)[0]
        err = float(jnp.max(jnp.abs(dxp.astype(jnp.float32)
                                    - dxr.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(dxr.astype(jnp.float32))) + 1e-9))
        row["bwd_err"] = err
    except Exception as e:
        row["bwd_pal"] = f"ERR {type(e).__name__}: {str(e)[:120]}"
    return row


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    bad = []
    for spec in SHAPES:
        name = spec[0]
        t0 = time.time()
        row = probe(*spec)
        msg = [f"{name:7s} [{row['policy']}]"]
        for kk in ("fwd_xla", "fwd_pal", "bwd_xla", "bwd_pal"):
            v = row.get(kk)
            msg.append(f"{kk}={v:.2f}ms" if isinstance(v, float) else f"{kk}={v}")
        for kk in ("fwd_err", "bwd_err"):
            if kk in row:
                msg.append(f"{kk}={row[kk]:.1e}")
        print("  ".join(msg), f"({time.time()-t0:.0f}s)", flush=True)
        fuse_f = "fwd=F" in row["policy"]
        fuse_b = "bwd=F" in row["policy"]
        if fuse_f and not isinstance(row.get("fwd_pal"), float):
            bad.append(f"{name} fwd: policy fuses but kernel failed")
        if fuse_b and not isinstance(row.get("bwd_pal"), float):
            bad.append(f"{name} bwd: policy fuses but kernel failed")
    if bad:
        print("POLICY VIOLATIONS:", *bad, sep="\n  ")
        return 1
    print("ALL POLICY-FUSED SHAPES COMPILED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
