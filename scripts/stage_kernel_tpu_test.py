"""Compiled (Mosaic) correctness check of the fused stage kernels on TPU.

Interpret mode validates the math; this validates the LOWERING — small
shapes, fast compiles, fwd + bwd, f32 + bf16, K3/K2, flagship-like W=40.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from causalvae_tpu.ops.kernels import stage as ks


def case(seed, b, h, w, ci, co, k, pad_lo, dtype, slope=0.2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32)).astype(dtype)
    mul = jnp.asarray(rng.standard_normal(ci).astype(np.float32))
    add = jnp.asarray(rng.standard_normal(ci).astype(np.float32))
    wgt = jnp.asarray((rng.standard_normal((k, k, ci, co)) * 0.05)
                      .astype(np.float32)).astype(dtype)
    bias = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((b, h, w, co)).astype(np.float32)).astype(dtype)
    return x, mul, add, wgt, bias, dy


def rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def run(name, b, h, w, ci, co, k, pad_lo, dtype, tol_f, tol_b):
    x, mul, add, wgt, bias, dy = case(0, b, h, w, ci, co, k, pad_lo, dtype)
    slope = 0.2

    f_pal = jax.jit(lambda *p: ks._stage_call(
        *p, slope=slope, pad_lo=pad_lo, has_prologue=True, interpret=False))
    f_ref = jax.jit(lambda x, mul, add, wgt, bias: ks._ref_fwd(
        slope, pad_lo, True, x, mul, add, wgt, bias))
    e_f = rel(f_pal(x, mul, add, wgt, bias), f_ref(x, mul, add, wgt, bias))

    b_pal = jax.jit(lambda *p: ks._stage_bwd_call(
        *p, slope=slope, pad_lo=pad_lo, has_prologue=True, interpret=False))
    dx, dw, db, dmul, dadd = b_pal(x, dy, mul, add, wgt)

    _, vjp_fn = jax.vjp(
        lambda *p: ks._ref_fwd(slope, pad_lo, True, *p), x, mul, add, wgt, bias)
    dx_r, dmul_r, dadd_r, dw_r, db_r = jax.jit(vjp_fn)(dy)
    e_b = max(rel(dx, dx_r), rel(dw, np.asarray(dw_r, np.float32)),
              rel(np.asarray(db).ravel(), db_r),
              rel(np.asarray(dmul).ravel(), dmul_r),
              rel(np.asarray(dadd).ravel(), dadd_r))
    ok = e_f < tol_f and e_b < tol_b
    print(f"{name}: fwd {e_f:.2e} bwd {e_b:.2e} {'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def main():
    # f32 tolerances are bf16-MXU-pass level: Mosaic ignores the multi-pass
    # precision request, which is WHY stage_ok gates production to bf16 —
    # these rows check structural correctness, not f32 accuracy.
    ok = True
    ok &= run("f32 K3 16x16", 2, 16, 16, 128, 64, 3, 1, jnp.float32, 1e-2, 2e-2)
    ok &= run("f32 K3 24x40", 2, 24, 40, 256, 128, 3, 1, jnp.float32, 1e-2, 2e-2)
    ok &= run("bf16 K3 24x40", 2, 24, 40, 256, 128, 3, 1, jnp.bfloat16, 3e-2, 6e-2)
    ok &= run("f32 K2p0 16x16", 2, 16, 16, 128, 64, 2, 0, jnp.float32, 1e-2, 2e-2)
    ok &= run("f32 K2p1 16x16", 2, 16, 16, 128, 64, 2, 1, jnp.float32, 1e-2, 2e-2)
    ks._ACC_BYTES = 24 * 40 * 256 * 4  # force 4-way channel chunking
    ok &= run("bf16 K2p0 24x40 co1024 chunked", 2, 24, 40, 256, 1024, 2, 0,
              jnp.bfloat16, 3e-2, 6e-2)
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    sys.exit(main())
