"""Microbenchmark the Pallas flash-attention kernel at the flagship shape
(B=8, H=8, N=961, D=32): forward and full vjp, with and without in-kernel
dropout. Compares against the XLA fallback formulation on the same device."""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from causalvae_tpu.ops.kernels import attention as ka

import os

# sweep the kernel's grid constants without editing the module:
#   ATTN_GROUP=8 ATTN_FWD_ROWS=1024 python scripts/attn_bench.py
for _env, _attr in (("ATTN_GROUP", "GROUP_BH"), ("ATTN_FWD_ROWS", "FWD_ROWS"),
                    ("ATTN_BWD_ROWS", "BWD_ROWS")):
    if os.environ.get(_env):
        setattr(ka, _attr, int(os.environ[_env]))

B, H, N, D = 8, 8, 961, 32
STEPS = 30


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({"bench": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
               .astype(jnp.bfloat16) for _ in range(3))
    seed = jnp.uint32(7)

    f = jax.jit(lambda q, k, v: ka.flash_attention(q, k, v))
    fd = jax.jit(lambda q, k, v: ka.flash_attention(
        q, k, v, dropout_rate=0.1, dropout_seed=seed))
    g = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2),
                         argnums=(0, 1, 2)))
    gd = jax.jit(jax.grad(lambda *a: jnp.sum(fd(*a).astype(jnp.float32) ** 2),
                          argnums=(0, 1, 2)))
    x = jax.jit(lambda q, k, v: ka._xla_attention(q, k, v, 1.0 / np.sqrt(D)))
    gx = jax.jit(jax.grad(lambda *a: jnp.sum(x(*a).astype(jnp.float32) ** 2),
                          argnums=(0, 1, 2)))

    timed("flash_fwd", f, q, k, v)
    timed("flash_fwd_dropout", fd, q, k, v)
    timed("flash_grad", g, q, k, v)
    timed("flash_grad_dropout", gd, q, k, v)
    timed("xla_fwd", x, q, k, v)
    timed("xla_grad", gx, q, k, v)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
