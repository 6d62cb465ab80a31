"""Scanned flagship step: N optimizer steps per dispatch (device-resident
loop), isolating remote-dispatch overhead from true device step time.
Complements scripts/flagship_bench.py (per-dispatch measurement)."""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")

from causalvae_tpu.config import VesselConfig
from causalvae_tpu.models.vit import CausalViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState

BATCH = 8
HW = (768, 1280)
SCAN_N = 8


def main():
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((BATCH, *HW, 1)) > 0.9).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, BATCH)])
    batch = {"x": x, "m": m, "t": t}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr))
    state = TrainState.create(variables, tx)

    def scanned(state0, b, k):
        def body(st, kk):
            st2, metrics = step(st, b, kk)
            return st2, metrics["loss"]

        return jax.lax.scan(body, state0, jax.random.split(k, SCAN_N))

    t_c0 = time.perf_counter()
    compiled = jax.jit(scanned, donate_argnums=0).lower(state, batch, key).compile()
    print(f"compiled in {time.perf_counter() - t_c0:.0f}s", file=sys.stderr)
    state, losses = compiled(state, batch, key)
    float(np.asarray(losses)[0])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        state, losses = compiled(state, batch, jax.random.fold_in(key, i))
    float(np.asarray(losses)[0])
    dt = (time.perf_counter() - t0) / (SCAN_N * reps)
    print(json.dumps({
        "piece": f"scanned_step_x{SCAN_N}_bf16",
        "ms_per_step": round(dt * 1e3, 1),
        "images_per_sec_per_chip": round(BATCH / dt, 2),
    }))


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
