"""Flagship vessel train-step benchmark: CausalViTVAE 768x1280 batch 8.

Measures the FULL training step (vessel ELBO with dynamic pos_weight +
sparsity + Gaussian-NLL morph loss, BatchNorm mutation, dropout, grad-clip,
Adam) in f32 and bf16, with XLA cost analysis for FLOPs/bytes -> MFU and
%-of-HBM-roofline (ref workload: vessel_analysis/00_core/config.py:9-23,
01_train/train_kfold.py:142-246).

Usage: python -u scratch/flagship_bench.py [f32|bf16|both] [--steps N]
"""

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
# TPU v5e (one chip): peak dense matmul throughput and HBM bandwidth
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12}
HBM_BW = 819e9  # bytes/sec


def build(dtype_name: str):
    cfg = VesselConfig()
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=dtype)

    def loss_fn(out, batch):
        return L.vessel_loss(out, batch["x"], batch["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((BATCH, *HW, 1)) > 0.9).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, BATCH)])
    batch = {"x": x, "m": m, "t": t}

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr))
    state = TrainState.create(variables, tx)
    return step, state, batch


def measure(dtype_name: str, steps: int = 20):
    step, state, batch = build(dtype_name)
    jstep = jax.jit(step, donate_argnums=0)
    key = jax.random.PRNGKey(1)

    # one compile: time the compiled executable itself (a second jit call
    # path would recompile; the dispatch cache is not shared with .lower())
    compiled = jstep.lower(state, batch, key).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    state, metrics = compiled(state, batch, key)
    float(np.asarray(metrics["loss"]))  # sync
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = compiled(state, batch, jax.random.fold_in(key, i))
    float(np.asarray(metrics["loss"]))  # device fetch = reliable barrier
    dt = (time.perf_counter() - t0) / steps

    peak = PEAK_FLOPS[dtype_name]
    rec = {
        "dtype": dtype_name,
        "ms_per_step": round(dt * 1e3, 1),
        "images_per_sec_per_chip": round(BATCH / dt, 2),
        "flops_per_step": flops,
        "bytes_per_step": bytes_acc,
        "mfu": round(flops / dt / peak, 4),
        "hbm_roofline_frac": round(bytes_acc / dt / HBM_BW, 4),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    steps = 20
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    print("devices:", jax.devices(), file=sys.stderr)
    if which in ("f32", "both"):
        measure("float32", steps)
    if which in ("bf16", "both"):
        measure("bfloat16", steps)
