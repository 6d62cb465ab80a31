"""Scanned flagship step: N optimizer steps per dispatch (device-resident
loop), isolating remote-dispatch overhead from true device step time.
Complements scripts/flagship_bench.py (per-dispatch measurement)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")

from causalvae_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache("/root/repo/.jax_cache", min_secs=10)

from causalvae_tpu.config import VesselConfig
from causalvae_tpu.models.vit import CausalViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState

import os

BATCH = 8
HW = (768, 1280)
# SCAN_N=8 is the production default (bench.py number of record); override
# to probe how much per-dispatch overhead remains in scanned mode (at N=8 a
# ~2 ms launch cost amortizes to ~0.25 ms/step; N=32 should shave ~0.19 of
# that if the ledger's decomposition is right, i.e. barely move).
SCAN_N = int(os.environ.get("SCAN_N", "8"))


def main():
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16, packed_io=True)
    rng = np.random.default_rng(0)
    from causalvae_tpu.ops.subpixel import space_to_depth_n

    x = jnp.asarray(space_to_depth_n(
        (rng.random((BATCH, *HW, 1)) > 0.9).astype(np.float32), 3))
    m = jnp.asarray(rng.standard_normal((BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, BATCH)])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)
    # SCAN_N DISTINCT stacked batches — same program shape as production
    # scanned training (make_scan_epoch); a single closed-over batch lets XLA
    # hoist batch-dependent work out of the loop (ADVICE r4 medium).
    rng2 = np.random.default_rng(7)
    stacked = {
        "x": jnp.asarray(space_to_depth_n(
            (rng2.random((SCAN_N, BATCH, *HW, 1)) > 0.9)
            .astype(np.float32).reshape(-1, *HW, 1), 3)
            .reshape(SCAN_N, BATCH, HW[0] // 8, HW[1] // 8, 64)),
        "m": jnp.asarray(rng2.standard_normal(
            (SCAN_N, BATCH, 12)).astype(np.float32)),
        "t": jnp.asarray(np.eye(19, dtype=np.float32)[
            rng2.integers(0, 19, (SCAN_N, BATCH))]),
    }

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)

    from causalvae_tpu.train.scan_loop import make_scan_epoch

    epoch = jax.jit(make_scan_epoch(step, n_states=1), donate_argnums=0)
    rngs = jax.random.split(key, SCAN_N)
    # SCHED_OPTS: JSON dict of XLA compiler options for the scheduler-flag
    # probe (VERDICT r4 #8). XLA_FLAGS cannot carry TPU-backend flags here —
    # the axon client's local flag parser rejects them (Unknown flag); the
    # per-compile compiler_options proto reaches the remote compile service,
    # which validates them (bogus names -> HTTP 500).
    sched_opts = json.loads(os.environ.get("SCHED_OPTS", "null"))
    t_c0 = time.perf_counter()
    compiled = epoch.lower((state,), stacked, rngs).compile(
        compiler_options=sched_opts)
    print(f"compiled in {time.perf_counter() - t_c0:.0f}s "
          f"(compiler_options={sched_opts})", file=sys.stderr)
    (state,), losses = compiled((state,), stacked, rngs)
    float(np.asarray(losses["loss"])[0])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        (state,), losses = compiled(
            (state,), stacked,
            jax.random.split(jax.random.fold_in(key, i), SCAN_N))
    float(np.asarray(losses["loss"])[0])
    dt = (time.perf_counter() - t0) / (SCAN_N * reps)
    print(json.dumps({
        "piece": f"scanned_step_x{SCAN_N}_bf16",
        "ms_per_step": round(dt * 1e3, 1),
        "images_per_sec_per_chip": round(BATCH / dt, 2),
    }))


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
