"""Time breakdown of the flagship vessel step (bf16, 768x1280 b8):
encoder fwd / decoder fwd / full fwd+loss / value_and_grad / full step.
Each piece is its own compile (persistent cache makes reruns cheap)."""

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
STEPS = 10


def _sync(out):
    """Fetch ONE scalar from ONE leaf — outputs of a single XLA program
    complete together, and fetching every leaf costs one tunnel RPC each
    (which swamps the measurement)."""
    leaf = jax.tree.leaves(out)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return float(np.asarray(leaf[idx])) if idx else float(np.asarray(leaf))


def timed(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    out = compiled(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = compiled(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "piece": name, "ms": round(dt * 1e3, 1),
        "gflops": round(float(ca.get("flops", 0)) / 1e9, 1),
        "gbytes": round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
    }), flush=True)
    return dt


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
    batch = {"x": x, "m": m, "t": t}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    # --- full fwd + loss ----------------------------------------------------
    def fwd_loss(v, b):
        out, mut = model.apply(v, b["x"], b["m"], b["t"], rng=key, train=True,
                               rngs={"dropout": key}, mutable=["batch_stats"])
        total, _ = loss_fn(out, b)
        return total

    timed("fwd_loss", fwd_loss, variables, batch)

    # --- value_and_grad (no optimizer) --------------------------------------
    def vag(v, b):
        def inner(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                b["x"], b["m"], b["t"], rng=key, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            total, _ = loss_fn(out, b)
            return total

        return jax.value_and_grad(inner)(v["params"])

    timed("value_and_grad", vag, variables, batch)

    # --- full step (grad + clip + adam + BN mutation) ------------------------
    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr))
    state = TrainState.create(variables, tx)
    timed("full_step", step, state, batch, key)

    # --- scanned: SCAN_N steps per dispatch, isolates remote-dispatch RPC ----
    SCAN_N = 8

    def scanned(state0, b, k):
        def body(st, kk):
            st2, metrics = step(st, b, kk)
            return st2, metrics["loss"]

        return jax.lax.scan(body, state0, jax.random.split(k, SCAN_N))

    compiled = jax.jit(scanned, donate_argnums=0).lower(state, batch, key).compile()
    state2, losses = compiled(state, batch, key)
    float(np.asarray(losses)[0])
    t0 = time.perf_counter()
    state2, losses = compiled(state2, batch, jax.random.fold_in(key, 1))
    float(np.asarray(losses)[0])
    dt = (time.perf_counter() - t0) / SCAN_N
    print(json.dumps({"piece": f"scanned_step_x{SCAN_N}", "ms": round(dt * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
