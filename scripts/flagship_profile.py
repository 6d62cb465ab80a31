"""Device-time profile of the flagship vessel train step (768x1280 b8 bf16).

Captures a jax.profiler trace of a few compiled steps and prints the top HLO
ops by self device time (parsed from the xplane proto via
tensorboard_plugin_profile). This is the measured complement to
scripts/flagship_hlo_bytes.py's static estimate.
"""

import glob
import json
import os
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
TRACE_DIR = "/tmp/flagship_trace"


def build_step():
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

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)
    compiled = jax.jit(step).lower(state, batch, key).compile()
    return compiled, state, batch, key


def main():
    t0 = time.time()
    compiled, state, batch, key = build_step()
    print(f"[{time.time()-t0:.0f}s] compiled", file=sys.stderr, flush=True)
    state, metrics = compiled(state, batch, key)
    float(np.asarray(metrics["loss"]))  # warm
    print(f"[{time.time()-t0:.0f}s] warm step done", file=sys.stderr, flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            state, metrics = compiled(state, batch, jax.random.fold_in(key, i))
        float(np.asarray(metrics["loss"]))

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    if not xplanes:
        print("NO TRACE CAPTURED")
        return 1
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    with open("/tmp/flagship_op_profile.json", "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    prof = json.loads(data)

    # walk byCategory tree: children categories -> ops with self time
    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        name = node.get("name", "?")
        out.append((m.get("time", 0.0), depth, name, m))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)

    rows = []
    walk(prof.get("byCategory", prof), 0, rows)
    print("=== op_profile tree (time-normalized fractions) ===")
    for t, depth, name, m in rows[:200]:
        if t and t > 0.005:
            print(f"{'  ' * depth}{name[:80]:80s} time={t:.4f} "
                  f"flops-util={m.get('flops', 0):.3f}")
    return 0


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    sys.exit(main())
