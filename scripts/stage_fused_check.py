"""TPU validation + timing for the fused BN+LeakyReLU+conv decoder stages.

1) Mid-size (192x320) f32 forward: fused_stages=True (Pallas) must match
   fused_stages=False (reference composition) tightly.
2) Flagship (768x1280 b8 bf16 packed_io) full train step: ms/step with the
   fused decoder, vs the 46.2 ms round-3 baseline.
"""

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
from causalvae_tpu.ops.subpixel import space_to_depth_n
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState


def make_inputs(batch, hw, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(space_to_depth_n(
        (rng.random((batch, *hw, 1)) > 0.9).astype(np.float32), 3))
    m = jnp.asarray(rng.standard_normal((batch, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, batch)])
    return {"x": x, "m": m, "t": t}


def check_midsize(dtype, tol_f, tol_bs, tol_g):
    hw = (192, 320)
    cfg = VesselConfig()
    batch = make_inputs(4, hw, seed=1)
    key = jax.random.PRNGKey(0)
    outs = {}
    variables = None
    for fused in (False, True):
        model = CausalViTVAE(img_size=hw, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                             dtype=dtype, packed_io=True,
                             fused_stages=fused)
        if not outs:
            variables = model.init({"params": key, "dropout": key},
                                   batch["x"][:1], batch["m"][:1],
                                   batch["t"][:1], rng=key, train=True)
        fwd = jax.jit(lambda v, b: model.apply(
            v, b["x"], b["m"], b["t"], rng=key, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"]))
        out, updates = fwd(variables, batch)
        outs[fused] = (np.asarray(out.recon_x, np.float32),
                       jax.tree.map(np.asarray, updates["batch_stats"]))
    r0, bs0 = outs[False]
    r1, bs1 = outs[True]
    err = np.max(np.abs(r0 - r1)) / (np.max(np.abs(r0)) + 1e-9)
    print(f"midsize {dtype.__name__} recon rel-max-err fused vs ref: {err:.2e}",
          flush=True)
    bs_err = max(float(np.max(np.abs(a - b)))
                 for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)))
    print(f"midsize batch_stats max-abs-err: {bs_err:.2e}", flush=True)

    # gradients: exercises the fused BACKWARD kernel on TPU
    grads = {}
    for fused in (False, True):
        model = CausalViTVAE(img_size=hw, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                             dtype=dtype, packed_io=True,
                             fused_stages=fused)

        def loss(p):
            out, _ = model.apply(
                {**variables, "params": p}, batch["x"], batch["m"],
                batch["t"], rng=key, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return jnp.sum(out.recon_x.astype(jnp.float32) ** 2) * 1e-3

        grads[fused] = jax.tree.map(np.asarray,
                                    jax.jit(jax.grad(loss))(variables["params"]))
    flat0 = jax.tree.leaves(grads[False])
    flat1 = jax.tree.leaves(grads[True])
    # normalize by the GLOBAL gradient scale: conv biases feeding a BN have
    # mathematically-zero gradients (the mean subtraction cancels them), so
    # per-leaf relative error on those leaves is noise/noise
    gmax = max(float(np.max(np.abs(a))) for a in flat0)
    gerr = max(float(np.max(np.abs(a - b))) for a, b in zip(flat0, flat1)) / gmax
    print(f"midsize grad err (rel to global max |g|): {gerr:.2e}", flush=True)
    assert err < tol_f, err
    assert bs_err < tol_bs, bs_err
    assert gerr < tol_g, gerr
    print(f"MIDSIZE {dtype.__name__} OK", flush=True)


def time_flagship():
    hw = (768, 1280)
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=hw, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16, packed_io=True)

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True,
                         needs_dropout=True)
    batch = make_inputs(8, hw)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, batch["x"][:1],
                           batch["m"][:1], batch["t"][:1], rng=key, train=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)
    t0 = time.time()
    compiled = jax.jit(step, donate_argnums=0).lower(state, batch, key).compile()
    print(f"flagship compiled in {time.time() - t0:.0f}s", flush=True)
    ca = compiled.cost_analysis()
    state, metrics = compiled(state, batch, key)
    loss0 = float(np.asarray(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(10):
        state, metrics = compiled(state, batch, jax.random.fold_in(key, i))
    loss9 = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / 10
    print({
        "ms_per_step": round(dt * 1e3, 1),
        "bytes_per_step_gb": round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
        "xla_tflops": round(float(ca.get("flops", 0)) / 1e12, 2),
        "hbm_roofline_frac": round(float(ca.get("bytes accessed", 0)) / dt / 819e9, 4),
        "loss_first": round(loss0, 3), "loss_last": round(loss9, 3),
    }, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("mid", "both"):
        # f32: Pallas gated OFF (stage_ok) — validates the emit-affine
        # restructure through the XLA path. Pin full-precision matmuls:
        # XLA's TPU default computes f32 convs at bf16, which amplifies the
        # fold's 1e-7-level re-association into bf16-ulp output diffs.
        jax.config.update("jax_default_matmul_precision", "highest")
        check_midsize(jnp.float32, 1e-4, 1e-3, 1e-4)
        jax.config.update("jax_default_matmul_precision", None)
        # bf16: the Pallas fwd+bwd kernels engage. Tolerances are chain-level
        # bf16 rounding: each stage renormalizes (BatchNorm), so per-stage
        # ~4e-3 kernel-vs-XLA rounding diffs accumulate ~additively across
        # the ~15-conv decoder (measured 5e-2 recon; per-kernel compiled
        # parity is ~3e-3, and the f32 path above is exact — see
        # scripts/stage_kernel_tpu_test.py).
        check_midsize(jnp.bfloat16, 8e-2, 2e-2, 6e-2)
    if mode in ("flagship", "both"):
        time_flagship()
