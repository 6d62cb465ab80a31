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


def _run_variant(model, variables, batch, key):
    """(recon f32, batch_stats, grads) for one model variant."""
    fwd = jax.jit(lambda v, b: model.apply(
        v, b["x"], b["m"], b["t"], rng=key, train=True,
        rngs={"dropout": key}, mutable=["batch_stats"]))
    out, updates = fwd(variables, batch)

    def loss(p):
        o, _ = model.apply(
            {**variables, "params": p}, batch["x"], batch["m"],
            batch["t"], rng=key, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.sum(o.recon_x.astype(jnp.float32) ** 2) * 1e-3

    grads = jax.tree.map(np.asarray, jax.jit(jax.grad(loss))(variables["params"]))
    return (np.asarray(out.recon_x, np.float32),
            jax.tree.map(np.asarray, updates["batch_stats"]), grads)


def check_midsize(dtype, tol_f, tol_bs, tol_g):
    """f32: fused (via XLA path, Pallas gated off at f32) must match the
    reference composition to float tolerance."""
    hw = (192, 320)
    cfg = VesselConfig()
    batch = make_inputs(4, hw, seed=1)
    key = jax.random.PRNGKey(0)
    variables = None
    outs = {}
    for fused in (False, True):
        model = CausalViTVAE(img_size=hw, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                             dtype=dtype, packed_io=True,
                             fused_stages=fused)
        if variables is None:
            variables = model.init({"params": key, "dropout": key},
                                   batch["x"][:1], batch["m"][:1],
                                   batch["t"][:1], rng=key, train=True)
        outs[fused] = _run_variant(model, variables, batch, key)
    r0, bs0, g0 = outs[False]
    r1, bs1, g1 = outs[True]
    err = np.max(np.abs(r0 - r1)) / (np.max(np.abs(r0)) + 1e-9)
    print(f"midsize {dtype.__name__} recon rel-max-err fused vs ref: {err:.2e}",
          flush=True)
    bs_err = max(float(np.max(np.abs(a - b)))
                 for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)))
    print(f"midsize batch_stats max-abs-err: {bs_err:.2e}", flush=True)
    flat0, flat1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
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


def check_midsize_bf16(ratio=2.0):
    """bf16 correctness vs an f32 ORACLE, not vs the bf16 XLA path.

    A ~15-conv decoder where every stage renormalizes (BatchNorm) chaotically
    amplifies per-stage rounding: two *equally-correct* bf16 programs (XLA
    composition vs Pallas fused kernels, each ~4e-3/stage from the f32 truth,
    scripts/stage_shape_probe.py) drift apart far more than either drifts
    from f32. The meaningful criterion: the fused bf16 path must sit no
    further from the f32 oracle than the XLA bf16 path does (x ``ratio``)."""
    hw = (192, 320)
    cfg = VesselConfig()
    batch = make_inputs(4, hw, seed=1)
    key = jax.random.PRNGKey(0)

    def build(dtype, fused):
        return CausalViTVAE(img_size=hw, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                            dtype=dtype, packed_io=True, fused_stages=fused)

    model = build(jnp.float32, False)
    variables = model.init({"params": key, "dropout": key},
                           batch["x"][:1], batch["m"][:1],
                           batch["t"][:1], rng=key, train=True)
    # oracle at full f32 matmul precision (TPU default computes f32 convs
    # through bf16 passes)
    jax.config.update("jax_default_matmul_precision", "highest")
    oracle = _run_variant(model, variables, batch, key)
    jax.config.update("jax_default_matmul_precision", None)

    errs = {}
    for fused in (False, True):
        r, bs, g = _run_variant(build(jnp.bfloat16, fused), variables, batch, key)
        ro, bso, go = oracle
        rerr = np.max(np.abs(r - ro)) / (np.max(np.abs(ro)) + 1e-9)
        rmean = np.mean(np.abs(r - ro)) / (np.mean(np.abs(ro)) + 1e-9)
        bs_err = max(float(np.max(np.abs(a - b)))
                     for a, b in zip(jax.tree.leaves(bs), jax.tree.leaves(bso)))
        flat, flato = jax.tree.leaves(g), jax.tree.leaves(go)
        gmax = max(float(np.max(np.abs(a))) for a in flato)
        gerr = max(float(np.max(np.abs(a - b)))
                   for a, b in zip(flat, flato)) / gmax
        errs[fused] = (rerr, rmean, bs_err, gerr)
        tag = "fused" if fused else "xla  "
        print(f"midsize bf16 {tag} vs f32 oracle: recon max={rerr:.2e} "
              f"mean={rmean:.2e} bstats={bs_err:.2e} grad={gerr:.2e}",
              flush=True)
    for i, name in enumerate(("recon max", "recon mean", "batch_stats", "grad")):
        ref_e, fus_e = errs[False][i], errs[True][i]
        assert fus_e <= ratio * ref_e + 1e-3, (
            f"{name}: fused bf16 err {fus_e:.3e} > {ratio} x XLA bf16 err "
            f"{ref_e:.3e} vs the f32 oracle")
    print("MIDSIZE bfloat16 OK (oracle-relative)", flush=True)


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
        # bf16: the Pallas fwd+bwd kernels engage; judged against the f32
        # oracle (chain-chaos-safe criterion, see check_midsize_bf16)
        check_midsize_bf16()
    if mode in ("flagship", "both"):
        time_flagship()
