"""Headline benchmark: MNIST causal-VAE training throughput (images/sec/chip).

Measures the fused adversarial train step (SURVEY.md T1: discriminator update +
VAE update with BCE+KLD+morph+confusion losses, two Adam optimizers — ref
mnist_test/01_baseline_causal_vae/train.py:34-93) at the reference's batch size
(128), on whatever accelerator jax sees (the driver runs this on one real TPU
chip).

Baseline: the same training step implemented in PyTorch (the reference's
framework) on the same host, written here independently from the reference's
hyperparameters — **torch-cpu**: no CUDA device exists on this host and torch
has no TPU backend, so this is the honest "what the reference stack delivers
on this machine" number (recorded in the JSON as ``baseline_hw``).
BASELINE.json's north-star target is >10x images/sec/chip.

Also measures:
- the FLAGSHIP workload — the vessel CausalViTVAE full train step at the
  reference's production config (768x1280, batch 8; ref
  vessel_analysis/00_core/config.py:9-23) — in f32 and bf16, with XLA cost
  analysis for FLOPs/bytes per step -> MFU and %-of-HBM-roofline on a v5e chip;
- PARITY: optimizer-trajectory loss deltas vs the actual torch reference
  train loops (BASELINE metric #1, train/parity.py);
- SERVING: client-visible latency/throughput through the dynamic-batching
  engine and AOT artifacts, MNIST family + the 768x1280 flagship family.

Output protocol (timeout-proof): emits a COMPLETE JSON line as soon as the
headline number exists, then re-emits progressively richer lines (same object,
more blocks: counterfactual latency, flagship f32/bf16) as each stage lands.
Every line is a superset of the previous one, so whichever line a harness
parses (first or last) is valid; a SIGTERM mid-run triggers one final emission
of everything measured so far. A wall-clock budget (``BENCH_BUDGET_S`` env,
default 1200 s) gates the expensive flagship compiles rather than dying in
them.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

BATCH = 128
WARMUP = 5
STEPS = 500
TORCH_STEPS = 16
# median-of-k: single torch-cpu runs vary ~2x on a loaded host. 2 (not 3)
# since round 5: the third run bought little median stability and its ~20 s
# belongs to the budgeted stages (VERDICT r4 next-step #2).
TORCH_RUNS = 2

FLAGSHIP_BATCH = 8
FLAGSHIP_HW = (768, 1280)
FLAGSHIP_STEPS = 10
# TPU v5e single chip: peak dense matmul throughput and HBM bandwidth.
# Under jax's DEFAULT matmul precision the MXU executes single bf16 passes
# for BOTH bf16 and f32 operands (f32 arrays are rounded to bf16 inputs with
# f32 accumulation), so MFU is normalized against the bf16 peak for both
# dtype runs. Round 3 normalized the f32 run against the 49 TF/s fp32-pass
# peak, which produced a physically impossible MFU of 1.41 (ADVICE r3) —
# that peak only applies under jax.default_matmul_precision('highest').
V5E_PEAK_FLOPS = 197e12  # bf16-pass MXU peak
V5E_HBM_BW = 819e9  # bytes/sec
# XLA cost analysis of the SPATIAL (packed=False) formulation of the same
# step — the dense-equivalent "useful" flops (phase-packed kernels carry
# structurally-zero taps that XLA counts as work)
FLAGSHIP_LOGICAL_FLOPS = 1.613e12


def _flagship_setup(dtype_name: str):
    """Model + fused step + fresh state + synthetic batch for the flagship
    workload, shared by the per-dispatch and scanned measurements."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.ops import losses as L
    from causalvae_tpu.train.loop import make_vae_step
    from causalvae_tpu.train.state import TrainState

    cfg = VesselConfig()
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = CausalViTVAE(img_size=FLAGSHIP_HW, m_dim=12, t_dim=19,
                         z_dim=cfg.z_dim, dtype=dtype, packed_io=True)

    def loss_fn(out, batch):
        return L.vessel_loss(out, batch["x"], batch["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    rng = np.random.default_rng(0)
    from causalvae_tpu.ops.subpixel import space_to_depth_n

    # production input pipeline delivers the image host-packed (free reshape)
    x = jnp.asarray(space_to_depth_n(
        (rng.random((FLAGSHIP_BATCH, *FLAGSHIP_HW, 1)) > 0.9)
        .astype(np.float32), 3))
    m = jnp.asarray(rng.standard_normal((FLAGSHIP_BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, FLAGSHIP_BATCH)])
    batch = {"x": x, "m": m, "t": t}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)
    return step, state, batch, key


# ---------------------------------------------------------------------------
# Compile prewarming. Measured on this host (2026-08-20): the remote-TPU
# tunnel's compile+executable-load cost dominates every big stage — 100-400 s
# per flagship-class program (10-40 MB serialized) EVEN on a persistent-cache
# hit, and two compile submissions demonstrably overlap (2 unique mid-size
# programs: 8.2 s serial vs 5.1 s in threads). So the compile-heavy stage
# programs are built on a 2-worker background pool, started right after the
# headline jax measurement (never concurrent with it, so the artifact's
# latency numbers stay uncontaminated; the overlapped phases — torch-cpu
# baselines and the parity stage — measure numerical deltas or pure-CPU
# throughput, not TPU latency). Stages then find their executable already
# loaded in-process and measure in seconds.
_PREWARM: dict = {}


def _flagship_runner(dtype_name: str):
    """Build + compile the flagship step; returns a dict bench_flagship
    consumes. Separated from the measurement so the compile can prewarm."""
    import jax

    step, state, batch, key = _flagship_setup(dtype_name)
    compiled = jax.jit(step, donate_argnums=0).lower(state, batch, key).compile()
    return {"compiled": compiled, "state": state, "batch": batch, "key": key}


def _scanned_runner():
    """Build + compile the production make_scan_epoch program (bf16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from causalvae_tpu.ops.subpixel import space_to_depth_n
    from causalvae_tpu.train.scan_loop import make_scan_epoch

    # Scan length amortizes the per-dispatch cost, which through the remote
    # tunnel is ~14 ms/dispatch (measured N-sweep, EVIDENCE round 5:
    # 39.2 ms/step at N=8, 37.9 at N=32 -> o~=14 ms, device-true step
    # ~=37.5 ms). 32 steps/dispatch is production-realistic (vessel epochs
    # are dozens of steps; CLI --scan-steps) and within ~0.4 ms of the
    # asymptote; the stacked-batch HBM cost is ~1 GB.
    SCAN_N = 32
    step, state, _, key = _flagship_setup("bfloat16")
    rng = np.random.default_rng(7)
    stacked = {
        "x": jnp.asarray(space_to_depth_n(
            (rng.random((SCAN_N, FLAGSHIP_BATCH, *FLAGSHIP_HW, 1)) > 0.9)
            .astype(np.float32).reshape(-1, *FLAGSHIP_HW, 1), 3)
            .reshape(SCAN_N, FLAGSHIP_BATCH, FLAGSHIP_HW[0] // 8,
                     FLAGSHIP_HW[1] // 8, 64)),
        "m": jnp.asarray(rng.standard_normal(
            (SCAN_N, FLAGSHIP_BATCH, 12)).astype(np.float32)),
        "t": jnp.asarray(np.eye(19, dtype=np.float32)[
            rng.integers(0, 19, (SCAN_N, FLAGSHIP_BATCH))]),
    }
    epoch = jax.jit(make_scan_epoch(step, n_states=1), donate_argnums=0)
    rngs = jax.random.split(key, SCAN_N)
    compiled = epoch.lower((state,), stacked, rngs).compile()
    return {"compiled": compiled, "state": state, "stacked": stacked,
            "key": key, "rngs": rngs, "scan_n": SCAN_N}


def start_prewarm() -> None:
    """Kick off background compiles for the flagship-family stages, in stage
    order. Call AFTER the headline jax measurement."""
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=2)
    _PREWARM["_pool"] = pool
    for name, builder in (  # submit in STAGE order, 2 in flight
        ("flagship_bfloat16", lambda: _flagship_runner("bfloat16")),
        ("flagship_float32", lambda: _flagship_runner("float32")),
        ("scanned", _scanned_runner),
    ):
        _PREWARM[name] = pool.submit(builder)


def _prewarmed(name: str):
    """The prewarmed runner if start_prewarm ran, else None (standalone
    callers like scripts/flagship_sched_probe.py build inline). A prewarm
    that FAILED (the remote compile service flakes under long uploads —
    observed: 'response body closed before all bytes were read') returns
    None so the stage rebuilds inline as its retry."""
    fut = _PREWARM.get(name)
    if fut is None:
        return None
    try:
        return fut.result()
    except Exception as e:  # stage will rebuild inline
        print(f"[prewarm {name} failed, stage rebuilds inline: {e}]"[:300],
              file=sys.stderr, flush=True)
        return None


def prewarm_barrier() -> float:
    """Block until every outstanding prewarm compile has settled; returns the
    wait in seconds. MUST run before any stage that measures TPU latency:
    a measurement taken while a 10-40 MB executable upload is in flight on
    the shared tunnel reads ~2x slow (observed: 93.8 ms/step for the 41.9 ms
    flagship step)."""
    t0 = time.time()
    for name, fut in list(_PREWARM.items()):
        if name != "_pool":
            try:
                fut.result()
            except Exception:
                pass  # surfaced by _prewarmed at stage time
    return time.time() - t0


def bench_flagship(dtype_name: str) -> dict:
    """Full vessel train step (ELBO with dynamic pos_weight + sparsity +
    Gaussian-NLL, BatchNorm mutation, in-kernel attention dropout, grad-clip,
    Adam) at 768x1280 batch 8 — ms/step, images/sec/chip, MFU, HBM roofline."""
    import jax
    import numpy as np

    run = _prewarmed(f"flagship_{dtype_name}")
    if run is None:
        run = _flagship_runner(dtype_name)
    compiled, state, batch, key = (run["compiled"], run["state"],
                                   run["batch"], run["key"])
    ca = compiled.cost_analysis()
    # XLA-counted flops include the structurally-zero taps of the
    # phase-packed conv kernels (ops/subpixel.py) — ~2.8x the logical
    # (spatial-formulation) flops, so MFU is reported against both counts.
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    state, metrics = compiled(state, batch, key)
    float(np.asarray(metrics["loss"]))  # device fetch = reliable barrier
    t0 = time.perf_counter()
    for i in range(FLAGSHIP_STEPS):
        state, metrics = compiled(state, batch, jax.random.fold_in(key, i))
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / FLAGSHIP_STEPS
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "images_per_sec_per_chip": round(FLAGSHIP_BATCH / dt, 2),
        "xla_flops_per_step": flops,
        "logical_flops_per_step": FLAGSHIP_LOGICAL_FLOPS,
        "bytes_per_step": bytes_acc,
        "matmul_pass": "bf16 (jax default matmul precision; f32 arrays run "
                       "as bf16 passes with f32 accumulation on the MXU)",
        "mfu_xla_counted": round(flops / dt / V5E_PEAK_FLOPS, 4),
        "mfu_logical": round(FLAGSHIP_LOGICAL_FLOPS / dt / V5E_PEAK_FLOPS, 4),
        "hbm_roofline_frac": round(bytes_acc / dt / V5E_HBM_BW, 4),
    }


def bench_flagship_scanned() -> dict:
    """The flagship step in PRODUCTION TRAINING MODE: SCAN_N optimizer steps
    per dispatch via the SAME make_scan_epoch program production training
    jits (train/scan_loop.py; CLI --scan-steps), bf16, scanning over SCAN_N
    DISTINCT stacked batches — so the scan body's HLO matches real training
    and XLA cannot hoist batch-dependent work (dynamic pos_weight, input
    transforms) out of the loop as invariants (ADVICE r4 medium). Removes the
    per-launch host-dispatch/tunnel cost from the measured step.
    HLO-identical to scripts/flagship_scan_bench.py run at the same SCAN_N
    so the persistent compile cache is shared."""
    import jax
    import numpy as np

    run = _prewarmed("scanned")
    if run is None:
        run = _scanned_runner()
    compiled, state, stacked, key, rngs, SCAN_N = (
        run["compiled"], run["state"], run["stacked"], run["key"],
        run["rngs"], run["scan_n"])
    (state,), losses = compiled((state,), stacked, rngs)
    float(np.asarray(losses["loss"])[0])  # device fetch = reliable barrier
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        (state,), losses = compiled(
            (state,), stacked, jax.random.split(jax.random.fold_in(key, i),
                                                SCAN_N))
    float(np.asarray(losses["loss"])[0])
    dt = (time.perf_counter() - t0) / (SCAN_N * reps)
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "images_per_sec_per_chip": round(FLAGSHIP_BATCH / dt, 2),
        "timing": f"device-resident: {SCAN_N} optimizer steps per dispatch "
                  f"(make_scan_epoch lax.scan over {SCAN_N} distinct stacked "
                  f"batches), {reps} dispatches timed",
    }


def _enable_compile_cache():
    """Persistent executable cache — the 768x1280 flagship step costs ~15 min
    of (remote) compile cold; cached reruns skip it. Scoped per host-CPU
    signature (utils/cache.py) so stale cross-host CPU executables can never
    be executed from a shared cache."""
    import os

    from causalvae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        min_secs=10)


def bench_counterfactual() -> dict:
    """Counterfactual generation latency (BASELINE.json metric #3): the
    batched on-device do(T) intervention grid — abduct z for 128 sources,
    sweep all 10 target digits, decode 1280 images in ONE device launch
    (ref mnist_test/01_baseline_causal_vae/visualize.py:12-99, done there as
    a Python loop of per-image decoder calls)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from causalvae_tpu.config import MnistConfig
    from causalvae_tpu.models.vae import CausalConvVAE
    from causalvae_tpu.scm.intervene import do_t_grid

    cfg = MnistConfig()
    model = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    n_src, n_tgt = 128, 10
    x = jnp.asarray(rng.random((n_src, 28, 28, 1), np.float32))
    m = jnp.asarray(rng.standard_normal((n_src, cfg.m_dim)).astype(np.float32))
    t = jax.nn.one_hot(jnp.asarray(rng.integers(0, 10, n_src)), cfg.t_dim)
    t_targets = jnp.eye(n_tgt, cfg.t_dim)
    variables = model.init({"params": key}, x, m, t, rng=key)

    # scan the grid on device: per-dispatch tunnel latency to the remote chip
    # is ~10-25 ms and run-to-run noisy, so a host loop of jitted calls
    # measures the tunnel, not the chip. reps grids run inside ONE program
    # over distinct sources (a stacked leading axis), reduced to a checksum
    # so output traffic stays constant.
    reps = 20
    xs = jnp.stack([x + i * 1e-3 for i in range(reps)])

    def body(c, xi):
        g = do_t_grid(model, variables, xi, m, t, t_targets)
        return c + jnp.sum(g), None

    run = jax.jit(lambda xs: jax.lax.scan(body, jnp.float32(0), xs)[0])
    float(np.asarray(run(xs)))  # compile + hard sync
    t0 = time.perf_counter()
    float(np.asarray(run(xs)))  # device fetch = reliable barrier
    dt = (time.perf_counter() - t0) / reps
    return {
        "workload": f"do_t_grid_{n_src}x{n_tgt}_mnist",
        "ms_per_grid": round(dt * 1e3, 2),
        "images_per_sec": round(n_src * n_tgt / dt, 1),
        "timing": f"device-side: {reps} grids scanned in one program",
    }


def bench_parity(include_vessel: bool = True) -> dict:
    """Optimizer-trajectory ELBO parity vs the torch reference loop
    (BASELINE.json metric #1): reference models built in torch exactly as the
    reference does, init ported into flax, IDENTICAL injected reparam noise,
    reference train loop vs the fused jitted step — per-step total-loss
    relative deltas (train/parity.py; jax side runs on this chip in f32
    'highest' matmul precision, torch side on the host CPU)."""
    from causalvae_tpu.train.parity import run_mnist_parity, run_vessel_parity

    def summarize(r, tol):
        return {
            "ref": r["ref"],
            "n_steps": r["n_steps"],
            "rel_delta_max": r["rel_delta_max"],
            "rel_delta_median": r["rel_delta_median"],
            "rel_delta_final": r["rel_delta_final"],
            "tolerance": tol,
            "pass": bool(r["rel_delta_max"] < tol),
            "torch_loss_first_last": r["torch_loss_first_last"],
            "jax_loss_first_last": r["jax_loss_first_last"],
        }

    out = {"mnist_adversarial_c1": summarize(
        run_mnist_parity(steps=12, batch=32), 2e-4)}
    if include_vessel:
        out["vessel_cnn_c7_128x256"] = summarize(
            run_vessel_parity(steps=8, batch=2, hw=(128, 256)), 5e-3)
        # the FLAGSHIP family (C9): trajectory through the real phase-packed
        # + Pallas-flash-attention training path on this chip vs the torch
        # reference loop on the host (VERDICT r4 next-step #1). Tolerance
        # from the measured per-step growth law (results/
        # parity_horizon_cpu.json; docs/PARITY.md derivation).
        from causalvae_tpu.train.parity_vit import run_vit_parity

        out["causal_vit_c9_64x96_packed"] = summarize(
            run_vit_parity(steps=8, batch=4, hw=(64, 96), depth=2), 2e-2)
    return out


def _percentiles_ms(samples):
    import numpy as np

    a = np.sort(np.asarray(samples)) * 1e3
    return {"p50_ms": round(float(np.percentile(a, 50)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2)}


def bench_serving() -> dict:
    """Client-visible serving numbers on the MNIST family (VERDICT r3 demand
    #2 / weak #6): batch-1 p50/p99 through the dynamic-batching engine,
    coalesced throughput under 64 concurrent clients, the full client-visible
    do(T) grid (128 sources x 10 targets through one engine call, host
    round-trip included — the device-side number is the ``counterfactual``
    block), and AOT-exported-artifact latency vs live jit."""
    import threading

    import numpy as np

    import jax
    import jax.numpy as jnp

    from causalvae_tpu.config import MnistConfig
    from causalvae_tpu.models.vae import CausalConvVAE
    from causalvae_tpu.serve.endpoints import endpoint_arg_specs, vae_endpoints
    from causalvae_tpu.serve.engine import BatchingEngine

    cfg = MnistConfig()
    model = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
                          gaussian_mechanism=True, decode_real_m=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    variables = model.init({"params": key}, jnp.zeros((1, 28, 28, 1)),
                           jnp.zeros((1, cfg.m_dim)), jnp.zeros((1, cfg.t_dim)),
                           rng=key)
    eps = vae_endpoints(model, variables)

    def batch(n):
        return (rng.random((n, 28, 28, 1)).astype(np.float32),
                rng.standard_normal((n, cfg.m_dim)).astype(np.float32),
                np.eye(cfg.t_dim, dtype=np.float32)[
                    rng.integers(0, cfg.t_dim, n)])

    out = {"family": "mnist_causal_vae"}
    t_one = np.eye(cfg.t_dim, dtype=np.float32)[:1]
    with BatchingEngine(eps, buckets=(1, 8, 64, 128),
                        max_delay_s=0.002) as eng:
        lat = {}
        for name, args in (("reconstruct", batch(1)), ("do_t", batch(1)),
                           ("predict_m", (t_one,)),
                           ("uncertainty", (t_one,))):
            eng.infer(name, *args)  # compile/warm the b1 bucket
            samples = []
            for _ in range(30):
                t0 = time.perf_counter()
                eng.infer(name, *args)
                samples.append(time.perf_counter() - t0)
            lat[name] = _percentiles_ms(samples)
        out["single_request"] = lat

        # client-visible full counterfactual grid: one request, 128 sources
        args = batch(128)
        eng.infer("do_t", *args)  # warm the 128 bucket
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            grid = eng.infer("do_t", *args)
        dt = (time.perf_counter() - t0) / reps
        out["do_t_grid_128x10_client_visible"] = {
            "ms_per_grid": round(dt * 1e3, 2),
            "images_per_sec": round(128 * 10 / dt, 1),
            "timing": "engine.infer round-trip incl. host dispatch + fetch "
                      "of the (128,10,28,28,1) grid",
        }

        # coalesced throughput: 64 concurrent batch-1 clients
        for b in (8, 64):
            eng.infer("reconstruct", *batch(b))  # warm coalesced buckets
        per_client, n_clients = 8, 64
        launches0, rows0 = eng.stats["launches"], eng.stats["rows"]

        def client(i):
            a = batch(1)
            for _ in range(per_client):
                eng.infer("reconstruct", *a)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = n_clients * per_client
        out["concurrent_64_clients"] = {
            "requests": total,
            "requests_per_sec": round(total / dt, 1),
            "device_launches": eng.stats["launches"] - launches0,
            "mean_rows_per_launch": round(
                (eng.stats["rows"] - rows0)
                / max(eng.stats["launches"] - launches0, 1), 2),
        }

    # k-fold-ensemble endpoints (mean + spread over 5 stacked fold params —
    # the served form of ref ensemble_reconstruction.py:54-92 /
    # extract_uncertainty_by_treatment.py:68-117; VERDICT r4 next-step #5)
    from causalvae_tpu.serve.endpoints import ensemble_endpoints

    stacked = jax.tree.map(
        lambda *leaves: jnp.stack(leaves),
        *[model.init({"params": jax.random.PRNGKey(i)},
                     jnp.zeros((1, 28, 28, 1)), jnp.zeros((1, cfg.m_dim)),
                     jnp.zeros((1, cfg.t_dim)), rng=key)
          for i in range(5)])
    ens = ensemble_endpoints(model, stacked)
    with BatchingEngine(ens, buckets=(1,), max_delay_s=0.002) as eng:
        lat = {}
        z1 = rng.standard_normal((1, cfg.z_dim)).astype(np.float32)
        m1 = rng.standard_normal((1, cfg.m_dim)).astype(np.float32)
        for name, args in (("decode", (m1, z1)), ("predict_m", (t_one,)),
                           ("uncertainty", (t_one,))):
            eng.infer(name, *args)
            samples = []
            for _ in range(30):
                t0 = time.perf_counter()
                eng.infer(name, *args)
                samples.append(time.perf_counter() - t0)
            lat[name] = _percentiles_ms(samples)
        out["ensemble_5fold_single_request"] = lat

    # AOT artifact vs live jit (batch-1 reconstruct)
    import tempfile

    from causalvae_tpu.serve.export import export_endpoints, load_exported

    with tempfile.TemporaryDirectory() as d:
        export_endpoints({"reconstruct": eps["reconstruct"]},
                         endpoint_arg_specs(model), d, buckets=(1,))
        bundle = load_exported(d)
        args = batch(1)
        bundle.call("reconstruct", *args)
        samples = []
        for _ in range(30):
            t0 = time.perf_counter()
            bundle.call("reconstruct", *args)
            samples.append(time.perf_counter() - t0)
        out["aot_single_request"] = _percentiles_ms(samples)
    return out


def bench_serving_flagship() -> dict:
    """Flagship-family serving on hardware: 768x1280 CausalViTVAE (bf16)
    reconstruct/do_t batch-1 through the BatchingEngine and reconstruct
    through an AOT ExportedBundle (ref workload it replaces:
    vessel_analysis/04_generate_counterfactual/generate_counterfactual.py:85-108)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.serve.endpoints import endpoint_arg_specs, vae_endpoints
    from causalvae_tpu.serve.engine import BatchingEngine

    cfg = VesselConfig()
    model = CausalViTVAE(img_size=FLAGSHIP_HW, m_dim=12, t_dim=19,
                         z_dim=cfg.z_dim, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x1 = jnp.zeros((1, *FLAGSHIP_HW, 1))
    variables = model.init({"params": key, "dropout": key}, x1,
                           jnp.zeros((1, 12)), jnp.zeros((1, 19)),
                           rng=key, train=False)
    eps = vae_endpoints(model, variables)
    x = rng.random((1, *FLAGSHIP_HW, 1)).astype(np.float32)
    m = rng.standard_normal((1, 12)).astype(np.float32)
    t = np.eye(19, dtype=np.float32)[:1]

    out = {"family": "vessel_causal_vit_vae_768x1280_bf16"}
    with BatchingEngine(eps, buckets=(1,), max_delay_s=0.002) as eng:
        for name, reps in (("reconstruct", 15), ("do_t", 5)):
            eng.infer(name, x, m, t)  # compile/warm
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                eng.infer(name, x, m, t)
                samples.append(time.perf_counter() - t0)
            out[name] = _percentiles_ms(samples)
    out["do_t"]["note"] = ("client-visible incl. fetch of the full "
                           "(1,19,768,1280,1) counterfactual grid")

    import tempfile

    from causalvae_tpu.serve.export import export_endpoints, load_exported

    with tempfile.TemporaryDirectory() as d:
        export_endpoints({"reconstruct": eps["reconstruct"]},
                         endpoint_arg_specs(model), d, buckets=(1,))
        bundle = load_exported(d)
        bundle.call("reconstruct", x, m, t)
        samples = []
        for _ in range(15):
            t0 = time.perf_counter()
            bundle.call("reconstruct", x, m, t)
            samples.append(time.perf_counter() - t0)
        out["aot_reconstruct"] = _percentiles_ms(samples)
    return out


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from causalvae_tpu.config import MnistConfig
    from causalvae_tpu.models.heads import LatentDiscriminator
    from causalvae_tpu.models.vae import CausalConvVAE
    from causalvae_tpu.train.loop import make_mnist_adversarial_step
    from causalvae_tpu.train.state import TrainState

    cfg = MnistConfig()
    vae = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    disc = LatentDiscriminator(t_dim=cfg.t_dim)

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, 28, 28, 1), np.float32))
    m = jnp.asarray(rng.standard_normal((BATCH, cfg.m_dim)).astype(np.float32))
    t = jax.nn.one_hot(jnp.asarray(rng.integers(0, 10, BATCH)), cfg.t_dim)
    batch = {"x": x, "m": m, "t": t}

    vae_vars = vae.init({"params": key}, x, m, t, rng=key)
    d_vars = disc.init(key, jnp.zeros((BATCH, cfg.z_dim)))
    vae_state = TrainState.create(vae_vars, optax.adam(cfg.lr))
    d_state = TrainState.create(d_vars, optax.adam(cfg.lr))

    from causalvae_tpu.train.scan_loop import make_scan_epoch

    step = make_mnist_adversarial_step(vae, disc, cfg)

    # Train-loop-on-device: scan STEPS optimizer steps inside one XLA program
    # (real per-step data via a stacked leading axis), so host->device dispatch
    # overhead is amortized exactly as a production TPU input pipeline would.
    run = jax.jit(make_scan_epoch(step, n_states=2), donate_argnums=0)
    stacked = {
        k: jnp.broadcast_to(v, (STEPS,) + v.shape) for k, v in batch.items()
    }
    rngs = jax.random.split(key, STEPS)

    states, metrics = run((vae_state, d_state), stacked, rngs)
    float(np.asarray(metrics["loss"]).sum())  # compile+warmup; fetch = hard sync
    t0 = time.perf_counter()
    states, metrics = run(states, stacked, rngs)
    # device->host fetch is the only reliable completion barrier through the
    # remote-execution tunnel (block_until_ready returns early there)
    float(np.asarray(metrics["loss"]).sum())
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_torch() -> float:
    """Reference-stack baseline: equivalent adversarial step in PyTorch."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    dev = "cuda" if torch.cuda.is_available() else "cpu"

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.Sequential(
                nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(),
                nn.Conv2d(32, 64, 4, 2, 1), nn.ReLU(), nn.Flatten(),
            )
            self.fc = nn.Sequential(nn.Linear(64 * 49 + 22, 512), nn.ReLU())
            self.head = nn.Linear(512, 20)
            self.morph = nn.Sequential(nn.Linear(10, 128), nn.ReLU(), nn.Linear(128, 12))
            self.dec_fc = nn.Sequential(nn.Linear(22, 64 * 49), nn.ReLU())
            self.dec = nn.Sequential(
                nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ReLU(),
                nn.ConvTranspose2d(32, 1, 4, 2, 1), nn.Sigmoid(),
            )

        def forward(self, x, m, t):
            h = self.fc(torch.cat([self.enc(x), m, t], 1))
            mu, logvar = self.head(h).chunk(2, 1)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            m_hat = self.morph(t)
            r = self.dec(self.dec_fc(torch.cat([m_hat, z], 1)).view(-1, 64, 7, 7))
            return r, m_hat, mu, logvar, z

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(10, 64), nn.LeakyReLU(0.2),
                nn.Linear(64, 64), nn.LeakyReLU(0.2), nn.Linear(64, 10),
            )

        def forward(self, z):
            return self.net(z)

    vae, disc = VAE().to(dev), Disc().to(dev)
    opt_v = torch.optim.Adam(vae.parameters(), 1e-3)
    opt_d = torch.optim.Adam(disc.parameters(), 1e-3)
    x = torch.rand(BATCH, 1, 28, 28, device=dev)
    m = torch.randn(BATCH, 12, device=dev)
    ti = torch.randint(0, 10, (BATCH,), device=dev)
    t = F.one_hot(ti, 10).float()

    def one_step():
        r, m_hat, mu, logvar, z = vae(x, m, t)
        opt_d.zero_grad()
        F.cross_entropy(disc(z.detach()), ti).backward()
        opt_d.step()
        opt_v.zero_grad()
        r, m_hat, mu, logvar, z = vae(x, m, t)
        bce = F.binary_cross_entropy(r, x, reduction="sum")
        kld = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
        morph = 100.0 * F.mse_loss(m_hat, m, reduction="sum")
        logp = F.log_softmax(disc(z), 1)
        conf = 1000.0 * F.kl_div(
            logp, torch.full_like(logp, 0.1), reduction="batchmean"
        )
        (bce + kld + morph + conf).backward()
        opt_v.step()

    for _ in range(2):
        one_step()
    if dev == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        one_step()
    if dev == "cuda":
        torch.cuda.synchronize()
    return BATCH * TORCH_STEPS / (time.perf_counter() - t0)


def main():
    t_start = time.time()
    # 2400 s default since round 5: stage costs are dominated by the remote
    # compile/executable-load tunnel, whose latency varies ~4x run-to-run
    # (measured 2026-08-20: the same warm-cache flagship stage 297 s vs
    # >900 s an hour later). The emit-superset protocol makes a hard kill at
    # any point lossless-to-the-last-stage, so a larger default only ever
    # adds blocks to the artifact; 1200 s guaranteed skipped blocks two
    # rounds running (r4: serving/serving_flagship/scanned all skipped).
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    result: dict = {}

    def emit():
        print(json.dumps(result), flush=True)

    def on_term(signum, frame):  # timeout sends SIGTERM: flush what we have
        if result:
            emit()
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_term)
    _enable_compile_cache()

    jax_ips = bench_jax()
    # headline jax measurement done -> overlap the flagship-family compiles
    # with the torch-cpu baselines and the parity stage (which measure CPU
    # throughput / numerical deltas, not TPU latency). See _PREWARM.
    start_prewarm()
    torch_runs = []
    for _ in range(TORCH_RUNS):
        try:
            torch_runs.append(bench_torch())
        except Exception:
            pass
    torch_ips = sorted(torch_runs)[len(torch_runs) // 2] if torch_runs else None
    vs = jax_ips / torch_ips if torch_ips else None
    result.update(
        {
            "metric": "mnist_causal_vae_train_throughput",
            "value": round(jax_ips, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(vs, 2) if vs is not None else None,
            "baseline_hw": "torch-cpu (no CUDA on host; torch has no TPU "
            f"backend); median of {len(torch_runs)} runs "
            f"{[round(r, 1) for r in torch_runs]}",
            "headline_elapsed_s": round(time.time() - t_start, 1),
        }
    )
    emit()  # headline is now on stdout no matter what happens below

    try:
        result["counterfactual"] = bench_counterfactual()
    except Exception as e:
        result["counterfactual"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    emit()

    flagship: dict = {"workload": "vessel_causal_vit_vae_768x1280_batch8_train_step"}
    result["flagship"] = flagship

    def run_stage(store, key_name, fn, reserve_s):
        """Budget-gated stage; never lets one stage kill the headline line.
        Reserves assume a warm .jax_cache/tpu (shared across hosts since
        round 5 — utils/cache.py); cold compiles can eat the whole budget,
        which the emit-superset protocol tolerates. Every stage records its
        own wall time as ``elapsed_s`` so a budget overrun in the artifact
        is attributable to the stage that caused it (VERDICT r4 weak #1)."""
        remaining = budget - (time.time() - t_start)
        t_stage = time.time()
        if remaining < reserve_s:
            store[key_name] = {
                "skipped": f"budget: {remaining:.0f}s left < {reserve_s:.0f}s reserve"
            }
        else:
            try:
                store[key_name] = fn()
            except Exception as e:
                store[key_name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        if isinstance(store[key_name], dict):
            store[key_name]["elapsed_s"] = round(time.time() - t_stage, 1)
        emit()

    # stage order = evidence priority: trajectory parity (BASELINE metric #1),
    # then both flagship train dtypes back-to-back (comparable device/tunnel
    # state — an r4 run that measured f32 last, after a failed serving stage,
    # recorded 150.9 ms vs its steady-state ~55 ms), then serving.
    run_stage(result, "parity", bench_parity, 240.0)
    # Quiet the tunnel before anything latency-sensitive runs: wait out all
    # background compiles (uploads contend with measurement dispatches).
    flagship["prewarm_wait_s"] = round(prewarm_barrier(), 1)
    # flagship stages consume the prewarmed executables (see _PREWARM):
    # their own cost is seconds of measurement + however long the background
    # compile still needs; reserves sized for the wait-then-measure shape.
    run_stage(flagship, "bfloat16", lambda: bench_flagship("bfloat16"), 120.0)
    run_stage(flagship, "float32", lambda: bench_flagship("float32"), 120.0)
    run_stage(result, "serving", bench_serving, 120.0)
    run_stage(result, "serving_flagship", bench_serving_flagship, 180.0)
    run_stage(flagship, "bfloat16_scanned", bench_flagship_scanned, 90.0)


if __name__ == "__main__":
    main()
