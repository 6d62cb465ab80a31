"""Train the MNIST causal VAE to convergence on the TPU and run the
reference's quality gates (SURVEY.md §4) end-to-end, writing EVIDENCE.md.

Reproduces the reference's mnist_test/01+02 workflow (train -> mechanism
validity -> residual leakage -> latent diagnostics -> do(T) grid) on the
synthetic glyph corpus (no MNIST download in this environment; morphology is
class-dependent, so the T->M mechanism is learnable the same way).

Usage: python scripts/evidence_run.py [--n 4096] [--epochs 40] [--out results/evidence]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def vessel_evidence(args):
    """Vessel-stack convergence on the TPU: train a mid-size CausalViTVAE on
    a synthetic MIP corpus, then the decoder-uses-M diagnostic (I5), a do(M)
    sweep artifact (I2) and MC-decode uncertainty (ref north-star MC sampling)."""
    import time

    import jax
    import jax.numpy as jnp

    from causalvae_tpu.analysis import plots
    from causalvae_tpu.analysis.vessel_report import m_influence_check
    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import synthetic_corpus
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.scm.intervene import abduct, do_m_sweep
    from causalvae_tpu.scm.uncertainty import mc_decode_stats
    from causalvae_tpu.train.workloads import train_vessel

    t0 = time.time()

    def log(s):
        print(f"[{time.time() - t0:6.1f}s] [vessel] {s}", flush=True)

    hw = (192, 320)  # /32 stem -> 6x10 token grid (same aspect as 768x1280)
    corpus = synthetic_corpus(n=48, hw=hw, seed=0)
    cfg = VesselConfig(batch_size=8, epochs=args.vessel_epochs, z_dim=32)
    model = CausalViTVAE(img_size=hw, m_dim=corpus.m.shape[1],
                         t_dim=corpus.t_dim, z_dim=32, embed_dim=128,
                         depth=4, heads=8, mlp_dim=256, vit_latent_dim=128)
    log(f"training CausalViTVAE {hw} on {jax.devices()}")
    model, state, logger = train_vessel(corpus, cfg, model=model, img_hw=hw)
    losses = [r["train_loss"] for r in logger.history if "train_loss" in r]
    log(f"loss {losses[0]:.0f} -> {losses[-1]:.0f} over {len(losses)} epochs")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    from causalvae_tpu.data.vessel import iterate_batches

    b = next(iterate_batches(corpus, "val", 4, hw, augment=False,
                             drop_remainder=False))
    x, m, t = jnp.asarray(b["x"]), jnp.asarray(b["m"]), jnp.asarray(b["t"])

    infl = m_influence_check(model, variables, x, m, t)
    log(f"I5 m-influence: {json.dumps({k: v for k, v in infl.items()})}")

    sweep = jnp.linspace(-5.0, 5.0, 3)
    out = do_m_sweep(model, variables, x[:1], m[:1], t[:1],
                     jnp.arange(2), sweep)
    plots.sweep_strip(np.asarray(out[0, 0]), np.asarray(sweep),
                      os.path.join(args.out, "vessel_do_m_sweep.png"),
                      feature_name="feat0")

    mu, logvar = model.apply(variables, x, m, t, method=model.encode)
    mean, std = mc_decode_stats(model, variables, m, mu, logvar,
                                jax.random.PRNGKey(0), n_mc=8)
    plots.recon_triptych(np.asarray(x), np.asarray(mean),
                         os.path.join(args.out, "vessel_mc_recon.png"),
                         uncertainty=np.asarray(std))
    log("artifacts: vessel_do_m_sweep.png, vessel_mc_recon.png")
    return {
        "vessel_first_loss": float(losses[0]),
        "vessel_final_loss": float(losses[-1]),
        "vessel_m_influence_verdict": infl["verdict"],
        "vessel_m_pixel_diff": infl["mean_pixel_diff"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--vessel", action="store_true")
    ap.add_argument("--vessel-only", action="store_true")
    ap.add_argument("--vessel-epochs", type=int, default=30)
    ap.add_argument("--out", default="results/evidence")
    args = ap.parse_args()

    if args.vessel_only:
        os.makedirs(args.out, exist_ok=True)
        report = vessel_evidence(args)
        with open(os.path.join(args.out, "evidence_vessel.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report, indent=1), flush=True)
        return

    import jax
    import jax.numpy as jnp
    import optax

    from causalvae_tpu.analysis import plots
    from causalvae_tpu.analysis.latent_viz import disentanglement_score, encode_corpus
    from causalvae_tpu.analysis.mechanism import mechanism_validity, phase1_importance
    from causalvae_tpu.analysis.residual import residual_leakage_analysis
    from causalvae_tpu.config import FEATURE_NAMES_12, MnistConfig
    from causalvae_tpu.data.mnist import build_morph_mnist, synthetic_mnist
    from causalvae_tpu.models.heads import LatentDiscriminator
    from causalvae_tpu.models.vae import CausalConvVAE
    from causalvae_tpu.scm.intervene import do_t_grid, intervention_matrix
    from causalvae_tpu.train.loop import make_mnist_adversarial_step
    from causalvae_tpu.train.scan_loop import ScanTrainer
    from causalvae_tpu.train.state import TrainState
    from causalvae_tpu.utils.metrics import write_csv

    t0 = time.time()

    def log(s):
        print(f"[{time.time() - t0:6.1f}s] {s}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    cfg = MnistConfig()
    names = list(FEATURE_NAMES_12)

    log(f"devices: {jax.devices()}")
    images, labels = synthetic_mnist(args.n, seed=42)
    ds = build_morph_mnist(images, labels)
    n_test = args.n // 8
    log(f"corpus {ds.x.shape}, morphology precomputed on device")

    vae = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    disc = LatentDiscriminator(t_dim=cfg.t_dim)
    key = jax.random.PRNGKey(cfg.seed)
    b2 = (jnp.asarray(ds.x[:2]), jnp.asarray(ds.m[:2]), jnp.asarray(ds.t[:2]))
    vae_vars = vae.init({"params": key}, *b2, rng=key)
    d_vars = disc.init(key, jnp.zeros((2, cfg.z_dim)))
    states = (TrainState.create(vae_vars, optax.adam(cfg.lr)),
              TrainState.create(d_vars, optax.adam(cfg.lr)))

    step = make_mnist_adversarial_step(vae, disc, cfg)
    trainer = ScanTrainer(step, n_states=2, steps_per_dispatch=16)
    rng = np.random.default_rng(cfg.seed)
    first = last = None
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        states, metrics = trainer.run_epoch(
            states, ds.batches(cfg.batch_size, rng), sub)
        if metrics:
            last = {k: float(v) for k, v in metrics.items()}
            first = first or last
            if epoch % 10 == 0 or epoch == args.epochs - 1:
                log(f"epoch {epoch}: {json.dumps(last)}")
    vae_state, d_state = states
    variables = {"params": vae_state.params}
    elbo_per_img = (last["recon"] + last["kld"]) / cfg.batch_size
    log(f"trained; final -ELBO/img = {elbo_per_img:.2f}")

    # --- quality gates on the held-out tail -----------------------------
    xte, mte, tte = ds.x[-n_test:], ds.m[-n_test:], ds.t[-n_test:]
    lte = ds.labels[-n_test:]

    mech = mechanism_validity(vae, variables, mte, tte, names)
    log(f"A1 mechanism validity: avg R2 = {mech['avg_r2']:.3f} -> {mech['verdict']}")

    res = residual_leakage_analysis(vae, variables, xte, mte, tte, lte, epochs=10)
    log(f"A2 residual leakage: acc = {res['accuracy']:.3f} -> {res['verdict']}")

    z = encode_corpus(vae, variables, xte, mte, tte)
    dscore = disentanglement_score(z, lte)
    log(f"Z disentanglement (T-from-Z logreg acc, lower better): {dscore:.3f}")

    p1 = phase1_importance(vae, variables, 10, names)
    log(f"A4 top features: {p1['ranking'][:4]}")

    grid = do_t_grid(vae, variables, jnp.asarray(xte[:10]), jnp.asarray(mte[:10]),
                     jnp.asarray(tte[:10]), jnp.eye(10, dtype=jnp.float32))
    plots.intervention_grid(xte[:10], np.asarray(grid),
                            os.path.join(args.out, "do_t_grid.png"))
    # 10x10 Orig/Pred/Diff CSV (ref visualize.py:12-51)
    mat = np.asarray(intervention_matrix(
        vae, variables, jnp.asarray(mte[:10]),
        jnp.eye(10, dtype=jnp.float32)))  # (10, 10, 3, 12)
    write_csv(
        os.path.join(args.out, "intervention_10x10.csv"),
        [{"source": i, "target": j,
          **{f"{names[f]}_orig": float(mat[i, j, 0, f]) for f in range(12)},
          **{f"{names[f]}_pred": float(mat[i, j, 1, f]) for f in range(12)},
          **{f"{names[f]}_diff": float(mat[i, j, 2, f]) for f in range(12)}}
         for i in range(10) for j in range(10)],
    )

    report = {
        "n_images": args.n, "epochs": args.epochs,
        "final_neg_elbo_per_image": elbo_per_img,
        "first_epoch_loss": first["loss"], "final_epoch_loss": last["loss"],
        "mechanism_avg_r2": mech["avg_r2"], "mechanism_verdict": mech["verdict"],
        "mechanism_r2_per_feature": mech["r2"],
        "residual_classifier_acc": res["accuracy"],
        "residual_verdict": res["verdict"],
        "z_disentanglement_acc": dscore,
        "phase1_top_features": p1["ranking"][:5],
    }
    if args.vessel:
        report.update(vessel_evidence(args))

    with open(os.path.join(args.out, "evidence.json"), "w") as f:
        json.dump(report, f, indent=1)
    log(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
