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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--out", default="results/evidence")
    args = ap.parse_args()

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
    # 10x10 Orig/Pred/Diff CSV (ref visualize.py:12-51): per (source, target),
    # the measured source M vs the mechanism's predicted M for the target
    pred = np.asarray(intervention_matrix(
        vae, variables, jnp.asarray(xte[:10]), jnp.asarray(mte[:10]),
        jnp.asarray(tte[:10]), jnp.eye(10, dtype=jnp.float32)))  # (10, 12)
    write_csv(
        os.path.join(args.out, "intervention_10x10.csv"),
        [{"source": i, "target": j,
          **{f"{names[f]}_orig": float(mte[i, f]) for f in range(12)},
          **{f"{names[f]}_pred": float(pred[j, f]) for f in range(12)},
          **{f"{names[f]}_diff": float(pred[j, f] - mte[i, f]) for f in range(12)}}
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
    with open(os.path.join(args.out, "evidence.json"), "w") as f:
        json.dump(report, f, indent=1)
    log(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
