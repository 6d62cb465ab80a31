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
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def phase2_evidence(args):
    """Measurement-approach + mediation evidence on trained models (VERDICT r1
    item 6): train the 16-feature causal VAE and a CVAE, run the Phase-2
    on-device re-measurement (A5, ref mnist_test/03_measurement_approach/
    analyze_counterfactual.py:93-102 and analyze_cvae.py:129-146), the
    Phase-1-vs-2 comparison (A6) and the Monte-Carlo mediation decomposition
    (I7, ref analyze_mediation.py:120-201) for the reference's 1->7 / 1->8
    digit pairs."""
    import jax
    import jax.numpy as jnp
    import optax

    from causalvae_tpu.analysis.importance import (
        compare_phases, pairwise_cohens_d, phase2_importance,
    )
    from causalvae_tpu.analysis.mechanism import phase1_importance
    from causalvae_tpu.config import FEATURE_NAMES_16, MnistConfig
    from causalvae_tpu.data.mnist import build_morph_mnist, synthetic_mnist
    from causalvae_tpu.models.heads import LatentDiscriminator
    from causalvae_tpu.models.vae import CausalConvVAE
    from causalvae_tpu.scm.intervene import abduct, decode, mediation_contributions, predict_m
    from causalvae_tpu.train.loop import make_mnist_adversarial_step
    from causalvae_tpu.train.scan_loop import ScanTrainer
    from causalvae_tpu.train.state import TrainState
    from causalvae_tpu.train.workloads import train_cvae

    t0 = time.time()

    def log(s):
        print(f"[{time.time() - t0:6.1f}s] [phase2] {s}", flush=True)

    names = list(FEATURE_NAMES_16)
    cfg = MnistConfig(m_dim=16)
    log(f"devices: {__import__('jax').devices()}")
    images, labels = synthetic_mnist(args.n, seed=42)
    ds = build_morph_mnist(images, labels, n_features=16)
    log(f"16-feature corpus {ds.x.shape} (device-precomputed morphology)")

    # --- train the 16-feature adversarial causal VAE (C1 at m_dim=16) ------
    vae = CausalConvVAE(m_dim=16, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    disc = LatentDiscriminator(t_dim=cfg.t_dim)
    key = jax.random.PRNGKey(cfg.seed)
    b2 = (jnp.asarray(ds.x[:2]), jnp.asarray(ds.m[:2]), jnp.asarray(ds.t[:2]))
    vae_vars = vae.init({"params": key}, *b2, rng=key)
    d_vars = disc.init(key, jnp.zeros((2, cfg.z_dim)))
    states = (TrainState.create(vae_vars, optax.adam(cfg.lr)),
              TrainState.create(d_vars, optax.adam(cfg.lr)))
    trainer = ScanTrainer(make_mnist_adversarial_step(vae, disc, cfg),
                          n_states=2, steps_per_dispatch=16)
    rng = np.random.default_rng(cfg.seed)
    last = None
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        states, metrics = trainer.run_epoch(states, ds.batches(cfg.batch_size, rng), sub)
        if metrics:
            last = {k: float(v) for k, v in metrics.items()}
    variables = {"params": states[0].params}
    log(f"causal VAE trained {args.epochs} epochs; final loss {last['loss']:.0f}")

    # --- A4 phase 1: mechanism sensitivity ---------------------------------
    p1 = phase1_importance(vae, variables, cfg.t_dim, names)
    log(f"A4 phase-1 top: {p1['ranking'][:5]}")

    # --- A5 phase 2: generate counterfactuals, re-measure ON DEVICE --------
    n_z = 100  # fixed z pool (ref analyze_counterfactual.py:40 uses 100)
    xte = jnp.asarray(ds.x[-n_z:])
    mte = jnp.asarray(ds.m[-n_z:])
    tte = jnp.asarray(ds.t[-n_z:])
    z_pool = abduct(vae, variables, xte, mte, tte)

    def decode_fn(t_eye, z):
        m_hats = predict_m(vae, variables, t_eye)  # (T, m)

        def per_t(m_hat):
            mt = jnp.broadcast_to(m_hat[None], (z.shape[0], m_hat.shape[0]))
            return decode(vae, variables, mt, z)

        return jax.vmap(per_t)(m_hats)  # (T, S, H, W, 1)

    p2 = phase2_importance(decode_fn, z_pool, cfg.t_dim,
                           n_features=16, feature_names=names)
    log(f"A5 phase-2 (on-device re-measured) top: {p2['ranking'][:5]}")

    cmp = compare_phases(p1, p2, names)
    log(f"A6 phase rank correlation: {cmp['rank_correlation']:.3f}")

    # --- CVAE variant (C5) + 1-vs-7 Cohen's d (ref analyze_cvae) -----------
    cvae, cvae_state, _ = train_cvae(ds, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
                                     epochs=max(args.epochs // 2, 5),
                                     batch_size=cfg.batch_size)
    cv = {"params": cvae_state.params}
    zs = jax.random.normal(jax.random.PRNGKey(7), (n_z, cfg.z_dim))

    def cvae_decode_fn(t_eye, z):
        def per_t(t_row):
            tb = jnp.broadcast_to(t_row[None], (z.shape[0], t_row.shape[0]))
            return cvae.apply(cv, z, tb, method=cvae.decode)

        return jax.vmap(per_t)(t_eye)

    p2c = phase2_importance(cvae_decode_fn, zs, cfg.t_dim,
                            n_features=16, feature_names=names)
    d17 = pairwise_cohens_d(np.asarray(p2c["features"][1]),
                            np.asarray(p2c["features"][7]), names)
    log(f"A5/CVAE top: {p2c['ranking'][:5]}; 1-vs-7 Cohen's d top: {d17['ranking'][:3]}")

    # --- I7 mediation for the reference's digit pairs ----------------------
    med = {}
    for (a, b) in ((1, 7), (1, 8)):
        ia = np.nonzero(ds.labels == a)[0][:40]
        ib = np.nonzero(ds.labels == b)[0][:40]
        za = abduct(vae, variables, jnp.asarray(ds.x[ia]), jnp.asarray(ds.m[ia]),
                    jnp.asarray(ds.t[ia]))
        zb = abduct(vae, variables, jnp.asarray(ds.x[ib]), jnp.asarray(ds.m[ib]),
                    jnp.asarray(ds.t[ib]))
        t_eye = jnp.eye(cfg.t_dim, dtype=jnp.float32)
        m_ab = predict_m(vae, variables, t_eye)
        res = mediation_contributions(vae, variables, m_ab[a], m_ab[b], za, zb,
                                      jax.random.PRNGKey(0), n_mc=50)
        fpct = np.asarray(res["feature_contribution_pct"]).mean(axis=0)
        top_f = int(np.argmax(fpct))
        med[f"{a}to{b}"] = {
            "m_pct_mean": float(np.asarray(res["m_contribution_pct"]).mean()),
            "m_pct_std": float(np.asarray(res["m_contribution_pct"]).std()),
            "z_pct_mean": float(np.asarray(res["z_contribution_pct"]).mean()),
            "z_pct_std": float(np.asarray(res["z_contribution_pct"]).std()),
            "top_feature": names[top_f],
            "top_feature_pct": float(fpct[top_f]),
        }
        log(f"I7 {a}->{b}: M {med[f'{a}to{b}']['m_pct_mean']:.1f}%"
            f"±{med[f'{a}to{b}']['m_pct_std']:.1f}, Z "
            f"{med[f'{a}to{b}']['z_pct_mean']:.1f}%"
            f"±{med[f'{a}to{b}']['z_pct_std']:.1f}, top {med[f'{a}to{b}']['top_feature']}")

    return {
        "n_images": args.n, "epochs": args.epochs,
        "phase1_top": p1["ranking"][:5],
        "phase2_top": p2["ranking"][:5],
        "phase2_cvae_top": p2c["ranking"][:5],
        "phase_rank_correlation": cmp["rank_correlation"],
        "cohens_d_1v7_top": d17["ranking"][:5],
        "mediation": med,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--vessel", action="store_true")
    ap.add_argument("--vessel-only", action="store_true")
    ap.add_argument("--vessel-epochs", type=int, default=30)
    ap.add_argument("--phase2", action="store_true",
                    help="measurement-approach + mediation evidence only")
    ap.add_argument("--out", default="results/evidence")
    args = ap.parse_args()

    if args.phase2:
        os.makedirs(args.out, exist_ok=True)
        report = phase2_evidence(args)
        with open(os.path.join(args.out, "evidence_phase2.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report, indent=1), flush=True)
        return

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
