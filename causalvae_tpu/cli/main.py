"""One argparse CLI covering the reference's entry points.

The reference scatters ``if __name__ == '__main__'`` scripts over 7 packages
with sys.path hacks (SURVEY.md L6); here one console tool exposes the same
workflows:

    causalvae train   {mnist,mnist-bayes,vessel,cvae,vit,cascade}
    causalvae kfold   [--verify] [--epochs N] [--folds K]
    causalvae analyze {mechanism,residual,importance,gradcam,independence,
                       uncertainty,causal,all}
    causalvae counterfactual {do-t,do-m,z-permute}
    causalvae translate / cascade / vessel-report

With no --data/--csv arguments, deterministic synthetic corpora stand in so
every workflow runs end-to-end in this environment (no MNIST download, no
tiff corpus). Artifacts (CSV/PNG) land under --out (default ./results).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _mnist_dataset(args, n_features: int = 12):
    from causalvae_tpu.data.mnist import build_morph_mnist, load_mnist_dir, synthetic_mnist

    if getattr(args, "data", None):
        images, labels = load_mnist_dir(args.data, train=True)
    else:
        images, labels = synthetic_mnist(args.n_synthetic, seed=42)
    cache = os.path.join(args.out, f"morph_cache_{n_features}.npz")
    return build_morph_mnist(images, labels, n_features=n_features, cache_path=cache)


def _vessel_corpus(args):
    from causalvae_tpu.data import vessel

    if getattr(args, "csv", None) and getattr(args, "data", None):
        return vessel.scan_corpus(args.csv, args.data)
    return vessel.synthetic_corpus(n=args.n_synthetic, hw=(96, 160), seed=0)


def cmd_train(args):
    from causalvae_tpu.train import workloads as W

    run_dir = os.path.join(args.out, f"train_{args.workload}")
    if args.workload in ("mnist", "mnist-bayes"):
        ds = _mnist_dataset(args)
        from causalvae_tpu.config import MnistConfig

        cfg = MnistConfig(epochs=args.epochs or MnistConfig.epochs,
                          batch_size=args.batch_size or MnistConfig.batch_size)
        W.train_mnist(ds, cfg, bayesian=args.workload.endswith("bayes"),
                      run_dir=run_dir, resume=args.resume)
    elif args.workload == "vessel":
        corpus = _vessel_corpus(args)
        from causalvae_tpu.config import VesselConfig

        cfg = VesselConfig(epochs=args.epochs or 150,
                           batch_size=args.batch_size or 8,
                           compute_dtype=getattr(args, "dtype", None) or "float32")
        if getattr(args, "img_hw", None):
            hw = tuple(args.img_hw)
        elif corpus.raw_images is not None:
            hw = (96, 160)
        else:
            hw = (cfg.img_height, cfg.img_width)
        W.train_vessel(corpus, cfg, img_hw=hw, run_dir=run_dir, resume=args.resume,
                       packed_io=getattr(args, "packed_io", False),
                       scan_steps=getattr(args, "scan_steps", 0) or 0)
    elif args.workload == "cvae":
        ds = _mnist_dataset(args)
        W.train_cvae(ds, epochs=args.epochs or 30, run_dir=run_dir)
    elif args.workload == "vit":
        corpus = _vessel_corpus(args)
        from causalvae_tpu.data.vessel import iterate_batches

        hw = (96, 160)
        W.train_vit_vae(
            lambda e: iterate_batches(corpus, "all", args.batch_size or 4, hw,
                                      shuffle_seed=e, augment=False),
            hw, latent_dim=128, epochs=args.epochs or 20, run_dir=run_dir,
        )
    elif args.workload == "cascade":
        from causalvae_tpu.data.cascade import scan_cascade_corpus, synthetic_cascade_corpus

        corpus = (scan_cascade_corpus(args.csv, [args.data])
                  if args.csv and args.data else synthetic_cascade_corpus())
        W.train_cascade(corpus, img_hw=(128, 192), epochs=args.epochs or 20,
                        batch_size=args.batch_size or 4, run_dir=run_dir)
    print(f"[train] artifacts in {run_dir}")


def _kfold_train(args, corpus, n_folds: int):
    """Shared parallel-fold training used by kfold and vessel-report."""
    import jax.numpy as jnp
    import optax

    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import make_preprocess
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.ops import losses as L
    from causalvae_tpu.train import kfold as KF
    from causalvae_tpu.train.loop import make_vae_eval_step, make_vae_step

    cfg = VesselConfig()
    if getattr(args, "img_hw", None):
        hw = tuple(args.img_hw)
    elif corpus.raw_images is not None:
        hw = (96, 160)
    else:
        hw = (cfg.img_height, cfg.img_width)

    # device-resident preprocessed corpus (no augmentation inside k-fold - the
    # reference's k-fold trainer also trains on mode='all' unaugmented data)
    if corpus.raw_images is not None:
        raw = corpus.raw_images
    else:  # file-backed corpus: decode from disk once
        from causalvae_tpu.data.vessel import load_raw

        raw = np.stack([load_raw(p) for p in corpus.paths])
    pre = make_preprocess(hw)
    x = np.asarray(pre(jnp.asarray(raw), jnp.zeros(len(corpus.t_idx), np.int32)))
    data = {"x": x, "m": corpus.m, "t": corpus.one_hot_t(np.arange(len(corpus.t_idx)))}

    model = CausalViTVAE(img_size=hw, m_dim=corpus.m.shape[1],
                         t_dim=corpus.t_dim, z_dim=32,
                         embed_dim=64, depth=2, heads=4, mlp_dim=128,
                         vit_latent_dim=64)

    def loss_fn(out, batch):
        return L.vessel_loss(out, batch["x"], batch["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity,
                             w=batch.get("w"))

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    eval_step = make_vae_eval_step(model, loss_fn, has_batch_stats=True)

    b0x = jnp.asarray(x[:2])
    def init_one(k):
        return model.init({"params": k, "dropout": k}, b0x,
                          jnp.asarray(corpus.m[:2]),
                          jnp.asarray(data["t"][:2]), rng=k, train=True)

    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    states, plan, history = KF.train_kfold(
        init_one=init_one, step_fn=step, eval_fn=eval_step, tx=tx,
        data=data, labels=corpus.t_idx, epochs=args.epochs or 5,
        batch_size=args.batch_size or 4, n_folds=n_folds,
        checkpoint_dir=os.path.join(args.out, "kfold"), log_every=1,
    )
    return model, states, plan, data, history


def cmd_kfold(args):
    from causalvae_tpu.train import kfold as KF

    corpus = _vessel_corpus(args)
    if args.verify:
        plan = KF.stratified_kfold(corpus.t_idx, args.folds, seed=42)
        print(json.dumps(KF.verify_stratification(plan, corpus.group_names), indent=1))
        return
    model, states, plan, data, history = _kfold_train(args, corpus, args.folds)
    print(f"[kfold] {args.folds} folds trained in parallel; "
          f"final val losses: {history[-1]['val']['loss'] if history[-1]['val'] else 'n/a'}")


def cmd_vessel_report(args):
    """The vessel uncertainty -> SNR artifact chain (SURVEY.md §3.4): k-fold
    ensemble training, then every CSV contract of the reference's chained
    scripts — predictions_by_treatment, uncertainty_by_treatment,
    feature_stats, pairwise_snr, all_pairwise_report (+ formatted top-k),
    significant_changes."""
    import jax

    from causalvae_tpu.analysis.kfold_eval import (ensemble_pairwise_report,
                                                   top_k_per_pair)
    from causalvae_tpu.analysis.vessel_report import (
        predictions_by_treatment, uncertainty_by_treatment_rows)
    from causalvae_tpu.scm.uncertainty import (ensemble_sigma_by_treatment,
                                               pairwise_snr,
                                               significant_changes)
    from causalvae_tpu.utils.metrics import write_csv

    corpus = _vessel_corpus(args)
    model, states, plan, data, _ = _kfold_train(args, corpus, args.folds)
    stacked = {"params": states.params}
    if states.batch_stats is not None:
        stacked["batch_stats"] = states.batch_stats
    names = [f"feat{i}" for i in range(corpus.m.shape[1])]
    groups = list(corpus.group_names)
    os.makedirs(args.out, exist_ok=True)

    # stage 1: per-treatment predictions (fold-0 model, like the reference)
    fold0 = jax.tree.map(lambda a: a[0], stacked)
    pred = predictions_by_treatment(
        model, fold0, data["x"], data["m"], data["t"], corpus.t_idx,
        groups, names)
    write_csv(os.path.join(args.out, "predictions_by_treatment.csv"), pred["rows"])

    # stage 2: ensemble aleatoric sigma per treatment
    write_csv(os.path.join(args.out, "uncertainty_by_treatment.csv"),
              uncertainty_by_treatment_rows(model, stacked, groups, names))

    # stage 3: stats + SNR in real units via the corpus scaler
    mu, sigma = ensemble_sigma_by_treatment(model, stacked, corpus.t_dim)
    mu, sigma = np.asarray(mu), np.asarray(sigma)
    mu_real = mu * corpus.scaler_scale + corpus.scaler_mean
    write_csv(
        os.path.join(args.out, "feature_stats.csv"),
        [{"treatment": groups[g], "feature": names[f],
          "mean_real": float(mu_real[g, f]),
          "sigma_real": float(sigma[g, f] * corpus.scaler_scale[f])}
         for g in range(len(groups)) for f in range(len(names))],
    )
    snr = np.asarray(pairwise_snr(mu, sigma, scale=corpus.scaler_scale))
    write_csv(
        os.path.join(args.out, "pairwise_snr.csv"),
        [{"treatment_a": groups[i], "treatment_b": groups[j],
          "feature": names[f], "snr": float(snr[i, j, f])}
         for i in range(len(groups)) for j in range(len(groups)) if i != j
         for f in range(len(names))],
    )

    # stage 4: ensemble pairwise M-hat differences + formatted top-k
    rows = ensemble_pairwise_report(model, stacked, corpus.t_dim, groups, names)
    write_csv(os.path.join(args.out, "all_pairwise_report.csv"), rows)
    top = top_k_per_pair(rows, k=3)
    write_csv(
        os.path.join(args.out, "pairwise_report_formatted.csv"),
        [{"treatment_a": a, "treatment_b": b, "rank": r + 1, **{
            "feature": row["feature"], "diff": row["diff"]}}
         for (a, b), rs in top.items() for r, row in enumerate(rs)],
    )

    # stage 5: top significant changes
    write_csv(os.path.join(args.out, "significant_changes.csv"),
              significant_changes(snr, mu_real, groups, names, top_k=10))
    print(f"[vessel-report] 6 CSV artifacts in {args.out}")


def cmd_analyze(args):
    """Analysis battery over a freshly (briefly) trained MNIST model, or a
    checkpointed one — mirrors the reference's analyze scripts end-to-end."""
    import jax.numpy as jnp

    from causalvae_tpu.config import FEATURE_NAMES_12, MnistConfig
    from causalvae_tpu.train import workloads as W

    ds = _mnist_dataset(args)
    cfg = MnistConfig(epochs=args.epochs or 3)
    vae, vae_state, d_state, _ = W.train_mnist(
        ds, cfg, bayesian=getattr(args, "bayesian", False), run_dir=None)
    variables = {"params": vae_state.params}
    names = list(FEATURE_NAMES_12)
    out = {}

    if args.what in ("mechanism", "all"):
        from causalvae_tpu.analysis.mechanism import mechanism_validity, phase1_importance

        out["mechanism"] = mechanism_validity(vae, variables, ds.m, ds.t, names)
        out["phase1"] = {k: v for k, v in phase1_importance(vae, variables, 10, names).items()
                         if k != "predictions"}
    if args.what in ("importance", "all"):
        import jax

        from causalvae_tpu.analysis.importance import compare_phases, phase2_importance
        from causalvae_tpu.analysis.mechanism import phase1_importance

        z = jax.random.normal(jax.random.PRNGKey(999), (32, cfg.z_dim))

        def decode_fn(t_eye, z_samples):
            def one_t(t1):
                m_hat = vae.apply(variables, t1[None], method=vae.predict_m)
                mm = jnp.broadcast_to(m_hat, (z_samples.shape[0], m_hat.shape[-1]))
                return vae.apply(variables, mm, z_samples, method=vae.decode)

            return jax.vmap(one_t)(t_eye)

        p1 = phase1_importance(vae, variables, 10, names)
        p2 = phase2_importance(decode_fn, z, 10, n_features=12, feature_names=names)
        out["importance"] = {
            "phase1_ranking": p1["ranking"],
            "phase2_ranking": p2["ranking"],
            "comparison": compare_phases(p1, p2, names),
        }
        if getattr(args, "print_data", False):
            # raw un-normalized sensitivities side by side (ref mnist_test/
            # 04_phase_comparison/print_data.py raw-ranking dump)
            out["importance"]["raw"] = {
                "phase1_sensitivity": p1["sensitivity"],
                "phase2_sensitivity": p2["sensitivity"],
            }
            print(f"{'feature':<14s} {'phase1_raw':>12s} {'phase2_raw':>12s}")
            for n in names:
                print(f"{n:<14s} {p1['sensitivity'][n]:>12.6f} "
                      f"{p2['sensitivity'][n]:>12.6f}")
    if args.what in ("residual", "all"):
        from causalvae_tpu.analysis.residual import residual_leakage_analysis

        r = residual_leakage_analysis(vae, variables, ds.x, ds.m, ds.t, ds.labels,
                                      epochs=3)
        out["residual"] = {"accuracy": r["accuracy"], "verdict": r["verdict"]}
    if args.what in ("gradcam", "all"):
        from causalvae_tpu.analysis.gradcam import per_class_mean_cam
        from causalvae_tpu.analysis.residual import (compute_residuals,
                                                     train_classifier_on)

        # Grad-CAM over the residual classifier (A3): where does T-information
        # leak into X - X_hat per digit
        import jax

        res = np.asarray(compute_residuals(
            vae, variables, jnp.asarray(ds.x[:256]), jnp.asarray(ds.m[:256]),
            jnp.asarray(ds.t[:256]), jax.random.PRNGKey(0)))
        clf, clf_vars, _ = train_classifier_on(res, ds.labels[:256], epochs=3)
        cams = per_class_mean_cam(clf, clf_vars, res, ds.labels[:256])
        os.makedirs(args.out, exist_ok=True)
        from causalvae_tpu.analysis.plots import mip_quality_grid

        mip_quality_grid(cams, [str(c) for c in range(10)],
                         os.path.join(args.out, "gradcam_per_class.png"),
                         per_group=1)
        out["gradcam"] = {"per_class_cam_shape": list(cams.shape),
                          "artifact": "gradcam_per_class.png"}
    if args.what in ("independence", "all"):
        from causalvae_tpu.analysis.independence import conditional_independence_test

        out["independence"] = conditional_independence_test(
            ds.x, ds.m, ds.t, epochs=5)
    if args.what in ("uncertainty", "all"):
        from causalvae_tpu.analysis.mechanism import uncertainty_table

        if vae.gaussian_mechanism:
            u = uncertainty_table(vae, variables, 10, names)
            out["uncertainty"] = u["per_condition"]
        else:
            out["uncertainty"] = "deterministic mechanism (train mnist-bayes for sigma)"
    if args.what in ("causal", "all"):
        from causalvae_tpu.analysis.causal_checks import causal_validation_report

        by_cond = {c: ds.m[ds.labels == c] for c in range(10)}
        a, b = args.pair
        out["causal"] = causal_validation_report(by_cond, a, b, names)
    if args.what in ("mediation", "all"):
        # I7: MC mediation decomposition for the digit pair (ref mnist_test/
        # 05_feature_analysis/analyze_mediation.py:120-201)
        import jax

        from causalvae_tpu.scm.intervene import (abduct, mediation_contributions,
                                                 predict_m)

        a, b = args.pair
        ia = np.nonzero(ds.labels == a)[0][:40]
        ib = np.nonzero(ds.labels == b)[0][:40]
        za = abduct(vae, variables, jnp.asarray(ds.x[ia]), jnp.asarray(ds.m[ia]),
                    jnp.asarray(ds.t[ia]))
        zb = abduct(vae, variables, jnp.asarray(ds.x[ib]), jnp.asarray(ds.m[ib]),
                    jnp.asarray(ds.t[ib]))
        m_ab = predict_m(vae, variables, jnp.eye(cfg.t_dim, dtype=jnp.float32))
        res = mediation_contributions(vae, variables, m_ab[a], m_ab[b], za, zb,
                                      jax.random.PRNGKey(0), n_mc=50)
        fpct = np.asarray(res["feature_contribution_pct"]).mean(axis=0)
        out["mediation"] = {
            "pair": [a, b],
            "m_pct_mean": float(np.asarray(res["m_contribution_pct"]).mean()),
            "m_pct_std": float(np.asarray(res["m_contribution_pct"]).std()),
            "z_pct_mean": float(np.asarray(res["z_contribution_pct"]).mean()),
            "z_pct_std": float(np.asarray(res["z_contribution_pct"]).std()),
            "feature_pct": {n: float(v) for n, v in zip(names, fpct)},
        }
    print(json.dumps(out, indent=1, default=str))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"analyze_{args.what}.json"), "w") as f:
        json.dump(out, f, indent=1, default=str)


def cmd_counterfactual(args):
    import jax
    import jax.numpy as jnp

    from causalvae_tpu.analysis import plots
    from causalvae_tpu.config import MnistConfig
    from causalvae_tpu.scm import intervene as I
    from causalvae_tpu.train import workloads as W

    ds = _mnist_dataset(args)
    cfg = MnistConfig(epochs=args.epochs or 3)
    vae, vae_state, _, _ = W.train_mnist(ds, cfg, run_dir=None)
    variables = {"params": vae_state.params}
    x, m, t = jnp.asarray(ds.x[:6]), jnp.asarray(ds.m[:6]), jnp.asarray(ds.t[:6])
    os.makedirs(args.out, exist_ok=True)

    if args.mode == "do-t":
        grid = I.do_t_grid(vae, variables, x, m, t, jnp.eye(10, dtype=jnp.float32))
        plots.intervention_grid(ds.x[:6], grid,
                                os.path.join(args.out, "do_t_grid.png"))
        print(f"[counterfactual] grid {grid.shape} -> do_t_grid.png")
    elif args.mode == "do-m":
        sweep = jnp.linspace(-2.0, 2.0, 5)
        out = I.do_m_sweep(vae, variables, x[:1], m[:1], t[:1],
                           jnp.arange(m.shape[1]), sweep)
        for f in range(out.shape[1]):
            plots.sweep_strip(np.asarray(out[0, f]), np.asarray(sweep),
                              os.path.join(args.out, f"do_m_f{f}.png"),
                              feature_name=str(f))
        print(f"[counterfactual] sweeps {out.shape} -> do_m_f*.png")
    elif args.mode == "z-permute":
        perm = jnp.asarray(np.roll(np.arange(6), 1))
        out = I.z_permute_decode(vae, variables, x, m, t, perm)
        plots.recon_triptych(ds.x[:4], np.asarray(out[:4]),
                             os.path.join(args.out, "z_permute.png"))
        print(f"[counterfactual] z-permute {out.shape} -> z_permute.png")
    elif args.mode == "recon":
        # reconstruction triptych (ref mnist_test/02_mechanism_analysis/
        # visualize_phase1_recon.py:13-76): original | recon | |residual|
        out = vae.apply(variables, x[:4], m[:4], t[:4],
                        rng=jax.random.PRNGKey(0))
        recon = np.asarray(out.recon_x)
        plots.recon_triptych(ds.x[:4], recon,
                             os.path.join(args.out, "recon_triptych.png"),
                             uncertainty=np.abs(ds.x[:4] - recon))
        print(f"[counterfactual] recon {recon.shape} -> recon_triptych.png")


def cmd_translate(args):
    """latent_translator pipeline end-to-end (SURVEY.md §3.5): (pre)train a
    ViT-VAE, extract mu latents for every image, Ridge-translate Z -> M with
    LOOCV ranking -> trackA_ranking.csv (the reference's artifact contract)."""
    import jax.numpy as jnp

    from causalvae_tpu.analysis.translate import fit_translator
    from causalvae_tpu.data.vessel import iterate_batches
    from causalvae_tpu.models.vit import ViTVAE
    from causalvae_tpu.train import workloads as W
    from causalvae_tpu.utils.metrics import write_csv

    corpus = _vessel_corpus(args)
    hw = (96, 160) if corpus.raw_images is not None else (384, 640)
    model = ViTVAE(img_size=hw, latent_dim=64, embed_dim=64, depth=2,
                   heads=4, mlp_dim=128, dec_res_stages=4)
    model, state, _ = W.train_vit_vae(
        lambda e: iterate_batches(corpus, "all", args.batch_size or 4, hw,
                                  shuffle_seed=e, augment=False),
        hw, epochs=args.epochs or 10, model=model,
        run_dir=os.path.join(args.out, "train_vit"),
    )
    # collect M from the same batches as the latents so the Z<->M pairing is
    # correct regardless of loader batch order
    ms = []

    def batches():
        for b in iterate_batches(corpus, "all", args.batch_size or 4, hw,
                                 augment=False, drop_remainder=False):
            ms.append(np.asarray(b["m"]))
            yield b

    z = W.extract_vit_latents(model, state, batches())
    m = np.concatenate(ms)
    names = [f"feat{i}" for i in range(corpus.m.shape[1])]
    rep = fit_translator(z, m, names)
    os.makedirs(args.out, exist_ok=True)
    write_csv(
        os.path.join(args.out, "trackA_ranking.csv"),
        [{"feature": n, "r2": rep["r2"][n], "corr": rep["corr"][n]}
         for n in rep["ranking"]],
    )
    print(json.dumps({"ranking": rep["ranking"],
                      "r2": rep["r2"]}, indent=1))
    print(f"[translate] -> {os.path.join(args.out, 'trackA_ranking.csv')}")


def cmd_cascade(args):
    """causal_cascade pipeline end-to-end: train the compact cascade VAE,
    then per-condition sensitivity vs control -> sensitivity_ranking.csv
    (ref causal_cascade/{train,analyze}.py)."""
    from causalvae_tpu.analysis.mechanism import cascade_sensitivity
    from causalvae_tpu.data.cascade import scan_cascade_corpus, synthetic_cascade_corpus
    from causalvae_tpu.train import workloads as W
    from causalvae_tpu.utils.metrics import write_csv

    corpus = (scan_cascade_corpus(args.csv, [args.data])
              if args.csv and args.data else synthetic_cascade_corpus())
    model, state, _ = W.train_cascade(
        corpus, img_hw=(128, 192), epochs=args.epochs or 10,
        batch_size=args.batch_size or 4,
        run_dir=os.path.join(args.out, "train_cascade"),
    )
    names = [f"feat{i}" for i in range(corpus.m.shape[1])]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rep = cascade_sensitivity(model, variables, len(corpus.group_names),
                              control_idx=0, feature_names=names)
    os.makedirs(args.out, exist_ok=True)
    write_csv(
        os.path.join(args.out, "sensitivity_ranking.csv"),
        [{"feature": n, "importance": rep["importance"][n]}
         for n in rep["ranking"]],
    )
    print(json.dumps({"ranking": rep["ranking"]}, indent=1))
    print(f"[cascade] -> {os.path.join(args.out, 'sensitivity_ranking.csv')}")


def _serving_model(args):
    """(model, variables, img_hw) for export/serve: restore a trained
    checkpoint when --ckpt points at a train run dir, else fresh-init params
    (deployment-template / smoke mode, noted on stdout)."""
    import jax
    import jax.numpy as jnp
    import optax

    from causalvae_tpu.train.state import TrainState

    key = jax.random.PRNGKey(0)
    if args.workload in ("mnist", "mnist-bayes"):
        from causalvae_tpu.config import MnistConfig
        from causalvae_tpu.models.heads import LatentDiscriminator
        from causalvae_tpu.models.vae import CausalConvVAE

        cfg = MnistConfig()
        bayes = args.workload.endswith("bayes")
        model = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
                              gaussian_mechanism=bayes, decode_real_m=bayes)
        img_hw = cfg.image_hw
        x = jnp.zeros((1, *img_hw, 1))
        m, t = jnp.zeros((1, cfg.m_dim)), jnp.zeros((1, cfg.t_dim))
        variables = model.init({"params": key}, x, m, t, rng=key)
        if getattr(args, "ckpt", None):
            from causalvae_tpu.train.checkpoints import CheckpointBook

            disc = LatentDiscriminator(t_dim=cfg.t_dim)
            d_vars = disc.init(key, jnp.zeros((1, cfg.z_dim)))
            template = (TrainState.create(variables, optax.adam(cfg.lr)),
                        TrainState.create(d_vars, optax.adam(cfg.lr)))
            vae_state, _ = CheckpointBook(args.ckpt).restore("latest", template)
            variables = vae_state.variables
            print(f"[serve] restored {args.workload} params from {args.ckpt}")
        else:
            print("[serve] no --ckpt: serving fresh-initialized parameters "
                  "(smoke/template mode)")
        return model, variables, img_hw

    # vessel: serve the checkpoint through the spatial (unpacked-IO) model —
    # parameters are identical between packed/unpacked execution
    # (models/vit.py phase packing is an execution transform, not a
    # parameterization), so train --packed-io checkpoints serve raw images.
    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.models.vit import CausalViTVAE

    cfg = VesselConfig()
    img_hw = tuple(args.img_hw) if getattr(args, "img_hw", None) else (
        cfg.img_height, cfg.img_width)
    model = CausalViTVAE(
        img_size=img_hw, m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
        vit_latent_dim=cfg.vit_latent_dim, embed_dim=cfg.vit_embed_dim,
        depth=cfg.vit_depth, heads=cfg.vit_heads, mlp_dim=cfg.vit_mlp_dim,
    )
    x = jnp.zeros((1, *img_hw, 1))
    m, t = jnp.zeros((1, cfg.m_dim)), jnp.zeros((1, cfg.t_dim))
    variables = model.init({"params": key, "dropout": key}, x, m, t,
                           rng=key, train=False)
    if getattr(args, "ckpt", None):
        from causalvae_tpu.train.checkpoints import CheckpointBook

        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                         optax.adam(cfg.lr))
        state = CheckpointBook(args.ckpt).restore(
            "latest", TrainState.create(variables, tx))
        variables = state.variables
        print(f"[serve] restored vessel params from {args.ckpt}")
    else:
        print("[serve] no --ckpt: serving fresh-initialized parameters "
              "(smoke/template mode)")
    return model, variables, img_hw


def cmd_export(args):
    """AOT deployment export: endpoints -> StableHLO artifacts + manifest
    (serve/export.py). The exported directory serves without model code."""
    from causalvae_tpu.serve import endpoints as EP
    from causalvae_tpu.serve import export as EX

    model, variables, img_hw = _serving_model(args)
    eps = EP.vae_endpoints(model, variables)
    specs = EP.endpoint_arg_specs(model, img_hw=img_hw)
    out = os.path.join(args.out, f"export_{args.workload}")
    manifest = EX.export_endpoints(
        eps, specs, out, buckets=tuple(args.buckets),
        metadata={"workload": args.workload, "img_hw": list(img_hw)},
    )
    sizes = {
        name: sum(os.path.getsize(os.path.join(out, f))
                  for f in info["files"].values())
        for name, info in manifest["endpoints"].items()
    }
    print(json.dumps({
        "export_dir": out,
        "platform": manifest["platform"],
        "endpoints": {n: {"buckets": manifest["buckets"],
                          "bytes": sizes[n]} for n in sorted(sizes)},
    }, indent=1))


def cmd_serve(args):
    """HTTP serving: dynamic-batching engine behind /v1/<endpoint> (.npz
    bodies). --export-dir serves AOT artifacts (no tracing at startup);
    otherwise endpoints jit-compile lazily per bucket. --smoke brings the
    server up on an ephemeral port, round-trips one request, and exits."""
    import numpy as np  # noqa: F811 (CLI-local)

    from causalvae_tpu.serve import http as H
    from causalvae_tpu.serve.engine import BatchingEngine

    if getattr(args, "export_dir", None):
        from causalvae_tpu.serve.export import load_exported

        bundle = load_exported(args.export_dir)
        engine = BatchingEngine(bundle.as_endpoints(), jit=False,
                                buckets=tuple(args.buckets))
        t_dim = None
        for name in ("predict_m", "uncertainty"):
            if name in bundle.endpoint_names:
                t_dim = bundle.manifest["endpoints"][name]["arg_shapes"][0][0]
                break
    else:
        from causalvae_tpu.serve.endpoints import vae_endpoints

        model, variables, _ = _serving_model(args)
        engine = BatchingEngine(vae_endpoints(model, variables),
                                buckets=tuple(args.buckets))
        t_dim = int(model.t_dim)

    if args.smoke:
        srv = H.serve(engine, port=0, background=True)
        port = srv.server_address[1]
        try:
            t = np.eye(t_dim or 10, dtype=np.float32)[:3]
            out = H.request_npz("127.0.0.1", port, "predict_m", [t])
            print(json.dumps({
                "smoke": "ok", "port": port,
                "predict_m_shape": list(np.asarray(out[0]).shape),
                "engine_stats": dict(engine.stats),
            }))
        finally:
            srv.shutdown()
            srv.server_close()
            engine.close()
        return
    H.serve(engine, host=args.host, port=args.port)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("causalvae", description=__doc__)
    p.add_argument("--out", default="results")
    p.add_argument("--n-synthetic", type=int, default=1024)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("workload", choices=["mnist", "mnist-bayes", "vessel", "cvae", "vit", "cascade"])
    t.add_argument("--epochs", type=int)
    t.add_argument("--batch-size", type=int)
    t.add_argument("--data"), t.add_argument("--csv")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--img-hw", type=int, nargs=2, metavar=("H", "W"),
                   help="vessel training resolution override "
                        "(default: reference 768x1280 for file-backed corpora)")
    t.add_argument("--packed-io", action="store_true",
                   help="feed the vessel step host-packed images (TPU "
                        "production config; identical training — see "
                        "docs/TPU_DESIGN.md)")
    t.add_argument("--scan-steps", type=int, default=0,
                   help="optimizer steps per dispatch via the scanned "
                        "device-resident loop (0 = eager)")
    t.add_argument("--dtype", choices=["float32", "bfloat16"],
                   help="vessel compute dtype (bfloat16 = TPU production "
                        "config; params stay float32)")
    t.set_defaults(fn=cmd_train)

    k = sub.add_parser("kfold")
    k.add_argument("--epochs", type=int)
    k.add_argument("--folds", type=int, default=5)
    k.add_argument("--batch-size", type=int)
    k.add_argument("--verify", action="store_true")
    k.add_argument("--img-hw", type=int, nargs=2, metavar=("H", "W"),
                   help="training resolution override (default: config)")
    k.add_argument("--data"), k.add_argument("--csv")
    k.set_defaults(fn=cmd_kfold)

    a = sub.add_parser("analyze")
    a.add_argument("what", choices=["mechanism", "residual", "importance",
                                    "gradcam", "independence", "uncertainty",
                                    "causal", "mediation", "all"])
    a.add_argument("--epochs", type=int)
    a.add_argument("--pair", type=int, nargs=2, default=(1, 8))
    a.add_argument("--bayesian", action="store_true",
                   help="train the Gaussian-mechanism variant (enables the "
                        "uncertainty table)")
    a.add_argument("--print-data", action="store_true",
                   help="dump the raw un-normalized phase-1/phase-2 "
                        "sensitivities (ref print_data.py)")
    a.add_argument("--data")
    a.set_defaults(fn=cmd_analyze)

    c = sub.add_parser("counterfactual")
    c.add_argument("mode", choices=["do-t", "do-m", "z-permute", "recon"])
    c.add_argument("--epochs", type=int)
    c.add_argument("--data")
    c.set_defaults(fn=cmd_counterfactual)

    tr = sub.add_parser("translate")
    tr.add_argument("--epochs", type=int)
    tr.add_argument("--batch-size", type=int)
    tr.add_argument("--data"), tr.add_argument("--csv")
    tr.set_defaults(fn=cmd_translate)

    ca = sub.add_parser("cascade")
    ca.add_argument("--epochs", type=int)
    ca.add_argument("--batch-size", type=int)
    ca.add_argument("--data"), ca.add_argument("--csv")
    ca.set_defaults(fn=cmd_cascade)

    vr = sub.add_parser("vessel-report")
    vr.add_argument("--epochs", type=int)
    vr.add_argument("--folds", type=int, default=5)
    vr.add_argument("--batch-size", type=int)
    vr.add_argument("--img-hw", type=int, nargs=2, metavar=("H", "W"))
    vr.add_argument("--data"), vr.add_argument("--csv")
    vr.set_defaults(fn=cmd_vessel_report)

    ex = sub.add_parser("export", help="AOT-export serving endpoints "
                        "(StableHLO artifacts + manifest)")
    ex.add_argument("workload", choices=["mnist", "mnist-bayes", "vessel"])
    ex.add_argument("--ckpt", help="train run dir to restore (latest)")
    ex.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32],
                    help="static batch-size ladder to compile")
    ex.add_argument("--img-hw", type=int, nargs=2, metavar=("H", "W"))
    ex.set_defaults(fn=cmd_export)

    sv = sub.add_parser("serve", help="HTTP inference serving "
                        "(dynamic-batching engine, .npz protocol)")
    sv.add_argument("workload", nargs="?", default="mnist",
                    choices=["mnist", "mnist-bayes", "vessel"])
    sv.add_argument("--ckpt", help="train run dir to restore (latest)")
    sv.add_argument("--export-dir", help="serve AOT artifacts from `export` "
                    "instead of live endpoints")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8900)
    sv.add_argument("--buckets", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32])
    sv.add_argument("--img-hw", type=int, nargs=2, metavar=("H", "W"))
    sv.add_argument("--smoke", action="store_true",
                    help="start on an ephemeral port, round-trip one "
                    "request, exit")
    sv.set_defaults(fn=cmd_serve)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
