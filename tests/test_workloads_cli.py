"""Smoke tests for the workload trainers (T1/T5/T6/T7) and the CLI entry
points (SURVEY.md L6) on tiny synthetic corpora."""

import json
import os

import numpy as np
import pytest

from causalvae_tpu.config import MnistConfig
from causalvae_tpu.data.mnist import build_morph_mnist, synthetic_mnist


@pytest.fixture(scope="module")
def mnist_ds():
    images, labels = synthetic_mnist(48, seed=7)
    return build_morph_mnist(images, labels)


def test_train_mnist_one_epoch(mnist_ds, tmp_path):
    from causalvae_tpu.train.workloads import train_mnist

    cfg = MnistConfig(batch_size=24, epochs=1, z_dim=6)
    vae, vae_state, d_state, logger = train_mnist(
        mnist_ds, cfg, run_dir=str(tmp_path))
    rows = logger.history
    assert any("loss" in r for r in rows)
    assert np.isfinite([r["loss"] for r in rows if "loss" in r]).all()
    # checkpoint cadence: latest written after epoch 0
    assert os.path.exists(os.path.join(str(tmp_path), "latest"))


def test_train_cvae_one_epoch(mnist_ds):
    from causalvae_tpu.train.workloads import train_cvae

    model, state, logger = train_cvae(mnist_ds, z_dim=6, epochs=1,
                                      batch_size=24)
    assert any(np.isfinite(r.get("train_loss", np.nan)) for r in logger.history)


@pytest.mark.slow
def test_train_vit_vae_and_extract(mnist_ds):
    from causalvae_tpu.models.vit import ViTVAE
    from causalvae_tpu.train.workloads import extract_vit_latents, train_vit_vae

    rng = np.random.default_rng(0)
    x = rng.random((8, 64, 64, 1)).astype(np.float32)

    def batches_fn(epoch):
        yield {"x": x[:4]}
        yield {"x": x[4:]}

    model = ViTVAE(img_size=(64, 64), latent_dim=16, embed_dim=32,
                   depth=1, heads=2, mlp_dim=32)
    model, state, logger = train_vit_vae(batches_fn, (64, 64), epochs=1,
                                         model=model)
    z = extract_vit_latents(model, state, [{"x": x}])
    assert z.shape == (8, 16)
    assert np.isfinite(z).all()


@pytest.mark.slow
def test_train_cascade_one_epoch():
    from causalvae_tpu.data.cascade import synthetic_cascade_corpus
    from causalvae_tpu.train.workloads import train_cascade

    corpus = synthetic_cascade_corpus(n=8, n_groups=4, seed=0)
    model, state, logger = train_cascade(corpus, img_hw=(64, 128), z_dim=8,
                                         epochs=1, batch_size=4)
    assert any(np.isfinite(r.get("train_loss", np.nan)) for r in logger.history)


def test_cli_kfold_verify(tmp_path, capsys):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n-synthetic", "24",
          "kfold", "--verify", "--folds", "2"])
    rep = json.loads(capsys.readouterr().out)
    assert len(rep) == 2  # one entry per fold


@pytest.mark.slow
def test_cli_counterfactual_do_t(tmp_path):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n-synthetic", "48",
          "counterfactual", "do-t", "--epochs", "1"])
    assert os.path.getsize(os.path.join(str(tmp_path), "do_t_grid.png")) > 0


@pytest.mark.slow
def test_cli_analyze_importance(tmp_path, capsys):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n-synthetic", "48",
          "analyze", "importance", "--epochs", "1", "--print-data"])
    with open(os.path.join(str(tmp_path), "analyze_importance.json")) as f:
        out = json.load(f)
    imp = out["importance"]
    assert len(imp["phase1_ranking"]) == 12
    assert len(imp["phase2_ranking"]) == 12
    assert "rank_correlation" in imp["comparison"]
    # --print-data: raw un-normalized sensitivities (ref print_data.py)
    assert len(imp["raw"]["phase1_sensitivity"]) == 12
    assert "phase1_raw" in capsys.readouterr().out


def test_cli_train_vessel_wires_packed_io(monkeypatch, tmp_path):
    """Production-config wiring (ref vessel_analysis/01_train/main.py:1-8):
    `train vessel --img-hw 768 1280 --packed-io --scan-steps N` must reach
    train_vessel with exactly those settings, and the model built for that
    config must consume/produce the host-packed (H/8, W/8, 64) layout —
    shape-only via jax.eval_shape, no compile."""
    import jax
    import jax.numpy as jnp

    from causalvae_tpu.cli.main import main
    from causalvae_tpu.train import workloads as W

    seen = {}

    def fake_train_vessel(corpus, cfg, **kw):
        seen.update(kw)

    monkeypatch.setattr(W, "train_vessel", fake_train_vessel)
    main(["--out", str(tmp_path), "--n-synthetic", "8", "train", "vessel",
          "--img-hw", "768", "1280", "--packed-io", "--scan-steps", "4",
          "--epochs", "1"])
    assert seen["img_hw"] == (768, 1280)
    assert seen["packed_io"] is True
    assert seen["scan_steps"] == 4

    from causalvae_tpu.models.vit import CausalViTVAE

    model = CausalViTVAE(img_size=(768, 1280), m_dim=12, t_dim=19, z_dim=128,
                         packed_io=True)
    key = jax.random.PRNGKey(0)
    x = jax.ShapeDtypeStruct((2, 96, 160, 64), jnp.float32)
    m = jax.ShapeDtypeStruct((2, 12), jnp.float32)
    t = jax.ShapeDtypeStruct((2, 19), jnp.float32)
    variables = jax.eval_shape(
        lambda a, b, c: model.init({"params": key, "dropout": key}, a, b, c,
                                   rng=key, train=True), x, m, t)
    out = jax.eval_shape(
        lambda v, a, b, c: model.apply(v, a, b, c, rng=key, train=False),
        variables, x, m, t)
    assert out.recon_x.shape == (2, 96, 160, 64)


@pytest.mark.slow
def test_cli_counterfactual_recon(tmp_path):
    """recon triptych CLI hook (ref mnist_test/02_mechanism_analysis/
    visualize_phase1_recon.py:13-76)."""
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n-synthetic", "48",
          "counterfactual", "recon", "--epochs", "1"])
    assert os.path.getsize(os.path.join(str(tmp_path), "recon_triptych.png")) > 0


@pytest.mark.slow
def test_train_vessel_bf16_compute():
    """compute_dtype='bfloat16' trains with f32 params and finite losses."""
    import jax
    import jax.numpy as jnp

    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import synthetic_corpus
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.train.workloads import train_vessel

    corpus = synthetic_corpus(n=12, hw=(64, 96), seed=0)
    cfg = VesselConfig(batch_size=4, epochs=1, z_dim=8,
                       compute_dtype="bfloat16")
    # small backbone to keep the CPU compile fast; train_vessel builds its
    # default model with dtype=jnp.dtype(cfg.compute_dtype) the same way
    model = CausalViTVAE(img_size=(64, 96), m_dim=12, t_dim=corpus.t_dim,
                         z_dim=8, embed_dim=32, depth=1, heads=2, mlp_dim=64,
                         vit_latent_dim=32,
                         dtype=jnp.dtype(cfg.compute_dtype))
    model, state, logger = train_vessel(corpus, cfg, model=model,
                                        img_hw=(64, 96))
    losses = [r["train_loss"] for r in logger.history if "train_loss" in r]
    assert losses and np.isfinite(losses).all()
    # params stay f32 under bf16 compute (flax param_dtype default)
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_cli_translate_pipeline(tmp_path):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n-synthetic", "12",
          "translate", "--epochs", "1", "--batch-size", "4"])
    path = os.path.join(str(tmp_path), "trackA_ranking.csv")
    with open(path) as f:
        header = f.readline().strip().split(",")
    assert header == ["feature", "r2", "corr"]


@pytest.mark.slow
def test_cli_cascade_pipeline(tmp_path):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "cascade", "--epochs", "1"])
    path = os.path.join(str(tmp_path), "sensitivity_ranking.csv")
    with open(path) as f:
        header = f.readline().strip().split(",")
    assert header == ["feature", "importance"]


@pytest.mark.slow
def test_cli_vessel_report_pipeline(tmp_path):
    """The §3.4 artifact chain: all six CSV contracts produced."""
    from causalvae_tpu.cli.main import main

    # batch must divide across the mesh data axis (8 devices / 2 folds -> 4)
    main(["--out", str(tmp_path), "--n-synthetic", "16",
          "vessel-report", "--epochs", "1", "--folds", "2",
          "--batch-size", "4"])
    for f in ("predictions_by_treatment", "uncertainty_by_treatment",
              "feature_stats", "pairwise_snr", "all_pairwise_report",
              "pairwise_report_formatted", "significant_changes"):
        path = os.path.join(str(tmp_path), f"{f}.csv")
        assert os.path.getsize(path) > 0, f


@pytest.mark.slow
def test_train_vessel_recon_artifact(tmp_path):
    """T3 cadence: a sample-recon PNG lands in run_dir every `period` epochs
    (ref vessel train.py:186-200 sample plots every 50)."""
    import jax.numpy as jnp

    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import synthetic_corpus
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.train import workloads as W

    corpus = synthetic_corpus(n=10, hw=(64, 96), seed=0)
    cfg = VesselConfig(batch_size=4, epochs=1, z_dim=8)
    model = CausalViTVAE(img_size=(64, 96), m_dim=12, t_dim=corpus.t_dim,
                         z_dim=8, embed_dim=32, depth=1, heads=2, mlp_dim=64,
                         vit_latent_dim=32)
    model, state, logger = W.train_vessel(corpus, cfg, model=model,
                                          img_hw=(64, 96), period=1,
                                          run_dir=str(tmp_path))
    assert os.path.exists(os.path.join(str(tmp_path), "latest"))
    assert os.path.getsize(os.path.join(str(tmp_path), "recon_epoch_1.png")) > 0


@pytest.mark.slow
def test_train_vessel_scan_steps(tmp_path):
    """scan_steps > 0 routes the vessel epoch through the device-resident
    scanned loop (one dispatch per scan_steps optimizer steps) and still
    trains: loss finite and decreasing across epochs."""
    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import synthetic_corpus
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.train import workloads as W

    corpus = synthetic_corpus(n=16, hw=(64, 96), seed=0)
    cfg = VesselConfig(batch_size=4, epochs=3, z_dim=8)
    model = CausalViTVAE(img_size=(64, 96), m_dim=12, t_dim=corpus.t_dim,
                         z_dim=8, embed_dim=32, depth=1, heads=2, mlp_dim=64,
                         vit_latent_dim=32)
    model, state, logger = W.train_vessel(corpus, cfg, model=model,
                                          img_hw=(64, 96), scan_steps=2)
    losses = [r["train_loss"] for r in logger.history if "train_loss" in r]
    assert len(losses) == 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_train_vessel_packed_io_matches_unpacked():
    """packed_io trains on host-packed images; the losses are pixel-
    permutation-invariant, so the loss trajectory must match the unpacked
    run closely (same seeds/batches; small float drift from reordered
    summations only)."""
    from causalvae_tpu.config import VesselConfig
    from causalvae_tpu.data.vessel import synthetic_corpus
    from causalvae_tpu.models.vit import CausalViTVAE
    from causalvae_tpu.train import workloads as W

    def run(packed_io):
        corpus = synthetic_corpus(n=16, hw=(64, 96), seed=0)
        cfg = VesselConfig(batch_size=4, epochs=2, z_dim=8)
        model = CausalViTVAE(img_size=(64, 96), m_dim=12, t_dim=corpus.t_dim,
                             z_dim=8, embed_dim=32, depth=1, heads=2,
                             mlp_dim=64, vit_latent_dim=32,
                             packed_io=packed_io)
        _, _, logger = W.train_vessel(corpus, cfg, model=model,
                                      img_hw=(64, 96), packed_io=packed_io)
        return [r["train_loss"] for r in logger.history if "train_loss" in r]

    lp, lu = run(True), run(False)
    assert len(lp) == len(lu) == 2
    np.testing.assert_allclose(lp, lu, rtol=1e-4)


@pytest.mark.slow
def test_cli_analyze_mediation(tmp_path):
    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path), "--n", "256", "analyze", "mediation",
          "--epochs", "1", "--pair", "1", "8"])
    rep = json.load(open(os.path.join(str(tmp_path), "analyze_mediation.json")))
    med = rep["mediation"]
    assert med["pair"] == [1, 8]
    assert np.isfinite(med["m_pct_mean"]) and np.isfinite(med["z_pct_mean"])
    assert len(med["feature_pct"]) == 12
