"""End-to-end tests for the analysis pipelines (SURVEY.md §2.5 / §4).

Each of the reference's hand-run PASS/FAIL analysis scripts is a callable
pipeline here; these tests run them on tiny synthetic data and check the
structure and the verdict logic (SURVEY.md §4 prescription)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causalvae_tpu.models.heads import SimpleClassifier
from causalvae_tpu.models.vae import CausalConvVAE
from tests.conftest import synthetic_digits

NAMES12 = [f"feat{i}" for i in range(12)]


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(0)
    x = synthetic_digits(48, seed=1)[..., None].astype(np.float32)
    m = rng.standard_normal((48, 12)).astype(np.float32)
    labels = rng.integers(0, 4, 48)
    t = np.eye(10, dtype=np.float32)[labels]
    return x, m, t, labels


@pytest.fixture(scope="module")
def tiny_vae(tiny_data):
    x, m, t, _ = tiny_data
    vae = CausalConvVAE(m_dim=12, t_dim=10, z_dim=6)
    key = jax.random.PRNGKey(0)
    variables = vae.init(
        {"params": key}, jnp.asarray(x[:2]), jnp.asarray(m[:2]),
        jnp.asarray(t[:2]), rng=key,
    )
    return vae, variables


@pytest.fixture(scope="module")
def tiny_bayes_vae(tiny_data):
    x, m, t, _ = tiny_data
    vae = CausalConvVAE(m_dim=12, t_dim=10, z_dim=6,
                        gaussian_mechanism=True, decode_real_m=True)
    key = jax.random.PRNGKey(1)
    variables = vae.init(
        {"params": key}, jnp.asarray(x[:2]), jnp.asarray(m[:2]),
        jnp.asarray(t[:2]), rng=key,
    )
    return vae, variables


def test_mechanism_validity_structure(tiny_vae, tiny_data):
    from causalvae_tpu.analysis.mechanism import mechanism_validity

    vae, variables = tiny_vae
    x, m, t, _ = tiny_data
    rep = mechanism_validity(vae, variables, m, t, NAMES12)
    assert set(rep) >= {"r2", "mse", "avg_r2", "verdict"}
    assert rep["verdict"] in ("PASS", "FAIL")
    assert len(rep["r2"]) == 12
    # untrained mechanism on random M cannot pass the R^2 > 0.5 gate
    assert rep["verdict"] == "FAIL"


def test_phase1_importance_ranks_all_features(tiny_vae):
    from causalvae_tpu.analysis.mechanism import phase1_importance

    vae, variables = tiny_vae
    rep = phase1_importance(vae, variables, 10, NAMES12)
    assert sorted(rep["ranking"]) == sorted(NAMES12)
    sens = [rep["sensitivity"][n] for n in rep["ranking"]]
    assert sens == sorted(sens, reverse=True)
    assert rep["predictions"].shape == (10, 12)


def test_phase2_importance_on_device_measurement(tiny_vae):
    from causalvae_tpu.analysis.importance import phase2_importance

    vae, variables = tiny_vae
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 6))

    def decode_fn(t_eye, z_samples):
        def one_t(t1):
            m_hat = vae.apply(variables, t1[None], method=vae.predict_m)
            mm = jnp.broadcast_to(m_hat, (z_samples.shape[0], m_hat.shape[-1]))
            return vae.apply(variables, mm, z_samples, method=vae.decode)

        return jax.vmap(one_t)(t_eye)

    rep = phase2_importance(decode_fn, z, 10, n_features=12,
                            feature_names=NAMES12)
    assert rep["features"].shape == (10, 4, 12)
    assert len(rep["ranking"]) == 12
    assert np.all(np.isfinite(rep["features"]))


def test_residual_leakage_pipeline(tiny_vae, tiny_data):
    from causalvae_tpu.analysis.residual import residual_leakage_analysis

    vae, variables = tiny_vae
    x, m, t, labels = tiny_data
    rep = residual_leakage_analysis(vae, variables, x, m, t, labels,
                                    epochs=2, batch_size=24)
    assert rep["verdict"] in ("PASS", "WARN", "FAIL")
    assert 0.0 <= rep["accuracy"] <= 1.0
    assert rep["residuals"].shape == x.shape


def test_conditional_independence_pipeline(tiny_data):
    from causalvae_tpu.analysis.independence import conditional_independence_test

    x, m, t, _ = tiny_data
    rep = conditional_independence_test(x, m, t, epochs=2, batch_size=24)
    assert rep["mse_m_only"] > 0 and rep["mse_m_and_t"] > 0
    assert isinstance(rep["independence_rejected"], bool)


def test_per_fold_validation_r2(tiny_bayes_vae, tiny_data):
    from causalvae_tpu.analysis.kfold_eval import per_fold_validation_r2
    from causalvae_tpu.scm.ensemble import stack_fold_variables
    from causalvae_tpu.train.kfold import stratified_kfold

    vae, variables = tiny_bayes_vae
    x, m, t, labels = tiny_data
    plan = stratified_kfold(labels, n_splits=2, seed=42)
    stacked = stack_fold_variables([variables, variables])
    rep = per_fold_validation_r2(vae, stacked, plan, m, t, NAMES12)
    assert rep["per_fold_r2"].shape == (2, 12)
    assert set(rep["aggregate"]) == set(NAMES12)
    agg = rep["aggregate"][NAMES12[0]]
    assert {"r2_mean", "r2_std", "cv", "sigma_mean"} <= set(agg)


def test_ensemble_pairwise_report_and_topk(tiny_bayes_vae):
    from causalvae_tpu.analysis.kfold_eval import (ensemble_pairwise_report,
                                                   top_k_per_pair)
    from causalvae_tpu.scm.ensemble import stack_fold_variables

    vae, variables = tiny_bayes_vae
    stacked = stack_fold_variables([variables, variables])
    groups = [f"g{i}" for i in range(10)]
    rows = ensemble_pairwise_report(vae, stacked, 10, groups, NAMES12)
    assert len(rows) == 10 * 9 * 12
    assert {"treatment_a", "treatment_b", "feature", "diff", "abs_diff"} <= set(rows[0])
    top = top_k_per_pair(rows, k=3)
    assert all(len(v) == 3 for v in top.values())


def test_uncertainty_table(tiny_bayes_vae):
    from causalvae_tpu.analysis.mechanism import uncertainty_table

    vae, variables = tiny_bayes_vae
    rep = uncertainty_table(vae, variables, 10, NAMES12)
    assert len(rep["per_condition"]) == 10
    assert rep["sigma"].shape == (10, 12)
    assert np.all(rep["sigma"] > 0)  # sigma strictly positive
    for row in rep["per_condition"]:
        assert row["most_certain"] in NAMES12
        assert row["least_certain"] in NAMES12
        assert row["sigma_min"] <= row["sigma_max"]


def test_cascade_sensitivity(tiny_vae):
    from causalvae_tpu.analysis.mechanism import cascade_sensitivity

    vae, variables = tiny_vae
    rep = cascade_sensitivity(vae, variables, 10, control_idx=0,
                              feature_names=NAMES12)
    assert rep["delta"].shape == (10, 12)
    assert np.allclose(rep["delta"][0], 0.0)  # control minus itself


def test_latent_viz_suite(tiny_data):
    from causalvae_tpu.analysis.latent_viz import (centroid_outliers,
                                                   disentanglement_score,
                                                   multi_perplexity_tsne,
                                                   pca_embedding,
                                                   tsne_embedding)

    rng = np.random.default_rng(3)
    _, _, _, labels = tiny_data
    z = rng.standard_normal((48, 6)).astype(np.float32)
    emb = tsne_embedding(z, perplexity=5.0)
    assert emb.shape == (48, 2)
    pcs, ratio = pca_embedding(z)
    assert pcs.shape == (48, 2) and ratio.shape == (2,)
    multi = multi_perplexity_tsne(z, perplexities=(5, 10))
    assert set(multi) == {5, 10}
    score = disentanglement_score(z, labels)
    assert 0.0 <= score <= 1.0
    outliers = centroid_outliers(z, labels, top_k=3)
    for c, idx in outliers.items():
        assert np.all(labels[idx] == c)


def test_real_vs_fake_embedding(tiny_data):
    from causalvae_tpu.analysis.latent_viz import real_vs_fake_embedding

    x, _, _, _ = tiny_data
    clf = SimpleClassifier(n_classes=10)
    variables = clf.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    real, fake = real_vs_fake_embedding(clf, variables, x[:8], x[8:16])
    assert real.shape == fake.shape == (8, 50)


def test_plots_smoke(tmp_path, tiny_data):
    from causalvae_tpu.analysis import plots

    x, m, t, labels = tiny_data
    d = str(tmp_path)
    rng = np.random.default_rng(0)

    plots.intervention_grid(x[:3], rng.random((3, 4, 28, 28, 1)),
                            os.path.join(d, "grid.png"))
    plots.sweep_strip(rng.random((5, 28, 28, 1)), np.linspace(-2, 2, 5),
                      os.path.join(d, "sweep.png"), feature_name="area")
    plots.heatmap(rng.random((10, 12)), os.path.join(d, "hm.png"),
                  row_names=[str(i) for i in range(10)], col_names=NAMES12)
    plots.ranked_bar({n: float(v) for n, v in zip(NAMES12, rng.random(12))},
                     os.path.join(d, "bar.png"), title="importance")
    plots.recon_triptych(x[:4], x[:4], os.path.join(d, "recon.png"),
                         uncertainty=rng.random((4, 28, 28, 1)))
    plots.scatter_diag(rng.random(20), rng.random(20),
                       os.path.join(d, "scatter.png"),
                       xlabel="sigma", ylabel="r2")
    plots.embedding_scatter(rng.standard_normal((48, 2)), labels,
                            os.path.join(d, "emb.png"))
    plots.mip_quality_grid(x[:8, ..., 0], [str(l) for l in labels[:8]],
                           os.path.join(d, "mip.png"), per_group=2)
    for f in ("grid", "sweep", "hm", "bar", "recon", "scatter", "emb", "mip"):
        assert os.path.getsize(os.path.join(d, f"{f}.png")) > 0


def test_treatment_plots_smoke(tmp_path):
    from causalvae_tpu.analysis import plots

    rng = np.random.default_rng(1)
    groups = {f"g{i}": rng.standard_normal((6, 12)) + i for i in range(5)}
    groups["outlier"] = rng.standard_normal((6, 12)) + 40.0
    d = str(tmp_path)
    plots.predictions_broken_axis(
        {k: v[:, 0] for k, v in groups.items()},
        os.path.join(d, "broken.png"), feature_name="Area")
    plots.per_feature_prediction_grid(groups, NAMES12,
                                      os.path.join(d, "grid14.png"))
    plots.overlap_distributions(
        {k: v[:, 0] for k, v in groups.items()},
        {k: v[:, 0] + 0.1 for k, v in groups.items()},
        os.path.join(d, "overlap.png"), feature_name="Area")
    for f in ("broken", "grid14", "overlap"):
        assert os.path.getsize(os.path.join(d, f"{f}.png")) > 0
