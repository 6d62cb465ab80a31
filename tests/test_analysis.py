"""Analysis-layer tests: verdict logic, closed-form numerics, report shapes.

Each test mirrors one reference PASS/FAIL script (SURVEY.md §4) on synthetic
data small enough for the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from causalvae_tpu.analysis import causal_checks as CC
from causalvae_tpu.analysis import importance as IMP
from causalvae_tpu.analysis import kfold_eval as KE
from causalvae_tpu.analysis import translate as TR
from causalvae_tpu.analysis.mechanism import r2_per_feature


def test_r2_per_feature_matches_sklearn():
    from sklearn.metrics import r2_score

    rng = np.random.default_rng(0)
    y = rng.standard_normal((50, 4))
    p = y + 0.3 * rng.standard_normal((50, 4))
    got = r2_per_feature(p, y)
    want = np.array([r2_score(y[:, i], p[:, i]) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ridge_loocv_matches_explicit():
    """The hat-matrix LOOCV must equal literally refitting without each row."""
    rng = np.random.default_rng(1)
    z = rng.standard_normal((30, 5))
    m = z @ rng.standard_normal((5, 3)) + 0.1 * rng.standard_normal((30, 3))
    fast = TR.ridge_loocv_predictions(z, m, alpha=1.0)
    # explicit leave-one-out
    slow = np.zeros_like(m)
    for i in range(len(z)):
        mask = np.arange(len(z)) != i
        W, b = TR.ridge_fit(z[mask], m[mask], alpha=1.0)
        slow[i] = z[i] @ W + b
    # hat-matrix identity uses the full-data centering; agreement is close,
    # not bit-exact (the classic approximation for centered ridge)
    np.testing.assert_allclose(fast, slow, rtol=0.15, atol=0.15)


def test_translator_recovers_linear_map():
    rng = np.random.default_rng(2)
    z = rng.standard_normal((200, 8))
    W_true = rng.standard_normal((8, 3))
    m = z @ W_true
    names = ["a", "b", "c"]
    res = TR.fit_translator(z, m, names, alpha=1e-3)
    assert all(res["r2"][n] > 0.95 for n in names)


def test_causal_effect_estimation():
    rng = np.random.default_rng(3)
    m_a = rng.normal(0.0, 1.0, 300)
    m_b = rng.normal(2.0, 1.0, 300)  # true effect 2.0
    est = CC.estimate_effect(m_a, m_b, noise_std=0.5, seed=0)
    assert abs(est["effect"] - 2.0) < 0.3
    rcc = CC.refute_random_common_cause(est["treat"], est["outcome"], est["effect"])
    assert rcc["p_value"] > 0.05  # robust to random common cause
    plc = CC.refute_placebo(est["treat"], est["outcome"], est["effect"])
    # placebo collapses the effect toward 0
    assert abs(plc["placebo_effect"]) < 0.3


def test_causal_null_effect():
    rng = np.random.default_rng(4)
    m_a = rng.normal(0.0, 1.0, 300)
    m_b = rng.normal(0.0, 1.0, 300)
    est = CC.estimate_effect(m_a, m_b, noise_std=0.5, seed=0)
    assert abs(est["effect"]) < 0.3


def test_tipping_point_flips_sign():
    rng = np.random.default_rng(5)
    est = CC.estimate_effect(
        rng.normal(0, 1, 200), rng.normal(0.5, 1, 200), seed=0
    )
    tip = CC.tipping_point(est["treat"], est["outcome"], est["effect"])
    assert tip is None or 0.1 <= tip <= 1.0


def test_pairwise_cohens_d_ranks_separated_feature():
    rng = np.random.default_rng(6)
    fa = rng.normal(0, 1, (100, 3))
    fb = rng.normal(0, 1, (100, 3))
    fb[:, 1] += 3.0  # feature 'y' strongly separated
    res = IMP.pairwise_cohens_d(fa, fb, ["x", "y", "z"])
    assert res["ranking"][0] == "y"


def test_parse_treatment_name():
    r = KE.parse_treatment_name("DrugA 10nM")
    assert r["drug"] == "DrugA" and r["concentration"] == 10.0
    r2 = KE.parse_treatment_name("PBS")
    assert r2["concentration"] is None


def test_filter_pairwise_modes():
    rows = [
        {"treatment_a": "DrugA 10nM", "treatment_b": "PBS", "feature": "f",
         "diff": 1.0, "abs_diff": 1.0},
        {"treatment_a": "DrugA 10nM", "treatment_b": "DrugA 50nM", "feature": "f",
         "diff": 0.5, "abs_diff": 0.5},
        {"treatment_a": "DrugB 5nM", "treatment_b": "DrugC 5nM", "feature": "f",
         "diff": 0.2, "abs_diff": 0.2},
    ]
    assert len(KE.filter_pairwise(rows, mode="vs_baseline")) == 1
    assert len(KE.filter_pairwise(rows, mode="dose_response")) == 1


def test_snr_and_significance():
    from causalvae_tpu.scm.uncertainty import pairwise_snr, significant_changes

    mu = np.array([[0.0, 0.0], [3.0, 0.1]], np.float32)
    sigma = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
    snr = np.asarray(pairwise_snr(jnp.asarray(mu), jnp.asarray(sigma)))
    np.testing.assert_allclose(snr[0, 1, 0], 3.0 / np.sqrt(2.0), rtol=1e-5)
    top = significant_changes(snr, mu, ["A", "B"], ["f0", "f1"], top_k=2)
    assert top[0]["feature"] == "f0"


def test_minmax_and_compare_phases():
    p1 = {"sensitivity": {"a": 2.0, "b": 1.0, "c": 0.0}}
    p2 = {"sensitivity": {"a": 4.0, "b": 2.0, "c": 0.0}}
    cmp = IMP.compare_phases(p1, p2, ["a", "b", "c"])
    assert cmp["rank_correlation"] > 0.99


def test_grad_cam_shapes_and_range():
    from causalvae_tpu.analysis.gradcam import grad_cam
    from causalvae_tpu.models.heads import SimpleClassifier

    model = SimpleClassifier()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (3, 28, 28, 1))
    variables = model.init(key, x)
    cams = grad_cam(model, variables, x, jnp.array([0, 1, 2]))
    assert cams.shape == (3, 28, 28)
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6


def test_gradcam_split_forward_matches_model():
    """The functional re-implementation must reproduce the flax forward."""
    from causalvae_tpu.analysis.gradcam import _split_forward
    from causalvae_tpu.models.heads import SimpleClassifier

    model = SimpleClassifier()
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (2, 28, 28, 1))
    variables = model.init(key, x)
    feats_fn, head_fn = _split_forward(model, variables)
    _, logp_ref = model.apply(variables, x)
    logp_split = head_fn(feats_fn(x))
    np.testing.assert_allclose(np.asarray(logp_split), np.asarray(logp_ref),
                               rtol=1e-5, atol=1e-6)


def test_vessel_report_helpers():
    from causalvae_tpu.analysis.vessel_report import (
        discriminative_feature_ensemble, full_report_vs_baseline, reliability_gate,
    )

    rng = np.random.default_rng(7)
    mus = rng.standard_normal((60, 4)).astype(np.float32)
    t_idx = np.repeat(np.arange(3), 20)
    mus[t_idx == 1, 2] += 2.0  # feature 2 discriminates group 1
    names = ["f0", "f1", "f2", "f3"]
    ens = discriminative_feature_ensemble(mus, t_idx, names)
    assert ens["consensus_ranking"][0] == "f2"

    mu_t = np.stack([mus[t_idx == g].mean(0) for g in range(3)])
    sig_t = np.full_like(mu_t, 0.5)
    rows = full_report_vs_baseline(mu_t, sig_t, 0, ["g0", "g1", "g2"], names)
    assert len(rows) == 2 * 4

    gate = reliability_gate(np.ones((3, 4)) * 0.7, sig_t, ["g0", "g1", "g2"], names)
    assert all(r["category"] == "reliable" for r in gate)


def test_fix_csv_names_rewrites_numeric_treatments(tmp_path):
    from causalvae_tpu.analysis.vessel_report import fix_csv_names

    p = tmp_path / "all_pairwise_report.csv"
    p.write_text(
        "Treatment_From,Treatment_To,Feature,Diff\n"
        "0,2,area,1.5\n"
        "1,0,area,-0.3\n"
    )
    n = fix_csv_names(str(p), ["PBS", "DrugA", "DrugB"])
    assert n == 4
    lines = p.read_text().strip().splitlines()
    assert lines[1].startswith("PBS,DrugB")
    assert lines[2].startswith("DrugA,PBS")
    # idempotent on already-named columns
    assert fix_csv_names(str(p), ["PBS", "DrugA", "DrugB"]) == 0


def test_causal_report_dowhy_modes():
    rng = np.random.default_rng(0)
    m = {0: rng.standard_normal((40, 2)), 1: rng.standard_normal((40, 2)) + 1.0}
    # "never" always works (self-contained path)
    rows = CC.causal_validation_report(m, 0, 1, ["f0", "f1"], use_dowhy="never")
    assert set(rows) == {"f0", "f1"}
    # "require" must raise here (dowhy not installed in this environment)
    try:
        import dowhy  # noqa: F401
        has_dowhy = True
    except ImportError:
        has_dowhy = False
    if not has_dowhy:
        with pytest.raises(ImportError):
            CC.causal_validation_report(m, 0, 1, ["f0"], use_dowhy="require")
    # "auto" falls back silently
    rows = CC.causal_validation_report(m, 0, 1, ["f0"], use_dowhy="auto")
    assert "effect" in rows["f0"]
