"""Data-pipeline tests: vessel/cascade/translator preprocessing semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from causalvae_tpu.data import cascade as DC
from causalvae_tpu.data import translator as DT
from causalvae_tpu.data import vessel as DV


@pytest.fixture(scope="module")
def corpus():
    return DV.synthetic_corpus(n=30, n_groups=5, hw=(64, 96), seed=1)


def test_vessel_split_semantics(corpus):
    s = corpus.splits
    # per group: 1 val, 1 test (groups with >= 3 members)
    for g in np.unique(corpus.t_idx):
        members = set(np.nonzero(corpus.t_idx == g)[0])
        if len(members) >= 3:
            assert len(members & set(s["val"].tolist())) == 1
            assert len(members & set(s["test"].tolist())) == 1
    # disjoint, covering
    all_idx = set(s["train"]) | set(s["val"]) | set(s["test"])
    assert len(set(s["train"]) & set(s["val"])) == 0
    assert len(all_idx) == len(corpus.t_idx)
    assert len(s["all"]) == len(corpus.t_idx)


def test_vessel_scaler_standardizes(corpus):
    np.testing.assert_allclose(corpus.m.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        corpus.m.std(0)[corpus.m_raw.std(0) > 0], 1.0, atol=1e-3
    )
    # inverse transform roundtrip
    np.testing.assert_allclose(
        corpus.inverse_scale_m(corpus.m), corpus.m_raw, rtol=1e-4, atol=1e-3
    )


def test_vessel_preprocess_binarizes_and_flips():
    pre = DV.make_preprocess((32, 48))
    rng = np.random.default_rng(0)
    raw = rng.random((4, 64, 96)).astype(np.float32)
    out = np.asarray(pre(jnp.asarray(raw), jnp.asarray([0, 1, 2, 3])))
    assert out.shape == (4, 32, 48, 1)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # aug 1 = horizontal flip of aug 0 on the same image
    o0 = np.asarray(pre(jnp.asarray(raw[:1]), jnp.asarray([0])))
    o1 = np.asarray(pre(jnp.asarray(raw[:1]), jnp.asarray([1])))
    np.testing.assert_array_equal(o0[0, :, ::-1], o1[0])


def test_vessel_train_batches_4x_augmented(corpus):
    batches = list(DV.iterate_batches(corpus, "train", 8, (32, 48),
                                      shuffle_seed=0))
    n_train = len(corpus.splits["train"])
    assert sum(len(b["m"]) for b in batches) == (n_train * 4) // 8 * 8
    b = batches[0]
    assert b["x"].shape == (8, 32, 48, 1) and b["t"].shape == (8, corpus.t_dim)


def test_id_parsing():
    assert DV._id_from_filename("H11-503938.vessel.mip.tiff") == 503938
    assert DV._id_from_filename("garbage.tiff") is None


def test_translator_preprocess_percentile_clip():
    pre = DT.make_preprocess((16, 24), clip_percentile=99.5)
    rng = np.random.default_rng(1)
    img = rng.random((1, 32, 48)).astype(np.float32)
    img[0, 0, 0] = 1e6  # outlier must be clipped away
    out = np.asarray(pre(jnp.asarray(img)))
    assert out.shape == (1, 16, 24, 1)
    assert out.max() <= 1.0 + 1e-5 and out.min() >= 0.0


def test_translator_mip():
    stack = np.stack([np.zeros((4, 4)), np.full((4, 4), 2.0)]).astype(np.float32)
    np.testing.assert_array_equal(DT.mip(stack), np.full((4, 4), 2.0))


def test_cascade_crop_and_clip():
    img = np.full((400, 100), 5000.0, np.float32)
    out = DC.crop_and_clip(img)
    assert out.shape == (200, 100)
    assert out.max() <= 3000.0


def test_cascade_augment_standardizes():
    fn = DC.make_augment((32, 48))
    import jax

    rng = np.random.default_rng(2)
    raw = rng.random((3, 64, 96)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(raw), jax.random.PRNGKey(0)))
    assert out.shape == (3, 32, 48, 1)
    np.testing.assert_allclose(out.mean(axis=(1, 2, 3)), 0.0, atol=1e-3)
    np.testing.assert_allclose(out.std(axis=(1, 2, 3)), 1.0, atol=2e-2)


def test_cascade_min_max_normalization():
    c = DC.synthetic_cascade_corpus(n=20, n_groups=4)
    assert c.m.min() >= 0.0 and c.m.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_scan_corpus_and_file_backed_kfold(tmp_path):
    """File-backed path end-to-end: scan_corpus (CSV x tiff matching) feeds
    the CLI kfold trainer, which must decode from disk (raw_images=None)."""
    import pandas as pd

    from causalvae_tpu.data.vessel import FEATURE_COLUMNS, scan_corpus
    from tests.test_native import _write_tiff_f32

    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        arr = (rng.random((48, 80)) > 0.8).astype(np.float32)
        _write_tiff_f32(str(tmp_path / f"scan-{i}.vessel.mip.tiff"), arr)
        rows.append({"Image ID": i, "group_name": f"g{i % 2}",
                     **{c: float(rng.random()) for c in FEATURE_COLUMNS}})
    csv = tmp_path / "meta.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    corpus = scan_corpus(str(csv), str(tmp_path))
    assert corpus.raw_images is None and len(corpus.paths) == 8
    assert corpus.t_dim == 2

    from causalvae_tpu.cli.main import main

    main(["--out", str(tmp_path / "out"), "kfold", "--epochs", "1",
          "--folds", "2", "--batch-size", "2", "--img-hw", "96", "160",
          "--csv", str(csv), "--data", str(tmp_path)])
