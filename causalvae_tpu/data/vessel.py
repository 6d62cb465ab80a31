"""Vessel-MIP input pipeline: host decode, device-side transform, TPU feeding.

Reproduces the reference's data contract (SURVEY.md D4, ref
vessel_analysis/00_core/dataset.py:14-248):

  * CSV rows matched to ``*.vessel.mip.tiff`` files by trailing integer image
    ID in the filename ("H11-503938.vessel.mip.tiff" -> 503938)
  * 12 morphology feature columns (graph/vessel statistics in μm units)
  * NaN rows dropped; StandardScaler fit on ALL matched rows
  * T = sorted-unique ``group_name`` index, one-hot
  * stratified split seeded 42: per group 1 val, 1 test, rest train
    (<3 samples: degraded split), or mode='all' for k-fold
  * train-time 4x deterministic augmentation (idx%4 -> none/h/v/hv flips)
  * per-image min-max normalize then mean-threshold binarize — AFTER resize

Redesign: decode happens on host (tifffile / PIL, gated imports); everything
after raw pixels — resize, flips, normalize, binarize — is one jitted
device function (``preprocess``), vmapped over the batch, so the TPU does the
image math and the host loop disappears. A lookahead prefetcher keeps the
device fed (batch 8 x 768 x 1280 f32 = 31 MB/step, input-bound per SURVEY §7).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

FEATURE_COLUMNS = (
    "Node count", "Extremity Count", "Junction Count", "Edge count",
    "Segment Count", "Branch Count", "Isolated Edge Count",
    "Subnetwork Count(edge count >= 3)", "Total Vessel Length (μm)",
    "Mean Tortuosity", "Total Vessel Volume (μm^3)", "Average Vessel Radius (μm)",
)


# ---------------------------------------------------------------------------
# Device-side preprocessing (jitted, vmapped over batch)
# ---------------------------------------------------------------------------

def make_preprocess(img_hw: Tuple[int, int]):
    """Returns jitted (raw_batch (B,h,w), aug_mode (B,)) -> (B,H,W,1) float32.

    resize (antialiased bilinear) -> deterministic flip by aug mode
    (0 none / 1 h / 2 v / 3 hv) -> per-image min-max -> mean binarize,
    matching the reference's order of operations (ref dataset.py:216-237)."""
    import jax
    import jax.numpy as jnp

    H, W = img_hw

    def one(img, aug):
        img = img.astype(jnp.float32)
        img = jax.image.resize(img, (H, W), method="bilinear", antialias=True)
        h_flip = (aug == 1) | (aug == 3)
        v_flip = (aug == 2) | (aug == 3)
        img = jnp.where(h_flip, img[:, ::-1], img)
        img = jnp.where(v_flip, img[::-1, :], img)
        lo, hi = img.min(), img.max()
        img = jnp.where(hi > lo, (img - lo) / (hi - lo), jnp.zeros_like(img))
        img = (img > img.mean()).astype(jnp.float32)
        return img[..., None]

    return jax.jit(jax.vmap(one))


# ---------------------------------------------------------------------------
# Corpus scan (host)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VesselCorpus:
    paths: List[str]                 # len N (empty strings for in-memory corpora)
    raw_images: Optional[np.ndarray]  # (N, h, w) float32 if preloaded, else None
    m_raw: np.ndarray                # (N, 12) unscaled
    m: np.ndarray                    # (N, 12) standardized
    t_idx: np.ndarray                # (N,) int32
    group_names: List[str]
    scaler_mean: np.ndarray
    scaler_scale: np.ndarray
    splits: Dict[str, np.ndarray]    # 'train'/'val'/'test'/'all' -> indices

    @property
    def t_dim(self) -> int:
        return len(self.group_names)

    def one_hot_t(self, idx: np.ndarray) -> np.ndarray:
        return np.eye(self.t_dim, dtype=np.float32)[self.t_idx[idx]]

    def inverse_scale_m(self, m_norm: np.ndarray) -> np.ndarray:
        """Back to real units (used by the SNR pipeline, ref
        calculate_stats_and_snr.py real-unit conversion)."""
        return m_norm * self.scaler_scale + self.scaler_mean


def _id_from_filename(basename: str) -> Optional[int]:
    try:
        return int(basename.split("-")[-1].split(".")[0])
    except (ValueError, IndexError):
        return None


def _stratified_split(t_idx: np.ndarray, seed: int = 42) -> Dict[str, np.ndarray]:
    """Per-group 1 val / 1 test / rest train (ref dataset.py:124-159)."""
    rng = np.random.RandomState(seed)
    train, val, test = [], [], []
    for g in np.unique(t_idx):
        members = np.nonzero(t_idx == g)[0]
        rng.shuffle(members)
        if len(members) >= 3:
            val.append(members[0])
            test.append(members[1])
            train.extend(members[2:])
        elif len(members) == 2:
            val.append(members[0])
            train.append(members[1])
        elif len(members) == 1:
            train.append(members[0])
    for part in (train, val, test):
        rng.shuffle(part)
    return {
        "train": np.asarray(train, np.int32),
        "val": np.asarray(val, np.int32),
        "test": np.asarray(test, np.int32),
        "all": np.arange(len(t_idx), dtype=np.int32),
    }


def scan_corpus(csv_path: str, data_root: str, seed: int = 42) -> VesselCorpus:
    """CSV x file-tree matching + scaling + splits (host metadata only)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    files = glob.glob(
        os.path.join(data_root, "**", "*.vessel.mip.tiff"), recursive=True
    )
    id_to_path = {}
    for fpath in files:
        img_id = _id_from_filename(os.path.basename(fpath))
        if img_id is not None:
            id_to_path[img_id] = fpath

    group_names = sorted(df["group_name"].dropna().unique())
    group_to_idx = {n: i for i, n in enumerate(group_names)}

    paths, m_rows, t_rows = [], [], []
    for _, row in df.iterrows():
        img_id = row["Image ID"]
        if img_id not in id_to_path or pd.isna(row["group_name"]):
            continue
        m_vals = row[list(FEATURE_COLUMNS)].values.astype(np.float64)
        if np.isnan(m_vals).any():
            continue
        paths.append(id_to_path[img_id])
        m_rows.append(m_vals)
        t_rows.append(group_to_idx[row["group_name"]])

    m_raw = np.asarray(m_rows, np.float64)
    mean = m_raw.mean(axis=0)
    scale = m_raw.std(axis=0)
    scale = np.where(scale == 0.0, 1.0, scale)  # StandardScaler semantics
    m = ((m_raw - mean) / scale).astype(np.float32)
    t_idx = np.asarray(t_rows, np.int32)
    return VesselCorpus(
        paths=paths, raw_images=None, m_raw=m_raw.astype(np.float32), m=m,
        t_idx=t_idx, group_names=list(group_names),
        scaler_mean=mean.astype(np.float32), scaler_scale=scale.astype(np.float32),
        splits=_stratified_split(t_idx, seed),
    )


def load_raw(path: str) -> np.ndarray:
    """Host tiff decode (tifffile, PIL fallback — ref dataset.py:203-211)."""
    try:
        import tifffile

        return np.asarray(tifffile.imread(path), np.float32)
    except Exception:
        from PIL import Image

        return np.asarray(Image.open(path), np.float32)


# ---------------------------------------------------------------------------
# Synthetic corpus (test/bench stand-in; no tiff tree in this environment)
# ---------------------------------------------------------------------------

def synthetic_corpus(
    n: int = 60, n_groups: int = 19, hw: Tuple[int, int] = (96, 160), seed: int = 0
) -> VesselCorpus:
    """Random vessel-like branching masks + group-dependent morphology rows.

    Feature values are derived from the generated geometry (counts/lengths),
    so mechanism learning (T -> M) and measurement analyses behave like the
    real corpus."""
    rng = np.random.default_rng(seed)
    h, w = hw
    images = np.zeros((n, h, w), np.float32)
    m_raw = np.zeros((n, 12), np.float64)
    t_idx = rng.integers(0, n_groups, n).astype(np.int32)
    for i in range(n):
        g = int(t_idx[i])
        n_branches = 3 + g % 7 + int(rng.integers(0, 3))
        total_len = 0.0
        img = np.zeros((h, w), np.float32)
        for _ in range(n_branches):
            r = float(rng.uniform(0.2, 0.8) * h)
            c = float(rng.uniform(0.1, 0.3) * w)
            ang = float(rng.uniform(-0.6, 0.6))
            L = int(rng.integers(w // 4, int(w * 0.7)))
            thickness = 1 + g % 3
            for s in range(L):
                ang += float(rng.normal(0, 0.08))
                r += np.sin(ang)
                c += np.cos(ang)
                ri, ci = int(r), int(c)
                if 1 <= ri < h - 1 and 1 <= ci < w - 1:
                    img[ri - thickness + 1 : ri + thickness, ci - thickness + 1 : ci + thickness] = 1.0
                    total_len += 1.0
        images[i] = img
        area = float(img.sum())
        m_raw[i] = [
            n_branches * 2.0, n_branches * 1.1, n_branches * 0.9, n_branches * 2.2,
            n_branches * 2.0, n_branches, rng.uniform(0, 2), max(1.0, n_branches / 3),
            total_len, 1.0 + 0.02 * (g % 5), area * 2.0, 1.0 + (g % 3),
        ]
    mean = m_raw.mean(axis=0)
    scale = np.where(m_raw.std(axis=0) == 0, 1.0, m_raw.std(axis=0))
    m = ((m_raw - mean) / scale).astype(np.float32)
    group_names = [f"group_{i:02d}" for i in range(n_groups)]
    return VesselCorpus(
        paths=[""] * n, raw_images=images, m_raw=m_raw.astype(np.float32), m=m,
        t_idx=t_idx, group_names=group_names,
        scaler_mean=mean.astype(np.float32), scaler_scale=scale.astype(np.float32),
        splits=_stratified_split(t_idx),
    )


# ---------------------------------------------------------------------------
# Batched feeding with host lookahead
# ---------------------------------------------------------------------------

def iterate_batches(
    corpus: VesselCorpus,
    mode: str,
    batch_size: int,
    img_hw: Tuple[int, int],
    *,
    shuffle_seed: Optional[int] = None,
    augment: Optional[bool] = None,
    drop_remainder: bool = True,
    use_native: Optional[bool] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields {'x': (B,H,W,1) device-transformed, 'm': (B,12), 't': (B,T)}.

    Train mode enumerates the 4x augmented index space (sample, aug) like the
    reference's len*4 dataset (ref dataset.py:186-200).

    File-backed corpora route decode+resize+normalize+binarize through the
    native C++ prefetcher (causalvae_tpu.native) when available — the decode
    pipeline runs in a background thread pool so the accelerator never waits
    on IO; in-memory corpora use the jitted device transform."""
    import jax.numpy as jnp

    augment = (mode == "train") if augment is None else augment
    idx = corpus.splits[mode]
    pairs = (
        np.stack(np.meshgrid(idx, np.arange(4), indexing="ij"), -1).reshape(-1, 2)
        if augment
        else np.stack([idx, np.zeros_like(idx)], -1)
    )
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(pairs)

    file_backed = corpus.raw_images is None
    if use_native is None:
        if file_backed:
            from causalvae_tpu import native

            use_native = native.available()
        else:
            use_native = False

    def host_batch(chunk, pre):
        samples, augs = chunk[:, 0], chunk[:, 1]
        if corpus.raw_images is not None:
            raw = corpus.raw_images[samples]
        else:
            raw = np.stack([load_raw(corpus.paths[j]) for j in samples])
        return {
            "x": pre(jnp.asarray(raw), jnp.asarray(augs)),
            "m": corpus.m[samples],
            "t": corpus.one_hot_t(samples),
            "labels": corpus.t_idx[samples],
        }

    if file_backed and use_native:
        from causalvae_tpu import native

        tail = len(pairs) % batch_size
        main = pairs[: len(pairs) - tail] if tail else pairs
        loader = native.NativeBatchLoader(
            corpus.paths, main[:, 0], img_hw, batch_size,
            augs=main[:, 1], binarize=True,
        )
        try:
            for x, samples in loader:
                yield {
                    "x": jnp.asarray(x),
                    "m": corpus.m[samples],
                    "t": corpus.one_hot_t(samples),
                    "labels": corpus.t_idx[samples],
                }
        finally:
            loader.close()
        # the C++ loader has DataLoader drop-tail semantics; honor
        # drop_remainder=False by finishing the tail on the host path
        if tail and not drop_remainder:
            yield host_batch(pairs[len(pairs) - tail :], make_preprocess(img_hw))
        return

    pre = make_preprocess(img_hw)
    stop = len(pairs) - (len(pairs) % batch_size) if drop_remainder else len(pairs)
    for s in range(0, stop, batch_size):
        yield host_batch(pairs[s : s + batch_size], pre)
