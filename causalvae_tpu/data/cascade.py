"""causal_cascade input pipeline: memory-safe MIP, device augs, standardize.

Reference contract (SURVEY.md D6, ref causal_cascade/dataset.py:12-155):
page-by-page MIP over 3-D tiffs, intensity clip to 3000, 100-px top/bottom
crop when H > 200, anti-aliased resize to (512, 960), train-time augmentation
(h/v flips p=0.5, shift/scale/rotate ±5%/±5%/±15° p=0.5 with reflect border,
brightness (-0.01, 0.1) / contrast (-0.01, 0.05) p=0.5), per-image
standardization; M min-max normalized over the corpus, T an integer label.

Redesign: augmentations are jax.random ops inside one jitted device function
(affine warp via jax.scipy.ndimage.map_coordinates) instead of host-side
albumentations; the host only decodes pages.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from causalvae_tpu.data.vessel import FEATURE_COLUMNS


def load_mip_paged(path: str) -> np.ndarray:
    """Page-by-page max projection (never materializes the 3-D stack,
    ref dataset.py:103-109)."""
    import tifffile

    with tifffile.TiffFile(path) as tif:
        proj = tif.pages[0].asarray().astype(np.float32)
        for page in tif.pages[1:]:
            np.maximum(proj, page.asarray().astype(np.float32), out=proj)
    return proj


def crop_and_clip(image: np.ndarray) -> np.ndarray:
    """clip to 3000, crop 100-px margins when tall (ref dataset.py:121-123)."""
    image = np.clip(image, image.min(), 3000.0)
    if image.shape[0] > 200:
        image = image[100:-100, :]
    return image


def make_augment(img_hw: Tuple[int, int]):
    """jitted (B,h,w), key -> (B,H,W,1): resize + random flips + affine +
    brightness/contrast + per-image standardize. Fixed shapes, pure device."""
    import jax
    import jax.numpy as jnp

    H, W = img_hw

    def one(img, key):
        ks = jax.random.split(key, 8)
        img = img.astype(jnp.float32)
        img = jax.image.resize(img, (H, W), method="bilinear", antialias=True)
        # flips, p=0.5 each
        img = jnp.where(jax.random.bernoulli(ks[0]), img[:, ::-1], img)
        img = jnp.where(jax.random.bernoulli(ks[1]), img[::-1, :], img)

        # shift/scale/rotate p=0.5 (reflect border)
        def warp(img):
            shift = jax.random.uniform(ks[2], (2,), minval=-0.05, maxval=0.05)
            scale = 1.0 + jax.random.uniform(ks[3], (), minval=-0.05, maxval=0.05)
            ang = jax.random.uniform(ks[4], (), minval=-15.0, maxval=15.0) * jnp.pi / 180.0
            cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
            yy, xx = jnp.mgrid[0:H, 0:W]
            y = (yy - cy - shift[0] * H) / scale
            x = (xx - cx - shift[1] * W) / scale
            ys = y * jnp.cos(ang) - x * jnp.sin(ang) + cy
            xs = y * jnp.sin(ang) + x * jnp.cos(ang) + cx
            # reflect-101 border
            ys = jnp.abs(ys)
            ys = jnp.where(ys > H - 1, 2 * (H - 1) - ys, ys)
            xs = jnp.abs(xs)
            xs = jnp.where(xs > W - 1, 2 * (W - 1) - xs, xs)
            return jax.scipy.ndimage.map_coordinates(
                img, [ys, xs], order=1, mode="nearest"
            )

        img = jnp.where(jax.random.bernoulli(ks[5]), warp(img), img)
        # brightness / contrast p=0.5
        b = jax.random.uniform(ks[6], (), minval=-0.01, maxval=0.1)
        c = 1.0 + jax.random.uniform(ks[7], (), minval=-0.01, maxval=0.05)
        apply_bc = jax.random.bernoulli(jax.random.fold_in(ks[6], 1))
        img = jnp.where(apply_bc, img * c + b, img)
        # per-image standardize (ref dataset.py:132-134)
        img = (img - img.mean()) / (img.std() + 1e-5)
        return img[..., None]

    def batch_fn(imgs, key):
        keys = jax.random.split(key, imgs.shape[0])
        return jax.vmap(one)(imgs, keys)

    return jax.jit(batch_fn)


def make_eval_preprocess(img_hw: Tuple[int, int]):
    import jax
    import jax.numpy as jnp

    H, W = img_hw

    def one(img):
        img = img.astype(jnp.float32)
        img = jax.image.resize(img, (H, W), method="bilinear", antialias=True)
        img = (img - img.mean()) / (img.std() + 1e-5)
        return img[..., None]

    return jax.jit(jax.vmap(one))


@dataclasses.dataclass
class CascadeCorpus:
    paths: List[str]
    raw_images: Optional[np.ndarray]
    m_raw: np.ndarray
    m: np.ndarray                 # min-max normalized (ref dataset.py:77-82)
    t_idx: np.ndarray
    group_names: List[str]
    m_min: np.ndarray
    m_denom: np.ndarray


def scan_cascade_corpus(csv_path: str, img_root_dirs: Sequence[str]) -> CascadeCorpus:
    import pandas as pd

    if isinstance(img_root_dirs, str):
        img_root_dirs = [img_root_dirs]
    df = pd.read_csv(csv_path)
    path_map: Dict[str, str] = {}
    for root in img_root_dirs:
        for p in glob.glob(os.path.join(root, "**", "*.vessel.tiff"), recursive=True):
            name = os.path.basename(p).replace(".tiff", "").replace(".vessel", "")
            path_map[name.split("-")[-1]] = p
    df["Image ID"] = df["Image ID"].astype(str)
    df = df[df["Image ID"].isin(path_map.keys())].reset_index(drop=True)

    groups = sorted(df["group_name"].unique())
    group_to_idx = {g: i for i, g in enumerate(groups)}
    m_raw = (
        df[list(FEATURE_COLUMNS)]
        .apply(pd.to_numeric, errors="coerce")
        .fillna(0)
        .values.astype(np.float32)
    )
    m_min = m_raw.min(axis=0)
    m_denom = m_raw.max(axis=0) - m_min
    m_denom[m_denom == 0] = 1.0
    return CascadeCorpus(
        paths=[path_map[i] for i in df["Image ID"]],
        raw_images=None,
        m_raw=m_raw,
        m=(m_raw - m_min) / m_denom,
        t_idx=np.asarray([group_to_idx[g] for g in df["group_name"]], np.int32),
        group_names=list(groups),
        m_min=m_min,
        m_denom=m_denom,
    )


def synthetic_cascade_corpus(n: int = 40, n_groups: int = 19, seed: int = 0) -> CascadeCorpus:
    """Reuses the vessel synthetic generator; min-max M normalization."""
    from causalvae_tpu.data.vessel import synthetic_corpus

    vc = synthetic_corpus(n=n, n_groups=n_groups, hw=(128, 192), seed=seed)
    m_min = vc.m_raw.min(axis=0)
    m_denom = vc.m_raw.max(axis=0) - m_min
    m_denom[m_denom == 0] = 1.0
    return CascadeCorpus(
        paths=vc.paths, raw_images=vc.raw_images, m_raw=vc.m_raw,
        m=(vc.m_raw - m_min) / m_denom, t_idx=vc.t_idx,
        group_names=vc.group_names, m_min=m_min, m_denom=m_denom,
    )


def iterate_batches(
    corpus: CascadeCorpus,
    batch_size: int,
    img_hw: Tuple[int, int] = (512, 960),
    *,
    train: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[Dict]:
    import jax
    import jax.numpy as jnp

    fn = make_augment(img_hw) if train else make_eval_preprocess(img_hw)
    rng = np.random.default_rng(seed)
    idx = np.arange(len(corpus.t_idx))
    if train:
        rng.shuffle(idx)
    key = jax.random.PRNGKey(seed)
    stop = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)
    for s in range(0, stop, batch_size):
        sel = idx[s : s + batch_size]
        if corpus.raw_images is not None:
            raw = corpus.raw_images[sel]
        else:
            raw = np.stack(
                [crop_and_clip(load_mip_paged(corpus.paths[j])) for j in sel]
            )
        if train:
            key, sub = jax.random.split(key)
            x = fn(jnp.asarray(raw), sub)
        else:
            x = fn(jnp.asarray(raw))
        yield {"x": x, "m": corpus.m[sel], "t": corpus.t_idx[sel]}
