"""latent_translator input pipeline: MIP + robust normalize + resize on device.

Reference contract (SURVEY.md D5, ref latent_translator/dataset.py:9-72 +
utils.py:18-60): multi-root recursive scan, extension-agnostic tiff matching by
trailing image ID, 3-D stacks reduced by max-intensity projection, percentile
clipping (default 99.5) with min-max scaling, bilinear resize to (384, 640).

Redesign: the host only decodes bytes; MIP (``jnp.max(axis=0)``), percentile
clip, scaling, and resize are one jitted device function. Zero-image fallback
on load errors is preserved (ref utils.py:38-41).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def scan_image_roots(image_roots: Sequence[str]) -> Dict[str, str]:
    """{image_id: path} over every *.tif/tiff under the roots; ID is the
    trailing '-'-separated token with extensions stripped (ref dataset.py:30-47)."""
    if isinstance(image_roots, str):
        image_roots = [image_roots]
    path_map: Dict[str, str] = {}
    for root in image_roots:
        for f in glob.glob(os.path.join(root, "**", "*"), recursive=True):
            if f.lower().endswith((".tiff", ".tif")):
                name = os.path.basename(f)
                for ext in (".tiff", ".tif", ".vessel"):
                    name = name.replace(ext, "")
                path_map[name.split("-")[-1]] = f
    return path_map


def match_table(df, path_map: Dict[str, str]):
    """Keep CSV rows whose Image ID has a file (ref dataset.py:49-52)."""
    df = df.copy()
    df["Image ID"] = df["Image ID"].astype(str)
    return df[df["Image ID"].isin(path_map.keys())].reset_index(drop=True)


def load_stack(path: str) -> np.ndarray:
    """Host decode of a (possibly 3-D) tiff/npy; zero image on failure."""
    try:
        if path.lower().endswith((".tif", ".tiff")):
            import tifffile

            return np.asarray(tifffile.imread(path), np.float32)
        if path.lower().endswith(".npy"):
            return np.load(path).astype(np.float32)
        from PIL import Image

        return np.asarray(Image.open(path), np.float32)
    except Exception:
        return np.zeros((100, 100), np.float32)


def make_preprocess(resize_hw: Tuple[int, int], clip_percentile: float = 99.5,
                    batched: bool = True):
    """jitted (B, h, w) -> (B, H, W, 1) (or (h, w) -> (H, W, 1) with
    batched=False): percentile clip -> [0,1] -> resize.

    MIP happens before this (stacks have ragged depth; `mip` handles it).
    The single-image form serves ragged corpora — each image is normalized
    and resized at its own shape (ref latent_translator/utils.py per-image
    semantics), one compile per distinct raw shape."""
    import jax
    import jax.numpy as jnp

    H, W = resize_hw
    lo_q, hi_q = 100.0 - clip_percentile, clip_percentile

    def one(img):
        img = img.astype(jnp.float32)
        vmin = jnp.percentile(img, lo_q)
        vmax = jnp.percentile(img, hi_q)
        img = jnp.clip(img, vmin, vmax)
        denom = jnp.where(vmax - vmin == 0, 1e-5, vmax - vmin)
        img = (img - vmin) / denom
        img = jax.image.resize(img, (H, W), method="bilinear")
        return img[..., None]

    return jax.jit(jax.vmap(one) if batched else one)


def mip(stack: np.ndarray) -> np.ndarray:
    """3-D -> 2-D max-intensity projection (host; ragged shapes)."""
    return stack.max(axis=0) if stack.ndim == 3 else stack


def iterate_images(
    df,
    path_map: Dict[str, str],
    batch_size: int,
    resize_hw: Tuple[int, int] = (384, 640),
    clip_percentile: float = 99.5,
    raw_images: Optional[np.ndarray] = None,
) -> Iterator[Dict]:
    """Yields {'x': (B,H,W,1), 'id': list[str]}; pads the tail batch."""
    import jax.numpy as jnp

    pre = make_preprocess(resize_hw, clip_percentile)
    pre1 = make_preprocess(resize_hw, clip_percentile, batched=False)
    ids = df["Image ID"].astype(str).tolist()
    for s in range(0, len(ids), batch_size):
        chunk = ids[s : s + batch_size]
        if raw_images is not None:
            raws = [raw_images[i] for i in range(s, s + len(chunk))]
        else:
            raws = [mip(load_stack(path_map[i])) for i in chunk]
        shapes = {r.shape for r in raws}
        if len(shapes) == 1:  # uniform batch: one vmapped transform
            x = pre(jnp.asarray(np.stack(raws)))
        else:  # ragged: normalize+resize each image at its own shape —
            # zero-padding to a common canvas would skew the percentile
            # normalization and bake in borders/scale distortion
            x = jnp.stack([pre1(jnp.asarray(r)) for r in raws])
        yield {"x": x, "id": chunk}
