"""MNIST input pipeline, TPU-style: precompute M once, keep everything
device-resident, feed jitted steps straight from device memory.

Replaces the reference's eager per-image host loop + DataLoader
(ref mnist_test/01_baseline_causal_vae/dataset.py:101-132): morphology is
measured once for the whole corpus (host oracle by default for bit-parity
with the reference recipe; optionally the vmapped on-device extractor), cached
to disk, and training batches are pure device slices — no host loop in the
steady state.

Without the MNIST IDX files (this environment has no dataset downloads), a
deterministic synthetic digit corpus rendered with PIL stands in; it produces
digit-dependent morphology so mechanism-analysis behavior is preserved.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import struct
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from causalvae_tpu.ops import morphology_host


def load_idx(path: str) -> np.ndarray:
    """Parse an (optionally gzipped) IDX file (MNIST distribution format)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0:
            raise ValueError(f"bad IDX magic in {path}")
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        dtype = {8: np.uint8, 9: np.int8, 11: np.int16, 12: np.int32, 13: np.float32, 14: np.float64}[dtype_code]
        data = np.frombuffer(f.read(), dtype=np.dtype(dtype).newbyteorder(">"))
        return data.reshape(dims)


def load_mnist_dir(root: str, train: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Load images/labels from a directory holding the 4 standard IDX files."""
    prefix = "train" if train else "t10k"
    for ext in ("", ".gz"):
        ipath = os.path.join(root, f"{prefix}-images-idx3-ubyte{ext}")
        lpath = os.path.join(root, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(ipath) and os.path.exists(lpath):
            images = load_idx(ipath).astype(np.float32) / 255.0
            labels = load_idx(lpath).astype(np.int32)
            return images, labels
    raise FileNotFoundError(f"no MNIST IDX files under {root}")


def synthetic_mnist(
    n: int, seed: int = 0, n_classes: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic digit corpus: PIL-rendered glyphs with random
    placement/scale jitter. Morphology depends on the digit class, so the
    T -> M mechanism is learnable like on real MNIST."""
    from PIL import Image, ImageDraw, ImageFont

    rng = np.random.default_rng(seed)
    font = ImageFont.load_default()
    images = np.zeros((n, 28, 28), dtype=np.float32)
    labels = rng.integers(0, n_classes, size=n).astype(np.int32)
    for i in range(n):
        d = int(labels[i])
        canvas = Image.new("L", (16, 16), 0)
        draw = ImageDraw.Draw(canvas)
        draw.text((3, 2), str(d), fill=255, font=font)
        scale = rng.uniform(1.6, 2.2)
        size = max(8, int(16 * scale))
        glyph = canvas.resize((size, size), Image.BILINEAR)
        big = Image.new("L", (28, 28), 0)
        ox = int(rng.integers(-2, 3)) + (28 - size) // 2
        oy = int(rng.integers(-2, 3)) + (28 - size) // 2
        big.paste(glyph, (ox, oy))
        if rng.random() < 0.5:
            big = big.rotate(float(rng.uniform(-12, 12)), resample=Image.BILINEAR)
        images[i] = np.asarray(big, dtype=np.float32) / 255.0
    return images, labels


@dataclass
class MorphDataset:
    """Device-feedable dataset: images (N, 28, 28, 1), morphology m (N, F),
    one-hot t (N, T). All float32 numpy; trainers move them to device once."""

    x: np.ndarray
    m: np.ndarray
    t: np.ndarray
    labels: np.ndarray

    def __len__(self):
        return self.x.shape[0]

    def batches(
        self, batch_size: int, rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = True,
    ) -> Iterator[dict]:
        n = len(self)
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        batch_size = min(batch_size, n)  # corpora smaller than one batch
        stop = n - (n % batch_size) if drop_remainder else n
        for s in range(0, stop, batch_size):
            sel = idx[s : s + batch_size]
            yield {"x": self.x[sel], "m": self.m[sel], "t": self.t[sel],
                   "labels": self.labels[sel]}


def build_morph_mnist(
    images: np.ndarray,
    labels: np.ndarray,
    n_features: int = 12,
    t_dim: int = 10,
    limit_count: Optional[int] = None,
    cache_path: Optional[str] = None,
    use_device_extractor: bool = False,
) -> MorphDataset:
    """Pair images with precomputed morphology + one-hot condition
    (ref dataset.py:101-132 cache semantics, minus the per-item host loop)."""
    if limit_count is not None:
        images, labels = images[:limit_count], labels[:limit_count]
    # content digest ties the cache to THIS corpus AND extractor flavor —
    # swapping --data between equal-sized datasets, or toggling the device
    # extractor, must not reuse stale M
    digest = hashlib.sha1(
        np.ascontiguousarray(images[:: max(1, len(images) // 64)]).tobytes()
        + f"|{n_features}|{'dev' if use_device_extractor else 'host'}".encode()
    ).hexdigest()
    m = None
    if cache_path and os.path.exists(cache_path):
        blob = np.load(cache_path, allow_pickle=False)
        if (blob["m"].shape == (len(images), n_features)
                and "digest" in blob and str(blob["digest"]) == digest):
            m = blob["m"]
    if m is None:
        if use_device_extractor:
            import jax.numpy as jnp

            from causalvae_tpu.ops import morphology

            fn = (
                morphology.features12_batch
                if n_features == 12
                else morphology.features16_batch
            )
            chunks = [
                np.asarray(fn(jnp.asarray(images[s : s + 512])))
                for s in range(0, len(images), 512)
            ]
            m = np.concatenate(chunks).astype(np.float32)
        else:
            m = morphology_host.extract_features_batch(images, n_features)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            np.savez(cache_path, m=m, digest=digest)
    t = np.eye(t_dim, dtype=np.float32)[labels]
    return MorphDataset(
        x=images[..., None].astype(np.float32), m=m.astype(np.float32),
        t=t, labels=labels.astype(np.int32),
    )
