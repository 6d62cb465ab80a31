"""Grad-CAM over the residual classifier (A3).

The reference hooks torch conv activations/gradients (ref mnist_test/
02_mechanism_analysis/analyze_gradcam.py:18-75). In JAX the same quantity is a
closed-form ``jax.grad`` through a split forward: run the stem to the target
conv features, then differentiate the class score w.r.t. those features —
no hooks, fully jittable and vmapped over the batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from causalvae_tpu.models.heads import SimpleClassifier
from causalvae_tpu.models.vae import conv


def _split_forward(model: SimpleClassifier, variables):
    """(stem to conv2 features, head from those features)."""

    p = variables["params"]

    # SimpleClassifier is @nn.compact; re-run its layers functionally from the
    # parameter tree so the graph can be split at the target conv.
    def conv_apply(name, x, stride=1):
        kernel = p[name]["kernel"]
        bias = p[name]["bias"]
        y = jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias

    def features(x):
        h = conv_apply("Conv_0", x)
        h = nn.relu(nn.max_pool(h, (2, 2), strides=(2, 2)))
        h = conv_apply("Conv_1", h)  # target layer (ref conv2 hook)
        return h

    def head(feats):
        h = nn.relu(nn.max_pool(feats, (2, 2), strides=(2, 2)))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"])
        logits = h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]
        return jax.nn.log_softmax(logits, axis=-1)

    return features, head


def grad_cam(
    model: SimpleClassifier, variables, x: jnp.ndarray, class_idx: jnp.ndarray
) -> np.ndarray:
    """GAP-weighted CAM at the second conv layer, upsampled to input size.

    Returns (B, H, W) maps normalized to [0, 1] per image."""
    features, head = _split_forward(model, variables)
    feats = features(x)  # (B, h, w, C)

    def score(f):
        logp = head(f)
        return jnp.sum(
            jnp.take_along_axis(logp, class_idx[:, None], axis=1)
        )

    grads = jax.grad(score)(feats)  # (B, h, w, C)
    weights = grads.mean(axis=(1, 2), keepdims=True)  # GAP over spatial
    cam = nn.relu(jnp.sum(weights * feats, axis=-1))  # (B, h, w)
    cam = jax.image.resize(cam, (cam.shape[0],) + x.shape[1:3], method="bilinear")
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / jnp.where(hi - lo > 0, hi - lo, 1.0)
    return np.asarray(cam)


def per_class_mean_cam(
    model, variables, x: np.ndarray, labels: np.ndarray, n_classes: int = 10
) -> np.ndarray:
    """Mean CAM per class over a corpus (the per-digit grids of ref
    analyze_gradcam.py:100-190). Returns (n_classes, H, W)."""
    cams = grad_cam(model, variables, jnp.asarray(x), jnp.asarray(labels))
    out = np.zeros((n_classes,) + cams.shape[1:], np.float32)
    for c in range(n_classes):
        sel = labels == c
        if sel.any():
            out[c] = cams[sel].mean(axis=0)
    return out
