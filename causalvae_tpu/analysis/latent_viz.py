"""Latent diagnostics: t-SNE/PCA clustering, real-vs-fake embedding, outliers.

(A19, ref mnist_test/01_baseline_causal_vae/visualize.py:101-319.) Encoding
runs on device in one batched pass; sklearn t-SNE/PCA stay on host (as in the
reference — they are analysis-time, not hot-path).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def encode_corpus(model, variables, x, m, t, batch_size: int = 512) -> np.ndarray:
    """Batched mean-abduction of the whole corpus (one device pass per chunk)."""
    from causalvae_tpu.scm.intervene import abduct

    zs = []
    for s in range(0, len(x), batch_size):
        zs.append(np.asarray(abduct(
            model, variables,
            jnp.asarray(x[s : s + batch_size]),
            jnp.asarray(m[s : s + batch_size]),
            jnp.asarray(t[s : s + batch_size]),
        )))
    return np.concatenate(zs)


def tsne_embedding(z: np.ndarray, *, perplexity: float = 30.0, seed: int = 42) -> np.ndarray:
    from sklearn.manifold import TSNE

    return TSNE(
        n_components=2, perplexity=min(perplexity, max(2, len(z) // 4)),
        random_state=seed, init="pca",
    ).fit_transform(z)


def pca_embedding(z: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    from sklearn.decomposition import PCA

    p = PCA(n_components=2, random_state=42)
    emb = p.fit_transform(z)
    return emb, p.explained_variance_ratio_


def multi_perplexity_tsne(z: np.ndarray, perplexities=(10, 30, 50), seed: int = 42) -> Dict:
    """Verification pass at several perplexities (ref visualize.py:139-188)."""
    return {p: tsne_embedding(z, perplexity=p, seed=seed) for p in perplexities}


def disentanglement_score(z: np.ndarray, labels: np.ndarray) -> float:
    """How well a linear probe predicts T from Z (lower = better disentangled);
    quantifies what the reference's t-SNE judged by eye."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import cross_val_score

    clf = LogisticRegression(max_iter=500, random_state=42)
    return float(np.mean(cross_val_score(clf, z, labels, cv=3)))


def real_vs_fake_embedding(
    classifier, clf_variables, real_x: np.ndarray, fake_x: np.ndarray,
    batch_size: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """Classifier 50-d feature embeddings of real and generated images
    (ref visualize.py:190-246); returns (real_feats, fake_feats)."""
    @jax.jit
    def feats(xb):
        f, _ = classifier.apply(clf_variables, xb)
        return f

    def run(x):
        out = []
        for s in range(0, len(x), batch_size):
            out.append(np.asarray(feats(jnp.asarray(x[s : s + batch_size]))))
        return np.concatenate(out)

    return run(real_x), run(fake_x)


def centroid_outliers(
    feats: np.ndarray, labels: np.ndarray, top_k: int = 8
) -> Dict[int, np.ndarray]:
    """Per-class farthest-from-centroid samples (ref visualize.py:247-319
    outlier grids). Returns {class: indices (into feats)}."""
    out = {}
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        centroid = feats[idx].mean(axis=0)
        d = np.linalg.norm(feats[idx] - centroid, axis=1)
        out[int(c)] = idx[np.argsort(-d)[:top_k]]
    return out
