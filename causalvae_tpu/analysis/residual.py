"""Residual-leakage analysis: can T be read off X − X̂? (A2).

The reference trains a SimpleClassifier on residual images to predict the
digit; low accuracy means the morphology M captured the class-relevant
structure (ref mnist_test/02_mechanism_analysis/analyze_residual.py:14-129).
PASS < 20%, WARN < 50%, else FAIL (ref :120-126).

TPU design: residual computation and classifier training are jitted; the whole
residual corpus is computed in one batched reconstruction pass.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from causalvae_tpu.models.heads import SimpleClassifier
from causalvae_tpu.train.state import TrainState


def compute_residuals(model, variables, x, m, t, rng) -> jnp.ndarray:
    """X − X̂ with mean abduction (one batched pass)."""
    out = model.apply(variables, x, m, t, rng=rng)
    return x - out.recon_x


def make_classifier_step(model: SimpleClassifier):
    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            _, logp = model.apply({"params": params}, batch["x"])
            nll = -jnp.mean(
                jnp.take_along_axis(logp, batch["labels"][:, None], axis=1)
            )
            acc = jnp.mean(jnp.argmax(logp, -1) == batch["labels"])
            return nll, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {"loss": loss, "acc": acc}

    return step


def train_classifier_on(
    x: np.ndarray, labels: np.ndarray, *, epochs: int = 10, batch_size: int = 128,
    lr: float = 1e-3, seed: int = 0, n_classes: int = 10,
) -> Tuple[SimpleClassifier, dict, float]:
    """Train the eval CNN on (x, labels); returns (model, variables, train acc).

    Also used for the external real-image classifier (C3 training,
    ref mnist_test/01 train.py:105-128)."""
    model = SimpleClassifier(n_classes=n_classes)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.zeros((1,) + x.shape[1:], jnp.float32))
    state = TrainState.create(variables, optax.adam(lr))
    step = jax.jit(make_classifier_step(model))
    rng = np.random.default_rng(seed)
    n = len(x)
    batch_size = min(batch_size, n)  # corpora smaller than one batch
    acc = 0.0
    for _ in range(epochs):
        idx = rng.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            sel = idx[s : s + batch_size]
            batch = {"x": jnp.asarray(x[sel]), "labels": jnp.asarray(labels[sel])}
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        acc = float(metrics["acc"])
    return model, {"params": state.params}, acc


def evaluate_classifier(model, variables, x: np.ndarray, labels: np.ndarray,
                        batch_size: int = 512) -> float:
    @jax.jit
    def acc_fn(xb, lb):
        _, logp = model.apply(variables, xb)
        return jnp.sum(jnp.argmax(logp, -1) == lb)

    correct = 0
    for s in range(0, len(x), batch_size):
        correct += int(acc_fn(jnp.asarray(x[s : s + batch_size]),
                              jnp.asarray(labels[s : s + batch_size])))
    return correct / len(x)


def residual_leakage_analysis(
    vae_model, vae_variables, x: np.ndarray, m: np.ndarray, t: np.ndarray,
    labels: np.ndarray, *, epochs: int = 10, seed: int = 0, split: float = 0.8,
    batch_size: int = 256,
) -> Dict:
    """Full A2 pipeline: residuals -> train classifier -> verdict."""
    key = jax.random.PRNGKey(seed)
    residuals = []
    for s in range(0, len(x), batch_size):
        key, sub = jax.random.split(key)
        r = compute_residuals(
            vae_model, vae_variables,
            jnp.asarray(x[s : s + batch_size]),
            jnp.asarray(m[s : s + batch_size]),
            jnp.asarray(t[s : s + batch_size]), sub,
        )
        residuals.append(np.asarray(r))
    residuals = np.concatenate(residuals)

    n_train = int(len(residuals) * split)
    model, variables, _ = train_classifier_on(
        residuals[:n_train], labels[:n_train], epochs=epochs, seed=seed,
        n_classes=int(labels.max()) + 1,
    )
    acc = evaluate_classifier(model, variables, residuals[n_train:], labels[n_train:])
    verdict = "PASS" if acc < 0.20 else ("WARN" if acc < 0.50 else "FAIL")
    return {"accuracy": acc, "verdict": verdict, "residuals": residuals,
            "classifier": (model, variables)}
