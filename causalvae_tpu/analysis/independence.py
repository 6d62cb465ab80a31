"""Conditional-independence probe: does T add information beyond M? (A9)

Trains two decoders — M -> X and (M, T) -> X — and compares held-out MSE
(ref mnist_test/06_model_experiment/verify_independence.py:14-127). Verdict:
if mse_augmented < 0.95 * mse_baseline, conditional independence X ⫫ T | M is
rejected (T still carries image information not mediated by M).

Both probes train in one jitted step each; the two trainings are independent
and could be vmapped/stacked, but they are tiny (seconds) either way.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from causalvae_tpu.models.vae import MDecoder
from causalvae_tpu.train.state import TrainState


def _train_probe(
    x: np.ndarray, m: np.ndarray, t: Optional[np.ndarray], *,
    epochs: int, batch_size: int, lr: float, seed: int,
) -> float:
    """Train an MDecoder probe; returns held-out (20%) test MSE."""
    n_train = int(len(x) * 0.8)
    model = MDecoder()
    key = jax.random.PRNGKey(seed)
    args0 = (jnp.asarray(m[:1]),) + ((jnp.asarray(t[:1]),) if t is not None else ())
    variables = model.init(key, *args0)
    state = TrainState.create(variables, optax.adam(lr))

    def step(state, batch):
        def loss_fn(params):
            args = (batch["m"],) + ((batch["t"],) if t is not None else ())
            recon = model.apply({"params": params}, *args)
            return jnp.mean((recon - batch["x"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    jstep = jax.jit(step)
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        idx = rng.permutation(n_train)
        for s in range(0, n_train - batch_size + 1, batch_size):
            sel = idx[s : s + batch_size]
            batch = {"x": jnp.asarray(x[sel]), "m": jnp.asarray(m[sel])}
            if t is not None:
                batch["t"] = jnp.asarray(t[sel])
            state, _ = jstep(state, batch)

    @jax.jit
    def test_mse(params, xb, mb, tb):
        args = (mb,) + ((tb,) if t is not None else ())
        recon = model.apply({"params": params}, *args)
        return jnp.mean((recon - xb) ** 2)

    return float(
        test_mse(
            state.params,
            jnp.asarray(x[n_train:]),
            jnp.asarray(m[n_train:]),
            jnp.asarray(t[n_train:]) if t is not None else None,
        )
    )


def conditional_independence_test(
    x: np.ndarray, m: np.ndarray, t: np.ndarray, *,
    epochs: int = 20, batch_size: int = 128, lr: float = 1e-3, seed: int = 0,
    threshold: float = 0.95,
) -> Dict:
    """Full A9 experiment. Returns both MSEs, the improvement ratio, and the
    reference's verdict logic (ref verify_independence.py:119-127)."""
    mse_baseline = _train_probe(
        x, m, None, epochs=epochs, batch_size=batch_size, lr=lr, seed=seed
    )
    mse_augmented = _train_probe(
        x, m, t, epochs=epochs, batch_size=batch_size, lr=lr, seed=seed + 1
    )
    rejected = mse_augmented < threshold * mse_baseline
    m_explains = (
        1.0 - (mse_baseline - mse_augmented) / mse_baseline
        if mse_baseline > 0 else float("nan")
    )
    return {
        "mse_m_only": mse_baseline,
        "mse_m_and_t": mse_augmented,
        "independence_rejected": bool(rejected),
        "m_information_fraction": float(m_explains),
        "verdict": "T adds information (M incomplete)" if rejected
        else "M captures the class-relevant structure",
    }
