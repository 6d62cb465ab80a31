"""Scanned multi-step training must be step-for-step identical to the
Python-loop formulation (same batches, same rngs)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from causalvae_tpu.config import MnistConfig
from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.train.loop import make_mnist_adversarial_step
from causalvae_tpu.train.scan_loop import (ScanTrainer, chunked,
                                           make_scan_epoch, stack_batches)
from causalvae_tpu.train.state import TrainState


@pytest.fixture(scope="module")
def setup():
    cfg = MnistConfig(z_dim=6)
    vae = CausalConvVAE(m_dim=12, t_dim=10, z_dim=6)
    disc = LatentDiscriminator(t_dim=10)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    batches = [
        {
            "x": rng.random((16, 28, 28, 1)).astype(np.float32),
            "m": rng.standard_normal((16, 12)).astype(np.float32),
            "t": np.eye(10, dtype=np.float32)[rng.integers(0, 10, 16)],
        }
        for _ in range(4)
    ]
    b0 = batches[0]
    vae_vars = vae.init({"params": key}, jnp.asarray(b0["x"]),
                        jnp.asarray(b0["m"]), jnp.asarray(b0["t"]), rng=key)
    d_vars = disc.init(key, jnp.zeros((16, 6)))

    def fresh_states():
        # deep-copy: ScanTrainer donates state buffers into the scanned program
        copy = lambda tree: jax.tree.map(lambda a: jnp.array(a, copy=True), tree)
        return (TrainState.create(copy(vae_vars), optax.adam(1e-3)),
                TrainState.create(copy(d_vars), optax.adam(1e-3)))

    step = make_mnist_adversarial_step(vae, disc, cfg)
    return step, fresh_states, batches


@pytest.mark.slow
def test_scan_epoch_matches_python_loop(setup):
    step, fresh_states, batches = setup
    rngs = jax.random.split(jax.random.PRNGKey(7), 4)

    # python loop
    vs, ds = fresh_states()
    loop_losses = []
    jstep = jax.jit(step)
    for b, r in zip(batches, rngs):
        vs, ds, metrics = jstep(vs, ds, {k: jnp.asarray(v) for k, v in b.items()}, r)
        loop_losses.append(float(metrics["loss"]))

    # one scanned dispatch
    epoch = jax.jit(make_scan_epoch(step, n_states=2))
    (vs2, ds2), metrics = epoch(fresh_states(), stack_batches(batches), rngs)
    scan_losses = [float(v) for v in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(scan_losses, loop_losses, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(vs.params), jax.tree.leaves(vs2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.slow
def test_scan_trainer_consumes_iterator(setup):
    step, fresh_states, batches = setup
    trainer = ScanTrainer(step, n_states=2, steps_per_dispatch=3)
    # 4 batches with steps_per_dispatch=3 -> one full stack + ragged tail of 1
    states, metrics = trainer.run_epoch(
        fresh_states(), iter(batches), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # dropping the ragged tail consumes only the full stack
    states, metrics = trainer.run_epoch(
        fresh_states(), iter(batches), jax.random.PRNGKey(0),
        drop_ragged_tail=True)
    assert np.isfinite(float(metrics["loss"]))


def test_chunked():
    assert list(chunked(iter(range(7)), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(chunked(iter([]), 3)) == []


@pytest.mark.slow
def test_train_mnist_scan_steps():
    """train_mnist(scan_steps=N) drives the scanned loop end-to-end."""
    from causalvae_tpu.config import MnistConfig
    from causalvae_tpu.data.mnist import build_morph_mnist, synthetic_mnist
    from causalvae_tpu.train.workloads import train_mnist

    images, labels = synthetic_mnist(48, seed=3)
    ds = build_morph_mnist(images, labels)
    cfg = MnistConfig(batch_size=16, epochs=2, z_dim=6)
    vae, vae_state, d_state, logger = train_mnist(ds, cfg, scan_steps=2)
    losses = [r["loss"] for r in logger.history if "loss" in r]
    assert len(losses) == 2 and np.isfinite(losses).all()
