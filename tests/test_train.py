"""Training-layer tests: k-fold parallel driver, checkpoints, torch porting."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train import kfold as KF
from causalvae_tpu.train.checkpoints import (
    CheckpointBook, flatten_params, interpolate_pos_embedding, smart_port,
    torch_linear_to_flax, unflatten_params,
)
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState

KEY = jax.random.PRNGKey(0)


def _tiny_model_and_step():
    model = CausalConvVAE(z_dim=4)

    def loss_fn(out, batch):
        return L.mnist_vae_loss(out, batch["x"], batch["m"],
                                jnp.zeros((out.mu.shape[0], 10)), lambda_adv=0.0)

    step = make_vae_step(model, loss_fn, has_batch_stats=False, train_kw=False)
    return model, step


@pytest.mark.slow
def test_kfold_parallel_driver_runs_and_descends():
    n = 80
    rng = np.random.default_rng(0)
    data = {
        "x": rng.random((n, 28, 28, 1)).astype(np.float32),
        "m": rng.standard_normal((n, 12)).astype(np.float32),
        "t": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)],
    }
    labels = data["t"].argmax(1)
    model, step = _tiny_model_and_step()

    def init_one(k):
        return model.init({"params": k}, jnp.asarray(data["x"][:2]),
                          jnp.asarray(data["m"][:2]), jnp.asarray(data["t"][:2]),
                          rng=k)

    states, plan, history = KF.train_kfold(
        init_one=init_one, step_fn=step, eval_fn=None, tx=optax.adam(1e-3),
        data=data, labels=labels, epochs=3, batch_size=8, n_folds=2, seed=0,
    )
    assert plan.n_folds == 2
    first = history[0]["train"]["loss"]
    last = history[-1]["train"]["loss"]
    assert (last < first).all(), (first, last)
    # stacked fold axis present on every param leaf
    leaves = jax.tree.leaves(states.params)
    assert all(l.shape[0] == 2 for l in leaves)


@pytest.mark.slow
def test_kfold_parallel_matches_sequential_trajectory():
    """The fold x data-parallel k-fold driver must produce, per fold, the SAME
    Adam trajectory as training that fold alone on one device (ref semantics:
    sequential per-fold loop, vessel_analysis/01_train/train_kfold.py:181-245).
    Replays train_kfold's exact init/batch/rng schedule fold-by-fold and
    asserts final params equal within fp32 reduction tolerance."""
    n, n_folds, batch_size, epochs, seed = 40, 2, 8, 2, 0
    rng = np.random.default_rng(1)
    data = {
        "x": rng.random((n, 28, 28, 1)).astype(np.float32),
        "m": rng.standard_normal((n, 12)).astype(np.float32),
        "t": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)],
    }
    labels = data["t"].argmax(1)
    model, step = _tiny_model_and_step()
    tx = optax.adam(1e-3)

    def init_one(k):
        return model.init({"params": k}, jnp.asarray(data["x"][:2]),
                          jnp.asarray(data["m"][:2]), jnp.asarray(data["t"][:2]),
                          rng=k)

    par_states, plan, _ = KF.train_kfold(
        init_one=init_one, step_fn=step, eval_fn=None, tx=tx, data=data,
        labels=labels, epochs=epochs, batch_size=batch_size,
        n_folds=n_folds, seed=seed,
    )
    par_params = jax.device_get(par_states.params)

    # sequential replay: identical stacked init, batch indices, rng schedule
    stacked_vars = jax.vmap(init_one)(
        jax.random.split(jax.random.PRNGKey(seed), n_folds))
    batcher = KF.FoldBatcher(plan, batch_size, seed)
    steps = batcher.steps_per_epoch()
    idx_schedule, rng_schedule = [], []
    key = jax.random.PRNGKey(seed)
    for _ in range(epochs):
        for _ in range(steps):
            idx_schedule.append(batcher.next_indices())
            key, sub = jax.random.split(key)
            rng_schedule.append(jax.random.split(sub, n_folds))

    jstep = jax.jit(step)
    for f in range(n_folds):
        vars_f = jax.tree.map(lambda a: a[f], jax.device_get(stacked_vars))
        st = TrainState.create(vars_f, tx)
        for idx, rngs in zip(idx_schedule, rng_schedule):
            b = {k: jnp.asarray(v[idx[f]]) for k, v in data.items()}
            st, _ = jstep(st, b, rngs[f])
        for path_leaf, (seq, par) in enumerate(zip(
                jax.tree.leaves(jax.device_get(st.params)),
                jax.tree.leaves(par_params))):
            np.testing.assert_allclose(
                np.asarray(seq), np.asarray(par)[f], rtol=2e-5, atol=1e-6,
                err_msg=f"fold {f} param leaf {path_leaf} diverged")


def test_fold_mesh_shapes():
    mesh = KF.make_fold_mesh(2)  # 8 cpu devices % 2 == 0 -> real fold axis
    assert mesh.devices.shape == (2, 4)
    mesh5 = KF.make_fold_mesh(5)  # 8 % 5 != 0 -> vmap folds, 1-D mesh
    assert mesh5.devices.shape == (1, 8)


def test_checkpoint_book_cadence_and_resume(tmp_path):
    model, step = _tiny_model_and_step()
    variables = model.init({"params": KEY}, jnp.zeros((1, 28, 28, 1)),
                           jnp.zeros((1, 12)), jnp.zeros((1, 10)), rng=KEY)
    state = TrainState.create(variables, optax.adam(1e-3))
    book = CheckpointBook(str(tmp_path / "run"), period=2)
    book.end_of_epoch(state.params, 0, val_loss=5.0)
    book.end_of_epoch(state.params, 1, val_loss=4.0)  # best updates; epoch_2 snapshot
    book.end_of_epoch(state.params, 2, val_loss=6.0)  # best stays
    assert os.path.isdir(tmp_path / "run" / "latest")
    assert os.path.isdir(tmp_path / "run" / "best")
    assert os.path.isdir(tmp_path / "run" / "epoch_2")
    restored, next_epoch = book.restore_latest(jax.device_get(state.params))
    assert next_epoch == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored)[0]),
        np.asarray(jax.tree.leaves(jax.device_get(state.params))[0]),
    )


def test_smart_port_and_pos_embedding_interp():
    # flat target with a Dense kernel and a pos embedding
    target = {
        "fc/kernel": np.zeros((4, 3), np.float32),
        "pos_embedding": np.zeros((1, 2 * 3 + 1, 8), np.float32),
    }
    torch_state = {
        "fc.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "pos": np.random.default_rng(0).standard_normal((1, 4 * 6 + 1, 8)).astype(np.float32),
    }
    ported, skipped = smart_port(
        target,
        torch_state,
        {
            "fc/kernel": ("fc.weight", torch_linear_to_flax),
            "pos_embedding": ("pos", lambda a: a),
        },
        pos_embedding_key="pos_embedding", src_grid=(4, 6), dst_grid=(2, 3),
    )
    assert not skipped
    np.testing.assert_array_equal(ported["fc/kernel"], torch_state["fc.weight"].T)
    assert ported["pos_embedding"].shape == (1, 7, 8)
    # CLS token preserved exactly
    np.testing.assert_array_equal(ported["pos_embedding"][:, 0], torch_state["pos"][:, 0])


def test_smart_port_skips_mismatches():
    target = {"a/kernel": np.zeros((2, 2), np.float32)}
    ported, skipped = smart_port(
        target, {"a.weight": np.zeros((5, 5), np.float32)},
        {"a/kernel": ("a.weight", torch_linear_to_flax)},
    )
    assert skipped and skipped[0][0] == "a/kernel"
    assert ported["a/kernel"].shape == (2, 2)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones(2), "c": {"d": np.zeros(3)}}}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])


def test_interpolate_pos_embedding_identity():
    pos = np.random.default_rng(1).standard_normal((1, 2 * 2 + 1, 4)).astype(np.float32)
    out = interpolate_pos_embedding(pos, (2, 2), (2, 2))
    np.testing.assert_allclose(out, pos, rtol=1e-5)
