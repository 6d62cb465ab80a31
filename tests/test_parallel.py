"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

The same pjit code paths run on a TPU slice; XLA inserts the gradient
reductions over the mesh axis (SURVEY.md §2.6 TPU-native plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from causalvae_tpu.config import MnistConfig
from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.parallel import mesh as M
from causalvae_tpu.train.loop import make_mnist_adversarial_step
from causalvae_tpu.train.state import TrainState


def test_make_mesh_uses_local_devices():
    mesh = M.make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_and_replicate_placement():
    mesh = M.make_mesh()
    batch = {"x": np.ones((16, 4), np.float32)}
    sharded = M.shard_batch(batch, mesh)
    spec = sharded["x"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("data")
    params = {"w": np.ones((3, 3), np.float32)}
    repl = M.replicate(params, mesh)
    assert repl["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_pad_to_multiple():
    batch = {"x": np.ones((13, 2), np.float32)}
    padded = M.pad_to_multiple(batch, 8)
    assert padded["x"].shape == (16, 2)
    np.testing.assert_array_equal(padded["x"][13:], 0.0)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """One adversarial train step, batch sharded over 8 devices, must equal
    the unsharded step (same rngs): XLA's psum of per-shard grads is just a
    reordered batch sum."""
    cfg = MnistConfig(z_dim=6)
    vae = CausalConvVAE(m_dim=12, t_dim=10, z_dim=6)
    disc = LatentDiscriminator(t_dim=10)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.random((32, 28, 28, 1)).astype(np.float32),
        "m": rng.standard_normal((32, 12)).astype(np.float32),
        "t": np.eye(10, dtype=np.float32)[rng.integers(0, 10, 32)],
    }
    vae_vars = vae.init({"params": key}, jnp.asarray(batch["x"][:2]),
                        jnp.asarray(batch["m"][:2]),
                        jnp.asarray(batch["t"][:2]), rng=key)
    d_vars = disc.init(key, jnp.zeros((2, 6)))

    def states():
        copy = lambda t: jax.tree.map(lambda a: jnp.array(a, copy=True), t)
        return (TrainState.create(copy(vae_vars), optax.adam(1e-3)),
                TrainState.create(copy(d_vars), optax.adam(1e-3)))

    step = jax.jit(make_mnist_adversarial_step(vae, disc, cfg))
    r = jax.random.PRNGKey(5)

    # single device
    vs1, ds1, m1 = step(*states(), {k: jnp.asarray(v) for k, v in batch.items()}, r)

    # data-parallel over the mesh
    mesh = M.make_mesh()
    sharded = M.shard_batch(batch, mesh)
    vs8, ds8, m8 = step(*M.replicate(states(), mesh), sharded, r)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # psum reduction order differs from the single-device batch sum; Adam's
    # rsqrt amplifies the f32 noise slightly on a handful of elements
    for a, b in zip(jax.tree.leaves(vs1.params), jax.tree.leaves(vs8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_batchnorm_stats_global_under_dp():
    """SURVEY.md §7 hard part: BatchNorm under data parallelism. Under jit
    with a sharded batch, GSPMD computes batch stats over the full logical
    batch, so mutated batch_stats match the single-device run exactly."""
    from causalvae_tpu.models.vae import CausalVesselVAE

    # 7-stage stride-2 encoder: 128x128 input -> (1, 1) grid
    model = CausalVesselVAE(m_dim=12, t_dim=19, z_dim=8, grid_hw=(1, 1))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = rng.random((16, 128, 128, 1)).astype(np.float32)
    m = rng.standard_normal((16, 12)).astype(np.float32)
    t = np.eye(19, dtype=np.float32)[rng.integers(0, 19, 16)]
    variables = model.init({"params": key}, jnp.asarray(x[:2]),
                           jnp.asarray(m[:2]), jnp.asarray(t[:2]), rng=key,
                           train=True)

    @jax.jit
    def stats(variables, x, m, t):
        _, mutated = model.apply(variables, x, m, t, rng=key, train=True,
                                 mutable=["batch_stats"])
        return mutated["batch_stats"]

    s1 = stats(variables, jnp.asarray(x), jnp.asarray(m), jnp.asarray(t))

    mesh = M.make_mesh()
    batch = M.shard_batch({"x": x, "m": m, "t": t}, mesh)
    s8 = stats(M.replicate(variables, mesh), batch["x"], batch["m"], batch["t"])

    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
