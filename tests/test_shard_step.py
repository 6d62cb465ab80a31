"""Explicit shard_map DP step must reproduce the single-device update
(mean-reduced loss; the pmean of per-shard means equals the global mean)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.parallel.mesh import make_mesh
from causalvae_tpu.parallel.shard_step import make_shard_map_step
from causalvae_tpu.train.state import TrainState


def test_shard_map_step_matches_single_device():
    model = LatentDiscriminator(t_dim=10)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((32, 10)).astype(np.float32)
    y = rng.integers(0, 10, 32)
    batch = {"z": z, "y": np.eye(10, dtype=np.float32)[y]}

    variables = model.init(key, jnp.zeros((2, 10)))

    def loss_fn(params, batch, rng_):
        logits = model.apply({"params": params}, batch["z"])
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(batch["y"] * logp, axis=-1))

    def fresh():
        copy = jax.tree.map(lambda a: jnp.array(a, copy=True), variables)
        return TrainState.create(copy, optax.adam(1e-3))

    # reference: plain jit, full batch
    @jax.jit
    def ref_step(state, batch, rng_):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng_)
        return state.apply_gradients(grads), loss

    s1, l1 = ref_step(fresh(), {k: jnp.asarray(v) for k, v in batch.items()}, key)

    # explicit collectives over the 8-device mesh
    mesh = make_mesh()
    step = make_shard_map_step(loss_fn, mesh)
    s8, l8 = step(fresh(), batch, key)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # pmean-of-shard-means vs one global mean: f32 reduction-order noise,
    # amplified slightly by Adam's rsqrt
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
