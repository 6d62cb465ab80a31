"""Package-boundary end-to-end check (verify surface 3).

Synthetic MNIST -> adversarial train steps -> do(T) intervention grid, all
through public exports. Asserts the loss drops and the grid has shape
(S, T, 28, 28, 1). Runs anywhere (CPU by default under tests' env recipe).
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS", "") != "":
    pass  # honor explicit platform choice
else:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from causalvae_tpu.config import MnistConfig
from causalvae_tpu.data.mnist import build_morph_mnist, synthetic_mnist
from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.scm.intervene import do_t_grid
from causalvae_tpu.train.loop import make_mnist_adversarial_step
from causalvae_tpu.train.state import TrainState


def main() -> int:
    cfg = MnistConfig()
    images, labels = synthetic_mnist(256, seed=0)
    ds = build_morph_mnist(images, labels)
    vae = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    disc = LatentDiscriminator(t_dim=cfg.t_dim)
    key = jax.random.PRNGKey(0)
    b0 = next(ds.batches(2))
    vae_vars = vae.init({"params": key}, jnp.asarray(b0["x"]),
                        jnp.asarray(b0["m"]), jnp.asarray(b0["t"]), rng=key)
    d_vars = disc.init(key, jnp.zeros((2, cfg.z_dim)))
    vae_state = TrainState.create(vae_vars, optax.adam(cfg.lr))
    d_state = TrainState.create(d_vars, optax.adam(cfg.lr))
    step = jax.jit(make_mnist_adversarial_step(vae, disc, cfg))

    rng = np.random.default_rng(0)
    losses = []
    for epoch in range(3):
        for batch in ds.batches(64, rng):
            key, sub = jax.random.split(key)
            vae_state, d_state, metrics = step(
                vae_state, d_state,
                {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"},
                sub,
            )
        losses.append(float(metrics["loss"]))
    print("epoch losses:", [round(l, 1) for l in losses])
    assert losses[-1] < losses[0], "loss did not drop"

    # intervention: abduct 4 samples, sweep all 10 digits
    xb = jnp.asarray(next(ds.batches(4))["x"])
    mb = jnp.asarray(next(ds.batches(4))["m"])
    tb = jnp.asarray(next(ds.batches(4))["t"])
    t_targets = jnp.eye(cfg.t_dim, dtype=jnp.float32)
    grid = do_t_grid(vae, vae_state.variables, xb, mb, tb, t_targets)
    assert grid.shape == (4, cfg.t_dim, 28, 28, 1), grid.shape
    print("do_t_grid OK:", grid.shape, "range",
          float(grid.min()), float(grid.max()))
    print("e2e_check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
