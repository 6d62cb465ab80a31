"""Jitted train/eval steps for every workload.

Each factory closes over the static model/config and returns a function ready
for jax.jit (the trainers jit once and reuse). Whole-batch global arrays under
a data-parallel mesh make gradient reductions XLA collectives automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from causalvae_tpu.config import MnistConfig, VesselConfig
from causalvae_tpu.models.vae import reparameterize
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.state import TrainState


def make_mnist_adversarial_step(
    vae_model, disc_model, cfg: MnistConfig, bayesian: bool = False
):
    """One fused adversarial step (ref mnist_test/01 train.py:34-93):
    (1) D trained to classify T from a detached z sample;
    (2) VAE trained on BCE + beta*KLD + morph + confusion through the
        *updated* D (the reference updates D first).
    Both phases live in one jitted function; two optimizers."""

    def step(
        vae_state: TrainState, d_state: TrainState, batch, rng: jax.Array
    ) -> Tuple[TrainState, TrainState, Dict[str, jax.Array]]:
        x, m, t = batch["x"], batch["m"], batch["t"]
        t_idx = jnp.argmax(t, axis=1)
        r_enc, r_d, r_vae, r_conf = jax.random.split(rng, 4)

        # ---- phase 1: discriminator on detached z ------------------------
        out = vae_model.apply(vae_state.variables, x, m, t, rng=r_enc)
        z_detached = jax.lax.stop_gradient(
            reparameterize(r_d, out.mu, out.logvar)
        )

        def d_loss_fn(d_params):
            logits = disc_model.apply({"params": d_params}, z_detached)
            return L.discriminator_ce(logits, t_idx)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(d_grads)

        # ---- phase 2: VAE against updated D ------------------------------
        def vae_loss_fn(params):
            out = vae_model.apply({"params": params}, x, m, t, rng=r_vae)
            z_sample = reparameterize(r_conf, out.mu, out.logvar)
            d_logits_fake = disc_model.apply({"params": d_state.params}, z_sample)
            if bayesian:
                total, metrics = L.mnist_bayes_vae_loss(
                    out, x, m, d_logits_fake,
                    beta=cfg.beta, lambda_adv=cfg.lambda_adv, t_dim=cfg.t_dim,
                )
            else:
                total, metrics = L.mnist_vae_loss(
                    out, x, m, d_logits_fake,
                    beta=cfg.beta, lambda_adv=cfg.lambda_adv,
                    lambda_morph=cfg.lambda_morph, t_dim=cfg.t_dim,
                )
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(vae_loss_fn, has_aux=True)(
            vae_state.params
        )
        vae_state = vae_state.apply_gradients(grads)
        metrics["d_loss"] = d_loss
        return vae_state, d_state, metrics

    return step


def make_vae_step(model, loss_fn: Callable, has_batch_stats: bool = True,
                  needs_dropout: bool = False, train_kw: bool = True):
    """Generic single-optimizer VAE step.

    loss_fn(out, batch) -> (total, metrics). Handles BatchNorm batch_stats
    mutation inside the gradient computation (train=True path). Models whose
    __call__ takes no ``train`` kwarg (pure-conv, no BatchNorm/dropout) pass
    train_kw=False."""

    def step(state: TrainState, batch, rng: jax.Array):
        r_model, r_drop = jax.random.split(rng)

        def loss_inner(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
            kwargs = dict(rng=r_model)
            if train_kw:
                kwargs["train"] = True
            rngs = {"dropout": r_drop} if needs_dropout else None
            if has_batch_stats:
                out, mutated = model.apply(
                    variables, *batch_args(batch), mutable=["batch_stats"],
                    rngs=rngs, **kwargs,
                )
                new_stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, *batch_args(batch), rngs=rngs, **kwargs)
                new_stats = state.batch_stats
            total, metrics = loss_fn(out, batch)
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, metrics

    return step


def make_vae_eval_step(model, loss_fn: Callable, has_batch_stats: bool = True,
                       train_kw: bool = True):
    def step(state: TrainState, batch, rng: jax.Array):
        kwargs = {"train": False} if train_kw else {}
        out = model.apply(state.variables, *batch_args(batch), rng=rng, **kwargs)
        _, metrics = loss_fn(out, batch)
        return metrics

    return step


def batch_args(batch) -> Tuple:
    """Standard batch layout: dict with x (NHWC), m, t."""
    return batch["x"], batch["m"], batch["t"]


def make_simple_vae_step(model, loss_fn: Callable, arg_names=("x", "t"),
                         needs_dropout: bool = False, has_batch_stats: bool = False,
                         train_kw: bool = False):
    """Step for models with non-standard signatures (CVAE: (x, t);
    ViTVAE: (x,)). loss_fn(outputs, batch) -> (total, metrics)."""

    def step(state: TrainState, batch, rng: jax.Array):
        r_model, r_drop = jax.random.split(rng)

        def loss_inner(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
            args = tuple(batch[k] for k in arg_names)
            kwargs: Dict[str, Any] = dict(rng=r_model)
            if train_kw:
                kwargs["train"] = True
            rngs = {"dropout": r_drop} if needs_dropout else None
            if has_batch_stats:
                outputs, mutated = model.apply(
                    variables, *args, mutable=["batch_stats"], rngs=rngs, **kwargs
                )
                new_stats = mutated["batch_stats"]
            else:
                outputs = model.apply(variables, *args, rngs=rngs, **kwargs)
                new_stats = state.batch_stats
            total, metrics = loss_fn(outputs, batch)
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, metrics

    return step
