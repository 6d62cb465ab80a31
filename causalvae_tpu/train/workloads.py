"""High-level per-workload trainers — the reference's ``train_model`` /
``train_one_epoch`` entry points rebuilt on jitted steps.

Each trainer: builds model + optax chain, jits one step, streams device-fed
batches, logs reference-style epoch breakdowns, applies the best/latest/
periodic checkpoint cadence, and supports resume (SURVEY.md T1/T3/T5/T6/T7).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from causalvae_tpu.config import MnistConfig, VesselConfig
from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.models.vae import CausalConvVAE, CausalBioVAE, ConditionalVAE
from causalvae_tpu.models.vit import CausalViTVAE, ViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.checkpoints import CheckpointBook
from causalvae_tpu.train.loop import (
    make_mnist_adversarial_step,
    make_simple_vae_step,
    make_vae_eval_step,
    make_vae_step,
)
from causalvae_tpu.train.state import TrainState
from causalvae_tpu.utils.metrics import MetricLogger, StepTimer


def _to_device(batch: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"}


def train_mnist(
    dataset,
    cfg: MnistConfig = MnistConfig(),
    *,
    bayesian: bool = False,
    run_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    resume: bool = False,
    scan_steps: int = 0,
) -> Tuple[CausalConvVAE, TrainState, TrainState, MetricLogger]:
    """Adversarial MNIST causal-VAE training (T1, ref mnist_test/01
    train.py:11-103; Bayesian variant ref mnist_test/06 train.py).

    scan_steps > 0 runs the epoch through the scanned device-resident loop
    (scan_steps optimizer steps per XLA dispatch — see train/scan_loop.py);
    0 keeps one dispatch per batch."""
    epochs = epochs or cfg.epochs
    vae = CausalConvVAE(
        m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
        gaussian_mechanism=bayesian, decode_real_m=bayesian,
    )
    disc = LatentDiscriminator(t_dim=cfg.t_dim)
    key = jax.random.PRNGKey(cfg.seed)
    b0 = next(dataset.batches(2))
    vae_vars = vae.init(
        {"params": key}, jnp.asarray(b0["x"]), jnp.asarray(b0["m"]),
        jnp.asarray(b0["t"]), rng=key,
    )
    d_vars = disc.init(key, jnp.zeros((2, cfg.z_dim)))
    vae_state = TrainState.create(vae_vars, optax.adam(cfg.lr))
    d_state = TrainState.create(d_vars, optax.adam(cfg.lr))
    raw_step = make_mnist_adversarial_step(vae, disc, cfg, bayesian=bayesian)
    step = jax.jit(raw_step)
    trainer = None
    if scan_steps > 0:
        from causalvae_tpu.train.scan_loop import ScanTrainer

        trainer = ScanTrainer(raw_step, n_states=2, steps_per_dispatch=scan_steps)

    book = CheckpointBook(run_dir, period=50) if run_dir else None
    start_epoch = 0
    if book and resume:
        (vae_state, d_state), start_epoch = book.restore_latest((vae_state, d_state))

    logger = MetricLogger(run_dir)
    timer = StepTimer()
    rng = np.random.default_rng(cfg.seed)
    for epoch in range(start_epoch, epochs):
        metrics = None
        if trainer is not None:
            key, sub = jax.random.split(key)
            n_batches = len(dataset) // cfg.batch_size
            (vae_state, d_state), metrics = trainer.run_epoch(
                (vae_state, d_state), dataset.batches(cfg.batch_size, rng), sub)
            timer.tick(cfg.batch_size * max(n_batches, 1))
        else:
            for batch in dataset.batches(cfg.batch_size, rng):
                key, sub = jax.random.split(key)
                vae_state, d_state, metrics = step(vae_state, d_state, _to_device(batch), sub)
                timer.tick(cfg.batch_size)
        logger.log(epoch, metrics)
        logger.print_epoch(epoch, metrics)
        if book:
            book.end_of_epoch((vae_state, d_state), epoch)
    logger.log(-1, {"images_per_sec": timer.images_per_sec})
    return vae, vae_state, d_state, logger


def _generic_train(
    model, step, eval_step, init_batch, cfg_lr, grad_clip, epochs,
    train_iter: Callable[[int], Iterator[Dict]],
    val_iter: Optional[Callable[[], Iterator[Dict]]],
    *, seed: int, run_dir: Optional[str], period: int, resume: bool,
    batch_size_of: Callable[[Dict], int],
    init_kwargs: Optional[Dict] = None,
    artifact_cb: Optional[Callable[[int, TrainState], None]] = None,
    scan_steps: int = 0,
    mu_dtype=None,
):
    key = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": key, "dropout": key}, *init_batch, rng=key,
        **(init_kwargs or {}),
    )
    tx = optax.adam(cfg_lr, mu_dtype=mu_dtype)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                         optax.adam(cfg_lr, mu_dtype=mu_dtype))
    state = TrainState.create(variables, tx)
    jstep = jax.jit(step)
    jeval = jax.jit(eval_step) if eval_step else None
    trainer = None
    if scan_steps > 0:
        # device-resident loop: scan_steps optimizer steps per XLA dispatch
        # (see train/scan_loop.py — hides per-step host/RPC dispatch latency)
        from causalvae_tpu.train.scan_loop import ScanTrainer

        trainer = ScanTrainer(step, n_states=1, steps_per_dispatch=scan_steps)

    book = CheckpointBook(run_dir, period=period) if run_dir else None
    start_epoch = 0
    if book and resume:
        state, start_epoch = book.restore_latest(state)

    logger = MetricLogger(run_dir)
    timer = StepTimer()
    for epoch in range(start_epoch, epochs):
        metrics = None
        if trainer is not None:
            key, sub = jax.random.split(key)
            n = 0

            def counted(it):
                nonlocal n
                for b in it:
                    n += batch_size_of(b)
                    yield _to_device(b)

            (state,), metrics = trainer.run_epoch(
                (state,), counted(train_iter(epoch)), sub)
            timer.tick(n)
        else:
            for batch in train_iter(epoch):
                key, sub = jax.random.split(key)
                state, metrics = jstep(state, _to_device(batch), sub)
                timer.tick(batch_size_of(batch))
        logger.log(epoch, metrics, prefix="train_")
        logger.print_epoch(epoch, metrics)
        val_loss = None
        if jeval and val_iter:
            vals = []
            for batch in val_iter():
                key, sub = jax.random.split(key)
                vals.append(jax.device_get(jeval(state, _to_device(batch), sub)))
            if vals:
                val_loss = float(np.mean([v["loss"] for v in vals]))
                logger.log(epoch, {"loss": val_loss}, prefix="val_")
        if book:
            book.end_of_epoch(state, epoch, val_loss)
        if artifact_cb and period and (epoch + 1) % period == 0:
            artifact_cb(epoch, state)
    logger.log(-1, {"images_per_sec": timer.images_per_sec})
    return state, logger


def train_vessel(
    corpus,
    cfg: VesselConfig = VesselConfig(),
    *,
    model: Optional[CausalViTVAE] = None,
    img_hw: Optional[Tuple[int, int]] = None,
    run_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    resume: bool = False,
    pretrained_backbone: Optional[dict] = None,
    period: int = 50,
    scan_steps: int = 0,
    packed_io: bool = False,
):
    """Vessel CausalViTVAE training with the weighted/sparsity/NLL objective
    (T2/T3, ref vessel_analysis/01_train/train.py:100-203). ``period`` sets
    the periodic-checkpoint + sample-recon-PNG cadence (ref: every 50).
    ``scan_steps`` > 0 runs the epoch through the scanned device-resident loop
    (scan_steps optimizer steps per dispatch — hides host dispatch latency,
    the production configuration on TPU). ``packed_io`` feeds the step
    space_to_depth_n(x, 3)-packed images (losses are pixel-permutation-
    invariant, so training is identical; saves the boundary layout copies on
    TPU — see models/vit.py ViTVAE.packed_io)."""
    from causalvae_tpu.data.vessel import iterate_batches
    from causalvae_tpu.ops.subpixel import space_to_depth_n

    img_hw = img_hw or (cfg.img_height, cfg.img_width)
    epochs = epochs or cfg.epochs
    model = model or CausalViTVAE(
        img_size=img_hw, m_dim=corpus.m.shape[1], t_dim=corpus.t_dim,
        z_dim=cfg.z_dim, dtype=jnp.dtype(cfg.compute_dtype),
        packed_io=packed_io,
    )

    def pack(b):
        if not packed_io:
            return b
        return {**b, "x": space_to_depth_n(np.asarray(b["x"]), 3)}

    def loss_fn(out, batch):
        return L.vessel_loss(
            out, batch["x"], batch["m"], beta=cfg.beta,
            lambda_morph=cfg.lambda_morph, lambda_sparsity=cfg.lambda_sparsity,
        )

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    eval_step = make_vae_eval_step(model, loss_fn, has_batch_stats=True)
    b0 = pack(next(iterate_batches(corpus, "train", 2, img_hw, shuffle_seed=0)))

    artifact_cb = None
    if run_dir:
        # sample-recon PNG every `period` epochs (T3, ref train.py:186-200)
        sample = {k: jnp.asarray(v[:4]) for k, v in b0.items() if k != "labels"}

        def artifact_cb(epoch, state):
            from causalvae_tpu.analysis.plots import recon_triptych
            from causalvae_tpu.ops.subpixel import depth_to_space_n

            out = model.apply(state.variables, sample["x"], sample["m"],
                              sample["t"], rng=jax.random.PRNGKey(0),
                              train=False)
            xs, recon = np.asarray(sample["x"]), np.asarray(out.recon_x)
            if packed_io:
                xs = np.asarray(depth_to_space_n(sample["x"], 3))
                recon = np.asarray(depth_to_space_n(out.recon_x, 3))
            recon_triptych(
                xs, recon,
                os.path.join(run_dir, f"recon_epoch_{epoch + 1}.png"))

    state, logger = _generic_train(
        model, step, eval_step,
        (jnp.asarray(b0["x"]), jnp.asarray(b0["m"]), jnp.asarray(b0["t"])),
        cfg.lr, cfg.grad_clip_norm, epochs,
        train_iter=lambda e: map(pack, iterate_batches(
            corpus, "train", cfg.batch_size, img_hw, shuffle_seed=1000 + e
        )),
        val_iter=lambda: map(pack, iterate_batches(
            corpus, "val", cfg.batch_size, img_hw, augment=False,
            drop_remainder=False,
        )),
        seed=42, run_dir=run_dir, period=period, resume=resume,
        batch_size_of=lambda b: len(b["m"]),
        init_kwargs={"train": True},
        artifact_cb=artifact_cb,
        scan_steps=scan_steps,
        mu_dtype=jnp.dtype(cfg.adam_mu_dtype),
    )
    return model, state, logger


def train_cvae(dataset, *, t_dim: int = 10, z_dim: int = 10, epochs: int = 30,
               batch_size: int = 128, lr: float = 1e-3, beta: float = 1.0,
               run_dir: Optional[str] = None, seed: int = 42):
    """Plain conditional VAE T->X (T5, ref mnist_test/03 cvae_train.py:11-59)."""
    model = ConditionalVAE(t_dim=t_dim, z_dim=z_dim)

    def loss_fn(outputs, batch):
        recon, mu, logvar = outputs
        return L.cvae_loss(recon, batch["x"], mu, logvar, beta=beta)

    step = make_simple_vae_step(model, loss_fn, arg_names=("x", "t"))
    b0 = next(dataset.batches(2))
    state, logger = _generic_train(
        model, step, None, (jnp.asarray(b0["x"]), jnp.asarray(b0["t"])),
        lr, None, epochs,
        train_iter=lambda e: dataset.batches(batch_size, np.random.default_rng(seed + e)),
        val_iter=None, seed=seed, run_dir=run_dir, period=50, resume=False,
        batch_size_of=lambda b: len(b["t"]),
    )
    return model, state, logger


def train_vit_vae(batches_fn, img_hw: Tuple[int, int], *, latent_dim: int = 512,
                  epochs: int = 50, lr: float = 1e-4, beta: float = 1.0,
                  run_dir: Optional[str] = None, seed: int = 42,
                  model: Optional[ViTVAE] = None):
    """ViT-VAE pretraining, mean MSE + beta*KLD (T6, ref latent_translator/
    engine.py:6-36); batches_fn(epoch) yields {'x': (B,H,W,1)}."""
    # translator-variant backbone: 4 decoder ResBlock stages
    # (ref latent_translator/models.py:86-93)
    model = model or ViTVAE(img_size=img_hw, latent_dim=latent_dim,
                            dec_res_stages=4)

    def loss_fn(outputs, batch):
        recon, _, mu, logvar = outputs
        return L.vit_vae_loss(recon, batch["x"], mu, logvar, beta=beta)

    step = make_simple_vae_step(
        model, loss_fn, arg_names=("x",), needs_dropout=True,
        has_batch_stats=True, train_kw=True,
    )
    b0 = next(batches_fn(0))
    state, logger = _generic_train(
        model, step, None, (jnp.asarray(b0["x"]),), lr, None, epochs,
        train_iter=batches_fn, val_iter=None, seed=seed, run_dir=run_dir,
        period=50, resume=False, batch_size_of=lambda b: len(b["x"]),
        init_kwargs={"train": True},
    )
    return model, state, logger


def extract_vit_latents(model, state, batches) -> np.ndarray:
    """μ for every image, one jitted encode per batch (T6, ref
    engine.py:38-52)."""
    @jax.jit
    def enc(variables, xb):
        mu, _ = model.apply(variables, xb, method=model.encode)
        return mu

    out = []
    for batch in batches:
        out.append(np.asarray(enc(state.variables, jnp.asarray(batch["x"]))))
    return np.concatenate(out)


def train_cascade(corpus, *, img_hw: Tuple[int, int] = (512, 960),
                  z_dim: int = 64, epochs: int = 50, batch_size: int = 4,
                  lr: float = 1e-3, gamma: float = 2000.0,
                  run_dir: Optional[str] = None, seed: int = 42):
    """Cascade VAE training (T7, ref causal_cascade/train.py:1-39)."""
    from causalvae_tpu.data.cascade import iterate_batches

    model = CausalBioVAE(
        m_dim=corpus.m.shape[1], t_dim=len(corpus.group_names), z_dim=z_dim
    )

    def loss_fn(out, batch):
        return L.cascade_loss(out, batch["x"], batch["m"], gamma=gamma)

    step = make_vae_step(model, loss_fn, has_batch_stats=True)
    b0 = next(iterate_batches(corpus, 2, img_hw, train=False))
    state, logger = _generic_train(
        model, step, None,
        (jnp.asarray(b0["x"]), jnp.asarray(b0["m"]), jnp.asarray(b0["t"])),
        lr, None, epochs,
        train_iter=lambda e: iterate_batches(
            corpus, batch_size, img_hw, train=True, seed=seed + e
        ),
        val_iter=None, seed=seed, run_dir=run_dir, period=50, resume=False,
        batch_size_of=lambda b: len(b["m"]),
        init_kwargs={"train": True},
    )
    return model, state, logger
