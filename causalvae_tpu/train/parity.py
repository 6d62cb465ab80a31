"""Optimizer-trajectory parity against the torch reference (BASELINE metric #1).

BASELINE.json's first metric is "ELBO parity". Forward-port parity
(tests/test_port_*.py) proves the models compute the same function; loss
parity (tests/test_models.py::test_losses_against_torch) proves the loss
recipes agree op-by-op. This module closes the last gap: it runs the
reference's OWN training loop — built here in torch exactly as the reference
does it (MNIST: D-step CE + VAE-step BCE_sum + beta*KLD + 100*MSE + confusion,
Adam 1e-3, ref mnist_test/01_baseline_causal_vae/train.py:41-89; vessel:
weighted-MSE + sparsity + KLD + Gaussian-NLL with grad-clip 5.0, Adam 1e-4,
ref vessel_analysis/01_train/train_kfold.py:20-83) side-by-side with this
framework's fused jitted steps, from a PORTED COMMON INIT with IDENTICAL
injected reparameterization noise, and reports per-step total-loss deltas.

Noise injection: both frameworks draw different RNG streams, so the
reparameterization eps for every sampling site is precomputed in numpy and fed
as data — z = mu + eps * exp(0.5 * logvar) on both sides. The reference's
redundant no-grad encodes in the D phase (ref train.py:43-52) consume RNG but
have no mathematical effect; the effective computation is replicated, not the
redundancy (SURVEY.md §7 "known quirks").

Determinism notes: both sides run f32; optax.adam(lr) == torch.optim.Adam
defaults bit-for-math (b1 .9, b2 .999, eps 1e-8 added OUTSIDE the sqrt in
both). Remaining per-step deltas are pure summation-order float error, which
compounds through Adam — the tables report the actual growth.

torch is imported lazily: the module imports fine without it, runners raise.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from causalvae_tpu.config import MnistConfig, VesselConfig
from causalvae_tpu.models.heads import LatentDiscriminator
from causalvae_tpu.models.vae import CausalConvVAE, CausalVesselVAE, VAEOutput
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.checkpoints import flatten_params, smart_port, \
    torch_linear_to_flax, unflatten_params
from causalvae_tpu.train.port_maps import port_mnist_checkpoint, \
    port_vessel_cnn_checkpoint
from causalvae_tpu.train.state import TrainState


# --------------------------------------------------------------------------
# torch reference constructions (state-dict layouts == the reference's)
# --------------------------------------------------------------------------

def build_torch_mnist(m_dim=12, t_dim=10, z_dim=10, seed=0):
    """Reference CausalMorphVAE12 + LatentDiscriminator, constructed exactly
    as the reference does (ref mnist_test/01 models.py:6-111), torch-seeded."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_conv = nn.Sequential(
                nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(),
                nn.Conv2d(32, 64, 4, 2, 1), nn.ReLU(), nn.Flatten())
            self.enc_fc = nn.Sequential(
                nn.Linear(64 * 49 + m_dim + t_dim, 512), nn.ReLU(),
                nn.Linear(512, 2 * z_dim))
            self.morph_predictor = nn.Sequential(
                nn.Linear(t_dim, 128), nn.ReLU(), nn.Linear(128, m_dim))
            self.dec_fc = nn.Sequential(
                nn.Linear(m_dim + z_dim, 64 * 49), nn.ReLU())
            self.dec_conv = nn.Sequential(
                nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ReLU(),
                nn.ConvTranspose2d(32, 1, 4, 2, 1), nn.Sigmoid())

        def encode(self, x, m, t):
            h = torch.cat([self.enc_conv(x), m, t], dim=1)
            return self.enc_fc(h).chunk(2, dim=1)

        def decode(self, m, z):
            h = self.dec_fc(torch.cat([m, z], dim=1)).view(-1, 64, 7, 7)
            return self.dec_conv(h)

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(z_dim, 64), nn.LeakyReLU(0.2),
                nn.Linear(64, 64), nn.LeakyReLU(0.2), nn.Linear(64, t_dim))

        def forward(self, z):
            return self.net(z)

    return VAE(), Disc()


def build_torch_vessel(m_dim=12, t_dim=19, z_dim=16, grid=(1, 2), seed=0):
    """Reference CausalVesselVAE (C7) at a parameterized grid (ref
    vessel_analysis/00_core/models.py:9-166, live dec_conv only)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    flat = 512 * grid[0] * grid[1]

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            layers, prev = [], 1
            for c in (32, 64, 128, 256, 512, 512, 512):
                layers += [nn.Conv2d(prev, c, 4, 2, 1), nn.BatchNorm2d(c),
                           nn.LeakyReLU(0.2)]
                prev = c
            layers.append(nn.Flatten())
            self.enc_conv = nn.Sequential(*layers)
            self.enc_fc = nn.Sequential(
                nn.Linear(flat + m_dim + t_dim, 1024), nn.BatchNorm1d(1024),
                nn.LeakyReLU(0.2), nn.Linear(1024, 2 * z_dim))
            self.morph_predictor_shared = nn.Sequential(
                nn.Linear(t_dim, 64), nn.LeakyReLU(0.2),
                nn.Linear(64, 64), nn.LeakyReLU(0.2))
            self.morph_predictor_mu = nn.Linear(64, m_dim)
            self.morph_predictor_logvar = nn.Linear(64, m_dim)
            self.dec_fc = nn.Sequential(
                nn.Linear(m_dim + z_dim, 1024), nn.BatchNorm1d(1024),
                nn.LeakyReLU(0.2), nn.Linear(1024, flat), nn.ReLU())
            layers, prev = [], 512
            for c in (512, 512, 256, 128, 64, 32):
                layers += [nn.Upsample(scale_factor=2, mode="nearest"),
                           nn.Conv2d(prev, c, 3, 1, 1), nn.BatchNorm2d(c),
                           nn.ReLU()]
                prev = c
            layers += [nn.Upsample(scale_factor=2, mode="nearest"),
                       nn.Conv2d(prev, 1, 3, 1, 1), nn.Sigmoid()]
            self.dec_conv = nn.Sequential(*layers)

        def encode(self, x, m, t):
            h = torch.cat([self.enc_conv(x), m, t], dim=1)
            mu, logvar = self.enc_fc(h).chunk(2, dim=1)
            return torch.clamp(mu, -100, 100), torch.clamp(logvar, -10, 10)

        def morph(self, t):
            h = self.morph_predictor_shared(t)
            return self.morph_predictor_mu(h), torch.clamp(
                self.morph_predictor_logvar(h), -10, 10)

        def decode(self, m, z):
            h = self.dec_fc(torch.cat([m, z], dim=1)).view(-1, 512, *grid)
            return self.dec_conv(h)

    return VAE()


def latent_discriminator_port(variables: Dict, torch_state: Dict) -> Dict:
    """Port the reference LatentDiscriminator (net.0/2/4 Linears) into the
    flax LatentDiscriminator (Dense_0/1/2)."""
    P = {}
    for i, ti in enumerate((0, 2, 4)):
        P[f"Dense_{i}/kernel"] = (f"net.{ti}.weight", torch_linear_to_flax)
        P[f"Dense_{i}/bias"] = (f"net.{ti}.bias", lambda a: np.asarray(a))
    flat = flatten_params(variables["params"])
    ported, skipped = smart_port(flat, torch_state, P)
    assert not skipped, f"disc port skipped {skipped}"
    return {"params": unflatten_params(ported)}


# --------------------------------------------------------------------------
# torch reference train steps with injected eps
# --------------------------------------------------------------------------

def torch_mnist_step(vae, disc, opt_v, opt_d, x, m, t,
                     eps_d, eps_dec, eps_conf, cfg: MnistConfig):
    """One reference adversarial step (effective math of ref
    mnist_test/01_baseline_causal_vae/train.py:41-89) with eps as data."""
    import torch
    import torch.nn.functional as F

    t_idx = t.argmax(dim=1)
    # ---- phase 1: D on detached z ------------------------------------
    with torch.no_grad():
        mu, logvar = vae.encode(x, m, t)
        z = mu + eps_d * torch.exp(0.5 * logvar)
    opt_d.zero_grad()
    loss_d = F.cross_entropy(disc(z), t_idx)
    loss_d.backward()
    opt_d.step()
    # ---- phase 2: VAE against updated D ------------------------------
    opt_v.zero_grad()
    mu, logvar = vae.encode(x, m, t)
    z = mu + eps_dec * torch.exp(0.5 * logvar)
    m_hat = vae.morph_predictor(t)
    recon = vae.decode(m_hat, z)
    loss_recon = F.binary_cross_entropy(
        recon.reshape(-1, 784), x.reshape(-1, 784), reduction="sum")
    loss_kld = cfg.beta * (-0.5) * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
    loss_morph = F.mse_loss(m_hat, m, reduction="sum") * cfg.lambda_morph
    z_sample = mu + eps_conf * torch.exp(0.5 * logvar)
    logp = F.log_softmax(disc(z_sample), dim=1)
    target_u = torch.full_like(logp, 1.0 / cfg.t_dim)
    loss_adv = F.kl_div(logp, target_u, reduction="batchmean") * cfg.lambda_adv * 100
    loss = loss_recon + loss_kld + loss_morph + loss_adv
    loss.backward()
    opt_v.step()
    return {"loss": loss.item(), "recon": loss_recon.item(),
            "kld": loss_kld.item(), "morph": loss_morph.item(),
            "adv": loss_adv.item(), "d_loss": loss_d.item()}


def torch_vessel_step(vae, opt, x, m, t, eps, cfg: VesselConfig):
    """One reference vessel train step (ref train_kfold.py:50-83) with eps
    as data: weighted-MSE + 0.3*sparsity + beta*KLD + lambda_morph*NLL,
    grad-clip 5.0, Adam."""
    import torch
    import torch.nn.functional as F

    opt.zero_grad()
    mu, logvar = vae.encode(x, m, t)
    z = mu + eps * torch.exp(0.5 * logvar)
    m_mu, m_logvar = vae.morph(t)
    recon = vae.decode(m, z)  # decoder consumes REAL m (ref models.py:161)
    mse = F.mse_loss(recon, x, reduction="none")
    with torch.no_grad():
        pos_fraction = x.sum() / (x.numel() + 1e-6)
        pw = torch.clamp((1.0 - pos_fraction) / (pos_fraction + 1e-6), 1.0, 50.0)
    weight = 1.0 + (pw - 1.0) * x
    recon_loss = torch.sum(mse * weight)
    sparsity = torch.sum(torch.abs(recon) * (x < 0.1).float())
    kld = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
    morph = 0.5 * torch.sum(m_logvar + (m - m_mu) ** 2 / torch.exp(m_logvar))
    loss = recon_loss + cfg.beta * kld + cfg.lambda_morph * morph \
        + cfg.lambda_sparsity * sparsity
    loss.backward()
    torch.nn.utils.clip_grad_norm_(vae.parameters(), max_norm=cfg.grad_clip_norm)
    opt.step()
    return {"loss": loss.item(), "recon": recon_loss.item(), "kld": kld.item(),
            "morph": morph.item(), "sparsity": sparsity.item()}


# --------------------------------------------------------------------------
# jax parity steps (eps as data instead of RNG keys)
# --------------------------------------------------------------------------

def make_mnist_parity_step(vae_model: CausalConvVAE,
                           disc_model: LatentDiscriminator, cfg: MnistConfig):
    """The fused adversarial step of train/loop.py with injected eps."""

    def fwd(mdl, x, m, t, eps):
        mu, logvar = mdl.encode(x, m, t)
        z = mu + eps * jnp.exp(0.5 * logvar)
        m_hat = mdl.morph(t)
        return VAEOutput(mdl.decode(m_hat, z), m_hat, mu, logvar), z

    def step(vae_state: TrainState, d_state: TrainState, batch):
        x, m, t = batch["x"], batch["m"], batch["t"]
        t_idx = jnp.argmax(t, axis=1)

        mu, logvar = vae_model.apply(
            {"params": vae_state.params}, x, m, t, method=vae_model.encode)
        z_d = jax.lax.stop_gradient(
            mu + batch["eps_d"] * jnp.exp(0.5 * logvar))

        def d_loss_fn(d_params):
            logits = disc_model.apply({"params": d_params}, z_d)
            return L.discriminator_ce(logits, t_idx)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(d_grads)

        def vae_loss_fn(params):
            out, _ = vae_model.apply(
                {"params": params}, x, m, t, batch["eps_dec"], method=fwd)
            z_sample = out.mu + batch["eps_conf"] * jnp.exp(0.5 * out.logvar)
            d_logits_fake = disc_model.apply({"params": d_state.params}, z_sample)
            return L.mnist_vae_loss(
                out, x, m, d_logits_fake, beta=cfg.beta,
                lambda_adv=cfg.lambda_adv, lambda_morph=cfg.lambda_morph,
                t_dim=cfg.t_dim)

        (_, metrics), grads = jax.value_and_grad(vae_loss_fn, has_aux=True)(
            vae_state.params)
        vae_state = vae_state.apply_gradients(grads)
        metrics["d_loss"] = d_loss
        return vae_state, d_state, metrics

    return step


def make_vessel_parity_step(model: CausalVesselVAE, cfg: VesselConfig):
    """The vessel train step (loop.make_vae_step semantics) with injected eps."""

    def fwd(mdl, x, m, t, eps):
        mu, logvar = mdl.encode(x, m, t, train=True)
        z = mu + eps * jnp.exp(0.5 * logvar)
        m_mu, m_logvar = mdl.morph(t)
        recon = mdl.decode(m.astype(z.dtype), z, train=True)
        return VAEOutput(recon, m_mu, mu, logvar, m_mu, m_logvar)

    def step(state: TrainState, batch):
        def loss_inner(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch["m"], batch["t"], batch["eps"],
                method=fwd, mutable=["batch_stats"])
            total, metrics = L.vessel_loss(
                out, batch["x"], batch["m"], beta=cfg.beta,
                lambda_morph=cfg.lambda_morph,
                lambda_sparsity=cfg.lambda_sparsity)
            return total, (metrics, mutated["batch_stats"])

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_inner, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, metrics

    return step


# --------------------------------------------------------------------------
# trajectory runners
# --------------------------------------------------------------------------

def _delta_table(torch_steps: List[Dict], jax_steps: List[Dict]) -> Dict:
    rel = [abs(a["loss"] - b["loss"]) / max(abs(a["loss"]), 1e-9)
           for a, b in zip(torch_steps, jax_steps)]
    return {
        "n_steps": len(rel),
        "rel_delta_max": float(np.max(rel)),
        "rel_delta_median": float(np.median(rel)),
        "rel_delta_final": float(rel[-1]),
        "torch_loss_first_last": [torch_steps[0]["loss"], torch_steps[-1]["loss"]],
        "jax_loss_first_last": [jax_steps[0]["loss"], jax_steps[-1]["loss"]],
        "per_step_rel": [float(r) for r in rel],
    }


def run_mnist_parity(steps: int = 50, batch: int = 64, seed: int = 0,
                     matmul_precision: str = "highest") -> Dict:
    """Reference torch loop vs fused jitted step, ported common init,
    identical noise. Returns per-step loss tables + relative deltas."""
    import torch

    torch.manual_seed(seed)
    cfg = MnistConfig()
    rng = np.random.default_rng(seed)
    xs = (rng.random((steps, batch, 28, 28, 1)) > 0.65).astype(np.float32)
    xs *= rng.random((steps, batch, 28, 28, 1)).astype(np.float32)
    ms = rng.standard_normal((steps, batch, cfg.m_dim)).astype(np.float32)
    ts = np.eye(cfg.t_dim, dtype=np.float32)[
        rng.integers(0, cfg.t_dim, (steps, batch))]
    eps = {k: rng.standard_normal((steps, batch, cfg.z_dim)).astype(np.float32)
           for k in ("d", "dec", "conf")}

    tvae, tdisc = build_torch_mnist(cfg.m_dim, cfg.t_dim, cfg.z_dim, seed=seed)
    state_v = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    state_d = {k: v.detach().numpy() for k, v in tdisc.state_dict().items()}

    # ported common init
    fvae = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim)
    fdisc = LatentDiscriminator(t_dim=cfg.t_dim)
    key = jax.random.PRNGKey(0)
    fvars = fvae.init({"params": key}, jnp.zeros((1, 28, 28, 1)),
                      jnp.zeros((1, cfg.m_dim)), jnp.zeros((1, cfg.t_dim)),
                      rng=key)
    fvars, skipped = port_mnist_checkpoint(fvars, state_v)
    assert not skipped, f"vae port skipped {skipped}"
    dvars = latent_discriminator_port(
        {"params": fdisc.init(key, jnp.zeros((1, cfg.z_dim)))["params"]},
        state_d)

    # --- torch trajectory (reference loop) -----------------------------
    opt_v = torch.optim.Adam(tvae.parameters(), lr=cfg.lr)
    opt_d = torch.optim.Adam(tdisc.parameters(), lr=cfg.lr)
    tvae.train(), tdisc.train()
    torch_steps = []
    for i in range(steps):
        torch_steps.append(torch_mnist_step(
            tvae, tdisc, opt_v, opt_d,
            torch.from_numpy(xs[i].transpose(0, 3, 1, 2)),
            torch.from_numpy(ms[i]), torch.from_numpy(ts[i]),
            torch.from_numpy(eps["d"][i]), torch.from_numpy(eps["dec"][i]),
            torch.from_numpy(eps["conf"][i]), cfg))

    # --- jax trajectory (fused jitted step) -----------------------------
    with jax.default_matmul_precision(matmul_precision):
        step_fn = jax.jit(make_mnist_parity_step(fvae, fdisc, cfg))
        vae_state = TrainState.create(fvars, optax.adam(cfg.lr))
        d_state = TrainState.create(dvars, optax.adam(cfg.lr))
        jax_steps = []
        for i in range(steps):
            b = {"x": jnp.asarray(xs[i]), "m": jnp.asarray(ms[i]),
                 "t": jnp.asarray(ts[i]),
                 "eps_d": jnp.asarray(eps["d"][i]),
                 "eps_dec": jnp.asarray(eps["dec"][i]),
                 "eps_conf": jnp.asarray(eps["conf"][i])}
            vae_state, d_state, metrics = step_fn(vae_state, d_state, b)
            jax_steps.append({k: float(v) for k, v in metrics.items()})

    out = _delta_table(torch_steps, jax_steps)
    out.update({
        "workload": "mnist_adversarial_c1",
        "ref": "mnist_test/01_baseline_causal_vae/train.py:41-89",
        "batch": batch,
        "torch_steps": torch_steps,
        "jax_steps": jax_steps,
    })
    return out


def run_vessel_parity(steps: int = 30, batch: int = 4, hw=(128, 256),
                      seed: int = 0, z_dim: int = 16,
                      matmul_precision: str = "highest") -> Dict:
    """Reference vessel loss trajectory (ref train_kfold.py:20-83) at a small
    grid vs the framework's vessel step, ported common init, identical eps."""
    import torch

    torch.manual_seed(seed)
    cfg = VesselConfig()
    grid = (hw[0] // 128, hw[1] // 128)
    rng = np.random.default_rng(seed)
    xs = (rng.random((steps, batch, *hw, 1)) > 0.9).astype(np.float32)
    ms = rng.standard_normal((steps, batch, cfg.m_dim)).astype(np.float32)
    ts = np.eye(cfg.t_dim, dtype=np.float32)[
        rng.integers(0, cfg.t_dim, (steps, batch))]
    eps = rng.standard_normal((steps, batch, z_dim)).astype(np.float32)

    tvae = build_torch_vessel(cfg.m_dim, cfg.t_dim, z_dim, grid, seed=seed)
    state = {k: v.detach().numpy() for k, v in tvae.state_dict().items()
             if "num_batches_tracked" not in k}

    fvae = CausalVesselVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=z_dim,
                           grid_hw=grid)
    key = jax.random.PRNGKey(0)
    fvars = fvae.init({"params": key}, jnp.zeros((1, *hw, 1)),
                      jnp.zeros((1, cfg.m_dim)), jnp.zeros((1, cfg.t_dim)),
                      rng=key)
    fvars, skipped = port_vessel_cnn_checkpoint(fvars, state, grid_hw=grid)
    assert not skipped, f"vessel port skipped {skipped}"

    opt = torch.optim.Adam(tvae.parameters(), lr=cfg.lr)
    tvae.train()
    torch_steps = []
    for i in range(steps):
        torch_steps.append(torch_vessel_step(
            tvae, opt, torch.from_numpy(xs[i].transpose(0, 3, 1, 2)),
            torch.from_numpy(ms[i]), torch.from_numpy(ts[i]),
            torch.from_numpy(eps[i]), cfg))

    with jax.default_matmul_precision(matmul_precision):
        step_fn = jax.jit(make_vessel_parity_step(fvae, cfg))
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                         optax.adam(cfg.lr))
        st = TrainState.create(fvars, tx)
        jax_steps = []
        for i in range(steps):
            b = {"x": jnp.asarray(xs[i]), "m": jnp.asarray(ms[i]),
                 "t": jnp.asarray(ts[i]), "eps": jnp.asarray(eps[i])}
            st, metrics = step_fn(st, b)
            jax_steps.append({k: float(v) for k, v in metrics.items()})

    out = _delta_table(torch_steps, jax_steps)
    out.update({
        "workload": f"vessel_cnn_c7_{hw[0]}x{hw[1]}",
        "ref": "vessel_analysis/01_train/train_kfold.py:20-83",
        "batch": batch,
        "torch_steps": torch_steps,
        "jax_steps": jax_steps,
    })
    return out
