"""Optimizer-trajectory parity for the FLAGSHIP family (C9 CausalViTVAE).

train/parity.py proves C1 (MNIST adversarial) and C7 (vessel CNN)
trajectories against the torch reference loops; this module closes the last
gap the round-4 review identified: the flagship CausalViTVAE — the model
every headline number runs — trained end-to-end against the reference's own
vessel loop (ref vessel_analysis/01_train/train_kfold.py:20-83) THROUGH THE
FRAMEWORK'S REAL TRAINING PATH: phase-packed stem/decoder (ops/subpixel.py)
and the custom-VJP Pallas flash attention (ops/kernels/attention.py) when run
on TPU. A backward-pass bug anywhere in that path shows up here as a
trajectory divergence.

torch side: ViTVAE backbone + causal adapters constructed exactly as the
reference does (ref vessel_analysis/00_core/vit_backbone.py:50-199 — note the
vessel decoder has THREE ResBlock stages, models.py:181-307 for the adapters,
morph heads and clamps), at a parameterized small config. This is the torch
half of the parity fixture, so the architecture spec must match the reference
bit-for-bit; the framework's own implementation lives in models/vit.py.

Determinism: reparameterization eps is precomputed and fed as data on both
sides; dropout (attention-probability, MLP, positional) is DISABLED on both
sides (rate 0.0) — the two frameworks cannot draw identical dropout masks, so
the parity fixture runs the deterministic graph; dropout itself is
mask-parity-tested separately (tests/test_kernels.py). Both sides f32; jax
under default_matmul_precision('highest'); BatchNorm (2d in stem/decoder, 1d
in the adapters) runs in training mode on both sides with matching
momentum/eps.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from causalvae_tpu.config import VesselConfig
from causalvae_tpu.models.vae import VAEOutput
from causalvae_tpu.models.vit import CausalViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.train.parity import _delta_table, torch_vessel_step
from causalvae_tpu.train.port_maps import port_vitvae_checkpoint
from causalvae_tpu.train.state import TrainState


def build_torch_causal_vit(img_size=(64, 96), m_dim=12, t_dim=19, z_dim=128,
                           vit_latent=512, embed_dim=256, depth=2, heads=8,
                           mlp_dim=512, dropout=0.0, seed=0):
    """Reference CausalViTVAE: backbone (ref vit_backbone.py:50-156, vessel
    variant — 3 decoder ResBlocks) + adapters/morph heads/clamps (ref
    models.py:181-307), torch-seeded. encode/morph/decode expose the pieces
    torch_vessel_step consumes (the reference's forward, ref :259-307)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    gh, gw = img_size[0] // 32, img_size[1] // 32

    class Res(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c))

        def forward(self, x):
            return x + self.conv(x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(embed_dim)
            self.attn = nn.MultiheadAttention(embed_dim, heads,
                                              dropout=dropout, batch_first=True)
            self.norm2 = nn.LayerNorm(embed_dim)
            self.mlp = nn.Sequential(
                nn.Linear(embed_dim, mlp_dim), nn.GELU(), nn.Dropout(dropout),
                nn.Linear(mlp_dim, embed_dim), nn.Dropout(dropout))

        def forward(self, x):
            qkv = self.norm1(x)
            x = x + self.attn(qkv, qkv, qkv)[0]
            return x + self.mlp(self.norm2(x))

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            stem, prev = [], 1
            for c in (32, 64, 128, embed_dim, embed_dim):
                stem += [nn.Conv2d(prev, c, 3, 2, 1), nn.BatchNorm2d(c),
                         nn.LeakyReLU()]
                prev = c
            self.stem = nn.Sequential(*stem)
            self.pos_embedding = nn.Parameter(
                torch.randn(1, gh * gw + 1, embed_dim))
            self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim))
            self.dropout = nn.Dropout(dropout)
            self.transformer = nn.Sequential(*[Block() for _ in range(depth)])
            self.to_latent = nn.LayerNorm(embed_dim)
            self.fc_mu = nn.Linear(embed_dim, vit_latent)
            self.fc_var = nn.Linear(embed_dim, vit_latent)
            self.decoder_input = nn.Linear(vit_latent, embed_dim * gh * gw)
            dec, prev = [], embed_dim
            # vessel decoder: ResBlock after the first THREE stages only
            # (ref vit_backbone.py:124-156)
            for i, c in enumerate((128, 64, 32, 16, 16)):
                dec += [nn.ConvTranspose2d(prev, c, 3, 2, 1, 1),
                        nn.BatchNorm2d(c), nn.LeakyReLU()]
                if i < 3:
                    dec.append(Res(c))
                prev = c
            dec.append(nn.Conv2d(16, 1, 3, 1, 1))  # no sigmoid (ref :154-155)
            self.decoder = nn.Sequential(*dec)

        def cls(self, x):
            h = self.stem(x)
            b, c, hh, ww = h.shape
            h = h.flatten(2).transpose(1, 2)
            h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
            h = self.dropout(h + self.pos_embedding[:, : hh * ww + 1])
            return self.to_latent(self.transformer(h)[:, 0])

        def decode(self, z):
            h = self.decoder_input(z).view(-1, embed_dim, gh, gw)
            return self.decoder(h)

    class CausalViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.enc_adapter = nn.Sequential(
                nn.Linear(embed_dim + m_dim + t_dim, 512), nn.BatchNorm1d(512),
                nn.LeakyReLU(0.2), nn.Linear(512, 2 * z_dim))
            self.dec_adapter = nn.Sequential(
                nn.Linear(z_dim + m_dim, 256), nn.BatchNorm1d(256),
                nn.LeakyReLU(0.2), nn.Linear(256, vit_latent))
            self.morph_predictor_shared = nn.Sequential(
                nn.Linear(t_dim, 64), nn.LeakyReLU(0.2),
                nn.Linear(64, 64), nn.LeakyReLU(0.2))
            self.morph_predictor_mu = nn.Linear(64, m_dim)
            self.morph_predictor_logvar = nn.Linear(64, m_dim)

        def encode(self, x, m, t):
            h = torch.cat([self.backbone.cls(x), m, t], dim=1)
            mu, logvar = self.enc_adapter(h).chunk(2, dim=1)
            return torch.clamp(mu, -100, 100), torch.clamp(logvar, -10, 10)

        def morph(self, t):
            h = self.morph_predictor_shared(t)
            return self.morph_predictor_mu(h), torch.clamp(
                self.morph_predictor_logvar(h), -10, 10)

        def decode(self, m, z):
            return self.backbone.decode(self.dec_adapter(
                torch.cat([m, z], dim=1)))

    return CausalViT()


def make_vit_parity_step(model: CausalViTVAE, cfg: VesselConfig):
    """The framework's vessel train step (loop.make_vae_step semantics, the
    same fused step bench.py measures) with injected reparam eps."""

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


def run_vit_parity(steps: int = 8, batch: int = 4, hw: Tuple[int, int] = (64, 96),
                   depth: int = 2, seed: int = 0, z_dim: int = 128,
                   packed: bool = True,
                   matmul_precision: str = "highest") -> Dict:
    """Reference CausalViTVAE trajectory (torch, ref train_kfold.py:20-83
    loss/clip/Adam) vs the framework's jitted step through the packed +
    Pallas-attention path, ported common init, identical eps.

    The small config keeps the torch CPU side tractable (depth-2 transformer,
    64x96 image — the dryrun shape class) at the reference's FULL widths
    (embed 256, heads 8, mlp 512, vit-latent 512, z 128), so every kernel
    family of the flagship runs with production channel counts."""
    import torch

    torch.manual_seed(seed)
    cfg = VesselConfig()
    rng = np.random.default_rng(seed)
    xs = (rng.random((steps, batch, *hw, 1)) > 0.9).astype(np.float32)
    ms = rng.standard_normal((steps, batch, cfg.m_dim)).astype(np.float32)
    ts = np.eye(cfg.t_dim, dtype=np.float32)[
        rng.integers(0, cfg.t_dim, (steps, batch))]
    eps = rng.standard_normal((steps, batch, z_dim)).astype(np.float32)

    tvae = build_torch_causal_vit(img_size=hw, m_dim=cfg.m_dim,
                                  t_dim=cfg.t_dim, z_dim=z_dim, depth=depth,
                                  dropout=0.0, seed=seed)
    state = {k: v.detach().numpy() for k, v in tvae.state_dict().items()
             if "num_batches_tracked" not in k}

    fvae = CausalViTVAE(img_size=hw, m_dim=cfg.m_dim, t_dim=cfg.t_dim,
                        z_dim=z_dim, depth=depth, dropout=0.0, packed=packed)
    key = jax.random.PRNGKey(0)
    fvars = fvae.init({"params": key, "dropout": key},
                      jnp.zeros((1, *hw, 1)), jnp.zeros((1, cfg.m_dim)),
                      jnp.zeros((1, cfg.t_dim)), rng=key, train=False)
    fvars, skipped = port_vitvae_checkpoint(
        fvars, state, causal=True, depth=depth,
        grid_hw=(hw[0] // 32, hw[1] // 32))
    # the backbone latent heads are bypassed by the causal wrapper on both
    # sides (ref models.py:281-302) — their weights legitimately have no home
    skipped = [s for s in skipped if "fc_mu" not in s[0] and "fc_var" not in s[0]]
    assert not skipped, f"vit port skipped {skipped}"

    # --- torch trajectory (the reference's own loop) ---------------------
    opt = torch.optim.Adam(tvae.parameters(), lr=cfg.lr)
    tvae.train()
    torch_steps = []
    for i in range(steps):
        torch_steps.append(torch_vessel_step(
            tvae, opt, torch.from_numpy(xs[i].transpose(0, 3, 1, 2)),
            torch.from_numpy(ms[i]), torch.from_numpy(ts[i]),
            torch.from_numpy(eps[i]), cfg))

    # --- framework trajectory (packed + Pallas attention on TPU) ---------
    with jax.default_matmul_precision(matmul_precision):
        step_fn = jax.jit(make_vit_parity_step(fvae, cfg))
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
        "workload": f"causal_vit_vae_c9_{hw[0]}x{hw[1]}_depth{depth}"
                    f"{'_packed' if packed else ''}",
        "ref": "vessel_analysis/00_core/models.py:181-307 + "
               "vit_backbone.py:50-199, loss train_kfold.py:20-83",
        "batch": batch,
        "torch_steps": torch_steps,
        "jax_steps": jax_steps,
    })
    return out
