"""Hybrid conv-stem ViT VAE backbone and its causal adapter wrapper.

ViTVAE (C8, ref vessel_analysis/00_core/vit_backbone.py:50-199 and the 384x640
variant latent_translator/models.py:40-126) and CausalViTVAE (C9, ref
vessel_analysis/00_core/models.py:181-307). Attention runs through a fused
Pallas flash-attention kernel on TPU (ops/kernels/attention.py) with an XLA
fallback; sequence length is grid_h*grid_w + 1 CLS token (961 at 768x1280)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from causalvae_tpu.models.mechanism import MorphPredictor
from causalvae_tpu.models.vae import VAEOutput, batch_norm, conv, conv_t, reparameterize


class ResBlock(nn.Module):
    """conv3-BN-LeakyReLU(0.2)-conv3-BN with identity skip (ref vit_backbone.py:7-19).

    ``levels`` > 0 runs the block on a phase-packed tensor (input/output
    packed ``levels`` times, channels x4 per level) with the SAME parameters
    — convs apply lift_once-transformed kernels, BN folds stats per real
    channel (ops/subpixel.py)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, levels: int = 0,
                 prologue=None, fused: bool = False):
        """``prologue``: (mul, add, slope) affine of a PRECEDING BatchNorm +
        LeakyReLU, folded into Conv_0's input read AND recomputed elementwise
        at the skip (the block's residual input is the normalized tensor).
        ``fused`` folds the internal BatchNorm_0 + LeakyReLU(0.2) into
        Conv_1 the same way (ops/kernels/stage.py)."""
        from causalvae_tpu.ops.subpixel import PhaseableConv3x3

        g = 4 ** levels
        h = PhaseableConv3x3(self.channels, dtype=self.dtype,
                             name="Conv_0")(x, levels=levels, prologue=prologue)
        if fused:
            mul0, add0 = batch_norm(dtype=self.dtype, name="BatchNorm_0")(
                h, use_running_average=not train, groups=g, emit_affine=True)
            h = PhaseableConv3x3(self.channels, dtype=self.dtype,
                                 name="Conv_1")(
                h, levels=levels,
                prologue=(jnp.tile(mul0, g), jnp.tile(add0, g), 0.2))
        else:
            h = batch_norm(dtype=self.dtype, name="BatchNorm_0")(
                h, use_running_average=not train, groups=g)
            h = nn.leaky_relu(h, 0.2)
            h = PhaseableConv3x3(self.channels, dtype=self.dtype,
                                 name="Conv_1")(h, levels=levels)
        h = batch_norm(dtype=self.dtype, name="BatchNorm_1")(
            h, use_running_average=not train, groups=g)
        if prologue is not None:
            mul, add, slope = prologue
            pre = x.astype(jnp.float32) * mul + add
            x = jnp.where(pre >= 0.0, pre, slope * pre).astype(h.dtype)
        return x + h


class MultiHeadAttention(nn.Module):
    """MHA over the token sequence, via the fused Pallas flash-attention
    kernel on TPU (ops/kernels/attention.py) for BOTH training and inference:
    attention-probability dropout (ref vit_backbone.py:30, torch
    nn.MultiheadAttention(dropout=0.1)) runs inside the kernel with a
    counter-based mask, so the (N, N) probability matrix never reaches HBM
    on the training hot path either."""

    dim: int
    heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from causalvae_tpu.ops.kernels.attention import flash_attention

        b, n, _ = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.DenseGeneral(
            (3, self.heads, head_dim), axis=-1, dtype=self.dtype, name="qkv"
        )(x)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]  # (B,H,N,D)
        if train and self.dropout > 0.0:
            seed = jax.random.bits(self.make_rng("dropout"), (), jnp.uint32)
            out = flash_attention(
                q, k, v, dropout_rate=self.dropout, dropout_seed=seed
            )
        else:
            out = flash_attention(q, k, v)
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer encoder block (ref vit_backbone.py:22-47)."""

    dim: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        qkv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        attn = MultiHeadAttention(
            self.dim, self.heads, self.dropout, dtype=self.dtype, name="attn"
        )(qkv, train=train)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class ViTVAE(nn.Module):
    """Hybrid ViT VAE: conv stem (/32) -> transformer -> CLS latent; CNN
    decoder with ResBlocks; no output sigmoid (ref vit_backbone.py:155)."""

    img_size: Tuple[int, int] = (768, 1280)
    in_channels: int = 1
    latent_dim: int = 512
    embed_dim: int = 256
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 512
    dropout: float = 0.1
    # Decoder ConvTranspose stages followed by a ResBlock. The two reference
    # variants differ here: the vessel backbone (the C8/C9 flagship family)
    # has a ResBlock after the first THREE stages only (ref
    # vessel_analysis/00_core/vit_backbone.py:124-156), the latent-translator
    # variant after the first four (ref latent_translator/models.py:86-93).
    dec_res_stages: int = 3
    dtype: jnp.dtype = jnp.float32
    # phase-packed execution (ops/subpixel.py): the stem consumes a
    # space-to-depth-packed input and the decoder stays on coarse grids with
    # dense (>=128) channel counts — identical parameters and math to the
    # spatial formulation (equivalence-tested), laid out for the TPU's
    # (8, 128) tiling. packed=False runs the reference spatial formulation.
    packed: bool = True
    # packed_io=True moves the boundary transforms OUT of the step: __call__
    # consumes x already space_to_depth_n(x, 3)-packed (B, H/8, W/8, 64) and
    # returns the reconstruction in the same packed layout (the production
    # input pipeline packs on host — a free numpy reshape). The training
    # losses are pixel-permutation-invariant, so loss values/grads are
    # identical; measured ~14 ms/step of 1-channel layout copies saved.
    packed_io: bool = False
    # remat_blocks=True checkpoints each transformer block (jax.checkpoint):
    # the backward recomputes block internals instead of holding them, cutting
    # live activation memory for memory-constrained configs (bigger batches /
    # resolutions / deeper stacks). At the 768x1280 batch-8 production shape it
    # is OFF: the step is HBM-bandwidth-bound and measured slower with remat
    # (the ViT-block residuals it avoids are a small slice of step bytes).
    remat_blocks: bool = False
    # fused_stages folds each decoder BatchNorm-apply + LeakyReLU into the
    # consuming convolution (ops/kernels/stage.py). None = auto: currently
    # OFF — measured END-TO-END SLOWER at the 768x1280 b8 flagship (53.1 ms
    # all-gated / 51.9 ms microbench-winners-only vs 46.2 ms pure-XLA,
    # scripts/stage_fused_check.py + stage_winners_probe.py): in-graph XLA
    # already fuses the normalize+activation into neighboring ops and
    # schedules the convolutions better than the isolated-op microbenchmarks
    # (scripts/stage_shape_probe.py) suggested. The kernels remain available
    # (equivalence-tested, VMEM-budget-gated so opting in cannot OOM) for
    # elementwise-bound shape regimes via fused_stages=True.
    fused_stages: Optional[bool] = None

    def _fused(self) -> bool:
        if self.fused_stages is not None:
            return self.fused_stages
        return False

    @property
    def grid_hw(self):
        return self.img_size[0] // 32, self.img_size[1] // 32

    def setup(self):
        from causalvae_tpu.ops.subpixel import LiftableStemConv

        d = self.dtype
        gh, gw = self.grid_hw
        stem_ch = (32, 64, 128, self.embed_dim, self.embed_dim)
        self.stem_convs = [LiftableStemConv(c, dtype=d) for c in stem_ch]
        self.stem_bns = [batch_norm(dtype=d) for _ in stem_ch]
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, gh * gw + 1, self.embed_dim)
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.embed_dim)
        )
        block_cls = (nn.remat(ViTBlock, static_argnums=(2,))
                     if self.remat_blocks else ViTBlock)
        self.blocks = [
            block_cls(self.embed_dim, self.heads, self.mlp_dim, self.dropout, dtype=d)
            for _ in range(self.depth)
        ]
        self.to_latent = nn.LayerNorm(epsilon=1e-5, dtype=d)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=d)
        self.fc_var = nn.Dense(self.latent_dim, dtype=d)
        self.decoder_input = nn.Dense(self.embed_dim * gh * gw, dtype=d)
        self.dec_ct = [conv_t(c, 3, 2, 1, output_padding=1, dtype=d) for c in (128, 64, 32, 16, 16)]
        self.dec_bns = [batch_norm(dtype=d) for _ in range(5)]
        self.dec_res = [ResBlock(c, dtype=d)
                        for c in (128, 64, 32, 16)[: self.dec_res_stages]]
        from causalvae_tpu.ops.subpixel import PhaseableConv3x3

        self.dec_out = PhaseableConv3x3(self.in_channels, dtype=d)
        self.pos_dropout = nn.Dropout(self.dropout)

    def tokens(self, x, train: bool = False):
        """Stem + CLS + positional embedding + transformer -> (B, N+1, E)."""
        from causalvae_tpu.ops.subpixel import space_to_depth_2x

        h = x
        if self.packed:
            # image packed 3x; each stride-2 conv consumes one level, so the
            # stem runs at (H/8, W/8) with channels 64 -> 512 -> 256 -> 128
            if not self.packed_io:  # packed_io: x arrives pre-packed
                for _ in range(3):
                    h = space_to_depth_2x(h)
            fused = self._fused()
            in_lv = (3, 2, 1, 0, 0)
            pro = None
            for i, (cv, bn) in enumerate(zip(self.stem_convs, self.stem_bns)):
                h = cv(h, in_levels=in_lv[i], prologue=pro)
                g = 4 ** max(in_lv[i] - 1, 0)
                if fused and i + 1 < len(self.stem_convs) and in_lv[i + 1] > 0:
                    # emit the BN affine and fold it (+ LeakyReLU) into the
                    # NEXT lifted conv's input read (ops/kernels/stage.py);
                    # the stride-2 spatial convs (in_levels 0) keep the
                    # classic composition.
                    mul, add = bn(h, use_running_average=not train, groups=g,
                                  emit_affine=True)
                    pro = (jnp.tile(mul, g), jnp.tile(add, g), 0.01)
                else:
                    h = bn(h, use_running_average=not train, groups=g)
                    h = nn.leaky_relu(h, 0.01)
                    pro = None
        else:
            for cv, bn in zip(self.stem_convs, self.stem_bns):
                h = bn(cv(h), use_running_average=not train)
                h = nn.leaky_relu(h, 0.01)  # torch nn.LeakyReLU() default slope
        b, gh, gw, c = h.shape
        h = h.reshape(b, gh * gw, c)
        cls = jnp.broadcast_to(self.cls_token.astype(h.dtype), (b, 1, c))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + self.pos_embedding[:, : h.shape[1]].astype(h.dtype)
        h = self.pos_dropout(h, deterministic=not train)
        for blk in self.blocks:
            h = blk(h, train)  # positional: remat marks arg 2 (train) static
        return h

    def encode(self, x, train: bool = False):
        h = self.tokens(x, train=train)
        cls_out = self.to_latent(h[:, 0])
        return self.fc_mu(cls_out), self.fc_var(cls_out)

    def encode_cls(self, x, train: bool = False):
        """CLS representation before the latent heads (used by the causal
        adapter, ref models.py:263-278)."""
        h = self.tokens(x, train=train)
        return self.to_latent(h[:, 0])

    def decode(self, z, train: bool = False):
        gh, gw = self.grid_hw
        h = self.decoder_input(z)
        h = h.reshape(-1, gh, gw, self.embed_dim)
        if not self.packed:
            for i, ct in enumerate(self.dec_ct):
                h = self.dec_bns[i](ct(h), use_running_average=not train)
                h = nn.leaky_relu(h, 0.01)
                if i < len(self.dec_res):
                    h = self.dec_res[i](h, train=train)
            return self.dec_out(h)
        # Phase-packed decoder (ops/subpixel.py): every activation keeps >= 64
        # dense channels — the narrow-channel full-resolution tensors of the
        # spatial formulation (8x lane-padded under the TPU's (8, 128) tiling,
        # with C=16/C=1 convolutions starving the MXU) never materialize.
        # Identical parameters and math (equivalence-tested).
        #
        # Packing LEVEL per stage is the minimum that keeps channels >= 128
        # (lane-dense): a lifted conv carries 4^L-inflated structurally-zero
        # MXU work (a level-2 lifted 3x3 ResBlock conv costs 145 GF/pass vs
        # 36 GF at level 1 for the same 9 GF of useful math), so dec_res_2
        # runs at level 1 on the finer grid (the d2s that followed it moved
        # before it — free, C stays 128). Pushing the LAST stages
        # (dec_res_3/dec_ct_4/dec_out) down a level too was measured and
        # REVERTED: it halves XLA flops (4.41 -> 2.23 TF) but the C=64/C=16
        # tensors' lane padding and extra copies grow bytes 28.6 -> 35.2 GB
        # and the step gets slightly slower — at these shapes the step is
        # HBM-bound, so those stages keep the byte-optimal level-2/3 forms.
        from causalvae_tpu.ops.subpixel import depth_to_space_2x

        def bn_act(i, h, groups):
            h = self.dec_bns[i](h, use_running_average=not train, groups=groups)
            return nn.leaky_relu(h, 0.01)

        fused = self._fused()

        def bn_affine(i, h, groups, tiles):
            """(mul, add) of BN_i tiled to the CONSUMER's packed width —
            the affine is per REAL channel, so it commutes with the d2s
            between stage 2's BN and dec_res_2."""
            mul, add = self.dec_bns[i](h, use_running_average=not train,
                                       groups=groups, emit_affine=True)
            return jnp.tile(mul, tiles), jnp.tile(add, tiles), 0.01

        h = self.dec_ct[0](h, use_pallas=fused)            # (2gh, 2gw, 128)
        if fused:
            h = self.dec_res[0](h, train=train,
                                prologue=bn_affine(0, h, 1, 1), fused=True)
            h = self.dec_ct[1](h, phase_output=True,
                               use_pallas=True)            # L1: (2gh, 2gw, 256)
            h = self.dec_res[1](h, train=train, levels=1,
                                prologue=bn_affine(1, h, 4, 4), fused=True)
            h = self.dec_ct[2](h, phase_output=True, in_levels=1,
                               use_pallas=True)            # L2: 512
            pro2 = bn_affine(2, h, 16, 4)                  # post-d2s width 128
            h = depth_to_space_2x(h)                       # L1: (4gh, 4gw, 128)
            h = self.dec_res[2](h, train=train, levels=1,
                                prologue=pro2, fused=True)
            h = self.dec_ct[3](h, phase_output=True, in_levels=1,
                               use_pallas=True)            # L2: 256
            if len(self.dec_res) > 3:  # translator variant (4 ResBlocks)
                h = self.dec_res[3](h, train=train, levels=2,
                                    prologue=bn_affine(3, h, 16, 16), fused=True)
            else:
                h = bn_act(3, h, 16)
            h = self.dec_ct[4](h, phase_output=True, in_levels=2,
                               use_pallas=True)            # L3: 1024
            mul4, add4, slope4 = bn_affine(4, h, 64, 64)
            o = self.dec_out(h, levels=3,
                             prologue=(mul4, add4, slope4))  # (4gh, 4gw, 64)
        else:
            h = bn_act(0, h, 1)
            h = self.dec_res[0](h, train=train)
            h = self.dec_ct[1](h, phase_output=True)       # L1: (2gh, 2gw, 256)
            h = bn_act(1, h, 4)
            h = self.dec_res[1](h, train=train, levels=1)
            h = self.dec_ct[2](h, phase_output=True, in_levels=1)  # L2: 512
            h = bn_act(2, h, 16)
            h = depth_to_space_2x(h)                       # L1: (4gh, 4gw, 128)
            h = self.dec_res[2](h, train=train, levels=1)
            h = self.dec_ct[3](h, phase_output=True, in_levels=1)  # L2: 256
            h = bn_act(3, h, 16)
            if len(self.dec_res) > 3:  # translator variant (4 ResBlocks)
                h = self.dec_res[3](h, train=train, levels=2)
            h = self.dec_ct[4](h, phase_output=True, in_levels=2)  # L3: 1024
            h = bn_act(4, h, 64)
            o = self.dec_out(h, levels=3)                  # (4gh, 4gw, 64)
        if self.packed_io:
            return o  # space_to_depth_n(recon, 3) layout
        for _ in range(3):
            o = depth_to_space_2x(o)
        return o                                           # (32gh, 32gw, 1)

    def __call__(self, x, *, rng: jax.Array, train: bool = False):
        mu, logvar = self.encode(x, train=train)
        z = reparameterize(rng, mu, logvar)
        recon = self.decode(z, train=train)
        return recon, x, mu, logvar


class CausalViTVAE(nn.Module):
    """Causal adapter around a (pretrained) ViTVAE backbone (C9, ref
    vessel_analysis/00_core/models.py:181-307): CLS + (M, T) -> enc_adapter ->
    our Z; (M, Z) -> dec_adapter -> backbone latent -> backbone.decode.
    Decoder consumes the REAL M during training (ref :299)."""

    img_size: Tuple[int, int] = (768, 1280)
    m_dim: int = 12
    t_dim: int = 19
    z_dim: int = 128
    vit_latent_dim: int = 512
    embed_dim: int = 256
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 512
    dropout: float = 0.1
    dec_res_stages: int = 3  # see ViTVAE.dec_res_stages (vessel variant)
    dtype: jnp.dtype = jnp.float32
    packed: bool = True
    packed_io: bool = False  # see ViTVAE.packed_io
    remat_blocks: bool = False  # see ViTVAE.remat_blocks
    fused_stages: Optional[bool] = None  # see ViTVAE.fused_stages

    def setup(self):
        d = self.dtype
        self.backbone = ViTVAE(
            img_size=self.img_size,
            latent_dim=self.vit_latent_dim,
            embed_dim=self.embed_dim,
            depth=self.depth,
            heads=self.heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            dec_res_stages=self.dec_res_stages,
            dtype=d,
            packed=self.packed,
            packed_io=self.packed_io,
            remat_blocks=self.remat_blocks,
            fused_stages=self.fused_stages,
        )
        self.enc_adapter_fc1 = nn.Dense(512, dtype=d)
        self.enc_adapter_bn = batch_norm(dtype=d)
        self.enc_adapter_fc2 = nn.Dense(2 * self.z_dim, dtype=d)
        self.dec_adapter_fc1 = nn.Dense(256, dtype=d)
        self.dec_adapter_bn = batch_norm(dtype=d)
        self.dec_adapter_fc2 = nn.Dense(self.vit_latent_dim, dtype=d)
        self.morph = MorphPredictor(
            m_dim=self.m_dim, hidden=(64, 64), gaussian=True,
            activation="leaky_relu", logvar_clip=10.0, dtype=d,
        )

    def encode(self, x, m, t, train: bool = False):
        cls_out = self.backbone.encode_cls(x, train=train)
        h = jnp.concatenate([cls_out, m.astype(cls_out.dtype), t.astype(cls_out.dtype)], axis=1)
        h = self.enc_adapter_fc1(h)
        h = self.enc_adapter_bn(h, use_running_average=not train)
        h = nn.leaky_relu(h, 0.2)
        mu, logvar = jnp.split(self.enc_adapter_fc2(h), 2, axis=1)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        mu = jnp.clip(mu, -100.0, 100.0)
        return mu, logvar

    def decode(self, m, z, train: bool = False):
        h = jnp.concatenate([m.astype(z.dtype), z], axis=1)
        h = self.dec_adapter_fc1(h)
        h = self.dec_adapter_bn(h, use_running_average=not train)
        h = nn.leaky_relu(h, 0.2)
        z_vit = self.dec_adapter_fc2(h)
        return self.backbone.decode(z_vit, train=train)

    def predict_m(self, t):
        return self.morph.mean(t)

    def __call__(self, x, m, t, *, rng: jax.Array, train: bool = False) -> VAEOutput:
        mu, logvar = self.encode(x, m, t, train)
        z = reparameterize(rng, mu, logvar)
        m_mu, m_logvar = self.morph(t)
        recon = self.decode(m, z, train)
        return VAEOutput(recon, m_mu, mu, logvar, m_mu, m_logvar)
