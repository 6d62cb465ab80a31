"""The causal-VAE model family (flax, NHWC, TPU-first).

All convolutions use explicit torch-equivalent paddings so checkpoints ported
from the reference stay spatially aligned (see train/port.py). Images are NHWC
(TPU-native layout); ports from the reference's NCHW handle the permutation.

Models (SURVEY.md §2.1):
  CausalConvVAE   — C1 (ref mnist_test/01_baseline_causal_vae/models.py:6-72)
                    and its Bayesian variant C4 (ref mnist_test/06_model_experiment/
                    models.py:6-85) via gaussian_mechanism / decode_real_m flags
  ConditionalVAE  — C5 (ref mnist_test/03_measurement_approach/cvae_models.py:7-85)
  MDecoder        — C6 probes (ref mnist_test/06_model_experiment/
                    verify_independence.py:14-55)
  CausalVesselVAE — C7 (ref vessel_analysis/00_core/models.py:9-166)
  CausalBioVAE    — C10 (ref causal_cascade/models.py:5-89)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from causalvae_tpu.models.mechanism import MorphPredictor


class VAEOutput(NamedTuple):
    """Forward result; m_mu/m_logvar are None for deterministic mechanisms."""

    recon_x: jnp.ndarray
    m_hat: jnp.ndarray
    mu: jnp.ndarray
    logvar: jnp.ndarray
    m_mu: Optional[jnp.ndarray] = None
    m_logvar: Optional[jnp.ndarray] = None


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 * logvar)  (ref models.py:50-53)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * std


def _pad(p: int):
    return ((p, p), (p, p))


def conv(features, k, s, p, name=None, dtype=jnp.float32):
    """torch Conv2d(k, s, p) equivalent (explicit symmetric padding)."""
    return nn.Conv(
        features, (k, k), strides=(s, s), padding=_pad(p), name=name, dtype=dtype
    )


def conv_t(features, k, s, p, output_padding=0, name=None, dtype=jnp.float32):
    """torch ConvTranspose2d(k, s, p, output_padding) equivalent.

    lax.conv_transpose pads the dilated input, so the torch-aligned pads are
    (k-1-p, k-1-p+output_padding); transpose_kernel=True applies the
    flipped-kernel/swapped-channels convention torch uses, keeping ported
    reference checkpoints spatially exact.

    The (k=3, s=2, p=1, op=1) upsampler — the flagship ViT decoder's stage op
    — lowers through the phase-decomposed subpixel form instead of XLA's
    input-dilated convolution (same params/math; see ops/subpixel.py for why
    this matters on TPU)."""
    if (k, s, p, output_padding) == (3, 2, 1, 1):
        from causalvae_tpu.ops.subpixel import SubpixelConvTranspose2x

        return SubpixelConvTranspose2x(features, name=name, dtype=dtype)
    lo = k - 1 - p
    return nn.ConvTranspose(
        features,
        (k, k),
        strides=(s, s),
        padding=((lo, lo + output_padding), (lo, lo + output_padding)),
        transpose_kernel=True,
        name=name,
        dtype=dtype,
    )


def batch_norm(name=None, dtype=jnp.float32):
    """torch BatchNorm (momentum 0.1, eps 1e-5) equivalent; pass
    use_running_average=not train at call time.

    Backed by FusedBatchNorm: identical math/params to nn.BatchNorm, but
    train-mode reductions for NHWC tensors with C < 128 run lane-dense
    through a Pallas kernel on TPU (ops/kernels/batchnorm.py)."""
    from causalvae_tpu.ops.kernels.batchnorm import FusedBatchNorm

    return FusedBatchNorm(momentum=0.9, epsilon=1e-5, name=name, dtype=dtype)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class CausalConvVAE(nn.Module):
    """MNIST causal VAE: (X, M, T) -> Z; T -> M'; (M', Z) -> X.

    gaussian_mechanism=False, decode_real_m=False reproduces C1
    (ref mnist_test/01 models.py:6-72: decoder consumes the *predicted* M');
    gaussian_mechanism=True, decode_real_m=True reproduces C4
    (ref mnist_test/06 models.py:62-85: Gaussian P(M|T), decoder consumes the
    *real* M so it learns P(X|M,Z) independent of predictor error).
    """

    m_dim: int = 12
    t_dim: int = 10
    z_dim: int = 10
    gaussian_mechanism: bool = False
    decode_real_m: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.dtype
        self.enc_conv1 = conv(32, 4, 2, 1, dtype=d)
        self.enc_conv2 = conv(64, 4, 2, 1, dtype=d)
        self.enc_fc1 = nn.Dense(512, dtype=d)
        self.enc_fc2 = nn.Dense(2 * self.z_dim, dtype=d)
        self.morph = MorphPredictor(
            m_dim=self.m_dim,
            hidden=(128,),
            gaussian=self.gaussian_mechanism,
            logvar_clip=None,
            dtype=d,
        )
        self.dec_fc = nn.Dense(64 * 7 * 7, dtype=d)
        self.dec_conv1 = conv_t(32, 4, 2, 1, dtype=d)
        self.dec_conv2 = conv_t(1, 4, 2, 1, dtype=d)

    def encode(self, x, m, t):
        h = nn.relu(self.enc_conv1(x))
        h = nn.relu(self.enc_conv2(h))
        h = h.reshape(h.shape[0], -1)
        h = jnp.concatenate([h, m.astype(h.dtype), t.astype(h.dtype)], axis=1)
        h = nn.relu(self.enc_fc1(h))
        mu, logvar = jnp.split(self.enc_fc2(h), 2, axis=1)
        return mu, logvar

    def decode(self, m, z):
        h = nn.relu(self.dec_fc(jnp.concatenate([m, z], axis=1)))
        h = h.reshape(-1, 7, 7, 64)
        h = nn.relu(self.dec_conv1(h))
        return nn.sigmoid(self.dec_conv2(h))

    def predict_m(self, t):
        """Mechanism mean (helper, ref 06 models.py:52-55)."""
        return self.morph.mean(t)

    def __call__(self, x, m, t, *, rng: jax.Array) -> VAEOutput:
        mu, logvar = self.encode(x, m, t)
        z = reparameterize(rng, mu, logvar)
        if self.gaussian_mechanism:
            m_mu, m_logvar = self.morph(t)
            m_hat = m_mu
        else:
            m_hat = self.morph(t)
            m_mu = m_logvar = None
        dec_m = m if self.decode_real_m else m_hat
        recon = self.decode(dec_m.astype(z.dtype), z)
        return VAEOutput(recon, m_hat, mu, logvar, m_mu, m_logvar)


class ConditionalVAE(nn.Module):
    """CVAE for T -> X generation, M unused (C5, ref cvae_models.py:7-85)."""

    t_dim: int = 10
    z_dim: int = 10
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.dtype
        self.enc_conv1 = conv(32, 4, 2, 1, dtype=d)
        self.enc_conv2 = conv(64, 4, 2, 1, dtype=d)
        self.enc_conv3 = conv(64, 4, 2, 1, dtype=d)
        self.fc_mu = nn.Dense(self.z_dim, dtype=d)
        self.fc_logvar = nn.Dense(self.z_dim, dtype=d)
        self.dec_fc = nn.Dense(64 * 7 * 7, dtype=d)
        self.dec_conv1 = conv_t(32, 4, 2, 1, dtype=d)
        self.dec_conv2 = conv_t(1, 4, 2, 1, dtype=d)

    def encode(self, x, t):
        h = nn.relu(self.enc_conv1(x))
        h = nn.relu(self.enc_conv2(h))
        h = nn.relu(self.enc_conv3(h))
        h = h.reshape(h.shape[0], -1)
        h = jnp.concatenate([h, t.astype(h.dtype)], axis=1)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, t):
        h = self.dec_fc(jnp.concatenate([z, t.astype(z.dtype)], axis=1))
        h = h.reshape(-1, 7, 7, 64)
        h = nn.relu(self.dec_conv1(h))
        return nn.sigmoid(self.dec_conv2(h))

    def __call__(self, x, t, *, rng: jax.Array):
        mu, logvar = self.encode(x, t)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, t), mu, logvar


class MDecoder(nn.Module):
    """Conditional-independence probe: M -> X (or [M, T] -> X).

    C6 Baseline/Augmented models (ref verify_independence.py:14-55)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, t: Optional[jnp.ndarray] = None):
        h = m if t is None else jnp.concatenate([m, t.astype(m.dtype)], axis=1)
        h = nn.relu(nn.Dense(64 * 7 * 7, dtype=self.dtype)(h))
        h = h.reshape(-1, 7, 7, 64)
        h = nn.relu(conv_t(32, 4, 2, 1, dtype=self.dtype)(h))
        return nn.sigmoid(conv_t(1, 4, 2, 1, dtype=self.dtype)(h))


class CausalVesselVAE(nn.Module):
    """Full-resolution vessel causal VAE (C7, ref vessel_analysis/00_core/
    models.py:9-166): 7-stage stride-2 conv encoder to (6, 10, 512), Gaussian
    mechanism, decoder of 7x [nearest-2x upsample + 3x3 conv + BN + ReLU].

    Safety clamps (logvar in [-10, 10], mu in [-100, 100], ref :148-156) are
    kept inside the jitted forward; the decoder consumes the REAL M during
    training (ref :161)."""

    m_dim: int = 12
    t_dim: int = 19
    z_dim: int = 128
    grid_hw: Tuple[int, int] = (6, 10)  # input 768x1280 / 2^7
    dtype: jnp.dtype = jnp.float32
    # phase-packed execution (ops/subpixel.py, same scheme as ViTVAE.packed):
    # the encoder consumes a space-to-depth-packed image and the decoder's
    # narrow-channel full-resolution stages run on coarse grids with dense
    # channels. Identical parameters/math (equivalence-tested).
    packed: bool = True

    ENC_CH = (32, 64, 128, 256, 512, 512, 512)
    DEC_CH = (512, 512, 256, 128, 64, 32)

    def setup(self):
        from causalvae_tpu.ops.subpixel import LiftableStemConv

        d = self.dtype
        self.enc_convs = [LiftableStemConv(c, ksize=4, dtype=d)
                          for c in self.ENC_CH]
        self.enc_bns = [batch_norm(dtype=d) for _ in self.ENC_CH]
        self.enc_fc1 = nn.Dense(1024, dtype=d)
        self.enc_fc_bn = batch_norm(dtype=d)
        self.enc_fc2 = nn.Dense(2 * self.z_dim, dtype=d)
        self.morph = MorphPredictor(
            m_dim=self.m_dim, hidden=(64, 64), gaussian=True,
            activation="leaky_relu", logvar_clip=10.0, dtype=d,
        )
        self.dec_fc1 = nn.Dense(1024, dtype=d)
        self.dec_fc_bn = batch_norm(dtype=d)
        gh, gw = self.grid_hw
        self.dec_fc2 = nn.Dense(gh * gw * 512, dtype=d)
        from causalvae_tpu.ops.subpixel import PhaseableConv3x3

        self.dec_convs = [PhaseableConv3x3(c, dtype=d) for c in self.DEC_CH]
        self.dec_bns = [batch_norm(dtype=d) for _ in self.DEC_CH]
        self.dec_out = PhaseableConv3x3(1, dtype=d)

    def encode(self, x, m, t, train: bool = False):
        from causalvae_tpu.ops.subpixel import space_to_depth_2x

        h = x
        if self.packed:
            # image packed 3x; the first three stride-2 convs each consume a
            # level, so the early stages run at (H/8, W/8) with 512/256/128
            # dense channels instead of (H/2..H/8) with 32/64 lane-padded
            for _ in range(3):
                h = space_to_depth_2x(h)
            in_lv = (3, 2, 1) + (0,) * (len(self.enc_convs) - 3)
            for i, (cv, bn) in enumerate(zip(self.enc_convs, self.enc_bns)):
                h = cv(h, in_levels=in_lv[i])
                g = 4 ** max(in_lv[i] - 1, 0)
                h = bn(h, use_running_average=not train, groups=g)
                h = nn.leaky_relu(h, 0.2)
        else:
            for cv, bn in zip(self.enc_convs, self.enc_bns):
                h = bn(cv(h), use_running_average=not train)
                h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        h = jnp.concatenate([h, m.astype(h.dtype), t.astype(h.dtype)], axis=1)
        h = self.enc_fc_bn(self.enc_fc1(h), use_running_average=not train)
        h = nn.leaky_relu(h, 0.2)
        mu, logvar = jnp.split(self.enc_fc2(h), 2, axis=1)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        mu = jnp.clip(mu, -100.0, 100.0)
        return mu, logvar

    def decode(self, m, z, train: bool = False):
        h = self.dec_fc1(jnp.concatenate([m, z], axis=1))
        h = self.dec_fc_bn(h, use_running_average=not train)
        h = nn.leaky_relu(h, 0.2)
        h = nn.relu(self.dec_fc2(h))
        gh, gw = self.grid_hw
        h = h.reshape(-1, gh, gw, 512)
        if not self.packed:
            for cv, bn in zip(self.dec_convs, self.dec_bns):
                h = upsample2x_nearest(h)
                h = bn(cv(h), use_running_average=not train)
                h = nn.relu(h)
            h = upsample2x_nearest(h)
            return nn.sigmoid(self.dec_out(h))
        # Packed: stages 0-3 are channel-dense and run spatially; stages 4-5
        # and the output head run phase-packed (nearest-2x upsample in phase
        # space == channel tile x4; convs via lift_once), keeping >= 128
        # dense channels on coarse grids throughout.
        from causalvae_tpu.ops.subpixel import depth_to_space_2x

        def tile4(a):
            # nearest-2x upsample of a SPATIAL tensor, in phase space: the
            # four (new, finest-level) phases all equal the source pixel
            return jnp.tile(a, (1, 1, 1, 4))

        def tile4_inner(a, c_real):
            # same, for an ALREADY-PACKED tensor: the new phases are the
            # finest level, so they nest INSIDE the existing phase blocks
            # (channel layout [coarser phases][new phase][c])
            b_, h_, w_, ch = a.shape
            p_ = ch // c_real
            a = a.reshape(b_, h_, w_, p_, 1, c_real)
            a = jnp.broadcast_to(a, (b_, h_, w_, p_, 4, c_real))
            return a.reshape(b_, h_, w_, p_ * 4 * c_real)

        for i in range(4):
            h = upsample2x_nearest(h)
            h = self.dec_bns[i](self.dec_convs[i](h),
                                use_running_average=not train)
            h = nn.relu(h)
        h = tile4(h)                                   # up #4 in phase space
        h = self.dec_convs[4](h, levels=1)             # L1 of (16gh, 16gw, 64)
        h = self.dec_bns[4](h, use_running_average=not train, groups=4)
        h = nn.relu(h)
        h = depth_to_space_2x(h)                       # spatial (32gh, 32gw, 64)
        h = tile4(h)                                   # up #5 in phase space
        h = self.dec_convs[5](h, levels=1)             # L1 of (32gh, 32gw, 32)
        h = self.dec_bns[5](h, use_running_average=not train, groups=4)
        h = nn.relu(h)
        h = tile4_inner(h, self.DEC_CH[5])             # final up in phase space
        o = self.dec_out(h, levels=2)                  # L2 of (64gh,64gw,1): 16ch
        o = nn.sigmoid(o)
        for _ in range(2):
            o = depth_to_space_2x(o)
        return o

    def predict_m(self, t):
        return self.morph.mean(t)

    def __call__(self, x, m, t, *, rng: jax.Array, train: bool = False) -> VAEOutput:
        mu, logvar = self.encode(x, m, t, train)
        z = reparameterize(rng, mu, logvar)
        m_mu, m_logvar = self.morph(t)
        recon = self.decode(m.astype(z.dtype), z, train)
        return VAEOutput(recon, m_mu, mu, logvar, m_mu, m_logvar)


class CausalBioVAE(nn.Module):
    """Compact resolution-agnostic cascade VAE (C10, ref causal_cascade/
    models.py:5-89): 4-conv encoder + adaptive 4x4 average pool, BatchNorm'd
    mechanism_net T->M, decoder [Z, M_hat] -> 64x-ish map, bilinear-resized to
    the input size. Decoder consumes the PREDICTED M (ref :80), unlike C7."""

    m_dim: int = 12
    t_dim: int = 19
    z_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.dtype
        self.enc_convs = [conv(c, 4, 2, 1, dtype=d) for c in (32, 64, 128, 256)]
        self.enc_fc1 = nn.Dense(512, dtype=d)
        self.enc_fc2 = nn.Dense(256, dtype=d)
        self.fc_mu = nn.Dense(self.z_dim, dtype=d)
        self.fc_logvar = nn.Dense(self.z_dim, dtype=d)
        self.mechanism = MorphPredictor(
            m_dim=self.m_dim, hidden=(64, 64), gaussian=False,
            bn_layers=(0,), dtype=d,
        )
        self.dec_input = nn.Dense(256 * 4 * 4, dtype=d)
        self.dec_convs = [conv_t(c, 4, 2, 1, dtype=d) for c in (128, 64, 32)]
        self.dec_out = conv_t(1, 4, 2, 1, dtype=d)

    def encode(self, x, m, t_onehot, train: bool = False):
        h = x
        for cv in self.enc_convs:
            h = nn.relu(cv(h))
        b, hh, ww, c = h.shape
        assert hh % 4 == 0 and ww % 4 == 0, "input H/W must be divisible by 64"
        h = h.reshape(b, 4, hh // 4, 4, ww // 4, c).mean(axis=(2, 4))  # adaptive 4x4
        h = h.reshape(b, -1)
        h = jnp.concatenate([h, m.astype(h.dtype), t_onehot.astype(h.dtype)], axis=1)
        h = nn.relu(self.enc_fc1(h))
        h = nn.relu(self.enc_fc2(h))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, m_hat, out_hw: Tuple[int, int], train: bool = False):
        h = self.dec_input(jnp.concatenate([z, m_hat], axis=1))
        h = h.reshape(-1, 4, 4, 256)
        for cv in self.dec_convs:
            h = nn.relu(cv(h))
        h = self.dec_out(h)
        return jax.image.resize(
            h, (h.shape[0], *out_hw, h.shape[-1]), method="bilinear"
        )

    def predict_m(self, t):
        """Mechanism mean from one-hot T (eval-mode BatchNorm stats)."""
        return self.mechanism(t, train=False)

    def __call__(self, x, m, t: jnp.ndarray, *, rng: jax.Array, train: bool = False):
        t_onehot = jax.nn.one_hot(t, self.t_dim, dtype=x.dtype)
        mu, logvar = self.encode(x, m, t_onehot, train)
        z = reparameterize(rng, mu, logvar)
        m_hat = self.mechanism(t_onehot, train=train)
        recon = self.decode(z, m_hat, x.shape[1:3], train)
        return VAEOutput(recon, m_hat, mu, logvar)
