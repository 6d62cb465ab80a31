"""Checkpoint-port parity for the CNN vessel causal VAE (T8 over C7):
a torch CausalVesselVAE-layout model ported into the flax CausalVesselVAE
must match encode / mechanism / decode in eval mode, including BatchNorm
running stats and the 512-channel flatten boundary permutations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from causalvae_tpu.models.vae import CausalVesselVAE  # noqa: E402
from causalvae_tpu.train.port_maps import port_vessel_cnn_checkpoint  # noqa: E402

M_DIM, T_DIM, Z_DIM = 12, 19, 16
IMG = 128  # 7 stride-2 stages -> (1, 1) grid
GRID = (1, 1)


class TorchVesselVAE(nn.Module):
    """Reference CausalVesselVAE state-dict layout (independent tiny
    re-implementation; ref vessel_analysis/00_core/models.py:9-166 with the
    dead first dec_conv omitted — state dicts only carry the live one)."""

    def __init__(self):
        super().__init__()
        ch = (32, 64, 128, 256, 512, 512, 512)
        layers, prev = [], 1
        for c in ch:
            layers += [nn.Conv2d(prev, c, 4, 2, 1), nn.BatchNorm2d(c),
                       nn.LeakyReLU(0.2)]
            prev = c
        layers.append(nn.Flatten())
        self.enc_conv = nn.Sequential(*layers)
        flat = 512 * GRID[0] * GRID[1]
        self.enc_fc = nn.Sequential(
            nn.Linear(flat + M_DIM + T_DIM, 1024), nn.BatchNorm1d(1024),
            nn.LeakyReLU(0.2), nn.Linear(1024, 2 * Z_DIM))
        self.morph_predictor_shared = nn.Sequential(
            nn.Linear(T_DIM, 64), nn.LeakyReLU(0.2),
            nn.Linear(64, 64), nn.LeakyReLU(0.2))
        self.morph_predictor_mu = nn.Linear(64, M_DIM)
        self.morph_predictor_logvar = nn.Linear(64, M_DIM)
        self.dec_fc = nn.Sequential(
            nn.Linear(M_DIM + Z_DIM, 1024), nn.BatchNorm1d(1024),
            nn.LeakyReLU(0.2), nn.Linear(1024, flat), nn.ReLU())
        dec_ch = (512, 512, 256, 128, 64, 32)
        layers, prev = [], 512
        for c in dec_ch:
            layers += [nn.Upsample(scale_factor=2, mode="nearest"),
                       nn.Conv2d(prev, c, 3, 1, 1), nn.BatchNorm2d(c), nn.ReLU()]
            prev = c
        layers += [nn.Upsample(scale_factor=2, mode="nearest"),
                   nn.Conv2d(prev, 1, 3, 1, 1), nn.Sigmoid()]
        self.dec_conv = nn.Sequential(*layers)

    def encode(self, x, m, t):
        h = torch.cat([self.enc_conv(x), m, t], dim=1)
        mu, logvar = self.enc_fc(h).chunk(2, dim=1)
        return torch.clamp(mu, -100, 100), torch.clamp(logvar, -10, 10)

    def predict_m(self, t):
        return self.morph_predictor_mu(self.morph_predictor_shared(t))

    def decode(self, m, z):
        h = self.dec_fc(torch.cat([m, z], dim=1)).view(-1, 512, *GRID)
        return self.dec_conv(h)


@pytest.fixture(scope="module")
def ported():
    torch.manual_seed(0)
    tm = TorchVesselVAE()
    # give BN running stats non-trivial values before switching to eval
    with torch.no_grad():
        x = torch.rand(4, 1, IMG, IMG)
        m = torch.randn(4, M_DIM)
        t = torch.eye(T_DIM)[torch.randint(0, T_DIM, (4,))]
        mu, _ = tm.encode(x, m, t)
        tm.decode(m, mu)
    tm.eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()
             if "num_batches_tracked" not in k}

    fm = CausalVesselVAE(m_dim=M_DIM, t_dim=T_DIM, z_dim=Z_DIM, grid_hw=GRID)
    key = jax.random.PRNGKey(0)
    variables = fm.init({"params": key}, jnp.zeros((1, IMG, IMG, 1)),
                        jnp.zeros((1, M_DIM)), jnp.zeros((1, T_DIM)), rng=key)
    variables, skipped = port_vessel_cnn_checkpoint(variables, state, GRID)
    assert skipped == []
    return tm, fm, variables


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(1)
    x = rng.random((2, IMG, IMG, 1)).astype(np.float32)
    m = rng.standard_normal((2, M_DIM)).astype(np.float32)
    t = np.eye(T_DIM, dtype=np.float32)[rng.integers(0, T_DIM, 2)]
    z = rng.standard_normal((2, Z_DIM)).astype(np.float32)
    return x, m, t, z


def test_encode_parity(ported, inputs):
    tm, fm, variables = ported
    x, m, t, _ = inputs
    with torch.no_grad():
        mu_t, logvar_t = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                   torch.from_numpy(m), torch.from_numpy(t))
    mu_j, logvar_j = fm.apply(variables, jnp.asarray(x), jnp.asarray(m),
                              jnp.asarray(t), method=fm.encode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=5e-4)


def test_mechanism_parity(ported, inputs):
    tm, fm, variables = ported
    _, _, t, _ = inputs
    with torch.no_grad():
        m_t = tm.predict_m(torch.from_numpy(t))
    m_j = fm.apply(variables, jnp.asarray(t), method=fm.predict_m)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=1e-5)


def test_decode_parity(ported, inputs):
    tm, fm, variables = ported
    _, m, _, z = inputs
    with torch.no_grad():
        r_t = tm.decode(torch.from_numpy(m), torch.from_numpy(z))
    r_j = fm.apply(variables, jnp.asarray(m), jnp.asarray(z), method=fm.decode)
    np.testing.assert_allclose(
        np.asarray(r_j), r_t.numpy().transpose(0, 2, 3, 1), atol=5e-4)
