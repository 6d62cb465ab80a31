"""Checkpoint-port parity for the CVAE (C5) and cascade VAE (C10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from causalvae_tpu.models.vae import CausalBioVAE, ConditionalVAE  # noqa: E402
from causalvae_tpu.train.port_maps import (cascade_vae_name_maps,  # noqa: E402
                                           conditional_vae_name_maps,
                                           port_simple_checkpoint)

T_DIM, Z_DIM = 10, 10


class TorchCVAE(nn.Module):
    """Reference ConditionalVAE layout (ref mnist_test/03 cvae_models.py)."""

    def __init__(self):
        super().__init__()
        self.enc_conv = nn.Sequential(
            nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(32, 64, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(64, 64, 4, 2, 1), nn.ReLU(),
        )
        self.enc_fc_mu = nn.Linear(576 + T_DIM, Z_DIM)
        self.enc_fc_logvar = nn.Linear(576 + T_DIM, Z_DIM)
        self.dec_fc = nn.Linear(Z_DIM + T_DIM, 64 * 49)
        self.dec_conv = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(32, 1, 4, 2, 1), nn.Sigmoid(),
        )

    def encode(self, x, t):
        h = self.enc_conv(x).flatten(1)
        h = torch.cat([h, t], dim=1)
        return self.enc_fc_mu(h), self.enc_fc_logvar(h)

    def decode(self, z, t):
        h = self.dec_fc(torch.cat([z, t], dim=1)).view(-1, 64, 7, 7)
        return self.dec_conv(h)


class TorchCascade(nn.Module):
    """Reference CausalBioVAE layout (ref causal_cascade/models.py:5-89)."""

    def __init__(self, m_dim=12, t_dim=19, latent=16):
        super().__init__()
        self.enc_conv = nn.Sequential(
            nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(32, 64, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(64, 128, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(128, 256, 4, 2, 1), nn.ReLU(),
            nn.AdaptiveAvgPool2d((4, 4)), nn.Flatten(),
        )
        self.enc_fc = nn.Sequential(
            nn.Linear(4096 + m_dim + t_dim, 512), nn.ReLU(),
            nn.Linear(512, 256), nn.ReLU())
        self.fc_mu = nn.Linear(256, latent)
        self.fc_logvar = nn.Linear(256, latent)
        self.mechanism_net = nn.Sequential(
            nn.Linear(t_dim, 64), nn.BatchNorm1d(64), nn.ReLU(),
            nn.Linear(64, 64), nn.ReLU(), nn.Linear(64, m_dim))
        self.dec_input = nn.Linear(latent + m_dim, 4096)
        self.dec_conv = nn.Sequential(
            nn.ConvTranspose2d(256, 128, 4, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(128, 64, 4, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(32, 1, 4, 2, 1),
        )

    def encode(self, x, m, t):
        h = torch.cat([self.enc_conv(x), m, t], dim=1)
        h = self.enc_fc(h)
        return self.fc_mu(h), self.fc_logvar(h)

    def mechanism(self, t):
        return self.mechanism_net(t)

    def decode(self, z, m_hat, out_hw):
        h = self.dec_input(torch.cat([z, m_hat], dim=1)).view(-1, 256, 4, 4)
        h = self.dec_conv(h)
        return F.interpolate(h, size=out_hw, mode="bilinear", align_corners=False)


def test_cvae_port_parity():
    torch.manual_seed(0)
    tm = TorchCVAE().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fm = ConditionalVAE(t_dim=T_DIM, z_dim=Z_DIM)
    key = jax.random.PRNGKey(0)
    variables = fm.init({"params": key}, jnp.zeros((1, 28, 28, 1)),
                        jnp.zeros((1, T_DIM)), rng=key)
    variables, skipped = port_simple_checkpoint(
        variables, state, conditional_vae_name_maps())
    assert skipped == []

    rng = np.random.default_rng(0)
    x = rng.random((4, 28, 28, 1)).astype(np.float32)
    t = np.eye(T_DIM, dtype=np.float32)[rng.integers(0, T_DIM, 4)]
    z = rng.standard_normal((4, Z_DIM)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               torch.from_numpy(t))
        r_t = tm.decode(torch.from_numpy(z), torch.from_numpy(t))
    mu_j, lv_j = fm.apply(variables, jnp.asarray(x), jnp.asarray(t),
                          method=fm.encode)
    r_j = fm.apply(variables, jnp.asarray(z), jnp.asarray(t), method=fm.decode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_j),
                               r_t.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_cascade_port_parity():
    torch.manual_seed(0)
    tm = TorchCascade()
    # populate BN running stats, then eval
    with torch.no_grad():
        tm.mechanism_net(torch.eye(19)[torch.randint(0, 19, (8,))])
    tm.eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()
             if "num_batches_tracked" not in k}
    fm = CausalBioVAE(m_dim=12, t_dim=19, z_dim=16)
    key = jax.random.PRNGKey(0)
    variables = fm.init({"params": key}, jnp.zeros((1, 64, 64, 1)),
                        jnp.zeros((1, 12)), jnp.zeros((1,), jnp.int32),
                        rng=key)
    variables, skipped = port_simple_checkpoint(
        variables, state, cascade_vae_name_maps())
    assert skipped == []

    rng = np.random.default_rng(1)
    x = rng.random((2, 64, 64, 1)).astype(np.float32)
    m = rng.standard_normal((2, 12)).astype(np.float32)
    t = np.eye(19, dtype=np.float32)[rng.integers(0, 19, 2)]
    z = rng.standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               torch.from_numpy(m), torch.from_numpy(t))
        mech_t = tm.mechanism(torch.from_numpy(t))
        r_t = tm.decode(torch.from_numpy(z), torch.from_numpy(m), (64, 64))
    mu_j, lv_j = fm.apply(variables, jnp.asarray(x), jnp.asarray(m),
                          jnp.asarray(t), method=fm.encode)
    mech_j = fm.apply(variables, jnp.asarray(t), method=fm.predict_m)
    r_j = fm.apply(variables, jnp.asarray(z), jnp.asarray(m), (64, 64),
                   method=fm.decode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mech_j), mech_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_j),
                               r_t.numpy().transpose(0, 2, 3, 1), atol=2e-4)
