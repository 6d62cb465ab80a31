"""Checkpoint-port parity for the MNIST causal VAE family (T8 over C1/C4):
a torch CausalMorphVAE12-layout model ported into CausalConvVAE must match
encode / mechanism / decode numerically, including the NCHW-vs-NHWC flatten
permutations at both conv<->fc boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from causalvae_tpu.models.vae import CausalConvVAE  # noqa: E402
from causalvae_tpu.train.port_maps import port_mnist_checkpoint  # noqa: E402

M_DIM, T_DIM, Z_DIM = 12, 10, 10


class TorchCausalVAE(nn.Module):
    """Reference CausalMorphVAE12 state-dict layout (tiny independent
    re-implementation; ref mnist_test/01 models.py:6-48)."""

    def __init__(self, gaussian=False):
        super().__init__()
        self.gaussian = gaussian
        self.enc_conv = nn.Sequential(
            nn.Conv2d(1, 32, 4, 2, 1), nn.ReLU(),
            nn.Conv2d(32, 64, 4, 2, 1), nn.ReLU(), nn.Flatten(),
        )
        self.enc_fc = nn.Sequential(
            nn.Linear(64 * 49 + M_DIM + T_DIM, 512), nn.ReLU(),
            nn.Linear(512, 2 * Z_DIM),
        )
        if gaussian:
            self.morph_predictor_shared = nn.Sequential(
                nn.Linear(T_DIM, 128), nn.ReLU())
            self.morph_predictor_mu = nn.Linear(128, M_DIM)
            self.morph_predictor_logvar = nn.Linear(128, M_DIM)
        else:
            self.morph_predictor = nn.Sequential(
                nn.Linear(T_DIM, 128), nn.ReLU(), nn.Linear(128, M_DIM))
        self.dec_fc = nn.Sequential(nn.Linear(M_DIM + Z_DIM, 64 * 49), nn.ReLU())
        self.dec_conv = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(32, 1, 4, 2, 1), nn.Sigmoid(),
        )

    def encode(self, x, m, t):
        h = torch.cat([self.enc_conv(x), m, t], dim=1)
        return self.enc_fc(h).chunk(2, dim=1)

    def predict_m(self, t):
        if self.gaussian:
            return self.morph_predictor_mu(self.morph_predictor_shared(t))
        return self.morph_predictor(t)

    def decode(self, m, z):
        h = self.dec_fc(torch.cat([m, z], dim=1)).view(-1, 64, 7, 7)
        return self.dec_conv(h)


@pytest.fixture(scope="module", params=[False, True], ids=["det", "gaussian"])
def ported(request):
    gaussian = request.param
    torch.manual_seed(0)
    tm = TorchCausalVAE(gaussian).eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = CausalConvVAE(m_dim=M_DIM, t_dim=T_DIM, z_dim=Z_DIM,
                       gaussian_mechanism=gaussian, decode_real_m=gaussian)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 28, 28, 1))
    variables = fm.init({"params": key}, x0, jnp.zeros((1, M_DIM)),
                        jnp.zeros((1, T_DIM)), rng=key)
    variables, skipped = port_mnist_checkpoint(variables, state, gaussian=gaussian)
    assert skipped == []
    return tm, fm, variables


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = rng.random((4, 28, 28, 1)).astype(np.float32)
    m = rng.standard_normal((4, M_DIM)).astype(np.float32)
    t = np.eye(T_DIM, dtype=np.float32)[rng.integers(0, T_DIM, 4)]
    z = rng.standard_normal((4, Z_DIM)).astype(np.float32)
    return x, m, t, z


def test_encode_parity(ported, inputs):
    tm, fm, variables = ported
    x, m, t, _ = inputs
    with torch.no_grad():
        mu_t, logvar_t = tm.encode(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(m), torch.from_numpy(t))
    mu_j, logvar_j = fm.apply(variables, jnp.asarray(x), jnp.asarray(m),
                              jnp.asarray(t), method=fm.encode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=2e-5)


def test_mechanism_parity(ported, inputs):
    tm, fm, variables = ported
    _, _, t, _ = inputs
    with torch.no_grad():
        m_t = tm.predict_m(torch.from_numpy(t))
    m_j = fm.apply(variables, jnp.asarray(t), method=fm.predict_m)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=2e-5)


def test_decode_parity(ported, inputs):
    tm, fm, variables = ported
    _, m, _, z = inputs
    with torch.no_grad():
        r_t = tm.decode(torch.from_numpy(m), torch.from_numpy(z))
    r_j = fm.apply(variables, jnp.asarray(m), jnp.asarray(z), method=fm.decode)
    np.testing.assert_allclose(
        np.asarray(r_j), r_t.numpy().transpose(0, 2, 3, 1), atol=2e-5)
