"""Checkpoint-porting parity: a torch ViTVAE (reference architecture) ported
into the flax ViTVAE must produce numerically matching eval-mode outputs.

This is the strongest T8 evidence: encode (stem + transformer + CLS heads)
and decode agree end-to-end after the name-map port, including the packed
MultiheadAttention conversion and BatchNorm running stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from causalvae_tpu.models.vit import ViTVAE  # noqa: E402
from causalvae_tpu.train.port_maps import port_vitvae_checkpoint  # noqa: E402

# module-scope torch fixture costs ~30s of setup -> slow tier
pytestmark = pytest.mark.slow

EMBED, DEPTH, HEADS, MLP, LATENT = 32, 2, 4, 64, 16
IMG = (64, 64)  # grid 2x2


class TorchResBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c),
        )

    def forward(self, x):
        return x + self.conv(x)


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, dropout=0.1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.MultiheadAttention(dim, heads, dropout=dropout, batch_first=True)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(
            nn.Linear(dim, mlp_dim), nn.GELU(), nn.Dropout(dropout),
            nn.Linear(mlp_dim, dim), nn.Dropout(dropout),
        )

    def forward(self, x):
        qkv = self.norm1(x)
        attn_out, _ = self.attn(qkv, qkv, qkv)
        x = x + attn_out
        return x + self.mlp(self.norm2(x))


class TorchViTVAE(nn.Module):
    """Same architecture family as the reference backbone (independent tiny
    re-implementation for the port test). n_res selects the reference
    variant: 3 decoder ResBlocks = vessel backbone (ref vessel_analysis/
    00_core/vit_backbone.py:124-156), 4 = latent-translator
    (ref latent_translator/models.py:86-93)."""

    def __init__(self, n_res=3):
        super().__init__()
        chs = [32, 64, 128, EMBED, EMBED]
        stem = []
        prev = 1
        for c in chs:
            stem += [nn.Conv2d(prev, c, 3, 2, 1), nn.BatchNorm2d(c), nn.LeakyReLU()]
            prev = c
        self.stem = nn.Sequential(*stem)
        gh, gw = IMG[0] // 32, IMG[1] // 32
        self.grid = (gh, gw)
        self.pos_embedding = nn.Parameter(torch.randn(1, gh * gw + 1, EMBED))
        self.cls_token = nn.Parameter(torch.randn(1, 1, EMBED))
        self.transformer = nn.Sequential(
            *[TorchViTBlock(EMBED, HEADS, MLP) for _ in range(DEPTH)]
        )
        self.to_latent = nn.LayerNorm(EMBED)
        self.fc_mu = nn.Linear(EMBED, LATENT)
        self.fc_var = nn.Linear(EMBED, LATENT)
        self.decoder_input = nn.Linear(LATENT, EMBED * gh * gw)
        dec = []
        dchs = [128, 64, 32, 16, 16]
        prev = EMBED
        for i, c in enumerate(dchs):
            dec += [nn.ConvTranspose2d(prev, c, 3, 2, 1, output_padding=1),
                    nn.BatchNorm2d(c), nn.LeakyReLU()]
            if i < n_res:
                dec += [TorchResBlock(c)]
            prev = c
        dec += [nn.Conv2d(16, 1, 3, padding=1)]
        self.decoder = nn.Sequential(*dec)

    def encode(self, x):
        h = self.stem(x)
        b, c, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        h = torch.cat([cls, h], dim=1) + self.pos_embedding[:, : gh * gw + 1]
        h = self.transformer(h)
        cls_out = self.to_latent(h[:, 0])
        return self.fc_mu(cls_out), self.fc_var(cls_out)

    def decode(self, z):
        h = self.decoder_input(z).view(-1, EMBED, *self.grid)
        return self.decoder(h)


@pytest.fixture(scope="module", params=[3, 4],
                ids=["vessel_3res", "translator_4res"])
def ported(request):
    n_res = request.param
    torch.manual_seed(0)
    tm = TorchViTVAE(n_res=n_res).eval()
    # perturb BN running stats so the port is actually exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, (nn.BatchNorm2d,)):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.9, 1.1)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = ViTVAE(img_size=IMG, latent_dim=LATENT, embed_dim=EMBED,
                depth=DEPTH, heads=HEADS, mlp_dim=MLP, dec_res_stages=n_res)
    key = jax.random.PRNGKey(0)
    variables = fm.init({"params": key, "dropout": key},
                        jnp.zeros((1, *IMG, 1)), rng=key)
    variables, skipped = port_vitvae_checkpoint(
        variables, state, depth=DEPTH, heads=HEADS, embed_dim=EMBED,
        dec_res_stages=n_res, grid_hw=(IMG[0] // 32, IMG[1] // 32))
    skipped = [s for s in skipped if "num_batches_tracked" not in s[0]]
    assert not skipped, skipped
    return tm, fm, variables


def test_encode_parity(ported):
    tm, fm, variables = ported
    rng = np.random.default_rng(0)
    x = rng.random((2, *IMG, 1)).astype(np.float32)
    with torch.no_grad():
        mu_t, var_t = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    mu_f, var_f = fm.apply(variables, jnp.asarray(x), method=fm.encode)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(var_f), var_t.numpy(), rtol=1e-3, atol=2e-4)


def test_decode_parity(ported):
    tm, fm, variables = ported
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, LATENT)).astype(np.float32)
    with torch.no_grad():
        out_t = tm.decode(torch.from_numpy(z)).numpy()  # NCHW
    out_f = np.asarray(fm.apply(variables, jnp.asarray(z), method=fm.decode))
    # 5 deconv+BN+ResBlock stages accumulate float32 reduction-order noise
    # between XLA and torch conv implementations; ~1e-3 absolute is expected.
    np.testing.assert_allclose(
        out_f[..., 0], out_t[:, 0], rtol=5e-3, atol=2e-3
    )
    corr = np.corrcoef(out_f.ravel(), out_t.transpose(0, 2, 3, 1).ravel())[0, 1]
    assert corr > 0.999
