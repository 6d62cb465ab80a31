"""Dump the flagship step's copy-start / biggest-fusion HLO lines verbatim,
to identify what forces the ~3 GB of layout copies that flagship_hlo_bytes.py
ranks near the top. Reuses the persistent compile cache (warm ~1 min)."""

import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")

from causalvae_tpu.config import VesselConfig
from causalvae_tpu.models.vit import CausalViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.ops.subpixel import space_to_depth_n
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState

BATCH, HW = 8, (768, 1280)


def main():
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16, packed_io=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(space_to_depth_n(
        (rng.random((BATCH, *HW, 1)) > 0.9).astype(np.float32), 3))
    m = jnp.asarray(rng.standard_normal((BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, BATCH)])
    batch = {"x": x, "m": m, "t": t}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True, needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)
    compiled = jax.jit(step, donate_argnums=0).lower(state, batch, key).compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    print("=== copy-start lines (entry) ===")
    for i, line in enumerate(lines):
        if " copy-start(" in line or "= copy(" in line and "f16[8,96" in line:
            print(line.strip()[:400])
    print("\n=== the big jit(step)/add fusion (adam) — find + dump body head ===")
    # locate entry fusion whose op_name is jit(step)/add with ~1258MB out
    m_big = re.search(r"%?(fusion[\w.\-]*) = \((.*?)\) fusion\(([^)]*)\).*?"
                      r'op_name="jit\(step\)/add"', hlo)
    big_lines = [l for l in lines if 'op_name="jit(step)/add"' in l
                 and " fusion(" in l]
    for l in big_lines[:4]:
        print(l.strip()[:500])
    print("\n=== async-start lines (top 6 by length of shape) ===")
    asyncs = [l for l in lines if "async-start" in l and "=" in l]
    for l in asyncs[:6]:
        print(l.strip()[:300])
    print(f"\n(total copy-start: {sum(' copy-start(' in l for l in lines)}, "
          f"async-start: {len(asyncs)})")


if __name__ == "__main__":
    main()
