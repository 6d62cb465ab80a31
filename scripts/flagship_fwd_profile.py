"""Per-op device-time profile of the flagship FORWARD (fwd+loss) alone.

scripts/flagship_breakdown.py shows the forward at ~16 ms for 5.45 GB
(42% of HBM roofline, 40% XLA-counted MFU) while the backward runs at ~92%
of roofline — the forward is the optimization target. This traces it and
aggregates self-times by op category and by model region (op_name metadata).
"""

import collections
import glob
import os
import re
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from causalvae_tpu.config import VesselConfig
from causalvae_tpu.models.vit import CausalViTVAE
from causalvae_tpu.ops import losses as L
from causalvae_tpu.ops.subpixel import space_to_depth_n

BATCH = 8
HW = (768, 1280)
TRACE_DIR = "/tmp/flagship_fwd_trace"


def main():
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16, packed_io=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(space_to_depth_n(
        (rng.random((BATCH, *HW, 1)) > 0.9).astype(np.float32), 3))
    m = jnp.asarray(rng.standard_normal((BATCH, 12)).astype(np.float32))
    t = jnp.asarray(np.eye(19, dtype=np.float32)[rng.integers(0, 19, BATCH)])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1], t[:1],
                           rng=key, train=True)

    def fwd(v, key):
        out, _ = model.apply(v, x, m, t, rng=key, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        loss, _aux = L.vessel_loss(out, x, m, beta=cfg.beta,
                                   lambda_morph=cfg.lambda_morph,
                                   lambda_sparsity=cfg.lambda_sparsity)
        return loss

    compiled = jax.jit(fwd).lower(variables, key).compile()
    out = compiled(variables, key)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = compiled(variables, key)
    float(np.asarray(out))
    print(f"fwd ms/call: {(time.perf_counter() - t0) / 10 * 1e3:.1f}",
          file=sys.stderr)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = compiled(variables, key)
        float(np.asarray(out))
    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane:", paths, file=sys.stderr)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
