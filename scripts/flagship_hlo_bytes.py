"""Where do the flagship step's HBM bytes go? Compiles the 768x1280 bf16
vessel train step, walks the optimized HLO, and ranks fusions/ops by
estimated bytes moved (sum of operand + output buffer sizes).

This is a static estimate (tells you which ops to attack), complementing
scripts/flagship_breakdown.py's measured wall-clock split.
"""

import collections
import json
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
from causalvae_tpu.train.loop import make_vae_step
from causalvae_tpu.train.state import TrainState

BATCH = 8
HW = (768, 1280)

DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
}
SHAPE_RE = re.compile(r"\b(f32|f16|bf16|f64|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum byte sizes of every typed shape literal in an HLO result type."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    cfg = VesselConfig()
    model = CausalViTVAE(img_size=HW, m_dim=12, t_dim=19, z_dim=cfg.z_dim,
                         dtype=jnp.bfloat16, packed_io=True)
    rng = np.random.default_rng(0)
    from causalvae_tpu.ops.subpixel import space_to_depth_n

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
    print("cost_analysis:", json.dumps({
        k: round(float(v) / 1e9, 2) for k, v in compiled.cost_analysis().items()
        if k in ("flops", "bytes accessed", "transcendentals")
    }), file=sys.stderr)

    hlo = compiled.as_text()
    # Only the ENTRY computation's instructions touch HBM; ops inside
    # fused_computation bodies are free (registers/VMEM). Operands appear as
    # %name references — resolve their sizes via a first pass.
    entry_lines = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if in_entry:
            entry_lines.append(line)

    inst_re = re.compile(r"\s+(?:ROOT )?%?([\w.\-]+) = (.+?) ([\w\-]+)\(")
    size_of = {}
    for line in entry_lines:
        m_ = inst_re.match(line)
        if m_:
            size_of[m_.group(1)] = shape_bytes(m_.group(2))

    rows = []
    kind_bytes = collections.Counter()
    for line in entry_lines:
        m_ = inst_re.match(line)
        if not m_:
            continue
        name, result_ty, op = m_.groups()
        if op in ("parameter", "constant", "tuple", "get-tuple-element", "bitcast"):
            continue
        out_b = shape_bytes(result_ty)
        args = line[m_.end():].split(")")[0]
        in_b = sum(size_of.get(ref, 0)
                   for ref in re.findall(r"%([\w.\-]+)", args))
        total = out_b + in_b
        kind = op if op != "fusion" else ("fusion:" + (
            re.search(r'kind=(\w+)', line).group(1) if "kind=" in line else "?"))
        kind_bytes[kind] += total
        meta = re.search(r'op_name="([^"]*)"', line)
        rows.append((total, name, op, out_b, meta.group(1) if meta else ""))

    rows.sort(reverse=True)
    print("\n=== top 30 ops by (in+out) bytes ===")
    for total, name, op, out_b, meta in rows[:30]:
        print(f"{total/1e6:9.1f} MB  {op:24s} out={out_b/1e6:8.1f} MB  {meta[:90]}")
    print("\n=== bytes by op kind (GB) ===")
    for kind, b in kind_bytes.most_common(20):
        print(f"{b/1e9:8.2f}  {kind}")
    print(f"\ntotal (naive sum over entry ops): {sum(kind_bytes.values())/1e9:.2f} GB")


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
