"""Per-fusion time x bytes ledger for the flagship bf16 train step.

Joins two views of the SAME compiled executable (768x1280 CausalViTVAE full
train step, batch 8, bf16, packed IO — ref workload
vessel_analysis/00_core/config.py:9-23):

  1. static per-instruction HBM bytes from the optimized entry HLO
     (operand + output buffer sizes, the flagship_hlo_bytes.py walk), and
  2. measured per-instruction device self-times from a jax.profiler xplane
     trace of N steps,

keyed by HLO instruction name. Every row gets its own HBM-roofline fraction
(bytes / time / 819 GB/s on v5e), so the step's total time is accounted
fusion by fusion instead of as one aggregate number (VERDICT r3 weak #1 /
demand #5). Writes docs/FLAGSHIP_LEDGER.md and prints the same table.

Run on the real TPU: python scripts/flagship_ledger.py [steps] [top_n]
"""

import collections
import glob
import re
import sys
import time

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
V5E_HBM_BW = 819e9  # bytes/sec
TRACE_DIR = "/tmp/flagship_ledger_trace"

DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
}
SHAPE_RE = re.compile(
    r"\b(f32|f16|bf16|f64|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def build_step():
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
    variables = model.init({"params": key, "dropout": key}, x[:1], m[:1],
                           t[:1], rng=key, train=True)

    def loss_fn(out, b):
        return L.vessel_loss(out, b["x"], b["m"], beta=cfg.beta,
                             lambda_morph=cfg.lambda_morph,
                             lambda_sparsity=cfg.lambda_sparsity)

    step = make_vae_step(model, loss_fn, has_batch_stats=True,
                         needs_dropout=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype)))
    state = TrainState.create(variables, tx)
    return step, state, batch, key


def hlo_bytes_by_name(compiled):
    """entry-instruction name -> (op kind, in+out bytes, op_name metadata)."""
    hlo = compiled.as_text()
    entry_lines, in_entry = [], False
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
        m = inst_re.match(line)
        if m:
            size_of[m.group(1)] = shape_bytes(m.group(2))
    table = {}
    for line in entry_lines:
        m = inst_re.match(line)
        if not m:
            continue
        name, result_ty, op = m.groups()
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        out_b = shape_bytes(result_ty)
        args = line[m.end():].split(")")[0]
        in_b = sum(size_of.get(ref, 0)
                   for ref in re.findall(r"%([\w.\-]+)", args))
        kind = op if op != "fusion" else ("fusion:" + (
            re.search(r"kind=(\w+)", line).group(1) if "kind=" in line else "?"))
        meta = re.search(r'op_name="([^"]*)"', line)
        table[name] = (kind, out_b + in_b, meta.group(1) if meta else "")
    return table


def trace_times(run_steps, n_steps):
    """HLO instruction name -> total device self-time ms across the trace."""
    with jax.profiler.trace(TRACE_DIR):
        run_steps(n_steps)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    totals = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                # event metadata name is the full HLO instruction text
                # ("fusion.20 = (f32[...]) fusion(...)"); key on the name
                name = ev_meta[ev.metadata_id].name
                name = name.split(" = ")[0].strip().lstrip("%")
                totals[name] += ev.duration_ps / 1e9  # -> ms
    return totals


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    step, state, batch, key = build_step()
    jitted = jax.jit(step, donate_argnums=0)
    compiled = jitted.lower(state, batch, key).compile()
    bytes_tbl = hlo_bytes_by_name(compiled)

    # warm + wall-clock reference (device fetch of a scalar is the reliable
    # barrier on this platform — block_until_ready returns early through the
    # remote tunnel, see bench.py bench_flagship)
    st = state
    st, aux = compiled(st, batch, key)
    float(np.asarray(aux["loss"]))
    t0 = time.perf_counter()
    for i in range(n_steps):
        st, aux = compiled(st, batch, jax.random.fold_in(key, i))
    float(np.asarray(aux["loss"]))
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3

    holder = {"st": st}

    def run_steps(n):
        for i in range(n):
            holder["st"], a = compiled(holder["st"], batch,
                                       jax.random.fold_in(key, 100 + i))
        float(np.asarray(a["loss"]))

    times = trace_times(run_steps, n_steps)

    sync_rows, async_rows = [], []
    for name, total_ms in times.items():
        ms = total_ms / n_steps
        kind, b, meta = bytes_tbl.get(name, ("?", 0, ""))
        gbs = b / (ms / 1e3) / 1e9 if ms > 0 else 0.0
        row = (ms, name, kind, b, gbs, gbs * 1e9 / V5E_HBM_BW, meta)
        # async ops (copy-start/slice-start/... and their -done halves) span
        # their whole overlap interval — NOT additive with compute self-time
        if "-start" in name or "-done" in name or "start" in kind:
            async_rows.append(row)
        else:
            sync_rows.append(row)
    sync_rows.sort(reverse=True)
    async_rows.sort(reverse=True)
    traced_ms = sum(r[0] for r in sync_rows)
    async_ms = sum(r[0] for r in async_rows)
    async_b = sum(r[3] for r in async_rows)

    out = []
    out.append("# Flagship bf16 per-fusion ledger (768x1280 batch 8, "
               "full train step)\n")
    out.append(
        f"Measured wall step: **{step_ms:.1f} ms**. Synchronous device ops "
        f"(fusions/convs/kernels) total **{traced_ms:.1f} ms/step** over "
        f"{n_steps} traced steps; the gap to wall is host dispatch + "
        f"inter-op bubbles + unhidden DMA. Async copy windows (copy-start/"
        f"done) additionally SPAN {async_ms:.1f} ms/step moving "
        f"{async_b/1e9:.2f} GB — these overlap compute and are listed "
        "separately (not additive). Roofline % = the op's own achieved GB/s "
        "(entry-HLO operand+result bytes / measured self-time) vs the v5e "
        "HBM peak (819 GB/s).\n")
    hdr = (f"| {'ms/step':>8} | {'% sync':>6} | {'MB':>9} | {'GB/s':>6} | "
           f"{'HBM %':>6} | kind | op |")
    sep = "|---:|---:|---:|---:|---:|---|---|"
    out.append(hdr)
    out.append(sep)
    for ms, name, kind, b, gbs, frac, meta in sync_rows[:top_n]:
        label = (meta or name)[:80].replace("|", "/")
        out.append(f"| {ms:8.3f} | {ms/traced_ms*100:5.1f}% | {b/1e6:9.1f} | "
                   f"{gbs:6.0f} | {frac*100:5.1f}% | {kind} | {label} |")
    tail_ms = traced_ms - sum(r[0] for r in sync_rows[:top_n])
    tail_b = sum(r[3] for r in sync_rows[top_n:])
    tail_gbs = tail_b / (tail_ms / 1e3) / 1e9 if tail_ms > 0 else 0.0
    out.append(f"| {tail_ms:8.3f} | {tail_ms/traced_ms*100:5.1f}% | "
               f"{tail_b/1e6:9.1f} | {tail_gbs:6.0f} | "
               f"{tail_gbs*1e9/V5E_HBM_BW*100:5.1f}% | (tail) | "
               f"{len(sync_rows)-top_n} smaller sync ops |")

    out.append("\n## Largest overlapped DMA windows (not additive with the "
               "table above)\n")
    out.append(f"| {'ms span':>8} | {'MB':>9} | op |")
    out.append("|---:|---:|---|")
    for ms, name, kind, b, gbs, frac, meta in async_rows[:10]:
        out.append(f"| {ms:8.3f} | {b/1e6:9.1f} | {(meta or name)[:80]} |")
    text = "\n".join(out)
    print(text)
    with open("/root/repo/docs/FLAGSHIP_LEDGER.md", "w") as f:
        f.write(text + "\n")
    print("\nwrote docs/FLAGSHIP_LEDGER.md", file=sys.stderr)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
