"""Serving-path benchmark: dynamic-batching engine latency/throughput.

Measures, on whatever accelerator jax sees (the real TPU chip under the
driver):

1. single-request latency per endpoint (batch-1 bucket, warm);
2. throughput and coalescing behavior under N concurrent batch-1 clients
   (the production shape: many independent callers, one chip);
3. AOT-exported artifact latency (jax.export round-trip vs live jit).

Prints one JSON line. Usage: python scripts/serve_bench.py [n_clients]
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from causalvae_tpu.config import MnistConfig
from causalvae_tpu.models.vae import CausalConvVAE
from causalvae_tpu.serve.endpoints import endpoint_arg_specs, vae_endpoints
from causalvae_tpu.serve.engine import BatchingEngine


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = MnistConfig()
    model = CausalConvVAE(m_dim=cfg.m_dim, t_dim=cfg.t_dim, z_dim=cfg.z_dim,
                          gaussian_mechanism=True, decode_real_m=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x1 = jnp.zeros((1, 28, 28, 1))
    variables = model.init({"params": key}, x1, jnp.zeros((1, cfg.m_dim)),
                           jnp.zeros((1, cfg.t_dim)), rng=key)
    eps = vae_endpoints(model, variables)

    def batch(n):
        return (
            rng.random((n, 28, 28, 1)).astype(np.float32),
            rng.standard_normal((n, cfg.m_dim)).astype(np.float32),
            np.eye(cfg.t_dim, dtype=np.float32)[rng.integers(0, cfg.t_dim, n)],
        )

    out = {"device": jax.devices()[0].device_kind, "n_clients": n_clients}

    with BatchingEngine(eps, buckets=(1, 8, 64), max_delay_s=0.003) as eng:
        # 1. warm single-request latency
        lat = {}
        for name, args in (
            ("reconstruct", batch(1)),
            ("do_t", batch(1)),
            ("predict_m", (np.eye(cfg.t_dim, dtype=np.float32)[:1],)),
        ):
            eng.infer(name, *args)  # warm the b1 bucket
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                eng.infer(name, *args)
            lat[name] = round((time.perf_counter() - t0) / reps * 1e3, 2)
        out["single_request_ms"] = lat

        # 2. concurrent batch-1 clients (each sends `per_client` requests)
        for b in (8, 64):  # warm the coalesced buckets
            eng.infer("reconstruct", *batch(b))
        per_client = 8
        done = []

        def client(i):
            args = batch(1)
            for _ in range(per_client):
                r = np.asarray(eng.infer("reconstruct", *args))
            done.append(r.shape)

        launches0, rows0 = eng.stats["launches"], eng.stats["rows"]
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = n_clients * per_client
        out["concurrent"] = {
            "requests": total,
            "wall_s": round(dt, 3),
            "requests_per_sec": round(total / dt, 1),
            "device_launches": eng.stats["launches"] - launches0,
            "mean_rows_per_launch": round(
                (eng.stats["rows"] - rows0)
                / max(eng.stats["launches"] - launches0, 1), 2),
        }

    # 3. AOT artifact vs live jit (single request)
    import tempfile

    from causalvae_tpu.serve.export import export_endpoints, load_exported

    with tempfile.TemporaryDirectory() as d:
        export_endpoints({"reconstruct": eps["reconstruct"]},
                         endpoint_arg_specs(model), d, buckets=(1,))
        bundle = load_exported(d)
        args = batch(1)
        bundle.call("reconstruct", *args)  # load + warm
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            bundle.call("reconstruct", *args)
        out["aot_single_request_ms"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
