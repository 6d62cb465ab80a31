"""Production inference serving for the causal-VAE family.

The reference stops at analysis scripts that hand-invoke decoder pieces per
sample (ref vessel_analysis/04_generate_counterfactual/generate_counterfactual.py:15-118,
mnist_test/01_baseline_causal_vae/visualize.py:12-99); deploying those models
means wrapping the same three-step abduct/do/decode pattern behind a service.
This package is that service layer, TPU-first:

- ``endpoints``   pure, jit-ready inference functions (encode / decode /
                  reconstruct / predict_m / do_t counterfactual grids, plus
                  stacked-fold ensemble variants) built from a model + params.
- ``engine``      a dynamic-batching inference engine: concurrent requests
                  are coalesced into fixed-size bucket batches (static shapes
                  — the TPU/XLA way: one compile per bucket, zero recompiles
                  at serving time), padded, executed in one device launch and
                  split back per caller.
- ``export``      ahead-of-time deployment artifacts via ``jax.export``:
                  endpoints serialize to small StableHLO programs plus ONE
                  shared weights blob (weights are runtime arguments, never
                  inlined constants), so a serving host loads and calls them
                  without model code, flax, or a tracer in sight.
- ``http``        a dependency-free HTTP front-end (stdlib ``http.server``)
                  speaking ``.npz`` request/response bodies, driving the
                  batching engine from any number of client threads.
"""

from causalvae_tpu.serve.endpoints import (BoundEndpoint, ensemble_endpoints,
                                           vae_endpoints)
from causalvae_tpu.serve.engine import BatchingEngine
from causalvae_tpu.serve.export import export_endpoints, load_exported

__all__ = [
    "vae_endpoints",
    "ensemble_endpoints",
    "BoundEndpoint",
    "BatchingEngine",
    "export_endpoints",
    "load_exported",
]
