"""Ahead-of-time deployment artifacts via ``jax.export`` (StableHLO).

``export_endpoints`` lowers each serving endpoint (serve/endpoints.py) at a
ladder of static batch-size buckets and serializes the artifact to a
directory. A ``BoundEndpoint``'s parameters are NOT baked into the program:
the StableHLO takes the (flattened) weight leaves as leading runtime
arguments, and the weights are written ONCE per bundle as an ``.npz`` blob —
so a flagship-sized model produces small per-bucket programs plus one shared
weights file, instead of every artifact carrying (and every compile
ingesting) >100 MB of inlined constants:

    out/
      manifest.json            # shapes, dtypes, buckets, platform, versions
      params.0.npz             # weight leaves, shared across endpoints
      encode.b1.jaxexp         # jax.export serialized bytes (small program)
      encode.b8.jaxexp
      ...

A serving host then needs only ``load_exported(out)`` — no model code, no
flax, no tracing: artifacts deserialize into callables, the bundle loads the
weight blob to device once, and ``ExportedBundle`` routes a request of any
batch size to the smallest bucket that fits (padding by row repetition,
slicing the result back).

Why static buckets instead of a symbolic batch dimension: on TPU, XLA
compiles one executable per concrete shape anyway, and the hot models here
(phase-packed convs, Pallas attention) constrain layouts per shape — a fixed
ladder gives predictable latency and zero serving-time recompiles, which is
the deployment story the reference (per-sample eager PyTorch loops, ref
vessel_analysis/04_generate_counterfactual/generate_counterfactual.py:85-108)
never had.

Artifacts record the export platform (``jax.default_backend()``); load on the
same platform family. Cross-platform deployment re-runs the (cheap) export on
the target host.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS: Tuple[int, ...] = (1, 8, 32)
_MANIFEST = "manifest.json"


def _specs_for(arg_shapes: Sequence[Tuple[int, ...]], bucket: int, dtype):
    import jax

    return tuple(
        jax.ShapeDtypeStruct((bucket, *shape), dtype) for shape in arg_shapes
    )


def _save_leaves(path: str, leaves) -> list:
    """Write pytree leaves as ``p0..pN`` in one npz; extended dtypes that the
    npy format can't hold (bfloat16) are stored bit-cast to uint16. Returns
    the per-leaf dtype names for the manifest."""
    arrs, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(a.dtype.name)
        if a.dtype.name == "bfloat16":
            a = a.view(np.uint16)
        arrs[f"p{i}"] = a
    np.savez(path, **arrs)
    return dtypes


def _load_leaves(path: str, dtypes: Sequence[str]) -> list:
    with np.load(path) as z:
        out = []
        for i, dt in enumerate(dtypes):
            a = z[f"p{i}"]
            if dt == "bfloat16":
                import ml_dtypes

                a = a.view(ml_dtypes.bfloat16)
            out.append(a)
    return out


def _flatten_bound(fn):
    """Split a BoundEndpoint into (flat-args export fn, leaves, leaf specs);
    plain callables pass through as (fn, None, ())."""
    import jax

    params = getattr(fn, "params", None)
    inner = getattr(fn, "fn", None)
    if params is None or inner is None:
        return fn, None, ()
    leaves, treedef = jax.tree.flatten(params)
    n = len(leaves)

    def fn_flat(*all_args):
        p = jax.tree.unflatten(treedef, all_args[:n])
        return inner(p, *all_args[n:])

    specs = tuple(
        jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype)
        for leaf in leaves
    )
    return fn_flat, leaves, specs


def export_endpoints(
    endpoints: Dict[str, Callable],
    arg_specs: Dict[str, Sequence[Tuple[int, ...]]],
    out_dir: str,
    *,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    dtype=np.float32,
    metadata: Optional[dict] = None,
) -> dict:
    """Serialize every (endpoint x bucket) to ``out_dir``; returns the manifest.

    ``arg_specs[name]`` lists the per-sample shapes of the endpoint's
    arguments (batch axis stripped) — see serve/endpoints.py
    ``endpoint_arg_specs``. Endpoints present in ``endpoints`` but missing
    from ``arg_specs`` are skipped (and vice versa).
    """
    import jax
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    buckets = tuple(sorted(set(int(b) for b in buckets)))
    dtype = np.dtype(dtype)
    manifest: dict = {
        "format": "causalvae-tpu.serve/1",
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
        "dtype": dtype.name,
        "buckets": list(buckets),
        "endpoints": {},
    }
    if metadata:
        manifest["metadata"] = metadata
    params_files: dict = {}  # id(params pytree) -> (fname, dtype names)
    for name, fn in endpoints.items():
        shapes = arg_specs.get(name)
        if shapes is None:
            continue
        export_fn, leaves, leaf_specs = _flatten_bound(fn)
        entry: dict = {"arg_shapes": [list(s) for s in shapes], "files": {}}
        if leaves is not None:
            pkey = id(getattr(fn, "params"))
            if pkey not in params_files:
                pname = f"params.{len(params_files)}.npz"
                dtypes = _save_leaves(os.path.join(out_dir, pname), leaves)
                params_files[pkey] = (pname, dtypes)
            pname, pdtypes = params_files[pkey]
            entry["params_file"] = pname
            entry["params_dtypes"] = pdtypes
        for b in buckets:
            exp = jexport.export(jax.jit(export_fn))(
                *leaf_specs, *_specs_for(shapes, b, dtype))
            fname = f"{name}.b{b}.jaxexp"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            entry["files"][str(b)] = fname
        manifest["endpoints"][name] = entry
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedBundle:
    """Loaded deployment artifacts: route any-batch requests onto the bucket
    ladder. Also usable directly as the endpoint table of a
    ``serve.engine.BatchingEngine`` (callables keyed by endpoint name)."""

    def __init__(self, out_dir: str):
        self.dir = os.path.abspath(out_dir)
        with open(os.path.join(self.dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._fns: Dict[Tuple[str, int], Callable] = {}
        self._params: Dict[str, tuple] = {}  # params_file -> device leaves

    def _param_leaves(self, name: str) -> tuple:
        """Device-resident weight leaves for an endpoint ('' if the endpoint
        was exported with constants baked in — pre-params-file bundles)."""
        entry = self.manifest["endpoints"][name]
        fname = entry.get("params_file")
        if fname is None:
            return ()
        if fname not in self._params:
            import jax

            leaves = _load_leaves(os.path.join(self.dir, fname),
                                  entry["params_dtypes"])
            self._params[fname] = tuple(jax.device_put(a) for a in leaves)
        return self._params[fname]

    @property
    def endpoint_names(self):
        return sorted(self.manifest["endpoints"])

    def buckets(self, name: str) -> Tuple[int, ...]:
        return tuple(
            sorted(int(b) for b in self.manifest["endpoints"][name]["files"])
        )

    def _fn(self, name: str, bucket: int) -> Callable:
        key = (name, bucket)
        if key not in self._fns:
            from jax import export as jexport

            fname = self.manifest["endpoints"][name]["files"][str(bucket)]
            with open(os.path.join(self.dir, fname), "rb") as f:
                exp = jexport.deserialize(f.read())
            self._fns[key] = exp.call
        return self._fns[key]

    def call(self, name: str, *args):
        """Invoke an endpoint on (n, ...) arrays; n is padded up to the
        smallest exported bucket (requests above the top bucket are chunked)."""
        import jax

        if name not in self.manifest["endpoints"]:
            raise KeyError(
                f"endpoint {name!r} not in bundle; have {self.endpoint_names}")
        arrs = [np.asarray(a) for a in args]
        n = arrs[0].shape[0]
        ladder = self.buckets(name)
        top = ladder[-1]
        if n > top:
            parts = [
                self.call(name, *(a[s : s + top] for a in arrs))
                for s in range(0, n, top)
            ]
            return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *parts)
        bucket = next(b for b in ladder if n <= b)
        if n < bucket:
            arrs = [
                np.concatenate([a, np.repeat(a[-1:], bucket - n, axis=0)], axis=0)
                for a in arrs
            ]
        dtype = np.dtype(self.manifest["dtype"])
        out = self._fn(name, bucket)(
            *self._param_leaves(name),
            *(a.astype(dtype, copy=False) for a in arrs))
        return jax.tree.map(lambda x: np.asarray(x)[:n], out)

    def as_endpoints(self) -> Dict[str, Callable]:
        """Endpoint table for BatchingEngine: each callable takes exact-bucket
        batches (the engine does the padding), picking the matching artifact."""

        def make(name):
            def fn(*args):
                return self.call(name, *args)

            return fn

        return {name: make(name) for name in self.endpoint_names}


def load_exported(out_dir: str) -> ExportedBundle:
    return ExportedBundle(out_dir)
