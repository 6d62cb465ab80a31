"""Pure inference endpoints for serving a trained causal VAE.

Each endpoint is a ``BoundEndpoint``: a pure function ``(params, *arrays) ->
arrays`` (batch on axis 0 of every array argument) bundled with the params
pytree it serves. Callers use it like a plain callable; the engine
(serve/engine.py) and exporter (serve/export.py) unbundle it so compiled
programs take the weights as runtime arguments instead of inlined constants
— see ``BoundEndpoint`` for why that matters at flagship scale. The endpoints cover the model entry points the reference's
analysis/counterfactual scripts invoke by hand:

- encode / decode / reconstruct    (ref vessel_analysis/04_generate_counterfactual/
                                    generate_counterfactual.py:54-108)
- predict_m  (mechanism M' = f(T),  ref vessel_analysis/00_core/models.py:243-250)
- do_t       (full counterfactual grid over every treatment target,
              ref mnist_test/01_baseline_causal_vae/visualize.py:12-99)
- uncertainty (Gaussian mechanism head sigma, ref models.py:53-60 /
              mnist_test/06_model_experiment/models.py:34-39)

``ensemble_endpoints`` builds the k-fold-ensemble variants (mean + spread)
from stacked fold parameters — one vmapped device launch per request, the
serving form of the reference's 5-checkpoint Python loops (ref
vessel_analysis/04_generate_counterfactual/ensemble_reconstruction.py:16-166).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from causalvae_tpu.scm import ensemble as E
from causalvae_tpu.scm import intervene as I

Endpoint = Callable[..., object]


class BoundEndpoint:
    """An endpoint as ``fn(params, *arrays)`` plus the params pytree it is
    bound to — kept SEPARATE so that when the engine / exporter jits ``fn``,
    the weights enter the compiled program as runtime arguments (resident in
    HBM), not as inlined HLO constants.

    Closing the weights over a jitted function inlines them into the StableHLO
    module; for the 768x1280 CausalViTVAE that is >100 MB of program text,
    which (a) bloats every AOT artifact by the full weight size per endpoint
    per bucket and (b) overflows program-size limits (the remote-compile
    tunnel rejects it outright with HTTP 413). Weights-as-arguments is also
    the correct deployment split: one params blob, many small programs.

    Instances are directly callable (``ep(*arrays)``) so ad-hoc/eager use and
    everything downstream of ``vae_endpoints`` keeps the plain-callable
    contract.
    """

    __slots__ = ("fn", "params", "doc")

    def __init__(self, fn: Callable, params, doc: Optional[str] = None):
        self.fn = fn
        self.params = params
        self.doc = doc if doc is not None else fn.__doc__

    def __call__(self, *args):
        return self.fn(self.params, *args)


def vae_endpoints(
    model,
    variables,
    *,
    t_targets: Optional[jnp.ndarray] = None,
) -> Dict[str, Endpoint]:
    """Build the serving endpoints for one trained model.

    Works for any model exposing ``encode(x, m, t)``, ``decode(m, z)`` and
    ``predict_m(t)`` (CausalConvVAE, CausalVesselVAE, CausalViTVAE — the
    same contract scm/intervene.py uses). ``t_targets`` fixes the
    counterfactual target set for the ``do_t`` endpoint (default: the
    identity matrix over all t_dim conditions, i.e. "every treatment").
    """
    if t_targets is None:
        t_dim = int(model.t_dim)
        t_targets = jnp.eye(t_dim, dtype=jnp.float32)
    t_targets = jnp.asarray(t_targets)

    def encode(v, x, m, t):
        """(mu, logvar) of q(z | x, m, t)."""
        return model.apply(v, x, m, t, method=model.encode)

    def decode(v, m, z):
        """x' = decode(m, z)."""
        return model.apply(v, m, z, method=model.decode)

    def predict_m(v, t):
        """Mechanism mean M' = f(T)."""
        return model.apply(v, t, method=model.predict_m)

    def reconstruct(v, x, m, t):
        """Mean-abducted reconstruction: decode(m, E[z | x, m, t])."""
        mu, _ = encode(v, x, m, t)
        return decode(v, m, mu)

    def do_t(v, x, m, t):
        """Counterfactual grid: (B, n_targets, *image) — abduct each source's
        z, then decode under every target treatment's mechanism output."""
        return I.do_t_grid(model, v, x, m, t, t_targets)

    eps: Dict[str, Endpoint] = {
        name: BoundEndpoint(fn, variables)
        for name, fn in (("encode", encode), ("decode", decode),
                         ("predict_m", predict_m),
                         ("reconstruct", reconstruct), ("do_t", do_t))
    }

    # Gaussian mechanism head (Bayesian variants): aleatoric sigma per (T, F).
    # Probed structurally (flax setup attrs are invisible on unbound modules,
    # and CausalConvVAE's mechanism is gaussian only when configured so).
    def _morph_raw(v, t):
        return model.apply(v, t, method=lambda mdl, t_: mdl.morph(t_))

    if getattr(model, "gaussian_mechanism", True):
        try:
            out = jax.eval_shape(_morph_raw, variables,
                                 jnp.zeros((1, t_targets.shape[-1])))
            gaussian = isinstance(out, tuple) and len(out) == 2
        except Exception:
            gaussian = False
        if gaussian:
            def uncertainty(v, t):
                """(m_mu, m_sigma) of P(M | T)."""
                m_mu, m_logvar = _morph_raw(v, t)
                return m_mu, jnp.exp(0.5 * jnp.clip(m_logvar, -10.0, 10.0))

            eps["uncertainty"] = BoundEndpoint(uncertainty, variables)
    return eps


def ensemble_endpoints(model, stacked_variables) -> Dict[str, Endpoint]:
    """Serving endpoints over a k-fold ensemble (stacked fold parameters).

    ``decode``/``predict_m`` return (mean, spread) across folds — the
    ensemble uncertainty surface of the reference's analysis stage served
    online (ref ensemble_reconstruction.py:54-92, kfold_pairwise.py:80-127).
    """

    def decode(v, m, z):
        return E.ensemble_decode(model, v, m, z)

    def predict_m(v, t):
        return E.ensemble_predict_m(model, v, t)

    def uncertainty(v, t):
        # scm-layer shape is fold-leading (K, B, m) for the analysis
        # pipelines; the serving contract is batch-leading rows (the
        # BatchingEngine scatters coalesced results by axis 0), so expose
        # (B, K, m) per output. Caught when first serving this endpoint
        # through the engine (round 5) — a fold-leading result would hand
        # each client fold-0 slices of OTHER clients' rows.
        m_mu, m_sigma = E.ensemble_morph_distribution(model, v, t)
        return m_mu.swapaxes(0, 1), m_sigma.swapaxes(0, 1)

    return {name: BoundEndpoint(fn, stacked_variables)
            for name, fn in (("decode", decode), ("predict_m", predict_m),
                             ("uncertainty", uncertainty))}


def endpoint_arg_specs(
    model, *, m_dim: Optional[int] = None, t_dim: Optional[int] = None,
    z_dim: Optional[int] = None, img_hw=None, channels: int = 1,
) -> Dict[str, tuple]:
    """Per-sample (batch-axis-stripped) argument shapes for each endpoint —
    the shape contract serve/export.py and serve/engine.py compile against."""
    m_dim = int(m_dim if m_dim is not None else model.m_dim)
    t_dim = int(t_dim if t_dim is not None else model.t_dim)
    z_dim = int(z_dim if z_dim is not None else model.z_dim)
    if img_hw is None:
        img_hw = tuple(getattr(model, "img_size", (28, 28)))
    img = (*img_hw, channels)
    return {
        "encode": (img, (m_dim,), (t_dim,)),
        "decode": ((m_dim,), (z_dim,)),
        "predict_m": ((t_dim,),),
        "reconstruct": (img, (m_dim,), (t_dim,)),
        "do_t": (img, (m_dim,), (t_dim,)),
        "uncertainty": ((t_dim,),),
    }
