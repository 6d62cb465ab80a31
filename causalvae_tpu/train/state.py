"""Train state containers (flax.struct pytrees) shared by all trainers."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Params + batch stats + optimizer state for one model."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            tx=tx,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if new_batch_stats is None else new_batch_stats,
            step=self.step + 1,
        )


def adam(lr: float, mu_dtype=None) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8).

    ``mu_dtype`` stores the FIRST-moment accumulator in a reduced dtype
    (update math stays f32). On the flagship CausalViTVAE 92% of parameters
    sit in one 126M-param Dense (models/vit.py decoder_input); its f32 Adam
    state dominates the train step's optimizer HBM traffic, and bf16 mu cuts
    ~0.5 GB/step. bf16 is safe for mu (b1=0.9: per-step relative change
    ~10% >> bf16's 2^-9 resolution); nu stays f32 — its 0.1% updates would
    round to nothing in bf16 and freeze the second moment."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype)


def adam_clipped(lr: float, max_norm: Optional[float],
                 mu_dtype=None) -> optax.GradientTransformation:
    """Adam with global-norm gradient clipping (vessel uses max_norm=5.0,
    ref vessel_analysis/01_train/train.py:85)."""
    if max_norm is None:
        return adam(lr, mu_dtype)
    return optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.scale_by_adam(mu_dtype=mu_dtype),
        optax.scale(-lr),
    )
