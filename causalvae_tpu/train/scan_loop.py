"""Device-resident scanned training: many optimizer steps per XLA dispatch.

The reference dispatches one torch kernel graph per batch from Python
(SURVEY.md §3.1 hot loop). On TPU, per-step host dispatch dominates once the
step itself is fast (the MNIST causal-VAE step is ~50 µs of device time but
a dispatch round-trip is ~10 ms through a remote runtime): the fix is to put
the *loop itself* on device with ``lax.scan`` over a stacked leading batch
axis, so one dispatch runs S steps. bench.py measures the headline number
through this path.

Works for any step function of the form
``step(*states, batch, rng) -> (*states, metrics)`` — both the single-state
VAE steps and the two-state adversarial MNIST step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_scan_epoch(step_fn: Callable, n_states: int = 1) -> Callable:
    """Wrap ``step_fn`` into a scanned multi-step program.

    Returns ``epoch(states, stacked_batches, rngs) -> (states, metrics)`` where
    ``states`` is a tuple of ``n_states`` train states, ``stacked_batches`` is
    a batch pytree with an extra leading steps axis, ``rngs`` is (S, 2) PRNG
    keys, and ``metrics`` has every leaf stacked over the S steps. Jit it with
    ``donate_argnums=0`` so parameter buffers are reused in place."""

    def epoch(states: Tuple, stacked_batches: Any, rngs: jax.Array):
        def body(carry, xs):
            batch, rng = xs
            out = step_fn(*carry, batch, rng)
            return tuple(out[:n_states]), out[n_states]

        states_out, metrics = jax.lax.scan(body, tuple(states), (stacked_batches, rngs))
        return states_out, metrics

    return epoch


def stack_batches(batches: Sequence[Dict[str, np.ndarray]]) -> Dict[str, jnp.ndarray]:
    """Stack a list of same-shape batch dicts along a new leading steps axis."""
    keys = batches[0].keys()
    return {k: jnp.stack([jnp.asarray(b[k]) for b in batches]) for k in keys}


def chunked(iterator: Iterator, size: int):
    """Yield lists of up to ``size`` items from ``iterator``."""
    chunk = []
    for item in iterator:
        chunk.append(item)
        if len(chunk) == size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


class ScanTrainer:
    """Drives a scanned step over a host batch iterator.

    Batches are grouped into fixed-size stacks (one XLA program per stack
    size, so at most two compiles: full stacks + one ragged tail)."""

    def __init__(self, step_fn: Callable, n_states: int = 1,
                 steps_per_dispatch: int = 32):
        self.n_states = n_states
        self.steps = steps_per_dispatch
        self._epoch = jax.jit(
            make_scan_epoch(step_fn, n_states), donate_argnums=0
        )

    def run_epoch(self, states: Tuple, batch_iter: Iterator[Dict], key: jax.Array,
                  drop_ragged_tail: bool = False):
        """Consume ``batch_iter``; returns (states, last_metrics).

        Ragged tails (fewer than steps_per_dispatch batches) trigger one extra
        compile the first time; pass drop_ragged_tail=True to skip them."""
        last_metrics: Optional[Dict] = None
        for group in chunked(batch_iter, self.steps):
            if drop_ragged_tail and len(group) < self.steps:
                break
            key, sub = jax.random.split(key)
            rngs = jax.random.split(sub, len(group))
            states, metrics = self._epoch(states, stack_batches(group), rngs)
            last_metrics = jax.tree.map(lambda a: a[-1], metrics)
        return states, last_metrics
