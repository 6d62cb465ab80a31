"""K-fold training driver: folds trained simultaneously across the mesh.

The reference trains 5 StratifiedKFold folds sequentially on one GPU
(ref vessel_analysis/01_train/train_kfold.py:142-246). Here every fold is a
slice of one stacked computation: parameters carry a leading fold axis sharded
over the mesh's ``fold`` axis, batches carry (fold, batch, ...) sharded over
(``fold``, ``data``), and one jitted vmapped step advances all folds at once —
5 folds of 150 epochs cost one fold's wall-clock on a v5e-8 (SURVEY.md T4
'opportunity').

Split indices come from sklearn's StratifiedKFold with the reference's exact
seed/shuffle (ref :173-175) so fold membership is bit-identical; the
``--verify`` stratification report (ref :117-140) is ``verify_stratification``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from causalvae_tpu.train.state import TrainState


@dataclasses.dataclass
class KFoldPlan:
    """Per-fold train/val index arrays over one dataset."""

    train_idx: List[np.ndarray]
    val_idx: List[np.ndarray]
    labels: np.ndarray

    @property
    def n_folds(self) -> int:
        return len(self.train_idx)


def stratified_kfold(labels: np.ndarray, n_splits: int = 5, seed: int = 42) -> KFoldPlan:
    """sklearn StratifiedKFold(shuffle=True, random_state=seed) — kept on host
    for bit-parity with the reference's fold membership (ref train_kfold.py:173)."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    train_idx, val_idx = [], []
    for tr, va in skf.split(np.zeros(len(labels)), labels):
        train_idx.append(tr.astype(np.int32))
        val_idx.append(va.astype(np.int32))
    return KFoldPlan(train_idx, val_idx, np.asarray(labels))


def verify_stratification(plan: KFoldPlan, group_names: Optional[Sequence[str]] = None) -> Dict:
    """Per-fold class coverage report (ref train_kfold.py:117-140 --verify)."""
    n_classes = int(plan.labels.max()) + 1
    report = {}
    for f in range(plan.n_folds):
        tr = np.bincount(plan.labels[plan.train_idx[f]], minlength=n_classes)
        va = np.bincount(plan.labels[plan.val_idx[f]], minlength=n_classes)
        report[f"fold_{f}"] = {
            "train_per_class": tr.tolist(),
            "val_per_class": va.tolist(),
            "val_missing_classes": [
                (group_names[c] if group_names else c)
                for c in range(n_classes) if va[c] == 0
            ],
        }
    return report


def make_fold_mesh(n_folds: int, devices: Optional[Sequence] = None,
                   batch_size: Optional[int] = None) -> Mesh:
    """fold x data mesh.

    With n_devices % n_folds == 0 the fold axis is a real mesh axis; otherwise
    folds map to the mesh via vmap (all folds resident, XLA interleaves) and
    the mesh is data-parallel only. When ``batch_size`` is given, the data
    axis shrinks to gcd(batch, available) so per-fold batches always shard
    evenly (8 devices / 5 folds / batch 4 -> a 1x4 mesh, not a crash)."""
    import math

    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    fold_size = n_folds if n % n_folds == 0 else 1
    data_size = n // fold_size
    if batch_size:
        data_size = math.gcd(batch_size, data_size) or 1
    devs = devs[: fold_size * data_size]
    return Mesh(np.asarray(devs).reshape(fold_size, data_size), ("fold", "data"))


@dataclasses.dataclass
class FoldBatcher:
    """Host-side per-fold batch index sampler; data itself stays on device."""

    plan: KFoldPlan
    batch_size: int
    seed: int = 0

    # NOTE: sampling is shuffled WITHOUT replacement within each fold-local
    # epoch (reshuffle when a pool is exhausted) — the same semantics as the
    # reference's DataLoader(shuffle=True), stacked across folds.

    def __post_init__(self):
        self._rngs = [
            np.random.default_rng(self.seed + 1000 * f)
            for f in range(self.plan.n_folds)
        ]
        self._pools = [idx.copy() for idx in self.plan.train_idx]
        self._cursor = [len(p) for p in self._pools]  # force initial shuffle

    def steps_per_epoch(self) -> int:
        return max(len(p) // self.batch_size for p in self._pools)

    def next_indices(self) -> np.ndarray:
        """(n_folds, batch_size) int32 gather indices into the full dataset."""
        out = np.empty((self.plan.n_folds, self.batch_size), np.int32)
        for f, pool in enumerate(self._pools):
            if self._cursor[f] + self.batch_size > len(pool):
                self._rngs[f].shuffle(pool)
                self._cursor[f] = 0
            out[f] = pool[self._cursor[f] : self._cursor[f] + self.batch_size]
            self._cursor[f] += self.batch_size
        return out


def init_stacked_states(
    init_one: Callable[[jax.Array], Any],
    tx,
    n_folds: int,
    seed: int = 0,
) -> Any:
    """Fresh per-fold params (independent inits, ref :181-199) stacked along a
    leading fold axis."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n_folds)
    stacked_vars = jax.vmap(init_one)(keys)
    return jax.vmap(lambda v: TrainState.create(v, tx))(stacked_vars)


def shard_fold_tree(tree: Any, mesh: Mesh) -> Any:
    """Shard a (fold, ...) stacked pytree along the mesh fold axis."""
    fold_sh = NamedSharding(mesh, P("fold"))
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda a: jax.device_put(a, fold_sh if getattr(a, "ndim", 0) >= 1 else rep),
        tree,
    )


def make_parallel_fold_step(step_fn: Callable) -> Callable:
    """vmap a (state, batch, rng) -> (state, metrics) step over the fold axis."""
    return jax.vmap(step_fn)


def gather_fold_batches(data: Dict[str, jnp.ndarray], idx: np.ndarray, mesh: Mesh) -> Dict:
    """Device-side gather of per-fold batches: data[k] (N, ...) ->
    (n_folds, batch, ...), sharded (fold, data); the batch dim falls back to
    replication when it does not divide the data axis (e.g. ragged val sets)."""
    data_size = mesh.shape["data"]
    spec = P("fold", "data") if idx.shape[1] % data_size == 0 else P("fold")
    sh = NamedSharding(mesh, spec)
    gidx = jnp.asarray(idx)
    return {k: jax.device_put(jnp.take(v, gidx, axis=0), sh) for k, v in data.items()}


def train_kfold(
    *,
    init_one: Callable[[jax.Array], Any],
    step_fn: Callable,
    eval_fn: Optional[Callable],
    tx,
    data: Dict[str, np.ndarray],
    labels: np.ndarray,
    epochs: int,
    batch_size: int,
    n_folds: int = 5,
    seed: int = 42,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_period: int = 50,
    log_every: int = 0,
    metrics_cb: Optional[Callable[[int, Dict], None]] = None,
) -> Tuple[Any, KFoldPlan, List[Dict]]:
    """Full k-fold training: returns (stacked final states, plan, history).

    data: dict of full-dataset arrays keyed like batches ('x', 'm', 't').
    step_fn: single-fold (state, batch, rng) -> (state, metrics).
    eval_fn: single-fold (state, batch, rng) -> metrics over one val batch.
      Ragged val folds are padded to the longest fold; the batch carries a
      validity mask under ``batch['w']`` (1 real / 0 padding) which the
      eval loss must honor (ops/losses.py sum losses take ``w=``). Reported
      val metrics are per-sample means over the *valid* samples, matching the
      reference's ``validate`` normalization (ref train_kfold.py:105-115,
      ``val_loss / len(dataset)``)."""
    from causalvae_tpu.train.checkpoints import CheckpointBook

    plan = stratified_kfold(labels, n_folds, seed)
    mesh = mesh or make_fold_mesh(n_folds, batch_size=batch_size)
    states = shard_fold_tree(init_stacked_states(init_one, tx, n_folds, seed), mesh)
    device_data = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, P()))
        for k, v in data.items()
    }
    batcher = FoldBatcher(plan, batch_size, seed)
    pstep = jax.jit(make_parallel_fold_step(step_fn))
    peval = jax.jit(make_parallel_fold_step(eval_fn)) if eval_fn else None

    books = None
    if checkpoint_dir:
        books = [
            CheckpointBook(f"{checkpoint_dir}/fold_{f}", period=checkpoint_period)
            for f in range(n_folds)
        ]

    # fixed-size val batches: pad ragged folds to the longest val set and
    # carry a validity mask so every real sample counts exactly once
    val_len = max(len(v) for v in plan.val_idx)
    val_idx = np.stack([
        np.pad(v, (0, val_len - len(v)), mode="edge") for v in plan.val_idx
    ])
    val_w = np.stack([
        (np.arange(val_len) < len(v)).astype(np.float32) for v in plan.val_idx
    ])
    val_counts = np.asarray([len(v) for v in plan.val_idx], np.float32)

    key = jax.random.PRNGKey(seed)
    history: List[Dict] = []
    steps = batcher.steps_per_epoch()
    for epoch in range(epochs):
        agg = None
        for s in range(steps):
            idx = batcher.next_indices()
            batch = gather_fold_batches(device_data, idx, mesh)
            key, sub = jax.random.split(key)
            rngs = jax.random.split(sub, n_folds)
            states, metrics = pstep(states, batch, rngs)
            agg = metrics if agg is None else jax.tree.map(jnp.add, agg, metrics)
        train_metrics = jax.tree.map(lambda a: np.asarray(a) / steps, agg)

        val_metrics = None
        if peval is not None:
            vbatch = gather_fold_batches(device_data, val_idx, mesh)
            vbatch["w"] = jax.device_put(
                jnp.asarray(val_w),
                NamedSharding(
                    mesh,
                    P("fold", "data") if val_len % mesh.shape["data"] == 0
                    else P("fold"),
                ),
            )
            key, sub = jax.random.split(key)
            val_metrics = jax.tree.map(
                np.asarray, peval(states, vbatch, jax.random.split(sub, n_folds))
            )
            # per-sample means over valid samples (ref validate normalization)
            val_metrics = jax.tree.map(
                lambda a: a / val_counts if a.shape == val_counts.shape else a,
                val_metrics,
            )
        rec = {"epoch": epoch, "train": train_metrics, "val": val_metrics}
        history.append(rec)
        if metrics_cb:
            metrics_cb(epoch, rec)
        if log_every and (epoch + 1) % log_every == 0:
            vl = val_metrics["loss"] if val_metrics else train_metrics["loss"]
            print(f"[kfold] epoch {epoch + 1}/{epochs} loss per fold: {vl}")
        if books:
            host_states = jax.device_get(states)
            for f in range(n_folds):
                st_f = jax.tree.map(lambda a: a[f], host_states)
                vl = float(val_metrics["loss"][f]) if val_metrics else None
                books[f].end_of_epoch(st_f, epoch, vl)
    return states, plan, history
