"""Checkpointing: orbax save/restore with the reference's cadence + true resume.

The reference saves three kinds of snapshot but never implements resume
(SURVEY.md §5 'Checkpoint / resume'; ref vessel_analysis/01_train/
train.py:164-182, train_kfold.py:212-226, mnist_test/01 train.py:97-101):

  best/    — val-loss-gated
  latest/  — every epoch (their comment says 'for resume', unimplemented)
  epoch_N/ — every ``period`` epochs (50 in the reference)

``CheckpointBook`` reproduces that cadence on orbax and adds the missing
half: ``restore_latest`` returns (state, epoch) so trainers continue
mid-run after preemption. ``load_torch_checkpoint`` + ``smart_port`` port
reference ``state_dict`` files into our parameter trees, including the
bicubic 2-D interpolation of ViT pos-embeddings for shape-mismatched restores
(ref latent_translator/main.py:35-87 ``smart_load_weights``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _pytree_io():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointBook:
    """best/latest/periodic checkpoint cadence + resume, per run directory."""

    def __init__(self, run_dir: str, period: int = 50):
        self.run_dir = os.path.abspath(run_dir)
        self.period = period
        self.best_val = float("inf")
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = _pytree_io().PyTreeCheckpointer()

    # -- save ------------------------------------------------------------
    def _save(self, name: str, state: Any, epoch: int):
        path = os.path.join(self.run_dir, name)
        self._ckptr.save(path, jax.device_get(state), force=True)
        with open(os.path.join(self.run_dir, f"{name}.meta.json"), "w") as f:
            json.dump({"epoch": epoch}, f)

    def end_of_epoch(self, state: Any, epoch: int, val_loss: Optional[float] = None):
        """Apply the reference cadence: latest every epoch, best on val-loss
        improvement, periodic snapshot every ``period`` epochs."""
        self._save("latest", state, epoch)
        if val_loss is not None and val_loss < self.best_val:
            self.best_val = float(val_loss)
            self._save("best", state, epoch)
            with open(os.path.join(self.run_dir, "best.meta.json"), "w") as f:
                json.dump({"epoch": epoch, "val_loss": self.best_val}, f)
        if self.period and (epoch + 1) % self.period == 0:
            self._save(f"epoch_{epoch + 1}", state, epoch)

    # -- restore ----------------------------------------------------------
    def restore(self, name: str, template: Any) -> Any:
        path = os.path.join(self.run_dir, name)
        return self._ckptr.restore(path, item=jax.device_get(template))

    def restore_latest(self, template: Any) -> Tuple[Any, int]:
        """True resume (absent in the reference): (state, next_epoch).

        Also restores the best-val watermark so a resumed run cannot
        overwrite a better pre-interruption 'best' checkpoint."""
        meta_path = os.path.join(self.run_dir, "latest.meta.json")
        if not os.path.exists(meta_path):
            return template, 0
        with open(meta_path) as f:
            epoch = json.load(f)["epoch"]
        best_meta = os.path.join(self.run_dir, "best.meta.json")
        if os.path.exists(best_meta):
            with open(best_meta) as f:
                self.best_val = float(json.load(f).get("val_loss", float("inf")))
        return self.restore("latest", template), epoch + 1


# ---------------------------------------------------------------------------
# PyTorch checkpoint porting (reference state_dicts -> our flax trees)
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``torch.save(state_dict)`` file to numpy arrays."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items()}


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kH, kW) -> flax NHWC kernel (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_convT_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax transpose_kernel=True
    expects (kH, kW, O, I) with torch's flipped-kernel convention intact."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return w.T


def interpolate_pos_embedding(
    pos: np.ndarray, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]
) -> np.ndarray:
    """Bicubic 2-D resize of ViT positional embeddings preserving the CLS
    token (the shape-adaptive load of ref latent_translator/main.py:35-87).

    pos: (1, src_h*src_w + 1, E) -> (1, dst_h*dst_w + 1, E)."""
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    sh, sw = src_hw
    dh, dw = dst_hw
    e = grid.shape[-1]
    grid = grid.reshape(sh, sw, e)
    resized = jax.image.resize(grid, (dh, dw, e), method="bicubic")
    resized = np.asarray(resized).reshape(1, dh * dw, e)
    return np.concatenate([cls_tok, resized], axis=1)


def smart_port(
    flat_target: dict,
    torch_state: dict,
    name_map: dict,
    *,
    pos_embedding_key: Optional[str] = None,
    src_grid: Optional[Tuple[int, int]] = None,
    dst_grid: Optional[Tuple[int, int]] = None,
    strict: bool = False,
) -> Tuple[dict, list]:
    """Port a torch state_dict into a flat {'a/b/kernel': array} target.

    name_map: {flax_flat_key: (torch_key, converter_fn)}. Shape-mismatched
    entries are skipped (torch load_state_dict(strict=False) semantics, ref
    vessel_analysis/00_core/models.py:203-206) unless they are the
    pos-embedding, which is bicubic-interpolated. Returns (ported, skipped)."""
    out = dict(flat_target)
    skipped = []
    for fkey, (tkey, conv) in name_map.items():
        if tkey not in torch_state:
            if strict:
                raise KeyError(tkey)
            skipped.append((fkey, "missing"))
            continue
        arr = conv(torch_state[tkey])
        want = np.shape(out[fkey])
        if arr.shape != want:
            if (
                pos_embedding_key is not None
                and fkey == pos_embedding_key
                and src_grid is not None
                and dst_grid is not None
            ):
                arr = interpolate_pos_embedding(arr, src_grid, dst_grid)
            if arr.shape != want:
                skipped.append((fkey, f"shape {arr.shape} != {want}"))
                continue
        out[fkey] = arr.astype(np.asarray(out[fkey]).dtype)
    return out, skipped


def flatten_params(tree: Any, prefix: str = "") -> dict:
    """Flatten a nested variable dict to {'a/b/kernel': leaf}."""
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = v
    return flat


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
