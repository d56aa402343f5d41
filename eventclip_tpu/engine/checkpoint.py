"""Checkpointing.

Mirrors the reference's checkpoint conventions (nerv trainer + state-dict
surgery):
- checkpoints are **CLIP-free**: only trainable leaves are saved (ZS/FS drop
  every `model.*` key, models/clip_cls.py:208-219; FT additionally keeps
  `model.visual.*`, models/clip_cls_ft.py:313-333) — here that is the
  `trainable_mask` subtree, so a ViT-L/14 few-shot checkpoint is ~MBs;
- a rolling `model_<step>.npz` every save interval plus a `best.npz` tracking
  `val/probs_acc` max (config ckp_monitor, e.g.
  configs/fsclip/joint_adapter/joint_fsclip_ncaltech_params.py:74-75);
- full-state `resume.pkl` (params + optimizer + step + rng) for preemption
  resume (reference: Slurm requeue + find_old_slurm_id, train.py:51-63).

Format: npz keyed by '/'-joined tree paths — portable, inspectable, no
framework lock-in.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..models.classifier import ClassifierConfig
from ..models.partition import trainable_mask, trainable_subtree
from ..utils.pytree import path_str

Params = Dict[str, Any]


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        flat[path_str(path)] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, tree, *, extra: Optional[dict] = None) -> None:
    """Save a pytree (None leaves skipped) as a path-keyed npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str, target=None):
    """Load an npz checkpoint — or a reference-trained torch ``.pth``/
    ``.pt`` method checkpoint, converted on the fly (convert_method.py),
    so every ``--weight`` surface accepts the reference's files directly.

    With `target`, returns a copy of `target` with every saved leaf replaced
    (missing leaves keep the target value — that is how the frozen CLIP
    weights get re-injected at load, clip_cls.py:216-219). Without `target`,
    returns the raw {path: array} dict.
    """
    if path.endswith((".pth", ".pt")):
        from ..models.clip.convert_method import load_method_checkpoint

        flat, extra = _flatten(load_method_checkpoint(path)), {}
    else:
        with np.load(path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files
                    if not k.startswith("__extra__/")}
            extra = {
                k[len("__extra__/"):]: z[k]
                for k in z.files
                if k.startswith("__extra__/")
            }
    if target is None:
        return flat, extra

    consumed = set()

    def replace(path_entries, leaf):
        key = path_str(path_entries)
        if key in flat:
            consumed.add(key)
            loaded = flat[key]
            assert loaded.shape == tuple(np.shape(leaf)), (
                f"{key}: ckpt {loaded.shape} vs target {np.shape(leaf)}"
            )
            # read the dtype without np.asarray(leaf): that would fetch
            # every target leaf (incl. the GB-scale frozen CLIP tower)
            # device->host through the slow relay
            dtype = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
            return jax.numpy.asarray(loaded, dtype=dtype)
        return leaf

    out = jax.tree_util.tree_map_with_path(replace, target), extra
    unconsumed = sorted(set(flat) - consumed)
    if unconsumed:
        # silently ignoring saved weights means evaluating an UNTRAINED
        # model while claiming the checkpoint loaded — the reference's
        # strict=True errors here too (clip_cls.py:214-219); usually a
        # checkpoint/config mismatch (e.g. a LoRA ckpt with an FS config)
        raise ValueError(
            f"{len(unconsumed)} checkpoint leaves match no parameter in "
            f"this model (checkpoint/config mismatch?): "
            f"{unconsumed[:6]}{'...' if len(unconsumed) > 6 else ''}"
        )
    return out


def save_trainable(path: str, cfg: ClassifierConfig, params: Params,
                   *, extra: Optional[dict] = None) -> None:
    """Save only the trainable leaves (the reference's CLIP-free state dict)."""
    sub = trainable_subtree(params, trainable_mask(cfg, params))
    save_checkpoint(path, sub, extra=extra)


def fetch_opt_state(opt_state):
    """Host copy of an optimizer state tree.

    Plain np.asarray covers single-process runs and replicated leaves;
    leaves sharded ACROSS processes (ZeRO-1 moments on a multi-host mesh)
    need a gather — which is a COLLECTIVE: in multi-process runs every
    rank must call this, even though only rank 0 writes resume.pkl
    (trainer.fit orders it so)."""

    def to_host(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(to_host, opt_state)


class CheckpointManager:
    """Rolling + best checkpoint management under `<ckpt_dir>/models/`.

    File naming mirrors the reference's discovery logic (test.py:156-167):
    `best.npz` for the monitored-metric max, `model_<step>.npz` rolling.
    """

    def __init__(self, ckpt_dir: str, cfg: ClassifierConfig,
                 monitor: str = "probs_acc", keep_last: int = 3):
        self.dir = os.path.join(ckpt_dir, "models")
        os.makedirs(self.dir, exist_ok=True)
        self.cfg = cfg
        self.monitor = monitor
        self.keep_last = keep_last
        self.best_metric = -np.inf

    def save(self, params: Params, step: int,
             metrics: Optional[Dict[str, float]] = None) -> None:
        path = os.path.join(self.dir, f"model_{step}.npz")
        save_trainable(path, self.cfg, params, extra={"step": step})
        self._prune()
        if metrics and self.monitor in metrics:
            val = float(metrics[self.monitor])
            if val > self.best_metric:
                self.best_metric = val
                save_trainable(
                    os.path.join(self.dir, "best.npz"), self.cfg, params,
                    extra={"step": step, self.monitor: val},
                )

    def save_resume_state(self, state, epoch: int,
                          opt_state_host=None) -> None:
        """Resume state: trainable leaves + optimizer (frozen CLIP weights
        are re-derivable from the CLIP checkpoint at startup, so they are
        not fetched/stored — a ViT-L/14 resume file stays MBs, and the
        device->host fetch stays off the training critical path).

        opt_state_host: pre-fetched host copy of state.opt_state. Required
        in ZeRO-1 multi-process runs, where the data-sharded moments are
        not addressable from rank 0 alone — every rank must join the
        gather (fetch_opt_state) BEFORE the rank-0-only file write."""
        trainable = trainable_subtree(
            state.params, trainable_mask(self.cfg, state.params)
        )
        if opt_state_host is None:
            opt_state_host = fetch_opt_state(state.opt_state)
        blob = {
            "step": int(state.step),
            "epoch": epoch,
            "params": _flatten(trainable),
            "opt_state": opt_state_host,
            "rng": np.asarray(state.rng),
            "best_metric": self.best_metric,
        }
        tmp = os.path.join(self.dir, "resume.pkl.tmp")
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, os.path.join(self.dir, "resume.pkl"))

    def load_resume_state(self, state):
        """Restore a TrainState from resume.pkl; returns (state, epoch) or None."""
        path = os.path.join(self.dir, "resume.pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            blob = pickle.load(f)
        flat = blob["params"]

        def replace(path_entries, leaf):
            key = path_str(path_entries)
            return jax.numpy.asarray(flat[key]) if key in flat else leaf

        params = jax.tree_util.tree_map_with_path(replace, state.params)
        opt_state = jax.tree_util.tree_map(
            lambda tgt, src: jax.numpy.asarray(src), state.opt_state,
            blob["opt_state"],
        )
        self.best_metric = float(blob.get("best_metric", -np.inf))
        new_state = state._replace(
            step=jax.numpy.asarray(blob["step"], dtype=jax.numpy.int32),
            params=params,
            opt_state=opt_state,
            rng=jax.numpy.asarray(blob["rng"]),
        )
        return new_state, int(blob["epoch"])

    def _prune(self) -> None:
        paths = glob.glob(os.path.join(self.dir, "model_*.npz"))

        def step_of(p):
            m = re.search(r"model_(\d+)\.npz$", p)
            return int(m.group(1)) if m else -1

        for p in sorted(paths, key=step_of)[: -self.keep_last]:
            os.remove(p)

    def latest(self) -> Optional[str]:
        """best.npz if present else the newest rolling ckpt (test.py:156-167)."""
        best = os.path.join(self.dir, "best.npz")
        if os.path.exists(best):
            return best
        paths = glob.glob(os.path.join(self.dir, "model_*.npz"))
        if not paths:
            return None
        return max(paths, key=lambda p: int(re.search(r"model_(\d+)", p).group(1)))
