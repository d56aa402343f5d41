"""Optimizer construction.

Behavioral contract (reference method.py:82-98, 150-193):
- Adam or AdamW, weight_decay asserted 0 for FTCLIP;
- single LR group for ZS/FS; for FTCLIP two groups — adapter/prompt leaves at
  `lr`, CLIP visual-tower leaves at `clip_lr` — each with its own
  warmup-cosine schedule (dual max_lr/min_lr tuple in the reference);
- frozen leaves receive exactly zero updates (the reference excludes them
  from the optimizer via requires_grad; here via optax.multi_transform with
  `set_to_zero`, which also keeps optimizer state off frozen leaves).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import optax

from ..models.classifier import ClassifierConfig
from ..models.partition import trainable_mask
from ..utils.pytree import path_str
from .schedule import warmup_cosine

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"  # 'adam' | 'adamw'
    lr: float = 1e-3
    clip_lr: float = 1e-4  # FTCLIP visual-tower group
    weight_decay: float = 0.0
    total_steps: int = 1000
    warmup_steps_pct: float = 0.05
    grad_clip: float = 0.0  # reference: nerv clip_grad = -1 (off) by default


def optimizer_labels(cfg: ClassifierConfig, params: Params) -> Params:
    """Label pytree: 'frozen' | 'base' | 'visual' (the clip_lr group)."""
    mask = trainable_mask(cfg, params)

    def label(path, m):
        if not m:
            return "frozen"
        p = path_str(path)
        # reference groups by 'model.visual' in the torch param name
        # (method.py:166-172); LoRA deltas live inside the visual tower too
        if p.startswith("clip/visual") or p.startswith("lora"):
            return "visual"
        return "base"

    return jax.tree_util.tree_map_with_path(label, mask)


def _scaler(name: str, schedule, weight_decay: float):
    if name.lower() == "adam":
        assert weight_decay == 0.0
        return optax.adam(learning_rate=schedule)
    if name.lower() == "adamw":
        return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    raise ValueError(f"Should use Adam or AdamW optimizer! (got {name})")


def build_optimizer(
    cls_cfg: ClassifierConfig,
    opt_cfg: OptimConfig,
    params: Params,
) -> optax.GradientTransformation:
    base_sched = warmup_cosine(
        opt_cfg.lr, opt_cfg.total_steps, opt_cfg.warmup_steps_pct
    )
    visual_lr = opt_cfg.clip_lr if cls_cfg.model == "FTCLIP" else opt_cfg.lr
    visual_sched = warmup_cosine(
        visual_lr, opt_cfg.total_steps, opt_cfg.warmup_steps_pct
    )
    labels = optimizer_labels(cls_cfg, params)
    tx = optax.multi_transform(
        {
            "base": _scaler(opt_cfg.optimizer, base_sched, opt_cfg.weight_decay),
            "visual": _scaler(opt_cfg.optimizer, visual_sched, opt_cfg.weight_decay),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if opt_cfg.grad_clip and opt_cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(opt_cfg.grad_clip), tx)
    return tx
