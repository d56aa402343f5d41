"""Trainable-parameter partitioning.

The reference controls training granularity with requires_grad surgery
(models/clip_cls.py:38-44 freeze-all; models/clip_cls_ft.py:45-81 selective
unfreeze; LoRA injection). Here the same policy is a pure function from a
parameter tree to a boolean mask pytree, consumed by optax (zero-update for
frozen leaves) and by checkpointing (only trainable leaves are saved,
mirroring the reference's CLIP-free state dicts, clip_cls.py:208-219).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from .classifier import ClassifierConfig

from ..utils.pytree import path_str as _path_str

Params = Dict[str, Any]



def _visual_leaf_trainable(path: str, ft_mode: str) -> bool:
    if ft_mode == "full":
        return True
    if ft_mode == "lora":
        return False  # lora deltas live in their own subtree
    if ft_mode == "conv1":
        return path.endswith("patch_embed")
    if ft_mode == "bias":
        # every torch parameter with 'bias' in its name (clip_cls_ft.py:63-66):
        # LN biases, attention in/out-proj biases, MLP biases
        return path.endswith("bias") or path.split("/")[-1] in ("bqkv", "bo", "b1", "b2")
    if ft_mode == "ln":
        return any(seg.startswith("ln_") for seg in path.split("/"))
    if ft_mode == "cls_fc":
        return path.endswith("proj") and not path.endswith("patch_embed")
    if ft_mode == "cls_token":
        return path.endswith("class_embedding")
    raise NotImplementedError(ft_mode)


def trainable_mask(cfg: ClassifierConfig, params: Params) -> Params:
    """Boolean pytree: True where gradients should flow."""

    def decide(path, leaf) -> bool:
        p = _path_str(path)
        if p.startswith("text_feats"):
            return cfg.prompt_tuning
        if p.startswith("adapter"):
            return cfg.model == "FSCLIP"
        if p.startswith("lora"):
            return True
        if p.startswith("clip/visual"):
            return cfg.model == "FTCLIP" and _visual_leaf_trainable(p, cfg.ft_mode)
        return False  # text tower, logit_scale: always frozen

    return jax.tree_util.tree_map_with_path(decide, params)


def trainable_subtree(params: Params, mask: Params) -> Params:
    """Keep trainable leaves, None elsewhere (for adapter-only checkpoints)."""
    return jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)


def merge_trainable(params: Params, loaded: Params) -> Params:
    """Re-inject loaded trainable leaves into a full parameter tree."""
    return jax.tree_util.tree_map(
        lambda p, l: p if l is None else l, params, loaded,
        is_leaf=lambda x: x is None,
    )
