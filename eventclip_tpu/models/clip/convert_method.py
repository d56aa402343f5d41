"""Reference-trained EventCLIP *method* checkpoint -> trainable-leaf pytree.

The reference trains adapters/prompts/LoRA on top of frozen CLIP and saves
CLIP-free torch checkpoints (``model_<it>.pth`` / ``best.pth``):

- ZS/FS drop every ``model.*`` key from ``state_dict()`` (reference
  models/clip_cls.py:208-219), leaving ``adapter.*`` (TransformerAdapter,
  reference models/adapter.py:53-109) and — for ``text-...`` prompt tuning —
  the ``text_feats`` parameter (models/clip_cls.py:252-257);
- FT additionally keeps the visual tower under ``model.visual.*``
  (models/clip_cls_ft.py:313-321). With LoRA, the MHA fork replaces each
  resblock's ``attn.in_proj_weight`` parameter by a module holding the
  frozen ``merged_proj`` plus ``lora_down_{q,k,v}`` [r, D] /
  ``lora_up_{q,k,v}`` [D, r] (models/lora.py:104-148, injection :372-376;
  W_eff rows are q [0:D], k [D:2D], v [2D:3D], delta = up @ down with no
  extra scaling, :137-148); ``qkvo-...`` specs also wrap ``attn.out_proj``
  in a LoraInjectedLinear (``.linear.weight`` + ``.lora_down.weight`` /
  ``.lora_up.weight``, models/lora.py:8-58).

This module maps those key spaces onto this framework's parameter-tree
paths so a reference user can migrate trained weights:

    python scripts/convert_checkpoint.py best.pth best.npz
    python test.py --params <the same config> --weight best.npz ...

The emitted npz is exactly the trainable-leaf format engine/checkpoint.py
writes (missing leaves keep the target values at load — that is how the
frozen CLIP weights re-enter, mirroring clip_cls.py:214-219).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from .convert import _np, convert_vit_visual

LORA_SLOTS = ("q", "k", "v")


def _unwrap(obj) -> Mapping[str, Any]:
    """torch.load output -> the state dict (nerv and lightning trainers wrap
    it under 'state_dict'/'model'; a plain dict of tensors passes through)."""
    for key in ("state_dict", "model"):
        if isinstance(obj, Mapping) and key in obj and isinstance(
                obj[key], Mapping):
            return obj[key]
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    assert isinstance(obj, Mapping), f"not a state dict: {type(obj)}"
    return obj


def _layer_indices(sd: Mapping[str, Any], pattern: str) -> int:
    """Number of layers L for keys matching ``pattern`` (one capture group
    holding the layer index); asserts 0..L-1 are all present."""
    idx = {int(m.group(1)) for k in sd for m in [re.match(pattern, k)] if m}
    assert idx == set(range(len(idx))), f"non-contiguous layers {sorted(idx)}"
    return len(idx)


def _convert_adapter(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """``adapter.*`` (torch TransformerAdapter) -> our adapter pytree
    (models/adapter.py here; layer-stacked like the CLIP towers). The
    layouts agree leaf-for-leaf (torch Linear weights are [out, in] on both
    sides), so this is gather + stack, no transposes — the same mapping
    tests/test_adapter.py::torch_adapter round-trips."""
    L = _layer_indices(sd, r"adapter\.transformer_encoder\.layers\.(\d+)\.")

    def gather(suffix):
        return np.stack([
            _np(sd[f"adapter.transformer_encoder.layers.{i}.{suffix}"])
            for i in range(L)
        ])

    return {
        "in_proj": {"w": _np(sd["adapter.in_proj.weight"]),
                    "b": _np(sd["adapter.in_proj.bias"])},
        "out_proj": {"w": _np(sd["adapter.out_proj.weight"]),
                     "b": _np(sd["adapter.out_proj.bias"])},
        "blocks": {
            "attn": {
                "wqkv": gather("self_attn.in_proj_weight"),
                "bqkv": gather("self_attn.in_proj_bias"),
                "wo": gather("self_attn.out_proj.weight"),
                "bo": gather("self_attn.out_proj.bias"),
            },
            "mlp": {
                "w1": gather("linear1.weight"), "b1": gather("linear1.bias"),
                "w2": gather("linear2.weight"), "b2": gather("linear2.bias"),
            },
            "ln_1": {"scale": gather("norm1.weight"),
                     "bias": gather("norm1.bias")},
            "ln_2": {"scale": gather("norm2.weight"),
                     "bias": gather("norm2.bias")},
        },
    }


def _split_lora(visual_sd: Dict[str, Any]):
    """Separate injected-LoRA keys from a ``visual.*`` state dict.

    Returns (plain visual sd with ``attn.in_proj_weight`` /
    ``attn.out_proj.weight`` restored to their pre-injection names, lora
    pytree or None). Orientation: our per-layer leaves are a [r, D] and
    b [D, r] applied as (x @ a.T) @ b.T (model.py::_lora_delta) — exactly
    the reference's ``down`` and ``up``, so again a pure gather."""
    pre = "visual.transformer.resblocks"
    if f"{pre}.0.attn.in_proj_weight.merged_proj" not in visual_sd:
        return visual_sd, None
    L = _layer_indices(visual_sd, re.escape(pre) + r"\.(\d+)\.")
    plain, lora = dict(visual_sd), {}

    def take(i, suffix):
        return _np(plain.pop(f"{pre}.{i}.attn.{suffix}"))

    targets = [s for s in LORA_SLOTS
               if f"{pre}.0.attn.in_proj_weight.lora_down_{s}" in visual_sd]
    for i in range(L):
        plain[f"{pre}.{i}.attn.in_proj_weight"] = take(
            i, "in_proj_weight.merged_proj")
        for s in targets:
            lora.setdefault(s, {"a": [], "b": []})
            lora[s]["a"].append(take(i, f"in_proj_weight.lora_down_{s}"))
            lora[s]["b"].append(take(i, f"in_proj_weight.lora_up_{s}"))
        if f"{pre}.{i}.attn.out_proj.linear.weight" in plain:
            plain[f"{pre}.{i}.attn.out_proj.weight"] = take(
                i, "out_proj.linear.weight")
            plain[f"{pre}.{i}.attn.out_proj.bias"] = take(
                i, "out_proj.linear.bias")
            lora.setdefault("o", {"a": [], "b": []})
            lora["o"]["a"].append(take(i, "out_proj.lora_down.weight"))
            lora["o"]["b"].append(take(i, "out_proj.lora_up.weight"))
    lora = {t: {k: np.stack(v) for k, v in ab.items()}
            for t, ab in lora.items()}
    return plain, lora


def convert_method_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference method checkpoint (unwrapped state dict) -> nested pytree
    of this framework's parameter paths. Emits only what the checkpoint
    carries: 'adapter', 'text_feats', 'lora', 'clip'/'visual'."""
    out: Dict[str, Any] = {}
    if "text_feats" in sd:  # prompt tuning (clip_cls.py:252-257)
        out["text_feats"] = _np(sd["text_feats"])
    if "adapter.in_proj.weight" in sd:  # TransformerAdapter
        out["adapter"] = _convert_adapter(sd)
    visual_sd = {k[len("model."):]: v for k, v in sd.items()
                 if k.startswith("model.visual.")}
    if visual_sd:  # FT checkpoint (clip_cls_ft.py:313-321)
        if "visual.attnpool.c_proj.weight" in visual_sd:
            raise ValueError(
                "FT checkpoints with ResNet towers are not supported — the "
                "reference only fine-tunes ViT towers (every configs/ftclip "
                "config uses ViT-L/14)"
            )
        visual_sd, lora = _split_lora(visual_sd)
        if lora is not None:
            out["lora"] = lora
        out["clip"] = {"visual": convert_vit_visual(visual_sd)}
    known = {"text_feats", "adapter.dummy"}  # dummy: IdentityAdapter's leaf
    leftovers = [
        k for k in sd
        if k not in known and not k.startswith(("adapter.", "model.visual."))
    ]
    if leftovers:
        raise ValueError(
            f"unrecognized checkpoint keys (not a reference EventCLIP "
            f"method checkpoint?): {sorted(leftovers)[:8]}"
        )
    assert out, "checkpoint holds no trainable weights (zero-shot model?)"
    return out


def load_method_checkpoint(path: str) -> Dict[str, Any]:
    """Load + convert a reference ``.pth`` method checkpoint from disk."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return convert_method_state_dict(_unwrap(obj))
