"""OpenAI CLIP checkpoint -> parameter pytree conversion.

Accepts a torch state_dict (as produced by `clip.load(...).state_dict()` or
by torch.load of the released .pt archives, reference train.py:26) either as
torch tensors or numpy arrays, and emits the layer-stacked pytree consumed by
eventclip_tpu.models.clip.model.

Both tower families are supported: ViT checkpoints (the reference's default
and best-performing towers) and the five ModifiedResNet checkpoints
(RN50..RN50x64, BatchNorms folded into affine pairs at conversion —
`_infer_resnet_config` / `_convert_resnet_visual` below).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .config import CLIPConfig, TextConfig, VisionConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def infer_config_from_state_dict(sd: Mapping[str, Any]) -> CLIPConfig:
    """Recover the architecture hyper-parameters from checkpoint shapes."""
    if "visual.attnpool.c_proj.weight" in sd:
        return _infer_resnet_config(sd)
    conv1 = _np(sd["visual.conv1.weight"])
    width, _, patch, _ = conv1.shape
    seq_len = _np(sd["visual.positional_embedding"]).shape[0]
    grid = int(round((seq_len - 1) ** 0.5))
    image_size = grid * patch
    v_layers = (
        max(
            int(k.split(".")[3])
            for k in sd
            if k.startswith("visual.transformer.resblocks.")
        )
        + 1
    )
    heads = max(width // 64, 1)
    output_dim = _np(sd["visual.proj"]).shape[1]
    t_width = _np(sd["ln_final.weight"]).shape[0]
    t_layers = (
        max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
        + 1
    )
    vocab, _ = _np(sd["token_embedding.weight"]).shape
    context = _np(sd["positional_embedding"]).shape[0]
    return CLIPConfig(
        name=f"ViT-{width}/{patch}@{image_size}",
        vision=VisionConfig(
            image_size=image_size,
            patch_size=patch,
            width=width,
            layers=v_layers,
            heads=heads,
            output_dim=output_dim,
        ),
        text=TextConfig(
            vocab_size=vocab,
            context_length=context,
            width=t_width,
            layers=t_layers,
            heads=max(t_width // 64, 1),
            output_dim=output_dim,
        ),
    )


def _stack_blocks(sd: Mapping[str, Any], prefix: str, layers: int) -> Dict[str, Any]:
    def gather(suffix):
        return np.stack([_np(sd[f"{prefix}.{i}.{suffix}"]) for i in range(layers)])

    wqkv = gather("attn.in_proj_weight")  # [L, 3D, D]
    bqkv = gather("attn.in_proj_bias")  # [L, 3D]
    L, D3, D = wqkv.shape
    return {
        "ln_1": {"scale": gather("ln_1.weight"), "bias": gather("ln_1.bias")},
        "ln_2": {"scale": gather("ln_2.weight"), "bias": gather("ln_2.bias")},
        "attn": {
            # q/k/v axis made explicit so TP can shard D_out head-aligned
            # (model.py attention layout)
            "wqkv": wqkv.reshape(L, 3, D, D),
            "bqkv": bqkv.reshape(L, 3, D),
            "wo": gather("attn.out_proj.weight"),
            "bo": gather("attn.out_proj.bias"),
        },
        "mlp": {
            "w1": gather("mlp.c_fc.weight"),
            "b1": gather("mlp.c_fc.bias"),
            "w2": gather("mlp.c_proj.weight"),
            "b2": gather("mlp.c_proj.bias"),
        },
    }


def _infer_resnet_config(sd: Mapping[str, Any]) -> CLIPConfig:
    from .resnet import ResNetVisionConfig

    width = _np(sd["visual.conv3.weight"]).shape[0]  # stem output width
    layers = []
    for s in range(1, 5):
        n = max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith(f"visual.layer{s}.")
        ) + 1
        layers.append(n)
    output_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    n_tokens = _np(sd["visual.attnpool.positional_embedding"]).shape[0]
    grid = int(round((n_tokens - 1) ** 0.5))
    t_width = _np(sd["ln_final.weight"]).shape[0]
    t_layers = max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    ) + 1
    vocab, _ = _np(sd["token_embedding.weight"]).shape
    context = _np(sd["positional_embedding"]).shape[0]
    return CLIPConfig(
        name=f"RN-w{width}",
        vision=ResNetVisionConfig(
            image_size=grid * 32, layers=tuple(layers), width=width,
            heads=width * 32 // 64, output_dim=output_dim,
        ),
        text=TextConfig(
            vocab_size=vocab, context_length=context, width=t_width,
            layers=t_layers, heads=max(t_width // 64, 1),
            output_dim=output_dim,
        ),
    )


def _fold_bn(sd: Mapping[str, Any], prefix: str, eps: float = 1e-5) -> Dict[str, Any]:
    """Fold frozen batch-norm statistics into an affine scale/bias."""
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _convert_resnet_visual(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    v = cfg.vision
    visual: Dict[str, Any] = {
        "stem": {
            "conv1": _np(sd["visual.conv1.weight"]),
            "bn1": _fold_bn(sd, "visual.bn1"),
            "conv2": _np(sd["visual.conv2.weight"]),
            "bn2": _fold_bn(sd, "visual.bn2"),
            "conv3": _np(sd["visual.conv3.weight"]),
            "bn3": _fold_bn(sd, "visual.bn3"),
        }
    }
    for s in range(1, 5):
        def block(i):
            pre = f"visual.layer{s}.{i}"
            p = {
                "conv1": _np(sd[f"{pre}.conv1.weight"]),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": _np(sd[f"{pre}.conv2.weight"]),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": _np(sd[f"{pre}.conv3.weight"]),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            # CLIP downsample = Sequential(avgpool, conv '0', bn '1')
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": _np(sd[f"{pre}.downsample.0.weight"]),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            return p

        n = cfg.vision.layers[s - 1]
        rest = None
        if n > 1:
            import jax

            rest_blocks = [block(i) for i in range(1, n)]
            rest = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *rest_blocks
            )
        visual[f"layer{s}"] = {"block0": block(0), "rest": rest}

    def lin(prefix):
        return {
            "w": _np(sd[f"{prefix}.weight"]),
            "b": _np(sd[f"{prefix}.bias"]),
        }

    visual["attnpool"] = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": lin("visual.attnpool.q_proj"),
        "k_proj": lin("visual.attnpool.k_proj"),
        "v_proj": lin("visual.attnpool.v_proj"),
        "c_proj": lin("visual.attnpool.c_proj"),
    }
    return visual


def convert_vit_visual(sd: Mapping[str, Any],
                       layers: int = None) -> Dict[str, Any]:
    """ViT visual-tower keys (``visual.*``) -> our visual pytree. Also used
    by convert_method (FT checkpoints carry ``model.visual.*`` only,
    reference models/clip_cls_ft.py:313-321)."""
    if layers is None:
        layers = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith("visual.transformer.resblocks.")
        )
    conv1 = _np(sd["visual.conv1.weight"])
    return {
        "patch_embed": conv1.reshape(conv1.shape[0], -1),
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": {
            "scale": _np(sd["visual.ln_pre.weight"]),
            "bias": _np(sd["visual.ln_pre.bias"]),
        },
        "ln_post": {
            "scale": _np(sd["visual.ln_post.weight"]),
            "bias": _np(sd["visual.ln_post.bias"]),
        },
        "proj": _np(sd["visual.proj"]),
        "blocks": _stack_blocks(sd, "visual.transformer.resblocks", layers),
    }


def convert_clip_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> {'visual': ..., 'text': ..., 'logit_scale': ...}."""
    cfg = infer_config_from_state_dict(sd)
    if "visual.attnpool.c_proj.weight" in sd:
        text = {
            "token_embedding": _np(sd["token_embedding.weight"]),
            "positional_embedding": _np(sd["positional_embedding"]),
            "ln_final": {
                "scale": _np(sd["ln_final.weight"]),
                "bias": _np(sd["ln_final.bias"]),
            },
            "projection": _np(sd["text_projection"]),
            "blocks": _stack_blocks(sd, "transformer.resblocks",
                                    cfg.text.layers),
        }
        return {
            "visual": _convert_resnet_visual(sd, cfg),
            "text": text,
            "logit_scale": _np(sd["logit_scale"]).reshape(()),
        }
    v, t = cfg.vision, cfg.text
    visual = convert_vit_visual(sd, v.layers)
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "projection": _np(sd["text_projection"]),
        "blocks": _stack_blocks(sd, "transformer.resblocks", t.layers),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


def load_clip_checkpoint(path: str):
    """Load an OpenAI CLIP .pt (jit archive or plain state dict) from disk."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    params = convert_clip_state_dict(obj)
    cfg = infer_config_from_state_dict(obj)
    return params, cfg
