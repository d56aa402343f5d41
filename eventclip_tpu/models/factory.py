"""Model factory: the reference's `build_model(params)` convenience API.

Reference contract (models/__init__.py:5-21): a config object in, a ready
classifier out. In the functional design the "model" is a (config, params,
forward) bundle; `EventCLIPModel` packages them with the reference's calling
convention — `model(data_dict)` returning
{'full_logits', 'valid_masks', 'logits', 'probs'} — so downstream code reads
like the original while everything stays jit-compiled pure functions inside.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .classifier import (
    ClassifierConfig,
    build_classifier_config,
    classifier_forward,
    init_classifier_params,
)
from .clip.config import CLIPConfig, clip_arch_config

Params = Dict[str, Any]


class EventCLIPModel:
    """Bundled (config, params, jitted forward)."""

    def __init__(self, cfg: ClassifierConfig, params: Params):
        self.cfg = cfg
        self.params = params
        self._forward = jax.jit(
            lambda p, img, valid: classifier_forward(p, cfg, img, valid)
        )

    def __call__(self, data_dict: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return self._forward(
            self.params, data_dict["img"], data_dict["valid_mask"]
        )

    def load_weight(self, path: str) -> None:
        """Re-inject trainable leaves from a CLIP-free checkpoint
        (reference BaseModel.load_weight + state-dict surgery)."""
        from ..engine.checkpoint import load_checkpoint

        self.params, _ = load_checkpoint(path, target=self.params)


def build_model(
    params_cfg,
    class_names: Sequence[str],
    clip_params: Optional[Params] = None,
    text_feats: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
) -> EventCLIPModel:
    """Build a ZS/FS/FT classifier from an experiment config.

    clip_params: converted CLIP weights (models.clip.convert); random when
        omitted (smoke mode). text_feats: precomputed prompt features;
        computed from the text tower + tokenizer when omitted and possible.

    Passing real clip_params without the BPE vocab asset raises: real
    weights + random text features would silently produce garbage zero-shot
    numbers (same guard as engine.trainer.build_text_features).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    clip_cfg: CLIPConfig = clip_arch_config(params_cfg.clip_dict["arch"])
    cfg = build_classifier_config(params_cfg, clip_cfg, dtype=dtype)
    pretrained = clip_params is not None
    if clip_params is None:
        from .clip.model import init_clip_params

        clip_params = init_clip_params(rng, clip_cfg)
    if text_feats is None:
        try:
            from .classifier import DEFAULT_PROMPT
            from .classifier import compute_text_features
            from .clip.tokenizer import SimpleTokenizer

            text_feats = compute_text_features(
                clip_params, clip_cfg, class_names,
                params_cfg.clip_dict.get("prompt", DEFAULT_PROMPT),
                SimpleTokenizer(),
            )
        except (FileNotFoundError, OSError) as e:
            if pretrained:
                raise FileNotFoundError(
                    "BPE vocab asset missing; drop "
                    "bpe_simple_vocab_16e6.txt.gz into eventclip_tpu/assets/"
                    " — real CLIP weights with random text features would "
                    f"silently produce garbage accuracies. ({e})"
                ) from e
            text_feats = None  # random fallback (smoke towers only)
    params = init_classifier_params(
        rng, cfg, clip_params=clip_params, text_feats=text_feats,
        n_classes=len(class_names),
    )
    return EventCLIPModel(cfg, params)
