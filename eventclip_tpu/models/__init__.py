from .clip import CLIPConfig, clip_arch_config
from .classifier import (
    ClassifierConfig,
    build_classifier_config,
    init_classifier_params,
    classifier_forward,
    aggregate_logits,
    aggregate_probs,
)

__all__ = [
    "CLIPConfig",
    "clip_arch_config",
    "ClassifierConfig",
    "build_classifier_config",
    "init_classifier_params",
    "classifier_forward",
    "aggregate_logits",
    "aggregate_probs",
]
