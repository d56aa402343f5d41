from .clip import CLIPConfig, clip_arch_config
from .factory import EventCLIPModel, build_model
from .classifier import (
    ClassifierConfig,
    build_classifier_config,
    init_classifier_params,
    classifier_forward,
    aggregate_logits,
    aggregate_probs,
)

__all__ = [
    "EventCLIPModel",
    "build_model",
    "CLIPConfig",
    "clip_arch_config",
    "ClassifierConfig",
    "build_classifier_config",
    "init_classifier_params",
    "classifier_forward",
    "aggregate_logits",
    "aggregate_probs",
]
