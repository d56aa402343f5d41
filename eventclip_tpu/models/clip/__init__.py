from .config import CLIPConfig, VisionConfig, TextConfig, clip_arch_config, CLIP_ARCHS
from .model import (
    init_clip_params,
    encode_image,
    encode_text,
)
from .tokenizer import SimpleTokenizer, tokenize

__all__ = [
    "CLIPConfig",
    "VisionConfig",
    "TextConfig",
    "clip_arch_config",
    "CLIP_ARCHS",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "SimpleTokenizer",
    "tokenize",
]
