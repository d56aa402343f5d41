"""CLIP ModifiedResNet image towers (RN50 ... RN50x64).

The reference's zero-shot arch sweep evaluates five ResNet CLIP towers
besides the ViTs (scripts/test_all_arch.sh:6). OpenAI's ModifiedResNet
differs from a torchvision ResNet in three ways (CLIP paper §2.4):

- a 3-conv stem (stride-2 3x3, 3x3, 3x3) with an average-pool instead of
  max-pool;
- anti-aliased rect-2 blur pooling: every stride-2 convolution is replaced
  by stride-1 conv + average pool (in both the residual and shortcut paths);
- the final pooling layer is attention pooling: a single multi-head
  attention query from the mean token over the spatial tokens, with a
  learned positional embedding.

TPU-first choices:
- batch norms run with frozen statistics **folded into an affine**
  (scale/bias) at conversion time — CLIP towers are used frozen or
  fine-tuned without stat updates here, so BN is a fused multiply-add;
- convolutions are `lax.conv_general_dilated` in NCHW (XLA lowers them onto
  the MXU);
- blocks after the first of each stage share shapes and are layer-stacked
  under `lax.scan` (RN50x64's 36-deep stage compiles as one block);
- attention pooling reuses the towers' f32-accumulation dense/attention
  primitives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .model import dense

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetVisionConfig:
    image_size: int
    layers: Tuple[int, int, int, int]
    width: int  # stem width (stage widths are width * 2^i, expansion 4)
    heads: int  # attention-pool heads
    output_dim: int

    @property
    def stage_widths(self) -> Tuple[int, ...]:
        return tuple(self.width * (2 ** i) for i in range(4))

    @property
    def embed_dim(self) -> int:
        return self.width * 32  # final channels = width * 8 * expansion(4)

    @property
    def grid(self) -> int:
        return self.image_size // 32


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
          padding: int = 0) -> jnp.ndarray:
    """NCHW conv, weights in torch [O, I, kh, kw] layout, f32 accumulation."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def _affine(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Folded batch norm: scale/bias over the channel dim."""
    return x * p["scale"][None, :, None, None].astype(x.dtype) \
        + p["bias"][None, :, None, None].astype(x.dtype)


def _avg_pool2(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    B, C, H, W = x.shape
    return x.reshape(B, C, H // k, k, W // k, k).mean(axis=(3, 5))


def _bottleneck(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    """CLIP Bottleneck: 1x1 -> 3x3 -> (avgpool if stride) -> 1x1, expansion 4."""
    out = jax.nn.relu(_affine(_conv(x, p["conv1"], 1, 0), p["bn1"]))
    out = jax.nn.relu(_affine(_conv(out, p["conv2"], 1, 1), p["bn2"]))
    if stride > 1:
        out = _avg_pool2(out, stride)
    out = _affine(_conv(out, p["conv3"], 1, 0), p["bn3"])
    if "downsample" in p:
        sc = x if stride == 1 else _avg_pool2(x, stride)
        sc = _affine(_conv(sc, p["downsample"]["conv"], 1, 0),
                     p["downsample"]["bn"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _stage(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    x = _bottleneck(x, p["block0"], stride)
    if p.get("rest") is None:
        return x

    def body(h, bp):
        return _bottleneck(h, bp, 1), None

    x, _ = jax.lax.scan(body, x, p["rest"])
    return x


def _attention_pool(x: jnp.ndarray, p: Params, heads: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, output_dim] (CLIP AttentionPool2d).

    One attention query (the mean token) over HW+1 tokens with separate
    q/k/v projections and a learned positional embedding.
    """
    B, C, H, W = x.shape
    t = x.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, HW, C]
    t = jnp.concatenate([t.mean(1, keepdims=True), t], axis=1)  # [B, HW+1, C]
    t = t + p["positional_embedding"][None].astype(t.dtype)

    q = dense(t[:, :1], p["q_proj"]["w"], p["q_proj"]["b"])  # [B, 1, C]
    k = dense(t, p["k_proj"]["w"], p["k_proj"]["b"])
    v = dense(t, p["v_proj"]["w"], p["v_proj"]["b"])
    dh = C // heads

    def split(z):
        return z.reshape(B, -1, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return dense(o, p["c_proj"]["w"], p["c_proj"]["b"])


def encode_image_resnet(
    visual: Params,
    cfg: ResNetVisionConfig,
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[B, 3, S, S] CLIP-normalized images -> [B, output_dim] features."""
    x = images.astype(dtype)
    stem = visual["stem"]
    x = jax.nn.relu(_affine(_conv(x, stem["conv1"], 2, 1), stem["bn1"]))
    x = jax.nn.relu(_affine(_conv(x, stem["conv2"], 1, 1), stem["bn2"]))
    x = jax.nn.relu(_affine(_conv(x, stem["conv3"], 1, 1), stem["bn3"]))
    x = _avg_pool2(x, 2)
    for i in range(4):
        x = _stage(x, visual[f"layer{i + 1}"], stride=1 if i == 0 else 2)
    out = _attention_pool(x, visual["attnpool"], cfg.heads)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# initialization (tests / smoke mode)
# ---------------------------------------------------------------------------


def _init_affine(c: int) -> Params:
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _init_block(rng, c_in: int, c_mid: int, downsample: bool) -> Params:
    ks = jax.random.split(rng, 4)
    c_out = c_mid * 4

    def he(key, shape):
        fan_in = shape[1] * shape[2] * shape[3]
        return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5

    p = {
        "conv1": he(ks[0], (c_mid, c_in, 1, 1)),
        "bn1": _init_affine(c_mid),
        "conv2": he(ks[1], (c_mid, c_mid, 3, 3)),
        "bn2": _init_affine(c_mid),
        "conv3": he(ks[2], (c_out, c_mid, 1, 1)),
        "bn3": _init_affine(c_out),
    }
    if downsample:
        p["downsample"] = {
            "conv": he(ks[3], (c_out, c_in, 1, 1)),
            "bn": _init_affine(c_out),
        }
    return p


def init_resnet_visual(rng: jax.Array, cfg: ResNetVisionConfig) -> Params:
    ks = iter(jax.random.split(rng, 16))
    w = cfg.width

    def he(key, shape):
        fan_in = shape[1] * shape[2] * shape[3]
        return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5

    visual: Params = {
        "stem": {
            "conv1": he(next(ks), (w // 2, 3, 3, 3)),
            "bn1": _init_affine(w // 2),
            "conv2": he(next(ks), (w // 2, w // 2, 3, 3)),
            "bn2": _init_affine(w // 2),
            "conv3": he(next(ks), (w, w // 2, 3, 3)),
            "bn3": _init_affine(w),
        }
    }
    c_in = w
    for i, n_blocks in enumerate(cfg.layers):
        c_mid = cfg.stage_widths[i]
        key = next(ks)
        block0 = _init_block(jax.random.fold_in(key, 0), c_in, c_mid, True)
        rest = None
        if n_blocks > 1:
            rest_blocks = [
                _init_block(jax.random.fold_in(key, j), c_mid * 4, c_mid,
                            False)
                for j in range(1, n_blocks)
            ]
            rest = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *rest_blocks
            )
        visual[f"layer{i + 1}"] = {"block0": block0, "rest": rest}
        c_in = c_mid * 4
    C = cfg.embed_dim
    k = next(ks)

    def lin(key, o, i):
        std = i ** -0.5
        return {
            "w": jax.random.normal(key, (o, i)) * std,
            "b": jnp.zeros((o,)),
        }

    visual["attnpool"] = {
        "positional_embedding": jax.random.normal(
            next(ks), (cfg.grid ** 2 + 1, C)) * (C ** -0.5),
        "q_proj": lin(next(ks), C, C),
        "k_proj": lin(next(ks), C, C),
        "v_proj": lin(next(ks), C, C),
        "c_proj": lin(next(ks), cfg.output_dim, C),
    }
    return visual
