"""Feature adapters for few-shot EventCLIP.

Functional re-implementation of the reference adapters (models/adapter.py):

- IdentityAdapter: pass-through (models/adapter.py:35-50);
- TransformerAdapter: in_proj -> 2-layer pre-norm torch TransformerEncoder
  (4 heads, ffn 4x, batch_first, relu, dropout 0.1) with key-padding mask
  -> out_proj -> blended residual out = res*in + (1-res)*new
  (models/adapter.py:53-109, residual blend :22-25).

The encoder layers are layer-stacked and scanned like the CLIP towers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .clip.model import dense, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    adapter_type: str = "identity"  # 'identity' | 'trans'
    in_dim: int = 512
    d_model: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    num_layers: int = 2
    residual: float = 0.0  # torch bool residual maps to 0.5 (True) / 0.0
    dropout: float = 0.1  # torch TransformerEncoderLayer default

    @staticmethod
    def residual_value(residual) -> float:
        if isinstance(residual, bool):
            return 0.5 if residual else 0.0
        assert 0.0 <= float(residual) <= 1.0
        return float(residual)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_adapter_params(rng: jax.Array, cfg: AdapterConfig) -> Optional[Params]:
    if cfg.adapter_type == "identity":
        return None
    assert cfg.adapter_type == "trans", cfg.adapter_type
    d, f, L, c = cfg.d_model, cfg.ffn_dim, cfg.num_layers, cfg.in_dim
    ks = iter(jax.random.split(rng, 12))

    def xavier(key, shape):  # torch MHA in_proj init
        fan = shape[-1] + shape[-2]
        return _uniform(key, shape, (6.0 / fan) ** 0.5)

    def linear(key, out_d, in_d, lead=()):  # torch Linear default init
        bound = (1.0 / in_d) ** 0.5
        return {
            "w": _uniform(key, lead + (out_d, in_d), bound),
            "b": _uniform(jax.random.fold_in(key, 1), lead + (out_d,), bound),
        }

    blocks = {
        "ln_1": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
        "ln_2": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
        "attn": {
            "wqkv": xavier(next(ks), (L, 3 * d, d)),
            "bqkv": jnp.zeros((L, 3 * d)),
            "wo": linear(next(ks), d, d, (L,))["w"],
            "bo": jnp.zeros((L, d)),
        },
        "mlp": {},
    }
    l1 = linear(next(ks), f, d, (L,))
    l2 = linear(next(ks), d, f, (L,))
    blocks["mlp"] = {"w1": l1["w"], "b1": l1["b"], "w2": l2["w"], "b2": l2["b"]}
    return {
        "in_proj": linear(next(ks), d, c),
        "out_proj": linear(next(ks), c, d),
        "blocks": blocks,
    }


def _mha(p: Params, x: jnp.ndarray, heads: int, pad_mask: jnp.ndarray,
         dropout: float, train: bool, rng) -> jnp.ndarray:
    """torch.nn.MultiheadAttention with key_padding_mask semantics."""
    B, T, D = x.shape
    dh = D // heads
    qkv = dense(x, p["wqkv"], p["bqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(B, T, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(pad_mask[:, None, None, :], -jnp.inf, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    # fully-padded query rows produce NaN softmax; zero them like torch does
    attn = jnp.nan_to_num(attn).astype(x.dtype)
    if train and dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, attn.shape)
        attn = attn * keep / (1.0 - dropout)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, D)
    return dense(o, p["wo"], p["bo"])


def apply_adapter(
    params: Optional[Params],
    cfg: AdapterConfig,
    feats: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """[B, T, C] view features + [B, T] mask -> adapted [B, T, C]."""
    if cfg.adapter_type == "identity":
        return feats
    pad = ~valid
    x = dense(feats, params["in_proj"]["w"], params["in_proj"]["b"])
    drop = cfg.dropout if train else 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
        train = False

    def dropped(val, key):
        if not train or drop <= 0.0:
            return val
        return val * jax.random.bernoulli(key, 1.0 - drop, val.shape) / (1.0 - drop)

    def body(h, layer_and_key):
        lp, key = layer_and_key
        k1, k2, k3, k4 = jax.random.split(key, 4)
        a = _mha(lp["attn"], layer_norm(h, lp["ln_1"]), cfg.num_heads, pad,
                 drop, train, k1)
        h = h + dropped(a, k2)
        y = jax.nn.relu(dense(layer_norm(h, lp["ln_2"]), lp["mlp"]["w1"],
                              lp["mlp"]["b1"]))
        h = h + dropped(dense(dropped(y, k3), lp["mlp"]["w2"], lp["mlp"]["b2"]), k4)
        return h, None

    keys = jax.random.split(rng, cfg.num_layers)
    x, _ = jax.lax.scan(body, x, (params["blocks"], keys))
    x = dense(x, params["out_proj"]["w"], params["out_proj"]["b"])
    res = cfg.residual
    return feats * res + x * (1.0 - res)
