"""CLIP encoders as pure JAX functions over explicit parameter pytrees.

TPU-native re-implementation of the OpenAI CLIP ViT (image) and Transformer
(text) towers used by the reference via `clip.load` (models/clip_cls.py:95-102
`encode_image`, :64-93 `encode_text`).

Design choices:
- parameters live in a plain nested dict, weights kept in torch [out, in]
  convention so checkpoint conversion is a reshape-free transpose-free walk
  (convert.py);
- transformer blocks are *stacked* along a leading layer axis and driven by
  `lax.scan`, so a 24-layer tower compiles as one block (fast XLA compiles,
  identical runtime);
- the patch-embedding conv is expressed as patch extraction + one matmul,
  which is exactly a stride-`ps` conv but guaranteed to land on the MXU;
- all matmuls accumulate in float32 (`preferred_element_type`) while
  activations can flow in bfloat16; layer norms always compute in float32;
- LoRA (models/lora.py in the reference, a 400-line MHA fork) is just an
  optional low-rank delta pytree applied inside attention -- W_eff = W + B@A
  with A ~ N(0, 1/r), B = 0, matching the reference init
  (models/lora.py:8-11) and merged-weight forward (models/lora.py:60-98).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import fused_qkv_attention, tp_fused_qkv_attention
from .config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]


def _use_pallas_attention(sharded: bool = False) -> bool:
    """Pallas VMEM attention on TPU; XLA einsum path elsewhere / when
    EVENTCLIP_NO_PALLAS is set (escape hatch).

    sharded=True marks the one call site that already runs the kernel
    per-device inside shard_map (the TP path). Everywhere else a Mosaic
    kernel under a multi-device GSPMD jit is an opaque custom call the
    partitioner cannot split along the sharded batch axis, so DP-only
    multi-chip processes take the XLA einsum attention instead, which
    GSPMD shards cleanly (shared policy: ops/pallas_gate.py).
    """
    from ...ops.pallas_gate import pallas_ok

    return pallas_ok(sharded=sharded)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def dense(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ w.T + b with f32 accumulation; w is [out, in] (torch layout).

    Also accepts an int8-quantized weight ({'q', 's'} dict from
    ops/quant.py) and dispatches to the W8A8 MXU path — so a
    `quantize_visual`-processed tree runs through the unchanged forward.
    """
    if isinstance(w, dict):
        from ...ops.quant import qdense

        return qdense(x, w, b)
    y = jnp.einsum(
        "...i,oi->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in float32 regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _lora_delta(x: jnp.ndarray, lp: Params) -> jnp.ndarray:
    """Low-rank delta (x @ A.T) @ B.T; A [r, in], B [out, r]."""
    h = jnp.einsum("...i,ri->...r", x, lp["a"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("...r,or->...o", h, lp["b"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def attention(
    p: Params,
    x: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    tp=None,
    collect_amax: bool = False,
) -> jnp.ndarray:
    """Multi-head self attention matching torch.nn.MultiheadAttention.

    p: {'wqkv': [3, D, D], 'bqkv': [3, D], 'wo': [D, D], 'bo': [D]}
       (the fused in_proj is stored with the q/k/v axis explicit so
       tensor parallelism can shard D_out head-aligned — each shard then
       owns whole heads of all three of q, k, v; see parallel/sharding.py)
    lora: optional {'q'|'k'|'v'|'o': {'a': [r, D], 'b': [D, r]}}
    tp: optional parallel.TPContext — run the attention core per-shard.
    collect_amax: also return max|o| over the pre-out-proj activation —
       the one qdense input interior to this function; used by int8
       static-scale calibration (ops/quant.py::calibrate_visual_amax).
    """
    B, T, D = x.shape

    def lora_deltas(stack_fn):
        zeros = jnp.zeros((B, T, D), x.dtype)
        return stack_fn([
            _lora_delta(x, lora["q"]) if "q" in lora else zeros,
            _lora_delta(x, lora["k"]) if "k" in lora else zeros,
            _lora_delta(x, lora["v"]) if "v" in lora else zeros,
        ])

    # fused-qkv attention: head columns are sliced inside the kernel, so no
    # [B, H, T, dh] relayouts ever materialize
    if tp is not None:
        assert mask is None, "TP attention is only wired for the ViT tower"
        assert not isinstance(p["wqkv"], dict), \
            "int8 quantization is a single-chip inference path (no TP)"
        # keep the q/k/v axis explicit so the head-aligned weight sharding
        # ([3, D_out, D_in] split on D_out) propagates onto the activation
        qkv = jnp.einsum(
            "...i,toi->...to", x, p["wqkv"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        qkv = (qkv + p["bqkv"].astype(jnp.float32)).astype(x.dtype)
        if lora is not None:
            qkv = qkv + lora_deltas(lambda ds: jnp.stack(ds, axis=-2))
        o = tp_fused_qkv_attention(qkv, heads, tp,
                                   use_pallas=_use_pallas_attention(
                                       sharded=True))
    else:
        # replicated weights: collapse to the single fused matmul (the
        # reshape is free; the [B, T, 3, D]-producing einsum measures ~25%
        # slower end-to-end on the ViT-L/14 forward)
        wqkv = p["wqkv"]
        if isinstance(wqkv, dict):  # int8: reshape both payload and scales
            wqkv = {"q": wqkv["q"].reshape(3 * D, D),
                    "s": wqkv["s"].reshape(3 * D),
                    # static activation scale (scalar) rides along unchanged
                    **({"a": wqkv["a"]} if "a" in wqkv else {})}
        else:
            wqkv = wqkv.reshape(3 * D, D)
        qkv = dense(x, wqkv, p["bqkv"].reshape(3 * D))  # [B, T, 3D]
        if lora is not None:
            qkv = qkv + lora_deltas(lambda ds: jnp.concatenate(ds, axis=-1))
        o = fused_qkv_attention(qkv, heads, mask,
                                use_pallas=_use_pallas_attention())
    o = o.astype(x.dtype)
    out = dense(o, p["wo"], p["bo"])
    if lora is not None and "o" in lora:
        out = out + _lora_delta(o, lora["o"])
    if collect_amax:
        return out, jnp.max(jnp.abs(o)).astype(jnp.float32)
    return out


def transformer(
    blocks: Params,
    x: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    remat: bool = False,
    tp=None,
    collect_amax: bool = False,
) -> jnp.ndarray:
    """Pre-norm residual transformer; layer-stacked params driven by scan.

    remat=True rematerializes each layer in the backward pass (activation
    memory O(1) in depth instead of O(L) — enables full FTCLIP fine-tuning
    of ViT-L/14 at large batch on one chip, trading ~1/3 extra FLOPs).

    collect_amax=True also returns a [layers, 4] f32 of the per-layer
    batch max-abs of the four quantized-matmul inputs (wqkv, wo, w1, w2 —
    i.e. ln_1 out, attention core out, ln_2 out, gelu out), stacked by the
    scan's ys. Calibration input for the int8 static-scale mode
    (ops/quant.py); run it on FLOAT weights only.
    """

    def body(h, layer):
        lp, ll = layer
        a_in = layer_norm(h, lp["ln_1"])
        if collect_amax:
            att, o_amax = attention(lp["attn"], a_in, heads, mask, ll,
                                    tp=tp, collect_amax=True)
        else:
            att = attention(lp["attn"], a_in, heads, mask, ll, tp=tp)
        h = h + att
        m_in = layer_norm(h, lp["ln_2"])
        y = dense(m_in, lp["mlp"]["w1"], lp["mlp"]["b1"])
        g = quick_gelu(y)
        h = h + dense(g, lp["mlp"]["w2"], lp["mlp"]["b2"])
        if collect_amax:
            def amax(t):
                return jnp.max(jnp.abs(t)).astype(jnp.float32)

            return h, jnp.stack([amax(a_in), o_amax, amax(m_in), amax(g)])
        return h, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, ys = jax.lax.scan(body, x, (blocks, lora))
    if collect_amax:
        return x, ys
    return x


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------


def encode_image(
    visual: Params,
    cfg: VisionConfig,
    images: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.float32,
    lora: Optional[Params] = None,
    remat: bool = False,
    tp=None,
    keep_tokens: Optional[int] = None,
    collect_amax: bool = False,
) -> jnp.ndarray:
    """[B, 3, H, W] CLIP-normalized images -> [B, output_dim] features.

    collect_amax=True returns (features, [layers, 4] activation max-abs)
    for int8 static-scale calibration — see transformer().

    keep_tokens=K (eval-time, opt-in) prunes the patch sequence to the K
    highest-variance patches before the tower. Event frames are sparse —
    most patches are uniform background with ~zero variance — so pruning
    drops near-information-free tokens while the shapes stay static
    (jax.lax.top_k; kept patches carry their own positional embeddings,
    in raster order). K = grid² reproduces the full forward exactly.
    """
    B = images.shape[0]
    ps, g, D = cfg.patch_size, cfg.grid, cfg.width
    x = images.astype(dtype)
    # patchify: equivalent to the stride-ps conv1 but explicitly one matmul
    x = x.reshape(B, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, g * g, 3 * ps * ps)
    pos = visual["positional_embedding"].astype(dtype)
    if keep_tokens is not None and keep_tokens < g * g:
        assert tp is None, "token pruning is a single-chip inference path"
        score = x.astype(jnp.float32).var(axis=-1)  # background patches ~0
        idx = jax.lax.top_k(score, keep_tokens)[1]
        idx = jnp.sort(idx, axis=-1)  # keep raster order
        x = jnp.take_along_axis(x, idx[..., None], axis=1)
        pos_tok = pos[1:][idx]  # [B, K, D] — embeddings follow their patches
    else:
        pos_tok = pos[1:][None]
    x = dense(x, visual["patch_embed"]) + pos_tok
    cls = jnp.broadcast_to(
        (visual["class_embedding"].astype(dtype) + pos[0]), (B, 1, D)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = layer_norm(x, visual["ln_pre"])
    x = transformer(visual["blocks"], x, cfg.heads, lora=lora, remat=remat,
                    tp=tp, collect_amax=collect_amax)
    if collect_amax:
        x, amax = x
    x = layer_norm(x[:, 0], visual["ln_post"])
    feats = jnp.einsum(
        "bd,de->be", x, visual["proj"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return (feats, amax) if collect_amax else feats


def causal_mask(T: int) -> jnp.ndarray:
    """Additive [T, T] mask, -inf above the diagonal (torch CLIP convention)."""
    return jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)


def encode_text(
    text: Params,
    cfg: TextConfig,
    tokens: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[B, context] int token ids -> [B, output_dim] features (EOT pooled)."""
    T = tokens.shape[-1]
    x = text["token_embedding"][tokens].astype(dtype)
    x = x + text["positional_embedding"][:T].astype(dtype)
    x = transformer(text["blocks"], x, cfg.heads, mask=causal_mask(T))
    x = layer_norm(x, text["ln_final"])
    eot = tokens.argmax(-1)  # EOT has the highest token id
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.einsum(
        "bd,de->be", x, text["projection"].astype(dtype),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _init_ln(width: int) -> Params:
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def _init_blocks(rng, layers: int, width: int) -> Params:
    ks = jax.random.split(rng, 6)
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5

    def stack(key, shape, std):
        return jax.random.normal(key, (layers,) + shape) * std

    return {
        "ln_1": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "ln_2": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "attn": {
            "wqkv": stack(ks[0], (3, width, width), attn_std),
            "bqkv": jnp.zeros((layers, 3, width)),
            "wo": stack(ks[1], (width, width), proj_std),
            "bo": jnp.zeros((layers, width)),
        },
        "mlp": {
            "w1": stack(ks[2], (4 * width, width), fc_std),
            "b1": jnp.zeros((layers, 4 * width)),
            "w2": stack(ks[3], (width, 4 * width), proj_std),
            "b2": jnp.zeros((layers, width)),
        },
    }


def init_clip_params(rng: jax.Array, cfg: CLIPConfig) -> Params:
    """Random CLIP parameters (OpenAI init scheme); for tests & converters."""
    kv, kt, kp, kc, ke, kx = jax.random.split(rng, 6)
    v, t = cfg.vision, cfg.text
    from .resnet import ResNetVisionConfig, init_resnet_visual

    if isinstance(v, ResNetVisionConfig):
        visual = init_resnet_visual(kv, v)
        return {
            "visual": visual,
            "text": _init_text(kt, t),
            "logit_scale": jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
        }
    scale = v.width ** -0.5
    visual = {
        "patch_embed": jax.random.normal(kp, (v.width, 3 * v.patch_size ** 2))
        * scale,
        "class_embedding": jax.random.normal(kc, (v.width,)) * scale,
        "positional_embedding": jax.random.normal(ke, (v.seq_len, v.width)) * scale,
        "ln_pre": _init_ln(v.width),
        "ln_post": _init_ln(v.width),
        "proj": jax.random.normal(kx, (v.width, v.output_dim)) * scale,
        "blocks": _init_blocks(kv, v.layers, v.width),
    }
    return {
        "visual": visual,
        "text": _init_text(kt, t),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
    }


def _init_text(kt: jax.Array, t: TextConfig) -> Params:
    k1, k2, k3 = jax.random.split(kt, 3)
    return {
        "token_embedding": jax.random.normal(k1, (t.vocab_size, t.width)) * 0.02,
        "positional_embedding": jax.random.normal(k2, (t.context_length, t.width))
        * 0.01,
        "ln_final": _init_ln(t.width),
        "projection": jax.random.normal(k3, (t.width, t.output_dim))
        * (t.width ** -0.5),
        "blocks": _init_blocks(kt, t.layers, t.width),
    }


# ---------------------------------------------------------------------------
# LoRA parameter trees
# ---------------------------------------------------------------------------


def parse_lora_spec(spec) -> Optional[dict]:
    """Parse the reference's LoRA rank spec (models/lora.py:356-368).

    int r > 0      -> rank r on q, k, v
    'qv-16'        -> rank 16 on q, v
    'qkv-16'       -> q, k, v;  'qkvo-16' -> q, k, v and out-proj
    anything else  -> None (LoRA disabled)
    """
    if isinstance(spec, bool) or spec is None:
        return None
    if isinstance(spec, int):
        return {"rank": spec, "targets": ("q", "k", "v")} if spec > 0 else None
    assert isinstance(spec, str) and "q" in spec and "v" in spec
    rank = int(spec.split("-")[-1])
    targets = ["q", "v"]
    if "k" in spec.split("-")[0]:
        targets.insert(1, "k")
    if "o" in spec:
        targets.append("o")
    return {"rank": rank, "targets": tuple(targets)}


def init_lora_params(rng: jax.Array, cfg: VisionConfig, spec) -> Optional[Params]:
    """Stacked [L, ...] LoRA deltas for the visual tower; B zero, A ~ N(0, 1/r)."""
    parsed = parse_lora_spec(spec)
    if parsed is None:
        return None
    r, width, L = parsed["rank"], cfg.width, cfg.layers
    out = {}
    for i, tgt in enumerate(parsed["targets"]):
        key = jax.random.fold_in(rng, i)
        out[tgt] = {
            "a": jax.random.normal(key, (L, r, width)) * (1.0 / r),
            "b": jnp.zeros((L, width, r)),
        }
    return out
