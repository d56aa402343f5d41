"""W8A8 int8 inference quantization for the CLIP ViT tower.

The bf16 forward already runs at ~96% of this chip's achievable matmul rate
(see BASELINE.md "speed-of-light check"), so the only way to push encode
throughput further is narrower arithmetic: the v5e MXU sustains ~1.45x more
int8 MACs than bf16 FLOPs (measured 195 TOP/s vs 135 TFLOP/s here).

Scheme (standard W8A8, nothing exotic):
- weights: static per-output-channel symmetric int8, scale = max|row| / 127,
  quantized once at load time (`quantize_visual`);
- activations, default: dynamic per-token symmetric int8, scale computed on
  device from each token's max-abs right before the matmul (`qdense`);
- activations, opt-in (`--int8_calib N`): STATIC per-(layer, site) scales
  from a calibration pass over N batches (`calibrate_visual_amax`), with
  out-of-range values clipped. Removes the per-token max-abs reduce and its
  data dependency from the hot loop — measured 1.44x bf16 on the ViT-L/14
  encode vs 1.28x dynamic (the reduce chain is the entire difference; see
  BASELINE.md "int8 inference"). Accuracy depends on the calibration batch
  covering the activation range; dynamic stays the safe default.
- the matmul runs int8 x int8 -> int32 on the MXU; the int32 accumulator is
  rescaled in f32 by (token scale x channel scale) and the bias is added in
  f32 — same accumulate-then-cast shape as the bf16 `dense`.

LayerNorm, softmax, the attention core (Pallas, bf16), residuals, and the
final projection stay in bf16/f32: they carry <5% of the FLOPs and all of
the numerical risk.

This is an inference-only path (`jnp.round` has no useful gradient); the
training step never sees quantized trees. Opt in from the CLIs with
`--int8` (test.py / gen_data.py). The reference has no quantized path —
this is a beyond-parity feature, guarded by parity tolerances in
tests/test_quant.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# quantized-dense weights travel as {'q': int8 [..., out, in], 's': f32
# [..., out]} dicts; model.dense() dispatches on the dict structure, so a
# quantized tree drops into the existing forward unchanged (and lax.scan
# stacks the extra leaf like any other block parameter).


def quantize_weight(w: jnp.ndarray) -> Params:
    """Symmetric per-output-channel int8: w is [..., out, in] (torch layout)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(w / s[..., None]).astype(jnp.int8)
    return {"q": q, "s": s}


def qdense(x: jnp.ndarray, qw: Params, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized counterpart of model.dense: x @ w.T + b.

    x [..., in] float; qw {'q': int8 [out, in], 's': f32 [out]}. The
    product runs on the int8 MXU path with int32 accumulation. Activation
    scale: dynamic per-token max-abs by default; if the calibrated scalar
    'a' is present (static mode), x quantizes against it with clipping —
    no reduce over x, no data dependency before the matmul.
    """
    xf = x.astype(jnp.float32)
    if "a" in qw:
        ax = qw["a"].astype(jnp.float32)  # scalar per (layer, site)
        xq = jnp.clip(jnp.round(xf / ax), -127.0, 127.0).astype(jnp.int8)
    else:
        ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        ax = jnp.maximum(ax, 1e-12)
        xq = jnp.round(xf / ax).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, qw["q"], (((xq.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * ax * qw["s"].astype(jnp.float32)
    if b is not None:
        yf = yf + b.astype(jnp.float32)
    return yf.astype(x.dtype)


def _is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_visual(visual: Params,
                    act_amax: Optional[jnp.ndarray] = None) -> Params:
    """Quantize a ViT visual tower's matmul weights (per layer, per channel).

    Touches patch_embed, every block's attn.wqkv / attn.wo / mlp.w1 / mlp.w2
    (stacked [L, ...] leaves quantize vectorized over the layer axis — wqkv
    [L, 3, D, D] gets scales [L, 3, D]). Embeddings, LayerNorms, and the
    output projection stay float. Idempotent on already-quantized trees.

    act_amax: optional [layers, 4] calibration maxima (from
    `calibrate_visual_amax`) — attaches static per-(layer, site)
    activation scales 'a' = amax/127 to wqkv/wo/w1/w2, switching those
    sites from dynamic per-token to calibrated static quantization
    (qdense clips out-of-range activations). patch_embed keeps the
    dynamic scale: its input is raw pixel patches whose range needs no
    calibration pass, and it is <1% of encode time.
    """
    out = dict(visual)
    if not _is_quantized(out["patch_embed"]):
        out["patch_embed"] = quantize_weight(out["patch_embed"])
    blocks = dict(out["blocks"])
    attn = dict(blocks["attn"])
    mlp = dict(blocks["mlp"])
    sites = ((attn, "wqkv"), (attn, "wo"), (mlp, "w1"), (mlp, "w2"))
    for i, (sub, key) in enumerate(sites):
        if not _is_quantized(sub[key]):
            sub[key] = quantize_weight(sub[key])
        if act_amax is not None:
            a = jnp.maximum(
                jnp.asarray(act_amax, jnp.float32)[:, i] / 127.0, 1e-12)
            sub[key] = {**sub[key], "a": a}
    blocks["attn"], blocks["mlp"] = attn, mlp
    out["blocks"] = blocks
    return out


def calibrate_visual_amax(visual: Params, vision_cfg, images: jnp.ndarray,
                          *, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Run FLOAT ViT forward(s) over calibration images, return [L, 4]
    per-(layer, site) activation max-abs for static int8 scales.

    images: [N, 3, H, W] CLIP-preprocessed (N can be any size that fits;
    call repeatedly and jnp.maximum the results to calibrate over more
    batches). The tower must be unquantized — the maxima are the float
    activations the static scales will stand in for.
    """
    from ..models.clip.model import encode_image

    assert not _is_quantized(visual["patch_embed"]), (
        "calibrate on the FLOAT tower (before quantize_visual)"
    )
    _, amax = jax.jit(
        lambda v, x: encode_image(v, vision_cfg, x, dtype=dtype,
                                  collect_amax=True)
    )(visual, images)
    return amax


def quantize_classifier_params(
    model_params: Params, act_amax: Optional[jnp.ndarray] = None
) -> Params:
    """CLI entry: quantize the visual tower inside a full classifier tree.

    Call AFTER checkpoint loading (fine-tuned visual weights must be the
    ones quantized). ViT towers only — the ResNet towers' conv stacks
    don't go through model.dense and are left to the bf16 path.
    act_amax: optional calibration maxima for static activation scales
    (see quantize_visual).
    """
    visual = model_params["clip"]["visual"]
    if "blocks" not in visual or "patch_embed" not in visual:
        raise ValueError(
            "int8 quantization supports the ViT towers only "
            "(ResNet archs run bf16)"
        )
    out = dict(model_params)
    clip = dict(out["clip"])
    clip["visual"] = quantize_visual(visual, act_amax=act_amax)
    out["clip"] = clip
    return out
