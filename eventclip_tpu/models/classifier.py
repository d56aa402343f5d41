"""EventCLIP classifiers (zero-shot / few-shot / fine-tune) as pure functions.

Behavioral contracts:
- ZSCLIPClassifier forward + aggregations  models/clip_cls.py:95-162
- FSCLIPClassifier adapter/prompt path     models/clip_cls.py:222-350
- FTCLIPClassifier selective unfreeze      models/clip_cls_ft.py:45-256
- train/eval losses                        models/clip_cls.py:164-192

One function serves all three regimes; the regime only decides which
parameter leaves receive gradients (see partition.py) and whether image
features flow through the adapter / get re-normalized:
- ZS: raw (un-normalized!) frozen image features vs cached normalized text
  features (the reference never normalizes image features in ZS);
- FS: frozen image features -> TransformerAdapter -> L2 norm -> mask;
- FT: (partially) trainable visual tower, adapter bypassed, L2 norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .adapter import AdapterConfig, apply_adapter, init_adapter_params
from .clip.config import CLIPConfig
from .clip.model import encode_image, encode_text, init_clip_params, init_lora_params
from .clip.tokenizer import SimpleTokenizer, tokenize

Params = Dict[str, Any]

# the reference's hard-coded prompt template (configs override via
# clip_dict['prompt']); every consumer falls back to THIS constant so
# serving/eval/pseudo-labeling text features can never silently diverge
DEFAULT_PROMPT = "a point cloud image of a {}"


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    model: str  # 'ZSCLIP' | 'FSCLIP' | 'FTCLIP'
    clip: CLIPConfig
    agg_func: str = "mean"  # 'sum' | 'mean' | 'max'
    logit_scale: float = 100.0  # exp(learned tau), snapshot like the reference
    adapter: AdapterConfig = AdapterConfig()
    prompt_tuning: bool = False
    lora: Optional[str] = None  # e.g. 16 -> 'qkv-16'; None -> disabled
    ft_mode: str = "full"  # 'full'|'conv1'|'bias'|'ln'|'cls_fc'|'cls_token'|'lora'
    use_logits_loss: bool = True
    use_probs_loss: bool = False
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize transformer layers (FT memory)
    # eval-time ViT token pruning: keep the K highest-variance patches
    # (sparse event frames are mostly uniform background); None = full
    # sequence. Ignored during training and for ResNet towers.
    keep_tokens: Optional[int] = None

    def __post_init__(self):
        assert self.model in ("ZSCLIP", "FSCLIP", "FTCLIP"), self.model
        assert self.agg_func in ("sum", "mean", "max"), self.agg_func
        assert int(self.use_logits_loss) + int(self.use_probs_loss) == 1
        if self.model == "FTCLIP":
            # the reference asserts adapter==identity and bypasses it in
            # forward (models/clip_cls_ft.py:119,228)
            assert self.adapter.adapter_type == "identity"


def build_classifier_config(params_cfg, clip_cfg: CLIPConfig, dtype=jnp.float32) -> ClassifierConfig:
    """Build from an experiment config object (utils.config.Params)."""
    clip_dict = dict(params_cfg.clip_dict)
    adapter_dict = dict(params_cfg.get("adapter_dict", {}) or {})
    adapter_type = adapter_dict.pop("adapter_type", "identity").lower()
    prompt_tuning = adapter_type.startswith("text-")
    if prompt_tuning:
        adapter_type = adapter_type[len("text-"):]
    residual = AdapterConfig.residual_value(adapter_dict.pop("residual", False))
    norm_first = adapter_dict.pop("norm_first", True)
    assert norm_first, "reference adapters are pre-norm"
    # in_dim always tracks the CLIP feature dim, regardless of the config
    # value (reference overrides it the same way, train.py:42, test.py:44)
    adapter_dict.pop("in_dim", None)
    adapter = AdapterConfig(
        adapter_type=adapter_type,
        in_dim=clip_cfg.embed_dim,
        d_model=adapter_dict.pop("d_model", 256),
        num_heads=adapter_dict.pop("num_heads", 4),
        ffn_dim=adapter_dict.pop("ffn_dim", 1024),
        num_layers=adapter_dict.pop("num_layers", 2),
        residual=residual,
    )
    lora = clip_dict.get("lora", -1)
    lora_enabled = isinstance(lora, str) or (isinstance(lora, int) and lora > 0)
    ft_mode = "full"
    if params_cfg.model == "FTCLIP":
        if lora_enabled:
            ft_mode = "lora"
        elif clip_dict.get("only_conv1"):
            ft_mode = "conv1"
        elif clip_dict.get("only_bias"):
            ft_mode = "bias"
        elif clip_dict.get("only_ln"):
            ft_mode = "ln"
        elif clip_dict.get("only_cls_fc"):
            ft_mode = "cls_fc"
        elif clip_dict.get("only_cls_token"):
            ft_mode = "cls_token"
    # loss selection comes from the config, exactly one of the two; without
    # a loss_dict both regimes default to logits CE (the value every shipped
    # reference config specifies — no model-dependent invention here); a
    # partially-specified dict fills the other flag with False, and exactly
    # one loss must end up enabled (reference clip_cls.py:58)
    loss_dict = dict(params_cfg.get("loss_dict", {}) or {})
    if not loss_dict:
        use_logits, use_probs = True, False
    else:
        use_logits = bool(loss_dict.get("use_logits_loss", False))
        use_probs = bool(loss_dict.get("use_probs_loss", False))
    assert int(use_logits) + int(use_probs) == 1, (
        f"exactly one of use_logits_loss/use_probs_loss must be set, got "
        f"{loss_dict}"
    )
    return ClassifierConfig(
        model=params_cfg.model,
        clip=clip_cfg,
        # config override is for debug/random towers (no checkpoint to
        # snapshot exp(tau) from); real checkpoints override it at load
        # (engine.trainer.snapshot_logit_scale, reference clip_cls.py:44)
        logit_scale=float(clip_dict.get("logit_scale", 100.0)),
        agg_func=clip_dict.get("agg_func", "mean"),
        adapter=adapter,
        prompt_tuning=prompt_tuning,
        lora=lora if lora_enabled else None,
        ft_mode=ft_mode,
        use_logits_loss=use_logits,
        use_probs_loss=use_probs,
        dtype=dtype,
        remat=bool(params_cfg.get("remat", params_cfg.model == "FTCLIP")),
    )


# ---------------------------------------------------------------------------
# text features
# ---------------------------------------------------------------------------


def tokenize_prompts(
    class_names: Sequence[str],
    prompt: str,
    tokenizer: SimpleTokenizer,
    context_length: int,
) -> "np.ndarray":
    """Class names -> [n_cls, context] prompted token ids.

    The host half of text-feature computation (reference
    models/clip_cls.py:64-93: templated prompts, lowercase, underscores to
    spaces) — one definition shared by the live path and by export
    bundles' offline set_classes."""
    names = [c.lower().replace("_", " ") for c in class_names]
    return tokenize([prompt.format(c) for c in names], tokenizer,
                    context_length)


def compute_text_features(
    clip_params: Params,
    cfg: CLIPConfig,
    class_names: Sequence[str],
    prompt: str,
    tokenizer: SimpleTokenizer,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Prompted, L2-normalized class text features [n_cls, C].

    Reference: models/clip_cls.py:64-93 (templated prompts, lowercase,
    underscores to spaces, cached after first computation).
    """
    toks = tokenize_prompts(class_names, prompt, tokenizer,
                            cfg.text.context_length)
    feats = encode_text(clip_params["text"], cfg.text, jnp.asarray(toks), dtype=dtype)
    return normalize(feats)


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize; zero vectors stay zero (torch F.normalize semantics)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_classifier_params(
    rng: jax.Array,
    cfg: ClassifierConfig,
    clip_params: Optional[Params] = None,
    text_feats: Optional[jnp.ndarray] = None,
    n_classes: Optional[int] = None,
) -> Params:
    """Assemble the full parameter tree.

    text_feats seeds the prompt-tuning parameter (reference initializes the
    trainable prompts from the frozen encoder output, clip_cls.py:253-259) or
    is stored as the frozen cache for ZS/non-tuning models.
    """
    k_clip, k_ad, k_lora = jax.random.split(rng, 3)
    if clip_params is None:
        clip_params = init_clip_params(k_clip, cfg.clip)
    if text_feats is None:
        assert n_classes is not None
        text_feats = normalize(
            jax.random.normal(jax.random.fold_in(rng, 7),
                              (n_classes, cfg.clip.embed_dim))
        )
    params = {
        "clip": clip_params,
        "text_feats": jnp.asarray(text_feats, dtype=jnp.float32),
    }
    if cfg.model == "FSCLIP":
        params["adapter"] = init_adapter_params(k_ad, cfg.adapter)
    if cfg.model == "FTCLIP" and cfg.lora is not None:
        params["lora"] = init_lora_params(k_lora, cfg.clip.vision, cfg.lora)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def aggregate_logits(logits: jnp.ndarray, valid: jnp.ndarray, agg_func: str) -> jnp.ndarray:
    """[B, T, n_cls] + [B, T] -> [B, n_cls] (clip_cls.py:104-121)."""
    vm = valid.astype(logits.dtype)
    if agg_func == "sum":
        return (logits * vm[..., None]).sum(1)
    if agg_func == "mean":
        return (logits * vm[..., None]).sum(1) / vm.sum(1, keepdims=True)
    if agg_func == "max":
        return (logits - (1.0 - vm[..., None]) * 1e6).max(1)
    raise NotImplementedError(agg_func)


def aggregate_probs(logits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean of per-view softmax (clip_cls.py:123-129)."""
    vm = valid.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1) * vm[..., None]
    return probs.sum(1) / vm.sum(1, keepdims=True)


def classifier_forward(
    params: Params,
    cfg: ClassifierConfig,
    imgs: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    tp=None,
) -> Dict[str, jnp.ndarray]:
    """imgs [B, T, 3, S, S] CLIP-normalized, valid [B, T] -> output dict.

    All T views are encoded (padded views carry zeros) and masked afterwards;
    the reference gathers valid views instead (clip_cls.py:139), which is
    equivalent but shape-dynamic and hence hostile to XLA.
    """
    B, T = valid.shape
    flat = imgs.reshape((B * T,) + imgs.shape[2:])
    img_feats = _encode_views(params, cfg, flat, train=train, tp=tp)
    feats = img_feats.reshape(B, T, -1)
    return _aggregate_head(params, cfg, feats, valid, train=train, rng=rng)


def _encode_views(params, cfg, flat_imgs, *, train: bool, tp=None):
    """[V, 3, S, S] -> [V, C] raw (un-normalized) encoder features."""
    lora = params.get("lora")
    from .clip.resnet import ResNetVisionConfig, encode_image_resnet

    if isinstance(cfg.clip.vision, ResNetVisionConfig):
        assert lora is None, "LoRA targets the ViT attention (lora.py:385)"
        img_feats = encode_image_resnet(
            params["clip"]["visual"], cfg.clip.vision, flat_imgs,
            dtype=cfg.dtype
        ).astype(jnp.float32)
    else:
        img_feats = encode_image(
            params["clip"]["visual"], cfg.clip.vision, flat_imgs,
            dtype=cfg.dtype, lora=lora,
            remat=cfg.remat and cfg.model == "FTCLIP" and train,
            tp=tp,
            keep_tokens=None if train else cfg.keep_tokens,
        ).astype(jnp.float32)
    if cfg.model != "FTCLIP":
        img_feats = jax.lax.stop_gradient(img_feats)
    return img_feats


def classifier_forward_packed(
    params: Params,
    cfg: ClassifierConfig,
    imgs: jnp.ndarray,
    view_src: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    tp=None,
) -> Dict[str, jnp.ndarray]:
    """Eval forward over view-PACKED images (only valid views encoded).

    imgs [K, 3, S, S] holds the batch's valid views compacted across
    samples; view_src [K] maps each row to its flat slot in [B*T] (the
    sentinel B*T marks packing padding). At the forced eval view budget of
    10 (reference datasets/__init__.py:23) most samples carry fewer real
    windows, and the padded forward pays a full encode per empty slot; the
    reference never does (it gathers valid views, clip_cls.py:139). Packing
    restores that economy with static shapes: the host picks K from a small
    bucket list, so at most len(buckets) programs ever compile.
    Aggregation consumes the same [B, T, C] tensor as the padded forward,
    so outputs are identical up to encode batching.
    """
    B, T = valid.shape
    feats_k = _encode_views(params, cfg, imgs, train=False, tp=tp)
    C = feats_k.shape[-1]
    # restore per-slot features as a one-hot matmul (scatter-as-matmul is
    # the TPU idiom — same rule as the rasterizer histogram); sentinel rows
    # accumulate into the discarded spare slot B*T
    onehot = jax.nn.one_hot(view_src, B * T + 1, dtype=feats_k.dtype)
    flat = jnp.einsum("kv,kc->vc", onehot, feats_k,
                      preferred_element_type=jnp.float32)
    feats = flat[: B * T].reshape(B, T, C)
    return _aggregate_head(params, cfg, feats, valid, train=False, rng=None)


def _aggregate_head(params, cfg, feats, valid, *, train: bool, rng):
    """Shared post-encoder half: adapter/normalize/text/aggregations.

    feats: [B, T, C] raw encoder features (padded slots may hold zeros).
    """
    if cfg.model == "FSCLIP":
        feats = apply_adapter(
            params.get("adapter"), cfg.adapter, feats, valid,
            train=train, rng=rng,
        )
        feats = normalize(feats) * valid[..., None]
    elif cfg.model == "FTCLIP":
        # adapter bypassed (clip_cls_ft.py:228); features are L2-normalized
        feats = normalize(feats) * valid[..., None]
    # ZSCLIP: features used raw (clip_cls.py:148)

    text_feats = params["text_feats"]
    if cfg.prompt_tuning:
        text_feats = normalize(text_feats)  # re-normalized every forward
    else:
        text_feats = jax.lax.stop_gradient(text_feats)

    full_logits = cfg.logit_scale * jnp.einsum(
        "btc,nc->btn", feats, text_feats, preferred_element_type=jnp.float32
    )
    full_logits = full_logits * valid[..., None]
    return {
        "full_logits": full_logits,
        "valid_masks": valid,
        "logits": aggregate_logits(full_logits, valid, cfg.agg_func),
        "probs": aggregate_probs(full_logits, valid),
        # per-view features at the text-matmul point (post-adapter/norm
        # for FS/FT, raw for ZS) — the serving embed API consumes these;
        # XLA dead-code-eliminates them from programs that only read probs
        "view_feats": feats,
    }


# ---------------------------------------------------------------------------
# losses & metrics
# ---------------------------------------------------------------------------


def train_loss(cfg: ClassifierConfig, out: Dict[str, jnp.ndarray], labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """CE over aggregated logits or NLL over aggregated probs (clip_cls.py:164-175)."""
    if cfg.use_logits_loss:
        logp = jax.nn.log_softmax(out["logits"], axis=-1)
    else:
        logp = jnp.log(out["probs"] + 1e-6)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    return {"ce_loss": ce}


def eval_metrics(cfg: ClassifierConfig, out: Dict[str, jnp.ndarray], labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    m = train_loss(cfg, out, labels)
    m["probs_acc"] = (out["probs"].argmax(-1) == labels).mean()
    m["logits_acc"] = (out["logits"].argmax(-1) == labels).mean()
    return m


def topk_accuracy(scores: jnp.ndarray, labels: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    _, idx = jax.lax.top_k(scores, k)
    return (idx == labels[:, None]).any(-1).mean()
