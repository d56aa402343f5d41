"""Classifier semantics vs the reference formulas (models/clip_cls.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eventclip_tpu.models.adapter import AdapterConfig
from eventclip_tpu.models.classifier import (
    ClassifierConfig,
    aggregate_logits,
    aggregate_probs,
    build_classifier_config,
    classifier_forward,
    eval_metrics,
    init_classifier_params,
    train_loss,
)
from eventclip_tpu.models.clip.config import clip_arch_config
from eventclip_tpu.utils.config import Params

TINY = clip_arch_config("ViT-T/8@32")
N_CLS = 4


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.fixture
def logits_mask(rng):
    logits = rng.normal(size=(3, 5, N_CLS)).astype(np.float32)
    valid = np.array([
        [True, True, True, False, False],
        [True, False, False, False, False],
        [True, True, True, True, True],
    ])
    return logits, valid


def test_aggregate_logits_reference_formulas(logits_mask):
    logits, valid = logits_mask
    vm = valid.astype(np.float32)[..., None]
    # clip_cls.py:104-121
    want_sum = (logits * vm).sum(1)
    want_mean = (logits * vm).sum(1) / vm.sum(1)
    want_max = (logits - (1 - vm) * 1e6).max(1)
    for agg, want in [("sum", want_sum), ("mean", want_mean), ("max", want_max)]:
        got = np.asarray(aggregate_logits(jnp.asarray(logits),
                                          jnp.asarray(valid), agg))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_aggregate_probs_masked_mean(logits_mask):
    logits, valid = logits_mask
    # clip_cls.py:123-129: mean of per-view softmax over valid views
    want = np.stack([
        softmax(logits[b][valid[b]]).mean(0) for b in range(len(logits))
    ])
    got = np.asarray(aggregate_probs(jnp.asarray(logits), jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_losses_reference_formulas(logits_mask):
    logits, valid = logits_mask
    labels = np.array([1, 3, 0])
    out = {
        "logits": jnp.asarray(aggregate_logits(
            jnp.asarray(logits), jnp.asarray(valid), "mean")),
        "probs": jnp.asarray(aggregate_probs(
            jnp.asarray(logits), jnp.asarray(valid))),
    }
    cfg_l = ClassifierConfig(model="ZSCLIP", clip=TINY, use_logits_loss=True,
                             use_probs_loss=False)
    cfg_p = ClassifierConfig(model="ZSCLIP", clip=TINY, use_logits_loss=False,
                             use_probs_loss=True)
    # CE over aggregated logits (clip_cls.py:168-170)
    lp = np.log(softmax(np.asarray(out["logits"])))
    want = -lp[np.arange(3), labels].mean()
    got = float(train_loss(cfg_l, out, jnp.asarray(labels))["ce_loss"])
    assert np.isclose(got, want, rtol=1e-5)
    # NLL over log(probs + 1e-6) (clip_cls.py:171-173)
    want = -np.log(np.asarray(out["probs"]) + 1e-6)[np.arange(3), labels].mean()
    got = float(train_loss(cfg_p, out, jnp.asarray(labels))["ce_loss"])
    assert np.isclose(got, want, rtol=1e-5)
    m = eval_metrics(cfg_l, out, jnp.asarray(labels))
    assert 0.0 <= float(m["probs_acc"]) <= 1.0


def _forward(cfg, rng, B=2, T=3):
    params = init_classifier_params(jax.random.PRNGKey(0), cfg,
                                    n_classes=N_CLS)
    imgs = jnp.asarray(rng.normal(size=(B, T, 3, 32, 32)).astype(np.float32))
    valid = jnp.asarray(np.array([[True, True, False], [True, False, False]]))
    return params, imgs, valid, classifier_forward(
        params, cfg, imgs, valid
    )


def test_zsclip_uses_raw_image_features(rng):
    """ZS never normalizes image features (clip_cls.py:148): logits must NOT
    be invariant to feature magnitude, unlike FS/FT."""
    cfg = ClassifierConfig(model="ZSCLIP", clip=TINY)
    params, imgs, valid, out = _forward(cfg, rng)
    # invalid views produce exactly zero logits rows (masked)
    fl = np.asarray(out["full_logits"])
    assert np.all(fl[0, 2] == 0) and np.all(fl[1, 1:] == 0)
    # valid rows are generally NOT unit-scale (raw features)
    norms = np.linalg.norm(fl[0, 0]) + np.linalg.norm(fl[1, 0])
    assert norms > 0


def test_fsclip_normalizes_and_masks(rng):
    cfg = ClassifierConfig(
        model="FSCLIP", clip=TINY,
        adapter=AdapterConfig(adapter_type="trans", in_dim=TINY.embed_dim,
                              d_model=16, num_heads=2, ffn_dim=32,
                              num_layers=1, residual=0.5),
        prompt_tuning=True,
    )
    params, imgs, valid, out = _forward(cfg, rng)
    # logits = scale * cos-sim in [-scale, scale]
    fl = np.asarray(out["full_logits"])
    assert np.abs(fl).max() <= cfg.logit_scale + 1e-3
    assert np.all(fl[1, 1:] == 0)
    assert np.isfinite(np.asarray(out["probs"])).all()


def test_config_parsing_matrix():
    class FS(Params):
        model = "FSCLIP"
        clip_dict = dict(arch="ViT-T/8@32", prompt="p {}", agg_func="max")
        adapter_dict = dict(adapter_type="text-trans", in_dim=512,
                            d_model=64, num_heads=2, ffn_dim=128,
                            num_layers=2, norm_first=True, residual=0.95)
        loss_dict = dict(use_logits_loss=True, use_probs_loss=False)

    cfg = build_classifier_config(FS(), TINY)
    assert cfg.prompt_tuning and cfg.adapter.adapter_type == "trans"
    assert cfg.agg_func == "max"
    assert cfg.adapter.in_dim == TINY.embed_dim  # forced to CLIP dim
    assert cfg.adapter.residual == 0.95

    class FT(Params):
        model = "FTCLIP"
        clip_dict = dict(arch="ViT-T/8@32", prompt="p {}", agg_func="mean",
                         lora="qkvo-16", only_conv1=False, only_bias=False,
                         only_ln=False, only_cls_fc=False,
                         only_cls_token=False)
        adapter_dict = dict(adapter_type="text-identity", in_dim=512,
                            d_model=64, num_heads=2, ffn_dim=128,
                            num_layers=2, norm_first=True, residual=0.95)
        loss_dict = dict(use_logits_loss=True, use_probs_loss=False)

    cfg = build_classifier_config(FT(), TINY)
    assert cfg.ft_mode == "lora" and cfg.lora == "qkvo-16"
    assert cfg.prompt_tuning and cfg.adapter.adapter_type == "identity"
    assert cfg.remat  # FTCLIP defaults to remat

    class FTBias(FT):
        clip_dict = dict(FT.clip_dict, lora=-1, only_bias=True)

    assert build_classifier_config(FTBias(), TINY).ft_mode == "bias"


@pytest.mark.parametrize("model", ["ZSCLIP", "FSCLIP", "FTCLIP"])
def test_packed_forward_matches_padded(rng, model):
    """classifier_forward_packed (only valid views encoded, scattered back)
    must reproduce classifier_forward's logits/probs for every model family
    — the packed path skips exactly the encodes the mask would zero out
    (reference economy: clip_cls.py:139 gathers valid views)."""
    from eventclip_tpu.models.classifier import classifier_forward_packed

    kwargs = {}
    if model == "FSCLIP":
        kwargs["adapter"] = AdapterConfig(
            adapter_type="trans", in_dim=TINY.embed_dim, d_model=16,
            num_heads=2, ffn_dim=32, num_layers=1, residual=0.8,
        )
    if model == "FTCLIP":
        kwargs["ft_mode"] = "full"
    cfg = ClassifierConfig(model=model, clip=TINY, **kwargs)
    params = init_classifier_params(jax.random.PRNGKey(0), cfg,
                                    n_classes=N_CLS)
    B, T = 3, 4
    S = TINY.vision.image_size
    imgs = rng.normal(size=(B, T, 3, S, S)).astype(np.float32)
    valid = np.array([
        [True, True, False, False],
        [True, False, False, False],
        [True, True, True, True],
    ])
    ref = classifier_forward(params, cfg, jnp.asarray(imgs),
                             jnp.asarray(valid))

    idx = np.flatnonzero(valid.reshape(-1)).astype(np.int32)
    K = 8  # bucket > n_valid (7): one padded packing slot
    packed = np.zeros((K, 3, S, S), np.float32)
    packed[: len(idx)] = imgs.reshape(B * T, 3, S, S)[idx]
    src = np.full((K,), B * T, np.int32)
    src[: len(idx)] = idx
    got = classifier_forward_packed(params, cfg, jnp.asarray(packed),
                                    jnp.asarray(src), jnp.asarray(valid))
    for k in ("logits", "probs"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
