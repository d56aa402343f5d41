"""Real-asset gating: hard-fail without CLIP weights, logit_scale snapshot.

Covers the round-2 contract changes:
- `resolve_clip_params` refuses random init for real archs unless smoke mode
  (the reference always loads real weights, reference train.py:26);
- debug towers (no released weights) run random without a flag;
- `snapshot_logit_scale` propagates a checkpoint's exp(logit_scale) into the
  classifier config (reference models/clip_cls.py:44);
- `build_classifier_config` defaults to logits CE when loss_dict is absent.
"""

import os

import jax
import numpy as np
import pytest

from eventclip_tpu.engine.trainer import (
    build_text_features,
    resolve_clip_params,
    snapshot_logit_scale,
)
from eventclip_tpu.models.classifier import (
    ClassifierConfig,
    build_classifier_config,
    classifier_forward,
    init_classifier_params,
)
from eventclip_tpu.models.clip.config import clip_arch_config
from eventclip_tpu.models.clip.convert import convert_clip_state_dict
from eventclip_tpu.utils.config import Params
from .torch_oracle import random_clip_state_dict


class _Cfg(Params):
    model = "ZSCLIP"
    clip_dict = dict(arch="ViT-T/8@32", prompt="p {}", agg_func="mean")


def test_real_arch_without_checkpoint_hard_fails():
    cfg = clip_arch_config("ViT-B/32")
    with pytest.raises(FileNotFoundError, match="smoke"):
        resolve_clip_params(_Cfg(), cfg, jax.random.PRNGKey(0), None)


def test_missing_checkpoint_path_hard_fails(tmp_path):
    cfg = clip_arch_config("ViT-T/8@32")
    with pytest.raises(FileNotFoundError, match="not found"):
        resolve_clip_params(_Cfg(), cfg, jax.random.PRNGKey(0),
                            str(tmp_path / "nope.npz"))


def test_smoke_mode_and_debug_arch_allow_random():
    key = jax.random.PRNGKey(0)
    # debug arch: random init without any flag
    params, pretrained = resolve_clip_params(
        _Cfg(), clip_arch_config("ViT-T/8@32"), key, None
    )
    assert not pretrained and "visual" in params
    # real arch: random init only with smoke=True
    params, pretrained = resolve_clip_params(
        _Cfg(), clip_arch_config("ViT-B/32"), key, None, smoke=True
    )
    assert not pretrained and "visual" in params


def test_pretrained_with_missing_bpe_asset_hard_fails(rng):
    from eventclip_tpu.models.clip.tokenizer import bpe_asset_paths

    if any(p and os.path.exists(p) for p in bpe_asset_paths()):
        pytest.skip("BPE asset present; the failure path cannot trigger")
    sd = random_clip_state_dict(rng)
    clip_params = convert_clip_state_dict(sd)
    cfg = clip_arch_config("ViT-T/8@32")
    with pytest.raises(FileNotFoundError, match="bpe_simple_vocab"):
        build_text_features(clip_params, cfg, ["cat", "dog"], "a {}",
                            pretrained=True)


def test_logit_scale_snapshot_roundtrip(rng):
    """A non-default checkpoint logit_scale must reach the logits."""
    sd = random_clip_state_dict(rng)
    import torch

    sd["logit_scale"] = torch.tensor(2.0)  # exp(2) != the 100.0 default
    clip_params = convert_clip_state_dict(sd)

    arch = clip_arch_config("ViT-T/8@32")
    import dataclasses

    clip_cfg = dataclasses.replace(
        arch,
        vision=dataclasses.replace(arch.vision, output_dim=48),
        text=dataclasses.replace(arch.text, vocab_size=128,
                                 context_length=16, output_dim=48),
    )
    base = ClassifierConfig(model="ZSCLIP", clip=clip_cfg)
    cfg = snapshot_logit_scale(base, clip_params, pretrained=True)
    assert np.isclose(cfg.logit_scale, np.exp(2.0))
    # random-init runs keep the config default
    assert snapshot_logit_scale(base, clip_params,
                                pretrained=False).logit_scale == 100.0

    params = init_classifier_params(
        jax.random.PRNGKey(0), cfg,
        clip_params=jax.tree_util.tree_map(np.asarray, clip_params),
        n_classes=3,
    )
    imgs = rng.normal(size=(1, 1, 3, 32, 32)).astype(np.float32)
    valid = np.ones((1, 1), dtype=bool)
    out = classifier_forward(params, cfg, imgs, valid)
    out100 = classifier_forward(
        params, dataclasses.replace(cfg, logit_scale=100.0), imgs, valid
    )
    ratio = np.asarray(out["full_logits"]) / np.asarray(out100["full_logits"])
    assert np.allclose(ratio, np.exp(2.0) / 100.0, rtol=1e-5)


def test_loss_defaults_to_logits_ce_without_loss_dict():
    tiny = clip_arch_config("ViT-T/8@32")

    class NoLoss(Params):
        model = "FSCLIP"
        clip_dict = dict(arch="ViT-T/8@32", prompt="p {}", agg_func="mean")
        adapter_dict = dict(adapter_type="trans", d_model=16, num_heads=2,
                            ffn_dim=32, num_layers=2, norm_first=True,
                            residual=0.8)

    cfg = build_classifier_config(NoLoss(), tiny)
    assert cfg.use_logits_loss and not cfg.use_probs_loss

    class ProbsLoss(NoLoss):
        loss_dict = dict(use_logits_loss=False, use_probs_loss=True)

    cfg = build_classifier_config(ProbsLoss(), tiny)
    assert cfg.use_probs_loss and not cfg.use_logits_loss

    # a partially-specified dict fills the missing flag with False (the
    # reference style: configs often set only the flag they enable)
    class PartialProbs(NoLoss):
        loss_dict = dict(use_probs_loss=True)

    cfg = build_classifier_config(PartialProbs(), tiny)
    assert cfg.use_probs_loss and not cfg.use_logits_loss

    # exactly one loss must be enabled (reference clip_cls.py:58)
    class BothLosses(NoLoss):
        loss_dict = dict(use_logits_loss=True, use_probs_loss=True)

    with pytest.raises(AssertionError):
        build_classifier_config(BothLosses(), tiny)

    class NeitherLoss(NoLoss):
        loss_dict = dict(use_logits_loss=False, use_probs_loss=False)

    with pytest.raises(AssertionError):
        build_classifier_config(NeitherLoss(), tiny)


def test_shipped_configs_all_specify_loss_dict():
    """Every trainable shipped config must carry an explicit loss_dict (the
    reference configs always do); guards against silently relying on the
    default."""
    import glob

    from eventclip_tpu.utils.config import load_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = glob.glob(os.path.join(repo, "configs", "**", "*_params*.py"),
                     recursive=True)
    assert len(cfgs) >= 15
    for path in cfgs:
        params = load_params(path)
        if params.model == "ZSCLIP":
            continue
        loss_dict = params.get("loss_dict", None)
        assert loss_dict, f"{path} lacks loss_dict"
        assert int(bool(loss_dict.get("use_logits_loss"))) + int(
            bool(loss_dict.get("use_probs_loss"))
        ) == 1, path


def test_convert_cli_to_npz_to_resolve_roundtrip(rng, tmp_path):
    """The full asset drop-in loop: torch.save a checkpoint, convert it with
    scripts/convert_clip.py (subprocess, the documented command), then load
    the npz through resolve_clip_params — the tree must equal the in-process
    conversion and report pretrained=True."""
    import subprocess
    import sys

    import jax
    import numpy as np
    import torch

    sd = random_clip_state_dict(rng)
    pt = str(tmp_path / "tiny.pt")
    torch.save(sd, pt)
    npz = str(tmp_path / "tiny.npz")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convert_clip.py"),
         pt, npz],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(npz)

    from eventclip_tpu.models.clip.convert import infer_config_from_state_dict

    cfg = infer_config_from_state_dict(sd)
    got, pretrained = resolve_clip_params(
        _Cfg(), cfg, jax.random.PRNGKey(0), npz
    )
    assert pretrained
    want = convert_clip_state_dict(sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        ),
        got, want,
    )
