"""Conditional parity tests against REAL OpenAI CLIP assets.

These tests are skipped in asset-free environments (this container has zero
egress, so neither the released .pt checkpoints nor the BPE merge table are
available). The day the assets land —

  - CLIP checkpoint: set CLIP_CKPT=/path/to/ViT-B-32.pt (or a converted .npz)
  - BPE vocab:       drop bpe_simple_vocab_16e6.txt.gz into eventclip_tpu/assets/

— real-weight parity becomes one pytest away:
  our converter + JAX towers are checked against an independent torch
  implementation of the reference model equations (tests/torch_oracle.py),
  and the tokenizer against the published token ids of CLIP's README example
  (reference contract: clip.load / clip.tokenize, reference train.py:26,
  models/clip_cls.py:81-83).
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("CLIP_CKPT", "")
_HAS_CKPT = bool(CKPT) and os.path.exists(CKPT) and CKPT.endswith(".pt")


def _bpe_path():
    from eventclip_tpu.models.clip.tokenizer import bpe_asset_paths

    for p in bpe_asset_paths():
        if p and os.path.exists(p):
            return p
    return None


def check_state_dict_tower_parity(sd, rng, tol=2e-3):
    """Converter + JAX towers vs the torch oracles for ONE state dict.

    Dispatches on the checkpoint's tower family (ViT vs ModifiedResNet) the
    way `infer_config_from_state_dict` does, so the same body validates any
    of the 8 sweep arches (reference scripts/test_all_arch.sh:6). Called by
    the conditional real-asset test below, an always-on synthetic test (so
    the dispatch itself cannot rot while assets are absent), and the
    one-command harness `scripts/parity_check.py`. Returns the measured
    max-abs feature diffs after asserting them within `tol`.
    """
    import torch

    import jax.numpy as jnp

    from eventclip_tpu.models.clip.convert import (
        convert_clip_state_dict,
        infer_config_from_state_dict,
    )
    from eventclip_tpu.models.clip.model import encode_image, encode_text
    from eventclip_tpu.models.clip.resnet import (
        ResNetVisionConfig,
        encode_image_resnet,
    )
    from .torch_oracle import encode_image_torch, encode_text_torch

    cfg = infer_config_from_state_dict(sd)
    params = convert_clip_state_dict(sd)

    v = cfg.vision
    imgs = rng.normal(size=(2, 3, v.image_size, v.image_size)).astype(
        np.float32
    )
    if isinstance(v, ResNetVisionConfig):
        # RN50..RN50x64 checkpoints: drive the real state dict through the
        # torch ModifiedResNet oracle (tests/test_resnet.py — same module
        # the small-scale converter test uses) and through our folded-BN
        # JAX tower
        from .test_resnet import ModifiedResNetOracle

        oracle = ModifiedResNetOracle(
            layers=v.layers, width=v.width, image_size=v.image_size,
            heads=v.heads, output_dim=v.output_dim,
        ).eval()
        oracle.load_state_dict(
            {k[len("visual."):]: t for k, t in sd.items()
             if k.startswith("visual.")}
        )
        with torch.no_grad():
            ref = oracle(torch.from_numpy(imgs)).numpy()
        ours = np.asarray(
            encode_image_resnet(params["visual"], v, jnp.asarray(imgs))
        )
        # the int8 path must refuse RN towers loudly, not garble them
        with pytest.raises(ValueError, match="ViT"):
            from eventclip_tpu.ops.quant import quantize_classifier_params

            quantize_classifier_params({"clip": dict(params)})
    else:
        ours = np.asarray(encode_image(params["visual"], v, jnp.asarray(imgs)))
        ref = encode_image_torch(sd, imgs, v.heads, v.layers)
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)

    vocab = sd["token_embedding.weight"].shape[0]
    sot, eot = vocab - 2, vocab - 1  # CLIP convention: last two BPE ids
    toks = np.zeros((2, cfg.text.context_length), dtype=np.int32)
    toks[:, 0] = sot
    toks[0, 1:4] = [320 % vocab, 2368 % vocab, eot]  # "a cat" + EOT (real vocab)
    toks[1, 1:3] = [1929 % vocab, eot]  # "dog" + EOT
    ours_t = np.asarray(encode_text(params["text"], cfg.text,
                                    jnp.asarray(toks)))
    ref_t = encode_text_torch(sd, toks, cfg.text.heads, cfg.text.layers)
    np.testing.assert_allclose(ours_t, ref_t, rtol=tol, atol=tol)
    return {
        "arch": cfg.name,
        "image_max_abs_diff": float(np.max(np.abs(ours - ref))),
        "text_max_abs_diff": float(np.max(np.abs(ours_t - ref_t))),
        "tol": tol,
    }


@pytest.mark.skipif(not _HAS_CKPT, reason="set CLIP_CKPT=/path/to/*.pt")
def test_real_checkpoint_tower_parity(rng):
    """Our converter + towers vs the torch oracle on the REAL state dict."""
    import torch

    obj = torch.load(CKPT, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v.float() for k, v in sd.items()}
    check_state_dict_tower_parity(sd, rng)


def test_tower_parity_dispatch_resnet_synthetic(rng):
    """The RN branch of the parity checker, on a tiny synthetic RN ckpt.

    Keeps the ResNet dispatch (oracle construction + load_state_dict
    round-trip + int8 rejection) green in asset-free environments so
    `CLIP_CKPT=RN50.pt` is guaranteed to run, not break, on arrival.
    """
    import torch

    from .test_resnet import ModifiedResNetOracle, oracle_state_dict

    torch.manual_seed(0)
    m = ModifiedResNetOracle(layers=(1, 1, 1, 1), width=16, image_size=64,
                             heads=4, output_dim=32).eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    check_state_dict_tower_parity(oracle_state_dict(m), rng, tol=2e-4)


@pytest.mark.skipif(_bpe_path() is None,
                    reason="drop bpe_simple_vocab_16e6.txt.gz into "
                    "eventclip_tpu/assets/")
def test_real_bpe_tokenizer_golden_ids():
    """clip.tokenize("a photo of a cat") from the CLIP README."""
    from eventclip_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize

    tok = SimpleTokenizer(_bpe_path())
    ids = tokenize(["a photo of a cat"], tok, context_length=77)[0]
    expected = [49406, 320, 1125, 539, 320, 2368, 49407]
    assert list(ids[: len(expected)]) == expected
    assert all(i == 0 for i in ids[len(expected):])


@pytest.mark.skipif(not (_HAS_CKPT and _bpe_path()),
                    reason="needs both CLIP_CKPT and the BPE asset")
def test_real_zero_shot_text_image_alignment():
    """End-to-end sanity with real weights: the cosine similarity structure
    of CLIP must survive conversion (same-concept prompts closer than
    unrelated ones)."""
    import jax

    from eventclip_tpu.engine.trainer import (
        build_text_features,
        resolve_clip_params,
    )
    from eventclip_tpu.models.clip.convert import load_clip_checkpoint

    _, cfg = load_clip_checkpoint(CKPT)
    params, pretrained = resolve_clip_params(
        type("P", (), {"get": lambda *_a, **_k: None})(), cfg,
        jax.random.PRNGKey(0), CKPT,
    )
    assert pretrained
    feats = build_text_features(
        params, cfg, ["cat", "kitten", "airplane"], "a photo of a {}",
        pretrained=True,
    )
    f = np.asarray(feats)
    sim = f @ f.T
    assert sim[0, 1] > sim[0, 2], "cat~kitten must beat cat~airplane"
