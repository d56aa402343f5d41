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
    from eventclip_tpu.models.clip.tokenizer import DEFAULT_BPE_PATHS

    for p in DEFAULT_BPE_PATHS:
        if p and os.path.exists(p):
            return p
    return None


@pytest.mark.skipif(not _HAS_CKPT, reason="set CLIP_CKPT=/path/to/*.pt")
def test_real_checkpoint_tower_parity(rng):
    """Our converter + towers vs the torch oracle on the REAL state dict."""
    import torch

    import jax.numpy as jnp

    from eventclip_tpu.models.clip.convert import (
        convert_clip_state_dict,
        infer_config_from_state_dict,
    )
    from eventclip_tpu.models.clip.model import encode_image, encode_text
    from .torch_oracle import encode_image_torch, encode_text_torch

    obj = torch.load(CKPT, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v.float() for k, v in sd.items()}
    cfg = infer_config_from_state_dict(sd)
    params = convert_clip_state_dict(sd)

    v = cfg.vision
    imgs = rng.normal(size=(2, 3, v.image_size, v.image_size)).astype(
        np.float32
    )
    ours = np.asarray(encode_image(params["visual"], v, jnp.asarray(imgs)))
    ref = encode_image_torch(sd, imgs, v.heads, v.layers)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    toks = np.zeros((2, cfg.text.context_length), dtype=np.int32)
    toks[:, 0] = 49406  # <|startoftext|>
    toks[0, 1:4] = [320, 2368, 49407]  # "a cat" + EOT
    toks[1, 1:3] = [1929, 49407]  # "dog" + EOT
    ours_t = np.asarray(encode_text(params["text"], cfg.text,
                                    jnp.asarray(toks)))
    ref_t = encode_text_torch(sd, toks, cfg.text.heads, cfg.text.layers)
    np.testing.assert_allclose(ours_t, ref_t, rtol=2e-3, atol=2e-3)


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
