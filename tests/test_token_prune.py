"""Eval-time ViT token pruning (encode_image keep_tokens).

Event frames are sparse — most 14x14 patches are uniform background with
~zero variance — so keeping only the K highest-variance patches drops
near-information-free tokens at static shapes. The reference has no such
path; these tests pin the exactness contract (K = all tokens reproduces
the full forward bitwise-up-to-fp) and the sparse-frame approximation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventclip_tpu.models.clip import clip_arch_config
from eventclip_tpu.models.clip.model import encode_image, init_clip_params


@pytest.fixture(scope="module")
def tiny():
    cfg = clip_arch_config("ViT-B/32")
    vision = dataclasses.replace(cfg.vision, layers=2, width=64, heads=2,
                                 image_size=64, patch_size=8, output_dim=32)
    cfg = dataclasses.replace(cfg, vision=vision)
    params = init_clip_params(jax.random.PRNGKey(4), cfg)
    return cfg, params


def test_keep_all_tokens_is_exact(tiny):
    """K = grid^2 must reproduce the unpruned forward: the gather is a
    permutation-free identity once indices are sorted, and positional
    embeddings travel with their patches."""
    cfg, params = tiny
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32))
    full = encode_image(params["visual"], cfg.vision, imgs)
    kept = encode_image(params["visual"], cfg.vision, imgs,
                        keep_tokens=cfg.vision.grid ** 2)
    np.testing.assert_allclose(np.asarray(kept), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_pruning_sparse_frames_close_to_full(tiny):
    """Frames that are background except a few patches: pruning to the
    occupied patches (+ margin) must barely move the feature."""
    cfg, params = tiny
    rng = np.random.default_rng(1)
    g = cfg.vision.grid  # 8 -> 64 patches
    imgs = np.full((2, 3, 64, 64), 0.7, np.float32)  # uniform background
    # scribble into 6 patches per image
    for b in range(2):
        for _ in range(6):
            i, j = rng.integers(0, g, 2)
            imgs[b, :, i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = rng.normal(
                size=(3, 8, 8)).astype(np.float32)
    imgs = jnp.asarray(imgs)
    full = np.asarray(encode_image(params["visual"], cfg.vision, imgs))
    kept = np.asarray(encode_image(params["visual"], cfg.vision, imgs,
                                   keep_tokens=16))
    cos = np.sum(full * kept, -1) / (
        np.linalg.norm(full, axis=-1) * np.linalg.norm(kept, axis=-1)
    )
    assert np.all(cos > 0.95), cos


def test_pruning_selects_high_variance_patches(tiny):
    """The kept set must contain every non-background patch (their variance
    dominates the uniform background's zero variance)."""
    cfg, params = tiny
    g, ps = cfg.vision.grid, cfg.vision.patch_size
    imgs = np.zeros((1, 3, 64, 64), np.float32)
    marked = [(0, 3), (2, 5), (7, 7), (4, 0)]
    for i, j in marked:
        imgs[0, :, i * ps:(i + 1) * ps, j * ps:(j + 1) * ps] = \
            np.random.default_rng(2).normal(size=(3, ps, ps))
    x = imgs.reshape(1, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(1, g * g, 3 * ps * ps)
    score = jnp.asarray(x).var(axis=-1)
    idx = np.asarray(jax.lax.top_k(score, 8)[1][0])
    want = {i * g + j for i, j in marked}
    assert want <= set(idx.tolist())


def test_classifier_prunes_only_at_eval(tiny):
    """keep_tokens must not alter the training forward (pruning is an
    inference-time approximation; gradients flow through the full tower)."""
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        classifier_forward,
        init_classifier_params,
    )

    cfg, _ = tiny
    rng = np.random.default_rng(3)
    base = ClassifierConfig(model="ZSCLIP", clip=cfg, dtype=jnp.float32)
    pruned = dataclasses.replace(base, keep_tokens=8)
    params = init_classifier_params(jax.random.PRNGKey(5), base, n_classes=4)
    imgs = jnp.asarray(rng.normal(size=(2, 2, 3, 64, 64)).astype(np.float32))
    valid = jnp.ones((2, 2), bool)
    out_train_base = classifier_forward(params, base, imgs, valid, train=True)
    out_train_pruned = classifier_forward(params, pruned, imgs, valid,
                                          train=True)
    np.testing.assert_array_equal(np.asarray(out_train_base["probs"]),
                                  np.asarray(out_train_pruned["probs"]))
    out_eval = classifier_forward(params, pruned, imgs, valid, train=False)
    assert not np.allclose(np.asarray(out_eval["probs"]),
                           np.asarray(out_train_base["probs"]))
