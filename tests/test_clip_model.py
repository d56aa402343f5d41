"""CLIP tower parity tests against the torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventclip_tpu.models.clip import clip_arch_config
from eventclip_tpu.models.clip.convert import (
    convert_clip_state_dict,
    infer_config_from_state_dict,
)
from eventclip_tpu.models.clip.model import (
    encode_image,
    encode_text,
    init_clip_params,
    init_lora_params,
    parse_lora_spec,
)

from .torch_oracle import (
    encode_image_torch,
    encode_text_torch,
    random_clip_state_dict,
)


@pytest.fixture(scope="module")
def tiny_sd():
    return random_clip_state_dict(np.random.default_rng(3))


def test_infer_config(tiny_sd):
    cfg = infer_config_from_state_dict(tiny_sd)
    assert cfg.vision.width == 64
    assert cfg.vision.layers == 2
    assert cfg.vision.patch_size == 8
    assert cfg.vision.image_size == 32
    assert cfg.text.width == 32
    assert cfg.text.vocab_size == 128
    assert cfg.embed_dim == 48


def test_encode_image_matches_torch(tiny_sd, rng):
    cfg = infer_config_from_state_dict(tiny_sd)
    params = convert_clip_state_dict(tiny_sd)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(encode_image(params["visual"], cfg.vision, jnp.asarray(images)))
    want = encode_image_torch(tiny_sd, images, cfg.vision.heads, cfg.vision.layers)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encode_text_matches_torch(tiny_sd, rng):
    cfg = infer_config_from_state_dict(tiny_sd)
    params = convert_clip_state_dict(tiny_sd)
    # tokens: ids in [1, vocab), "EOT" = highest id at a random position
    tokens = rng.integers(1, 100, size=(3, 16)).astype(np.int32)
    for i, pos in enumerate([5, 9, 15]):
        tokens[i, pos] = 127
        tokens[i, pos + 1 :] = 0
    got = np.asarray(encode_text(params["text"], cfg.text, jnp.asarray(tokens)))
    want = encode_text_torch(tiny_sd, tokens, cfg.text.heads, cfg.text.layers)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_arch_table():
    l14 = clip_arch_config("ViT-L/14")
    assert l14.vision.width == 1024 and l14.vision.layers == 24
    assert l14.vision.seq_len == 257
    assert l14.embed_dim == 768
    b32 = clip_arch_config("ViT-B/32")
    assert b32.vision.seq_len == 50 and b32.embed_dim == 512
    assert clip_arch_config("ViT-L/14@336px").vision.seq_len == 577


def test_random_init_runs():
    cfg = clip_arch_config("ViT-B/32")
    # shrink for test speed
    import dataclasses

    vision = dataclasses.replace(cfg.vision, layers=2, width=64, heads=2,
                                 image_size=64, patch_size=32, output_dim=32)
    text = dataclasses.replace(cfg.text, layers=2, width=32, heads=2,
                               vocab_size=100, output_dim=32)
    cfg = dataclasses.replace(cfg, vision=vision, text=text)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 3, 64, 64))
    out = encode_image(params["visual"], cfg.vision, img)
    assert out.shape == (1, 32)
    toks = jnp.array([[1, 5, 99, 0, 0, 0, 0, 0] + [0] * 69])
    out = encode_text(params["text"], cfg.text, toks)
    assert out.shape == (1, 32)


class TestLora:
    def test_parse_spec(self):
        assert parse_lora_spec(16) == {"rank": 16, "targets": ("q", "k", "v")}
        assert parse_lora_spec("qv-4") == {"rank": 4, "targets": ("q", "v")}
        assert parse_lora_spec("qkv-8") == {"rank": 8, "targets": ("q", "k", "v")}
        assert parse_lora_spec("qkvo-8") == {"rank": 8, "targets": ("q", "k", "v", "o")}
        assert parse_lora_spec(-1) is None
        assert parse_lora_spec(None) is None

    def test_zero_init_is_identity(self, tiny_sd, rng):
        cfg = infer_config_from_state_dict(tiny_sd)
        params = convert_clip_state_dict(tiny_sd)
        lora = init_lora_params(jax.random.PRNGKey(1), cfg.vision, 16)
        images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
        base = encode_image(params["visual"], cfg.vision, images)
        with_lora = encode_image(params["visual"], cfg.vision, images, lora=lora)
        np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), rtol=1e-6)

    def test_nonzero_lora_matches_merged_weights(self, tiny_sd, rng):
        cfg = infer_config_from_state_dict(tiny_sd)
        params = convert_clip_state_dict(tiny_sd)
        lora = init_lora_params(jax.random.PRNGKey(1), cfg.vision, "qkv-4")
        lora = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.02,
            lora,
        )
        images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
        got = encode_image(params["visual"], cfg.vision, images, lora=lora)

        # oracle: merge deltas into in_proj weights of a copied state dict
        import torch

        sd = dict(tiny_sd)
        w = cfg.vision.width
        for i in range(cfg.vision.layers):
            deltas = []
            for tgt in ("q", "k", "v"):
                a = torch.tensor(np.asarray(lora[tgt]["a"][i]))
                b = torch.tensor(np.asarray(lora[tgt]["b"][i]))
                deltas.append(b @ a)
            key = f"visual.transformer.resblocks.{i}.attn.in_proj_weight"
            sd[key] = sd[key] + torch.cat(deltas, dim=0)
        want = encode_image_torch(sd, np.asarray(images), cfg.vision.heads, cfg.vision.layers)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


class TestPallasGates:
    """The Mosaic kernels must stay off the multi-device GSPMD jit path:
    a bare pallas_call there is an opaque custom call the partitioner
    cannot split along the sharded batch axis (pods take the XLA
    formulations; shard_map'd TP keeps the kernel per-shard)."""

    def _fake(self, monkeypatch, n_devices):
        from eventclip_tpu.ops import pallas_gate as G

        monkeypatch.setattr(G.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(G.jax, "devices",
                            lambda *a: [object()] * n_devices)

    def test_attention_gate(self, monkeypatch):
        from eventclip_tpu.models.clip import model as M

        self._fake(monkeypatch, 1)
        assert M._use_pallas_attention()
        self._fake(monkeypatch, 8)
        assert not M._use_pallas_attention()
        assert M._use_pallas_attention(sharded=True)  # TP shard_map path
        monkeypatch.setenv("EVENTCLIP_NO_PALLAS", "1")
        assert not M._use_pallas_attention(sharded=True)

    def test_rasterize_gate(self, monkeypatch):
        from eventclip_tpu.ops import rasterize as RZ

        self._fake(monkeypatch, 1)
        assert RZ._use_pallas_histograms()
        self._fake(monkeypatch, 8)
        assert not RZ._use_pallas_histograms()
        self._fake(monkeypatch, 1)
        monkeypatch.setenv("EVENTCLIP_NO_PALLAS_RASTER", "1")
        assert not RZ._use_pallas_histograms()

    def test_shared_overrides(self, monkeypatch):
        from eventclip_tpu.models.clip import model as M
        from eventclip_tpu.ops import rasterize as RZ

        # the broad kill switch disables BOTH kernels
        self._fake(monkeypatch, 1)
        monkeypatch.setenv("EVENTCLIP_NO_PALLAS", "1")
        assert not M._use_pallas_attention()
        assert not RZ._use_pallas_histograms()
        monkeypatch.delenv("EVENTCLIP_NO_PALLAS")
        # force: multi-device host running a single-device workload
        self._fake(monkeypatch, 8)
        monkeypatch.setenv("EVENTCLIP_PALLAS", "force")
        assert M._use_pallas_attention()
        assert RZ._use_pallas_histograms()
        monkeypatch.setenv("EVENTCLIP_PALLAS", "off")
        self._fake(monkeypatch, 1)
        assert not M._use_pallas_attention()
        assert M._use_pallas_attention(sharded=True)  # off spares shard_map
