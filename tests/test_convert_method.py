"""Reference method-checkpoint migration (models/clip/convert_method.py).

The reference saves CLIP-free trained checkpoints (adapter / text_feats /
LoRA / visual tower, models/clip_cls.py:208-219, clip_cls_ft.py:313-333).
These tests build checkpoints with the reference's exact torch key space
(torch modules for the adapter, the injected-LoRA naming from
models/lora.py) and assert the converted pytree reproduces the torch
forward — weight migration is only real if the numerics survive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eventclip_tpu.models.adapter import AdapterConfig, apply_adapter
from eventclip_tpu.models.clip.convert import (
    convert_clip_state_dict,
    infer_config_from_state_dict,
)
from eventclip_tpu.models.clip.convert_method import (
    _unwrap,
    convert_method_state_dict,
)
from eventclip_tpu.models.clip.model import encode_image

from .torch_oracle import encode_image_torch, random_clip_state_dict


def ref_adapter_module(in_dim=24, d_model=16, heads=2, ffn=32, layers=2):
    """The reference TransformerAdapter's module tree (models/adapter.py:
    53-80) — same attribute names, so state_dict() emits the reference's
    exact checkpoint keys once prefixed with 'adapter.'."""
    torch.manual_seed(7)

    class RefAdapter(torch.nn.Module):
        def __init__(self):
            super().__init__()
            enc = torch.nn.TransformerEncoderLayer(
                d_model=d_model, nhead=heads, dim_feedforward=ffn,
                norm_first=True, batch_first=True)
            self.transformer_encoder = torch.nn.TransformerEncoder(
                enc, num_layers=layers)
            self.in_proj = torch.nn.Linear(in_dim, d_model)
            self.out_proj = torch.nn.Linear(d_model, in_dim)

    return RefAdapter().eval()


def test_fs_adapter_checkpoint_roundtrip(rng):
    """FS checkpoint (adapter.* + text_feats) -> converted pytree whose
    forward equals the reference torch adapter's."""
    residual = 0.8
    mod = ref_adapter_module()
    text_feats = rng.normal(size=(5, 24)).astype(np.float32)
    ckpt = {f"adapter.{k}": v for k, v in mod.state_dict().items()}
    ckpt["text_feats"] = torch.tensor(text_feats)

    tree = convert_method_state_dict(ckpt)
    np.testing.assert_array_equal(tree["text_feats"], text_feats)

    cfg = AdapterConfig(adapter_type="trans", in_dim=24, d_model=16,
                        num_heads=2, ffn_dim=32, num_layers=2,
                        residual=residual)
    feats = rng.normal(size=(3, 5, 24)).astype(np.float32)
    valid = np.ones((3, 5), bool)
    valid[0, 3:] = False
    got = np.asarray(apply_adapter(
        tree["adapter"], cfg, jnp.asarray(feats), jnp.asarray(valid),
        train=False))
    with torch.no_grad():
        x = mod.in_proj(torch.tensor(feats))
        x = mod.transformer_encoder(
            x, src_key_padding_mask=~torch.tensor(valid))
        new = mod.out_proj(x).numpy()
    want = feats * residual + new * (1.0 - residual)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=1e-5)


def _lora_injected_visual_ckpt(sd, rng, targets=("q", "k", "v"), r=4):
    """Rewrite a plain CLIP visual tower into the FT checkpoint key space:
    'model.visual.*' with each attn.in_proj_weight replaced by the
    injected module's leaves (models/lora.py:104-148)."""
    layers = 1 + max(int(k.split(".")[3]) for k in sd
                     if k.startswith("visual.transformer.resblocks."))
    ckpt, lora_np = {}, {}
    for k, v in sd.items():
        if not k.startswith("visual."):
            continue
        if k.endswith(".attn.in_proj_weight"):
            ckpt[f"model.{k}.merged_proj"] = v
        else:
            ckpt[f"model.{k}"] = v
    width = np.asarray(sd["visual.class_embedding"]).shape[0]
    for i in range(layers):
        base = f"model.visual.transformer.resblocks.{i}.attn.in_proj_weight"
        for t in targets:
            down = rng.normal(size=(r, width)).astype(np.float32) * 0.05
            up = rng.normal(size=(width, r)).astype(np.float32) * 0.05
            ckpt[f"{base}.lora_down_{t}"] = torch.tensor(down)
            ckpt[f"{base}.lora_up_{t}"] = torch.tensor(up)
            lora_np.setdefault(t, []).append((down, up))
    return ckpt, lora_np, layers, width


def test_ft_lora_checkpoint_roundtrip(rng):
    """FT LoRA checkpoint -> converted tower + deltas whose encode_image
    equals the torch oracle run on pre-merged weights (W + up @ down,
    models/lora.py:137-148)."""
    sd = random_clip_state_dict(np.random.default_rng(3))
    cfg = infer_config_from_state_dict(sd)
    ckpt, lora_np, layers, width = _lora_injected_visual_ckpt(sd, rng)
    ckpt["text_feats"] = torch.tensor(
        rng.normal(size=(5, 48)).astype(np.float32))

    tree = convert_method_state_dict(ckpt)
    assert set(tree) == {"text_feats", "lora", "clip"}
    for t, pairs in lora_np.items():
        np.testing.assert_array_equal(
            tree["lora"][t]["a"], np.stack([d for d, _ in pairs]))
        np.testing.assert_array_equal(
            tree["lora"][t]["b"], np.stack([u for _, u in pairs]))

    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(encode_image(
        tree["clip"]["visual"], cfg.vision, jnp.asarray(images),
        lora=jax.tree_util.tree_map(jnp.asarray, tree["lora"])))
    merged = {k: torch.as_tensor(np.asarray(v)).clone() for k, v in sd.items()}
    for i in range(layers):
        deltas = [torch.tensor(u @ d) for d, u in
                  (lora_np[t][i] for t in ("q", "k", "v"))]
        key = f"visual.transformer.resblocks.{i}.attn.in_proj_weight"
        merged[key] = merged[key] + torch.cat(deltas, dim=0)
    want = encode_image_torch(merged, images, cfg.vision.heads,
                              cfg.vision.layers)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ft_full_checkpoint_matches_clip_convert():
    """A plain (no-LoRA) FT checkpoint's visual tower converts exactly as
    the full-CLIP converter does."""
    sd = random_clip_state_dict(np.random.default_rng(5))
    ckpt = {f"model.{k}": v for k, v in sd.items() if k.startswith("visual.")}
    tree = convert_method_state_dict(ckpt)
    want = convert_clip_state_dict(sd)["visual"]
    got_flat = jax.tree_util.tree_leaves(tree["clip"]["visual"])
    want_flat = jax.tree_util.tree_leaves(want)
    assert len(got_flat) == len(want_flat)
    for g, w in zip(got_flat, want_flat):
        np.testing.assert_array_equal(g, w)


def test_unwrap_and_error_paths(rng):
    mod = ref_adapter_module()
    inner = {f"adapter.{k}": v for k, v in mod.state_dict().items()}
    # nerv/lightning wrap the state dict
    tree = convert_method_state_dict(_unwrap({"state_dict": inner}))
    assert "adapter" in tree
    # a non-EventCLIP checkpoint is rejected loudly
    with pytest.raises(ValueError, match="unrecognized checkpoint keys"):
        convert_method_state_dict({"backbone.conv.weight": torch.zeros(1)})
    # a zero-shot "checkpoint" has nothing to convert
    with pytest.raises(AssertionError, match="no trainable weights"):
        convert_method_state_dict({"adapter.dummy": torch.zeros(1)})
    # ResNet FT towers are out of contract
    with pytest.raises(ValueError, match="ResNet"):
        convert_method_state_dict(
            {"model.visual.attnpool.c_proj.weight": torch.zeros(2, 2)})


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}{k}/")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}{k}")


def test_export_fs_strict_loads_and_round_trips(rng):
    """npz -> .pth export: the FS key space strict-loads into the
    reference-shaped torch module and survives a convert-back round
    trip."""
    from eventclip_tpu.models.clip.convert_method import (
        export_method_state_dict,
    )

    mod = ref_adapter_module()
    ckpt = {f"adapter.{k}": v for k, v in mod.state_dict().items()}
    ckpt["text_feats"] = torch.tensor(rng.normal(size=(5, 24)).astype(np.float32))
    tree = convert_method_state_dict(ckpt)

    exported = export_method_state_dict(tree)
    # strict load proves key names AND shapes match the reference module
    fresh = ref_adapter_module()
    fresh.load_state_dict(
        {k[len("adapter."):]: torch.tensor(v) for k, v in exported.items()
         if k.startswith("adapter.")},
        strict=True)
    _tree_equal(tree, convert_method_state_dict(exported))


def test_export_lora_requires_base_and_round_trips(rng):
    """LoRA export refuses without the frozen tower, and with it emits the
    injected key space that converts back to the identical tree."""
    from eventclip_tpu.models.clip.convert_method import (
        export_method_state_dict,
    )

    sd = random_clip_state_dict(np.random.default_rng(3))
    ckpt, _, _, _ = _lora_injected_visual_ckpt(sd, rng)
    tree = convert_method_state_dict(ckpt)
    # our LoRA checkpoints carry only the deltas — drop the tower
    deltas_only = {"lora": tree["lora"]}

    with pytest.raises(ValueError, match="trainable leaves"):
        export_method_state_dict(deltas_only)

    base_visual = convert_clip_state_dict(sd)["visual"]
    exported = export_method_state_dict(deltas_only,
                                        clip_visual=base_visual)
    assert "adapter.dummy" in exported  # FTCLIP's IdentityAdapter leaf
    back = convert_method_state_dict(exported)
    _tree_equal(back["lora"], tree["lora"])
    _tree_equal(back["clip"]["visual"], tree["clip"]["visual"])


def test_export_full_ft_is_self_contained():
    """A full-FT checkpoint (whole tower saved) exports without a base and
    the visual tower round-trips exactly."""
    from eventclip_tpu.models.clip.convert_method import (
        export_method_state_dict,
    )

    sd = random_clip_state_dict(np.random.default_rng(5))
    tree = {"clip": {"visual": convert_clip_state_dict(sd)["visual"]}}
    exported = export_method_state_dict(tree)
    conv1 = np.asarray(sd["visual.conv1.weight"])
    np.testing.assert_allclose(exported["model.visual.conv1.weight"],
                               conv1.astype(np.float32), rtol=1e-6)
    back = convert_method_state_dict(exported)
    _tree_equal(back["clip"]["visual"], tree["clip"]["visual"])


def test_load_checkpoint_accepts_reference_pth(tmp_path, rng):
    """Every --weight surface funnels through engine.checkpoint.
    load_checkpoint, which converts reference .pth files on the fly — no
    separate conversion step needed to evaluate a reference run here."""
    import jax

    from eventclip_tpu.engine.checkpoint import load_checkpoint

    mod = ref_adapter_module()
    sd = {f"adapter.{k}": v for k, v in mod.state_dict().items()}
    sd["text_feats"] = torch.tensor(rng.normal(size=(5, 24)).astype(np.float32))
    path = str(tmp_path / "best.pth")
    torch.save({"state_dict": sd}, path)

    want = convert_method_state_dict(sd)
    target = jax.tree_util.tree_map(np.zeros_like, want)
    got, extra = load_checkpoint(path, target=target)
    assert extra == {}
    _tree_equal(got, want)


def test_find_weight_discovers_reference_pth(tmp_path):
    """--train_shots discovery works over a checkpoint tree the REFERENCE
    trainer produced: best.pth preferred, else latest model_<it>.pth;
    native .npz still wins when both exist."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from test import find_weight

    d = tmp_path / "models"
    d.mkdir()
    (d / "model_100.pth").write_bytes(b"x")
    (d / "model_2000.pth").write_bytes(b"x")
    assert find_weight(str(d)).endswith("model_2000.pth")
    (d / "best.pth").write_bytes(b"x")
    assert find_weight(str(d)).endswith("best.pth")
    (d / "best.npz").write_bytes(b"x")
    assert find_weight(str(d)).endswith("best.npz")


def test_export_prompt_only_includes_identity_dummy(rng):
    """A prompt-only FS checkpoint ('text-identity': just text_feats) must
    still export the IdentityAdapter's registered dummy leaf — the
    reference's strict load expects it (models/adapter.py:34-50)."""
    from eventclip_tpu.models.clip.convert_method import (
        export_method_state_dict,
    )

    tree = {"text_feats": rng.normal(size=(5, 24)).astype(np.float32)}
    exported = export_method_state_dict(tree)
    assert set(exported) == {"text_feats", "adapter.dummy"}
    # and a trans-adapter export must NOT carry the dummy (no such module)
    mod = ref_adapter_module()
    ckpt = {f"adapter.{k}": v for k, v in mod.state_dict().items()}
    exported = export_method_state_dict(convert_method_state_dict(ckpt))
    assert "adapter.dummy" not in exported
    # round trip: the dummy is recognized, text_feats survives
    back = convert_method_state_dict(
        export_method_state_dict(tree))
    np.testing.assert_array_equal(back["text_feats"], tree["text_feats"])


def test_load_checkpoint_rejects_unconsumed_leaves(tmp_path, rng):
    """Leaves that match no target parameter must raise (the reference's
    strict=True behavior) — silently ignoring them would evaluate an
    untrained model while claiming the checkpoint loaded."""
    from eventclip_tpu.engine.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    tree = {"lora": {"q": {"a": rng.normal(size=(2, 4, 8)).astype(np.float32)}}}
    path = str(tmp_path / "ft.npz")
    save_checkpoint(path, tree)
    fs_target = {"adapter": {"in_proj": {"w": np.zeros((4, 8), np.float32)}}}
    with pytest.raises(ValueError, match="match no parameter"):
        load_checkpoint(path, target=fs_target)


def test_load_method_checkpoint_is_weights_only(tmp_path):
    """--weight .pth loading must not unpickle arbitrary objects (it is
    reachable with third-party files); non-tensor pickles are rejected
    with the EVENTCLIP_UNSAFE_TORCH_LOAD hint."""
    from eventclip_tpu.models.clip.convert_method import (
        load_method_checkpoint,
    )

    import argparse

    path = str(tmp_path / "evil.pth")
    torch.save({"state_dict": {"adapter.dummy": argparse.Namespace(x=1)}},
               path)
    with pytest.raises(ValueError, match="EVENTCLIP_UNSAFE_TORCH_LOAD"):
        load_method_checkpoint(path)
