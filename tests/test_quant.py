"""W8A8 int8 inference path (ops/quant.py): numerics and plumbing.

The quantized tree must drop into the unchanged forward (model.dense
dispatches on the {'q','s'} dict) and stay close enough to the f32 tower
that eval-time predictions are preserved. The reference has no quantized
path; these tests guard a beyond-parity feature.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventclip_tpu.models.clip import clip_arch_config
from eventclip_tpu.models.clip.model import dense, encode_image, init_clip_params
from eventclip_tpu.ops.quant import qdense, quantize_visual, quantize_weight


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["s"].shape == (16,)
    back = qw["q"].astype(jnp.float32) * qw["s"][:, None]
    # per-channel symmetric: error bounded by half a quantization step
    step = np.asarray(qw["s"])[:, None]
    assert np.all(np.abs(np.asarray(back - w)) <= 0.5 * step + 1e-7)


def test_quantize_weight_stacked_axes(rng):
    w = jnp.asarray(rng.normal(size=(3, 4, 8, 16)).astype(np.float32))  # [L,3,D,D]-style
    qw = quantize_weight(w)
    assert qw["q"].shape == w.shape and qw["s"].shape == (3, 4, 8)


def test_qdense_close_to_dense(rng):
    x = jnp.asarray(rng.normal(size=(5, 7, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    want = np.asarray(dense(x, w, b))
    got = np.asarray(qdense(x, quantize_weight(w), b))
    # int8 W8A8 on gaussian data: ~2% RMS relative error (quant noise does
    # not average out with contraction size — both error and output grow
    # ~sqrt(K)); outliers a few sigma above that
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 0.3
    assert np.mean(np.abs(got - want) / denom) < 0.03


def _tiny_cfg():
    cfg = clip_arch_config("ViT-B/32")
    vision = dataclasses.replace(cfg.vision, layers=2, width=64, heads=2,
                                 image_size=64, patch_size=16, output_dim=32)
    return dataclasses.replace(cfg, vision=vision)


def test_quantized_encode_matches_f32(rng):
    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.normal(size=(4, 3, 64, 64)).astype(np.float32))
    ref = np.asarray(encode_image(params["visual"], cfg.vision, imgs))
    qvis = quantize_visual(params["visual"])
    got = np.asarray(encode_image(qvis, cfg.vision, imgs))
    # feature direction is what the classifier consumes (cosine logits)
    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert np.all(cos > 0.99), cos
    # and it runs under jit with the quantized tree as a traced input
    jit_ref = np.asarray(
        jax.jit(lambda v, x: encode_image(v, cfg.vision, x))(qvis, imgs)
    )
    np.testing.assert_allclose(jit_ref, got, rtol=1e-4, atol=1e-4)


def test_quantize_visual_is_idempotent_and_partial(rng):
    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(1), cfg)
    qvis = quantize_visual(params["visual"])
    assert qvis["blocks"]["attn"]["wqkv"]["q"].dtype == jnp.int8
    assert qvis["blocks"]["mlp"]["w1"]["q"].dtype == jnp.int8
    # float leaves untouched
    assert qvis["proj"].dtype != jnp.int8
    assert qvis["ln_pre"]["scale"].dtype == jnp.float32
    again = quantize_visual(qvis)
    assert again["blocks"]["attn"]["wqkv"]["q"] is qvis["blocks"]["attn"]["wqkv"]["q"]


def test_quantized_classifier_predictions_agree(rng):
    """ZS classifier argmax must survive quantization on the tiny tower."""
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        classifier_forward,
        init_classifier_params,
    )

    cfg = _tiny_cfg()
    ccfg = ClassifierConfig(model="ZSCLIP", clip=cfg, dtype=jnp.float32)
    params = init_classifier_params(jax.random.PRNGKey(2), ccfg, n_classes=7)
    imgs = jnp.asarray(rng.normal(size=(3, 2, 3, 64, 64)).astype(np.float32))
    valid = jnp.ones((3, 2), dtype=bool)
    ref = classifier_forward(params, ccfg, imgs, valid)["probs"]
    qparams = dict(params)
    qparams["clip"] = dict(params["clip"])
    qparams["clip"]["visual"] = quantize_visual(params["clip"]["visual"])
    got = classifier_forward(qparams, ccfg, imgs, valid)["probs"]
    assert np.argmax(np.asarray(ref), -1).tolist() == \
        np.argmax(np.asarray(got), -1).tolist()


def test_fast_path_preserves_learned_predictions():
    """int8 + token pruning must keep a TRAINED model's predictions, not
    just execute: overfit the tiny FS adapter on one batch (the
    test_engine learning recipe), then evaluate the same batch through the
    quantized + pruned forward and require the fitted accuracy to survive."""
    import jax

    from eventclip_tpu.engine import OptimConfig, build_optimizer, \
        create_train_state, make_train_step
    from eventclip_tpu.models.classifier import (
        classifier_forward,
        init_classifier_params,
    )
    from eventclip_tpu.parallel import make_mesh
    from tests.test_engine import make_batch, tiny_fs_config

    cfg = tiny_fs_config()
    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    params = init_classifier_params(jax.random.PRNGKey(0), cfg, n_classes=5)
    tx = build_optimizer(
        cfg, OptimConfig(lr=3e-2, total_steps=80, warmup_steps_pct=0.0),
        params,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, mesh, loss_weights={"ce_loss": 1.0})
    # dedicated generator: the module `rng` fixture's state depends on
    # which tests ran before, and the overfit budget is tuned to the data
    batch = make_batch(np.random.default_rng(42))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(60):
        state, _ = step(state, batch)

    def acc(p, c):
        out = classifier_forward(p, c, batch["img"], batch["valid_mask"])
        return float(
            (np.asarray(out["probs"]).argmax(-1) ==
             np.asarray(batch["label"])).mean()
        )

    full = acc(state.params, cfg)
    assert full >= 0.75, f"tiny adapter failed to overfit: {full}"
    qparams = dict(state.params)
    qparams["clip"] = dict(state.params["clip"])
    qparams["clip"]["visual"] = quantize_visual(
        state.params["clip"]["visual"]
    )
    fast_cfg = dataclasses.replace(cfg, keep_tokens=12)  # of 16 patches
    fast = acc(qparams, fast_cfg)
    assert fast >= full - 0.15, (
        f"fast path lost the learned accuracy: full={full} fast={fast}"
    )


def test_int8_composes_with_data_parallel_eval(rng):
    """--int8 must ride the data mesh (test.py sweeps): the quantized tree
    placed with shard_params over the 8-device mesh + a data-sharded batch
    must reproduce the single-device quantized predictions."""
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        classifier_forward,
        init_classifier_params,
    )
    from eventclip_tpu.ops.quant import quantize_classifier_params
    from eventclip_tpu.parallel import make_mesh, shard_batch, shard_params

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = _tiny_cfg()
    ccfg = ClassifierConfig(model="ZSCLIP", clip=cfg, dtype=jnp.float32)
    params = init_classifier_params(jax.random.PRNGKey(3), ccfg, n_classes=7)
    qparams = quantize_classifier_params(params)
    B = jax.device_count()
    imgs = rng.normal(size=(B, 2, 3, 64, 64)).astype(np.float32)
    valid = np.ones((B, 2), dtype=bool)
    ref = np.asarray(classifier_forward(
        qparams, ccfg, jnp.asarray(imgs), jnp.asarray(valid))["probs"])

    mesh = make_mesh()
    sq = shard_params(qparams, mesh)
    batch = shard_batch({"imgs": imgs, "valid": valid}, mesh)
    fwd = jax.jit(lambda p, i, v: classifier_forward(p, ccfg, i, v)["probs"])
    got = np.asarray(fwd(sq, batch["imgs"], batch["valid"]))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_calibrated_static_scales_shapes_and_attach(rng):
    """collect_amax returns [L, 4] positive maxima; quantize_visual
    attaches them as per-(layer, site) 'a' scalars = amax/127."""
    from eventclip_tpu.models.clip.model import encode_image as enc
    from eventclip_tpu.ops.quant import calibrate_visual_amax

    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(3), cfg)
    imgs = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32))
    amax = calibrate_visual_amax(params["visual"], cfg.vision, imgs,
                                 dtype=jnp.float32)
    L = cfg.vision.layers
    assert amax.shape == (L, 4)
    assert np.all(np.asarray(amax) > 0)
    # the collected maxima really are the maxima of a second identical run
    _, again = enc(params["visual"], cfg.vision, imgs, dtype=jnp.float32,
                   collect_amax=True)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(again),
                               rtol=1e-6)

    qvis = quantize_visual(params["visual"], act_amax=amax)
    for i, (grp, key) in enumerate((("attn", "wqkv"), ("attn", "wo"),
                                    ("mlp", "w1"), ("mlp", "w2"))):
        a = qvis["blocks"][grp][key]["a"]
        assert a.shape == (L,)
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(amax)[:, i] / 127.0,
                                   rtol=1e-6)
    # patch_embed stays dynamic (no calibration site)
    assert "a" not in qvis["patch_embed"]


def test_static_scales_preserve_predictions(rng):
    """Static activation scales calibrated on the eval batch itself must
    keep the ZS argmax (the clipping never fires in-distribution) and stay
    feature-close to the dynamic-scale forward."""
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        classifier_forward,
        init_classifier_params,
    )
    from eventclip_tpu.ops.quant import calibrate_visual_amax

    cfg = _tiny_cfg()
    ccfg = ClassifierConfig(model="ZSCLIP", clip=cfg, dtype=jnp.float32)
    params = init_classifier_params(jax.random.PRNGKey(4), ccfg, n_classes=7)
    imgs = jnp.asarray(rng.normal(size=(3, 2, 3, 64, 64)).astype(np.float32))
    valid = jnp.ones((3, 2), dtype=bool)
    ref = classifier_forward(params, ccfg, imgs, valid)["probs"]

    flat = imgs.reshape((-1,) + imgs.shape[-3:])
    amax = calibrate_visual_amax(params["clip"]["visual"], cfg.vision, flat,
                                 dtype=jnp.float32)
    qparams = dict(params)
    qparams["clip"] = dict(params["clip"])
    qparams["clip"]["visual"] = quantize_visual(params["clip"]["visual"],
                                                act_amax=amax)
    got = classifier_forward(qparams, ccfg, imgs, valid)["probs"]
    assert np.argmax(np.asarray(ref), -1).tolist() == \
        np.argmax(np.asarray(got), -1).tolist()

    # dynamic and static int8 agree with each other tightly (same weights,
    # scales differ only per-token vs per-site)
    dparams = dict(params)
    dparams["clip"] = dict(params["clip"])
    dparams["clip"]["visual"] = quantize_visual(params["clip"]["visual"])
    dyn = classifier_forward(dparams, ccfg, imgs, valid)["probs"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(dyn), atol=0.08)


def test_calibration_requires_float_tower(rng):
    from eventclip_tpu.ops.quant import calibrate_visual_amax

    cfg = _tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(5), cfg)
    qvis = quantize_visual(params["visual"])
    imgs = jnp.asarray(rng.normal(size=(2, 3, 64, 64)).astype(np.float32))
    with pytest.raises(AssertionError, match="FLOAT tower"):
        calibrate_visual_amax(qvis, cfg.vision, imgs, dtype=jnp.float32)
