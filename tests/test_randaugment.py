"""RandAugment ops vs the torchvision oracle (the reference's augment.py
calls torchvision.transforms.functional; torch CPU is the golden)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from eventclip_tpu.ops import randaugment as R
from tests import torch_oracle as O


@pytest.fixture
def img_u8(rng):
    # event-frame-like content: mostly white with structured dark blobs
    img = np.full((3, 40, 48), 255, np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, 30), rng.integers(0, 38)
        img[:, y:y + 6, x:x + 8] = rng.integers(0, 200, size=(3, 1, 1))
    return img


def to_jax(img_u8):
    return jnp.asarray(img_u8.astype(np.float32))


def check(got, want_u8, max_med=1.0, frac4=0.98, label=""):
    got = np.asarray(got)
    want = want_u8.numpy() if isinstance(want_u8, torch.Tensor) else want_u8
    err = np.abs(got - want.astype(np.float32))
    assert np.median(err) <= max_med, f"{label}: median {np.median(err)}"
    assert (err <= 4.0).mean() >= frac4, (
        f"{label}: big-err frac {(err > 4.0).mean()}, max {err.max()}"
    )


# ---- color ops: expected exact or off-by-one -------------------------------

@pytest.mark.parametrize("mag", [-0.5, 0.3])
def test_brightness(img_u8, mag):
    want = O.brightness_oracle(img_u8, mag)
    check(R.brightness(to_jax(img_u8), mag), want, label="brightness")


@pytest.mark.parametrize("mag", [-0.6, 0.6])
def test_color(img_u8, mag):
    want = O.color_oracle(img_u8, mag)
    check(R.color(to_jax(img_u8), mag), want, label="color")


@pytest.mark.parametrize("mag", [-0.4, 0.8])
def test_contrast(img_u8, mag):
    want = O.contrast_oracle(img_u8, mag)
    check(R.contrast(to_jax(img_u8), mag), want, label="contrast")


@pytest.mark.parametrize("mag", [-0.9, 0.9])
def test_sharpness(img_u8, mag):
    want = O.sharpness_oracle(img_u8, mag)
    check(R.sharpness(to_jax(img_u8), mag), want, label="sharpness")


@pytest.mark.parametrize("bits", [1, 4, 7])
def test_posterize(img_u8, bits):
    keep = 2 ** (8 - bits)
    want = (img_u8 // keep) * keep
    got = R.posterize(to_jax(img_u8), float(bits))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("thr", [0.0, 128.0, 255.0])
def test_solarize(img_u8, thr):
    want = np.where(img_u8 >= thr, 255 - img_u8.astype(np.int32), img_u8)
    got = R.solarize(to_jax(img_u8), thr)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_autocontrast(img_u8):
    want = O.autocontrast_oracle(img_u8)
    check(R.autocontrast(to_jax(img_u8)), want, label="autocontrast")


def test_equalize(img_u8):
    want = O.equalize_oracle(img_u8)
    got = R.equalize(to_jax(img_u8))
    err = np.abs(np.asarray(got) - want.astype(np.float32))
    assert err.max() <= 1.0, err.max()  # off-by-one from fp cumsum at most


# ---- geometric ops ---------------------------------------------------------

@pytest.mark.parametrize("mag", [-0.3, 0.2])
def test_shear_x(img_u8, mag):
    C, H, W = img_u8.shape
    m = R._inverse_affine_matrix(
        0.0, (0.0, 0.0), (np.degrees(np.arctan(mag)), 0.0),
        (-W * 0.5, -H * 0.5),
    )
    want = O.affine_bicubic_oracle(img_u8, [float(v) for v in m])
    got = R.affine_bicubic(to_jax(img_u8), m)
    check(got, want, max_med=1.0, frac4=0.97, label="shearx")


@pytest.mark.parametrize("mag", [10.0, -14.0])
def test_translate_x(img_u8, mag):
    m = R._inverse_affine_matrix(0.0, (np.trunc(mag), 0.0), (0.0, 0.0),
                                 (0.0, 0.0))
    want = O.affine_bicubic_oracle(img_u8, [float(v) for v in m])
    got = R.affine_bicubic(to_jax(img_u8), m)
    check(got, want, max_med=1.0, frac4=0.97, label="translatex")
    # translation by an integer offset must be an exact shift inside
    got = np.asarray(got)
    t = int(mag)
    if t > 0:
        np.testing.assert_allclose(got[:, :, t:], img_u8[:, :, :-t], atol=1)
    else:
        np.testing.assert_allclose(got[:, :, :t], img_u8[:, :, -t:], atol=1)


@pytest.mark.parametrize("angle", [30.0, -17.0])
def test_rotate(img_u8, angle):
    m = R._inverse_affine_matrix(angle, (0.0, 0.0), (0.0, 0.0), (0.0, 0.0))
    want = O.affine_bicubic_oracle(img_u8, [float(v) for v in m])
    got = R.affine_bicubic(to_jax(img_u8), m)
    check(got, want, max_med=1.0, frac4=0.95, label="rotate")


def test_rotate_direction_matches_pil(img_u8):
    """A positive rotation magnitude must turn the image the way the
    reference pipeline does (PIL img.rotate: counterclockwise). Guards the
    -angle negation in the op drivers — an earlier version rotated the
    mirror way, which the matrix-level test above can never catch."""
    from PIL import Image

    angle = 30.0
    # the switch-driver branch builds the matrix from -magnitude
    m = R._inverse_affine_matrix(-angle, (0.0, 0.0), (0.0, 0.0), (0.0, 0.0))
    got = np.asarray(R.affine_bicubic(to_jax(img_u8), m)).astype(np.float64)
    pil = Image.fromarray(img_u8.transpose(1, 2, 0))
    want = np.asarray(
        pil.rotate(angle, resample=Image.BICUBIC,
                   fillcolor=(255, 255, 255))
    ).transpose(2, 0, 1).astype(np.float64)
    # PIL's bicubic differs from the grid_sample-parity warp at sub-quantum
    # level, so compare structurally: right direction correlates strongly,
    # the mirror direction visibly worse
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9, corr
    m2 = R._inverse_affine_matrix(angle, (0.0, 0.0), (0.0, 0.0), (0.0, 0.0))
    mirror = np.asarray(
        R.affine_bicubic(to_jax(img_u8), m2)
    ).astype(np.float64)
    corr_mirror = np.corrcoef(mirror.ravel(), want.ravel())[0, 1]
    assert corr_mirror < corr - 0.03, (corr, corr_mirror)
    # and the batched geometry driver agrees with the switch branch
    op = jnp.full((1,), 5)
    mats = R._geo_matrices_batched(op, jnp.full((1,), angle), *got.shape[1:])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(m)), np.asarray(jnp.stack(mats))[:, 0],
        rtol=1e-6, atol=1e-6,
    )


def test_contrast_matches_pil_enhance(img_u8):
    """Contrast vs the real PIL ImageEnhance the reference executes."""
    from PIL import Image, ImageEnhance

    for mag in (-0.4, 0.8):
        pil = Image.fromarray(img_u8.transpose(1, 2, 0))
        want = np.asarray(
            ImageEnhance.Contrast(pil).enhance(1.0 + mag)
        ).transpose(2, 0, 1)
        got = np.asarray(R.contrast(to_jax(img_u8), mag))
        # grayscale fixed-point and blend-rounding differ sub-quantum
        err = np.abs(got - want.astype(np.float32))
        assert np.median(err) <= 1.0, np.median(err)
        assert (err <= 2.0).mean() > 0.99, (err > 2.0).mean()


# ---- full pipeline ---------------------------------------------------------

def test_randaugment_view_consistency(rng):
    # identical views must stay identical after augmentation (same ops per
    # sample, augment.py:159-178), different samples should diverge
    frames = np.full((4, 3, 3, 40, 48), 255.0, np.float32)
    blob = rng.integers(0, 200, size=(3, 10, 12)).astype(np.float32)
    frames[:, :, :, 5:15, 6:18] = blob
    out = R.randaugment(jnp.asarray(frames), jax.random.PRNGKey(3))
    out = np.asarray(out)
    assert out.shape == frames.shape
    for b in range(4):
        np.testing.assert_array_equal(out[b, 0], out[b, 1])
        np.testing.assert_array_equal(out[b, 0], out[b, 2])
    assert any(
        not np.array_equal(out[0, 0], out[b, 0]) for b in range(1, 4)
    )
    # output stays on the uint8 value grid
    assert np.all(out >= 0) and np.all(out <= 255)
    np.testing.assert_array_equal(out, np.round(out))


def test_batched_driver_matches_switch_driver(rng):
    """The single-warp batched driver must be bit-identical to the
    vmap+switch reference driver for the same rng (same op draws, same
    per-op math). Several keys so every op family gets hit."""
    frames = np.full((6, 2, 3, 32, 40), 255.0, np.float32)
    blob = rng.integers(0, 220, size=(6, 1, 3, 12, 14)).astype(np.float32)
    frames[:, :, :, 8:20, 10:24] = blob
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        fast = np.asarray(R.randaugment(jnp.asarray(frames), key))
        slow = np.asarray(R._randaugment_switch(jnp.asarray(frames), key))
        np.testing.assert_array_equal(fast, slow)


def test_batched_pixel_ops_match_single(img_u8):
    """Each batched pixel op == the (oracle-tested) single-image op."""
    img = to_jax(img_u8)
    batch = jnp.stack([img, 255.0 - img])
    mags = jnp.asarray([0.4, -0.3])
    singles = {
        6: R.brightness, 7: R.color, 8: R.contrast, 9: R.sharpness,
        10: lambda im, m: R.posterize(im, m), 11: R.solarize,
        12: lambda im, m: R.autocontrast(im), 13: lambda im, m: R.equalize(im),
    }
    for idx, fn_b in R._PIXEL_OPS_B:
        mag = jnp.abs(mags) * 8 if idx == 10 else (
            mags * 255 if idx == 11 else mags)
        got = np.asarray(fn_b(batch, mag))
        for n in range(2):
            want = np.asarray(singles[idx](batch[n], mag[n]))
            np.testing.assert_array_equal(got[n], want,
                                          err_msg=R.OP_NAMES[idx])


def test_randaugment_covers_all_ops(rng):
    # drive every op index through _apply_one_op once (compile+numerics)
    img = to_jax(np.full((3, 24, 24), 200, np.uint8))
    mags = R.magnitude_table(24, 24)
    for op in range(len(R.OP_NAMES)):
        out = R._apply_one_op(img, jnp.int32(op), mags[op, 15], 255.0)
        assert np.isfinite(np.asarray(out)).all(), R.OP_NAMES[op]


def test_single_channel_path_matches_three_channel(rng):
    """Grayscale configs run the augment chain on ONE channel and broadcast
    (ops/rasterize.py); on equal-channel frames this must be bit-identical
    to the 3-channel computation (the 0.9999-weighted grayscale op included)."""
    B, T, H, W = 2, 2, 40, 48
    one = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (B, T, 1, H, W))
    ).astype(jnp.float32)
    three = jnp.broadcast_to(one, (B, T, 3, H, W))
    key = jax.random.PRNGKey(123)
    for fill in (255.0, 0.0):
        got1 = np.asarray(R.randaugment(one, key, 2, fill))
        got3 = np.asarray(R.randaugment(three, key, 2, fill))
        np.testing.assert_array_equal(np.broadcast_to(got1, got3.shape), got3)
