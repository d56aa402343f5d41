"""CLIP preprocessing: geometry contract + golden test against PIL bicubic."""

import numpy as np
import pytest
from PIL import Image

from eventclip_tpu.ops import ClipPreprocess, preprocess_frames
from eventclip_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD


@pytest.mark.parametrize(
    "hw,size,resized,origin",
    [
        ((180, 240), 224, (224, 298), (0, 37)),  # N-Caltech
        ((100, 120), 224, (224, 268), (0, 22)),  # N-Cars
        ((480, 640), 224, (224, 298), (0, 37)),  # N-ImageNet
        ((480, 640), 336, (336, 448), (0, 56)),  # ViT-L/14@336px
    ],
)
def test_geometry(hw, size, resized, origin):
    pp = ClipPreprocess(in_height=hw[0], in_width=hw[1], image_size=size)
    assert pp.resized == resized
    assert pp.crop_origin == origin


def pil_reference(frame_u8, size):
    """The transform pipeline clip.load ships (PIL path of torchvision)."""
    img = Image.fromarray(frame_u8)
    w, h = img.size
    if h <= w:
        new_h, new_w = size, int(size * w / h)
    else:
        new_h, new_w = int(size * h / w), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img).astype(np.float32) / 255.0
    x = (x - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    return x.transpose(2, 0, 1).astype(np.float32)


@pytest.mark.parametrize("hw", [(180, 240), (480, 640)])
def test_matches_pil(rng, hw):
    H, W = hw
    frame = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    pp = ClipPreprocess(in_height=H, in_width=W, image_size=224)
    got = np.asarray(preprocess_frames(pp, frame[None]))[0]
    want = pil_reference(frame, 224)
    assert got.shape == want.shape == (3, 224, 224)
    # PIL uses fixed-point bicubic; we use float Keys resampling. Agreement
    # is within a few uint8 quanta, far below CLIP feature sensitivity.
    err = np.abs(got - want)
    quantum = 1.0 / 255.0 / min(CLIP_STD)
    assert np.median(err) <= 1.0 * quantum
    assert (err <= 4.0 * quantum).mean() > 0.99, (err / quantum).max()


def test_batched_leading_dims(rng):
    frames = rng.integers(0, 256, size=(2, 3, 60, 80, 3), dtype=np.uint8)
    pp = ClipPreprocess(in_height=60, in_width=80, image_size=224)
    out = preprocess_frames(pp, frames)
    assert out.shape == (2, 3, 3, 224, 224)
    assert out.dtype == np.float32
