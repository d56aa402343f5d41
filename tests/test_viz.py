"""Validation visualization (utils/viz.py): GIFs + captions.

The trainer deliberately swallows viz exceptions so rendering can never
kill training — which means a broken viz would skip silently forever.
These tests keep it honest (reference analog: the wandb videos,
method.py:103-148).
"""

import json
import os

import numpy as np
import pytest

from eventclip_tpu.utils.viz import (
    add_border,
    denormalize,
    events_to_video,
    sample_indices,
    save_gif,
    visualize_samples,
)


def test_sample_indices_cover_range():
    idx = sample_indices(5, 100)
    assert idx[0] == 0 and idx[-1] < 100 and len(idx) >= 4
    assert len(sample_indices(5, 3)) >= 1  # tiny datasets never crash


def test_denormalize_roundtrip():
    # CLIP-normalized random image -> uint8 HWC frames
    img = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    out = denormalize(img)
    assert out.shape == (2, 16, 16, 3) and out.dtype == np.uint8


def test_add_border_pads_all_sides():
    f = np.zeros((1, 8, 8, 3), np.uint8)
    out = add_border(f, pad=2, value=7)
    assert out.shape == (1, 12, 12, 3)
    assert (out[0, 0] == 7).all() and (out[0, 2, 2] == 0).all()


def test_events_to_video_shapes():
    rng = np.random.default_rng(1)
    n = 4000
    ev = np.stack([
        rng.integers(0, 64, n), rng.integers(0, 48, n),
        np.sort(rng.uniform(0, 0.1, n)), rng.choice([-1.0, 1.0], n),
    ], 1).astype(np.float32)
    q = dict(N=1000, shape=(48, 64), grayscale=True, count_non_zero=False,
             background_mask=True)
    video = events_to_video(ev, q)
    assert video.ndim == 4 and video.shape[-1] == 3
    assert video.dtype == np.uint8 and len(video) >= 1


def test_save_gif(tmp_path):
    frames = np.random.default_rng(2).integers(
        0, 255, (3, 12, 12, 3)).astype(np.uint8)
    p = str(tmp_path / "x.gif")
    save_gif(frames, p)
    from PIL import Image

    with Image.open(p) as im:
        assert im.n_frames == 3


def test_visualize_samples_end_to_end(tmp_path):
    """Full render on a synthetic window dataset with a stub model."""
    from eventclip_tpu.data.datasets import NCaltech101
    from eventclip_tpu.data.event_windows import EventWindowDataset

    from .test_e2e import make_tree

    tree = make_tree(str(tmp_path / "t"))
    ds = EventWindowDataset(
        NCaltech101(os.path.join(tree, "testing")),
        dict(max_imgs=2, N=1000, split_method="event_count",
             convert_method="event_histogram", grayscale=True,
             count_non_zero=False, background_mask=True),
    )

    def probs_fn(w, v):
        return np.full((1, len(ds.classes)), 1.0 / len(ds.classes))

    def inputs_fn(w, v):
        return np.zeros((1, w.shape[1], 3, 32, 32), np.float32)

    out_dir = str(tmp_path / "viz")
    records = visualize_samples(ds, probs_fn, out_dir, n_samples=2,
                                inputs_fn=inputs_fn)
    assert len(records) >= 1
    with open(os.path.join(out_dir, "captions.json")) as f:
        caps = json.load(f)
    assert caps == records
    assert all("gt" in c and len(c["top3"]) == 3 for c in caps)
    files = os.listdir(out_dir)
    assert any(f.startswith("raw_events_") for f in files)
    assert any(f.startswith("video_") for f in files)
    # keep_events restored (viz must not leak state into the loader)
    assert ds.keep_events is False
