"""--train_shots sweep machinery at the Python level: the shared eval
context must make checkpoint N+1's evaluation reuse checkpoint N's
device-resident val batches (and produce identical numbers with the cache
disabled)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .test_e2e import make_tree  # noqa: E402


class _Args:
    N = -1
    arch = ""
    prompt = ""
    bs = 8
    subset = -1
    data_root = ""
    clip_ckpt = ""
    n_model = 1
    smoke = True
    int8 = False
    prune_tokens = 0


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from eventclip_tpu.utils.config import load_params

    tree = make_tree(str(tmp_path_factory.mktemp("sweep")))
    params = load_params("configs/debug/fsclip_tiny_params.py")
    params.data_root = tree
    params.model = "ZSCLIP"  # weight-free: sweep ctx reuse is what's tested
    params.adapter_dict = dict(adapter_type="identity")
    return params


def test_sweep_ctx_caches_device_batches(setup, monkeypatch):
    import test as test_cli

    monkeypatch.setenv("EVENTCLIP_SWEEP_CACHE_MB", "2048")
    ctx = test_cli.build_eval_context(setup, _Args())
    p1, l1 = test_cli.evaluate(setup, _Args(), ctx=ctx, printing=False)
    assert ctx.get("_dev_batches"), "val batches should be cached on device"
    n_cached = len(ctx["_dev_batches"])
    # second evaluation (the next checkpoint in a sweep) must reuse the
    # cache and agree exactly
    p2, l2 = test_cli.evaluate(setup, _Args(), ctx=ctx, printing=False)
    assert (p1, l1) == (p2, l2)
    assert len(ctx["_dev_batches"]) == n_cached

    # cache disabled -> same numbers, nothing retained
    monkeypatch.setenv("EVENTCLIP_SWEEP_CACHE_MB", "0")
    ctx2 = test_cli.build_eval_context(setup, _Args())
    p3, l3 = test_cli.evaluate(setup, _Args(), ctx=ctx2, printing=False)
    assert (p3, l3) == (p1, l1)
    assert "_dev_batches" not in ctx2


def test_sweep_cache_respects_byte_cap(setup, monkeypatch):
    import test as test_cli

    monkeypatch.setenv("EVENTCLIP_SWEEP_CACHE_MB", "0.1")  # smaller than one batch
    ctx = test_cli.build_eval_context(setup, _Args())
    test_cli.evaluate(setup, _Args(), ctx=ctx, printing=False)
    assert "_dev_batches" not in ctx  # over cap -> nothing cached
