"""utils: the config system and meters (small but load-bearing — every CLI
and the trainer go through them)."""

import numpy as np
import pytest

from eventclip_tpu.utils.config import Params, load_params
from eventclip_tpu.utils.meters import AverageMeter
from eventclip_tpu.utils.pytree import path_str


def test_average_meter_semantics():
    m = AverageMeter()
    assert m.count == 0
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.count == 4
    assert np.isclose(m.avg, (2.0 + 4.0 * 3) / 4)
    m.reset()
    assert m.count == 0


def test_params_overrides_and_get():
    class C(Params):
        a = 1
        b = "x"

    c = C(a=7)
    assert c.a == 7 and c.b == "x"
    assert c.get("missing", 42) == 42
    assert c.to_dict()["a"] == 7
    # instance mutation does not leak back into the class (dup runs reuse
    # the same config class with different seeds/overrides)
    c.a = 9
    assert C.a == 1


def test_load_params_from_file(tmp_path):
    p = tmp_path / "cfg_params.py"
    p.write_text(
        "from eventclip_tpu.utils.config import Params\n"
        "class EventCLIPParams(Params):\n"
        "    lr = 0.5\n"
        "    dataset = 'n_caltech'\n"
    )
    cfg = load_params(str(p))
    assert cfg.lr == 0.5 and cfg.dataset == "n_caltech"


def test_load_params_missing_class(tmp_path):
    p = tmp_path / "bad_params.py"
    p.write_text("x = 1\n")
    with pytest.raises((AttributeError, KeyError, ValueError)):
        load_params(str(p))


def test_path_str_key_and_index_entries():
    import jax

    tree = {"a": {"b": [np.zeros(1), np.ones(1)]}}
    keys = [
        path_str(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]
    assert keys == ["a/b/0", "a/b/1"]


def test_train_cli_override_rules(tmp_path):
    """train.py::load_and_override — the reference's CLI mutation contract
    (reference train.py:98-149): --N suffixes the exp dir and scales to
    thousands, --num_shots suffixes and shrinks tiny-dataset batches,
    --fp32 drops to f32."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from train import load_and_override

    class A:
        params = "configs/debug/fsclip_tiny_params.py"
        N = 5
        num_shots = -1
        data_root = ""
        max_epochs = -1
        profile = 0
        fp32 = True
        accum = 0
        zero1 = False

    params, exp = load_and_override(A())
    assert params.quantize_args["N"] == 5000  # thousands (train.py:121-123)
    assert exp == "fsclip_tiny_params-N_5"
    assert params.bf16 is False  # --fp32
    assert params.get("accum_steps", 1) == 1  # accum=0 leaves the default

    class A2(A):
        accum = 4

    params, _ = load_and_override(A2())
    assert params.accum_steps == 4  # --accum lands in the config

    class A3(A):
        zero1 = True

    params, _ = load_and_override(A3())
    assert params.zero1 is True  # --zero1 lands in the config

    class B(A):
        N = -1
        num_shots = 10
        fp32 = False

    params, exp = load_and_override(B())
    assert exp == "fsclip_tiny_params-10shot"
    assert params.train_batch_size == 4  # n_caltech: no shrink

    # N-Cars 1-shot: batch shrinks to 2*shots (reference train.py:129-139)
    src = open("configs/debug/fsclip_tiny_params.py").read()
    p = str(tmp_path / "cars_params.py")
    open(p, "w").write(src.replace("dataset = 'n_caltech'",
                                   "dataset = 'n_cars'"))

    class C(B):
        params = p
        num_shots = 1

    params, exp = load_and_override(C())
    assert exp == "cars_params-1shot"
    assert params.train_batch_size == 2  # min(1*2, 4)


def test_test_cli_override_rules():
    """test.py::load_and_override — the eval CLI's mutation contract
    (reference test.py:96-124): --N/--arch/--prompt are zero-shot-only
    (a trained checkpoint is bound to its training geometry/arch/prompt),
    --bs/--data_root apply everywhere, --subset requires N-ImageNet."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from test import load_and_override

    class ZS:
        params = "configs/zsclip/zsclip_ncaltech_params.py"
        fp32 = False
        N = 30
        arch = "ViT-B/32"
        prompt = "a sketch image of a {}"
        bs = 8
        subset = -1
        data_root = "/tmp/somewhere"

    params, cfg_base = load_and_override(ZS())
    assert cfg_base == "zsclip_ncaltech_params"
    assert params.quantize_args["N"] == 30000  # thousands
    assert params.clip_dict["arch"] == "ViT-B/32"
    assert params.clip_dict["prompt"] == "a sketch image of a {}"
    assert params.val_batch_size == 8
    assert params.data_root == "/tmp/somewhere"

    class ZSDefaults(ZS):
        N, arch, prompt, bs, data_root = -1, "", "", -1, ""
        fp32 = True

    params, _ = load_and_override(ZSDefaults())
    assert params.quantize_args["N"] == 20000  # config value untouched
    assert params.clip_dict["arch"] == "ViT-L/14"
    assert params.bf16 is False  # --fp32

    class FS(ZSDefaults):
        params = "configs/debug/fsclip_tiny_params.py"
        fp32 = False

    params, _ = load_and_override(FS())  # no ZS-only flag: fine
    assert params.model == "FSCLIP"
    for flag, val in [("N", 20), ("arch", "ViT-B/32"), ("prompt", "p {}")]:
        bad = type("Bad", (FS,), {flag: val})
        with pytest.raises(AssertionError):
            load_and_override(bad())

    class BadSubset(ZSDefaults):
        subset = 3  # n_caltech config: only N-ImageNet has subsets

    with pytest.raises(AssertionError):
        load_and_override(BadSubset())
