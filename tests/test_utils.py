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
