"""CLI override wiring not covered at the subprocess level (tests/test_e2e.py
drives the expensive flag combinations end-to-end; this checks the pure
override logic, e.g. --fp32, the one flag no e2e invocation passes)."""

import importlib
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

train_mod = importlib.import_module("train")

CFG = "configs/fsclip/joint_adapter/joint_fsclip_ncaltech_params.py"


def _args(**kw):
    ns = dict(params=CFG, num_shots=-1, N=-1, weight="", data_root="",
              clip_ckpt="", n_model=1, max_epochs=-1, ckpt_base="checkpoint",
              san_check_val_step=2, seed=0, cpu=False, smoke=False,
              profile=0, fp32=False, accum=0, zero1=False)
    ns.update(kw)
    return types.SimpleNamespace(**ns)


def test_fp32_flag_flips_bf16():
    # the trainer reads params.get("bf16", True) (engine/trainer.py)
    params, _ = train_mod.load_and_override(_args())
    assert params.get("bf16", True) is True, "flagship default must be bf16"
    params, _ = train_mod.load_and_override(_args(fp32=True))
    assert params.get("bf16", True) is False


def test_n_override_scales_to_events_and_suffixes_name():
    params, name = train_mod.load_and_override(_args(N=30))
    assert params.quantize_args["N"] == 30_000
    assert name.endswith("-N_30")


def test_accum_flag_sets_accum_steps():
    # the trainer reads params.get("accum_steps", 1) (engine/trainer.py)
    params, _ = train_mod.load_and_override(_args())
    assert params.get("accum_steps", 1) == 1
    params, _ = train_mod.load_and_override(_args(accum=4))
    assert params.get("accum_steps", 1) == 4


def test_zero1_flag_sets_params():
    # the trainer reads params.get("zero1", False) (engine/trainer.py)
    params, _ = train_mod.load_and_override(_args())
    assert not params.get("zero1", False), "ZeRO-1 must be opt-in"
    params, _ = train_mod.load_and_override(_args(zero1=True))
    assert params.zero1 is True
