"""One-command real-asset parity harness (the north-star number).

Accuracy parity with the PyTorch reference (BASELINE.md) is blocked only on
assets this container cannot hold: the OpenAI CLIP `.pt` weights and the BPE
merge table (reference contract `clip.load`/`clip.tokenize`,
/root/reference/train.py:26, /root/reference/models/clip_cls.py:64-93). The
day they appear, the whole validation is one command:

    python scripts/parity_check.py --clip_ckpt ViT-B-32.pt \
        [--data_root /data/N-Caltech101] \
        [--params configs/zsclip/zsclip_ncaltech_params.py] \
        [--npz_out clip_vitb32.npz] [--bs 32] [--cpu]

which, in order:
  1. loads + converts the checkpoint to the framework npz
     (models/clip/convert.py — same path as scripts/convert_clip.py);
  2. checks activation parity of BOTH towers against an independent torch
     implementation of the reference model equations (tests/torch_oracle.py;
     torch is in the container — the `clip` pip package is not needed);
  3. checks the BPE tokenizer against the published token ids of CLIP's
     README example, when eventclip_tpu/assets/bpe_simple_vocab_16e6.txt.gz
     is present;
  4. runs zero-shot top-1 over --data_root with the converted weights (the
     reference-parity accuracy), through the same evaluate() as test.py;
  5. writes PARITY_RESULT.json next to the checkpoint (or --out) and exits
     non-zero if any executed stage failed.

The reference's headline numbers are FEW-SHOT and FINE-TUNED accuracies
(reference docs/benchmark.md:168-188), so the harness covers that leg of
the parity matrix too:

  --method_ckpt best.pth --method_params configs/fsclip/.../..._params.py
     evaluates a reference-trained method checkpoint (adapter / prompt /
     LoRA / FT tower, converted on the fly by models/clip/convert_method.py)
     through the same evaluate() as `test.py --weight best.pth`. Repeatable:
     pass N checkpoints and N matching configs to sweep several regimes in
     one run ("method_evals" in the result JSON).
  --fs_shots K [--fs_params cfg --fs_epochs E --fs_roundtrip]
     trains a K-shot model from the converted weights via the real train.py
     CLI (a subprocess — exercises optimizer/schedule/checkpoint parity with
     real weights), evaluates its best checkpoint, and with --fs_roundtrip
     additionally exports it to the reference's .pth key space
     (scripts/convert_checkpoint.py) and re-evaluates THAT, asserting the
     two evals agree bit-for-bit ("few_shot" in the result JSON).

CI keeps the gated pytest variants (tests/test_real_assets.py) plus a
synthetic end-to-end run of THIS script covering every stage above
(tests/test_scripts.py), so the harness cannot rot while the assets are
absent.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import traceback

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--clip_ckpt", required=True,
                   help="OpenAI CLIP checkpoint (.pt: torchscript archive "
                   "or plain state dict)")
    p.add_argument("--data_root", default="",
                   help="dataset tree for the zero-shot top-1 stage "
                   "(skipped when absent)")
    p.add_argument("--params",
                   default="configs/zsclip/zsclip_ncaltech_params.py",
                   help="zero-shot config for stage 4; its arch is "
                   "overridden by the checkpoint's")
    p.add_argument("--npz_out", default="",
                   help="where to write the converted npz "
                   "(default: <ckpt>.npz)")
    p.add_argument("--out", default="",
                   help="result JSON path (default: PARITY_RESULT.json "
                   "next to the checkpoint)")
    p.add_argument("--bs", type=int, default=0, help="eval batch override")
    p.add_argument("--tol", type=float, default=2e-3,
                   help="tower-activation tolerance (fp16-origin weights "
                   "re-accumulated in f32 land well inside 2e-3)")
    p.add_argument("--method_ckpt", nargs="*", default=[],
                   help="reference-trained method checkpoint(s) (.pth, or "
                   "this framework's .npz) to evaluate — the few-shot/"
                   "fine-tuned leg of the parity matrix")
    p.add_argument("--method_params", nargs="*", default=[],
                   help="the experiment config each --method_ckpt was "
                   "trained with (same count, same order)")
    p.add_argument("--fs_shots", type=int, default=0,
                   help="also train a K-shot model from the converted "
                   "weights (train.py subprocess) and evaluate its best "
                   "checkpoint")
    p.add_argument("--fs_params",
                   default="configs/fsclip/joint_adapter/"
                   "joint_fsclip_ncaltech_params.py",
                   help="few-shot config for --fs_shots; its arch is "
                   "overridden by the checkpoint's")
    p.add_argument("--fs_epochs", type=int, default=0,
                   help="epoch override for the --fs_shots run "
                   "(0 = the config's)")
    p.add_argument("--fs_roundtrip", action="store_true",
                   help="with --fs_shots: export the trained checkpoint "
                   "back to the reference's .pth key space and assert the "
                   "re-imported eval matches bit-for-bit")
    p.add_argument("--workdir", default="",
                   help="where --fs_shots writes checkpoints (default: "
                   "parity_fs/ next to the result JSON)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if len(args.method_ckpt) != len(args.method_params):
        p.error("--method_ckpt and --method_params must pair up "
                f"({len(args.method_ckpt)} vs {len(args.method_params)})")
    return args


def bpe_available() -> bool:
    from eventclip_tpu.models.clip.tokenizer import bpe_asset_paths

    return any(p and osp.exists(p) for p in bpe_asset_paths())


def tower_parity(sd, tol):
    from tests.test_real_assets import check_state_dict_tower_parity

    rng = np.random.default_rng(0)
    try:
        res = check_state_dict_tower_parity(sd, rng, tol=tol)
        res["ok"] = True
        return res
    except AssertionError as e:
        return {"ok": False, "error": str(e)[:2000]}


def tokenizer_check():
    from eventclip_tpu.models.clip.tokenizer import (
        bpe_asset_paths,
        SimpleTokenizer,
        tokenize,
    )

    path = next((p for p in bpe_asset_paths() if p and osp.exists(p)), None)
    if path is None:
        return {"ok": None, "note": "BPE asset absent - drop "
                "bpe_simple_vocab_16e6.txt.gz into eventclip_tpu/assets/"}
    tok = SimpleTokenizer(path)
    ids = list(tokenize(["a photo of a cat"], tok, context_length=77)[0])
    expected = [49406, 320, 1125, 539, 320, 2368, 49407]
    ok = ids[: len(expected)] == expected and not any(ids[len(expected):])
    return {"ok": bool(ok), "ids": ids[: len(expected)],
            "expected": expected, "bpe_path": path}


def resolve_arch_name(cfg):
    """Registered arch name whose geometry matches the checkpoint's
    inferred config, registering the inferred one when nothing matches
    (the converter names by raw geometry, e.g. 'ViT-768/32@224'; the
    registry names by release, e.g. 'ViT-B/32')."""
    from eventclip_tpu.models.clip.config import CLIP_ARCHS

    for reg_name, reg in CLIP_ARCHS.items():
        if (reg.vision, reg.text) == (cfg.vision, cfg.text):
            return reg_name
    CLIP_ARCHS[cfg.name] = cfg
    return cfg.name


def zero_shot(args, cfg, npz_path):
    import test as test_cli  # the repo's test.py (repo root is sys.path[0])

    from eventclip_tpu.models.clip.tokenizer import bpe_asset_paths
    from eventclip_tpu.utils.config import load_params

    if not any(p and osp.exists(p) for p in bpe_asset_paths()):
        # real weights + random text features = silently garbage numbers;
        # the eval layer refuses that combination, so skip loudly instead
        return {"ok": None, "note": "zero-shot stage needs the BPE asset "
                "to tokenize prompts - skipped"}
    arch = resolve_arch_name(cfg)
    params = load_params(args.params)
    assert params.model == "ZSCLIP", "--params must be a zero-shot config"
    params.data_root = args.data_root
    if params.clip_dict["arch"] != arch:
        print(f"[parity] overriding config arch "
              f"{params.clip_dict['arch']} -> {arch} (the checkpoint's)")
        params.clip_dict["arch"] = arch
    if args.bs > 0:
        params.val_batch_size = args.bs
    eval_args = argparse.Namespace(
        clip_ckpt=npz_path, smoke=False, int8=False, prune_tokens=0,
        n_model=1, subset=-1, fp32=False,
    )
    probs_acc, logits_acc = test_cli.evaluate(params, eval_args,
                                              printing=True)
    return {"ok": True, "dataset": params.dataset,
            "data_root": args.data_root, "arch": arch,
            "prompt": params.clip_dict.get("prompt"),
            "probs_top1": probs_acc, "logits_top1": logits_acc}


def _eval_args(args, npz_path):
    return argparse.Namespace(
        clip_ckpt=npz_path, smoke=False, int8=False, prune_tokens=0,
        n_model=1, subset=-1, fp32=False,
    )


def load_method_params(cfg_path, arch, args):
    """An FS/FT experiment config pointed at --data_root, with its arch
    forced to the checkpoint's (the eval is meaningless against a
    different tower than the one the weights were converted from)."""
    from eventclip_tpu.utils.config import load_params

    params = load_params(cfg_path)
    assert params.model != "ZSCLIP", (
        f"{cfg_path}: --method_params/--fs_params must be FS/FT configs"
    )
    params.data_root = args.data_root
    if params.clip_dict["arch"] != arch:
        print(f"[parity] overriding {osp.basename(cfg_path)} arch "
              f"{params.clip_dict['arch']} -> {arch} (the checkpoint's)")
        params.clip_dict["arch"] = arch
    if args.bs > 0:
        params.val_batch_size = args.bs
    return params


def _text_note(params):
    """BPE-missing policy for method evals: prompt-tuned ('text-*') configs
    carry their trained text_feats IN the checkpoint, so the tokenizer is
    only needed to *initialize* the leaf that the weight load overwrites —
    EVENTCLIP_ALLOW_RANDOM_TEXT makes that explicit. Frozen-text configs
    would silently score with garbage text features; those skip."""
    if bpe_available():
        return None
    adapter_type = str(params.adapter_dict.get("adapter_type", ""))
    if adapter_type.startswith("text-"):
        os.environ["EVENTCLIP_ALLOW_RANDOM_TEXT"] = "1"
        return ("BPE asset absent - text init random; the prompt-tuned "
                "text_feats leaf loads from the checkpoint")
    return "skip"


def method_eval(args, cfg, npz_path, ckpt, cfg_path):
    """Stage 5: a reference-trained method checkpoint through the same
    evaluate() as `test.py --weight` (load_checkpoint converts .pth on the
    fly via models/clip/convert_method.py)."""
    import test as test_cli

    arch = resolve_arch_name(cfg)
    params = load_method_params(cfg_path, arch, args)
    note = _text_note(params)
    if note == "skip":
        return {"ok": None, "ckpt": ckpt,
                "note": "frozen-text config needs the BPE asset to encode "
                "prompts - skipped"}
    probs_acc, logits_acc = test_cli.evaluate(
        params, _eval_args(args, npz_path), weight=ckpt, printing=True)
    out = {"ok": True, "ckpt": osp.abspath(ckpt), "params": cfg_path,
           "arch": arch, "dataset": params.dataset,
           "probs_top1": probs_acc, "logits_top1": logits_acc}
    if note:
        out["note"], out["random_text_init"] = note, True
    return out


def write_derived_config(workdir, base_path, cfg):
    """A config file that registers the checkpoint's inferred geometry and
    swaps the base config's arch to it — needed because --fs_shots trains
    in a train.py SUBPROCESS, where this process's CLIP_ARCHS mutation
    (resolve_arch_name) does not exist."""
    base_path = osp.abspath(base_path)
    name = osp.basename(base_path)[:-3] + "_ckptarch"
    path = osp.join(workdir, name + ".py")
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    with open(path, "w") as f:
        f.write(
            f'"""Auto-generated by scripts/parity_check.py: '
            f'{osp.basename(base_path)} on the checkpoint\'s tower."""\n'
            f"import sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            f"from eventclip_tpu.models.clip.config import (  # noqa: F401\n"
            f"    CLIP_ARCHS, CLIPConfig, TextConfig, VisionConfig)\n"
            f"try:  # ResNet geometries only\n"
            f"    from eventclip_tpu.models.clip.resnet import "
            f"ResNetVisionConfig  # noqa: F401\n"
            f"except ImportError:\n"
            f"    pass\n"
            f"from eventclip_tpu.utils.config import load_params\n\n"
            f"_cfg = {cfg!r}\n"
            f"CLIP_ARCHS.setdefault(_cfg.name, _cfg)\n"
            f"_Base = type(load_params({base_path!r}))\n\n\n"
            f"class EventCLIPParams(_Base):\n"
            f"    clip_dict = dict(_Base.clip_dict, arch=_cfg.name)\n"
        )
    return path


def few_shot(args, cfg, npz_path, out_path):
    """Stage 6: train a K-shot model from the converted weights through the
    real train.py CLI, evaluate its best checkpoint, and (--fs_roundtrip)
    assert the export->reimport cycle through the reference's .pth key
    space evaluates bit-identically."""
    import subprocess

    import test as test_cli

    from eventclip_tpu.utils.config import load_params

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    arch = resolve_arch_name(cfg)
    workdir = osp.abspath(
        args.workdir or osp.join(osp.dirname(out_path) or ".", "parity_fs"))
    os.makedirs(workdir, exist_ok=True)

    params_path = osp.abspath(args.fs_params)
    base = load_params(params_path)
    if base.clip_dict["arch"] != arch:
        params_path = write_derived_config(workdir, params_path, cfg)
    note = _text_note(base)
    if note == "skip":
        return {"ok": None, "note": "frozen-text config needs the BPE "
                "asset to seed the text features - skipped"}

    cmd = [sys.executable, osp.join(repo, "train.py"),
           "--params", params_path, "--num_shots", str(args.fs_shots),
           "--clip_ckpt", osp.abspath(npz_path),
           "--data_root", osp.abspath(args.data_root),
           "--ckpt_base", workdir]
    if args.fs_epochs > 0:
        cmd += ["--max_epochs", str(args.fs_epochs)]
    if args.cpu:
        cmd += ["--cpu"]
    print(f"[parity] training: {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=repo, env=dict(os.environ),
                       capture_output=True, text=True)
    if r.returncode != 0:
        return {"ok": False, "cmd": cmd,
                "error": (r.stdout[-1500:] + r.stderr[-1500:])}

    cfg_base = osp.basename(params_path)[:-3]
    mdir = osp.join(workdir, f"{cfg_base}-{args.fs_shots}shot", "models")
    weight = test_cli.find_weight(mdir)
    params = load_method_params(params_path, arch, args)
    eval_args = _eval_args(args, npz_path)
    ctx = test_cli.build_eval_context(params, eval_args)
    probs_acc, logits_acc = test_cli.evaluate(
        params, eval_args, weight=weight, printing=True, ctx=ctx)
    out = {"ok": True, "shots": args.fs_shots, "params": params_path,
           "arch": arch, "weight": weight,
           "probs_top1": probs_acc, "logits_top1": logits_acc}
    if note:
        out["note"], out["random_text_init"] = note, True

    if args.fs_roundtrip:
        # export to the reference's key space, re-import, re-evaluate
        # against the SAME cached eval batches: must agree bit-for-bit
        pth = osp.join(mdir, "roundtrip.pth")
        conv = [sys.executable,
                osp.join(repo, "scripts", "convert_checkpoint.py"),
                weight, pth]
        if params.model == "FTCLIP":
            conv.append(osp.abspath(npz_path))  # FT re-embeds the tower
        r = subprocess.run(conv, cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            out["ok"] = False
            out["roundtrip"] = {"error": r.stdout[-1500:] + r.stderr[-1500:]}
            return out
        p2, l2 = test_cli.evaluate(params, eval_args, weight=pth,
                                   printing=False, ctx=ctx)
        out["roundtrip"] = {
            "pth": pth, "probs_top1": p2, "logits_top1": l2,
            "bit_equal": bool(p2 == probs_acc and l2 == logits_acc),
        }
        out["ok"] = out["ok"] and out["roundtrip"]["bit_equal"]
    return out


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    result = {"ckpt": osp.abspath(args.clip_ckpt)}
    out_path = args.out or osp.join(
        osp.dirname(osp.abspath(args.clip_ckpt)) or ".",
        "PARITY_RESULT.json",
    )

    # 1. load + convert
    import torch

    from eventclip_tpu.engine.checkpoint import save_checkpoint
    from eventclip_tpu.models.clip.convert import load_clip_checkpoint

    obj = torch.load(args.clip_ckpt, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v.float() for k, v in sd.items()
          if isinstance(v, torch.Tensor)}
    clip_params, cfg = load_clip_checkpoint(args.clip_ckpt)
    result["arch"] = cfg.name
    npz_path = args.npz_out or (osp.splitext(args.clip_ckpt)[0] + ".npz")
    save_checkpoint(npz_path, clip_params, extra={"arch": cfg.name})
    result["converted_npz"] = osp.abspath(npz_path)
    print(f"[parity] {cfg.name}: converted -> {npz_path}")

    # 2. tower activation parity vs the torch oracle
    result["tower_parity"] = tower_parity(sd, args.tol)
    print(f"[parity] towers: {result['tower_parity']}")

    # 3. tokenizer golden ids (when the asset exists)
    result["tokenizer"] = tokenizer_check()
    print(f"[parity] tokenizer: {result['tokenizer']}")

    # 4. zero-shot top-1 (when a dataset tree is supplied)
    if args.data_root:
        try:
            result["zero_shot"] = zero_shot(args, cfg, npz_path)
        except Exception as e:  # recorded, not swallowed: ok goes False
            traceback.print_exc()
            result["zero_shot"] = {"ok": False, "error": str(e)[:2000]}
    else:
        result["zero_shot"] = {"ok": None,
                               "note": "no --data_root supplied"}
    print(f"[parity] zero-shot: {result['zero_shot']}")

    # 5. reference-trained method checkpoints (the FS/FT leg of the
    #    parity matrix — the reference's headline tables,
    #    /root/reference/docs/benchmark.md:168-188)
    evals = []
    for ckpt, cfg_path in zip(args.method_ckpt, args.method_params):
        if not args.data_root:
            evals.append({"ok": None, "ckpt": ckpt,
                          "note": "needs --data_root"})
            continue
        try:
            evals.append(method_eval(args, cfg, npz_path, ckpt, cfg_path))
        except Exception as e:
            traceback.print_exc()
            evals.append({"ok": False, "ckpt": ckpt,
                          "error": str(e)[:2000]})
        print(f"[parity] method eval: {evals[-1]}")
    if evals:
        result["method_evals"] = evals

    # 6. K-shot train-from-converted-weights + eval (+ .pth roundtrip)
    if args.fs_shots > 0:
        if not args.data_root:
            result["few_shot"] = {"ok": None, "note": "needs --data_root"}
        else:
            try:
                result["few_shot"] = few_shot(args, cfg, npz_path, out_path)
            except Exception as e:
                traceback.print_exc()
                result["few_shot"] = {"ok": False, "error": str(e)[:2000]}
        print(f"[parity] few-shot: {result['few_shot']}")

    stages = [result["tower_parity"], result["tokenizer"],
              result["zero_shot"], *evals, result.get("few_shot")]
    executed = [v for v in stages if v is not None and v["ok"] is not None]
    result["ok"] = bool(executed) and all(v["ok"] for v in executed)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[parity] wrote {out_path}  ok={result['ok']}")
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
