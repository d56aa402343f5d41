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

CI keeps the gated pytest variants (tests/test_real_assets.py) plus a
synthetic end-to-end run of THIS script (tests/test_scripts.py), so the
harness cannot rot while the assets are absent.
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
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


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
        DEFAULT_BPE_PATHS,
        SimpleTokenizer,
        tokenize,
    )

    path = next((p for p in DEFAULT_BPE_PATHS if p and osp.exists(p)), None)
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

    from eventclip_tpu.models.clip.tokenizer import DEFAULT_BPE_PATHS
    from eventclip_tpu.utils.config import load_params

    if not any(p and osp.exists(p) for p in DEFAULT_BPE_PATHS):
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

    executed = [v for v in (result["tower_parity"], result["tokenizer"],
                            result["zero_shot"]) if v["ok"] is not None]
    result["ok"] = bool(executed) and all(v["ok"] for v in executed)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[parity] wrote {out_path}  ok={result['ok']}")
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
