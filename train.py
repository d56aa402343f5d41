"""EventCLIP-TPU training CLI.

Mirrors the reference train.py CLI contract (reference train.py:98-149):

    python train.py --params configs/fsclip/joint_adapter/..._params.py \
        [--num_shots K] [--N n(thousands)] [--weight ckpt] [--data_root D] \
        [--clip_ckpt clip.pt|.npz] [--n_model M]

Differences from the reference:
- no --ddp / --fp16: the step is always jit-compiled over the device mesh
  (data-parallel by default; --n_model M adds tensor parallelism) and runs
  bf16 on TPU — no AMP/loss scaling;
- --clip_ckpt points at OpenAI CLIP weights (.pt via torch, or a converted
  .npz from scripts/convert_clip.py); without it the run uses random CLIP
  weights (smoke mode).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    parser = argparse.ArgumentParser(description="EventCLIP-TPU")
    parser.add_argument("--params", type=str, required=True)
    parser.add_argument("--num_shots", type=int, default=-1)
    parser.add_argument("--N", type=int, default=-1,
                        help="events per window, in thousands")
    parser.add_argument("--weight", type=str, default="", help="load weight")
    parser.add_argument("--data_root", type=str, default="")
    parser.add_argument("--clip_ckpt", type=str, default=os.environ.get(
        "CLIP_CKPT", ""))
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel mesh size")
    parser.add_argument("--max_epochs", type=int, default=-1)
    parser.add_argument("--ckpt_base", type=str, default="checkpoint")
    parser.add_argument("--san_check_val_step", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (debug/smoke runs)")
    parser.add_argument("--smoke", action="store_true",
                        help="allow RANDOM CLIP weights (pipeline/throughput "
                        "testing; accuracies will be garbage)")
    parser.add_argument("--profile", type=int, default=0,
                        help="capture a jax.profiler trace of N train steps")
    parser.add_argument("--fp32", action="store_true",
                        help="run activations in f32 instead of bf16 (the "
                        "reference's precision toggle is --fp16, train.py:104"
                        "; bf16 is our default)")
    parser.add_argument("--accum", type=int, default=0,
                        help="gradient-accumulation microbatches per "
                        "optimizer step: keeps the config's global batch "
                        "(the reference reaches batch 128 with 4-GPU DDP) "
                        "on fewer/smaller chips at 1/accum the activation "
                        "memory")
    parser.add_argument("--zero1", action="store_true",
                        help="shard the persistent optimizer moments over "
                        "the data axis (ZeRO stage 1) instead of "
                        "replicating them per data-parallel replica; "
                        "memory-only on the forward/backward")
    return parser.parse_args()


def load_and_override(args):
    from eventclip_tpu.utils.config import load_params

    exp_name = os.path.basename(
        args.params[:-3] if args.params.endswith(".py") else args.params
    )
    params = load_params(args.params)

    assert params.model != "ZSCLIP", (
        "ZSCLIP has no trainable leaves; use test.py directly"
    )
    if args.N > 0:
        params.quantize_args["N"] = int(args.N * 1000)
        exp_name += f"-N_{args.N}"
    if args.num_shots > 0:
        params.num_shots = args.num_shots
        exp_name += f"-{args.num_shots}shot"
        # tiny few-shot datasets cannot fill the global batch (train.py:129-139)
        if params.dataset == "n_cars":
            params.train_batch_size = min(
                args.num_shots * 2, params.train_batch_size
            )
        if params.dataset == "n_imagenet_mini":
            params.train_batch_size = min(
                args.num_shots * 100, params.train_batch_size
            )
    if args.data_root:
        params.data_root = args.data_root
    if args.max_epochs > 0:
        params.max_epochs = args.max_epochs
    if args.profile > 0:
        params.profile_steps = args.profile
    if args.fp32:
        params.bf16 = False
    if args.accum > 0:
        params.accum_steps = args.accum
    if args.zero1:
        params.zero1 = True
    return params, exp_name


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from eventclip_tpu.utils.jax_setup import setup_jax

    setup_jax()
    # multi-host slice: every process runs this same script; coordination is
    # env-driven (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
    import os as _os
    if _os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from eventclip_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator=_os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(_os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(_os.environ.get("JAX_PROCESS_ID", "0")),
        )
    params, exp_name = load_and_override(args)

    from eventclip_tpu.data import build_dataset
    from eventclip_tpu.engine.trainer import EventCLIPTrainer

    train_set, val_set = build_dataset(params)
    print(f"dataset={params.dataset} classes={len(train_set.classes)} "
          f"train={len(train_set)} val={len(val_set)} "
          f"views(train/val)={train_set.max_imgs}/{val_set.max_imgs}")

    ckpt_dir = os.path.join(args.ckpt_base, exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    trainer = EventCLIPTrainer(
        params,
        train_set,
        val_set,
        ckpt_dir=ckpt_dir,
        clip_ckpt=args.clip_ckpt or None,
        n_model=args.n_model,
        log_file=os.path.join(ckpt_dir, "metrics.jsonl"),
        seed=args.seed,
        smoke=args.smoke,
    )
    trainer.fit(resume_from=args.weight,
                san_check_val_step=args.san_check_val_step)


if __name__ == "__main__":
    main()
