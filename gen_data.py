"""Pseudo-label generation for self-training (reference gen_data.py parity).

Runs a (zero- or few-shot) teacher over the *training* split, optionally with
4-way TTA (identity / h-flip / t-flip / h+t-flip), filters predictions by
confidence, TTA consistency and per-class top-k, merges ground-truth few-shot
labels, and materializes a new symlinked dataset tree that the few-shot
trainer consumes for semi-supervised self-training
(reference gen_data.py:69-280, docs/benchmark.md:90-130).

    python gen_data.py --params configs/zsclip/zsclip_nin_mini_params-vitb32.py \
        --save_path ./data/pseudo-N_Imagenet/zs --conf_thresh 0.999 \
        --tta --tta_consistent --tta_min_prob [--topk 30] \
        [--weight few_shot.npz --gt_shots 10]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def resolve_link(path):
    """Fully resolve a (possibly chained) symlink to its real target."""
    return osp.realpath(path)


def class_relpath(path):
    """Trailing '<class folder>/<file name>' of an event path — the key the
    reference uses to match GT split entries against dataset files."""
    from pathlib import PurePath

    return osp.join(*PurePath(path).parts[-2:])


def report_selection(args, class_names, gt_cnt, sel_cnt, correct_cnt):
    """Per-class + aggregate pseudo-label selection report."""
    rows = [
        (name, gt_cnt[name], sel_cnt[name], correct_cnt[name])
        for name in class_names
    ]
    print("\nClass stats:")
    for name, gt, sel, cor in rows:
        print(f"\t{name}: GT {gt}, select {sel}, {cor} correct")
    # zero-selection classes count as inaccurate (precision treated as 0)
    precision = lambda sel, cor: cor / sel if sel else 0.0  # noqa: E731
    inaccurate = sum(1 for _, _, sel, cor in rows if precision(sel, cor) < 0.5)
    print(f"Low-precision classes (<50%): {inaccurate}/{len(rows)}")
    total_gt = sum(gt for _, gt, _, _ in rows)
    total_sel = sum(sel for _, _, sel, _ in rows)
    total_cor = sum(cor for _, _, _, cor in rows)
    print(f"\nUsing conf_thresh={args.conf_thresh}")
    if args.topk > 0:
        print(f"Using topk={args.topk}")
    pct = 100.0 * total_cor / total_sel if total_sel else 0.0
    print(f"\tSelect {total_sel} from {total_gt}, Acc={pct:.2f}%")
    if args.tta:
        print(f"Using TTA with consistent={args.tta_consistent} + "
              f"min_prob={args.tta_min_prob}")


def main(params, args):
    import jax
    import jax.numpy as jnp

    from eventclip_tpu.data import PrefetchLoader, build_dataset, \
        device_prefetch
    from eventclip_tpu.data.datasets import load_split_asset
    from eventclip_tpu.engine.checkpoint import load_checkpoint
    from eventclip_tpu.engine.trainer import (
        DEFAULT_PROMPT,
        build_text_features,
        resolve_clip_params,
        snapshot_logit_scale,
    )
    from eventclip_tpu.models.classifier import (
        build_classifier_config,
        classifier_forward,
        init_classifier_params,
    )
    from eventclip_tpu.models.clip.config import clip_arch_config
    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import rasterize_for_clip

    is_zs = params.model == "ZSCLIP"
    tta = args.tta
    is_nin = "n_imagenet" in params.dataset
    if not is_nin:
        assert params.dataset == "n_caltech", f"{params.dataset} not supported"
    print(f"Pseudo-labeling the {params.dataset} training split")

    test_set = build_dataset(params, val_only=False, gen_data=True, tta=tta)
    ev_dst = test_set.event_dataset
    class_names, ds_labels = test_set.classes, ev_dst.labels

    clip_cfg = clip_arch_config(params.clip_dict["arch"])
    # honor the config's precision knob like the trainer does (bf16=False
    # runs f32 - mandatory for random debug towers, whose ~1e-4 feature
    # differences underflow bf16)
    dtype = jnp.bfloat16 if bool(params.get("bf16", True)) else jnp.float32
    cls_cfg = build_classifier_config(params, clip_cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    clip_params, pretrained = resolve_clip_params(
        params, clip_cfg, rng, args.clip_ckpt or None,
        smoke=getattr(args, "smoke", False),
    )
    cls_cfg = snapshot_logit_scale(cls_cfg, clip_params, pretrained)
    if getattr(args, "prune_tokens", 0) > 0:
        import dataclasses

        cls_cfg = dataclasses.replace(cls_cfg,
                                      keep_tokens=args.prune_tokens)
    text_feats = build_text_features(
        clip_params, clip_cfg, class_names,
        params.clip_dict.get("prompt", DEFAULT_PROMPT),
        pretrained,
    )
    model_params = init_classifier_params(
        rng, cls_cfg, clip_params=clip_params, text_feats=text_feats
    )

    # ground-truth few-shot labels of the teacher (not pseudo-labeled again)
    gt_data = {}
    if args.weight:
        assert not is_zs, (
            "--weight is for few-shot teachers; a zero-shot teacher "
            "carries no checkpoint"
        )
        model_params, _ = load_checkpoint(args.weight, target=model_params)
        print(f"Loading weight: {args.weight}")
        assert args.gt_shots > 0, (
            "pass --gt_shots = the shot count the teacher was trained with"
        )
        assert f"{args.gt_shots}shot" in args.weight or \
            f"{args.gt_shots}-shot" in args.weight
        if args.save_path:
            assert f"{args.gt_shots}shot" in args.save_path or \
                f"{args.gt_shots}-shot" in args.save_path
        gt_split = load_split_asset(
            type(ev_dst).__name__, args.gt_shots, True
        ) or load_split_asset(type(ev_dst).__name__, args.gt_shots, False)
        assert gt_split, f"no shipped {args.gt_shots}-shot split"
        gt_data = {k: class_names[v] for k, v in gt_split.items()}
    gt_data_paths = {class_relpath(k) for k in gt_data}

    spec = test_set.raster_spec()
    pp = ClipPreprocess(in_height=spec.height, in_width=spec.width,
                        image_size=clip_cfg.vision.image_size)

    # teacher labeling is the heaviest inference job in the reference
    # workflow (the full training split x 4 TTA views through ViT towers,
    # reference gen_data.py:69-280 runs it on the 4-GPU node) — run it
    # data-parallel over the whole mesh like test.py/serve.py: params
    # replicated, batch sharded, probs fetched back replicated-per-host.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eventclip_tpu.parallel import (
        DATA_AXIS, make_global_batch, make_mesh, shard_params,
    )
    from eventclip_tpu.parallel.distributed import host_shard_info

    shard_index, num_shards = host_shard_info()
    mesh = make_mesh()  # all devices on the data axis (pure DP teacher)
    n_data = mesh.shape[DATA_AXIS]
    raster_mesh = mesh if mesh.devices.size > 1 else None

    import functools

    jit_kwargs = {}
    if raster_mesh is not None:
        # pin the output layout so each host can read back exactly its own
        # shard's rows (addressable shards) without a cross-host gather
        jit_kwargs["out_shardings"] = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, **jit_kwargs)
    def probs_step(mp, windows, valid):
        lead = windows.shape[:-3]  # [B] or [B, 4]
        flat_w = windows.reshape((-1,) + windows.shape[-3:])
        flat_v = valid.reshape((-1,) + valid.shape[-1:])
        imgs = rasterize_for_clip(spec, pp, flat_w, mesh=raster_mesh)
        out = classifier_forward(mp, cls_cfg, imgs, flat_v)
        return out["probs"].reshape(lead + (len(class_names),))

    bs = max(int(params.get("val_batch_size", 32)), 1)
    if tta:
        bs = max(bs // 4, 1)
    # the global batch dim must divide the data axis (num_shards divides
    # n_data: every host contributes the same device count)
    bs = max(bs - bs % n_data, n_data)
    loader = PrefetchLoader(
        test_set, bs, pad_last=True,
        num_workers=params.get("num_workers", 8),
        shard_index=shard_index, num_shards=num_shards,
    )

    if getattr(args, "int8", False):
        from eventclip_tpu.ops.quant import quantize_classifier_params

        act_amax = None
        if getattr(args, "int8_calib", 0) > 0:
            # static activation scales from the first N teacher batches.
            # Each host sweeps its OWN shard, then the amax vectors fold
            # with a cross-process max so every host quantizes the SAME
            # teacher — pseudo-labels must not depend on shard assignment
            # (reference gen_data.py:69-280 has one teacher, one label set)
            from eventclip_tpu.ops.quant import calibrate_visual_amax
            from eventclip_tpu.parallel import allreduce_max_array

            to_imgs = jax.jit(lambda w: rasterize_for_clip(spec, pp, w))
            for i, batch in enumerate(loader):
                if i >= args.int8_calib:
                    break
                w = jnp.asarray(batch["windows"])  # [..., N, 4]
                imgs = to_imgs(w.reshape((-1,) + w.shape[-2:]))
                a = calibrate_visual_amax(
                    model_params["clip"]["visual"], cls_cfg.clip.vision,
                    imgs, dtype=cls_cfg.dtype,
                )
                act_amax = a if act_amax is None else jnp.maximum(act_amax,
                                                                  a)
            if act_amax is not None:  # shards are balanced: all-or-none
                act_amax = jnp.asarray(allreduce_max_array(act_amax))
        try:
            model_params = quantize_classifier_params(model_params,
                                                      act_amax=act_amax)
        except ValueError as e:
            raise SystemExit(f"--int8: {e}")
    model_params = shard_params(model_params, mesh)

    n_correct, n_total = 0, 0
    gt_class_cnt = {
        k: int((ds_labels == i).sum()) for i, k in enumerate(class_names)
    }
    sel_class_cnt = {k: 0 for k in class_names}
    sel_correct_class_cnt = {k: 0 for k in class_names}
    pred_path2cls = {}
    conf_thresh, topk = args.conf_thresh, args.topk

    def consume(probs, labels, mask, data_idx):
        """Host-side filtering/accounting for one batch's [B(,4), n_cls]."""
        nonlocal n_correct, n_total
        if tta:
            tta_probs = probs  # [B, 4, n_cls]
            tta_mask = np.ones(len(labels), dtype=bool)
            if args.tta_consistent:
                pred_cls = tta_probs.argmax(-1)  # [B, 4]
                tta_mask &= (pred_cls == pred_cls[:, :1]).all(-1)
            if args.tta_min_prob:
                min_probs = tta_probs.max(-1).min(-1)
                tta_mask &= min_probs > conf_thresh
            probs = tta_probs.mean(1)
        pred_labels = probs.argmax(-1)
        max_probs = probs.max(-1)
        n_correct += int(((pred_labels == labels) & mask).sum())
        n_total += int(mask.sum())
        sel_mask = max_probs > conf_thresh
        if tta:
            sel_mask &= tta_mask
        sel_mask &= mask
        for i in range(len(labels)):
            if not mask[i]:
                continue
            ev_path = str(ev_dst.labeled_files[data_idx[i]])
            if class_relpath(ev_path) in gt_data_paths:
                continue
            pred_cls_name = class_names[pred_labels[i]]
            if sel_mask[i]:
                sel_class_cnt[pred_cls_name] += 1
                if pred_labels[i] == labels[i]:
                    sel_correct_class_cnt[pred_cls_name] += 1
                if topk > 0:
                    pred_path2cls[ev_path] = {
                        "cls": pred_cls_name, "prob": float(max_probs[i]),
                    }
                else:
                    pred_path2cls[ev_path] = pred_cls_name

    # same feed/compute overlap as trainer.fit / test.py: batch k+1's H2D
    # placement rides under batch k's dispatched forward, and the host-side
    # filtering runs one batch BEHIND the dispatch so the [B, n_cls] fetch
    # never syncs on the step it just launched
    def place(batch):
        dev = make_global_batch(
            {"windows": batch["windows"], "valid_mask": batch["valid_mask"]},
            mesh,
        )
        host = (batch["label"], batch["sample_mask"], batch["data_idx"])
        return dev, host

    def fetch_local(arr):
        """This host's rows of the data-sharded [B(,4), n_cls] probs."""
        if num_shards == 1:
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    pending = None
    for dev, host in device_prefetch(loader, place):
        probs_dev = probs_step(model_params, dev["windows"],
                               dev["valid_mask"])
        if pending is not None:
            consume(fetch_local(pending[0]), *pending[1])
        pending = (probs_dev, host)
    if pending is not None:
        consume(fetch_local(pending[0]), *pending[1])

    # multi-host: every process labeled 1/num_shards of the split — merge
    # the selections so the report/topk/symlink stages below see the global
    # picture, then let rank 0 own the side effects
    if num_shards > 1:
        from eventclip_tpu.parallel.distributed import gather_objects

        parts = gather_objects((n_correct, n_total, sel_class_cnt,
                                sel_correct_class_cnt, pred_path2cls))
        n_correct = sum(p[0] for p in parts)
        n_total = sum(p[1] for p in parts)
        for name in class_names:
            sel_class_cnt[name] = sum(p[2][name] for p in parts)
            sel_correct_class_cnt[name] = sum(p[3][name] for p in parts)
        pred_path2cls = {}
        for p in parts:  # shards are disjoint slices of the split
            pred_path2cls.update(p[4])
        if jax.process_index() != 0:
            return

    report_selection(args, class_names, gt_class_cnt, sel_class_cnt,
                     sel_correct_class_cnt)
    print(f"\n\nTesting {args.params}")
    if args.weight:
        print(f"Model weight: {args.weight}")
    print(f"\taccuracy@1 (probs): {n_correct / max(n_total, 1) * 100.:.2f}%")

    save_path = args.save_path
    if not save_path:
        return

    train_path = osp.join(save_path, "extracted_train") if is_nin \
        else osp.join(save_path, "training")
    assert not osp.exists(save_path), f"{save_path} already exists!"
    os.makedirs(train_path, exist_ok=True)
    new_cnames = getattr(ev_dst, "new_cnames", None)
    # renamed class -> original folder name (undo the CoOp renames when
    # writing folders; reference walks the dict per lookup and takes the
    # FIRST match — e.g. both Faces and Faces_easy rename to 'face', and
    # reference trees put 'face' pseudo labels under Faces/ — so the
    # inversion must keep the first occurrence, not the last
    orig_cname = {}
    for k, v in (new_cnames or {}).items():
        orig_cname.setdefault(v, k)

    # per-class top-k re-filter by confidence (gen_data.py:202-228)
    if topk > 0:
        topk_path2cls, sel_class_cnt, sel_correct_class_cnt = {}, {}, {}
        for cls_name in class_names:
            sel_correct_class_cnt[cls_name] = 0
            cls_paths = [p for p, d in pred_path2cls.items()
                         if d["cls"] == cls_name]
            cls_probs = np.array(
                [pred_path2cls[p]["prob"] for p in cls_paths]
            )
            k = min(topk, len(cls_paths))
            for i in np.argsort(-cls_probs)[:k]:
                path = cls_paths[i]
                gt_cls_name = osp.basename(osp.dirname(path))
                if is_nin:
                    gt_cls_name = ev_dst.folder2name[gt_cls_name]
                if new_cnames is not None:
                    gt_cls_name = new_cnames.get(gt_cls_name, gt_cls_name)
                if gt_cls_name == cls_name:
                    sel_correct_class_cnt[cls_name] += 1
                topk_path2cls[path] = cls_name
            sel_class_cnt[cls_name] = k
        pred_path2cls = topk_path2cls
        report_selection(args, class_names, gt_class_cnt, sel_class_cnt,
                         sel_correct_class_cnt)

    # merge GT labeled data, then materialize symlinks; the protocol
    # guarantees every GT few-shot sample is included (reference merges
    # unconditionally), so a split entry that doesn't resolve under this
    # data_root must be surfaced, not silently trained without
    missing_gt = []
    for rel, cls in gt_data.items():
        abs_path = ev_dst._resolve_split_path(rel)
        if osp.exists(abs_path):
            pred_path2cls[abs_path] = cls
        else:
            missing_gt.append(rel)
    if missing_gt:
        print(f"WARNING: {len(missing_gt)} GT few-shot file(s) not found "
              f"under {ev_dst.root} (e.g. {missing_gt[:3]}) - the pseudo "
              "dataset will hold fewer labeled samples than the protocol "
              "expects")
    for path, pred_cls in pred_path2cls.items():
        path = resolve_link(path)
        pred_cls = orig_cname.get(pred_cls, pred_cls)
        folder = ev_dst.name2folder[pred_cls] if is_nin else pred_cls
        new_path = osp.join(train_path, folder, osp.basename(path))
        os.makedirs(osp.dirname(new_path), exist_ok=True)
        if not osp.exists(new_path):
            os.symlink(path, new_path)

    # symlink val/test splits next to the pseudo train split
    if is_nin:
        ori_val = resolve_link(osp.join(osp.dirname(ev_dst.root),
                                         "extracted_val"))
        os.symlink(ori_val, osp.join(save_path, "extracted_val"))
    else:
        for split in ("validation", "testing"):
            ori = osp.join(osp.dirname(ev_dst.root), split)
            if osp.exists(ori):
                os.symlink(resolve_link(ori), osp.join(save_path, split))
    print(f"\nPseudo-label dataset tree written to {save_path}")

    # empty class dirs for consistency (gen_data.py:271-280)
    for k in class_names:
        k = orig_cname.get(k, k)
        folder = ev_dst.name2folder[k] if is_nin else k
        os.makedirs(osp.join(train_path, folder), exist_ok=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="EventCLIP-TPU gen_data")
    parser.add_argument("--params", type=str, required=True)
    parser.add_argument("--save_path", type=str, default="")
    parser.add_argument("--weight", type=str, default="", help="load weight")
    parser.add_argument("--conf_thresh", type=float, default=-1.0)
    parser.add_argument("--tta", action="store_true")
    parser.add_argument("--tta_consistent", action="store_true")
    parser.add_argument("--tta_min_prob", action="store_true")
    parser.add_argument("--topk", type=int, default=-1)
    parser.add_argument("--gt_shots", type=int, default=-1)
    parser.add_argument("--data_root", type=str, default="")
    parser.add_argument("--clip_ckpt", type=str,
                        default=os.environ.get("CLIP_CKPT", ""))
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--smoke", action="store_true",
                        help="allow RANDOM CLIP weights (pipeline testing "
                        "only; pseudo labels will be garbage)")
    parser.add_argument("--int8", action="store_true",
                        help="quantize the ViT tower to W8A8 int8 for "
                        "pseudo-labeling (faster teacher inference)")
    parser.add_argument("--int8_calib", type=int, default=0,
                        help="with --int8: calibrate STATIC activation "
                        "scales on the first N teacher batches (~1.43x vs "
                        "1.28x bf16 encode; out-of-range activations clip)")
    parser.add_argument("--prune_tokens", type=int, default=0,
                        help="keep only the K highest-variance ViT patches "
                        "per frame; stacks with --int8")
    parser.add_argument("--fp32", action="store_true",
                        help="run activations in f32 instead of bf16")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from eventclip_tpu.utils.jax_setup import setup_jax

    setup_jax()
    # pseudo-labeling scales out exactly like training: every process runs
    # this script, coordination is env-driven (the same triple
    # scripts/submit_run.sh exports), each host labels its loader shard and
    # rank 0 owns the report + symlink tree (see the gather in main())
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from eventclip_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )

    from eventclip_tpu.utils.config import load_params

    params = load_params(args.params)
    if args.fp32:
        params.bf16 = False  # single source: dtype derives from params.bf16
    if args.data_root:
        params.data_root = args.data_root
    if args.save_path:
        assert not osp.exists(args.save_path), (
            f"{args.save_path} already exists!"
        )
    main(params, args)
