"""High-level trainer: the nerv BaseMethod / EventCLIPMethod equivalent.

Reference behavior being replicated (method.py + nerv.training.BaseMethod):
- per-step optimizer + warmup-cosine schedule (method.py:82-98)
- dual LR groups for FTCLIP (method.py:150-193)
- eval every `eval_interval` epochs computing probs/logits accuracy
- checkpoint every `save_interval` epochs, monitor val/probs_acc max
- sanity-check validation before training (train.py:94-95)
- preemption-safe resume from a full-state file

TPU-native differences:
- one jit-compiled step over a ('data','model') mesh instead of DDP;
- the event->image conversion happens inside the jitted step
  (ops.rasterize_for_clip), so DataLoader workers only gather windows;
- metrics go to stdout + a JSONL file (wandb is optional/offline here).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PrefetchLoader, adaptive_prefetch, device_prefetch
from ..data.loader import eval_pack_buckets, pack_view_batch
from ..models.classifier import (
    DEFAULT_PROMPT,
    ClassifierConfig,
    build_classifier_config,
    compute_text_features,
    init_classifier_params,
)
from ..models.clip.config import clip_arch_config
from ..ops.preprocess import ClipPreprocess
from ..parallel import make_mesh, shard_params
from ..utils.meters import AverageMeter
from .checkpoint import CheckpointManager, load_checkpoint
from .optim import OptimConfig, build_optimizer
from .train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _log_jsonl(path: Optional[str], record: Dict[str, Any]) -> None:
    if not path:
        return
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def resolve_clip_params(params_cfg, clip_cfg, rng, clip_ckpt: Optional[str],
                        smoke: bool = False):
    """Load converted CLIP weights, or random init in smoke/debug mode.

    The reference always loads real weights via `clip.load(arch)`
    (reference train.py:26); random CLIP produces garbage accuracies without
    otherwise failing, so running without a checkpoint is an error unless the
    caller passed --smoke or the arch is a debug tower (no released weights).
    """
    ckpt = clip_ckpt or params_cfg.get("clip_ckpt", None)
    if ckpt and not os.path.exists(ckpt):
        raise FileNotFoundError(f"CLIP checkpoint not found: {ckpt}")
    if ckpt:
        if ckpt.endswith(".npz"):
            flat, _ = load_checkpoint(ckpt)
            from ..models.clip.model import init_clip_params

            tree = init_clip_params(rng, clip_cfg)
            import jax.tree_util as jtu

            from ..utils.pytree import path_str

            missing = []

            def replace(path, leaf):
                key = path_str(path)
                if key not in flat:
                    # a partially-matching archive must not silently leave
                    # random-init leaves in a tree reported as pretrained
                    missing.append(key)
                    return leaf
                loaded = flat[key]
                assert loaded.shape == tuple(np.shape(leaf)), (
                    f"{key}: ckpt {loaded.shape} vs model {np.shape(leaf)} — "
                    f"is {ckpt} converted for {clip_cfg.name!r}?"
                )
                return jnp.asarray(loaded)

            out = jtu.tree_map_with_path(replace, tree)
            if missing:
                raise ValueError(
                    f"{ckpt} is missing {len(missing)} parameter(s) the "
                    f"{clip_cfg.name!r} tree needs (e.g. {missing[:3]}); "
                    "re-convert with scripts/convert_clip.py — loading it "
                    "would silently mix random weights into a tree treated "
                    "as pretrained"
                )
            return out, True
        from ..models.clip.convert import load_clip_checkpoint

        params, _ = load_clip_checkpoint(ckpt)
        return jax.tree_util.tree_map(jnp.asarray, params), True
    if not (smoke or clip_cfg.debug):
        raise FileNotFoundError(
            f"No CLIP checkpoint for {clip_cfg.name!r}. Real runs need the "
            "released OpenAI weights (the reference downloads them via "
            "clip.load, reference train.py:26):\n"
            "  - pass --clip_ckpt /path/to/checkpoint.pt (torch archive), or\n"
            "  - convert once with scripts/convert_clip.py and pass the .npz,"
            "\n  - or set the CLIP_CKPT environment variable.\n"
            "Pass --smoke to run with RANDOM weights (throughput/pipeline "
            "testing only — every reported accuracy will be garbage)."
        )
    from ..models.clip.model import init_clip_params

    print("WARNING: smoke mode - RANDOM CLIP weights; accuracies are garbage")
    return init_clip_params(rng, clip_cfg), False


def restore_placement(new_state, ref_state, mesh):
    """Re-place a host-restored TrainState onto the mesh.

    load_resume_state rebuilds leaves as host/process-local arrays; on a
    multi-device (or multi-host) mesh the jitted step needs them back in
    the placement the pre-restore state carries — params sharded by
    shard_params, optimizer moments following their params. On 1-device
    meshes the restored uncommitted placement is deliberate (committed
    buffers cost ~30x per dispatch through the relay, see CLAUDE.md), so
    nothing is moved.
    """
    if mesh.size == 1 and jax.process_count() == 1:
        return new_state
    from jax.sharding import NamedSharding

    def place(new, ref):
        # only leaves shard_params/optax placed on the mesh get committed
        # back; scalars (step, opt counts, rng) stay uncommitted — jit moves
        # those freely, and committing them to their incidental single
        # device would conflict with the mesh-placed leaves
        if isinstance(ref, jax.Array) and isinstance(ref.sharding,
                                                     NamedSharding):
            return jax.device_put(new, ref.sharding)
        return new

    return jax.tree_util.tree_map(place, new_state, ref_state)


def snapshot_logit_scale(cls_cfg, clip_params, pretrained: bool):
    """Snapshot exp(learned tau) from the checkpoint into the classifier
    config (reference models/clip_cls.py:44). Random-init runs keep the
    config default of 100.0 = the released checkpoints' clamped value."""
    if not pretrained:
        return cls_cfg
    import dataclasses

    scale = float(np.exp(np.asarray(clip_params["logit_scale"])))
    return dataclasses.replace(cls_cfg, logit_scale=scale)


def build_text_features(clip_params, clip_cfg, class_names, prompt,
                        pretrained: bool):
    """Prompted text features; random fallback only for smoke/debug runs."""
    try:
        from ..models.clip.tokenizer import SimpleTokenizer

        tok = SimpleTokenizer()
        return compute_text_features(
            clip_params, clip_cfg, class_names, prompt, tok
        )
    except (FileNotFoundError, OSError) as e:
        hatch = os.environ.get("EVENTCLIP_ALLOW_RANDOM_TEXT") == "1"
        if pretrained and not hatch:
            # real weights + random text features would silently produce
            # garbage zero-shot numbers; refuse (reference models/clip_cls.py:81-83)
            raise FileNotFoundError(
                "BPE vocab asset missing; drop bpe_simple_vocab_16e6.txt.gz "
                "into eventclip_tpu/assets/ to tokenize prompts with real "
                f"CLIP weights. ({e})"
            ) from e
        # EVENTCLIP_ALLOW_RANDOM_TEXT=1 is scripts/parity_check.py's escape
        # hatch: sound ONLY when the consumer overwrites the text leaf —
        # prompt-tuned ('text-*') checkpoints carry their own text_feats,
        # so evaluation does not depend on this initialization
        print("WARNING: BPE vocab asset missing - random text features "
              "(smoke mode)" + (" [EVENTCLIP_ALLOW_RANDOM_TEXT]"
                                if hatch else ""))
        from ..models.classifier import normalize

        rng = jax.random.PRNGKey(1234)
        return normalize(
            jax.random.normal(rng, (len(class_names), clip_cfg.embed_dim))
        )


class EventCLIPTrainer:
    def __init__(
        self,
        params,  # experiment config (utils.config.Params)
        train_set,
        val_set,
        ckpt_dir: str,
        clip_ckpt: Optional[str] = None,
        n_model: int = 1,
        log_file: Optional[str] = None,
        seed: int = 0,
        smoke: bool = False,
    ):
        self.params = params
        self.train_set = train_set
        self.val_set = val_set
        self.log_file = log_file

        arch = params.clip_dict["arch"]
        self.clip_cfg = clip_arch_config(arch)
        # bf16 activations by default (the TPU analog of the reference's
        # --fp16 AMP, train.py:104); bf16=False runs f32 end-to-end. Debug
        # towers with RANDOM weights need f32: their features differ across
        # inputs by ~1e-4 relative (random-net feature collapse), below
        # bf16's resolution, so bf16 smoke runs produce constant features.
        dtype = jnp.bfloat16 if bool(params.get("bf16", True)) else jnp.float32
        self.cls_cfg: ClassifierConfig = build_classifier_config(
            params, self.clip_cfg, dtype=dtype
        )

        rng = jax.random.PRNGKey(seed)
        clip_params, self.pretrained = resolve_clip_params(
            params, self.clip_cfg, rng, clip_ckpt, smoke=smoke
        )
        self.cls_cfg = snapshot_logit_scale(
            self.cls_cfg, clip_params, self.pretrained
        )
        text_feats = build_text_features(
            clip_params, self.clip_cfg, train_set.classes,
            params.clip_dict.get("prompt", DEFAULT_PROMPT),
            self.pretrained,
        )
        self.model_params = init_classifier_params(
            rng, self.cls_cfg, clip_params=clip_params, text_feats=text_feats
        )

        # mesh: data-parallel over all devices unless model sharding is asked
        n_devices = jax.device_count()
        assert n_devices % n_model == 0
        self.mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)
        self.n_data = n_devices // n_model

        # gradient accumulation: one optimizer update per accum_steps
        # sequential microbatches — keeps a config's global batch (the
        # parity spec) when it exceeds chip memory / device count
        self.accum = max(int(params.get("accum_steps", 1)), 1)
        # prefetch depth measured on the first epoch, reused afterwards
        # (adaptive_prefetch fills in 'depth'; see fit())
        self._prefetch_choice: dict = {}
        # loaders (global batch sharded over the data axis by shard_batch);
        # every microbatch (global/accum) must itself split over the data axis
        self.global_batch = int(params.train_batch_size)
        divisor = self.n_data * self.accum
        if self.global_batch % divisor != 0:
            adjusted = max(
                divisor, self.global_batch - self.global_batch % divisor
            )
            print(
                f"WARNING: train_batch_size={self.global_batch} is not "
                f"divisible by data_devices*accum={divisor}; training at "
                f"global batch {adjusted} instead — the config's parity "
                "batch is NOT preserved", flush=True,
            )
            self.global_batch = adjusted
        # on a multi-host slice each process loads only its shard of every
        # global batch (the DistributedSampler contract, torch-free)
        from ..parallel.distributed import host_shard_info

        shard_index, num_shards = host_shard_info()
        print(f"mesh: devices={n_devices} "
              f"data={self.n_data} model={n_model} "
              f"host_shard={shard_index}/{num_shards}")
        self.train_loader = PrefetchLoader(
            train_set, self.global_batch, shuffle=True, drop_last=True,
            num_workers=params.get("num_workers", 8), seed=seed,
            shard_index=shard_index, num_shards=num_shards,
        )
        val_bs = int(params.get("val_batch_size", self.global_batch))
        val_bs = max(val_bs - val_bs % max(self.n_data, num_shards),
                     max(self.n_data, num_shards))
        self.val_loader = PrefetchLoader(
            val_set, val_bs, shuffle=False, pad_last=True,
            num_workers=params.get("num_workers", 8),
            shard_index=shard_index, num_shards=num_shards,
        )
        # packed eval: at the forced view budget of 10 most val samples
        # carry fewer real windows; packing encodes only real views
        # (reference economy, clip_cls.py:139) with bucketed static shapes.
        # eval_pack_buckets is the one shared policy (also used by test.py).
        self._eval_buckets = eval_pack_buckets(
            val_bs, val_set.max_imgs, self.n_data, num_shards
        )

        # optimizer
        steps_per_epoch = len(self.train_loader)
        total_steps = int(params.get("max_epochs", 1)) * max(steps_per_epoch, 1)
        self.opt_cfg = OptimConfig(
            optimizer=params.get("optimizer", "Adam"),
            lr=float(params.lr),
            clip_lr=float(params.get("clip_lr", params.lr)),
            weight_decay=float(params.get("weight_decay", 0.0)),
            total_steps=total_steps,
            warmup_steps_pct=float(params.get("warmup_steps_pct", 0.05)),
            grad_clip=float(params.get("grad_clip", -1)),
        )
        self.tx = build_optimizer(self.cls_cfg, self.opt_cfg, self.model_params)

        sharded = shard_params(self.model_params, self.mesh)
        self.state = create_train_state(sharded, self.tx, jax.random.PRNGKey(seed + 1))
        # ZeRO-1 (params.zero1 / --zero1): shard the persistent Adam
        # moments over the data axis instead of replicating them per
        # data-parallel replica (the reference's DDP has no analog —
        # every GPU holds the full optimizer). Memory-only on the
        # forward/backward; the step pins the layout (make_train_step)
        self.zero1 = bool(params.get("zero1", False)) and self.mesh.size > 1
        if self.zero1:
            from ..parallel import shard_opt_state

            self.state = self.state._replace(
                opt_state=shard_opt_state(self.state.opt_state, self.mesh)
            )

        # on-device pipeline config from the dataset
        spec = train_set.raster_spec()
        self.pipeline = (
            spec,
            ClipPreprocess(
                in_height=spec.height, in_width=spec.width,
                image_size=self.clip_cfg.vision.image_size,
            ),
        )

        loss_weights = {"ce_loss": float(params.get("ce_loss_w", 1.0))}
        self.train_step = make_train_step(
            self.cls_cfg, self.tx, self.mesh,
            loss_weights=loss_weights, pipeline=self.pipeline,
            augment=bool(getattr(train_set, "augment", False)),
            accum_steps=self.accum,
            zero1=self.zero1,
        )
        top5 = params.dataset == "n_imagenet"
        self.eval_step = make_eval_step(
            self.cls_cfg, self.mesh, top5=top5,
            pipeline=self.pipeline,
        )

        # multi-process: every process runs the identical compute (the
        # sharded steps contain collectives, so no rank may skip them) but
        # only process 0 touches shared files — checkpoints, resume state,
        # metrics JSONL, run_id, profiler traces. The reference gates the
        # same way (rank-0-only wandb/ckpt via nerv, reference
        # method.py:103-105); without it two processes race .npz writes in
        # one ckpt_dir and double-append every metrics line.
        self.is_main = jax.process_index() == 0
        self.ckpt = CheckpointManager(ckpt_dir, self.cls_cfg)
        self.ckpt_dir = ckpt_dir
        self.run_id = self._resolve_run_id(ckpt_dir, write=self.is_main)
        if not self.is_main:
            self.log_file = None  # _log_jsonl no-ops on workers
        self.epoch = 0
        # observability knobs (absent in the reference beyond wandb):
        # profile_steps > 0 captures a jax.profiler trace of those steps
        self.profile_steps = int(params.get("profile_steps", 0)) \
            if self.is_main else 0
        self.visualize = bool(params.get("visualize", True))

    # ------------------------------------------------------------------

    @staticmethod
    def _resolve_run_id(ckpt_dir: str, write: bool = True) -> str:
        """Stable experiment identity that survives preemption/resume.

        The reference keeps one wandb curve per experiment across Slurm
        requeues via `id=f'{exp_name}-{SLURM_JOB_ID}'` + find_old_slurm_id
        (reference train.py:57-82). Here the id is minted once per ckpt_dir
        and persisted next to the metrics, so a resumed job appends to the
        same curve and downstream tools can group records by run. Worker
        processes pass write=False: they never log, and a pid-fallback id
        written from two processes would race with divergent content.
        """
        rid_path = os.path.join(ckpt_dir, "run_id.txt")
        if os.path.exists(rid_path):
            with open(rid_path) as f:
                rid = f.read().strip()
            if rid:
                return rid
        exp = os.path.basename(os.path.normpath(ckpt_dir)) or "run"
        job = (os.environ.get("SLURM_JOB_ID")
               or os.environ.get("JOB_ID")
               or f"{os.getpid()}-{int(time.time())}")
        rid = f"{exp}-{job}"
        if write:
            tmp = rid_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(rid + "\n")
            os.replace(tmp, rid_path)
        return rid

    def _device_batch(self, batch: Dict[str, np.ndarray], accum: int = 1):
        from ..parallel.distributed import make_global_batch

        keep = {
            k: v for k, v in batch.items()
            if k in ("windows", "img", "valid_mask", "label", "sample_mask",
                     "view_src")
        }
        keep["label"] = keep["label"].astype(np.int32)
        if accum > 1:
            # the gradient-accumulation layout the train step scans over
            # (host-side reshape; see make_train_step / batch_pspec)
            b = next(iter(keep.values())).shape[0]
            assert b % accum == 0, (b, accum)
            keep = {
                k: v.reshape((accum, b // accum) + v.shape[1:])
                for k, v in keep.items()
            }
        return make_global_batch(keep, self.mesh, microbatched=accum > 1)

    def _boundary_save(self, epoch: int, val_stats) -> None:
        """Checkpoint + resume state at an epoch boundary (all ranks call)."""
        # ZeRO-1 multi-process: the data-sharded moments are not
        # addressable from rank 0 alone, so fetching them is a
        # collective EVERY rank must join — before the is_main gate
        host_opt = None
        if self.zero1 and jax.process_count() > 1:
            from .checkpoint import fetch_opt_state

            host_opt = fetch_opt_state(self.state.opt_state)
        if self.is_main:
            # fetch only trainable leaves (the frozen CLIP tower is
            # GBs and never changes; fetching it per save dominates
            # epochs); process 0 only — replicated leaves are
            # host-fetchable without collectives, so workers may
            # skip this part entirely
            from ..models.partition import trainable_mask, trainable_subtree

            host_trainable = jax.device_get(trainable_subtree(
                self.state.params,
                trainable_mask(self.cls_cfg, self.state.params),
            ))
            self.ckpt.save(host_trainable, int(self.state.step), val_stats)
            self.ckpt.save_resume_state(self.state, epoch + 1,
                                        opt_state_host=host_opt)

    def _on_preempt_signal(self, signum, frame) -> None:
        self._preempt_signum = signum
        if self.is_main:
            print(f"[preempt] caught signal {signum}; will checkpoint at "
                  "the epoch boundary and exit")

    def _reraise_preempt_signal(self) -> None:
        """Die by the original signal so schedulers/watchdogs resubmit.

        EVENTCLIP_PREEMPT_EXIT=0 returns instead (in-process tests)."""
        import signal

        if os.environ.get("EVENTCLIP_PREEMPT_EXIT", "1") == "0":
            return
        signal.signal(self._preempt_signum, signal.SIG_DFL)
        os.kill(os.getpid(), self._preempt_signum)

    def fit(self, resume_from: str = "", san_check_val_step: int = 2) -> None:
        import signal

        self._preempt_signum = None
        # handlers only installable on the main thread; anywhere else the
        # default disposition (immediate kill) simply remains in effect
        saved_handlers = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGUSR1):
                saved_handlers[sig] = signal.signal(
                    sig, self._on_preempt_signal)
        except ValueError:
            saved_handlers = {}
        try:
            self._fit(resume_from, san_check_val_step)
        finally:
            for sig, h in saved_handlers.items():
                signal.signal(sig, h)

    def _fit(self, resume_from: str = "", san_check_val_step: int = 2) -> None:
        start_epoch = 0
        restored = self.ckpt.load_resume_state(self.state)
        if restored is not None:
            new_state, start_epoch = restored
            self.state = restore_placement(new_state, self.state, self.mesh)
            print(f"Resumed full state from epoch {start_epoch}")
        elif resume_from:
            target = self.model_params
            loaded, _ = load_checkpoint(resume_from, target=target)
            self.state = self.state._replace(
                params=shard_params(loaded, self.mesh)
            )
            print(f"Loaded weights from {resume_from}")

        if san_check_val_step:
            self.evaluate(max_steps=san_check_val_step)

        max_epochs = int(self.params.get("max_epochs", 1))
        eval_interval = int(self.params.get("eval_interval", 5))
        save_interval = max(int(self.params.get("save_interval", 1)), 1)
        # profiling skips 2 warmup steps (compile + first dispatch) when the
        # epoch is long enough; tiny datasets (1-2 batches/epoch) must still
        # produce a trace rather than silently never reaching the trigger
        profile_warmup = min(2, max(len(self.train_loader) -
                                    self.profile_steps, 0))
        for epoch in range(start_epoch, max_epochs):
            self.epoch = epoch
            t0 = time.perf_counter()
            n_batches = 0
            profiling = False
            # metrics stay on-device until epoch end: a float() per step would
            # force a host sync every step and serialize the input pipeline
            metric_hist = []
            # double buffering with a MEASURED depth: the first epoch A/Bs
            # holding an extra placed batch (depth 2) against plain
            # place-then-dispatch (depth 1 — itself overlapped, since the
            # dispatched step is async) and every later epoch reuses the
            # winner; through the synchronous axon relay depth 1 wins,
            # on real PCIe depth 2 does (data/loader.py::adaptive_prefetch)
            for dev_batch in adaptive_prefetch(
                self.train_loader.epoch(epoch),
                lambda b: self._device_batch(b, accum=self.accum),
                choice=self._prefetch_choice,
            ):
                if self.profile_steps and epoch == 0 \
                        and n_batches == profile_warmup:
                    jax.profiler.start_trace(
                        os.path.join(self.ckpt_dir, "profile")
                    )
                    profiling = True
                self.state, metrics = self.train_step(self.state, dev_batch)
                metric_hist.append(metrics)
                n_batches += 1
                if profiling and n_batches >= profile_warmup + self.profile_steps:
                    # scalar fetch, not block_until_ready: the latter is a
                    # no-op through the axon relay (CLAUDE.md), which would
                    # stop the trace before the profiled steps executed
                    jax.device_get(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
            if profiling:
                # same relay caveat as the in-loop stop: sync the last step
                # before stopping or the trace captures nothing
                if metric_hist:
                    jax.device_get(metric_hist[-1])
                jax.profiler.stop_trace()
            meters: Dict[str, AverageMeter] = {}
            for metrics in jax.device_get(metric_hist):
                for k, v in metrics.items():
                    meters.setdefault(k, AverageMeter()).update(float(v))
            dt = time.perf_counter() - t0
            stats = {k: m.avg for k, m in meters.items()}
            stats.update(
                epoch=epoch, steps=int(self.state.step),
                sec_per_epoch=round(dt, 2),
                samples_per_sec=round(self.global_batch * max(n_batches, 1) / dt, 2),
            )
            if self.is_main:
                print(f"[train] {stats}")
            _log_jsonl(self.log_file,
                       {"run_id": self.run_id, "split": "train", **stats})

            val_stats = None
            if (epoch + 1) % eval_interval == 0 or epoch + 1 == max_epochs:
                val_stats = self.evaluate()
            saved = (epoch + 1) % save_interval == 0 or epoch + 1 == max_epochs
            if saved:
                self._boundary_save(epoch, val_stats)
            # graceful preemption: SIGTERM/SIGUSR1 (slurm grace period, TPU-VM
            # maintenance) finishes the in-flight epoch, force-saves the
            # boundary even off save_interval, then re-raises the signal so
            # the scheduler/watchdog resubmits and resume continues from HERE
            # instead of the last interval save. The flag is agreed across
            # processes (delivery skews across ranks; a lone exiting rank
            # would hang the others in ZeRO-1's collective fetch).
            from ..parallel.distributed import any_process_flag

            if any_process_flag(self._preempt_signum is not None):
                if not saved:
                    self._boundary_save(epoch, val_stats)
                if self.is_main:
                    print(f"[preempt] saved epoch {epoch + 1}; exiting on "
                          f"signal {self._preempt_signum}")
                _log_jsonl(self.log_file, {
                    "run_id": self.run_id, "split": "preempt",
                    "epoch": epoch, "signal": int(self._preempt_signum or 0),
                })
                self._reraise_preempt_signal()
                return

    def evaluate(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        # keep per-batch counters on-device; one host sync at the end
        import itertools

        results = []
        host_iter = (
            itertools.islice(self.val_loader, max_steps)
            if max_steps is not None else self.val_loader
        )

        def prep(batch):
            if self._eval_buckets and "windows" in batch:
                batch = pack_view_batch(
                    batch, self._eval_buckets,
                    self.val_loader.shard_index, self.val_loader.num_shards,
                )
            return self._device_batch(batch)

        for dev_batch in device_prefetch(host_iter, prep):
            results.append(self.eval_step(self.state.params, dev_batch))
        sums: Dict[str, float] = {}
        for res in jax.device_get(results):
            for k, v in res.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        n = max(sums.pop("n", 1.0), 1.0)
        stats = {
            "probs_acc": sums.pop("probs_correct", 0.0) / n,
            "logits_acc": sums.pop("logits_correct", 0.0) / n,
            "ce_loss": sums.pop("ce_loss_sum", 0.0) / n,
        }
        for k, v in sums.items():
            stats[k.replace("_correct5", "_acc5")] = v / n
        stats["n"] = n
        if self.is_main:
            print(f"[val]   epoch {self.epoch}: {stats}")
        _log_jsonl(self.log_file, {"run_id": self.run_id, "split": "val",
                                   "epoch": self.epoch, **stats})
        if self.visualize and max_steps is None and self.is_main \
                and jax.process_count() == 1:
            # viz runs UN-jitted model math on one rank only; with global
            # sharded arrays that would require all processes (collectives),
            # so multi-process runs skip it (the metrics/ckpts carry the run)
            try:
                self._sample_events()
            except Exception as e:  # viz must never kill training
                print(f"[viz] skipped: {e}")
        return stats

    def _sample_events(self) -> None:
        """Reference EventCLIPMethod._sample_events (method.py:103-148)."""
        from ..utils.viz import visualize_samples

        n = int(self.params.get("n_samples", 5))
        if n <= 0:
            return
        spec, pp = self.pipeline
        cfg = self.cls_cfg

        def probs_fn(windows, valid):
            from ..models.classifier import classifier_forward
            from ..ops.rasterize import rasterize_for_clip

            imgs = rasterize_for_clip(spec, pp, jnp.asarray(windows))
            out = classifier_forward(
                self.state.params, cfg, imgs, jnp.asarray(valid)
            )
            return out["probs"]

        def inputs_fn(windows, valid):
            from ..ops.rasterize import rasterize_for_clip

            return rasterize_for_clip(spec, pp, jnp.asarray(windows))

        out_dir = os.path.join(self.ckpt_dir, "viz", f"epoch_{self.epoch}")
        visualize_samples(self.val_set, probs_fn, out_dir, n_samples=n,
                          inputs_fn=inputs_fn)
