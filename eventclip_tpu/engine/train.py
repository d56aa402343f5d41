"""Mesh-sharded train / eval steps.

Replaces the reference's nerv BaseMethod train loop + PyTorch DDP
(method.py, scripts/sbatch_run.sh:48-53) with a single jit-compiled step over
a ('data', 'model') mesh: the batch is sharded over the data axis, parameters
follow eventclip_tpu.parallel.param_pspecs, and every collective (gradient
all-reduce, TP reduces, eval-metric sums) is inserted by GSPMD from the
sharding annotations.

Mixed precision: master parameters live in float32; activations run in the
classifier's configured dtype (bfloat16 on TPU — no loss scaling needed,
unlike the reference's fp16 AMP, train.py:141-142).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.classifier import (
    ClassifierConfig,
    classifier_forward,
    train_loss,
)

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jnp.ndarray  # i32 scalar
    params: Params
    opt_state: Any
    rng: jax.Array


def create_train_state(
    params: Params, tx: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )


def _batch_images(batch, pipeline, augment_rng=None, mesh=None):
    """Resolve model inputs: either precomputed 'img' or on-device
    rasterization of raw event 'windows' (the TPU-native hot path).
    `mesh` routes multi-device rasterization through shard_map so the
    fused Pallas histogram serves every shard (ops/rasterize.py)."""
    if "img" in batch:
        return batch["img"]
    spec, pp = pipeline
    if augment_rng is not None:
        from ..ops.rasterize import rasterize_augment_for_clip

        return rasterize_augment_for_clip(spec, pp, batch["windows"],
                                          augment_rng, mesh=mesh)
    from ..ops.rasterize import rasterize_for_clip

    return rasterize_for_clip(spec, pp, batch["windows"], mesh=mesh)


def make_train_step(
    cfg: ClassifierConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_weights: Optional[Dict[str, float]] = None,
    pipeline=None,
    augment: bool = False,
    accum_steps: int = 1,
    zero1: bool = False,
):
    """Build the jitted, sharded train step: (state, batch) -> (state, metrics).

    batch: {'img': [B,T,3,S,S] f32 | 'windows': [B,T,N,4] f32,
            'valid_mask': [B,T] bool, 'label': [B] i32}
    pipeline: optional (RasterSpec, ClipPreprocess) enabling the fused
        on-device events->image path. augment=True additionally applies
        on-device RandAugment (the config's img_aug).
    accum_steps > 1 enables gradient accumulation: one optimizer update
        per call, gradients averaged over accum_steps sequential
        microbatches via lax.scan. Batch leaves must then arrive shaped
        [accum_steps, B/accum_steps, ...] with dim 1 sharded
        (shard_batch(..., microbatched=True)); the host reshapes because
        splitting a sharded dim inside jit would reshard. This is how a
        config's global batch (e.g. the reference's 128-on-4-GPUs,
        configs/ftclip/ft_text_fsclip_nin_params.py:8) fits on fewer or
        smaller chips: same update math, 1/accum the activation memory.

    Sharding note: the step is NOT annotated with explicit in/out shardings —
    parameters and batches arrive already placed (shard_params/shard_batch)
    and GSPMD propagates their layouts through the step, which keeps the
    multi-chip program identical while avoiding per-leaf sharding
    set-up overhead on every dispatch (measured 35x step overhead on the
    remote-TPU runtime with ~500 explicit leaf shardings). Tensor
    parallelism (mesh model axis > 1) additionally routes the attention
    core through a shard_map so the Pallas kernel runs per-shard.

    zero1 on >1-device meshes additionally pins the ZeRO-1 layout inside the
        step: the updated optimizer moments are constrained to stay sharded
        over the data axis (parallel.sharding.zero1_pspecs) and the updated
        parameters to their canonical replicated/TP layout, so GSPMD
        all-gathers only the per-shard parameter delta and the persistent
        Adam state never rematerializes replicated. The state must arrive
        placed by shard_opt_state. In-step constraints (not explicit jit
        shardings) keep the zero-dispatch-overhead property above.
    """
    from ..parallel.sharding import make_tp_context

    tp = make_tp_context(mesh)
    zero1_mesh = mesh if (zero1 and mesh.devices.size > 1) else None
    raster_mesh = mesh if mesh.devices.size > 1 else None
    del mesh  # shardings flow from the input arrays
    loss_weights = dict(loss_weights or {})

    def loss_fn(params, batch, rng):
        rng_aug, rng = jax.random.split(rng)
        imgs = _batch_images(
            batch, pipeline, augment_rng=rng_aug if augment else None,
            mesh=raster_mesh,
        )
        out = classifier_forward(
            params, cfg, imgs, batch["valid_mask"], train=True, rng=rng,
            tp=tp,
        )
        losses = train_loss(cfg, out, batch["label"])
        # nerv convention: total = sum(loss * params.<name>_w)
        total = sum(
            v * loss_weights.get(k, 1.0) for k, v in losses.items()
        )
        losses["total_loss"] = total
        losses["train_acc"] = (out["probs"].argmax(-1) == batch["label"]).mean()
        return total, losses

    accum = int(accum_steps)
    assert accum >= 1, accum

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(state.rng, state.step)
        if accum == 1:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        else:
            # mean gradient over accum sequential microbatches; the scan
            # reuses one compiled body, and only one microbatch's
            # activations are ever live (plus the f32 accumulator, which
            # is no bigger than the grads the accum=1 path materializes)
            def body(g_acc, xs):
                mb, r = xs
                g, m = jax.grad(loss_fn, has_aux=True)(state.params, mb, r)
                return jax.tree_util.tree_map(jnp.add, g_acc, g), m

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params
            )
            grads, ms = jax.lax.scan(
                body, zeros, (batch, jax.random.split(rng, accum))
            )
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            # equal microbatch sizes -> mean of per-microbatch means IS the
            # full-batch mean for every metric
            metrics = jax.tree_util.tree_map(lambda x: x.mean(0), ms)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if zero1_mesh is not None:
            # pin the ZeRO-1 layout: without these constraints GSPMD may
            # resolve the elementwise update to a replicated (or, worse,
            # params-sharded) output layout, silently trading the memory
            # win away or turning every forward into an all-gather
            from jax.sharding import NamedSharding

            from ..parallel.sharding import (
                DATA_AXIS,
                MODEL_AXIS,
                param_pspecs,
                zero1_pspecs,
            )

            n_model = zero1_mesh.shape[MODEL_AXIS]
            opt_state = jax.lax.with_sharding_constraint(
                opt_state,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(zero1_mesh, s),
                    zero1_pspecs(
                        opt_state, zero1_mesh.shape[DATA_AXIS], n_model
                    ),
                ),
            )
            params = jax.lax.with_sharding_constraint(
                params,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(zero1_mesh, s),
                    param_pspecs(params, n_model),
                ),
            )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            rng=state.rng,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(cfg: ClassifierConfig, mesh: Mesh,
                   top5: bool = False, pipeline=None):
    """Jitted eval step returning summed counters (host accumulates).

    batch adds 'sample_mask' [B] bool so ragged final batches stay static.
    Sharding flows from the input arrays (see make_train_step).
    """
    from ..parallel.sharding import make_tp_context

    tp = make_tp_context(mesh)
    raster_mesh = mesh if mesh.devices.size > 1 else None
    del mesh

    def step_fn(params, batch):
        if "view_src" in batch:
            # view-packed batch (data.loader.pack_view_batch): only the
            # real views get rasterized + encoded; each bucket size K is
            # its own compiled program
            from ..models.classifier import classifier_forward_packed
            from ..ops.rasterize import rasterize_for_clip

            spec, pp = pipeline
            # packed bucket sizes need not divide the data axis; the
            # meshed route falls back to the GSPMD formulation then
            imgs = rasterize_for_clip(spec, pp, batch["windows"],
                                      mesh=raster_mesh)
            out = classifier_forward_packed(
                params, cfg, imgs, batch["view_src"], batch["valid_mask"],
                tp=tp,
            )
        else:
            imgs = _batch_images(batch, pipeline, mesh=raster_mesh)
            out = classifier_forward(
                params, cfg, imgs, batch["valid_mask"], train=False, tp=tp
            )
        m = batch["sample_mask"].astype(jnp.float32)
        label = batch["label"]
        res = {
            "n": m.sum(),
            "probs_correct": ((out["probs"].argmax(-1) == label) * m).sum(),
            "logits_correct": ((out["logits"].argmax(-1) == label) * m).sum(),
        }
        # per-sample CE, masked (padded rows can hold NaN aggregations)
        if cfg.use_logits_loss:
            logp = jax.nn.log_softmax(out["logits"], axis=-1)
        else:
            logp = jnp.log(out["probs"] + 1e-6)
        ce = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        res["ce_loss_sum"] = jnp.where(m > 0, ce, 0.0).sum()
        if top5:
            _, idx5p = jax.lax.top_k(out["probs"], 5)
            _, idx5l = jax.lax.top_k(out["logits"], 5)
            res["probs_correct5"] = (
                (idx5p == label[:, None]).any(-1) * m
            ).sum()
            res["logits_correct5"] = (
                (idx5l == label[:, None]).any(-1) * m
            ).sum()
        return res

    return jax.jit(step_fn)
