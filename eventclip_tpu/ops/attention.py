"""Pallas TPU attention kernels (VMEM-resident scores), forward + backward.

The CLIP towers' sequences are short (ViT-L/14: 257 patch tokens; text: 77),
so an entire per-(batch, head) attention — scores [S, S] included — fits in
VMEM. The XLA fallback materializes the [B, H, S, S] probability tensor in
HBM twice per layer (~24 GB of traffic for a ViT-L/14 forward at B=64, more
than the model's entire FLOP time at HBM speed); these kernels compute
scores -> softmax -> @v (forward) and the full dq/dk/dv recompute (backward)
in one VMEM-resident program per (batch, head-group), so only q, k, v and
the gradients ever touch HBM.

The backward recomputes scores/softmax from (q, k) inside the kernel — the
standard memory-free formula:

    p  = softmax(q k^T * scale + mask)
    dv = p^T g
    dp = g v^T
    ds = p * (dp - rowsum(dp * p))
    dq = ds k * scale,   dk = ds^T q * scale

so no [B, H, S, S] tensor is ever written to HBM in training either (the
round-1 backward was plain XLA and re-materialized it).

On non-TPU backends (tests, CPU smoke runs) the kernels run in interpret
mode automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is always importable in this image
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # NOTE: keep the softmax-attention math here in lockstep with
    # _qkv_kernel below — the backward already unifies both layouts
    # through one _bwd_kernel, but the forwards are separate kernels
    # (different ref layouts); a numerics change applied to one must be
    # applied to the other
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [S, S]
    if mask_ref is not None:
        scores = scores + mask_ref[:]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    attn = (p / s).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref,
                dq_ref, dk_ref, dv_ref, *, scale, dh, per):
    """Recompute-softmax backward for one (batch, head-group) program.

    All operands live in VMEM; the [S, S] probability matrix exists only in
    registers/VMEM and is never written to HBM.
    """
    for j in range(per):
        sl = slice(j * dh, (j + 1) * dh)
        q = q_ref[0, :, sl]  # [S, dh]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [S, S] f32
        if mask_ref is not None:
            s = s + mask_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # f32 [Sq, Sk]
        pq = p.astype(q.dtype)
        # dv[k, d] = sum_q p[q, k] g[q, d]
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pq, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dp[q, k] = sum_d g[q, d] v[k, d]
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        ds = (ds * scale).astype(q.dtype)
        # dq[q, d] = sum_k ds[q, k] k[k, d]
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        # dk[k, d] = sum_q ds[q, k] q[q, d]
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _attention_forward(q, k, v, mask, scale):
    B, H, S, D = q.shape
    interpret = jax.default_backend() != "tpu"

    def spec():
        return pl.BlockSpec(
            (1, S, D), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        )

    in_specs = [spec(), spec(), spec()]
    args = [q.reshape(B * H, S, D), k.reshape(B * H, S, D),
            v.reshape(B * H, S, D)]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (S, S), lambda i: (0, 0),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        ))
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _attn_kernel(
                qr, kr, vr, None, orf, **kw
            ),
            scale=scale,
        )

    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, D), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, S, D)


def _reference_attention(q, k, v, mask, scale):
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention(q, k, v, mask, scale):
    return _attention_forward(q, k, v, mask, scale)


def _attention_fwd(q, k, v, mask, scale):
    return _attention_forward(q, k, v, mask, scale), (q, k, v, mask)


def _attention_bwd_xla(scale, res, g):
    """Plain-XLA recompute backward (fallback when no legal kernel tiling)."""
    q, k, v, mask = res
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", attn, gf,
                    preferred_element_type=jnp.float32)
    dattn = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    dscores = attn * (dattn - (dattn * attn).sum(-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dscores, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dscores, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    # the additive mask broadcasts over (batch, head): its cotangent is the
    # dscores sum — a silently-zero cotangent would make a trainable
    # attention bias never learn on this path while the einsum path does
    dmask = None if mask is None else \
        dscores.sum(axis=(0, 1)).astype(mask.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dmask


def _mask_cotangent(q, k, v, mask, g, scale):
    """dL/dmask for the Pallas backward paths. Delegates to the XLA
    recompute backward (one copy of the softmax-VJP math); under jit the
    unused dq/dk/dv are dead-code-eliminated. Only runs when a mask is
    present — the text tower, S <= context_length — where the [B, H, S, S]
    intermediate is tiny; the mask-free ViT path never pays for it."""
    return _attention_bwd_xla(scale, (q, k, v, mask), g)[3]


def _bwd_pallas_call(args, mask, grid, in_spec_fns, out_shape, out_spec_fn,
                     *, scale, dh, per, interpret):
    """Shared pallas_call assembly for both backward layouts."""
    mem = pltpu.VMEM if pltpu and not interpret else None
    in_specs = [
        pl.BlockSpec(shape, idx, memory_space=mem)
        for shape, idx in in_spec_fns
    ]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            mask.shape, lambda *_: (0,) * mask.ndim, memory_space=mem
        ))
        args = args + [mask.astype(jnp.float32)]
        kernel = functools.partial(_bwd_kernel, scale=scale, dh=dh, per=per)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, gr, dqr, dkr, dvr, **kw: _bwd_kernel(
                qr, kr, vr, gr, None, dqr, dkr, dvr, **kw
            ),
            scale=scale, dh=dh, per=per,
        )
    out_spec = pl.BlockSpec(out_spec_fn[0], out_spec_fn[1], memory_space=mem)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(*args)


def _attention_bwd(scale, res, g):
    q, k, v, mask = res
    B, H, S, D = q.shape
    interpret = jax.default_backend() != "tpu"
    flat = lambda t: t.reshape(B * H, S, D)  # noqa: E731
    spec = ((1, S, D), lambda i: (i, 0, 0))
    dq, dk, dv = _bwd_pallas_call(
        [flat(q), flat(k), flat(v), flat(g)], mask,
        grid=(B * H,),
        in_spec_fns=[spec, spec, spec, spec],
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        out_spec_fn=spec,
        scale=scale, dh=D, per=1, interpret=interpret,
    )
    dmask = None if mask is None else _mask_cotangent(q, k, v, mask, g,
                                                      scale)
    unflat = lambda t: t.reshape(B, H, S, D)  # noqa: E731
    return unflat(dq), unflat(dk), unflat(dv), dmask


_attention.defvjp(_attention_fwd, _attention_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """[B, H, S, D] q/k/v (+ optional additive [S, S] mask) -> [B, H, S, D]."""
    scale = q.shape[-1] ** -0.5
    if not use_pallas:
        return _reference_attention(q * 1.0, k, v, mask, scale)
    return _attention(q, k, v, mask, scale)


# ---------------------------------------------------------------------------
# fused-qkv layout (no head-split transposes)
# ---------------------------------------------------------------------------
#
# The towers produce attention inputs as one [B, S, 3D] tensor (fused qkv
# projection). Splitting into [B, H, S, D] costs ~8 full-tensor relayouts per
# layer on TPU; this variant instead grids over (batch, head-group) and lets
# the BlockSpec index map slice each head's columns straight out of the qkv
# tensor (head groups of 128/dh heads keep the lane-dim blocking legal).


def _qkv_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, dh, per):
    for j in range(per):
        q = q_ref[0, :, j * dh:(j + 1) * dh]
        k = k_ref[0, :, j * dh:(j + 1) * dh]
        v = v_ref[0, :, j * dh:(j + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if mask_ref is not None:
            s = s + mask_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, j * dh:(j + 1) * dh] = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _head_group(heads: int, dh: int) -> Optional[int]:
    """Heads per program s.t. the block's lane dim (dh*per) is a multiple of
    128 (Mosaic block constraint); None if no divisor of `heads` works."""
    for per in range(1, heads + 1):
        if heads % per == 0 and (dh * per) % 128 == 0:
            return per
    return None


def _qkv_attention_forward(qkv, mask, heads, scale):
    B, S, D3 = qkv.shape
    D = D3 // 3
    dh = D // heads
    interpret = jax.default_backend() != "tpu"
    per = _head_group(heads, dh) if not interpret else max(128 // dh, 1)
    if per is None or (not interpret and heads % per != 0):
        # tiny/debug towers: no legal block tiling; XLA path is fine there
        return _qkv_reference(qkv, mask, heads, scale)
    if interpret and heads % per != 0:
        per = 1
    G = heads // per
    bw = dh * per

    def spec(third):
        return pl.BlockSpec(
            (1, S, bw), lambda b, g, third=third: (b, 0, third * G + g),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        )

    in_specs = [spec(0), spec(1), spec(2)]
    args = [qkv, qkv, qkv]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (S, S), lambda b, g: (0, 0),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        ))
        args.append(mask.astype(jnp.float32))
        kernel = functools.partial(_qkv_kernel, scale=scale, dh=dh, per=per)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _qkv_kernel(qr, kr, vr, None, orf,
                                                      **kw),
            scale=scale, dh=dh, per=per,
        )
    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, bw), lambda b, g: (b, 0, g),
            memory_space=pltpu.VMEM if pltpu and not interpret else None,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        interpret=interpret,
    )(*args)


def _split_heads(qkv, heads):
    B, S, D3 = qkv.shape
    D = D3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(B, S, heads, D // heads).transpose(0, 2, 1, 3)

    return split(q), split(k), split(v)


def _qkv_reference(qkv, mask, heads, scale):
    B, S, D3 = qkv.shape
    D = D3 // 3
    q, k, v = _split_heads(qkv, heads)
    out = _reference_attention(q, k, v, mask, scale)
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _qkv_attention(qkv, mask, heads, scale):
    return _qkv_attention_forward(qkv, mask, heads, scale)


def _qkv_attention_fwd(qkv, mask, heads, scale):
    return _qkv_attention_forward(qkv, mask, heads, scale), (qkv, mask)


def _qkv_attention_bwd(heads, scale, res, g):
    """Backward in the fused-qkv layout: dqkv sliced straight out of the
    kernel per (batch, head-group), no [B, H, S, dh] relayouts."""
    qkv, mask = res
    B, S, D3 = qkv.shape
    D = D3 // 3
    dh = D // heads
    interpret = jax.default_backend() != "tpu"
    per = _head_group(heads, dh) if not interpret else max(128 // dh, 1)
    if per is None or heads % per != 0:
        if not interpret:
            # tiny/debug towers: no legal block tiling; XLA path
            q, k, v = _split_heads(qkv, heads)
            gh = g.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
            dq, dk, dv, dmask = _attention_bwd_xla(
                scale, (q, k, v, mask), gh
            )

            def merge(t):
                return t.transpose(0, 2, 1, 3).reshape(B, S, D)

            dqkv = jnp.concatenate(
                [merge(dq), merge(dk), merge(dv)], axis=-1
            )
            return dqkv.astype(qkv.dtype), dmask
        per = 1
    G = heads // per
    bw = dh * per

    def spec(third):
        return ((1, S, bw), lambda b, gg, third=third: (b, 0, third * G + gg))

    g_spec = ((1, S, bw), lambda b, gg: (b, 0, gg))
    dq, dk, dv = _bwd_pallas_call(
        [qkv, qkv, qkv, g], mask,
        grid=(B, G),
        in_spec_fns=[spec(0), spec(1), spec(2), g_spec],
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        out_spec_fn=g_spec,
        scale=scale, dh=dh, per=per, interpret=interpret,
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    if mask is None:
        dmask = None
    else:
        qh, kh, vh = _split_heads(qkv, heads)
        gh = g.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        dmask = _mask_cotangent(qh, kh, vh, mask, gh, scale)
    return dqkv.astype(qkv.dtype), dmask


_qkv_attention.defvjp(_qkv_attention_fwd, _qkv_attention_bwd)


def fused_qkv_attention(
    qkv: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """[B, S, 3D] fused qkv (+ optional [S, S] mask) -> [B, S, D]."""
    D = qkv.shape[-1] // 3
    scale = (D // heads) ** -0.5
    if not use_pallas:
        return _qkv_reference(qkv * 1.0, mask, heads, scale)
    return _qkv_attention(qkv, mask, heads, scale)


def tp_fused_qkv_attention(
    qkv: jnp.ndarray,
    heads: int,
    tp,
    *,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Tensor-parallel attention over a ('data', 'model') mesh.

    qkv is [B, S, 3, D] with D sharded over the model axis in whole-head
    groups (parallel/sharding.py lays wqkv out as [L, 3, D, D] sharded on
    dim -2, so the projection einsum yields exactly this sharding). Each
    shard runs the Pallas kernel on its local heads via shard_map — no
    gather of q/k/v ever happens; the attention output stays sharded on D
    for the row-parallel out-projection that follows (Megatron pattern).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = tp.n_model
    assert heads % n == 0, (heads, n)

    def local(qkv_local):
        B, S, _, Dl = qkv_local.shape
        flat = qkv_local.reshape(B, S, 3 * Dl)
        return fused_qkv_attention(flat, heads // n,
                                   use_pallas=use_pallas)

    return shard_map(
        local,
        mesh=tp.mesh,
        in_specs=P(tp.data_axis, None, None, tp.model_axis),
        out_specs=P(tp.data_axis, None, tp.model_axis),
        check_vma=False,
    )(qkv)
