"""Pallas attention kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eventclip_tpu.ops.attention import (
    _reference_attention,
    fused_qkv_attention,
    multi_head_attention,
)


@pytest.mark.parametrize("S,mask", [(33, False), (77, True)])
def test_kernel_matches_reference(rng, S, mask):
    B, H, D = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    m = None
    if mask:
        m = jnp.triu(jnp.full((S, S), -jnp.inf, dtype=jnp.float32), k=1)
    got = multi_head_attention(q, k, v, m, use_pallas=True)
    want = _reference_attention(q, k, v, m, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_reference(rng):
    B, H, S, D = 1, 2, 17, 16
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))

    def loss_pallas(q, k, v):
        return (multi_head_attention(q, k, v, use_pallas=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, None, D ** -0.5) ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_bf16_inputs(rng):
    B, H, S, D = 2, 2, 25, 32
    q = jnp.asarray(rng.normal(size=(B, H, S, D))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D))).astype(jnp.bfloat16)
    got = multi_head_attention(q, k, v, use_pallas=True)
    want = _reference_attention(q, k, v, None, D ** -0.5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("heads,dh,mask", [(4, 32, False), (2, 64, True), (3, 32, False)])
def test_fused_qkv_matches_reference(rng, heads, dh, mask):
    from eventclip_tpu.ops.attention import _qkv_reference, fused_qkv_attention

    B, S = 2, 29
    D = heads * dh
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    m = None
    if mask:
        m = jnp.triu(jnp.full((S, S), -jnp.inf, dtype=jnp.float32), k=1)
    got = fused_qkv_attention(qkv, heads, m, use_pallas=True)
    want = _qkv_reference(qkv, m, heads, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("heads,dh,mask", [
    (2, 16, False),   # multi-head-per-group kernel path
    (4, 32, True),    # masked (text tower layout)
    (3, 32, False),   # no legal tiling on TPU -> XLA fallback branch
])
def test_fused_qkv_gradients(rng, heads, dh, mask):
    from eventclip_tpu.ops.attention import _qkv_reference, fused_qkv_attention

    B, S = 2, 13
    D = heads * dh
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    m = None
    if mask:
        m = jnp.triu(jnp.full((S, S), -1e9, dtype=jnp.float32), k=1)
    gp = jax.grad(lambda x: (fused_qkv_attention(x, heads, m, use_pallas=True) ** 2).sum())(qkv)
    gr = jax.grad(lambda x: (_qkv_reference(x, m, heads, dh ** -0.5) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)


def test_fused_qkv_gradients_bf16(rng):
    """bf16 inputs keep a bf16 gradient with f32-accumulated matmuls."""
    from eventclip_tpu.ops.attention import _qkv_reference, fused_qkv_attention

    B, S, heads, dh = 1, 17, 2, 32
    D = heads * dh
    qkv32 = rng.normal(size=(B, S, 3 * D)).astype(np.float32)
    qkv = jnp.asarray(qkv32).astype(jnp.bfloat16)
    gp = jax.grad(
        lambda x: (fused_qkv_attention(x, heads, use_pallas=True)
                   .astype(jnp.float32) ** 2).sum()
    )(qkv)
    gr = jax.grad(
        lambda x: (_qkv_reference(x, None, heads, dh ** -0.5) ** 2).sum()
    )(jnp.asarray(qkv32))
    assert gp.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gp, np.float32), np.asarray(gr),
                               atol=0.15, rtol=0.15)


def test_masked_gradients_match_reference(rng):
    """Head-split variant: masked backward through the Pallas kernel."""
    B, H, S, D = 1, 2, 11, 16
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    m = jnp.triu(jnp.full((S, S), -1e9, dtype=jnp.float32), k=1)

    gp = jax.grad(
        lambda *a: (multi_head_attention(*a, m, use_pallas=True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda *a: (_reference_attention(*a, m, D ** -0.5) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mask_cotangent_matches_reference(rng):
    """A differentiable additive mask (e.g. a trainable attention bias)
    must receive the TRUE gradient through the Pallas custom_vjp paths —
    an earlier version silently returned zeros, so a learnable bias would
    never train on the kernel path while training fine on the einsum path."""
    B, H, S, D = 2, 2, 9, 16
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(S, S)).astype(np.float32))

    gp = jax.grad(
        lambda mm: (multi_head_attention(q, k, v, mm,
                                         use_pallas=True) ** 2).sum()
    )(m)
    gr = jax.grad(
        lambda mm: (_reference_attention(q, k, v, mm, D ** -0.5) ** 2).sum()
    )(m)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gp).max()) > 0  # the zero-cotangent regression

    # fused-qkv layout too
    heads = H
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * H * D)).astype(np.float32))
    gp2 = jax.grad(
        lambda mm: (fused_qkv_attention(qkv, heads, mm,
                                        use_pallas=True) ** 2).sum()
    )(m)
    gr2 = jax.grad(
        lambda mm: (fused_qkv_attention(qkv, heads, mm,
                                        use_pallas=False) ** 2).sum()
    )(m)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gr2),
                               atol=1e-4, rtol=1e-4)
