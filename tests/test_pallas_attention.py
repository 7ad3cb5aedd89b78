"""Flash item-attention kernel vs XLA einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.ops import pallas_attention as pa


def _run_case(B, h, Sq, Skv, d, kv_head0_only, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), dtype)
    h_kv = 1 if kv_head0_only else h
    k = jnp.asarray(rng.normal(size=(B, h_kv, Skv, d)), dtype)
    v = jnp.asarray(rng.normal(size=(B, h_kv, Skv, d)), dtype)
    want = pa._xla_reference(q, k, v, kv_head0_only=kv_head0_only, sm_scale=1.0 / np.sqrt(d))
    with pa.pltpu.force_tpu_interpret_mode():
        got = pa.flash_mha(q, k, v, kv_head0_only)
    return np.asarray(got), np.asarray(want)


@pytest.mark.parametrize(
    "B,h,Sq,Skv,kv_head0_only",
    [
        (2, 3, 128, 256, False),
        (2, 3, 100, 300, False),  # non-multiple-of-block lengths
        (1, 6, 60, 200, True),  # multiquery test-block
        (2, 2, 257, 513, False),  # crosses block boundaries
    ],
)
def test_flash_matches_xla(B, h, Sq, Skv, kv_head0_only):
    got, want = _run_case(B, h, Sq, Skv, 32, kv_head0_only, jnp.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "B,h,Sq,Skv,kv_head0_only",
    [
        (1, 2, 64, 96, False),
        (2, 3, 100, 300, False),  # non-multiple-of-block lengths -> padded bwd
        (1, 6, 60, 200, True),  # multiquery: dk/dv sum over folded query heads
        (2, 2, 257, 513, False),  # crosses block boundaries
    ],
)
def test_flash_grad_matches_xla(B, h, Sq, Skv, kv_head0_only):
    rng = np.random.default_rng(1)
    d = 32
    h_kv = 1 if kv_head0_only else h
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, h_kv, Skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, h_kv, Skv, d)), jnp.float32)
    # weighted sum so every output position gets a distinct cotangent
    w = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)

    def loss_flash(q, k, v):
        return (pa.flash_mha(q, k, v, kv_head0_only) * w).sum()

    def loss_ref(q, k, v):
        return (
            pa._xla_reference(
                q, k, v, kv_head0_only=kv_head0_only, sm_scale=1.0 / np.sqrt(d)
            )
            * w
        ).sum()

    with pa.pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kv_head0_only", [False, True])
def test_mha_flash_branch_matches_xla_branch(kv_head0_only):
    """The native transposed-layout wiring in ops.attention.mha (projection
    einsums emitting (..., d, s), head-fold for multiquery) must match the
    einsum path bit-for-tolerance."""
    from multimodalpfn_tpu.ops.attention import mha

    rng = np.random.default_rng(7)
    lead, Sq, Skv, E, h, d = (2, 3), 70, 200, 48, 4, 12
    x_q = jnp.asarray(rng.normal(size=lead + (Sq, E)), jnp.float32)
    x_kv = jnp.asarray(rng.normal(size=lead + (Skv, E)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(3, h, d, E)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(h, d, E)) * 0.1, jnp.float32)

    want = mha(x_q, x_kv, w_qkv, w_out, kv_head0_only=kv_head0_only)
    with pa.pltpu.force_tpu_interpret_mode():
        got = mha(
            x_q, x_kv, w_qkv, w_out, kv_head0_only=kv_head0_only, use_flash=True
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_rolled_chunk_loop_matches_xla():
    """Force n_chunks > UNROLL_LIMIT so the lax.fori_loop path (used at the 10k
    official sample limit, where unrolling stack-OOMs VMEM) is exercised."""
    rng = np.random.default_rng(3)
    B, h, Sq, Skv, d = 1, 2, 64, 1200, 32
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    want = pa._xla_reference(q, k, v, kv_head0_only=False, sm_scale=1.0 / np.sqrt(d))

    def loss(q, k, v):
        return (pa.flash_mha(q, k, v, False, None, 256, 128) ** 2).sum()

    with pa.pltpu.force_tpu_interpret_mode():
        got = pa.flash_mha(q, k, v, False, None, 256, 128)
        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v):
        return (
            pa._xla_reference(q, k, v, kv_head0_only=False, sm_scale=1.0 / np.sqrt(d))
            ** 2
        ).sum()

    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
