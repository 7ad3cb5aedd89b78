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


def test_flash_grad_matches_xla():
    rng = np.random.default_rng(1)
    B, h, Sq, Skv, d = 1, 2, 64, 96, 32
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)

    def loss_flash(q, k, v):
        with pa.pltpu.force_tpu_interpret_mode():
            return pa.flash_mha(q, k, v).sum()

    def loss_ref(q, k, v):
        return pa._xla_reference(q, k, v, kv_head0_only=False, sm_scale=1.0 / np.sqrt(d)).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
