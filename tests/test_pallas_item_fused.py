"""Fused item-attention (in-kernel projections) vs the XLA einsum path
(interpret mode on CPU): forward, gradients, vmap, and edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalpfn_tpu.ops import pallas_item_fused as pif
from multimodalpfn_tpu.ops.attention import item_attention
from jax.experimental.pallas import tpu as pltpu


def _make(seed, lead=(2, 3), S=72, sep=48, e=16, h=2, d=8, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((*lead, S, e)), dtype)
    w_qkv = jnp.asarray(rng.standard_normal((3, h, d, e)) * 0.2, dtype)
    w_out = jnp.asarray(rng.standard_normal((h, d, e)) * 0.2, dtype)
    return x, w_qkv, w_out


def _xla(x, w_qkv, w_out, sep):
    return item_attention(
        x, w_qkv, w_out, single_eval_pos=sep, multiquery_test=True,
        compute_dtype=jnp.float32, use_flash=False,
    )


def _fused(x, w_qkv, w_out, sep):
    with pltpu.force_tpu_interpret_mode():
        return pif.fused_item_attention(
            x, w_qkv, w_out, single_eval_pos=sep,
            compute_dtype=jnp.float32,
        )


def test_forward_matches_xla():
    x, w_qkv, w_out, = _make(0)
    got = _fused(x, w_qkv, w_out, 48)
    want = _xla(x, w_qkv, w_out, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_forward_train_only():
    x, w_qkv, w_out = _make(1, S=48, sep=48)
    got = _fused(x, w_qkv, w_out, 48)
    want = _xla(x, w_qkv, w_out, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_forward_unpadded_boundary():
    # sep exactly at a chunk boundary: no masked tail chunk in the kernel
    x, w_qkv, w_out = _make(2, S=160, sep=128)
    got = _fused(x, w_qkv, w_out, 128)
    want = _xla(x, w_qkv, w_out, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_grads_match_xla():
    x, w_qkv, w_out = _make(3)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(x.shape[:-1] + (w_out.shape[-1],)),
        jnp.float32,
    )

    def loss_fused(x, w_qkv, w_out):
        return jnp.sum(_fused(x, w_qkv, w_out, 48) * cot)

    def loss_xla(x, w_qkv, w_out):
        return jnp.sum(_xla(x, w_qkv, w_out, 48) * cot)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_qkv, w_out)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w_qkv, w_out)
    for a, b, name in zip(gf, gx, ("dx", "dw_qkv", "dw_out")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_grads_train_only():
    x, w_qkv, w_out = _make(4, S=48, sep=48)

    def loss(f):
        def inner(x, w_qkv, w_out):
            return jnp.sum(f(x, w_qkv, w_out, 48) ** 2)

        return inner

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss(_fused), argnums=(0, 1))(x, w_qkv, w_out)
    gx = jax.grad(loss(_xla), argnums=(0, 1))(x, w_qkv, w_out)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gx[0]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]), atol=5e-5)


def test_vmap_matches_per_run():
    """The sweep path vmaps runs over a leading axis with per-run weights."""
    xs, ws, wo = [], [], []
    for seed in (10, 11):
        x, w_qkv, w_out = _make(seed, lead=(2,))
        xs.append(x)
        ws.append(w_qkv)
        wo.append(w_out)
    xs = jnp.stack(xs)
    ws = jnp.stack(ws)
    wo = jnp.stack(wo)

    def one(x, w_qkv, w_out):
        return pif.fused_item_attention(
            x, w_qkv, w_out, single_eval_pos=48, compute_dtype=jnp.float32
        )

    with pltpu.force_tpu_interpret_mode():
        batched = jax.vmap(one)(xs, ws, wo)
        singles = jnp.stack([one(xs[i], ws[i], wo[i]) for i in range(2)])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(singles), atol=2e-5
    )


def test_vmap_grads_match_per_run():
    xs, ws, wo = [], [], []
    for seed in (12, 13):
        x, w_qkv, w_out = _make(seed, lead=(2,))
        xs.append(x)
        ws.append(w_qkv)
        wo.append(w_out)
    xs, ws, wo = jnp.stack(xs), jnp.stack(ws), jnp.stack(wo)

    def one_loss(x, w_qkv, w_out):
        return jnp.sum(
            pif.fused_item_attention(
                x, w_qkv, w_out, single_eval_pos=48,
                compute_dtype=jnp.float32,
            )
            ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        gb = jax.vmap(jax.grad(one_loss, argnums=(0, 1)))(xs, ws, wo)
        gs = [jax.grad(one_loss, argnums=(0, 1))(xs[i], ws[i], wo[i]) for i in range(2)]
    for j in range(2):
        np.testing.assert_allclose(
            np.asarray(gb[j]),
            np.asarray(jnp.stack([gs[0][j], gs[1][j]])),
            atol=5e-5,
        )


def test_dispatch_in_item_attention():
    """item_attention routes to the fused kernel when fused_item is set and
    the shape qualifies; result matches the XLA path."""
    x, w_qkv, w_out = _make(5, lead=(2,), S=600, sep=512, e=16, h=2, d=8)
    want = _xla(x, w_qkv, w_out, 512)
    with pltpu.force_tpu_interpret_mode():
        got = item_attention(
            x, w_qkv, w_out, single_eval_pos=512, multiquery_test=True,
            compute_dtype=jnp.float32, use_flash=True, fused_item=True,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _xla_sublayer(x, w_qkv, w_out, sep):
    from multimodalpfn_tpu.models.transformer import residual_ln

    h = _xla(x, w_qkv, w_out, sep)
    return residual_ln(x, h)


def test_sublayer_forward_matches_xla():
    # S deliberately not a block multiple: exercises the epilogue tail mask
    x, w_qkv, w_out = _make(20, lead=(3,), S=70, sep=48)
    with pltpu.force_tpu_interpret_mode():
        got = pif.fused_item_sublayer(
            x, w_qkv, w_out, single_eval_pos=48, compute_dtype=jnp.float32
        )
    want = _xla_sublayer(x, w_qkv, w_out, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sublayer_grads_match_xla():
    x, w_qkv, w_out = _make(21, lead=(2,), S=70, sep=48)
    cot = jnp.asarray(
        np.random.default_rng(5).standard_normal(x.shape), jnp.float32
    )

    def loss_fused(x, w_qkv, w_out):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                pif.fused_item_sublayer(
                    x, w_qkv, w_out, single_eval_pos=48,
                    compute_dtype=jnp.float32,
                )
                * cot
            )

    def loss_xla(x, w_qkv, w_out):
        return jnp.sum(_xla_sublayer(x, w_qkv, w_out, 48) * cot)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_qkv, w_out)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w_qkv, w_out)
    for a, b, name in zip(gf, gx, ("dx", "dw_qkv", "dw_out")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_sublayer_vmap_grads_match_per_run():
    """The sweep path vmaps the whole sublayer with per-run weights."""
    xs, ws, wo = [], [], []
    for seed in (30, 31):
        x, w_qkv, w_out = _make(seed, lead=(2,), S=70, sep=48)
        xs.append(x)
        ws.append(w_qkv)
        wo.append(w_out)
    xs, ws, wo = jnp.stack(xs), jnp.stack(ws), jnp.stack(wo)

    def one_loss(x, w_qkv, w_out):
        return jnp.sum(
            pif.fused_item_sublayer(
                x, w_qkv, w_out, single_eval_pos=48,
                compute_dtype=jnp.float32,
            )
            ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        gb = jax.vmap(jax.grad(one_loss, argnums=(0, 1, 2)))(xs, ws, wo)
        gs = [
            jax.grad(one_loss, argnums=(0, 1, 2))(xs[i], ws[i], wo[i])
            for i in range(2)
        ]
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(gb[j]),
            np.asarray(jnp.stack([gs[0][j], gs[1][j]])),
            atol=5e-5,
        )


def test_dispatch_falls_back_below_threshold():
    """Small sep or non-multiquery must not hit the fused kernel (no Pallas
    call is traced — runs fine without interpret mode on CPU)."""
    x, w_qkv, w_out = _make(6)
    out = item_attention(
        x, w_qkv, w_out, single_eval_pos=48, multiquery_test=True,
        compute_dtype=jnp.float32, use_flash=False, fused_item=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla(x, w_qkv, w_out, 48)), atol=1e-6
    )


def test_sublayer_bf16_close_to_f32_reference():
    """bf16 production parity across the dispatch gate (ADVICE r3): the fused
    epilogue forms the residual as f32 x + f32 out-projection while the
    unfused path (`residual_ln`) sums in the compute dtype — in bf16 the two
    dispatches differ by ~1 bf16 ulp of rounding, never more. Pin both
    against the f32 reference at bf16 tolerance so a real numeric break
    (wrong scale/layout) cannot hide behind the dtype."""
    x, w_qkv, w_out = _make(22, lead=(2,), S=70, sep=48)
    want = np.asarray(_xla_sublayer(x, w_qkv, w_out, 48))

    xb = x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got_fused = pif.fused_item_sublayer(
            xb, w_qkv, w_out, single_eval_pos=48, compute_dtype=jnp.bfloat16
        )
    from multimodalpfn_tpu.models.transformer import residual_ln
    from multimodalpfn_tpu.ops.attention import item_attention

    h = item_attention(
        xb, w_qkv, w_out, single_eval_pos=48, multiquery_test=True,
        compute_dtype=jnp.bfloat16, use_flash=False,
    )
    got_unfused = residual_ln(xb, h)

    # LN output is O(1); bf16 has ~2-3 decimal digits -> atol 0.06 covers
    # accumulated rounding while catching any structural error
    np.testing.assert_allclose(
        np.asarray(got_fused, np.float32), want, atol=0.06, rtol=0.03
    )
    np.testing.assert_allclose(
        np.asarray(got_unfused, np.float32), want, atol=0.06, rtol=0.03
    )
