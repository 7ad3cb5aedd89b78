"""Fused row-local sublayer kernels (ops/pallas_fused.py) vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.models.transformer import encoder_layer


def test_fused_mlp_and_attention_match_xla():
    from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp
    from multimodalpfn_tpu.ops.attention import self_attention
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln,
        fused_mlp_ln,
    )

    rng = np.random.default_rng(0)
    b, S, t, e, h, d, H = 2, 9, 13, 32, 4, 8, 64  # odd t exercises sublane pad
    x = jnp.asarray(rng.normal(size=(b, S, t, e)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(e, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, e)) * 0.1, jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(h, d, e)) * 0.1, jnp.float32)

    want_mlp = _layer_norm(x + _mlp(x, w1, w2, jnp.float32))
    want_attn = _layer_norm(
        x + self_attention(x, w_qkv, w_out, compute_dtype=jnp.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got_mlp = fused_mlp_ln(x, w1, w2, block_rows=16)
        got_attn = fused_feature_attention_ln(x, w_qkv, w_out, block_rows=16)
    np.testing.assert_allclose(
        np.asarray(got_mlp), np.asarray(want_mlp), rtol=3e-6, atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), rtol=3e-6, atol=3e-6
    )


def test_encoder_layer_fused_matches_xla():
    """The full encoder layer with cfg.fused_ops must equal the XLA layer."""
    cfg = ModelConfig(
        emsize=32, nhead=4, nhid_factor=2, nlayers=1, n_out=4, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    # densify the zero-init output projections so attention actually mixes
    key = jax.random.PRNGKey(5)
    leaves, tdef = jax.tree_util.tree_flatten(layer0)
    layer0 = jax.tree_util.tree_unflatten(
        tdef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, jax.random.split(key, len(leaves)))],
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 40, 7, cfg.emsize)), jnp.float32)

    want = encoder_layer(x, layer0, single_eval_pos=30, cfg=cfg)
    with pltpu.force_tpu_interpret_mode():
        got = encoder_layer(
            x, layer0, single_eval_pos=30, cfg=cfg.replace(fused_ops=True)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-6)


def test_fused_backward_matches_xla_grads():
    """The custom-VJP Pallas backwards (dx + all weight grads) vs jax.grad of
    the XLA formulation."""
    from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp
    from multimodalpfn_tpu.ops.attention import self_attention
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln,
        fused_mlp_ln,
    )

    rng = np.random.default_rng(1)
    b, S, t, e, h, d, H = 2, 9, 13, 32, 4, 8, 64
    x = jnp.asarray(rng.normal(size=(b, S, t, e)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(e, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, e)) * 0.1, jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(h, d, e)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, S, t, e)), jnp.float32)

    def l_ref_mlp(x, w1, w2):
        return jnp.sum(_layer_norm(x + _mlp(x, w1, w2, jnp.float32)) * g)

    def l_fused_mlp(x, w1, w2):
        return jnp.sum(fused_mlp_ln(x, w1, w2, block_rows=16) * g)

    def l_ref_attn(x, wqkv, wout):
        return jnp.sum(
            _layer_norm(x + self_attention(x, wqkv, wout, compute_dtype=jnp.float32)) * g
        )

    def l_fused_attn(x, wqkv, wout):
        return jnp.sum(fused_feature_attention_ln(x, wqkv, wout, block_rows=16) * g)

    with pltpu.force_tpu_interpret_mode():
        gr = jax.grad(l_ref_mlp, argnums=(0, 1, 2))(x, w1, w2)
        gf = jax.grad(l_fused_mlp, argnums=(0, 1, 2))(x, w1, w2)
        for a, b_ in zip(gr, gf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=6e-6
            )
        gr = jax.grad(l_ref_attn, argnums=(0, 1, 2))(x, w_qkv, w_out)
        gf = jax.grad(l_fused_attn, argnums=(0, 1, 2))(x, w_qkv, w_out)
        for a, b_ in zip(gr, gf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=6e-6
            )


@pytest.mark.slow  # 56 s: full-layer grad parity; the per-kernel backward
# and vmapped-grad tests cover the fused VJPs in the fast set
def test_train_forward_grads_fused_vs_xla():
    """Whole-model value_and_grad with cfg.fused_ops vs the XLA path (no remat:
    interpret mode cannot partial-eval the Pallas callback effects under
    jax.checkpoint; the remat variant is exercised on real TPU hardware)."""
    import dataclasses

    from multimodalpfn_tpu.models.transformer import forward_train_test
    from multimodalpfn_tpu.train.losses import get_loss_fn

    cfg0 = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10, max_num_classes=10,
        compute_dtype="float32",
        mixer=MixerConfig("MGM+CAP", mgm_heads=2, cap_heads=2, in_dim=96),
    )
    params = init_params(jax.random.PRNGKey(0), cfg0, model_seed=0)
    leaves, tdef = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        tdef,
        [l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, jax.random.split(jax.random.PRNGKey(9), len(leaves)))],
    )
    rng = np.random.default_rng(0)
    b, s_tr, s_te, F = 1, 24, 8, 5
    batch = dict(
        x_train=jnp.asarray(rng.normal(size=(b, s_tr, F)), jnp.float32),
        y_train=jnp.asarray(rng.integers(0, 3, size=(b, s_tr)), jnp.float32),
        x_test=jnp.asarray(rng.normal(size=(b, s_te, F)), jnp.float32),
        y_test=jnp.asarray(rng.integers(0, 3, size=(b, s_te)), jnp.float32),
        image_train=jnp.asarray(rng.normal(size=(b, s_tr, 1, 96)), jnp.float32),
        image_test=jnp.asarray(rng.normal(size=(b, s_te, 1, 96)), jnp.float32),
    )
    loss_fn = get_loss_fn("multiclass")

    def make_loss(cfg):
        def L(p):
            logits = forward_train_test(
                p, cfg, batch["x_train"], batch["y_train"], batch["x_test"],
                batch["image_train"], batch["image_test"],
                train=True, rng=jax.random.PRNGKey(1), remat=False,
            )
            return loss_fn(logits, batch["y_test"])
        return L

    lx, gx = jax.value_and_grad(make_loss(dataclasses.replace(cfg0, fused_ops=False)))(params)
    with pltpu.force_tpu_interpret_mode():
        lf, gf = jax.value_and_grad(make_loss(dataclasses.replace(cfg0, fused_ops=True)))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_f = jax.tree_util.tree_leaves(gf)
    for a, b_ in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=5e-4, atol=1e-6)


def test_vmapped_fused_grads_match_xla():
    """The batched-cells train path vmaps the custom-VJP Pallas sublayers over
    the run axis (per-run weights). The run axis becomes a leading grid dim in
    the pallas_call; this checks the sequential dw accumulation still keys on
    the row-block axis (not the batch axis) — i.e. vmapped grads == vmapped
    XLA grads per run."""
    from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp
    from multimodalpfn_tpu.ops.attention import self_attention
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln,
        fused_mlp_ln,
    )

    rng = np.random.default_rng(7)
    G, b, S, t, e, h, d, H = 3, 1, 9, 13, 32, 4, 8, 64
    x = jnp.asarray(rng.normal(size=(G, b, S, t, e)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(G, e, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(G, H, e)) * 0.1, jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, S, t, e)), jnp.float32)

    def loss_fused(x, w1, w2, wqkv, wout):
        o = fused_feature_attention_ln(x, wqkv, wout, block_rows=16)
        o = fused_mlp_ln(o, w1, w2, block_rows=16)
        return jnp.sum(o * g)

    def loss_xla(x, w1, w2, wqkv, wout):
        o = _layer_norm(x + self_attention(x, wqkv, wout, compute_dtype=jnp.float32))
        o = _layer_norm(o + _mlp(o, w1, w2, jnp.float32))
        return jnp.sum(o * g)

    with pltpu.force_tpu_interpret_mode():
        lf, gf = jax.vmap(
            jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))
        )(x, w1, w2, w_qkv, w_out)
    lx, gx = jax.vmap(
        jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))
    )(x, w1, w2, w_qkv, w_out)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=2e-5)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-5
        )


def test_item_major_feature_attention_matches_sample_major():
    """fused_feature_attention_ln_im on (b, t, s, e) == the sample-major
    kernel on the swapaxed input — values AND grads (incl. the 2D-grid dw
    accumulation), plus a vmapped run axis (batched-cells training)."""
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln,
        fused_feature_attention_ln_im,
    )

    rng = np.random.default_rng(3)
    b, s, t, e, h, d = 2, 21, 13, 32, 4, 8  # odd s/t: tail-block + t8 masking
    x_sm = jnp.asarray(rng.normal(size=(b, s, t, e)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(h, d, e)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, s, t, e)), jnp.float32)
    x_im = jnp.swapaxes(x_sm, 1, 2)
    g_im = jnp.swapaxes(g, 1, 2)

    def loss_sm(x, wqkv, wout):
        return jnp.sum(fused_feature_attention_ln(x, wqkv, wout, block_rows=16) * g)

    def loss_im(x, wqkv, wout):
        return jnp.sum(
            fused_feature_attention_ln_im(x, wqkv, wout, block_rows=16) * g_im
        )

    with pltpu.force_tpu_interpret_mode():
        o_sm = fused_feature_attention_ln(x_sm, w_qkv, w_out, block_rows=16)
        o_im = fused_feature_attention_ln_im(x_im, w_qkv, w_out, block_rows=16)
        l_sm, g_sm = jax.value_and_grad(loss_sm, argnums=(0, 1, 2))(
            x_sm, w_qkv, w_out
        )
        l_im, gi = jax.value_and_grad(loss_im, argnums=(0, 1, 2))(
            x_im, w_qkv, w_out
        )
    np.testing.assert_allclose(
        np.asarray(o_im), np.asarray(jnp.swapaxes(o_sm, 1, 2)), rtol=1e-6
    )
    np.testing.assert_allclose(float(l_im), float(l_sm), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gi[0]), np.asarray(jnp.swapaxes(g_sm[0], 1, 2)),
        rtol=1e-4, atol=1e-5,
    )
    for a, b_ in zip(gi[1:], g_sm[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )

    # vmapped over a run axis (as fine_tune_batched vmaps the train step)
    G = 3
    xg = jnp.asarray(rng.normal(size=(G, b, t, s, e)), jnp.float32)
    wqkvg = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.1, jnp.float32)
    woutg = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.1, jnp.float32)

    def loss_one(x, wqkv, wout):
        return jnp.sum(
            fused_feature_attention_ln_im(x, wqkv, wout, block_rows=16) * g_im
        )

    def loss_one_ref(x, wqkv, wout):
        x_s = jnp.swapaxes(x, 1, 2)
        return jnp.sum(
            fused_feature_attention_ln(x_s, wqkv, wout, block_rows=16)
            * jnp.swapaxes(g_im, 1, 2)
        )

    with pltpu.force_tpu_interpret_mode():
        lv, gv = jax.vmap(jax.value_and_grad(loss_one, argnums=(0, 1, 2)))(
            xg, wqkvg, woutg
        )
        lr, gr = jax.vmap(jax.value_and_grad(loss_one_ref, argnums=(0, 1, 2)))(
            xg, wqkvg, woutg
        )
    np.testing.assert_allclose(np.asarray(lv), np.asarray(lr), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gv[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5
    )
    for a, b_ in zip(gv[1:], gr[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_masked_fused_attention_matches_xla_key_mask():
    """Per-row key-masked fused forward (cross-width member batching) equals
    the XLA path with the same mask, and equals running each member unpadded
    at its own width."""
    from multimodalpfn_tpu.models.transformer import _layer_norm
    from multimodalpfn_tpu.ops.attention import self_attention
    from multimodalpfn_tpu.ops.pallas_fused import fused_feature_attention_ln

    rng = np.random.default_rng(1)
    b, S, t, e, h, d = 3, 9, 13, 32, 4, 8
    x = jnp.asarray(rng.normal(size=(b, S, t, e)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(h, d, e)) * 0.1, jnp.float32)
    # per-member valid widths: member i keeps tokens [0, w_i) plus the last
    # (y) token — a middle gap, not a prefix
    widths = np.array([12, 8, 10])  # ≤ t-1: slot t-1 is the always-valid y token
    mask_np = np.zeros((b, t), np.bool_)
    for i, w in enumerate(widths):
        mask_np[i, :w] = True
        mask_np[i, -1] = True
    key_mask = jnp.asarray(mask_np)

    want = _layer_norm(
        x
        + self_attention(
            x, w_qkv, w_out, compute_dtype=jnp.float32,
            key_mask=key_mask[:, None, None, None, :],
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got = fused_feature_attention_ln(
            x, w_qkv, w_out, key_mask=key_mask[:, None, :], block_rows=8
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-6
    )
    # valid token slots must also equal the unpadded per-member run
    for i, w in enumerate(widths):
        keep = np.r_[np.arange(w), t - 1]
        xi = x[i : i + 1, :, keep, :]
        want_i = _layer_norm(
            xi + self_attention(xi, w_qkv, w_out, compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(got[i : i + 1, :, keep, :]),
            np.asarray(want_i),
            rtol=3e-6,
            atol=3e-6,
        )
