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
