"""Ring attention == single-device attention (8-virtual-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.parallel.mesh import make_mesh
from multimodalpfn_tpu.parallel.ring_attention import (
    ring_attention,
    ring_attention_sharded_queries,
)


def _ref(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, h, Sq, Skv, d = 2, 3, 40, 64, 16
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    return q, k, v


def test_ring_attention_matches_reference(qkv):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = qkv
    mesh = make_mesh(8, mp=1)
    got = np.asarray(ring_attention(q, k, v, mesh=mesh))
    want = np.asarray(_ref(q, k, v, 1.0 / np.sqrt(q.shape[-1])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_ring_attention_sharded_queries_matches(qkv):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = qkv
    # Sq must divide by the ring for the fully-sharded variant
    q = q[:, :, :32]
    mesh = make_mesh(8, mp=1)
    got = np.asarray(ring_attention_sharded_queries(q, k, v, mesh=mesh))
    want = np.asarray(_ref(q, k, v, 1.0 / np.sqrt(q.shape[-1])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_encoder_layer_with_seq_shard_axis_matches_single_device():
    """Production call site: the FULL encoder layer with cfg.seq_shard_axis
    ring-shards the item-attention KV over dp and must equal the unsharded
    layer (8-virtual-device mesh, jitted under jax.set_mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.models.transformer import encoder_layer

    cfg = ModelConfig(
        emsize=48, nhead=4, nhid_factor=2, nlayers=1, n_out=4, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(5)
    b, t, e = 2, 5, cfg.emsize
    sep, s_test = 64, 24  # sep divisible by the ring (8)
    x = jnp.asarray(rng.normal(size=(b, sep + s_test, t, e)), jnp.float32)

    want = np.asarray(
        encoder_layer(x, layer0, single_eval_pos=sep, cfg=cfg)
    )

    mesh = make_mesh(8, mp=1)
    cfg_ring = cfg.replace(seq_shard_axis="dp")
    with jax.set_mesh(mesh):
        got = np.asarray(
            jax.jit(
                lambda s: encoder_layer(s, layer0, single_eval_pos=sep, cfg=cfg_ring)
            )(x)
        )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
