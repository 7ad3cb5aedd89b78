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


def test_ring_attention_grads_match_reference(qkv):
    """Training-grade: the custom ring backward (second ring pass) must match
    plain-attention autodiff for dq, dk, dv."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = qkv
    mesh = make_mesh(8, mp=1)
    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal(q.shape), jnp.float32
    )

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, 1.0 / np.sqrt(q.shape[-1])) * cot)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_ring_attention_sharded_queries_grads(qkv):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    q, k, v = qkv
    q = q[:, :, :32]
    mesh = make_mesh(8, mp=1)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded_queries(q, k, v, mesh=mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, 1.0 / np.sqrt(q.shape[-1])) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_encoder_layer_grad_with_seq_shard_axis():
    """Differentiating THROUGH the ring path at the production call site:
    layer-parameter grads under cfg.seq_shard_axis equal the unsharded ones."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.models.transformer import encoder_layer

    cfg = ModelConfig(
        emsize=48, nhead=4, nhid_factor=2, nlayers=1, n_out=4,
        compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(6)
    b, t, e = 2, 3, cfg.emsize
    sep, s_test = 64, 24
    x = jnp.asarray(rng.normal(size=(b, sep + s_test, t, e)), jnp.float32)

    def loss(lp, cfg_):
        return jnp.sum(
            encoder_layer(x, lp, single_eval_pos=sep, cfg=cfg_) ** 2
        )

    want = jax.grad(loss)(layer0, cfg)

    mesh = make_mesh(8, mp=1)
    cfg_ring = cfg.replace(seq_shard_axis="dp")
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(lambda lp: loss(lp, cfg_ring)))(layer0)
    for path, a in jax.tree_util.tree_flatten_with_path(got)[0]:
        b_ = jax.tree_util.tree_map(lambda x: x, want)
        flat_want = dict(jax.tree_util.tree_flatten_with_path(want)[0])
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_want[path]), rtol=3e-4, atol=3e-5,
            err_msg=str(path),
        )


def test_ring_attention_flash_path_grads():
    """The long-shard regime (shard >= MIN_FLASH_SHARD) must route fwd AND bwd
    through the Pallas flash kernels (interpret mode on CPU) and still match
    plain-attention autodiff — this is the regime ring attention exists for."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from jax.experimental import pallas as pl  # noqa: F401  (pallas available?)
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    B, h, Sq, Skv, d = 1, 2, 24, 1024, 16  # 2 shards x 512 = MIN_FLASH_SHARD
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    mesh = make_mesh(2, mp=1)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh=mesh, use_flash=True) * cot
        )

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, 1.0 / np.sqrt(d)) * cot)

    with pltpu.force_tpu_interpret_mode():
        lr, gr = jax.value_and_grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    lx, gx = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lr), float(lx), rtol=2e-4)
    for a, b, name in zip(gr, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_finetune_step_with_seq_shard_axis():
    """One full training step (value_and_grad through the 2-layer model) with
    seq_shard_axis='dp' on the 8-device mesh: loss and grads match the
    unsharded step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.models.transformer import forward_train_test
    from multimodalpfn_tpu.train.losses import get_loss_fn

    cfg = ModelConfig(
        emsize=48, nhead=4, nhid_factor=2, nlayers=2, features_per_group=1,
        n_out=4, max_num_classes=4, compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    rng = np.random.default_rng(8)
    b, s_tr, s_te, F = 1, 64, 16, 3
    x_tr = jnp.asarray(rng.normal(size=(b, s_tr, F)), jnp.float32)
    y_tr = jnp.asarray(rng.integers(0, 3, size=(b, s_tr)), jnp.float32)
    x_te = jnp.asarray(rng.normal(size=(b, s_te, F)), jnp.float32)
    y_te = jnp.asarray(rng.integers(0, 3, size=(b, s_te)), jnp.float32)
    loss_fn = get_loss_fn("multiclass")

    def step(p, cfg_):
        def compute_loss(p):
            logits = forward_train_test(p, cfg_, x_tr, y_tr, x_te)
            return loss_fn(logits, y_te)

        return jax.value_and_grad(compute_loss)(p)

    want_loss, want_g = step(params, cfg)

    mesh = make_mesh(8, mp=1)
    cfg_ring = cfg.replace(seq_shard_axis="dp")
    with jax.set_mesh(mesh):
        got_loss, got_g = jax.jit(lambda p: step(p, cfg_ring))(params)
    np.testing.assert_allclose(
        float(got_loss), float(want_loss), rtol=1e-5, atol=1e-6
    )
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want_g)[0])
    for path, a in jax.tree_util.tree_flatten_with_path(got_g)[0]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_want[path]), rtol=5e-4, atol=5e-5,
            err_msg=str(path),
        )
