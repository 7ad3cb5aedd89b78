import numpy as np, jax, jax.numpy as jnp
from multimodalpfn_tpu.ops.pallas_fused import fused_mlp_ln, fused_feature_attention_ln
from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp
from multimodalpfn_tpu.ops.attention import self_attention

rng = np.random.default_rng(0)
G, b, S, t, e, h, d, H = 4, 1, 64, 24, 192, 6, 32, 768
x = jnp.asarray(rng.normal(size=(G, b, S, t, e)), jnp.float32)
w1 = jnp.asarray(rng.normal(size=(G, e, H)) * 0.05, jnp.float32)
w2 = jnp.asarray(rng.normal(size=(G, H, e)) * 0.05, jnp.float32)
wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

def loss_fused(x, w1, w2, wqkv, wout):
    o = fused_feature_attention_ln(x, wqkv, wout)
    o = fused_mlp_ln(o, w1, w2)
    return jnp.sum(o * o)

def loss_xla(x, w1, w2, wqkv, wout):
    o = _layer_norm(x + self_attention(x, wqkv, wout, compute_dtype=jnp.float32))
    o = _layer_norm(o + _mlp(o, w1, w2, jnp.float32))
    return jnp.sum(o * o)

with jax.default_matmul_precision("highest"):
    lf, gf = jax.jit(jax.vmap(jax.value_and_grad(loss_fused, argnums=(0,1,2,3,4))))(x, w1, w2, wqkv, wout)
    lx, gx = jax.jit(jax.vmap(jax.value_and_grad(loss_xla, argnums=(0,1,2,3,4))))(x, w1, w2, wqkv, wout)
print("loss rel err:", float(jnp.max(jnp.abs(lf - lx) / jnp.abs(lx))))
for a, bb, name in zip(gf, gx, "x w1 w2 wqkv wout".split()):
    scale = float(jnp.max(jnp.abs(bb))) or 1.0
    err = float(jnp.max(jnp.abs(a - bb))) / scale
    print(f"grad {name}: max rel-to-scale err {err:.2e}")
