"""Probe: device-time per sublayer via in-program chaining (scan of K reps)."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.ops.attention import item_attention, self_attention
from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp

N, K = 6, 16
loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
on_accel = jax.devices()[0].platform not in ("cpu",)
cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16" if on_accel else "float32",
                          use_flash=on_accel)
lp = jax.tree.map(lambda a: a[0], loaded.params["layers"])
jax.block_until_ready(jax.tree.leaves(lp)[0])

b, s, t, e = 1, 1470, 30, cfg.emsize
sep = 1323
rng = np.random.default_rng(0)
dt_ = jnp.bfloat16 if on_accel else jnp.float32
x = jnp.asarray(rng.normal(size=(b, s, t, e)), dt_)
xt = jnp.swapaxes(x, 1, 2)
cd = jnp.dtype(cfg.compute_dtype)

def timeit(name, op, arg, grad=False):
    if grad:
        f0 = op
        op = jax.grad(lambda z: jnp.sum(f0(z).astype(jnp.float32)))

    def chained(z):
        def body(c, _):
            o = op(c)
            return o.astype(z.dtype).reshape(z.shape), None
        out, _ = jax.lax.scan(body, z, None, length=K)
        return out

    f1 = jax.jit(op)
    fK = jax.jit(chained)
    jax.block_until_ready(f1(arg)); jax.block_until_ready(fK(arg))
    ts = []
    for _ in range(N):
        t0 = time.time(); out = f1(arg); jax.block_until_ready(out); t1 = time.time()
        out = fK(arg); jax.block_until_ready(out); t2 = time.time()
        ts.append(((t2-t1) - (t1-t0)) / (K-1))
    print(f"{name}: {np.median(ts)*1e3:.3f} ms/op (device)", flush=True)

feat = lambda z: self_attention(z, lp["attn_feat"]["w_qkv"], lp["attn_feat"]["w_out"], compute_dtype=cd)
item_fl = lambda z: item_attention(z.reshape(b, t, s, e), lp["attn_item"]["w_qkv"], lp["attn_item"]["w_out"],
                                   single_eval_pos=sep, compute_dtype=cd, use_flash=True).reshape(z.shape)
item_xla = lambda z: item_attention(z.reshape(b, t, s, e), lp["attn_item"]["w_qkv"], lp["attn_item"]["w_out"],
                                    single_eval_pos=sep, compute_dtype=cd, use_flash=False).reshape(z.shape)
mlp = lambda z: _mlp(z, lp["mlp"]["w1"], lp["mlp"]["w2"], cd)
ln = lambda z: _layer_norm(z).astype(cd)

for g in (False, True):
    sfx = "+bwd" if g else ""
    timeit(f"feat_attn{sfx}", feat, x, grad=g)
    timeit(f"item_attn_flash{sfx}", item_fl, xt, grad=g)
    timeit(f"item_attn_xla{sfx}", item_xla, xt, grad=g)
    timeit(f"mlp{sfx}", mlp, x, grad=g)
    timeit(f"layernorm{sfx}", ln, x, grad=g)
