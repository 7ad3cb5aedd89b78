"""Probe: per-sublayer fwd and fwd+bwd cost at the finetune episode shape."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.ops.attention import item_attention, self_attention
from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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

def timeit(name, fn, arg, grad=False):
    if grad:
        f0 = fn
        fn = jax.grad(lambda z: jnp.sum(f0(z).astype(jnp.float32)))
    f = jax.jit(fn)
    jax.block_until_ready(f(arg))
    t0 = time.time()
    for _ in range(N):
        out = f(arg)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/N*1e3:.2f} ms", flush=True)

feat = lambda z: self_attention(z, lp["attn_feat"]["w_qkv"], lp["attn_feat"]["w_out"], compute_dtype=cd)
item_fl = lambda z: item_attention(z, lp["attn_item"]["w_qkv"], lp["attn_item"]["w_out"],
                                   single_eval_pos=sep, compute_dtype=cd, use_flash=True)
item_xla = lambda z: item_attention(z, lp["attn_item"]["w_qkv"], lp["attn_item"]["w_out"],
                                    single_eval_pos=sep, compute_dtype=cd, use_flash=False)
mlp = lambda z: _mlp(z, lp["mlp"]["w1"], lp["mlp"]["w2"], cd)
ln = lambda z: _layer_norm(z).astype(cd)

for g in (False, True):
    sfx = "+bwd" if g else ""
    timeit(f"feat_attn{sfx}", feat, x, grad=g)
    timeit(f"item_attn_flash{sfx}", item_fl, xt, grad=g)
    timeit(f"item_attn_xla{sfx}", item_xla, xt, grad=g)
    timeit(f"mlp{sfx}", mlp, x, grad=g)
    timeit(f"layernorm{sfx}", ln, x, grad=g)
