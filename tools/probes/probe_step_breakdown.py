"""Probe: where the fine-tune step's time goes, by isolated sub-programs.

Times (async dispatch x N, one final block) at the PAD-UFES episode shape:
forward (inference/train), value_and_grad with/without remat, full step, and
the per-sublayer ops (feature-attn / item-attn / MLP) fwd and fwd+bwd.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (
    frozen_input_mask, init_train_state, make_optimizer, make_train_step,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10

loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
on_accel = jax.devices()[0].platform not in ("cpu",)
cfg = dataclasses.replace(loaded.config,
                          compute_dtype="bfloat16" if on_accel else "float32",
                          use_flash=on_accel)
params = loaded.params
jax.block_until_ready(jax.tree.leaves(params)[0])

b, s_tr, s_te, F = 1, 1323, 147, 21
rng = np.random.default_rng(0)
batch = {
    "x_train": jnp.asarray(rng.normal(size=(b, s_tr, F)), jnp.float32),
    "y_train": jnp.asarray(rng.integers(0, 6, size=(b, s_tr)), jnp.float32),
    "x_test": jnp.asarray(rng.normal(size=(b, s_te, F)), jnp.float32),
    "y_test": jnp.asarray(rng.integers(0, 6, size=(b, s_te)), jnp.float32),
    "image_train": jnp.asarray(rng.normal(size=(b, s_tr, 1, 768)), jnp.float32),
    "image_test": jnp.asarray(rng.normal(size=(b, s_te, 1, 768)), jnp.float32),
}


def timeit(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))  # compile
    t0 = time.time()
    for _ in range(N):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


loss_fn = get_loss_fn("multiclass")


def fwd_infer(p):
    return forward_train_test(p, cfg, batch["x_train"], batch["y_train"],
                              batch["x_test"], batch["image_train"], batch["image_test"])


def fwd_train(p):
    return forward_train_test(p, cfg, batch["x_train"], batch["y_train"],
                              batch["x_test"], batch["image_train"], batch["image_test"],
                              train=True, rng=jax.random.PRNGKey(1))


def loss_of(p, remat):
    def f(pp):
        logits = forward_train_test(pp, cfg, batch["x_train"], batch["y_train"],
                                    batch["x_test"], batch["image_train"],
                                    batch["image_test"], train=True,
                                    rng=jax.random.PRNGKey(1), remat=remat)
        return loss_fn(logits, batch["y_test"])
    return f


timeit("fwd_inference", fwd_infer, params)
timeit("fwd_train", fwd_train, params)
timeit("grad_noremat", lambda p: jax.value_and_grad(loss_of(p, False))(p), params)
timeit("grad_remat", lambda p: jax.value_and_grad(loss_of(p, True))(p), params)

tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))
state = init_train_state(params, tx)
step = make_train_step(cfg, loss_fn, tx, remat=True, donate=False)
jax.block_until_ready(step(state, batch, jax.random.PRNGKey(1))[1]["loss"])
t0 = time.time()
for _ in range(N):
    _, m = step(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(m["loss"])
print(f"full_step_remat: {(time.time()-t0)/N*1e3:.1f} ms", flush=True)

# ---- per-sublayer ops at the layer-stack shapes
s = s_tr + s_te
t = F + 8 + 1  # feature groups + cap tokens + target token
e, h, dh, nhid = cfg.emsize, cfg.nhead, cfg.d_head, cfg.nhid
x_state = jnp.asarray(rng.normal(size=(b, s, t, e)), jnp.bfloat16 if on_accel else jnp.float32)

from multimodalpfn_tpu.models.transformer import encoder_layer  # noqa: E402

lp = jax.tree.map(lambda a: a[0], params["layers"])  # one layer's params


def one_layer(st):
    return encoder_layer(st, lp, single_eval_pos=s_tr, cfg=cfg, token_valid=None)


def one_layer_loss(st):
    return jnp.sum(one_layer(st).astype(jnp.float32))


timeit("one_layer_fwd", one_layer, x_state)
timeit("one_layer_fwd+bwd", lambda st: jax.grad(one_layer_loss)(st), x_state)
print(f"x12 layers fwd+bwd would be: see above", flush=True)
