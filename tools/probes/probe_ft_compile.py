"""Probe: compile time of the finetune programs (train step, val forward, fused)."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (frozen_input_mask, init_train_state,
                                          make_optimizer, make_train_step, eval_params)

loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
on_accel = jax.devices()[0].platform not in ("cpu",)
cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16" if on_accel else "float32",
                          use_flash=on_accel)
params = loaded.params
jax.block_until_ready(jax.tree.leaves(params)[0])

b, s_tr, s_te, F = 1, 1323, 147, 21
s_trf, s_valf = 1470, 368
rng = np.random.default_rng(0)
batch = {
    "x_train": jnp.asarray(rng.normal(size=(b, s_tr, F)), jnp.float32),
    "y_train": jnp.asarray(rng.integers(0, 6, size=(b, s_tr)), jnp.float32),
    "x_test": jnp.asarray(rng.normal(size=(b, s_te, F)), jnp.float32),
    "y_test": jnp.asarray(rng.integers(0, 6, size=(b, s_te)), jnp.float32),
    "image_train": jnp.asarray(rng.normal(size=(b, s_tr, 1, 768)), jnp.float32),
    "image_test": jnp.asarray(rng.normal(size=(b, s_te, 1, 768)), jnp.float32),
}
vd = {
    "x_tr": jnp.asarray(rng.normal(size=(1, s_trf, F)), jnp.float32),
    "y_tr": jnp.asarray(rng.integers(0, 6, size=(1, s_trf)), jnp.float32),
    "x_va": jnp.asarray(rng.normal(size=(1, s_valf, F)), jnp.float32),
    "i_tr": jnp.asarray(rng.normal(size=(1, s_trf, 1, 768)), jnp.float32),
    "i_va": jnp.asarray(rng.normal(size=(1, s_valf, 1, 768)), jnp.float32),
}
loss_fn = get_loss_fn("multiclass")
tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))
state = init_train_state(params, tx)
train_step = make_train_step(cfg, loss_fn, tx, remat=True, donate=False)
val_cfg = dataclasses.replace(cfg, fused_ops=on_accel)

def val_forward(p, vd):
    return forward_train_test(p, val_cfg, vd["x_tr"], vd["y_tr"], vd["x_va"], vd["i_tr"], vd["i_va"])

def fused(state, batch, rng_, vd, apply_update):
    new_state, metrics = train_step.__wrapped__(state, batch, rng_)
    new_state = jax.tree.map(lambda n, o: jnp.where(apply_update, n, o), new_state, state)
    p_eval = eval_params.__wrapped__(new_state, True)
    return new_state, metrics, val_forward(p_eval, vd)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
def timeit(name, fn, *args):
    t0 = time.time(); lowered = jax.jit(fn).lower(*args); t1 = time.time()
    compiled = lowered.compile(); t2 = time.time()
    out = jax.block_until_ready(compiled(*args)); t3 = time.time()
    print(f"{name}: trace {t1-t0:.1f}s compile {t2-t1:.1f}s first-run {t3-t2:.1f}s", flush=True)

if which in ("all", "step"):
    timeit("train_step", lambda st, b_, r: train_step.__wrapped__(st, b_, r), state, batch, jax.random.PRNGKey(1))
if which in ("all", "val"):
    timeit("val_forward", val_forward, params, vd)
if which in ("all", "fused"):
    timeit("fused_step_and_val", fused, state, batch, jax.random.PRNGKey(1), vd, 1.0)
