"""Probe: full train step time, fused vs XLA sublayers (latency-corrected
chained-scan timing as in bench.train_step_mfu; block_until_ready is
unreliable over the axon relay)."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (frozen_input_mask, init_train_state,
                                          make_optimizer, make_train_step)

NCHAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 8
loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
on_accel = jax.devices()[0].platform not in ("cpu",)
params = loaded.params
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
loss_fn = get_loss_fn("multiclass")
tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))
state = init_train_state(params, tx)

for fused in (False, True):
    cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16" if on_accel else "float32",
                              use_flash=on_accel, fused_ops=fused and on_accel)
    step = make_train_step(cfg, loss_fn, tx, remat=True, donate=False)

    def step_fn(st, _):
        st, metrics = step.__wrapped__(st, batch, jax.random.PRNGKey(1))
        return st, metrics["loss"]

    def chain(n):
        @jax.jit
        def run(st):
            st2, losses = jax.lax.scan(step_fn, st, None, length=n)
            return losses[-1]
        return run

    f1, fn = chain(1), chain(1 + NCHAIN)
    float(f1(state)); float(fn(state))
    ts = []
    for _ in range(3):
        t0 = time.time(); float(f1(state)); t1 = time.time(); float(fn(state))
        ts.append(((time.time() - t1) - (t1 - t0)) / NCHAIN)
    print(f"fused={fused}: {np.median(ts)*1e3:.1f} ms/step", flush=True)
