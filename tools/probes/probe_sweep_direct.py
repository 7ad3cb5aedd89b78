"""Direct-dispatch timing of the vmapped sweep step (no lax.scan chaining).

Production (`train/finetune_batch.py`) calls the jitted vmapped step once per
episode — dispatches pipeline on the device queue, so per-step wall converges
to device time. The scan-chain probe (`probe_sweep_step.py`) measures a
DIFFERENT program (scan body + carry plumbing); this one measures what
production runs: K back-to-back async dispatches, block once at the end.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (
    TrainState,
    frozen_input_mask,
    init_train_state,
    make_optimizer,
)

N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FUSED = sys.argv[2] != "0" if len(sys.argv) > 2 else True
REMAT = sys.argv[3] != "0" if len(sys.argv) > 3 else False
FUSED_ITEM = sys.argv[4] != "0" if len(sys.argv) > 4 else True

cfg = ModelConfig(
    emsize=192, nhead=6, nhid_factor=4, nlayers=12, features_per_group=1,
    n_out=10, max_num_classes=10, compute_dtype="bfloat16", use_flash=True,
    fused_ops=FUSED, fused_item=FUSED_ITEM,
    mixer=MixerConfig(mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8, in_dim=768),
)
params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
params_s = jax.tree.map(
    lambda p: jnp.array(jnp.broadcast_to(p, (N_RUNS, *p.shape))), params
)

b, s_tr, s_te, F = 1, 1323, 147, 21
rng = np.random.default_rng(0)
batch = {
    "x_train": jnp.asarray(rng.normal(size=(N_RUNS, b, s_tr, F)), jnp.float32),
    "y_train": jnp.asarray(rng.integers(0, 6, size=(N_RUNS, b, s_tr)), jnp.float32),
    "x_test": jnp.asarray(rng.normal(size=(N_RUNS, b, s_te, F)), jnp.float32),
    "y_test": jnp.asarray(rng.integers(0, 6, size=(N_RUNS, b, s_te)), jnp.float32),
    "image_train": jnp.asarray(rng.normal(size=(N_RUNS, b, s_tr, 1, 768)), jnp.float32),
    "image_test": jnp.asarray(rng.normal(size=(N_RUNS, b, s_te, 1, 768)), jnp.float32),
}
loss_fn = get_loss_fn("multiclass")
tx = make_optimizer(1e-5, freeze_mask=frozen_input_mask(params, True))


def one_step(state, batch, rng):
    def compute_loss(p):
        logits = forward_train_test(
            p, cfg, batch["x_train"], batch["y_train"], batch["x_test"],
            batch["image_train"], batch["image_test"],
            train=True, rng=rng, remat=REMAT,
        )
        return loss_fn(logits, batch["y_test"])

    loss, grads = jax.value_and_grad(compute_loss)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    p = jax.tree.map(lambda a, u: a + u, state.params, updates)
    return TrainState(p, opt_state, state.step + 1), loss


state = jax.vmap(lambda p: init_train_state(p, tx))(params_s)
vstep = jax.jit(jax.vmap(one_step, in_axes=(0, 0, 0)), donate_argnums=(0,))
keys = jax.random.split(jax.random.PRNGKey(1), N_RUNS)

t0 = time.time()
state, loss = vstep(state, batch, keys)
np.asarray(loss)
print(f"compile {time.time()-t0:.1f}s")

K = 20
# warm queue
state, loss = vstep(state, batch, keys)
np.asarray(loss)
t0 = time.time()
for _ in range(K):
    state, loss = vstep(state, batch, keys)
np.asarray(loss)
dt = (time.time() - t0) / K
print(
    f"direct n_runs={N_RUNS} fused={FUSED} remat={REMAT} fused_item={FUSED_ITEM}: "
    f"{dt*1e3:.1f} ms/step ({dt*1e3/N_RUNS:.1f} ms/run-step, {N_RUNS/dt:.1f} run-steps/s)"
)
