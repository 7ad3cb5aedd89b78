"""Failure detection & robustness.

(a) The on-device encoders make extreme inputs (NaN/±huge) un-poisonous: loss
stays finite and training proceeds — by construction (NaN->train-mean + clip,
reference `encoders.py:453-493,53-99`).
(b) Non-finite *gradients* (e.g. numeric blow-ups inside training) are skipped by
the optimizer without touching params — the TPU analogue of the reference's
GradScaler skip detection (`finetune_mmpfn_main.py:686-692`).
"""

import numpy as np

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _batch(poison=False, seed=0):
    rng = np.random.default_rng(seed)
    b = {
        "x_train": rng.normal(size=(1, 24, 4)).astype(np.float32),
        "y_train": rng.integers(0, 3, size=(1, 24)).astype(np.float32),
        "x_test": rng.normal(size=(1, 8, 4)).astype(np.float32),
        "y_test": rng.integers(0, 3, size=(1, 8)).astype(np.float32),
    }
    if poison:
        b["x_test"][0, :4] = np.nan
        b["x_train"][0, 0, 0] = np.float32(3e38)
        b["x_train"][0, 1, 1] = np.nan
    return b


def test_extreme_inputs_keep_training_finite():
    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10)
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    tx = make_optimizer(1e-3, optimizer="adamw")
    state = init_train_state(params, tx)
    step = make_train_step(cfg, get_loss_fn("multiclass"), tx, remat=False, donate=False)
    for i in range(3):
        state, m = step(state, _batch(poison=True, seed=i), jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"])), f"step {i} loss not finite"
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state.params))


def test_nonfinite_gradients_skip_update():
    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10)
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    tx = make_optimizer(1e-2, optimizer="adamw", skip_nonfinite_updates=True)
    opt_state = tx.init(params)

    good_grads = jax.tree.map(jnp.ones_like, params)
    bad_grads = jax.tree.map(jnp.ones_like, params)
    bad_grads["decoder"]["w2"] = bad_grads["decoder"]["w2"] * jnp.nan

    upd, opt_state = tx.update(bad_grads, opt_state, params)
    # every update must be exactly zero (step skipped)
    assert all(float(jnp.abs(u).max()) == 0.0 for u in jax.tree.leaves(upd))
    # a subsequent good step applies normally
    upd, opt_state = tx.update(good_grads, opt_state, params)
    assert any(float(jnp.abs(u).max()) > 0.0 for u in jax.tree.leaves(upd))


def test_consecutive_failure_cap():
    import optax

    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=1, n_out=4)
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    tx = make_optimizer(
        1e-2, optimizer="adamw", skip_nonfinite_updates=True,
        max_consecutive_nonfinite=3,
    )
    opt_state = tx.init(params)
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    for _ in range(3):
        _, opt_state = tx.update(bad, opt_state, params)
    # the 4th consecutive failure trips the cap
    state_leaf = opt_state
    counter = int(jax.device_get(opt_state.notfinite_count))
    assert counter == 3
