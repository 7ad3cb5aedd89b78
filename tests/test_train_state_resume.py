"""Exact fine-tune resume: params + optimizer state + step round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.step import (
    frozen_input_mask,
    init_train_state,
    make_optimizer,
    make_train_step,
    restore_train_state,
    save_train_state,
)


def test_train_state_roundtrip(tmp_path):
    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10)
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    tx = make_optimizer(1e-3, freeze_mask=frozen_input_mask(params, True))
    state = init_train_state(params, tx)
    step = make_train_step(cfg, get_loss_fn("multiclass"), tx, remat=False, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "x_train": rng.normal(size=(1, 24, 4)).astype(np.float32),
        "y_train": rng.integers(0, 3, size=(1, 24)).astype(np.float32),
        "x_test": rng.normal(size=(1, 8, 4)).astype(np.float32),
        "y_test": rng.integers(0, 3, size=(1, 8)).astype(np.float32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(2))

    path = tmp_path / "state.npz"
    save_train_state(path, state)
    fresh = init_train_state(params, tx)
    restored = restore_train_state(path, fresh)
    assert int(restored.step) == 2

    # continuing from restored state equals continuing from the original
    a, m1 = step(state, batch, jax.random.PRNGKey(3))
    b, m2 = step(restored, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_schedule_free_actually_trains_and_eval_interpolates():
    """Two regressions in one (round 4):

    1. ``make_optimizer`` passed ``warmup_steps=0`` to optax's
       ``schedule_free_adamw``, which builds ``warmup_constant_schedule(0, lr,
       0)`` — a CONSTANT-ZERO learning rate (the torch reference's
       ``AdamWScheduleFree`` treats 0 as "no warmup"). The optimizer was a
       silent no-op.
    2. ``eval_params`` delegated to ``optax.contrib.schedule_free_eval_params``,
       which raises on wrapped states (``apply_if_finite``/``multi_transform``)
       — the except branch silently returned the y-iterate instead of the
       x-sequence the reference's ``optimizer.eval()`` mode evaluates at.
    """
    import optax

    from multimodalpfn_tpu.train.step import TrainState, eval_params

    params = {"encoder": {"w": jnp.ones((4, 4))}, "body": {"w": jnp.ones((4, 4)) * 2}}
    tx = make_optimizer(1e-2, freeze_mask=frozen_input_mask(params, True))
    s = init_train_state(params, tx)
    for _ in range(3):
        grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), s.params)
        updates, new_opt = tx.update(grads, s.opt_state, s.params)
        s = TrainState(
            params=optax.apply_updates(s.params, updates),
            opt_state=new_opt,
            step=s.step + 1,
        )

    # (1) the trainable partition moved; the frozen partition did not
    assert float(jnp.abs(s.params["body"]["w"] - 2.0).max()) > 1e-6
    np.testing.assert_array_equal(np.asarray(s.params["encoder"]["w"]), 1.0)

    # (2) eval params are the x-sequence: distinct from y, equal to optax's
    # published formula x = (y - (1-b1) z) / b1, identity on frozen leaves
    from multimodalpfn_tpu.train.step import _find_schedule_free_state

    sf = _find_schedule_free_state(s.opt_state)
    assert sf is not None
    e = eval_params(s)
    assert float(jnp.abs(e["body"]["w"] - s.params["body"]["w"]).max()) > 1e-9
    manual = (s.params["body"]["w"] - (1.0 - sf.b1) * sf.z["body"]["w"]) / sf.b1
    np.testing.assert_allclose(np.asarray(e["body"]["w"]), np.asarray(manual))
    np.testing.assert_array_equal(
        np.asarray(e["encoder"]["w"]), np.asarray(s.params["encoder"]["w"])
    )

    # non-schedule-free fallback is the identity
    tx2 = make_optimizer(1e-2, optimizer="adamw")
    s2 = init_train_state(params, tx2)
    assert eval_params(s2) is s2.params
