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
