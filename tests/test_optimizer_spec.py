"""Executable spec for the fine-tuning optimizer (round-5 learning-quality gate).

The round-4 zero-lr bug (`warmup_steps=0` silently built a constant-zero
schedule inside optax) survived three rounds of green tests because nothing
pinned the optimizer's SEMANTICS — only its mechanics. This file is the pin:
a hand-rolled NumPy schedule-free AdamW (the published interpolation, Defazio
et al. 2024, as composed by `train/step.make_optimizer`: clip-by-global-norm
1.0 → scale_by_rms(b2, bias-corrected, eps outside sqrt) → −lr → schedule-free
y/z/x sequences) run step-for-step against the optax chain. Any semantic
drift — an optax upgrade changing defaults, a reintroduced zero-lr schedule,
a broken eval interpolation — fails within one step.

Reference behavior anchor: torch `schedulefree.AdamWScheduleFree` as used by
`/root/reference/mmpfn/scripts_finetune_mm/finetune_mmpfn_main.py:711-755`
(lr 1e-5, warmup 0 = none, betas (0.9, 0.999), clip 1.0 before step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalpfn_tpu.train.step import (
    TrainState,
    eval_params,
    frozen_input_mask,
    init_train_state,
    make_optimizer,
)


class NumpyScheduleFreeAdamW:
    """The published schedule-free AdamW, written independently in NumPy.

    y (params) is the gradient-evaluation point, z the base-optimizer iterate,
    x the evaluation sequence:
        z_{t+1} = z_t − lr · adam_rms(g_t)
        c_t     = w_t / Σ w   with w_t = max_lr ** weight_lr_power
        x_{t+1} = (1−c_t) x_t + c_t z_{t+1}
        y_{t+1} = b1 x_{t+1} + (1−b1) z_{t+1}
    adam_rms is Adam's second-moment normalization without momentum
    (bias-corrected, eps added OUTSIDE the sqrt).
    """

    def __init__(self, params, lr, *, b1=0.9, b2=0.999, eps=1e-8,
                 weight_lr_power=2.0, clip_norm=1.0):
        self.y = {k: np.asarray(v, np.float64).copy() for k, v in params.items()}
        self.z = {k: v.copy() for k, v in self.y.items()}
        self.nu = {k: np.zeros_like(v) for k, v in self.y.items()}
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.weight_lr_power = weight_lr_power
        self.clip_norm = clip_norm
        self.t = 0  # base-optimizer step count
        self.max_lr = 0.0
        self.weight_sum = 0.0

    def step(self, grads):
        grads = {k: np.asarray(g, np.float64) for k, g in grads.items()}
        gnorm = np.sqrt(sum(float((g**2).sum()) for g in grads.values()))
        if gnorm > self.clip_norm:
            grads = {k: g * (self.clip_norm / gnorm) for k, g in grads.items()}
        self.t += 1
        self.max_lr = max(self.max_lr, self.lr)
        weight = self.max_lr**self.weight_lr_power
        self.weight_sum += weight
        ck = weight / self.weight_sum
        for k, g in grads.items():
            self.nu[k] = self.b2 * self.nu[k] + (1 - self.b2) * g * g
            nu_hat = self.nu[k] / (1 - self.b2**self.t)
            z_new = self.z[k] - self.lr * g / (np.sqrt(nu_hat) + self.eps)
            x_prev = (self.y[k] - (1 - self.b1) * self.z[k]) / self.b1
            x_new = (1 - ck) * x_prev + ck * z_new
            self.y[k] = self.b1 * x_new + (1 - self.b1) * z_new
            self.z[k] = z_new

    def eval_x(self):
        return {
            k: (self.y[k] - (1 - self.b1) * self.z[k]) / self.b1 for k in self.y
        }


def _run_optax(tx, params, grad_seq):
    state = init_train_state(params, tx)
    for g in grad_seq:
        updates, opt_state = tx.update(g, state.opt_state, state.params)
        state = TrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
            step=state.step + 1,
        )
    return state


def _grad_seq(params, n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {k: jnp.asarray(rng.normal(size=v.shape) * s, jnp.float32)
         for (k, v), s in zip(params.items(), (0.02, 30.0))}  # one step clips
        for _ in range(n)
    ]


@pytest.mark.parametrize("warmup_steps", [None, 0])
def test_schedule_free_adamw_matches_numpy_spec(warmup_steps):
    """10 steps, exact to fp32 tolerance. warmup_steps=0 MUST mean "no warmup"
    (the torch reference's convention) — if the round-4 fix is reverted, optax
    builds a constant-zero lr and step 1 already mismatches."""
    params = {
        "a": jnp.asarray(np.linspace(-1, 1, 12).reshape(3, 4), jnp.float32),
        "b": jnp.asarray(np.linspace(2, 3, 8).reshape(2, 4), jnp.float32),
    }
    lr = 1e-2
    tx = make_optimizer(lr, warmup_steps=warmup_steps)
    grads = _grad_seq(params, 10)
    got = _run_optax(tx, params, grads)

    spec = NumpyScheduleFreeAdamW(params, lr)
    for g in grads:
        spec.step(g)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(got.params[k]), spec.y[k], rtol=2e-5, atol=2e-7,
            err_msg=f"y-iterate diverged from the published algorithm on {k!r}",
        )
    # the evaluation sequence (what validation/checkpoints use) matches too
    ev = eval_params(got)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(ev[k]), spec.eval_x()[k], rtol=2e-5, atol=2e-7,
            err_msg=f"eval x-sequence diverged on {k!r}",
        )
    # and training actually trains: params moved measurably from init
    assert float(jnp.abs(got.params["a"] - params["a"]).max()) > 1e-4


def test_schedule_free_spec_with_frozen_partition():
    """The production chain (freeze mask + apply_if_finite) preserves the
    spec on trainable leaves and is the identity on frozen ones."""
    params = {
        "encoder": {"w": jnp.ones((4, 2))},
        "layers": {"w": jnp.asarray(np.linspace(0, 1, 8).reshape(4, 2), jnp.float32)},
    }
    lr = 3e-3
    tx = make_optimizer(lr, freeze_mask=frozen_input_mask(params, True))
    rng = np.random.default_rng(1)
    grads = [
        {
            "encoder": {"w": jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)},
            "layers": {"w": jnp.asarray(rng.normal(size=(4, 2)) * 0.1, jnp.float32)},
        }
        for _ in range(6)
    ]
    got = _run_optax(tx, params, grads)

    # multi_transform PARTITIONS the gradients, so the global-norm clip inside
    # the "train" branch sees only the trainable leaves — exactly the NumPy
    # spec run on the trainable partition alone.
    spec = NumpyScheduleFreeAdamW({"layers.w": params["layers"]["w"]}, lr)
    for g in grads:
        spec.step({"layers.w": np.asarray(g["layers"]["w"])})

    np.testing.assert_array_equal(np.asarray(got.params["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(got.params["layers"]["w"]), spec.y["layers.w"],
        rtol=2e-5, atol=2e-7,
    )
    ev = eval_params(got)
    np.testing.assert_allclose(
        np.asarray(ev["layers"]["w"]), spec.eval_x()["layers.w"],
        rtol=2e-5, atol=2e-7,
    )


def test_nonfinite_grads_are_skipped_exactly():
    """apply_if_finite skips the update without corrupting the spec sequence."""
    params = {"w": jnp.asarray([[1.0, -1.0], [0.5, 2.0]], jnp.float32)}
    lr = 1e-2
    tx = make_optimizer(lr)
    rng = np.random.default_rng(2)
    gs = [jnp.asarray(rng.normal(size=(2, 2)) * 0.05, jnp.float32) for _ in range(5)]
    seq = [gs[0], gs[1], jnp.asarray([[np.nan, 0], [0, 0]], jnp.float32), gs[2], gs[3]]
    got = _run_optax(tx, params, [{"w": g} for g in seq])

    spec = NumpyScheduleFreeAdamW(params, lr)
    for g in (gs[0], gs[1], gs[2], gs[3]):  # NaN step skipped entirely
        spec.step({"w": g})
    np.testing.assert_allclose(
        np.asarray(got.params["w"]), spec.y["w"], rtol=2e-5, atol=2e-7
    )
