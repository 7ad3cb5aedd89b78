"""Training losses (JAX).

Semantics anchors: reference `scripts_finetune_mm/training_utils/training_loss.py:13-85`
— BCE uses the positive-class logit only; CE flattens over (samples, batch); the
regression loss is the bar-distribution NLL averaged over positions.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.bar_distribution import FullSupportBarDistribution

TaskType = str  # "multiclass" | "binary" | "regression"


def get_loss_fn(
    task_type: TaskType, borders: jnp.ndarray | None = None
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns loss(logits (b, s_test, n_out), y_test (b, s_test)) -> scalar."""
    if task_type == "regression":
        assert borders is not None
        bardist = FullSupportBarDistribution(borders)  # normalizes to jnp itself

        def bar_loss(logits, y):
            return bardist.nll_loss(logits, y).mean()

        return bar_loss

    if task_type == "binary":

        def bce(logits, y):
            z = logits[..., 1]  # positive-class logit (reference `training_loss.py:75`)
            return jnp.mean(
                jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            )

        return bce

    if task_type == "multiclass":

        def ce(logits, y):
            logp = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(
                logp, y.astype(jnp.int32)[..., None], axis=-1
            )[..., 0]
            return -picked.mean()

        return ce

    raise ValueError(f"Unknown task type: {task_type}")
