"""Jitted fine-tuning step: loss + grad + clip + (schedule-free) AdamW.

Reference semantics: `scripts_finetune_mm/finetune_mmpfn_main.py:589-708` —
forward on a K-fold episode, loss on the test fold, clip global grad-norm to 1.0,
AdamWScheduleFree step, optional frozen input encoders (`:204-206`). TPU-first:
the whole step is one compiled function (no GradScaler — bf16 forward with fp32
master weights makes loss scaling unnecessary), episodes ride a batch axis, and
the step jits over an explicit device mesh (dp episodes × mp tensor-parallel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from multimodalpfn_tpu.models.config import ModelConfig
from multimodalpfn_tpu.models.transformer import forward_train_test


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def frozen_input_mask(params: dict, freeze_input: bool) -> dict:
    """True = trainable. The reference freezes `encoder` and `y_encoder`
    (`finetune_mmpfn_main.py:204-206`)."""

    def rule(path, _leaf):
        if not freeze_input:
            return True
        top = getattr(path[0], "key", None)
        return top not in ("encoder", "y_encoder")

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(
    learning_rate: float = 1e-5,
    *,
    max_grad_norm: float = 1.0,
    optimizer: str = "schedule_free_adamw",
    freeze_mask: dict | None = None,
    warmup_steps: int | None = None,
    skip_nonfinite_updates: bool = True,
    max_consecutive_nonfinite: int = 100,
) -> optax.GradientTransformation:
    if optimizer == "schedule_free_adamw":
        # warmup_steps semantics differ between the reference's torch
        # `schedulefree.AdamWScheduleFree` (0 = no warmup, full lr at step 1 —
        # its default, used by `finetune_mmpfn_main.py:731`) and optax's
        # `schedule_free_adamw` (0 builds warmup_constant_schedule(0, lr, 0)
        # == linear_schedule with transition_steps=0 == CONSTANT ZERO lr —
        # silently a no-op optimizer). Normalize 0 -> None (no schedule).
        tx = optax.contrib.schedule_free_adamw(
            learning_rate, warmup_steps=warmup_steps or None
        )
    elif optimizer == "adamw":
        tx = optax.adamw(learning_rate)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")
    chain = [optax.clip_by_global_norm(max_grad_norm), tx]
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "frozen", freeze_mask),
        )
    if skip_nonfinite_updates:
        # failure-detection: skip steps whose grads are NaN/inf — the TPU
        # equivalent of the reference's GradScaler scale-drop skip detection
        # (`finetune_mmpfn_main.py:686-692`), with a hard cap on consecutive
        # failures so a persistently-broken run errors instead of spinning.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=max_consecutive_nonfinite)
    return tx


def _find_schedule_free_state(node):
    """Exception-free structural search for the ScheduleFreeState anywhere in
    the optimizer-state tree — apply_if_finite / multi_transform / masked wrap
    it, and `optax.contrib.schedule_free_eval_params` RAISES on the wrappers
    (it getattr's b1/z on the top-level state). A plain host-side walk:
    eval_params is also called INSIDE jit traces, where a try/except around a
    raising nested call leaks tracers (observed as UnexpectedTracerError on
    the NEXT fine-tune's trace in one process, round 4)."""
    if isinstance(node, tuple) and hasattr(node, "_fields"):
        if "z" in node._fields and "weight_sum" in node._fields:
            return node
        for c in node:
            r = _find_schedule_free_state(c)
            if r is not None:
                return r
        return None
    if isinstance(node, (list, tuple)):
        for c in node:
            r = _find_schedule_free_state(c)
            if r is not None:
                return r
        return None
    if isinstance(node, dict):
        for v in node.values():
            r = _find_schedule_free_state(v)
            if r is not None:
                return r
    return None


def _is_masked_node(n) -> bool:
    return type(n).__name__ == "MaskedNode"


@jax.jit
def _schedule_free_eval_jit(opt_state, params):
    """x-sequence from the stored y-iterate: x = (y - (1-b1) z) / b1
    (optax `_schedule_free.py:43-53`). Frozen leaves (multi_transform mask)
    have MaskedNode placeholders in z and evaluate at the param itself.
    b1 is a scalar for a single run but carries a leading runs axis when the
    state was built under vmap (train/finetune_batch.py) — broadcast it
    LEFT-aligned against each leaf."""
    sf = _find_schedule_free_state(opt_state)  # structure is static under jit
    b1, z = jnp.asarray(sf.b1), sf.z

    def interp(zi, y):
        if _is_masked_node(zi):
            return y
        b = b1.reshape(b1.shape + (1,) * (y.ndim - b1.ndim))
        return (y - (1.0 - b) * zi) / b

    return jax.tree.map(interp, z, params, is_leaf=_is_masked_node)


def eval_params(state: TrainState, tx_is_schedule_free: bool = True):
    """Schedule-free optimizers evaluate at the x-sequence, not the y-iterate
    (reference uses AdamWScheduleFree's optimizer.eval() mode; the torch side
    calls optimizer.eval() before every validation/save,
    `finetune_mmpfn_main.py`). Jitted as one program — the per-leaf
    interpolation would otherwise run as ~40 separate eagerly-compiled ops per
    call (measured 72 s for the FIRST call over the remote link)."""
    if not tx_is_schedule_free:
        return state.params
    if _find_schedule_free_state(state.opt_state) is None:
        return state.params
    return _schedule_free_eval_jit(state.opt_state, state.params)


def make_train_step(
    cfg: ModelConfig,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    remat: bool = True,
    donate: bool = True,
):
    """Build the jitted step: batch is a dict with
    ``x_train (b,s_tr,F) | None``, ``y_train (b,s_tr)``, ``x_test (b,s_te,F) | None``,
    ``y_test (b,s_te)``, optional ``image_train/image_test (b,s,N,D)`` and an
    optional ``feat_pos_noise`` subspace table (passed as a traced argument so
    the compiled step is model_seed-independent)."""

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        def compute_loss(params):
            logits = forward_train_test(
                params,
                cfg,
                batch.get("x_train"),
                batch["y_train"],
                batch.get("x_test"),
                batch.get("image_train"),
                batch.get("image_test"),
                train=True,
                rng=rng,
                remat=remat,
                feat_pos_noise=batch.get("feat_pos_noise"),
            )
            return loss_fn(logits, batch["y_test"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


_INIT_JITS: dict[optax.GradientTransformation, Any] = {}


def init_train_state(params: dict, tx: optax.GradientTransformation) -> TrainState:
    # One jitted program: optax inits run per-leaf eagerly otherwise, and each
    # tiny eager op pays a full compile round trip on a remote backend. The
    # jit wrapper is memoized per optimizer object so repeated fine-tune calls
    # with a cached tx reuse one compiled init instead of recompiling.
    fn = _INIT_JITS.get(tx)
    if fn is None:

        def _init(p):
            return TrainState(
                params=p, opt_state=tx.init(p), step=jnp.zeros((), jnp.int32)
            )

        fn = jax.jit(_init)
        if len(_INIT_JITS) > 16:  # bounded; keyed by live tx objects
            _INIT_JITS.clear()
        _INIT_JITS[tx] = fn
    return fn(params)


# --- full-state checkpointing (params + optimizer state + step) --------------
# The reference saves weight snapshots only (no optimizer-state resume,
# SURVEY.md §5); here interrupted fine-tunes resume exactly.


def save_train_state(path, state: TrainState) -> None:
    import numpy as np

    leaves = jax.device_get(jax.tree_util.tree_leaves(state))  # one batched fetch
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def restore_train_state(path, template: TrainState) -> TrainState:
    """Restore into the structure of a freshly-initialized state (same params
    shapes + same optimizer)."""
    import numpy as np

    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    assert len(leaves) == len(t_leaves), "checkpoint/optimizer structure mismatch"
    leaves = [
        jnp.asarray(x, dtype=t.dtype) for x, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
