"""Batched (vmapped) fine-tuning: many independent runs in one compiled step.

The reference runs its 5-seeds-per-grid-cell protocol as sequential processes
(`run.py:39-129`, two GPUs of shell queues `run0.sh`/`run1.sh`). Here independent
runs (seed × split) become a leading axis: params, optimizer state, and episode
batches are stacked, the train step is `jax.vmap`-ed then jitted once, and the run
axis shards over the mesh's ``dp`` axis — a whole multi-seed sweep advances in
lockstep on one or many chips. This is the "vmapped HPO trials" north star
(BASELINE.json config 5).

Constraints: runs must share the architecture (same mgm/cap head counts — one grid
cell) and episode shapes (same dataset split sizes), which the reference protocol
satisfies by construction.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.config import MixerConfig
from multimodalpfn_tpu.models.params import init_mixer_params
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.data import EpisodeSampler
from multimodalpfn_tpu.train.finetune import _canon_task
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.metrics import get_scorer
from multimodalpfn_tpu.train.step import (
    TrainState,
    frozen_input_mask,
    init_train_state,
    make_optimizer,
)

logger = logging.getLogger(__name__)


def _stack_params_for_runs(params: dict, mixer_cfg: MixerConfig, emsize: int, seeds):
    """Base weights broadcast across runs; mixer weights freshly initialized per
    run from its seed (strict=False semantics per run)."""
    n = len(seeds)
    stacked = jax.tree.map(lambda p: jnp.broadcast_to(p, (n, *p.shape)), params)
    if mixer_cfg.mixer_type != "none":
        mixers = [
            init_mixer_params(jax.random.PRNGKey(int(s)), mixer_cfg, emsize)
            for s in seeds
        ]
        stacked["mixer"] = jax.tree.map(lambda *xs: jnp.stack(xs), *mixers)
    return stacked


def fine_tune_batched(
    *,
    mixer_type: str,
    mgm_heads: int,
    cap_heads: int,
    features_per_group: int,
    path_to_base_model: str = "auto",
    task_type: str = "multiclass",
    X: np.ndarray | None,
    image: np.ndarray | None,
    y: np.ndarray,
    seeds: list[int],
    finetuning_config: dict[str, Any] | None = None,
    validation_metric: str = "log_loss",
    freeze_input: bool = True,
    val_fraction: float = 0.2,
    time_limit: float = 3600,
    mesh=None,
    run_splits: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> dict[str, Any]:
    """Fine-tune len(seeds) independent runs simultaneously.

    Each run r: its own train/val split (seeded by seeds[r]), its own fresh mixer
    init, its own episode stream — all advanced by ONE vmapped+jitted step.
    Returns per-run histories and the stacked final (eval) params.
    """
    st = time.time()
    task = _canon_task(task_type)
    is_clf = task != "regression"
    hps = {
        "learning_rate": 1e-5,
        "max_steps": 100,
        "validate_every_n_steps": 1,
        "optimizer": "schedule_free_adamw",
        **(finetuning_config or {}),
    }
    n_runs = len(seeds)

    loaded = initialize_model(
        model_path=path_to_base_model,
        which="classifier" if is_clf else "regressor",
        static_seed=int(seeds[0]),
        mixer_type=mixer_type if image is not None else "none",
        mgm_heads=mgm_heads,
        cap_heads=cap_heads,
        features_per_group=features_per_group,
    )
    on_accel = jax.devices()[0].platform not in ("cpu",)
    cfg = dataclasses.replace(
        loaded.config,
        compute_dtype="bfloat16" if on_accel else "float32",
        use_flash=on_accel,
    )

    # --- per-run (train, val) index splits with identical sizes; callers may
    # provide them (e.g. the HPO protocol's inner split of each outer-train set)
    if run_splits is not None:
        assert len(run_splits) == n_runs
        sizes = {(len(tr), len(va)) for tr, va in run_splits}
        assert len(sizes) == 1, "all runs must share split sizes (static shapes)"
        splits = [(np.asarray(tr), np.asarray(va)) for tr, va in run_splits]
    else:
        n = len(y)
        n_val = int(round(n * val_fraction))
        splits = []
        for s in seeds:
            rng = np.random.default_rng(int(s))
            perm = rng.permutation(n)
            splits.append((perm[n_val:], perm[:n_val]))

    def gather(arr, idx):
        return None if arr is None else arr[idx]

    samplers = [
        EpisodeSampler(
            X=gather(X, tr), image=gather(image, tr), y=y[tr],
            is_classification=is_clf, seed=4213 + int(s),
        )
        for s, (tr, _va) in zip(seeds, splits)
    ]

    params_stacked = _stack_params_for_runs(
        loaded.params, cfg.mixer if image is not None else MixerConfig("none"),
        cfg.emsize, seeds,
    )

    borders = None
    if task == "regression":
        borders = jnp.asarray(np.asarray(loaded.criterion_borders, np.float32))
    loss_fn = get_loss_fn(task, borders)
    scorer = get_scorer(validation_metric)

    mask = frozen_input_mask(loaded.params, freeze_input)
    tx = make_optimizer(hps["learning_rate"], optimizer=hps["optimizer"], freeze_mask=mask)

    def one_step(state: TrainState, batch, rng):
        def compute_loss(p):
            logits = forward_train_test(
                p, cfg,
                batch.get("x_train"), batch["y_train"], batch.get("x_test"),
                batch.get("image_train"), batch.get("image_test"),
                train=True, rng=rng, remat=True,
            )
            return loss_fn(logits, batch["y_test"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    batched_step = jax.jit(jax.vmap(one_step), donate_argnums=(0,))

    # vmapped validation forward (per-run split context)
    val_data = _stack_val(X, image, y, splits)

    @jax.jit
    def val_logits(params_stacked):
        return jax.vmap(
            lambda p, d: forward_train_test(
                p, cfg,
                d.get("x_train"), d["y_train"], d.get("x_val"),
                d.get("image_train"), d.get("image_val"),
            )
        )(params_stacked, val_data)

    # init state (vmapped opt init)
    state = jax.vmap(lambda p: init_train_state(p, tx))(params_stacked)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_runs = NamedSharding(mesh, P("dp"))
        state = jax.device_put(
            state, jax.tree.map(lambda _: shard_runs, state)
        )

    def evaluate(params_s) -> np.ndarray:
        logits = np.asarray(val_logits(params_s))  # (runs, 1, n_val, n_out)
        errs = []
        for r in range(n_runs):
            lo = logits[r, 0]
            _, va = splits[r]
            if task == "regression":
                from multimodalpfn_tpu.models.bar_distribution import (
                    FullSupportBarDistribution,
                )

                pred = np.asarray(FullSupportBarDistribution(borders).mean(jnp.asarray(lo)))
            else:
                z = lo - lo.max(-1, keepdims=True)
                pred = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
                n_classes = int(y.max()) + 1
                pred = pred[:, :n_classes]
                pred = pred / pred.sum(-1, keepdims=True)
            errs.append(scorer.convert_score_to_error(scorer(y[va], pred)))
        return np.asarray(errs)

    from multimodalpfn_tpu.train.step import eval_params as sf_eval

    best_err = evaluate(state.params)
    history = {"val_error": [(0, best_err.tolist())], "train_loss": []}
    key = jax.random.PRNGKey(0)

    for step_i in range(1, int(hps["max_steps"]) + 1):
        if time.time() - st > time_limit:
            break
        batch = _stack_batches([s.sample(1) for s in samplers])
        key, sub = jax.random.split(key)
        subs = jax.random.split(sub, n_runs)
        state, losses = batched_step(state, batch, subs)
        history["train_loss"].append(np.asarray(losses).tolist())
        if step_i % int(hps["validate_every_n_steps"]) == 0:
            p_eval = sf_eval(state, hps["optimizer"] == "schedule_free_adamw")
            errs = evaluate(p_eval)
            history["val_error"].append((step_i, errs.tolist()))
            best_err = np.minimum(best_err, errs)

    p_final = sf_eval(state, hps["optimizer"] == "schedule_free_adamw")
    history["best_val_error"] = best_err.tolist()
    history["wall_s"] = time.time() - st
    return {
        "history": history,
        "params_stacked": p_final,
        "config": cfg,
        "splits": splits,
        "criterion_borders": loaded.criterion_borders,
    }


def _stack_val(X, image, y, splits):
    """Stack per-run validation contexts: (runs, 1, n, ...) — the singleton is the
    in-forward batch axis; the leading axis is consumed by vmap."""

    def stk(arr, idxs):
        return jnp.stack([arr[ix].astype(np.float32)[None] for ix in idxs])

    out: dict[str, jnp.ndarray] = {"y_train": stk(y, [tr for tr, _ in splits])}
    if X is not None:
        out["x_train"] = stk(X, [tr for tr, _ in splits])
        out["x_val"] = stk(X, [va for _, va in splits])
    if image is not None:
        out["image_train"] = stk(image, [tr for tr, _ in splits])
        out["image_val"] = stk(image, [va for _, va in splits])
    return out


def _stack_batches(batches: list[dict]) -> dict:
    return {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
