"""Batched (vmapped) fine-tuning: many independent runs in one compiled step.

The reference runs its 5-seeds-per-grid-cell protocol as sequential processes
(`run.py:39-129`, two GPUs of shell queues `run0.sh`/`run1.sh`). Here independent
runs become a leading axis: params, optimizer state, and episode batches are
stacked, the train step is `jax.vmap`-ed then jitted once, and the run axis
shards over the mesh's ``dp`` axis — a whole sweep advances in lockstep on one
or many chips. This is the "vmapped HPO trials" north star (BASELINE.json
config 5).

Two granularities:

  * ``fine_tune_batched`` — the seeds of ONE grid cell (same mgm/cap heads).
  * ``fine_tune_batched_cells`` — CROSS-CELL batching: cells with different
    ``mgm_heads`` run together by zero-padding the per-head mixer params to the
    group max and activating a per-run prefix at runtime
    (`models/params.pad_mixer_params` + ``forward(mgm_active=...)``); inactive
    heads are masked exactly and receive exactly-zero gradients, so every run
    computes what its unpadded cell would. ``cap_heads`` sets the CAP MHA head
    split (reference `transformer.py:66`) and is NOT paddable — a group must
    share it (the reference grids sweep mgm over 2..256 but cap only 2..32, so
    grouping by cap still batches the long axis).

Runs must share episode shapes (same dataset split sizes), which the protocol
satisfies by construction.

Episodes are gathered ON DEVICE: each run's train split stays resident (the
same stacked arrays the validation forward reads) and the loop uploads only
the per-step fold indices (~KB) — mirroring the single-run fused step
(`finetune.py::step_and_val`).
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
from multimodalpfn_tpu.models.params import (
    get_subspace_noise,
    init_mixer_params,
    pad_mixer_params,
    slice_mixer_params,
)
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

# Remat only when the stacked runs' saved activations would not fit HBM.
# Saved bytes scale with runs x rows x TOKENS (feature groups + image tokens
# + y), not rows alone: a 200-feature dataset saves ~9x more per row than
# PAD-UFES's 23 tokens. Recalibrated on v5e (16 GB) after the compute-dtype
# residual-LN saves + fused item sublayer halved per-layer saved bytes
# (`probe_sweep_noremat_n8.py`): 8x1470 rows x 23 tokens = 270k token-rows
# now runs remat-free at 897 ms/step vs 1081 with remat (MFU 0.164 vs 0.136);
# 12x1470x23 = 406k reproducibly exceeds HBM at compile. 300k splits the
# measured boundary with margin for optimizer/episode buffers.
_REMAT_TOKEN_ROWS = 300_000


def sweep_use_remat(n_runs: int, ep_rows: int, n_tok: int) -> bool:
    """Shared remat on/off decision for the vmapped sweep step.

    Used by both the production loop and ``bench.py``'s sweep measurement so
    the bench always times the program production dispatches.
    """
    return n_runs * ep_rows * n_tok > _REMAT_TOKEN_ROWS


def sweep_needs_token_mask(mixer_on: bool, padded: bool, mixer_type: str) -> bool:
    """Whether a batched group's forward carries a token_valid mask.

    Only padded MGM/MoE mixers vary the TOKEN COUNT with mgm_heads; MGM+CAP
    emits exactly cap_heads tokens for every run (the CAP queries are never
    padded), so the reference's actual hetero grid (mgm 2..256 × shared cap,
    `configs/pad_ufes_20.yaml:1-4`) batches with NO transformer-level mask —
    and therefore runs the full fused/flash kernel path. The padding cost is
    confined to the mixer (inactive MGM heads, masked exactly in
    `mixers.apply_mixer`).
    """
    return mixer_on and padded and mixer_type in ("MGM", "MoE")


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
    """Fine-tune len(seeds) independent runs of ONE grid cell simultaneously."""
    cell = {"mgm_heads": mgm_heads, "cap_heads": cap_heads, "seeds": list(seeds)}
    if run_splits is not None:
        cell["run_splits"] = run_splits
    return fine_tune_batched_cells(
        cells=[cell],
        mixer_type=mixer_type,
        features_per_group=features_per_group,
        path_to_base_model=path_to_base_model,
        task_type=task_type,
        X=X,
        image=image,
        y=y,
        finetuning_config=finetuning_config,
        validation_metric=validation_metric,
        freeze_input=freeze_input,
        val_fraction=val_fraction,
        time_limit=time_limit,
        mesh=mesh,
    )


def fine_tune_batched_cells(
    *,
    cells: list[dict[str, Any]],
    mixer_type: str,
    features_per_group: int,
    path_to_base_model: str = "auto",
    task_type: str = "multiclass",
    X: np.ndarray | None,
    image: np.ndarray | None,
    y: np.ndarray,
    finetuning_config: dict[str, Any] | None = None,
    validation_metric: str = "log_loss",
    freeze_input: bool = True,
    val_fraction: float = 0.2,
    time_limit: float = 3600,
    mesh=None,
    static_seed: int | None = None,
) -> dict[str, Any]:
    """Fine-tune cells × seeds independent runs in ONE vmapped step stream.

    ``cells``: each ``{"mgm_heads", "cap_heads", "seeds", ["run_splits"]}``.
    Every run r: its own mixer init (at its cell's TRUE head count, then padded),
    its own train/val split, its own episode stream. Returns per-run histories
    and stacked final (eval) params; use `extract_run_params` to recover a
    run's checkpoint at its cell's true shape.
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

    # ---- flatten runs; compute the padded group shape
    run_cells: list[tuple[int, int]] = [
        (ci, int(s)) for ci, c in enumerate(cells) for s in c["seeds"]
    ]
    n_runs = len(run_cells)
    mgm_max = max(int(c["mgm_heads"]) for c in cells)
    caps = {int(c["cap_heads"]) for c in cells}
    if mixer_type == "MGM+CAP" and image is not None and len(caps) != 1:
        raise ValueError(
            f"cap_heads must be shared across a batched group (got {sorted(caps)}):"
            " it sets the CAP attention head split and cannot be padded"
        )
    cap_heads = int(cells[0]["cap_heads"])
    padded = len({int(c["mgm_heads"]) for c in cells}) > 1
    if static_seed is None:
        static_seed = run_cells[0][1]

    loaded = initialize_model(
        model_path=path_to_base_model,
        which="classifier" if is_clf else "regressor",
        static_seed=int(static_seed),
        mixer_type=mixer_type if image is not None else "none",
        mgm_heads=mgm_max,
        cap_heads=cap_heads,
        features_per_group=features_per_group,
    )
    on_accel = jax.devices()[0].platform not in ("cpu",)
    cfg = dataclasses.replace(
        loaded.config,
        compute_dtype="bfloat16" if on_accel else "float32",
        use_flash=on_accel,
    )

    # ---- per-run (train, val) index splits with identical sizes
    splits: list[tuple[np.ndarray, np.ndarray]] = []
    for ci, s in run_cells:
        cell_splits = cells[ci].get("run_splits")
        if cell_splits is not None:
            r = cells[ci]["seeds"].index(s)
            tr, va = cell_splits[r]
            splits.append((np.asarray(tr), np.asarray(va)))
        else:
            n = len(y)
            n_val = int(round(n * val_fraction))
            rng = np.random.default_rng(int(s))
            perm = rng.permutation(n)
            splits.append((perm[n_val:], perm[:n_val]))
    sizes = {(len(tr), len(va)) for tr, va in splits}
    assert len(sizes) == 1, "all runs must share split sizes (static shapes)"

    def gather(arr, idx):
        return None if arr is None else arr[idx]

    samplers = [
        EpisodeSampler(
            X=gather(X, tr), image=gather(image, tr), y=y[tr],
            is_classification=is_clf, seed=4213 + int(s),
        )
        for (_, s), (tr, _va) in zip(run_cells, splits)
    ]

    # ---- stacked params: base weights broadcast; per-run mixer init at the
    # cell's TRUE head count (strict=False semantics per run), padded to group
    mixer_on = image is not None and mixer_type != "none"
    run_mixer_cfgs = [
        dataclasses.replace(
            cfg.mixer, mgm_heads=int(cells[ci]["mgm_heads"]), cap_heads=cap_heads
        )
        for ci, _ in run_cells
    ]
    params_stacked = jax.tree.map(
        lambda p: jnp.broadcast_to(p, (n_runs, *p.shape)), loaded.params
    )
    if mixer_on:
        mixers = [
            pad_mixer_params(
                init_mixer_params(jax.random.PRNGKey(int(s)), mc, cfg.emsize),
                cfg.mixer,
            )
            for (_, s), mc in zip(run_cells, run_mixer_cfgs)
        ]
        params_stacked = dict(params_stacked)
        params_stacked["mixer"] = jax.tree.map(lambda *xs: jnp.stack(xs), *mixers)

    # ---- per-run runtime extras: active head counts + noise-table overrides
    extras: dict[str, jnp.ndarray] = {}
    if mixer_on and padded:
        extras["mgm_active"] = jnp.asarray(
            [int(cells[ci]["mgm_heads"]) for ci, _ in run_cells], jnp.int32
        )
        if (
            mixer_type != "MGM+CAP"
            and cfg.feature_positional_embedding == "subspace"
        ):
            # MGM/MoE token counts vary with mgm_heads and torch noise draws
            # are not prefix-stable: each run carries its active-count table
            n_img = image.shape[-2] if image.ndim == 4 else 1
            f_tab = 0
            if X is not None:
                F = X.shape[-1]
                f_tab = -(-F // features_per_group)
            sub = cfg.emsize // 4
            per_img = n_img if mixer_type == "MGM" else 1
            n_pad = mgm_max * per_img
            tabs = []
            for ci, _ in run_cells:
                n_act = int(cells[ci]["mgm_heads"]) * per_img
                tab = get_subspace_noise(cfg.model_seed, f_tab + n_act, sub)
                tabs.append(np.pad(tab, ((0, n_pad - n_act), (0, 0))))
            extras["feat_pos_noise"] = jnp.asarray(np.stack(tabs))

    borders = None
    if task == "regression":
        borders = jnp.asarray(np.asarray(loaded.criterion_borders, np.float32))
    loss_fn = get_loss_fn(task, borders)
    scorer = get_scorer(validation_metric)

    # Training runs the fused sublayer kernels whenever the forward carries no
    # token_valid mask, same as the single-run path (`train/finetune.py`): vmap
    # batches the custom-VJP Pallas calls correctly (the run axis becomes a
    # leading grid dim; grads match XLA to ~1e-6 on TPU —
    # tools/probes/probe_vmap_fused.py). See `sweep_needs_token_mask`: only
    # padded MGM/MoE groups mask tokens; hetero MGM+CAP groups (the reference
    # grid's shape) run the full fused/flash path.
    train_cfg = dataclasses.replace(
        cfg,
        fused_ops=on_accel
        and not sweep_needs_token_mask(mixer_on, padded, mixer_type),
    )

    mask = frozen_input_mask(loaded.params, freeze_input)
    tx = make_optimizer(
        hps["learning_rate"], optimizer=hps["optimizer"], freeze_mask=mask
    )

    def one_step(state: TrainState, idx_tr, idx_te, rng, ex, vd):
        # Episodes are gathered ON DEVICE from the run's resident train split
        # (the same stacked arrays the validation forward reads): per step the
        # host uploads ~KB of fold indices instead of the episodes' ~MB of
        # rows/embeddings — the dominant steady-state cost over a
        # remote-accelerator link (mirrors the single-run fused step,
        # `finetune.py::step_and_val`). idx_* are (b, s) into the per-run
        # train subset; vd entries are (1, n_tr, ...) after vmap.
        batch = {
            "y_train": vd["y_train"][0][idx_tr],
            "y_test": vd["y_train"][0][idx_te],
        }
        if vd.get("x_train") is not None:
            batch["x_train"] = vd["x_train"][0][idx_tr]
            batch["x_test"] = vd["x_train"][0][idx_te]
        if vd.get("image_train") is not None:
            batch["image_train"] = vd["image_train"][0][idx_tr]
            batch["image_test"] = vd["image_train"][0][idx_te]

        ep_rows = (
            batch["y_train"].shape[-1] + batch["y_test"].shape[-1]
        )
        n_feat = batch["x_train"].shape[-1] if batch.get("x_train") is not None else 0
        n_tok = (
            -(-n_feat // cfg.features_per_group)
            + (batch["image_train"].shape[-2] if batch.get("image_train") is not None else 0)
            + 1
        )
        use_remat = sweep_use_remat(n_runs, ep_rows, n_tok)

        def compute_loss(p):
            logits = forward_train_test(
                p, train_cfg,
                batch.get("x_train"), batch["y_train"], batch.get("x_test"),
                batch.get("image_train"), batch.get("image_test"),
                train=True, rng=rng, remat=use_remat,
                mgm_active=ex.get("mgm_active"),
                feat_pos_noise=ex.get("feat_pos_noise"),
            )
            return loss_fn(logits, batch["y_test"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    batched_step = jax.jit(jax.vmap(one_step), donate_argnums=(0,))

    # vmapped validation forward (per-run split context); same kernel set as
    # the train step (fused for non-padded groups)
    val_data = _stack_val(X, image, y, splits)

    @jax.jit
    def val_logits(params_s):
        return jax.vmap(
            lambda p, d, ex: forward_train_test(
                p, train_cfg,
                d.get("x_train"), d["y_train"], d.get("x_val"),
                d.get("image_train"), d.get("image_val"),
                mgm_active=ex.get("mgm_active"),
                feat_pos_noise=ex.get("feat_pos_noise"),
            )
        )(params_s, val_data, extras)

    state = jax.vmap(lambda p: init_train_state(p, tx))(params_stacked)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_runs = NamedSharding(mesh, P("dp"))
        state = jax.device_put(state, jax.tree.map(lambda _: shard_runs, state))

    def score_logits(logits: np.ndarray) -> np.ndarray:
        # host-side scoring of already-fetched (runs, 1, n_val, n_out) logits
        errs = []
        for r in range(n_runs):
            lo = logits[r, 0]
            _, va = splits[r]
            if task == "regression":
                from multimodalpfn_tpu.models.bar_distribution import (
                    FullSupportBarDistribution,
                )

                pred = np.asarray(
                    FullSupportBarDistribution(borders).mean(jnp.asarray(lo))
                )
            else:
                z = lo - lo.max(-1, keepdims=True)
                pred = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
                n_classes = int(y.max()) + 1
                pred = pred[:, :n_classes]
                pred = pred / pred.sum(-1, keepdims=True)
            errs.append(scorer.convert_score_to_error(scorer(y[va], pred)))
        return np.asarray(errs)

    from multimodalpfn_tpu.train.step import eval_params as sf_eval

    # The loop is FULLY ASYNC: per-step losses and periodic validation logits
    # stay on device (both are KB-sized) and are fetched ONCE after the loop,
    # so the sweep advances as back-to-back dispatches with no host sync —
    # nothing here needs a device value mid-loop (no early stopping; the best
    # snapshot is a min over the recorded history).
    is_sf = hps["optimizer"] == "schedule_free_adamw"
    loss_hist: list = []
    val_logit_hist: list[tuple[int, Any]] = [(0, val_logits(state.params))]
    key = jax.random.PRNGKey(0)

    for step_i in range(1, int(hps["max_steps"]) + 1):
        if time.time() - st > time_limit:
            break
        idx = _stack_batches([s.sample_indices(1) for s in samplers])
        key, sub = jax.random.split(key)
        subs = jax.random.split(sub, n_runs)
        state, losses = batched_step(
            state, idx["train_idx"], idx["test_idx"], subs, extras, val_data
        )
        loss_hist.append(losses)
        if step_i % int(hps["validate_every_n_steps"]) == 0:
            val_logit_hist.append((step_i, val_logits(sf_eval(state, is_sf))))

    p_final = sf_eval(state, is_sf)
    history = {
        "train_loss": [np.asarray(l).tolist() for l in loss_hist],
        "val_error": [
            (si, score_logits(np.asarray(lg)).tolist())
            for si, lg in val_logit_hist
        ],
    }
    best_err = np.min(
        np.asarray([errs for _, errs in history["val_error"]]), axis=0
    )
    history["best_val_error"] = best_err.tolist()
    history["wall_s"] = time.time() - st
    return {
        "history": history,
        "params_stacked": p_final,
        "config": cfg,
        "splits": splits,
        "criterion_borders": loaded.criterion_borders,
        "run_cells": run_cells,
        "run_mixer_cfgs": run_mixer_cfgs if mixer_on else None,
    }


def extract_run_params(result: dict[str, Any], r: int) -> tuple[dict, Any]:
    """Run r's final params at its cell's TRUE mixer shape, plus the matching
    ModelConfig — ready for `models.loading.save_model`."""
    params_r = jax.tree.map(lambda p: p[r], result["params_stacked"])
    cfg = result["config"]
    mixer_cfgs = result.get("run_mixer_cfgs")
    if mixer_cfgs is not None and "mixer" in params_r:
        mc = mixer_cfgs[r]
        params_r = dict(params_r)
        params_r["mixer"] = slice_mixer_params(params_r["mixer"], mc)
        cfg = dataclasses.replace(cfg, mixer=mc)
    return params_r, cfg


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
