"""Episode fine-tuning harness.

API/semantics anchor: reference `scripts_finetune_mm/finetune_mmpfn_main.py:78-486`
(`fine_tune_mmpfn`): load base ckpt, optionally freeze input encoders, 80/20
stratified validation split, save initial snapshot, then up to ``max_steps``
steps of one-K-fold-episode-per-step training with clipped schedule-free AdamW,
validating each ``validate_every_n_steps`` and keeping the best-by-validation
snapshot.

TPU-first differences:
  * the whole protocol compiles to ONE program: step + schedule-free eval
    interpolation + validation forward fuse behind a traced ``apply_update``
    flag, reused for every episode (constant shapes by construction);
  * compiled programs are memoized ACROSS fine_tune_mmpfn calls
    (``_finetune_programs``) and are model_seed-independent (the subspace
    noise table rides as a traced argument), so an HPO sweep compiles once;
  * episodes are gathered ON DEVICE from the resident train set via ~KB fold
    index uploads (train/data.py::sample_indices) instead of ~MB row uploads;
  * no GradScaler: bf16 forward with fp32 params/optimizer needs no loss
    scaling; the sublayers run fused Pallas kernels fwd AND bwd
    (ops/pallas_fused.py);
  * episodes can batch on a leading axis (dp-shardable);
  * best-snapshot / resume-state writes stream through a background writer
    (train/snapshots.py); saved both orbax-native and reference-torch-format.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import logging
import os
import threading
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.loading import save_model, save_native
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.data import EpisodeSampler
from multimodalpfn_tpu.train.early_stopping import AdaptiveES
from multimodalpfn_tpu.train.losses import get_loss_fn
from multimodalpfn_tpu.train.metrics import get_scorer
from multimodalpfn_tpu.train.snapshots import (
    AsyncSnapshotWriter,
    submit_final_write,
)
from multimodalpfn_tpu.train.step import (
    eval_params,
    frozen_input_mask,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from multimodalpfn_tpu.utils.compile_cache import (
    apply_compile_effort,
    compile_effort_scope,
    enable_persistent_cache,
    resolve_compile_effort,
)

logger = logging.getLogger(__name__)

CLASSIFICATION_TASKS = ("multiclass", "multiclass_classification", "binary", "binary_classification")


def _save_train_state_file(path, state) -> None:
    from multimodalpfn_tpu.train.step import save_train_state

    save_train_state(path, state)


def _canon_task(task_type: str) -> str:
    t = task_type.lower()
    if t in ("multiclass", "multiclass_classification"):
        return "multiclass"
    if t in ("binary", "binary_classification"):
        return "binary"
    if t == "regression":
        return "regression"
    raise ValueError(f"Unknown task_type {task_type}")


def create_val_data(*, X, image, y, rng, is_classification):
    """Size-dependent validation split (reference `validation_utils.py:17-88`)."""
    from sklearn.model_selection import train_test_split

    n = len(y)
    test_size = 0.2 if n < 500_000 else (0.1 if n < 1_000_000 else 0.05)
    arrays = [a for a in (X, image) if a is not None]
    out = train_test_split(
        *arrays,
        y,
        test_size=test_size,
        random_state=rng,
        stratify=y if is_classification else None,
    )
    it = iter(out)
    X_tr = X_va = im_tr = im_va = None
    if X is not None:
        X_tr, X_va = next(it), next(it)
    if image is not None:
        im_tr, im_va = next(it), next(it)
    y_tr, y_va = next(it), next(it)
    return X_tr, X_va, im_tr, im_va, y_tr, y_va


# Device-side pytree copy shared by all fine-tune calls (donation safety for
# async snapshotting). Module-level so repeated calls reuse one compiled copy
# program per shape.
_snap_copy = jax.jit(lambda p: jax.tree.map(jnp.copy, p))


def _n_episode_feature_tokens(cfg, n_tab_features: int, n_img: int) -> int | None:
    """Feature-axis token count of the fine-tune forward, or None if unknown
    for this mixer type. Mirrors the token-append logic in
    models/transformer.py (feature groups + mixer output tokens) and the
    per-mixer counts in models/mixers.py::apply_mixer."""
    f_tab = -(-n_tab_features // cfg.features_per_group) if n_tab_features else 0
    if n_img == 0:
        return f_tab
    mt = cfg.mixer.mixer_type
    if mt == "MGM":
        return f_tab + cfg.mixer.mgm_heads * n_img
    if mt == "MGM+CAP":
        return f_tab + cfg.mixer.cap_heads
    if mt == "MoE":
        return f_tab + cfg.mixer.mgm_heads
    return None


_PROGRAM_CACHE: dict[tuple, dict[str, Any]] = {}
_PROGRAM_CACHE_MAX = 8


def _finetune_programs(
    cfg, task: str, borders, lr: float, optimizer: str,
    freeze_input: bool, params, remat: bool = True,
) -> dict[str, Any]:
    """Compiled fine-tuning programs, memoized ACROSS fine_tune_mmpfn calls.

    Each call used to rebuild its jit closures, so every HPO trial re-paid the
    ~40-50 s XLA compile of the fused step+validation program even inside one
    process (the reference protocol is grid x 5 seeds of 100-step runs,
    `run.py:26-201`). Keyed on everything that changes the traced computation;
    regression borders enter via a content digest (they are a host-side numpy
    constant embedded in the loss). The subspace noise table is a traced
    argument, so callers pass model_seed-normalized configs and seeds share
    one compile.
    """
    borders_key = (
        None
        if borders is None
        else hashlib.blake2b(
            np.ascontiguousarray(borders).tobytes(), digest_size=16
        ).hexdigest()
    )
    key = (cfg, task, borders_key, float(lr), str(optimizer),
           bool(freeze_input), bool(remat))
    progs = _PROGRAM_CACHE.get(key)
    if progs is not None:
        return progs

    loss_fn = get_loss_fn(task, borders)
    mask = frozen_input_mask(params, freeze_input)
    tx = make_optimizer(lr, optimizer=optimizer, freeze_mask=mask)
    train_step = make_train_step(cfg, loss_fn, tx, remat=remat)
    is_sf = optimizer == "schedule_free_adamw"

    # The validation set and noise table are jit ARGUMENTS, not closed over: a
    # closed-over device array becomes an HLO constant that lowering reads
    # back from the device — minutes over a remote-accelerator link — and
    # would also fragment this cache per dataset.
    @jax.jit
    def val_forward(p, vd, noise):
        # same cfg as the step: validation is forward-only, so the fused
        # sublayer kernels apply on their inference path automatically
        return forward_train_test(
            p, cfg, vd["x_tr"], vd["y_tr"], vd["x_va"], vd["i_tr"],
            vd["i_va"], feat_pos_noise=noise,
        )

    # ``apply_update`` is a traced 0/1 scalar: with 0 the state (params AND
    # optimizer moments) passes through unchanged, so the same compiled
    # program also serves the pre-training validation — the whole protocol
    # compiles ONE large XLA program instead of two.
    #
    # The episode is passed as INDEX ARRAYS (b, s) and gathered on device
    # from the full train set already resident in ``vd``: per step the host
    # uploads ~6 KB of indices instead of the episode's ~9 MB of rows — the
    # dominant steady-state cost over a remote-accelerator link.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_and_val(state, idx_tr, idx_te, rng, apply_update, vd, noise):
        batch = {
            "y_train": vd["y_tr"][0][idx_tr],
            "y_test": vd["y_tr"][0][idx_te],
        }
        if vd["x_tr"] is not None:
            batch["x_train"] = vd["x_tr"][0][idx_tr]
            batch["x_test"] = vd["x_tr"][0][idx_te]
        if vd["i_tr"] is not None:
            batch["image_train"] = vd["i_tr"][0][idx_tr]
            batch["image_test"] = vd["i_tr"][0][idx_te]
        if noise is not None:
            batch["feat_pos_noise"] = noise
        new_state, metrics = train_step(state, batch, rng)
        new_state = jax.tree.map(
            lambda n, o: jnp.where(apply_update, n, o), new_state, state
        )
        p_eval = eval_params(new_state, is_sf)
        # p_eval is also RETURNED: the loop snapshots it when the validation
        # score (fetched one step later, pipelined) turns out to be the best,
        # without re-running the schedule-free interpolation
        return new_state, metrics, val_forward(p_eval, vd, noise), p_eval

    progs = {
        "tx": tx,
        "train_step": train_step,
        "val_forward": val_forward,
        "step_and_val": step_and_val,
        "is_sf": is_sf,
    }
    if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
    _PROGRAM_CACHE[key] = progs
    return progs


def fine_tune_mmpfn(
    *,
    mixer_type: str,
    mgm_heads: int,
    cap_heads: int,
    features_per_group: int,
    save_path_to_fine_tuned_model: str | Path,
    path_to_base_model: str | Path = "auto",
    time_limit: int = 3600,
    finetuning_config: dict[str, Any] | None = None,
    validation_metric: str = "log_loss",
    categorical_features_index=None,  # accepted for API parity; encoders are on-device
    task_type: str = "multiclass",
    device: str | None = None,  # accepted for API parity; device comes from JAX
    y_train: np.ndarray = None,
    X_train: np.ndarray | None = None,
    image_train: np.ndarray | None = None,
    X_val: np.ndarray | None = None,
    y_val: np.ndarray | None = None,
    image_val: np.ndarray | None = None,
    random_seed: int = 42,
    logger_level: int = 20,
    freeze_input: bool = False,
    episode_batch_size: int = 1,
    use_early_stopping: bool = False,
    compute_dtype: str | None = None,
    resume: bool = False,
    state_checkpoint_every: int = 25,
) -> dict[str, Any]:
    """Fine-tune and save best-by-validation snapshots. Returns a history dict."""
    logger.setLevel(logger_level)
    enable_persistent_cache()
    apply_compile_effort()
    st_time = time.time()
    phase_seconds: dict[str, float] = {}
    task = _canon_task(task_type)
    is_classification = task != "regression"
    cfg_hp = {
        "learning_rate": 1e-5,
        "max_steps": 100,
        "validate_every_n_steps": 1,
        "optimizer": "schedule_free_adamw",
        "adaptive_rate": 0.2,
        "adaptive_offset": 5,
        "min_patience": 50,
        "max_patience": 100,
        **(finetuning_config or {}),
    }

    # Short protocol runs are compile-dominated; resolve the lowered-effort
    # default up front (full rationale at the loop below) so the one-shot
    # programs dispatched during setup (random init) compile cheaply too.
    persistent_cache_on = bool(
        os.environ.get("MMPFN_JAX_CACHE_DIR")
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    )
    protocol_effort = resolve_compile_effort(
        -0.5
        if int(cfg_hp["max_steps"]) <= 10_000 and not persistent_cache_on
        else None
    )

    t_phase = time.time()
    with compile_effort_scope(protocol_effort):
        loaded = initialize_model(
            model_path=path_to_base_model,
            which="classifier" if is_classification else "regressor",
            static_seed=random_seed,
            mixer_type=mixer_type if image_train is not None else "none",
            mgm_heads=mgm_heads,
            cap_heads=cap_heads,
            features_per_group=features_per_group,
        )
    phase_seconds["model_init"] = time.time() - t_phase
    cfg = loaded.config
    on_accel = jax.devices()[0].platform not in ("cpu",)
    if compute_dtype is None:
        compute_dtype = "bfloat16" if on_accel else "float32"
    cfg = dataclasses.replace(
        cfg, compute_dtype=compute_dtype, use_flash=on_accel,
        # fused sublayer kernels carry fused Pallas backwards (pallas_fused.py)
        fused_ops=on_accel,
    )
    params = loaded.params
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("fine-tuning %s params", f"{n_params:,}")

    # ---- validation split (unless provided)
    rng = np.random.RandomState(random_seed)
    if X_val is None and y_val is None:
        X_train, X_val, image_train, image_val, y_train, y_val = create_val_data(
            X=X_train, image=image_train, y=y_train, rng=rng,
            is_classification=is_classification,
        )
    y_train = np.asarray(y_train, dtype=np.float32)
    y_val = np.asarray(y_val, dtype=np.float32)

    # ---- losses / metrics
    borders = None
    if task == "regression":
        # numpy here: the program cache hashes the borders by content (tiny
        # 4 KB array); FullSupportBarDistribution normalizes to jnp itself
        borders = np.asarray(loaded.criterion_borders, dtype=np.float32)
    scorer = get_scorer(validation_metric)

    # ---- subspace noise as a traced argument (seed-independent programs)
    # The table is a function of model_seed; baking it into the program as a
    # constant would force a fresh XLA compile per seed. Passing it as an
    # argument lets an HPO sweep's 5 seeds share one compiled program.
    feat_noise = None
    key_cfg = cfg
    if cfg.feature_positional_embedding == "subspace":
        n_img = 0
        if image_train is not None:
            im_arr = np.asarray(image_train)
            n_img = im_arr.shape[-2] if im_arr.ndim >= 3 else 1
        f_total = _n_episode_feature_tokens(
            cfg, 0 if X_train is None else int(np.asarray(X_train).shape[-1]),
            n_img,
        )
        if f_total is not None:
            from multimodalpfn_tpu.models.params import get_subspace_noise

            feat_noise = jax.device_put(
                get_subspace_noise(
                    cfg.model_seed, f_total, cfg.emsize // 4
                ).astype(np.float32)
            )
            key_cfg = dataclasses.replace(cfg, model_seed=0)

    # ---- optimizer + step (compiled programs memoized across calls)
    # Rematerialization trades ~8% step time for activation memory; with the
    # fused/flash kernels activations are linear in rows, so small contexts
    # skip it (12 layers x 3 sublayer inputs ~ 0.25 GB at 4k rows, bf16).
    n_rows = len(y_train)
    use_remat = n_rows > 4096
    t_phase = time.time()
    progs = _finetune_programs(
        key_cfg, task, borders, cfg_hp["learning_rate"],
        cfg_hp["optimizer"], freeze_input, params, remat=use_remat,
    )
    tx = progs["tx"]
    train_step = progs["train_step"]
    step_and_val = progs["step_and_val"]
    val_forward = progs["val_forward"]
    is_sf = progs["is_sf"]
    state = init_train_state(params, tx)
    phase_seconds["optimizer_setup"] = time.time() - t_phase

    # exact resume (params + optimizer state + step) — beyond the reference,
    # which can only restart from weight snapshots
    state_path = Path(str(save_path_to_fine_tuned_model) + ".state.npz")
    start_step = 0
    if resume and state_path.exists():
        from multimodalpfn_tpu.train.step import restore_train_state

        state = restore_train_state(state_path, state)
        start_step = int(jax.device_get(state.step))
        logger.info("resumed fine-tuning at step %d", start_step)

    # ---- validation data (context = train rows, queries = val rows)
    # Staged on host in numpy (an eager device `[None]` reshape is a compiled
    # op on a remote backend), then moved once with a single device_put so the
    # per-step fused program doesn't re-upload the validation set.
    val_data = jax.device_put(
        {
            "x_tr": None
            if X_train is None
            else np.asarray(X_train, np.float32)[None],
            "y_tr": np.asarray(y_train, np.float32)[None],
            "x_va": None if X_val is None else np.asarray(X_val, np.float32)[None],
            "i_tr": None
            if image_train is None
            else np.asarray(image_train, np.float32)[None],
            "i_va": None
            if image_val is None
            else np.asarray(image_val, np.float32)[None],
        }
    )

    def score_val_logits(logits: np.ndarray) -> float:
        """Host-side scoring of already-fetched validation logits (b=0 row)."""
        if task == "regression":
            from multimodalpfn_tpu.models.bar_distribution import (
                FullSupportBarDistribution,
            )

            y_pred = np.asarray(
                FullSupportBarDistribution(borders).mean(jnp.asarray(logits))
            )
        else:
            z = logits - logits.max(axis=-1, keepdims=True)
            y_pred = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
            n_classes = int(y_train.max()) + 1
            y_pred = y_pred[:, :n_classes]
            y_pred = y_pred / y_pred.sum(axis=-1, keepdims=True)
        score = scorer(y_val, y_pred)
        return scorer.convert_score_to_error(score)

    def validate(p) -> float:
        return score_val_logits(
            np.asarray(val_forward(p, val_data, feat_noise))[0]
        )

    # Fused step+validation: when validating every step (the reference
    # protocol), one compiled program per step and ONE host fetch — the axon
    # tunnel costs ~30ms per sync, so separate loss/grad-norm/validation
    # fetches dominated the steady-state step time.
    validate_inline = int(cfg_hp["validate_every_n_steps"]) == 1

    def with_noise(batch: dict) -> dict:
        return batch if feat_noise is None else {**batch, "feat_pos_noise": feat_noise}

    save_path = Path(save_path_to_fine_tuned_model)
    save_path.parent.mkdir(parents=True, exist_ok=True)

    def save_snapshot(p):
        save_model(
            save_path, p, cfg,
            ckpt_config=loaded.ckpt_config,
            criterion_borders=loaded.criterion_borders,
        )

    # Snapshots are written by a background thread (the device->host fetch can
    # be minutes over a remote-accelerator link; see train/snapshots.py). The
    # submitted pytree is device-copied first (module-level _snap_copy)
    # because the live `state` buffers are donated into the next step.
    snap_writer = AsyncSnapshotWriter(save_snapshot)
    state_writer = AsyncSnapshotWriter(
        lambda st: _save_train_state_file(state_path, st)
    )

    will_train = int(cfg_hp["max_steps"]) > start_step

    # Short protocol runs are compile-dominated (the reference protocol is 100
    # steps; measured cold wall 372 s of which ~4/5 is XLA compile): default
    # their compiles to lowered exec-time effort. Break-even vs the ~11%
    # steady-step cost is ~11k steps, so long runs keep XLA's default quality.
    # With a persistent compile cache opted in, warm processes skip the
    # compile entirely — lowered effort would then pay the +11% step cost for
    # zero compile savings (and the cache would pin the lowered-quality
    # executable forever), so the default stays at full quality there.
    # The scope covers exactly the dispatches that compile the protocol's
    # programs; nothing else in the process is affected. MMPFN_COMPILE_EFFORT
    # overrides in both directions ("0" forces XLA's default everywhere).
    # (protocol_effort is resolved before model init, above.)

    # In non-inline mode two programs exist (standalone validation + train
    # step); overlap their compiles: a throwaway step on a COPIED state (the
    # jit donates its input) compiles in the background while the initial
    # validation compiles the inference program. JAX dedups in-flight
    # compiles, so the real first step just waits for this one.
    def _prewarm():
        try:
            warm_sampler = EpisodeSampler(
                X=X_train, image=image_train, y=y_train,
                is_classification=is_classification,
            )
            batch0 = warm_sampler.sample(episode_batch_size)
            # the effort scope is thread-local: re-enter it on this thread
            with compile_effort_scope(protocol_effort):
                train_step(
                    _snap_copy(state), with_noise(batch0), jax.random.PRNGKey(0)
                )
        except Exception:  # pragma: no cover - prewarm is best-effort
            logger.debug("compile prewarm failed", exc_info=True)

    if will_train and not validate_inline:
        threading.Thread(
            target=_prewarm, name="mmpfn-compile-prewarm", daemon=True
        ).start()

    # ---- initial validation + snapshot (reference `finetune_mmpfn_main.py:321,352`)
    t_phase = time.time()
    with compile_effort_scope(protocol_effort):
        if validate_inline and will_train:
            # ride the fused program with apply_update=0: validates the INITIAL
            # params through the one program the loop will reuse
            warm_sampler = EpisodeSampler(
                X=X_train, image=image_train, y=y_train,
                is_classification=is_classification,
            )
            idx0 = warm_sampler.sample_indices(episode_batch_size)
            _st, _m, logits0, _p = step_and_val(
                _snap_copy(state), idx0["train_idx"], idx0["test_idx"],
                jax.random.PRNGKey(random_seed), 0.0, val_data, feat_noise,
            )
            best_err = score_val_logits(np.asarray(logits0)[0])
            del _st, _m, _p
        else:
            best_err = validate(state.params)
    phase_seconds["initial_validation"] = time.time() - t_phase
    snap_writer.submit(_snap_copy(state.params))
    logger.info(
        "initial validation error: %.5f (model init %.1fs, first validation %.1fs)",
        best_err, phase_seconds["model_init"], phase_seconds["initial_validation"],
    )

    sampler = EpisodeSampler(
        X=X_train, image=image_train, y=y_train, is_classification=is_classification
    )
    try:  # progress bar parity (reference `finetune_mmpfn_main.py:376-382`)
        from tqdm import tqdm

        pbar = tqdm(
            total=int(cfg_hp["max_steps"]),
            initial=start_step,
            disable=logger_level >= 20,
            desc="fine-tune",
        )
    except ImportError:  # pragma: no cover
        pbar = None
    es = AdaptiveES(
        adaptive_rate=cfg_hp["adaptive_rate"],
        adaptive_offset=cfg_hp["adaptive_offset"],
        min_patience=cfg_hp["min_patience"],
        max_patience=cfg_hp["max_patience"],
    )
    history = {
        "train_loss": [],
        "grad_norm": [],
        "val_error": [],
        "best_val_error": best_err,
        "steps": 0,
        # wall-clock per loop iteration (step + validation + snapshotting);
        # entry 0 includes compilation — use the tail for steady-state rates
        "step_seconds": [],
    }
    key = jax.random.PRNGKey(random_seed)

    # NOTE on a rejected design: pipelining the host fetch (process step i-1's
    # results after dispatching step i) measures WORSE on the axon relay
    # (0.37 vs 0.22 s/step, reproducible A/B) — the relay serializes transfers
    # behind queued compute, so the "overlapped" fetch just waits out the next
    # step. The loop therefore fetches synchronously each iteration.
    # Best-snapshot cadence: now that training actually improves validation
    # on MOST steps (post lr fix), submitting every improvement makes the
    # writer thread do back-to-back device fetches + torch.save serialization
    # on the single host core, starving the training loop (measured 0.2 ->
    # 1.68 s/step on the 1-validation-per-step protocol). The best params are
    # instead HELD as a device-side copy (one buffer set of HBM, ~free) and
    # the writer is fed at a time cadence; the final best is always flushed
    # at drain, so the on-disk contract (reference
    # `finetune_mmpfn_main.py:440-450`: best-by-validation) is unchanged —
    # mid-run writes are crash resilience only.
    snap_interval_s = float(os.environ.get("MMPFN_SNAPSHOT_INTERVAL_S", "60"))
    best_snap: list = [None]  # device-side copy of the best eval params
    best_submitted: list = [None]  # identity of the last payload submitted
    last_snap_t = [time.time()]

    def record_best(p_eval_dev) -> None:
        best_snap[0] = _snap_copy(p_eval_dev)
        if time.time() - last_snap_t[0] >= snap_interval_s:
            snap_writer.submit(best_snap[0])
            best_submitted[0] = best_snap[0]
            last_snap_t[0] = time.time()

    def process_result(res: tuple) -> bool:
        """Fetch + score one step's device results; returns True to early-stop."""
        nonlocal best_err
        pi, p_t, p_metrics, p_vl, p_eval_dev = res
        fetched = jax.device_get(
            {"loss": p_metrics["loss"], "gn": p_metrics["grad_norm"], "vl": p_vl}
        )
        loss = float(fetched["loss"])
        history["train_loss"].append(loss)
        history["grad_norm"].append(float(fetched["gn"]))
        history["steps"] = pi
        err = score_val_logits(np.asarray(fetched["vl"])[0])
        history["val_error"].append((pi, err))
        is_best = err < best_err
        if is_best:
            best_err = err
            history["best_val_error"] = err
            record_best(p_eval_dev)
        if pbar is not None:
            pbar.update(1)
            pbar.set_postfix(loss=f"{loss:.4f}", best_val=f"{best_err:.4f}")
        stop = es.update(cur_round=pi, is_best=is_best)
        history["step_seconds"].append(time.time() - p_t)
        return use_early_stopping and stop

    last_eval: tuple[int | None, Any] = (None, None)
    for step_i in range(start_step + 1, int(cfg_hp["max_steps"]) + 1):
        t_iter = time.time()
        if time.time() - st_time > time_limit:
            logger.info("time limit reached at step %d", step_i)
            break
        if state_checkpoint_every and step_i % state_checkpoint_every == 0:
            state_writer.submit(_snap_copy(state))
        key, sub = jax.random.split(key)
        if validate_inline:
            idx = sampler.sample_indices(episode_batch_size)
            state, metrics, val_logits_dev, p_eval_dev = step_and_val(
                state, idx["train_idx"], idx["test_idx"], sub, 1.0,
                val_data, feat_noise,
            )
            # the fused program already emitted this step's eval params; the
            # final orbax snapshot reuses the LAST one (no standalone
            # eval_params program ever compiles in inline mode)
            last_eval = (step_i, p_eval_dev)
            if process_result(
                (step_i, t_iter, metrics, val_logits_dev, p_eval_dev)
            ):
                logger.info("early stopping at step %d", step_i)
                break
            continue
        # non-inline: synchronous step; validation on its own cadence
        batch = sampler.sample(episode_batch_size)
        if step_i == start_step + 1:
            # close the prewarm race: if this dispatch beats the prewarm
            # thread to the step program's compile, it must still compile at
            # the protocol effort (JAX dedups in-flight compiles, so whoever
            # wins sets the quality — both now run under the scope)
            with compile_effort_scope(protocol_effort):
                state, metrics = train_step(state, with_noise(batch), sub)
        else:
            state, metrics = train_step(state, with_noise(batch), sub)
        fetched = jax.device_get(
            {"loss": metrics["loss"], "gn": metrics["grad_norm"]}
        )
        loss, gn = float(fetched["loss"]), float(fetched["gn"])
        history["train_loss"].append(loss)
        history["grad_norm"].append(gn)
        history["steps"] = step_i
        if pbar is not None:
            pbar.update(1)
            pbar.set_postfix(loss=f"{loss:.4f}", best_val=f"{best_err:.4f}")
        if step_i % int(cfg_hp["validate_every_n_steps"]) == 0:
            p_eval = eval_params(state, is_sf)
            err = validate(p_eval)
            history["val_error"].append((step_i, err))
            is_best = err < best_err
            if is_best:
                best_err = err
                history["best_val_error"] = err
                record_best(p_eval)
            stop = es.update(cur_round=step_i, is_best=is_best)
            if use_early_stopping and stop:
                history["step_seconds"].append(time.time() - t_iter)
                logger.info("early stopping at step %d", step_i)
                break
        history["step_seconds"].append(time.time() - t_iter)


    if pbar is not None:
        pbar.close()
    # drain the async writers: guarantees the best torch-format snapshot and
    # the resume state are on disk. A background write error must not discard
    # the completed run — it is logged and recorded in the history, and the
    # final orbax snapshot below is still attempted (a caller can recover the
    # best weights from it: it holds the final state + best_val_error).
    t_phase = time.time()
    # the throttled cadence may have skipped the final best — flush it now so
    # close() writes it (close drains the latest pending payload)
    if best_snap[0] is not None and best_snap[0] is not best_submitted[0]:
        snap_writer.submit(best_snap[0])
    write_errors: list[str] = []
    for writer in (snap_writer, state_writer):
        try:
            writer.close()
        except Exception as e:
            logger.error("background snapshot write failed: %r", e)
            write_errors.append(repr(e))
    if write_errors:
        history["snapshot_write_errors"] = write_errors
    phase_seconds["final_snapshot_flush"] = time.time() - t_phase
    # orbax-native snapshot of the final state alongside the torch-format
    # best — fire-and-forget: its device->host fetch is ~30 s over the remote
    # link and the artifact is crash-resilience beyond the reference's
    # deliverable, so the protocol wall does not wait on it (interpreter exit
    # does; immediate reloaders call snapshots.wait_for_pending_snapshots())
    t_phase = time.time()
    if last_eval[0] is not None and last_eval[0] == history["steps"]:
        # inline mode: the last fused step already emitted eval params
        p_final = last_eval[1]
    else:
        with compile_effort_scope(protocol_effort):
            p_final = eval_params(state, is_sf)  # device-side
    n_steps_final = float(history["steps"])
    submit_final_write(
        lambda: save_native(
            str(save_path) + ".orbax",
            p_final,
            cfg,
            best_val_error=float(best_err),
            steps=n_steps_final,
        ),
        name="mmpfn-final-orbax",
    )
    phase_seconds["final_native_snapshot_submit"] = time.time() - t_phase
    history["wall_s"] = time.time() - st_time
    history["phase_seconds"] = phase_seconds
    return history
