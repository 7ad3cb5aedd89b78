"""Experiment driver (L6): grid-sweep over mixer head counts with per-cell
multi-seed fine-tune + fit/predict evaluation.

Protocol parity with reference `mmpfn/run.py:26-201`: for each (mgm_heads,
cap_heads) cell (skipping mgm < cap), 5 seeds of {random 80/20 split,
NaN -> column-nanmin - 1 impute, 100-step fine-tune at lr 1e-5 with frozen input
encoders, reload fine-tuned ckpt with preprocessing disabled
(FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=[none]), fit + predict accuracy};
the study maximizes mean accuracy.

TPU-first: the driver is a library function (not two shell scripts pinning
CUDA_VISIBLE_DEVICES, `run0.sh`/`run1.sh`); seeds can be fanned out across the dp
mesh axis and cells stream through one process with compile reuse.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import numpy as np
import yaml

from multimodalpfn_tpu.hpo.study import GridStudy, Trial, TrialPruned

logger = logging.getLogger(__name__)


def nanmin_impute(X: np.ndarray) -> np.ndarray:
    """NaN -> column nanmin - 1 (reference `run.py:61-66`)."""
    X = np.array(X, dtype=np.float64, copy=True)
    for i in range(X.shape[1]):
        col = X[:, i]
        if np.isnan(col).any():
            col[np.isnan(col)] = np.nanmin(col) - 1 if np.isfinite(np.nanmin(col)) else -1
    return X


def evaluate_cell(
    *,
    X: np.ndarray,
    embeddings: np.ndarray,
    y: np.ndarray,
    n_categorical: int,
    mgm_heads: int,
    cap_heads: int,
    mixer_type: str = "MGM+CAP",
    features_per_group: int = 2,
    n_seeds: int = 5,
    path_to_base_model: str = "auto",
    checkpoint_dir: str = "./checkpoints",
    dataset_name: str = "dataset",
    finetuning_config: dict | None = None,
    time_limit: int = 60,
    vmapped_seeds: bool = False,
) -> dict[str, Any]:
    """One grid cell: n_seeds × (split, impute, fine-tune, evaluate).

    With ``vmapped_seeds`` all seeds fine-tune simultaneously in one vmapped
    step stream (train/finetune_batch.py) instead of sequentially."""
    if vmapped_seeds:
        return _evaluate_cell_vmapped(
            X=X, embeddings=embeddings, y=y, n_categorical=n_categorical,
            mgm_heads=mgm_heads, cap_heads=cap_heads, mixer_type=mixer_type,
            features_per_group=features_per_group, n_seeds=n_seeds,
            path_to_base_model=path_to_base_model, checkpoint_dir=checkpoint_dir,
            dataset_name=dataset_name, finetuning_config=finetuning_config,
            time_limit=time_limit,
        )
    from sklearn.metrics import accuracy_score

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    accs = []
    for seed in range(n_seeds):
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(y))
        ntr = int(len(y) * 0.8)
        tr, te = perm[:ntr], perm[ntr:]
        X_train, X_test = nanmin_impute(X[tr]), nanmin_impute(X[te])
        y_train, y_test = y[tr], y[te]
        image_train, image_test = embeddings[tr], embeddings[te]

        save_path = Path(checkpoint_dir) / f"finetuned_mmpfn_{dataset_name}.ckpt"
        try:
            fine_tune_mmpfn(
                mixer_type=mixer_type,
                mgm_heads=mgm_heads,
                cap_heads=cap_heads,
                features_per_group=features_per_group,
                path_to_base_model=path_to_base_model,
                save_path_to_fine_tuned_model=save_path,
                time_limit=time_limit,
                finetuning_config={
                    "learning_rate": 1e-5,
                    "max_steps": 100,
                    **(finetuning_config or {}),
                },
                validation_metric="log_loss",
                task_type="multiclass",
                X_train=X_train,
                image_train=image_train,
                y_train=y_train,
                random_seed=seed,
                freeze_input=True,
            )
        except Exception as e:  # reference run.py:72-98 continues on failure
            logger.warning("fine-tuning failed (seed %d): %r", seed, e)
            continue

        no_preproc = ModelInterfaceConfig(
            FINGERPRINT_FEATURE=False,
            PREPROCESS_TRANSFORMS=[PreprocessorConfig(name="none")],
        )
        clf = MMPFNClassifier(
            model_path=save_path,
            inference_config=no_preproc,
            ignore_pretraining_limits=True,
            mixer_type=mixer_type,
            mgm_heads=mgm_heads,
            cap_heads=cap_heads,
            features_per_group=features_per_group,
            categorical_features_indices=list(range(n_categorical)),
        )
        clf.fit(X_train, image_train, y_train)
        acc = accuracy_score(y_test, clf.predict(X_test, image_test))
        logger.info("seed %d accuracy %.4f", seed, acc)
        accs.append(acc)

    return {
        "mean_accuracy": float(np.mean(accs)) if accs else 0.0,
        "std_accuracy": float(np.std(accs)) if accs else 0.0,
        "n_completed_seeds": len(accs),
    }


def _evaluate_cell_vmapped(
    *,
    X,
    embeddings,
    y,
    n_categorical,
    mgm_heads,
    cap_heads,
    mixer_type,
    features_per_group,
    n_seeds,
    path_to_base_model,
    checkpoint_dir,
    dataset_name,
    finetuning_config,
    time_limit,
) -> dict[str, Any]:
    """All seeds of a grid cell fine-tuned in ONE vmapped step stream; per-seed
    evaluation then reuses the batched inference engine."""
    from sklearn.metrics import accuracy_score

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    import jax

    seeds = list(range(n_seeds))
    n = len(y)
    ntr = int(n * 0.8)
    outer = {}
    for s in seeds:
        rng = np.random.default_rng(s)
        perm = rng.permutation(n)
        outer[s] = (perm[:ntr], perm[ntr:])

    # all runs share shapes because every outer-train set has size ntr; each run
    # fine-tunes ONLY on its outer-train rows (no leakage of the outer test set):
    # inner 80/20 split of outer-train, passed explicitly per run
    Xi = nanmin_impute(X)
    run_splits = []
    for s in seeds:
        tr, _te = outer[s]
        rng = np.random.default_rng(10_000 + s)
        inner = rng.permutation(len(tr))
        n_val = int(round(len(tr) * 0.2))
        run_splits.append((tr[inner[n_val:]], tr[inner[:n_val]]))
    out = fine_tune_batched(
        run_splits=run_splits,
        mixer_type=mixer_type,
        mgm_heads=mgm_heads,
        cap_heads=cap_heads,
        features_per_group=features_per_group,
        path_to_base_model=path_to_base_model,
        X=Xi,
        image=embeddings,
        y=y,
        seeds=seeds,
        finetuning_config={"learning_rate": 1e-5, "max_steps": 100,
                           **(finetuning_config or {})},
        time_limit=time_limit,
    )

    no_preproc = ModelInterfaceConfig(
        FINGERPRINT_FEATURE=False,
        PREPROCESS_TRANSFORMS=[PreprocessorConfig(name="none")],
    )
    accs = []
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    for r, s in enumerate(seeds):
        params_r = jax.tree.map(lambda p: p[r], out["params_stacked"])
        path = ckpt_dir / f"finetuned_mmpfn_{dataset_name}_seed{s}.ckpt"
        save_model(
            path, params_r, out["config"],
            criterion_borders=out.get("criterion_borders"),
        )
        tr, te = outer[s]
        clf = MMPFNClassifier(
            model_path=path,
            inference_config=no_preproc,
            ignore_pretraining_limits=True,
            mixer_type=mixer_type,
            mgm_heads=mgm_heads,
            cap_heads=cap_heads,
            features_per_group=features_per_group,
            categorical_features_indices=list(range(n_categorical)),
        )
        clf.fit(Xi[tr], embeddings[tr], y[tr])
        accs.append(accuracy_score(y[te], clf.predict(Xi[te], embeddings[te])))
    return {
        "mean_accuracy": float(np.mean(accs)) if accs else 0.0,
        "std_accuracy": float(np.std(accs)) if accs else 0.0,
        "n_completed_seeds": len(accs),
    }


def run_experiment_cross_cell(
    *,
    X: np.ndarray,
    embeddings: np.ndarray,
    y: np.ndarray,
    n_categorical: int,
    config: dict[str, Any],
    dataset_name: str = "dataset",
    path_to_base_model: str = "auto",
    n_seeds: int = 5,
    results_path: str | None = None,
    checkpoint_dir: str = "./checkpoints",
    finetuning_config: dict | None = None,
    time_limit: int = 3600,
    max_runs_per_group: int = 64,
    mesh=None,
) -> GridStudy:
    """CROSS-CELL batched grid sweep: cells sharing cap_heads run their
    seeds × cells as ONE vmapped fine-tune stream (padded mixers, see
    train/finetune_batch.fine_tune_batched_cells), so the 64-run mesh
    north star applies across the grid, not only within one cell.

    Groups are keyed by cap_heads (the CAP attention head split is not
    paddable); within a group, runs are chunked to ``max_runs_per_group`` to
    bound stacked-optimizer memory.
    """
    from sklearn.metrics import accuracy_score

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig
    from multimodalpfn_tpu.train.finetune_batch import (
        extract_run_params,
        fine_tune_batched_cells,
    )

    mixer_type = config.get("mixer_type", "MGM+CAP")
    fpg = config.get("features_per_group", 2)
    grid = [
        (int(m), int(c))
        for m in config["mgm_heads_list"]
        for c in config["cap_heads_list"]
    ]
    seeds = list(range(n_seeds))
    n = len(y)
    ntr = int(n * 0.8)
    Xi = nanmin_impute(X)

    def outer_split(s):
        perm = np.random.default_rng(s).permutation(n)
        return perm[:ntr], perm[ntr:]

    def inner_split(s, tr):
        rng = np.random.default_rng(10_000 + s)
        inner = rng.permutation(len(tr))
        n_val = int(round(len(tr) * 0.2))
        return tr[inner[n_val:]], tr[inner[:n_val]]

    # group valid cells by cap (pruned cells recorded below)
    groups: dict[int, list[dict]] = {}
    for m, c in grid:
        if m < c:  # reference run.py:34-35
            continue
        run_splits = [inner_split(s, outer_split(s)[0]) for s in seeds]
        groups.setdefault(c, []).append(
            {"mgm_heads": m, "cap_heads": c, "seeds": seeds,
             "run_splits": run_splits}
        )

    cell_results: dict[tuple[int, int], dict] = {}
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    no_preproc = ModelInterfaceConfig(
        FINGERPRINT_FEATURE=False,
        PREPROCESS_TRANSFORMS=[PreprocessorConfig(name="none")],
    )

    for cap, cells in groups.items():
        # chunk whole cells so a chunk never exceeds max_runs_per_group runs
        per_cell = len(seeds)
        cells_per_chunk = max(1, max_runs_per_group // per_cell)
        for i in range(0, len(cells), cells_per_chunk):
            chunk = cells[i : i + cells_per_chunk]
            logger.info(
                "cross-cell group cap=%d: %d cells x %d seeds in one stream",
                cap, len(chunk), per_cell,
            )
            out = fine_tune_batched_cells(
                cells=chunk,
                mixer_type=mixer_type,
                features_per_group=fpg,
                path_to_base_model=path_to_base_model,
                X=Xi,
                image=embeddings,
                y=y,
                finetuning_config={"learning_rate": 1e-5, "max_steps": 100,
                                   **(finetuning_config or {})},
                time_limit=time_limit,
                static_seed=seeds[0],
                mesh=mesh,
            )
            for r, (ci, s) in enumerate(out["run_cells"]):
                m = chunk[ci]["mgm_heads"]
                params_r, cfg_r = extract_run_params(out, r)
                path = ckpt_dir / (
                    f"finetuned_mmpfn_{dataset_name}_m{m}c{cap}_seed{s}.ckpt"
                )
                save_model(path, params_r, cfg_r,
                           criterion_borders=out.get("criterion_borders"))
                tr, te = outer_split(s)
                clf = MMPFNClassifier(
                    model_path=path,
                    inference_config=no_preproc,
                    ignore_pretraining_limits=True,
                    mixer_type=mixer_type,
                    mgm_heads=m,
                    cap_heads=cap,
                    features_per_group=fpg,
                    categorical_features_indices=list(range(n_categorical)),
                )
                clf.fit(Xi[tr], embeddings[tr], y[tr])
                acc = accuracy_score(y[te], clf.predict(Xi[te], embeddings[te]))
                cell_results.setdefault((m, cap), {"accs": []})["accs"].append(acc)

    # record every grid cell as a trial (pruned where mgm < cap)
    study = GridStudy(
        search_space={
            "mgm_heads": list(config["mgm_heads_list"]),
            "cap_heads": list(config["cap_heads_list"]),
        },
        direction="maximize",
    )
    for m, c in grid:
        trial = Trial(
            number=len(study.trials), params={"mgm_heads": m, "cap_heads": c}
        )
        study.trials.append(trial)
        if m < c:
            trial.state = "pruned"
            continue
        accs = cell_results.get((m, c), {}).get("accs", [])
        trial.value = float(np.mean(accs)) if accs else 0.0
        trial.state = "complete"
        trial.set_user_attr("std_accuracy", float(np.std(accs)) if accs else 0.0)
        trial.set_user_attr("n_completed_seeds", len(accs))
    if results_path:
        study.save(results_path)
    return study


def run_experiment(
    *,
    X: np.ndarray,
    embeddings: np.ndarray,
    y: np.ndarray,
    n_categorical: int,
    config: dict[str, Any],
    dataset_name: str = "dataset",
    path_to_base_model: str = "auto",
    n_seeds: int = 5,
    results_path: str | None = None,
    **cell_kwargs,
) -> GridStudy:
    """Full grid sweep for one dataset. ``config`` uses the reference YAML schema
    (`configs/pad_ufes_20.yaml`): mgm_heads_list, cap_heads_list,
    features_per_group, mixer_type."""
    study = GridStudy(
        search_space={
            "mgm_heads": list(config["mgm_heads_list"]),
            "cap_heads": list(config["cap_heads_list"]),
        },
        direction="maximize",
    )

    def objective(trial: Trial) -> float:
        mgm = trial.suggest_categorical("mgm_heads", config["mgm_heads_list"])
        cap = trial.suggest_categorical("cap_heads", config["cap_heads_list"])
        if mgm < cap:  # reference run.py:34-35
            raise TrialPruned
        result = evaluate_cell(
            X=X,
            embeddings=embeddings,
            y=y,
            n_categorical=n_categorical,
            mgm_heads=mgm,
            cap_heads=cap,
            mixer_type=config.get("mixer_type", "MGM+CAP"),
            features_per_group=config.get("features_per_group", 2),
            n_seeds=n_seeds,
            path_to_base_model=path_to_base_model,
            dataset_name=dataset_name,
            **cell_kwargs,
        )
        trial.set_user_attr("std_accuracy", result["std_accuracy"])
        trial.set_user_attr("n_completed_seeds", result["n_completed_seeds"])
        return result["mean_accuracy"]

    study.optimize(objective, catch=(Exception,))
    if results_path:
        study.save(results_path)
    return study


def load_experiment_config(path: str | Path) -> dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)
