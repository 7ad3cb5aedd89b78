#!/usr/bin/env python
"""Experiment CLI (L6 driver, replaces reference `mmpfn/run.py` + run0.sh/run1.sh).

Usage:
    python scripts/run_experiment.py <dataset> [task] [--data-root data]
        [--config configs/<dataset>.yaml] [--base-model auto] [--seeds 5]

Datasets: pad_ufes_20 | cbis_ddsm | petfinder | cloth | airbnb | salary
(cbis_ddsm task: mass | calc; petfinder task: image | text | all).

Loads the dataset + cached embeddings, sweeps the (mgm_heads, cap_heads) grid from
the YAML config, writes results to results/<dataset>[_<task>].json (the reference
collated stdout logs into charts/*.csv by hand).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("task", nargs="?", default=None)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--config", default=None)
    ap.add_argument("--base-model", default="auto")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--results-dir", default="results")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    from multimodalpfn_tpu.datasets.loaders import (
        CBISDDSMDataset,
        DATASETS,
        PetfinderDataset,
    )
    from multimodalpfn_tpu.hpo.experiment import load_experiment_config, run_experiment

    cfg_path = args.config or REPO / "configs" / f"{args.dataset}.yaml"
    config = load_experiment_config(cfg_path)

    name = args.dataset
    root = Path(args.data_root)
    if name == "cbis_ddsm":
        kind = args.task or "mass"
        ds = CBISDDSMDataset(
            str(root / "cbis_ddsm"),
            data_name=f"{kind}_case_description_train_set.csv",
            kind=kind,
            image_type=config.get("image_type", "all"),
        )
        ds.get_embeddings()
        tag = f"{name}_{kind}"
    elif name == "petfinder":
        ds = PetfinderDataset(str(root / "petfinder_adoption"))
        ds.get_embeddings(multimodal_type=args.task or "all")
        tag = f"{name}_{args.task or 'all'}"
    else:
        cls = DATASETS[name]
        ds = cls(str(root / name))
        ds.get_embeddings()
        tag = name

    results_dir = Path(args.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    study = run_experiment(
        X=ds.x.astype(float),
        embeddings=ds.embeddings,
        y=ds.y,
        n_categorical=len(ds.cat_features),
        config=config,
        dataset_name=tag,
        path_to_base_model=args.base_model,
        n_seeds=args.seeds,
        results_path=str(results_dir / f"{tag}.json"),
    )
    print(json.dumps({"best_params": study.best_params, "best_value": study.best_value}))


if __name__ == "__main__":
    main()
