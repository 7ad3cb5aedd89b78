"""End-to-end HPO experiment demo on the TPU: the reference run.py protocol
(grid cells × multi-seed finetune + evaluate) on PAD-UFES-shaped synthetic data
with the full-size architecture, seeds vmapped. Writes results/hpo_demo.json."""

import json
import logging
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
    from multimodalpfn_tpu.hpo.experiment import run_experiment

    repo = pathlib.Path(__file__).resolve().parent.parent
    results_dir = repo / "results"
    results_dir.mkdir(exist_ok=True)
    X, emb, y = pad_ufes_like(seed=0)
    t0 = time.time()
    study = run_experiment(
        X=X,
        embeddings=emb,
        y=y,
        n_categorical=18,
        config={
            "mgm_heads_list": [4, 8],
            "cap_heads_list": [2],
            "features_per_group": 1,
            "mixer_type": "MGM+CAP",
        },
        dataset_name="pad_ufes_like_demo",
        path_to_base_model="random:0",
        n_seeds=2,
        results_path=str(results_dir / "hpo_demo.json"),
        checkpoint_dir="/tmp/hpo_demo_ckpts",
        finetuning_config={"max_steps": 5, "validate_every_n_steps": 5},
        time_limit=1800,
        vmapped_seeds=True,
    )
    out = {
        "best_params": study.best_params,
        "best_value": study.best_value,
        "table": study.results_table(),
        "wall_s": round(time.time() - t0, 1),
    }
    (results_dir / "hpo_demo_summary.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
