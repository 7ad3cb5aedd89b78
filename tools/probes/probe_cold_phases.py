"""Probe: where the cold 100-step protocol wall goes (round-3 verdict #4).

Runs the bench's exact finetune protocol ONCE in this process (cold: no
program-cache hits, persistent cache off) and prints the phase breakdown the
harness already records (model_init / optimizer_setup / initial_validation /
snapshot flushes) plus the first-iteration wall (compile-included) and the
steady tail, so the ≤90 s target can be attacked where the seconds actually
are. Run in a FRESH process on the TPU: `python tools/probes/probe_cold_phases.py`.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.pop("MMPFN_JAX_CACHE_DIR", None)
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like  # noqa: E402


def main():
    X, emb, y = pad_ufes_like(seed=0)
    ntr = int(len(X) * 0.8)
    import tempfile

    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        hist = fine_tune_mmpfn(
            mixer_type="MGM+CAP",
            mgm_heads=16,
            cap_heads=8,
            features_per_group=1,
            save_path_to_fine_tuned_model=f"{td}/m.ckpt",
            path_to_base_model="random:0",
            X_train=X[:ntr],
            image_train=emb[:ntr],
            y_train=y[:ntr],
            finetuning_config={"max_steps": 100, "validate_every_n_steps": 1},
            random_seed=0,
            logger_level=30,
        )
        wall = time.time() - t0
        from multimodalpfn_tpu.train.snapshots import wait_for_pending_snapshots

        wait_for_pending_snapshots()  # before the tempdir dies; after the wall
    ss = hist["step_seconds"]
    print(json.dumps({
        "wall_s": round(wall, 1),
        "phase_seconds": {k: round(v, 2) for k, v in hist["phase_seconds"].items()},
        "first_iter_s": round(ss[0], 2),
        "iters_1_5_s": [round(s, 3) for s in ss[1:6]],
        "steady_median_s": round(float(np.median(ss[5:])), 3),
        "steps_total_s": round(float(np.sum(ss)), 1),
        "n_steps": len(ss),
    }))


if __name__ == "__main__":
    main()
