"""Probe: cold-protocol A/B — read-only reuse of a pre-warmed persistent XLA
cache (round-5 verdict #7).

Round 2 measured cache WRITES stalling minutes over the axon tunnel and
disabled the persistent cache by default; cache READS were never measured
separately. This probe runs the 100-step fine-tune protocol in three fresh
subprocesses:

  A. no cache            — the shipped default (baseline cold wall)
  B. cache dir, writes on — pays the write stall once, populates the cache
  C. same cache dir, READ-ONLY (MMPFN_JAX_CACHE_READONLY=1) — the candidate:
     if reads are cheap, C's wall approaches the warm in-process wall (~48 s)

Usage: python tools/probes/probe_cache_readonly_ab.py [reps]
"""

import os
import subprocess
import sys
import tempfile
import time

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1

_PROTO = r"""
import sys, time, tempfile
from pathlib import Path
sys.path.insert(0, "/root/repo")
from multimodalpfn_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn
from multimodalpfn_tpu.train.snapshots import wait_for_pending_snapshots
X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
t0 = time.time()
with tempfile.TemporaryDirectory() as td:
    fine_tune_mmpfn(
        mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8, features_per_group=1,
        save_path_to_fine_tuned_model=Path(td) / "ft.ckpt",
        path_to_base_model="random:0",
        finetuning_config={"max_steps": 100, "validate_every_n_steps": 1},
        X_train=X[:ntr], image_train=emb[:ntr], y_train=y[:ntr],
        random_seed=0, freeze_input=True, logger_level=30,
    )
    wall = time.time() - t0
    wait_for_pending_snapshots()
print(f"PROTO_WALL_S {wall:.1f}", flush=True)
"""


def run(label: str, env_extra: dict) -> float:
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", _PROTO], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    total = time.time() - t0
    wall = None
    for line in out.stdout.splitlines():
        if line.startswith("PROTO_WALL_S"):
            wall = float(line.split()[1])
    print(f"{label:28s} proto_wall={wall} process_total={total:.1f} "
          f"rc={out.returncode}", flush=True)
    if out.returncode != 0:
        print(out.stdout[-2000:], out.stderr[-2000:], flush=True)
    return wall if wall is not None else float("nan")


cache_dir = tempfile.mkdtemp(prefix="mmpfn_xla_cache_")
print(f"cache dir: {cache_dir}", flush=True)

for rep in range(REPS):
    a = run("A: no cache (baseline)", {"MMPFN_JAX_CACHE_DIR": ""})
    b = run("B: cache, writes ON", {"MMPFN_JAX_CACHE_DIR": cache_dir})
    c = run("C: cache, READ-ONLY", {
        "MMPFN_JAX_CACHE_DIR": cache_dir, "MMPFN_JAX_CACHE_READONLY": "1",
    })
    c2 = run("C2: read-only, repeat", {
        "MMPFN_JAX_CACHE_DIR": cache_dir, "MMPFN_JAX_CACHE_READONLY": "1",
    })
    print(f"rep {rep}: baseline={a:.1f} write={b:.1f} readonly={c:.1f} "
          f"readonly2={c2:.1f}", flush=True)
