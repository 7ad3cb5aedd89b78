"""Full sweep-step A/B of raising the Pallas scoped-VMEM limit.

`probe_feat_block_sweep.py` hinted the fused feature-attn kernel runs ~25%
faster with `vmem_limit_bytes` raised from Mosaic's default to 100 MB (v5e has
128 MB physical) at the SHIPPED block size — presumably better double-buffering
headroom, no block-shape change. This measures the decision at the level that
matters: bench.sweep_metrics (the driver's north-star number), interleaved
A/B/A/B to reject tunnel drift, with every fused kernel picking up the limit.
"""
import sys

sys.path.insert(0, ".")

import bench
import multimodalpfn_tpu.ops.pallas_fused as pf

VMEM_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 100

orig = pf._compiler_params


def _raised(*semantics):
    from jax.experimental.pallas import tpu as pltpu

    p = orig(*semantics)
    if p is None:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=semantics, vmem_limit_bytes=VMEM_MB * 1024 * 1024
    )


results = []
for rep in range(2):
    for name, fn in ((f"vmem-{VMEM_MB}MB", _raised), ("vmem-default", orig)):
        pf._compiler_params = fn
        m = bench.sweep_metrics(n_runs=4, n_steps=10, n_reps=2)
        print(f"[{rep}] {name:14s} {m['sweep_step_ms']:8.2f} ms  "
              f"mfu {m['sweep_mfu']:.4f}", flush=True)
        results.append((name, m["sweep_step_ms"]))
pf._compiler_params = orig

import numpy as np
for name in (f"vmem-{VMEM_MB}MB", "vmem-default"):
    vals = [v for n, v in results if n == name]
    print(f"{name:14s} median {np.median(vals):8.2f} ms")
