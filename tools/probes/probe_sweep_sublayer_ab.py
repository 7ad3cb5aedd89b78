"""Full sweep-step A/B of the fully-fused item SUBLAYER kernel.

Runs bench.sweep_metrics (the driver's north-star measurement) with the
`fused_item_sublayer` dispatch active vs disabled (old composition:
fused_item_attention + XLA residual_ln), interleaved A/B/A/B to reject
tunnel drift. Decides whether the sublayer fusion earns its dispatch branch.
"""
import sys

sys.path.insert(0, ".")

import bench
import multimodalpfn_tpu.models.transformer as tr

orig = tr._max_fused_item_rows

results = []
for rep in range(2):
    for name, fn in (("sublayer-fused", orig), ("old-composition", lambda: 0)):
        tr._max_fused_item_rows = fn
        m = bench.sweep_metrics(n_runs=4, n_steps=10, n_reps=2)
        print(f"[{rep}] {name:16s} {m['sweep_step_ms']:8.2f} ms  "
              f"mfu {m['sweep_mfu']:.4f}", flush=True)
        results.append((name, m["sweep_step_ms"]))
tr._max_fused_item_rows = orig

import numpy as np
for name in ("sublayer-fused", "old-composition"):
    vals = [v for n, v in results if n == name]
    print(f"{name:16s} median {np.median(vals):8.2f} ms")
