"""Does the n=8 (and beyond) vmapped sweep fit HBM WITHOUT remat now?

`_REMAT_TOKEN_ROWS` was set before the compute-dtype residual-LN saves and the
fused item sublayer halved per-layer saved bytes; its comment says to
recalibrate with a real N=8 probe. This is that probe: forces remat off at
rising n_runs until OOM, reporting step time + MFU at each point.
"""
import sys

sys.path.insert(0, ".")

import bench
import multimodalpfn_tpu.train.finetune_batch as fb

ns = [int(a) for a in sys.argv[1:]] or [8, 12, 16]

fb.sweep_use_remat = lambda n_runs, ep_rows, n_tok: False
# bench imports the symbol by name at call time? No: `from ... import
# sweep_use_remat` inside sweep_metrics body -> re-imported per call, so the
# module attribute patch above is what it sees.

for n in ns:
    try:
        m = bench.sweep_metrics(n_runs=n, n_steps=10, n_reps=2)
        print(
            f"n={n:3d} remat=off  {m['sweep_step_ms']:8.2f} ms  "
            f"steps/s {m['sweep_steps_per_s']:6.2f}  mfu {m['sweep_mfu']:.4f}",
            flush=True,
        )
    except Exception as e:
        print(f"n={n:3d} remat=off  FAILED: {repr(e)[:200]}", flush=True)
        break
