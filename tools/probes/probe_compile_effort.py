"""A/B the XLA optimization-effort knobs on the cold 100-step protocol.

Runs bench.finetune_protocol_seconds in fresh subprocesses with
MMPFN_COMPILE_EFFORT unset vs lowered; reports cold / warm / steady so we see
both the compile-second win and the step-time cost.
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
import bench
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
X, emb, y = pad_ufes_like(seed=0)
cold, warm, steady, _raw = bench.finetune_protocol_seconds(X, emb, y)
print("RESULT " + json.dumps({"cold": cold, "warm": warm, "steady": steady}))
"""

for effort in ("", "-0.5", "-1.0"):
    env = dict(os.environ)
    env.pop("MMPFN_COMPILE_EFFORT", None)
    if effort:
        env["MMPFN_COMPILE_EFFORT"] = effort
    out = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        env=env, timeout=1200,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        print(f"effort={effort or 'default':8s} FAILED\n{out.stderr[-800:]}")
        continue
    r = json.loads(line[0][7:])
    print(
        f"effort={effort or 'default':8s} cold {r['cold']:7.1f} s   "
        f"warm {r['warm']:6.1f} s   steady {r['steady']*1e3:7.1f} ms/step",
        flush=True,
    )
