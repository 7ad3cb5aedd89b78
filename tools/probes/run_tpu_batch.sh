#!/bin/bash
# One-shot measurement batch for when the axon TPU tunnel is reachable.
# Runs the round-3 perf probes back-to-back (single-core host: run alone).
set -x
cd /root/repo
echo "=== sweep N=4 (item-major + residual_ln + padless kernels)"
timeout 2400 python tools/probes/probe_sweep_direct.py 4
echo "=== sweep N=8 no-remat (HBM fit check after save reductions)"
timeout 2400 python tools/probes/probe_sweep_direct.py 8
echo "=== sweep N=16 (residency scaling; may OOM — failure is data)"
timeout 2400 python tools/probes/probe_sweep_direct.py 16 || true
echo "=== sweep N=4 device trace (op-level attribution)"
timeout 2400 python tools/probes/probe_sweep_trace.py 4
echo "=== finetune program compile breakdown"
timeout 2400 python tools/probes/probe_ft_compile.py
echo "=== persistent compile cache: cold write process"
rm -rf /tmp/mmpfn_cache
MMPFN_JAX_CACHE_DIR=/tmp/mmpfn_cache timeout 2400 python tools/probes/probe_ft_compile.py fused
echo "=== persistent compile cache: warm second process"
MMPFN_JAX_CACHE_DIR=/tmp/mmpfn_cache timeout 2400 python tools/probes/probe_ft_compile.py fused
echo "=== full bench refresh"
timeout 5400 python bench.py | tee /tmp/bench_r3.json
echo "=== batch done"
