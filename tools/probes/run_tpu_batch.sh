#!/bin/bash
# One-shot measurement batch for when the axon TPU tunnel is reachable.
# Runs the round-3 perf probes back-to-back (single-core host: run alone).
set -x
cd /root/repo
echo "=== sweep N=4 (item-major + residual_ln + padless kernels)"
timeout 2400 python tools/probes/probe_sweep_direct.py 4
echo "=== sweep N=8 no-remat (HBM fit check after save reductions)"
timeout 2400 python tools/probes/probe_sweep_direct.py 8
echo "=== finetune program compile breakdown"
timeout 2400 python tools/probes/probe_ft_compile.py
echo "=== batch done"
