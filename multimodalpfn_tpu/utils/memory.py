"""Device-memory estimation and batch splitting.

The reference manages GPU peak memory by chunking flat-batch ops inside the model
(`mmpfn/models/mmpfn/model/memory.py:33-389`, `support_save_peak_mem_factor` +
`MemoryUsageEstimator`). On TPU under XLA that in-op chunking is an anti-pattern
(it fragments fusions and the MXU pipeline); the equivalent levers are:

  * a closed-form activation estimate (this module) used to split the *ensemble
    member batch* into device-sized chunks before launching;
  * rematerialization (``remat=True`` on the forward) for training;
  * the Pallas blockwise item-attention kernel, which bounds attention memory by
    block size instead of materializing the (S_q, S_kv) matrix.
"""

from __future__ import annotations

from typing import Iterator

import jax


def device_memory_bytes() -> int:
    """Best-effort per-device memory; falls back to 16 GiB (v5e HBM)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024**3


def estimate_forward_bytes(
    cfg, *, batch: int, seq_len: int, n_feature_tokens: int
) -> int:
    """Closed-form activation estimate for one batched forward (the spirit of
    reference `memory.py:146-226`, re-derived for the XLA execution plan).

    Dominant terms per layer: the state (b, s, t, e), the item-attention
    score matrix (b, t, h, s_q, s_kv) — bounded by block size once the Pallas
    kernel is active — and MLP hidden (b, s, t, nhid).
    """
    t = n_feature_tokens + 1
    e, h, nhid = cfg.emsize, cfg.nhead, cfg.nhid
    bytes_per = 2 if cfg.compute_dtype == "bfloat16" else 4
    state = batch * seq_len * t * e * bytes_per
    attn_scores = batch * t * h * seq_len * seq_len * bytes_per
    mlp_hidden = batch * seq_len * t * nhid * bytes_per
    # XLA keeps a couple of fusion buffers alive concurrently, not the whole stack
    return int(3 * state + attn_scores + mlp_hidden)


def split_batch_for_memory(
    batch: int, cfg, *, seq_len: int, n_feature_tokens: int, budget: int | None = None
) -> Iterator[range]:
    """Yield batch ranges sized to fit the device memory budget."""
    budget = budget if budget is not None else int(device_memory_bytes() * 0.8)
    per_one = max(
        estimate_forward_bytes(
            cfg, batch=1, seq_len=seq_len, n_feature_tokens=n_feature_tokens
        ),
        1,
    )
    chunk = max(1, min(batch, budget // per_one))
    for start in range(0, batch, chunk):
        yield range(start, min(start + chunk, batch))
