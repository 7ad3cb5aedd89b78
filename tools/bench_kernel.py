"""Micro-benchmark: flash kernel vs XLA at bench-scale shapes (real TPU).

The axon tunnel adds ~30ms fixed round-trip latency per host sync, swamping
single-op timings. We therefore chain the op N times inside ONE jit (lax.scan
with a carry data-dependency) and report (t_N - t_1) / (N - 1).

Usage: python tools/bench_kernel.py [fwd|bwd|mq|all] [S]
Headline shape (PAD-UFES, SURVEY.md §6): B=92 (4 members x 23 feature tokens),
h=6, S=1838 train rows, d=32.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.ops.pallas_attention import _xla_reference, flash_mha


def bench(step, q0, name, flops, iters=16, reps=3):
    """step: carry -> carry with one op invocation inside."""

    def chain(n):
        @jax.jit
        def run(q):
            out, _ = jax.lax.scan(lambda c, _: (step(c), 0.0), q, None, length=n)
            return jnp.sum(out.astype(jnp.float32))

        return run

    f1, fn = chain(1), chain(1 + iters)
    float(f1(q0)), float(fn(q0))  # compile both
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f1(q0))
        t1 = time.time()
        float(fn(q0))
        ts.append((time.time() - t1) - (t1 - t0))
    dt = float(np.median(ts)) / iters
    print(f"{name}: {dt * 1e3:.2f}ms {flops / dt / 1e12:.1f} TFLOP/s", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1838
    rng = np.random.default_rng(0)
    B, h, d = 92, 6, 32
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, h, S, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, h, S, d)), jnp.bfloat16)
    fwd_flops = 4 * B * h * S * S * d

    if which in ("all", "fwd"):
        for bq, bkv in ((256, 1024), (512, 1024), (512, 2048)):
            bench(
                lambda c, _bq=bq, _bkv=bkv: flash_mha(
                    c, k, v, False, None, _bq, _bkv
                ).astype(jnp.bfloat16),
                q, f"flash fwd {bq}/{bkv}", fwd_flops,
            )
        bench(
            lambda c: _xla_reference(
                c, k, v, kv_head0_only=False, sm_scale=scale
            ).astype(jnp.bfloat16),
            q, "xla fwd", fwd_flops,
        )

    if which in ("all", "mq"):
        Sq = max(1, S // 4)
        qt = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.bfloat16)
        k1, v1 = k[:, :1], v[:, :1]
        mq_flops = 4 * B * h * Sq * S * d
        bench(
            lambda c: flash_mha(c, k1, v1, True).astype(jnp.bfloat16),
            qt, f"flash fwd multiquery Sq={Sq}", mq_flops,
        )
        bench(
            lambda c: _xla_reference(
                c, k1, v1, kv_head0_only=True, sm_scale=scale
            ).astype(jnp.bfloat16),
            qt, "xla fwd multiquery", mq_flops,
        )

    if which in ("all", "bwd"):
        bwd_flops = fwd_flops * 5 // 2

        def gstep(f):
            def step(c):
                return jax.grad(lambda qq: f(qq).astype(jnp.float32).sum())(
                    c
                ).astype(c.dtype)

            return step

        for bq, bkv in ((256, 1024), (512, 1024)):
            bench(
                gstep(lambda qq, _bq=bq, _bkv=bkv: flash_mha(
                    qq, k, v, False, None, _bq, _bkv)),
                q, f"flash fwd+dq-bwd {bq}/{bkv}", fwd_flops + bwd_flops,
            )
        bench(
            gstep(lambda qq: _xla_reference(
                qq, k, v, kv_head0_only=False, sm_scale=scale)),
            q, "xla fwd+dq-bwd", fwd_flops + bwd_flops,
        )


if __name__ == "__main__":
    main()
