"""Micro-benchmark: flash kernel variants vs XLA at bench-scale shapes (TPU)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.ops.pallas_attention import (
    _flash_forward_heads,
    _xla_reference,
    flash_mha,
)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    B, h, Sq, Skv, d = 92, 6, 1838, 1838, 32
    q = jnp.asarray(rng.normal(size=(B, h, Sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, h, Skv, d)), jnp.bfloat16)
    flops = 4 * B * h * Sq * Skv * d

    def bench(f, name, n=4):
        s = float(f(q, k, v))
        t0 = time.time()
        for _ in range(n):
            s = float(f(q, k, v))
        dt = (time.time() - t0) / n
        print(f"{name}: {dt*1e3:.1f}ms {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    scale = 1.0 / np.sqrt(d)
    if which in ("all", "heads"):
        bench(
            jax.jit(lambda q, k, v: _flash_forward_heads(
                q, k, v, kv_head0_only=False, sm_scale=scale, block_q=256, block_kv=512
            ).sum()),
            "heads 256/512",
        )
        bench(
            jax.jit(lambda q, k, v: _flash_forward_heads(
                q, k, v, kv_head0_only=False, sm_scale=scale, block_q=512, block_kv=1024
            ).sum()),
            "heads 512/1024",
        )
    if which in ("all", "flat"):
        bench(
            jax.jit(lambda q, k, v: flash_mha(q, k, v, False, None, 512, 1024).sum()),
            "flat 512/1024",
        )
    if which in ("all", "xla"):
        bench(
            jax.jit(lambda q, k, v: _xla_reference(
                q, k, v, kv_head0_only=False, sm_scale=scale
            ).sum()),
            "xla",
        )


if __name__ == "__main__":
    main()
