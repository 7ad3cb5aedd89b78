"""Bisect the flash-fwd kernel cost: which stage eats the time at headline shape.

Variants: full | noexp (exp->identity) | nosm (skip softmax entirely, p=s) |
matmul (only s matmul, write s-sum) | copy (just copy q through).
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_kernel(variant, *, sm_scale, kv_len, chunk, n_chunks):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        m = l = acc = None
        for ci in range(n_chunks):
            lo = ci * chunk
            k = k_ref[0, lo : lo + chunk, :]
            v = v_ref[0, lo : lo + chunk, :]
            if variant == "copy":
                acc = q.astype(jnp.float32)
                continue
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = s * sm_scale
            if variant == "matmul":
                part = jnp.sum(s, axis=1, keepdims=True)
                acc = part if acc is None else acc + part
                acc = jnp.broadcast_to(acc, q.shape).astype(jnp.float32)
                continue
            if variant == "nosm":
                pv = jax.lax.dot_general(
                    s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = pv if acc is None else acc + pv
                continue
            if lo + chunk > kv_len:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len - lo, s, -1e30)
            m_c = jnp.max(s, axis=1, keepdims=True)
            if variant == "noexp":
                exp = lambda x: x
            else:
                exp = jnp.exp
            if ci == 0:
                m_n = m_c
                p = exp(s - m_n)
                l = jnp.sum(p, axis=1, keepdims=True)
                acc = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                m_n = jnp.maximum(m, m_c)
                alpha = exp(m - m_n)
                p = exp(s - m_n)
                l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m = m_n
        if variant in ("copy", "matmul", "nosm"):
            o_ref[0] = acc.astype(o_ref.dtype)
        else:
            o_ref[0] = (acc / l).astype(o_ref.dtype)

    return kernel


def run(variant, q3, k3, v3, block_q, block_kv):
    G, Sq, d = q3.shape
    kv_len = k3.shape[1]
    chunk = min(block_kv, _round_up(kv_len, LANES))
    skv_pad = _round_up(kv_len, chunk)
    sq_pad = _round_up(Sq, block_q)
    qp = jnp.pad(q3, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    kp = jnp.pad(k3, ((0, 0), (0, skv_pad - kv_len), (0, 0)))
    vp = jnp.pad(v3, ((0, 0), (0, skv_pad - kv_len), (0, 0)))
    kernel = make_kernel(
        variant, sm_scale=1.0 / np.sqrt(d), kv_len=kv_len, chunk=chunk,
        n_chunks=skv_pad // chunk,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, sq_pad, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(G, sq_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda g, qi: (g, qi, 0)),
                pl.BlockSpec((1, skv_pad, d), lambda g, qi: (g, 0, 0)),
                pl.BlockSpec((1, skv_pad, d), lambda g, qi: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda g, qi: (g, qi, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qp, kp, vp)
    return out[:, :Sq]


def main():
    rng = np.random.default_rng(0)
    B, h, S, d = 92, 6, 1838, 32
    bq = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bkv = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    q = jnp.asarray(rng.normal(size=(B * h, S, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B * h, S, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B * h, S, d)), jnp.bfloat16)
    for variant in ("copy", "matmul", "nosm", "noexp", "full"):
        f = jax.jit(lambda q, k, v, _v=variant: jnp.sum(
            run(_v, q, k, v, bq, bkv).astype(jnp.float32)))
        float(f(q, k, v))
        t0 = time.time()
        n = 8
        for _ in range(n):
            s = float(f(q, k, v))
        dt = (time.time() - t0) / n
        print(f"{variant}: {dt * 1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
