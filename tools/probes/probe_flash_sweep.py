"""Probe: flash kernel block sweep at serving and training shapes."""
import sys, time, itertools
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.ops.pallas_attention import flash_mha_t

def timeit_chained(fn, args, K=8, N=4):
    def chained(*a):
        def body(c, _):
            o = fn(c, *a[1:])
            return (o.astype(a[0].dtype) * 0 + a[0]), o[0, 0, 0]
        _, last = jax.lax.scan(body, a[0], None, length=K)
        return last[-1]
    f1 = jax.jit(lambda *a: fn(*a)[0, 0, 0]); fK = jax.jit(chained)
    float(f1(*args)); float(fK(*args))
    ts = []
    for _ in range(N):
        t0 = time.time(); float(f1(*args)); t1 = time.time(); float(fK(*args))
        ts.append(((time.time() - t1) - (t1 - t0)) / (K - 1))
    return float(np.median(ts))

rng = np.random.default_rng(0)
shapes = {
    # serving: 4 members x 30 tokens x 6 heads = 720 groups, S=2298 ctx
    "serve(G=720,S=2298)": (720, 32, 2298, 2298),
    # training train-block: 30 tokens x 6 heads, S=1323
    "train(G=180,S=1323)": (180, 32, 1323, 1323),
}
for name, (G, d, Sq, Skv) in shapes.items():
    q = jnp.asarray(rng.normal(size=(G, d, Sq)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(G, d, Skv)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(G, d, Skv)), jnp.bfloat16)
    for bq, bkv in [(2048, 512), (2048, 1024), (1024, 512), (2048, 2048), (4096, 512)]:
        dt = timeit_chained(lambda q_, k_, v_: flash_mha_t(q_, k_, v_, None, bq, bkv), (q, k, v))
        print(f"{name} bq={bq} bkv={bkv}: {dt*1e3:.2f} ms", flush=True)
