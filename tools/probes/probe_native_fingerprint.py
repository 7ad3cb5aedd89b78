"""Measure the native batch fingerprint vs the per-row Python hashlib loop.

Run standalone (CPU only): python tools/probes/probe_native_fingerprint.py
Context: round-5 profile showed _stable_float_hash at ~16% of a member
pipeline fit on the bench workload (2298 rows x ~40 features, 4 members).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from multimodalpfn_tpu import native
from multimodalpfn_tpu.preprocess.steps import _stable_float_hash


def main():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(2298, 40))  # bench-workload shape, post-salt

    assert native.blake2b64(b"") is not None, "native lib unavailable"

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out_py = np.array([_stable_float_hash(row) for row in X])
    t_py = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        out_c = native.hash_rows(X)
    t_c = (time.perf_counter() - t0) / reps

    np.testing.assert_array_equal(out_py, out_c)
    print(f"python loop : {t_py * 1e3:8.3f} ms")
    print(f"native batch: {t_c * 1e3:8.3f} ms   ({t_py / t_c:.1f}x)")


if __name__ == "__main__":
    main()
