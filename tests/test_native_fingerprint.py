"""Native batch fingerprint hashing: bit-exact parity with the Python path.

The C module (multimodalpfn_tpu/native/fingerprint.c) implements BLAKE2b from
RFC 7693; these tests pin it against hashlib.blake2b and pin the full
AddFingerprintFeaturesStep transform against the pure-Python loop
(MMPFN_TPU_NO_NATIVE=1 twin), including the train-mode collision bump loop
(reference semantics: mmpfn/models/mmpfn/model/preprocessing.py:482-523).
"""

import hashlib

import numpy as np
import pytest

from multimodalpfn_tpu import native
from multimodalpfn_tpu.preprocess.steps import (
    AddFingerprintFeaturesStep,
    _stable_float_hash,
)


def _native_available():
    return native.blake2b64(b"") is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native fingerprint lib unavailable"
)


def test_blake2b64_matches_hashlib_on_buffers():
    rng = np.random.default_rng(0)
    for n in [0, 1, 7, 8, 63, 64, 127, 128, 129, 255, 256, 320, 1000]:
        buf = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        expect = int.from_bytes(
            hashlib.blake2b(buf, digest_size=8).digest(), "little"
        )
        assert native.blake2b64(buf) == expect, f"len={n}"


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_hash_rows_matches_python_hash(dtype):
    rng = np.random.default_rng(1)
    X = rng.normal(size=(137, 23)).astype(dtype)
    X[3, 4] = np.nan
    X[10] = 0.0
    X[11] = -0.0  # -0.0 and 0.0 have different bytes; both paths must agree
    got = native.hash_rows(X)
    assert got is not None and got.dtype == np.float64
    expect = np.array([_stable_float_hash(row) for row in X])
    np.testing.assert_array_equal(got, expect)


def test_hash_rows_non_contiguous_and_empty():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(8, 10))[:, ::2]  # non-contiguous view
    got = native.hash_rows(X)
    expect = np.array([_stable_float_hash(np.ascontiguousarray(row)) for row in X])
    np.testing.assert_array_equal(got, expect)
    assert native.hash_rows(np.empty((0, 5))).shape == (0,)


@pytest.mark.parametrize("is_test", [False, True])
def test_fingerprint_step_native_equals_python(monkeypatch, is_test):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(64, 6))
    # Force collisions: duplicate rows exercise the train-mode bump loop.
    X[20] = X[5]
    X[21] = X[5]
    X[40:44] = X[8]

    def run():
        step = AddFingerprintFeaturesStep(random_state=7)
        train_out = step.fit_transform(X, [0, 2]).X
        return step.transform(X).X if is_test else train_out

    native_out = run()
    monkeypatch.setenv("MMPFN_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_attempted", True)
    python_out = run()
    np.testing.assert_array_equal(native_out, python_out)
    # De-collision really happened: all train fingerprints unique.
    if not is_test:
        assert len(np.unique(native_out[:, -1])) == X.shape[0]


def test_build_failure_falls_back_to_python(monkeypatch):
    """An unwritable install dir (read-only site-packages) must degrade to the
    pure-Python hash path, never crash — regression pin for mkstemp escaping
    _build()'s try block."""
    import tempfile

    def boom(*a, **k):
        raise PermissionError("read-only install dir")

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_attempted", False)
    monkeypatch.setattr(tempfile, "mkstemp", boom)
    # force the build path even if a .so already exists on disk
    monkeypatch.setattr(native.os.path, "exists", lambda p: False)
    assert native._load() is None  # silent fallback, no raise
    rng = np.random.default_rng(5)
    X = rng.normal(size=(4, 3))
    out = native.hash_rows(X)
    assert out is None  # caller (steps.py) then uses the hashlib loop
