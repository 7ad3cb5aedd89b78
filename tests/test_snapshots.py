"""AsyncSnapshotWriter contract: latest-wins coalescing, guaranteed final
flush, and background-error propagation at close()."""

from __future__ import annotations

import threading
import time

import pytest

from multimodalpfn_tpu.train.snapshots import AsyncSnapshotWriter


def test_final_flush_writes_latest_payload():
    written = []
    gate = threading.Event()

    def write(payload):
        gate.wait(5.0)
        written.append(payload)

    w = AsyncSnapshotWriter(write)
    # while the writer is blocked on the first payload, later submissions
    # coalesce — only the latest pending one may be written
    w.submit(1)
    time.sleep(0.05)  # let the writer pick up payload 1 and block in write()
    for i in range(2, 10):
        w.submit(i)
    gate.set()
    w.close()
    assert written[0] == 1
    assert written[-1] == 9  # the final pending payload IS flushed
    assert len(written) <= 3  # intermediate bests were superseded, not queued


def test_close_reraises_background_error():
    def write(payload):
        raise ValueError("disk full")

    w = AsyncSnapshotWriter(write)
    w.submit("x")
    with pytest.raises(ValueError, match="disk full"):
        w.close()


def test_submit_after_close_raises():
    w = AsyncSnapshotWriter(lambda p: None)
    w.close()
    with pytest.raises(RuntimeError):
        w.submit("x")


def test_writes_happen_off_caller_thread():
    seen = {}

    def write(payload):
        seen["thread"] = threading.current_thread().name

    w = AsyncSnapshotWriter(write)
    w.submit("x")
    w.close()
    assert seen["thread"] != threading.current_thread().name
