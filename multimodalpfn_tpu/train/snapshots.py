"""Latency-aware fine-tune snapshotting.

The reference ``torch.save``s the full state dict on every validation
improvement (``finetune_mmpfn_main.py:440-450``) — cheap over PCIe, but a
remote-accelerator link can run at ~1-3 MB/s for device->host bulk transfers,
so eager synchronous saving can dominate the whole fine-tuning protocol.

Here the best parameters stay ON DEVICE (holding a pytree reference costs one
buffer set of HBM) and a single background writer thread performs the
device->host fetch + disk write asynchronously, overlapped with training
compute. Only the latest submission is kept pending — intermediate bests that
are superseded before the writer gets to them are skipped (the on-disk
contract is "the best snapshot so far", which the final ``close()`` flush
guarantees; mid-run writes are crash resilience, not the source of truth).
"""

from __future__ import annotations

import threading
from typing import Any, Callable


class AsyncSnapshotWriter:
    """Single background writer; keeps at most one pending payload."""

    def __init__(self, write_fn: Callable[[Any], None]) -> None:
        self._write_fn = write_fn
        self._pending: Any = None
        self._has_pending = False
        self._cond = threading.Condition()
        self._closed = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="mmpfn-snapshot-writer", daemon=True
        )
        self._thread.start()

    def submit(self, payload: Any) -> None:
        """Replace the pending payload (device arrays are fine — the fetch
        happens on the writer thread, overlapped with training)."""
        with self._cond:
            if self._closed:
                raise RuntimeError("snapshot writer already closed")
            self._pending = payload
            self._has_pending = True
            self._cond.notify()

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._has_pending and not self._closed:
                    self._cond.wait()
                if not self._has_pending and self._closed:
                    return
                payload, self._pending = self._pending, None
                self._has_pending = False
            try:
                self._write_fn(payload)
            except BaseException as e:  # surfaced at close()
                self._error = e

    def close(self) -> None:
        """Drain the queue (the latest pending payload IS written), then join.
        Re-raises the last writer error, if any."""
        with self._cond:
            self._closed = True
            self._cond.notify()
        self._thread.join()
        if self._error is not None:
            raise self._error


# ---------------------------------------------------------------------------
# Fire-and-forget final artifacts.
#
# The protocol's deliverable (the best torch-format model, reference
# `finetune_mmpfn_main.py:440-450`) is synchronously flushed before
# fine_tune_mmpfn returns. The EXTRA orbax final-state artifact's
# device->host fetch costs ~30 s over a remote-accelerator link, so it is
# written by a NON-daemon background thread: the call returns immediately and
# interpreter exit still joins the thread (no torn files). Callers that
# reload the artifact right away call wait_for_pending_snapshots().

_final_threads: list[threading.Thread] = []
_final_errors: list[BaseException] = []
_final_lock = threading.Lock()


def submit_final_write(write_fn: Callable[[], None], name: str) -> None:
    """Run write_fn on a non-daemon background thread; errors are logged and
    surfaced by wait_for_pending_snapshots()."""

    def run() -> None:
        try:
            write_fn()
        except BaseException as e:  # pragma: no cover - io/link failures
            with _final_lock:
                _final_errors.append(e)

    t = threading.Thread(target=run, name=name, daemon=False)
    with _final_lock:
        # opportunistically drop finished threads so HPO sweeps don't grow
        _final_threads[:] = [x for x in _final_threads if x.is_alive()]
        _final_threads.append(t)
    t.start()


def wait_for_pending_snapshots() -> None:
    """Join all pending final-artifact writes; re-raise the first error."""
    with _final_lock:
        threads = list(_final_threads)
    for t in threads:
        t.join()
    with _final_lock:
        if _final_errors:
            err = _final_errors[0]
            _final_errors.clear()
            raise err
