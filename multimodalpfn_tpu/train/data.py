"""Episode sampling for fine-tuning.

Semantics anchor: reference `scripts_finetune_mm/training_utils/data_utils.py:16-232`
— one training step consumes one (Stratified)KFold split of the whole train set,
from an endless reshuffled fold stream, with the test fold equalized to
``n // n_splits`` rows so shapes are constant.

TPU-first: constant shapes mean ONE compiled step serves every episode; the
sampler can also emit a *batch* of episodes (leading axis) so data-parallel
fine-tuning and multi-seed HPO ride the dp mesh axis (the reference is locked to
batch_size=1, `data_utils.py:200`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from sklearn.model_selection import KFold, StratifiedKFold

RANDOM_SEED = 4213


class EpisodeSampler:
    def __init__(
        self,
        *,
        X: np.ndarray | None,
        image: np.ndarray | None,
        y: np.ndarray,
        is_classification: bool,
        n_splits: int = 10,
        seed: int = RANDOM_SEED,
    ):
        assert X is not None or image is not None
        self.X, self.image, self.y = X, image, y
        self.is_classification = is_classification
        self.n_splits = n_splits
        self._rng = np.random.RandomState(seed)
        self._stream = self._fold_stream()
        n = len(y)
        self.test_size = n // n_splits
        self.train_size = n - self.test_size

    def _fold_stream(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        splitter_cls = StratifiedKFold if self.is_classification else KFold
        base = self.X if self.X is not None else self.image
        while True:
            splitter = splitter_cls(
                n_splits=self.n_splits,
                random_state=int(self._rng.randint(0, np.iinfo(np.int32).max)),
                shuffle=True,
            )
            yield from splitter.split(base, self.y if self.is_classification else None)

    def _episode_indices(self) -> tuple[np.ndarray, np.ndarray]:
        """Next fold, with the test fold equalized to ``test_size`` rows
        (reference `data_utils.py:127-136`). Single source of truth for both
        row-materializing and index-emitting sampling."""
        train_idx, test_idx = next(self._stream)
        if len(test_idx) != self.test_size:
            cut = len(test_idx) - self.test_size
            train_idx = np.concatenate([train_idx, test_idx[:cut]])
            test_idx = test_idx[cut:]
        return train_idx, test_idx

    def _one(self) -> dict[str, np.ndarray]:
        train_idx, test_idx = self._episode_indices()
        ep: dict[str, np.ndarray] = {
            "y_train": self.y[train_idx].astype(np.float32),
            "y_test": self.y[test_idx].astype(np.float32),
        }
        if self.X is not None:
            ep["x_train"] = self.X[train_idx].astype(np.float32)
            ep["x_test"] = self.X[test_idx].astype(np.float32)
        if self.image is not None:
            ep["image_train"] = self.image[train_idx].astype(np.float32)
            ep["image_test"] = self.image[test_idx].astype(np.float32)
        return ep

    def sample(self, batch_size: int = 1) -> dict[str, np.ndarray]:
        """Stack `batch_size` episodes on a leading axis."""
        eps = [self._one() for _ in range(batch_size)]
        return {k: np.stack([e[k] for e in eps]) for k in eps[0]}

    def sample_indices(self, batch_size: int = 1) -> dict[str, np.ndarray]:
        """Episode INDICES only: {"train_idx": (b, train_size), "test_idx":
        (b, test_size)} int32, drawn from the same fold stream as `sample`
        (identical episodes). For device-side episode gathering: the caller
        keeps the full train set on device and gathers rows inside the
        compiled step, so each step uploads ~KBs of indices instead of the
        episode's ~MBs of features/embeddings (the dominant steady-state cost
        over a remote-accelerator link)."""
        tr, te = [], []
        for _ in range(batch_size):
            train_idx, test_idx = self._episode_indices()
            tr.append(train_idx.astype(np.int32))
            te.append(test_idx.astype(np.int32))
        return {"train_idx": np.stack(tr), "test_idx": np.stack(te)}
