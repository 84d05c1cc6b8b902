"""Hyperparameter sweep runner.

Local replacement for the reference's ML Engine hypertuning
(nar_module/nar_mlengine_hypertuning.yaml:1-51): a discrete grid (or a
random subsample of it) over NARConfig fields, each trial running the
temporal harness on a trial subdirectory, maximizing a chosen metric
(default ``mrr_at_n`` — the reference's objective).
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import logging
import random
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

from ..config import NARConfig, RunConfig
from .temporal import TemporalHarness

log = logging.getLogger("chameleon_tpu.sweep")


@dataclasses.dataclass
class TrialResult:
    trial_id: int
    overrides: Dict
    objective: float
    metrics: Dict


# Reference ML Engine parameterName -> NARConfig field
# (nar_mlengine_hypertuning.yaml:9-51 vs the tf.flags they map to,
# nar_trainer_gcom.py:37-93).
_MLENGINE_PARAM_MAP = {
    "batch_size": "batch_size",
    "train_total_negative_samples": "negative_samples",
    "eval_total_negative_samples": "eval_negative_samples",
    "CAR_embedding_size": "car_embedding_size",
    "rnn_units": "rnn_units",
    "rnn_num_layers": "rnn_num_layers",
    "learning_rate": "learning_rate",
    "dropout_keep_prob": "keep_prob",
    "reg_l2": "reg_weight_decay",
    "reg_l2_rate": "reg_weight_decay",
    "softmax_temperature": "softmax_temperature",
    "novelty_reg_factor": "novelty_reg_factor",
}


@dataclasses.dataclass
class SweepSpec:
    """Declarative sweep description (reference
    nar_mlengine_hypertuning.yaml:1-51)."""

    param_grid: Dict[str, List]
    objective: str = "mrr_at_n"
    goal: str = "MAXIMIZE"
    max_trials: Optional[int] = None
    max_parallel: int = 1


def load_sweep_spec(path: str) -> SweepSpec:
    """Load a YAML/JSON sweep spec.

    Accepts BOTH shapes:
      * the reference's ML Engine layout —
        ``trainingInput.hyperparameters.{goal, hyperparameterMetricTag,
        maxTrials, maxParallelTrials, params: [{parameterName, type:
        DISCRETE, discreteValues: [...]}]}``
        (nar_mlengine_hypertuning.yaml:1-51), with parameterName translated
        through the reference-flag -> NARConfig map; and
      * a flat native layout — ``{params: {field: [values]}, objective,
        goal, max_trials, max_parallel}`` using NARConfig field names
        directly.
    """
    text = Path(path).read_text()
    if path.endswith((".yaml", ".yml")):
        import yaml

        spec = yaml.safe_load(text)
    else:
        spec = json.loads(text)

    if "trainingInput" in spec:  # ML Engine shape
        hp = spec["trainingInput"]["hyperparameters"]
        grid: Dict[str, List] = {}
        for param in hp.get("params", []):
            name = param["parameterName"]
            field = _MLENGINE_PARAM_MAP.get(name, name)
            if param.get("type", "DISCRETE").upper() != "DISCRETE":
                raise ValueError(
                    f"only DISCRETE params are supported, got "
                    f"{param.get('type')} for {name}"
                )
            grid[field] = list(param["discreteValues"])
        return SweepSpec(
            param_grid=grid,
            objective=hp.get("hyperparameterMetricTag", "mrr_at_n"),
            goal=hp.get("goal", "MAXIMIZE"),
            max_trials=hp.get("maxTrials"),
            max_parallel=int(hp.get("maxParallelTrials", 1)),
        )

    return SweepSpec(
        param_grid={k: list(v) for k, v in spec["params"].items()},
        objective=spec.get("objective", "mrr_at_n"),
        goal=spec.get("goal", "MAXIMIZE"),
        max_trials=spec.get("max_trials"),
        max_parallel=int(spec.get("max_parallel", 1)),
    )


def grid(param_grid: Dict[str, Sequence]) -> List[Dict]:
    """All combinations of a discrete grid (hypertuning yaml's DISCRETE
    params)."""
    keys = list(param_grid)
    return [
        dict(zip(keys, values))
        for values in itertools.product(*(param_grid[k] for k in keys))
    ]


def run_sweep(
    base_cfg: NARConfig,
    run_cfg: RunConfig,
    param_grid: Dict[str, Sequence],
    harness_factory: Callable[[NARConfig, RunConfig], TemporalHarness],
    hour_source: Callable[[int], Sequence],
    hours: Sequence[int],
    objective: str = "mrr_at_n",
    max_trials: Optional[int] = None,
    seed: int = 42,
    max_parallel: int = 1,
    goal: str = "MAXIMIZE",
) -> List[TrialResult]:
    """Run trials, returning results sorted by objective descending (goal:
    MAXIMIZE, hypertuning yaml:2-8).

    ``max_parallel`` > 1 runs that many trials concurrently on a thread
    pool — the reference's ``maxParallelTrials: 2``
    (nar_mlengine_hypertuning.yaml:8).  Trials are independent (own
    harness, own state, own trial subdirectory) and the heavy work is
    jitted device computation / GIL-released numpy, so results are
    identical to the serial order.  Caveat: a benchmark drawing from the
    process-global Python RNG (SkNN sampling_strategy='random') is
    order-sensitive across threads — keep such sweeps serial.
    """
    trials = grid(param_grid)
    if max_trials is not None and len(trials) > max_trials:
        rng = random.Random(seed)
        trials = rng.sample(trials, max_trials)

    def run_trial(trial_id: int, overrides: Dict) -> TrialResult:
        cfg = dataclasses.replace(base_cfg, **overrides)
        trial_run_cfg = dataclasses.replace(
            run_cfg, model_dir=str(Path(run_cfg.model_dir) / f"trial_{trial_id:03d}")
        )
        harness = harness_factory(cfg, trial_run_cfg)
        rows = harness.run(hour_source, hours=hours)
        # Failed trials (no eval rows / objective column absent) must sort
        # LAST under either goal — the sentinel is goal-aware.
        worst = float("-inf") if goal.upper() == "MAXIMIZE" else float("inf")
        vals = [r[objective] for r in rows if objective in r]
        value = float(sum(vals) / len(vals)) if vals else worst
        log.info("trial %d %s -> %s=%.5f", trial_id, overrides, objective, value)
        return TrialResult(trial_id, overrides, value, rows[-1] if rows else {})

    if max_parallel > 1 and len(trials) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            results = list(pool.map(run_trial, range(len(trials)), trials))
    else:
        results = [run_trial(i, o) for i, o in enumerate(trials)]

    results.sort(
        key=lambda r: -r.objective if goal.upper() == "MAXIMIZE" else r.objective
    )
    out = Path(run_cfg.model_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "sweep_results.json", "w") as f:
        json.dump(
            [dataclasses.asdict(r) for r in results], f, indent=2, default=str
        )
    return results
