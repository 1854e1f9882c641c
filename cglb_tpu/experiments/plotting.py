"""Analysis: parse run logs, plot metric-vs-time/iteration bands, print tables.

Reference: cglb_experiments/plotting.py:49-708.  Same responsibilities, leaner
implementation:

- ``ExpData`` walks a logdir tree ``<root>/<dataset>/<uid>/<seed>/logs.json``
  (the reference reconstructs identity from the same path regexes at
  plotting.py:52-57,199-210) and additionally reads the explicit ``"id"``
  field written into every logs.json/results.json — fixing the survey's noted
  fragile-contract issue (SURVEY.md section 5.5).
- ``Plotter`` draws median + inter-quartile bands over seeds, metric vs
  elapsed_time or iteration, with series resampled onto a common grid
  (plotting.py:279-441), plus the CG-steps-per-feval plot (plotting.py:491-585).
- ``TablePrinter`` emits final-metric median tables as latex/markdown/csv
  (plotting.py:636-708).

Matplotlib is imported lazily so headless metric-only workflows never pay for
it.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..utils.serialization import load_json

__all__ = ["ExpData", "load_experiments", "Plotter", "TablePrinter",
           "MODEL_STYLE"]

_UID_RE = re.compile(
    r"(?P<model>[a-z0-9]+)-(?P<kernel>[A-Za-z0-9]+)-(?P<float>fp\d+)"
    r"(-M(?P<M>\d+))?(?P<extra>.*)"
)

# model -> (color, linestyle, label); reference maps at plotting.py:72-172
MODEL_STYLE = {
    "cglb": ("#1f77b4", "-", "CGLB"),
    "cglbn2m": ("#17becf", "--", r"CGLB $N^2M$"),
    "cglbnm2": ("#9467bd", "-.", r"CGLB $NM^2$"),
    "sgpr": ("#ff7f0e", "-", "SGPR"),
    "sgprn2m": ("#d62728", "--", r"SGPR $N^2M$"),
    "gpr": ("#2ca02c", ":", "Iterative GP"),
}


@dataclass
class ExpData:
    dataset: str
    model: str
    uid: str
    seed: int
    logs: Dict[str, list] = field(repr=False)
    results: Dict[str, float] = field(repr=False, default_factory=dict)
    num_inducing: Optional[int] = None

    def series(self, key: str) -> np.ndarray:
        return np.asarray(self.logs.get(key, []), dtype=float)


def load_experiments(root) -> List[ExpData]:
    """Walk <root>/<dataset>/<uid>/<seed>/logs.json."""
    out = []
    root = Path(root)
    for logs_path in sorted(root.glob("*/*/*/logs.json")):
        seed_dir = logs_path.parent
        uid_dir = seed_dir.parent
        dataset_dir = uid_dir.parent
        m = _UID_RE.match(uid_dir.name)
        model = m.group("model") if m else uid_dir.name
        M = int(m.group("M")) if (m and m.group("M")) else None
        try:
            logs = load_json(logs_path)
        except (json.JSONDecodeError, OSError):
            continue
        results_path = seed_dir / "results.json"
        results = {}
        if results_path.exists():
            try:
                results = load_json(results_path)
            except (json.JSONDecodeError, OSError):
                pass
        try:
            seed = int(seed_dir.name)
        except ValueError:
            seed = 0
        out.append(
            ExpData(dataset=dataset_dir.name, model=model, uid=uid_dir.name,
                    seed=seed, logs=logs, results=results, num_inducing=M)
        )
    return out


def _resample(x, y, grid):
    """Piecewise-linear resampling of (x, y) onto grid, NaN outside support
    (the reference spline-resamples onto a common time grid,
    plotting.py:279-396)."""
    x, y = np.asarray(x, float), np.asarray(y, float)
    if len(x) < 2:
        return np.full_like(grid, np.nan, dtype=float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    out = np.interp(grid, x, y, left=np.nan, right=np.nan)
    return out


def _median_iqr(series: List[np.ndarray]):
    stacked = np.vstack(series)
    med = np.nanmedian(stacked, axis=0)
    q1 = np.nanpercentile(stacked, 25, axis=0)
    q3 = np.nanpercentile(stacked, 75, axis=0)
    return med, q1, q3


class Plotter:
    def __init__(self, experiments: List[ExpData]):
        self.experiments = experiments

    def _grouped(self, dataset: str):
        groups: Dict[str, List[ExpData]] = {}
        for e in self.experiments:
            if e.dataset != dataset:
                continue
            groups.setdefault(e.uid, []).append(e)
        return groups

    def plot_metric(self, dataset: str, metric: str = "test/rmse",
                    x_axis: str = "elapsed_time", ax=None, num_points: int = 200):
        """Median + IQR band of `metric` vs time or iteration per uid group."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(6, 4))
        for uid, runs in sorted(self._grouped(dataset).items()):
            xs = [r.series(x_axis) for r in runs]
            ys = [r.series(metric) for r in runs]
            xs, ys = zip(*[(x, y) for x, y in zip(xs, ys)
                           if len(x) > 1 and len(x) == len(y)]) if any(
                len(x) > 1 and len(x) == len(y) for x, y in zip(xs, ys)
            ) else ((), ())
            if not xs:
                continue
            hi = max(x.max() for x in xs)
            lo = min(x.min() for x in xs)
            grid = np.linspace(lo, hi, num_points)
            resampled = [_resample(x, y, grid) for x, y in zip(xs, ys)]
            med, q1, q3 = _median_iqr(resampled)
            model = runs[0].model
            color, ls, label = MODEL_STYLE.get(model, ("k", "-", model))
            suffix = f" M={runs[0].num_inducing}" if runs[0].num_inducing else ""
            ax.plot(grid, med, color=color, linestyle=ls, label=label + suffix)
            ax.fill_between(grid, q1, q3, color=color, alpha=0.2, linewidth=0)
        ax.set_xlabel("wall-clock time (s)" if x_axis == "elapsed_time"
                      else x_axis)
        ax.set_ylabel(metric)
        ax.set_title(dataset)
        ax.legend(fontsize=8)
        return ax

    def plot_cg_steps(self, dataset: str, ax=None, smooth: int = 25):
        """CG steps per function evaluation (reference: plotting.py:491-585)."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(figsize=(6, 4))
        for uid, runs in sorted(self._grouped(dataset).items()):
            series = [r.series("cg/steps-per-feval") for r in runs
                      if len(r.series("cg/steps-per-feval"))]
            if not series:
                continue
            ln = min(len(s) for s in series)
            stacked = np.vstack([s[:ln] for s in series])
            med = np.median(stacked, axis=0)
            if smooth > 1 and len(med) > smooth:
                kern = np.ones(smooth) / smooth
                med = np.convolve(med, kern, mode="valid")
            model = runs[0].model
            color, ls, label = MODEL_STYLE.get(model, ("k", "-", model))
            suffix = f" M={runs[0].num_inducing}" if runs[0].num_inducing else ""
            ax.plot(med, color=color, linestyle=ls, label=label + suffix)
        ax.set_xlabel("function evaluation")
        ax.set_ylabel("CG steps")
        ax.set_title(dataset)
        ax.legend(fontsize=8)
        return ax


class TablePrinter:
    """Final-metric tables: median over seeds per (dataset, uid)."""

    def __init__(self, experiments: List[ExpData]):
        self.experiments = experiments

    def dataframe(self, metrics=("loss", "test/rmse", "test/nlpd")):
        import pandas as pd

        rows = []
        for e in self.experiments:
            if not e.results:
                continue
            row = {"dataset": e.dataset, "uid": e.uid, "seed": e.seed}
            for m in metrics:
                if m in e.results:
                    row[m] = float(np.asarray(e.results[m]))
            rows.append(row)
        df = pd.DataFrame(rows)
        if df.empty:
            return df
        return df.groupby(["dataset", "uid"]).median(numeric_only=True).drop(
            columns=["seed"], errors="ignore"
        )

    def print(self, fmt: str = "markdown", metrics=("loss", "test/rmse",
                                                    "test/nlpd")) -> str:
        df = self.dataframe(metrics)
        if fmt == "latex":
            s = df.to_latex(float_format="%.4f")
        elif fmt == "markdown":
            s = df.to_markdown(floatfmt=".4f")
        elif fmt == "csv":
            s = df.to_csv(float_format="%.6f")
        else:
            s = str(df)
        print(s)
        return s
