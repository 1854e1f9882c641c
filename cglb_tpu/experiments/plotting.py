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


def _uid_variant(uid: str) -> str:
    """Display suffix for a uid's trailing variant tag, e.g.
    'cglb-Matern32-fp64-M2048-adam' -> ' (adam)'.  Without it, two runs of
    the same model/M (say scipy4 vs adam optimizer arms) would collide on
    one legend label."""
    m = _UID_RE.match(uid)
    extra = (m.group("extra") if m else "").strip("-")
    return f" ({extra})" if extra else ""


def _resample(x, y, grid, kind: str = "spline"):
    """Resample (x, y) onto a common grid, NaN outside support (the reference
    spline-resamples onto a common time grid, plotting.py:279-396).

    kind="spline" uses a shape-preserving cubic (PCHIP — monotone segments
    cannot overshoot, unlike an unconstrained cubic on noisy metric curves);
    series too short for a cubic, duplicate abscissae, or kind="linear" fall
    back to piecewise-linear."""
    x, y = np.asarray(x, float), np.asarray(y, float)
    if len(x) < 2:
        return np.full_like(grid, np.nan, dtype=float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    if kind == "spline" and len(x) >= 4 and np.all(np.diff(x) > 0):
        from scipy.interpolate import PchipInterpolator

        out = PchipInterpolator(x, y)(grid)
    else:
        out = np.interp(grid, x, y)
    out = np.where((grid < x[0]) | (grid > x[-1]), np.nan, out)
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
                    x_axis: str = "elapsed_time", ax=None, num_points: int = 200,
                    resample: str = "spline"):
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
            resampled = [_resample(x, y, grid, kind=resample)
                         for x, y in zip(xs, ys)]
            med, q1, q3 = _median_iqr(resampled)
            model = runs[0].model
            color, ls, label = MODEL_STYLE.get(model, ("k", "-", model))
            suffix = f" M={runs[0].num_inducing}" if runs[0].num_inducing else ""
            variant = _uid_variant(uid)
            if variant:
                suffix += variant
                ls = "--"  # distinguish variant arms sharing a model color
            ax.plot(grid, med, color=color, linestyle=ls, label=label + suffix)
            ax.fill_between(grid, q1, q3, color=color, alpha=0.2, linewidth=0)
        ax.set_xlabel("wall-clock time (s)" if x_axis == "elapsed_time"
                      else x_axis)
        ax.set_ylabel(metric)
        ax.set_title(dataset)
        ax.legend(fontsize=8)
        return ax

    def plot_cg_steps(self, dataset: str, ax=None, smooth_std: float = 5.0,
                      boxplot_inset: bool = True, max_fevals: int = 1500):
        """CG steps per function evaluation: gaussian-smoothed mean curve per
        uid with the faint raw mean behind it, plus a horizontal boxplot inset
        of the full per-feval step distribution (whiskers at the 5th/95th
        percentiles).  Reference behavior: plotting.py:491-585."""
        import matplotlib.pyplot as plt
        from scipy.ndimage import gaussian_filter1d

        if ax is None:
            _, ax = plt.subplots(figsize=(5.2, 3.2))
        dists, colors, labels = [], [], []
        for uid, runs in sorted(self._grouped(dataset).items()):
            series = [r.series("cg/steps-per-feval")[:max_fevals] for r in runs
                      if len(r.series("cg/steps-per-feval"))]
            if not series:
                continue
            ln = min(len(s) for s in series)
            stacked = np.vstack([s[:ln] for s in series])
            mean = np.mean(stacked, axis=0)
            model = runs[0].model
            color, ls, label = MODEL_STYLE.get(model, ("k", "-", model))
            suffix = f" M={runs[0].num_inducing}" if runs[0].num_inducing else ""
            suffix += _uid_variant(uid)
            ax.plot(mean, alpha=0.15, color=color, linewidth=0.8)
            if smooth_std > 0 and len(mean) > 3 * smooth_std:
                mean = gaussian_filter1d(mean, smooth_std)
            ax.plot(mean, color=color, linestyle=ls, label=label + suffix)
            dists.append(stacked.reshape(-1))
            colors.append(color)
            labels.append(label + suffix)
        if boxplot_inset and dists:
            inset = ax.inset_axes([0.62, 0.58, 0.34, 0.36])
            try:
                bps = inset.boxplot(dists, vert=False, sym="", whis=(5, 95),
                                    tick_labels=labels)
            except TypeError:  # matplotlib < 3.9 named the kwarg `labels`
                bps = inset.boxplot(dists, vert=False, sym="", whis=(5, 95),
                                    labels=labels)
            for i, median in enumerate(bps["medians"]):
                median.set(color=colors[i], linewidth=2.0)
            for i, box in enumerate(bps["boxes"]):
                box.set(color=colors[i])
            for i in range(len(dists)):
                for w in bps["whiskers"][2 * i: 2 * i + 2]:
                    w.set(color=colors[i])
            inset.tick_params(labelsize=6)
        ax.set_xlabel("function evaluation")
        ax.set_ylabel("CG steps")
        ax.set_title(dataset)
        ax.legend(fontsize=8, loc="lower left")
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

    def gpr_pivot(self, metrics=("lml", "test/rmse", "test/nlpd")):
        """The paper's GPR-baseline layout: one row per dataset, one column
        per (model, metric), medians over seeds (reference:
        plotting.py:636-708 print_gpr_table)."""
        import pandas as pd

        rows = []
        for e in self.experiments:
            if not e.results:
                continue
            for m in metrics:
                if m in e.results:
                    rows.append({
                        "dataset": e.dataset, "model": e.model,
                        "metric": m, "value": float(np.asarray(e.results[m])),
                    })
        df = pd.DataFrame(rows)
        if df.empty:
            return df
        return df.pivot_table(index="dataset", columns=["model", "metric"],
                              values="value", aggfunc="median")

    @staticmethod
    def _render(df, fmt: str) -> str:
        if fmt == "latex":
            return df.to_latex(float_format="%.4f")
        if fmt == "markdown":
            return df.to_markdown(floatfmt=".4f")
        if fmt == "csv":
            return df.to_csv(float_format="%.6f")
        return str(df)

    def print(self, fmt: str = "markdown", metrics=("loss", "test/rmse",
                                                    "test/nlpd")) -> str:
        s = self._render(self.dataframe(metrics), fmt)
        print(s)
        return s

    def print_gpr_table(self, fmt: str = "latex",
                        metrics=("lml", "test/rmse", "test/nlpd")) -> str:
        s = self._render(self.gpr_pivot(metrics), fmt)
        print(s)
        return s
