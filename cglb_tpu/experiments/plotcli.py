"""Plot/table CLI (reference: cglb_experiments/plotcli.py:29-152).

Commands:
    results_table  — final-metric median table (markdown/latex/csv/plain)
    metrics        — metric-vs-time/iteration band plots per dataset
    cgstep         — CG-steps-per-feval plot
    gpr_table      — LML/RMSE/NLPD table for GPR baselines
"""

from __future__ import annotations

from pathlib import Path

import click

from .plotting import Plotter, TablePrinter, load_experiments


@click.group()
@click.option("-r", "--root", type=click.Path(exists=True, file_okay=False),
              required=True)
@click.pass_context
def main(ctx, root):
    ctx.obj = load_experiments(root)


@main.command("results_table")
@click.option("-f", "--fmt", type=click.Choice(["markdown", "latex", "csv",
                                                "plain"]), default="markdown")
@click.option("-o", "--output", type=click.Path(), default=None)
@click.pass_context
def results_table(ctx, fmt, output):
    s = TablePrinter(ctx.obj).print(fmt)
    if output:
        Path(output).write_text(s)


@main.command()
@click.option("-m", "--metric", default="test/rmse")
@click.option("-x", "--x-axis", type=click.Choice(["elapsed_time",
                                                   "iteration"]),
              default="elapsed_time")
@click.option("-o", "--output-dir", type=click.Path(), default="plots")
@click.pass_context
def metrics(ctx, metric, x_axis, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    exps = ctx.obj
    plotter = Plotter(exps)
    outdir = Path(output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    for dataset in sorted({e.dataset for e in exps}):
        ax = plotter.plot_metric(dataset, metric, x_axis)
        fname = outdir / f"{dataset}-{metric.replace('/', '_')}-{x_axis}.png"
        ax.figure.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(ax.figure)
        click.echo(f"wrote {fname}")


@main.command()
@click.option("-o", "--output-dir", type=click.Path(), default="plots")
@click.pass_context
def cgstep(ctx, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    exps = ctx.obj
    plotter = Plotter(exps)
    outdir = Path(output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    for dataset in sorted({e.dataset for e in exps}):
        ax = plotter.plot_cg_steps(dataset)
        fname = outdir / f"{dataset}-cgsteps.png"
        ax.figure.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(ax.figure)
        click.echo(f"wrote {fname}")


@main.command("gpr_table")
@click.option("-f", "--fmt", type=click.Choice(["markdown", "latex", "csv",
                                                "plain"]), default="markdown")
@click.option("-o", "--output", type=click.Path(), default=None)
@click.pass_context
def gpr_table(ctx, fmt, output):
    """Paper-style baseline table: dataset rows x (model, metric) columns
    (reference: plotting.py:636-708)."""
    s = TablePrinter(ctx.obj).print_gpr_table(fmt)
    if output:
        Path(output).write_text(s)


if __name__ == "__main__":
    main()
