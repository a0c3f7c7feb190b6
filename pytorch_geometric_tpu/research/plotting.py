"""Convergence-curve store + plotting CLI.

Reference counterpart: PlotMonteCalorsConvergence.py (glob over
hyperparameter-encoded filenames :25,33-40), DebugMonteConvergence.py,
Results/SeabonPlotConvergence.py — the fork's de-facto experiment
registry is the filename (SURVEY §5 config system).
"""

import argparse
import glob
import os.path as osp
import re
from collections import defaultdict

import numpy as np


def load_convergence(results_dir: str, dataset: str, which: str = "Test"):
    """Load all `<which>Convergence-...-monte_k.npy` curves grouped by
    hyperparameter tag (everything between dataset and monte index)."""
    pattern = osp.join(results_dir, f"{dataset}Convergence",
                       f"{which}Convergence-{dataset}-*.npy")
    groups = defaultdict(list)
    for path in sorted(glob.glob(pattern)):
        name = osp.basename(path)
        m = re.match(
            rf"{which}Convergence-{re.escape(dataset)}-(.+)-monte_(\d+)"
            r"\.npy", name)
        if not m:
            continue
        tag, monte = m.group(1), int(m.group(2))
        groups[tag].append((monte, np.load(path)))
    return {tag: [c for _, c in sorted(v)] for tag, v in groups.items()}


def monte_carlo_stats(curves):
    """(mean, std) over Monte-Carlo repeats, truncated to common length."""
    n = min(len(c) for c in curves)
    arr = np.stack([np.asarray(c[:n]) for c in curves])
    return arr.mean(axis=0), arr.std(axis=0)


def plot_convergence(results_dir: str, dataset: str, which: str = "Test",
                     out: str = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = load_convergence(results_dir, dataset, which)
    if not groups:
        print(f"no curves under {results_dir}/{dataset}Convergence")
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for tag, curves in sorted(groups.items()):
        mean, std = monte_carlo_stats(curves)
        xs = np.arange(len(mean))
        ax.plot(xs, mean, label=f"{tag} (n={len(curves)})")
        ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
    ax.set_xlabel("epoch")
    ax.set_ylabel(f"{which} metric")
    ax.set_title(f"{dataset} {which} convergence (Monte-Carlo mean ± std)")
    ax.legend(fontsize=7)
    out = out or osp.join(results_dir,
                          f"{dataset}_{which}_convergence.png")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print(f"wrote {out}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="Results")
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--which", default="Test", choices=["Train", "Test"])
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    plot_convergence(args.results_dir, args.dataset, args.which, args.out)


if __name__ == "__main__":
    main()
