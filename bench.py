"""Headline benchmarks: the reference README speed table, all 7 rows.

Reference baselines (GTX 1080Ti, 200-epoch full-training wall-clock;
reference README.md:55-128, BASELINE.md): Cora/CiteSeer/PubMed x
GCN/GAT + MUTAG-RDF RGCN, plus the Reddit-scale bandwidth rows
(bench_scale.py).

Prints one JSON line per metric as it completes (so partial runs still
record evidence), then a final summary line whose ``detail`` embeds all
metrics — whichever line the driver parses carries the full claim set.

Each suite runs in its OWN subprocess: the single TPU chip is held by
one JAX client at a time, and a hang anywhere (the 114M-edge Reddit
setup allocates tens of GB on a slow-memory host) is bounded by a hard
wall-clock cap instead of taking the whole bench down.

Honesty gates (see bench_common.py): every timed program returns
held-out val/test accuracy of the final parameters evaluated on the
FULL graph, and the closure-vs-full max logit gap; the bench asserts
all of them before printing a number.
"""

import json
import math
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _geomean(vals):
    vals = [v for v in vals if v]
    return (math.exp(sum(math.log(v) for v in vals) / len(vals))
            if vals else 0.0)


def run_suite_subprocess(script: str, timeout_s: float, label: str):
    """Run one bench suite in a subprocess with a hard wall-clock cap;
    re-print its JSON rows and parse them back for the summary."""
    records = []
    proc = subprocess.Popen(
        [sys.executable, os.path.join(_HERE, script)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        print(json.dumps({"metric": f"{label} ERROR",
                          "error": f"timeout after {timeout_s:.0f}s"}),
              flush=True)
    for line in (out or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        print(line, flush=True)
        if "metric" in rec and "value" in rec:
            records.append(rec)
    return records


def main():
    records = run_suite_subprocess(
        "bench_common.py",
        float(os.environ.get("BENCH_HEADLINE_TIMEOUT", "5400")),
        "headline_suite")
    records += run_suite_subprocess(
        "bench_scale.py",
        float(os.environ.get("BENCH_SCALE_TIMEOUT", "3300")),
        "scale_suite")
    closure = [r["vs_baseline"] for r in records
               if r.get("vs_baseline") and "fullgraph" not in r["metric"]
               and r.get("unit") == "s"
               and "epoch_wallclock" in r["metric"]]
    fullgraph = [r["vs_baseline"] for r in records
                 if r.get("vs_baseline") and "fullgraph" in r["metric"]]
    # The kernel-capability summary: full-graph rows only (no training
    # closure — every epoch touches every edge, like the reference).
    print(json.dumps({
        "metric": "fullgraph_geomean_speedup",
        "value": round(_geomean(fullgraph), 3),
        "unit": "x",
        "vs_baseline": round(_geomean(fullgraph), 3),
        "detail": {"note": "geomean over full-graph (non-closure) rows; "
                   "the honest kernel-capability signal"},
    }), flush=True)
    geo = _geomean(closure)
    print(json.dumps({
        "metric": "headline_geomean_speedup",
        "value": round(geo, 3),
        "unit": "x",
        "vs_baseline": round(geo, 3),
        "detail": {
            "note": "closure rows are algorithmic wins (gradient-"
            "identical training closure); fullgraph rows are "
            "kernel-capability wins",
            **{r["metric"]: {"s": r["value"],
                             "vs_baseline": r["vs_baseline"],
                             **r.get("detail", {})}
               for r in records if r.get("unit") == "s"
               and "epoch_wallclock" in r["metric"]},
            **{r["metric"]: {"value": r["value"],
                             "unit": r.get("unit"),
                             **r.get("detail", {})}
               for r in records if "epoch_wallclock" not in r["metric"]},
        },
    }), flush=True)


if __name__ == "__main__":
    main()
