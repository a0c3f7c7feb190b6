"""Headline benchmarks: the reference README speed table, all 7 rows.

Reference baselines (GTX 1080Ti, 200-epoch full-training wall-clock;
reference README.md:55-128, BASELINE.md): Cora/CiteSeer/PubMed x
GCN/GAT + MUTAG-RDF RGCN.

Prints one JSON line per metric as it completes (so partial runs still
record evidence), then a final summary line whose ``detail`` embeds all
metrics — whichever line the driver parses carries the full claim set.

Honesty gates (see bench_common.py): every timed program returns
held-out val/test accuracy of the final parameters evaluated on the
FULL graph, and the closure-vs-full max logit gap; the bench asserts
all of them before printing a number.
"""

import json
import math

import bench_common as bc


def main():
    records = bc.run_headline_suite(epochs=200)
    speedups = [r["vs_baseline"] for r in records
                if r["vs_baseline"] and "fullgraph" not in r["metric"]]
    geo = (math.exp(sum(math.log(s) for s in speedups) / len(speedups))
           if speedups else 0.0)
    print(json.dumps({
        "metric": "headline_geomean_speedup",
        "value": round(geo, 3),
        "unit": "x",
        "vs_baseline": round(geo, 3),
        "detail": {r["metric"]: {"s": r["value"],
                                 "vs_baseline": r["vs_baseline"],
                                 **r.get("detail", {})}
                   for r in records},
    }), flush=True)


if __name__ == "__main__":
    main()
