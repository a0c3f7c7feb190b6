"""Regenerate docs/API.md from the package's live public surface.

Usage: python tools/gen_api_docs.py   (run from the repo root)
"""
import os
import inspect
import importlib
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import warnings
warnings.filterwarnings("ignore")

MODS = [
    ("pytorch_geometric_tpu.data", "Graph data core: static-shape Graph pytree, batching, loaders, datasets base"),
    ("pytorch_geometric_tpu.datasets", "Benchmark corpora (real parsers + deterministic offline fallback)"),
    ("pytorch_geometric_tpu.transforms", "Data -> Data feature/geometry derivations"),
    ("pytorch_geometric_tpu.nn", "Conv zoo, pooling, models, message-passing core"),
    ("pytorch_geometric_tpu.utils", "Index-space graph helpers"),
    ("pytorch_geometric_tpu.cluster", "Host-side clustering/sampling kernels (C++ with numpy fallback)"),
    ("pytorch_geometric_tpu.parallel", "Data parallelism + edge-partitioned multi-chip training"),
]


def first_doc_line(src: str) -> str:
    src = src.lstrip()
    if src.startswith(('"""', "'''")):
        return src[3:].split('"""')[0].split("'''")[0].strip().split("\n")[0]
    return ""


def main():
    out = ["# API reference\n",
           "Generated from the package's public `__all__` surfaces "
           "(tools/gen_api_docs.py regenerates this file).  See "
           "MIGRATION.md for the PyG-to-TPU mapping and README.md for "
           "design notes.\n"]
    for name, blurb in MODS:
        mod = importlib.import_module(name)
        out.append(f"\n## `{name}`\n\n{blurb}.\n")
        names = getattr(mod, "__all__", None) or \
            [n for n in dir(mod) if not n.startswith("_")]
        out.append("| name | kind | summary |\n|---|---|---|\n")
        for n in sorted(names):
            obj = getattr(mod, n, None)
            if obj is None or inspect.ismodule(obj):
                continue
            doc = (inspect.getdoc(obj) or "").strip().split("\n")[0]
            kind = "class" if inspect.isclass(obj) else \
                   "function" if callable(obj) else "value"
            try:
                sig = str(inspect.signature(obj)) if callable(obj) else ""
            except (ValueError, TypeError):
                sig = ""
            if len(sig) > 80:
                sig = sig[:77] + "..."
            doc = doc.replace("|", "\\|")
            shown = f"{n}{sig}" if kind == "function" else n
            out.append(f"| `{shown}` | {kind} | {doc} |\n")

    out.append("\n## `pytorch_geometric_tpu.research`\n\n"
               "The reference fork's research layer (pruning / spectral "
               "analysis / quantization), one module per workflow:\n\n")
    for p in sorted(pathlib.Path("pytorch_geometric_tpu/research").glob("*.py")):
        if p.name != "__init__.py":
            out.append(f"- `research.{p.stem}` — {first_doc_line(p.read_text())}\n")

    out.append("\n## Kernel layer (`pytorch_geometric_tpu.ops`)\n\n"
               "Internal but stable: the Pallas/XLA compute path under the "
               "nn layer.\n\n")
    for p in sorted(pathlib.Path("pytorch_geometric_tpu/ops").glob("*.py")):
        if p.name != "__init__.py":
            out.append(f"- `ops.{p.stem}` — {first_doc_line(p.read_text())}\n")

    pathlib.Path("docs/API.md").write_text("".join(out))
    print(f"wrote docs/API.md ({len(''.join(out))} chars)")


if __name__ == "__main__":
    main()
