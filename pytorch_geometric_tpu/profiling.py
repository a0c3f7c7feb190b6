"""Profiling / observability.

Reference counterparts (SURVEY §5): gated prints
(``logging`` + ``print_to_logging`` flag, ConvexPruning.py:143-148),
device utilisation dumps (``print_nvidia_useage`` :150-155), activation
dynamics tracing by SVD snapshots (``SaveDynamicsEvolution`` :98-104),
and `.npy` convergence stores.

TPU-native additions: ``trace`` wraps ``jax.profiler`` (the timeline
profiler the reference lacks); ``KernelStats`` computes roofline
numbers (bytes/FLOPs -> achievable fraction of HBM peak) for the SpMM
paths; ``nan_guard`` wraps a function with jax.debug NaN checking.
"""

import contextlib
import os
import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import numpy as np

_FLAGS = {"print_to_logging": True, "print_device_usage": False}


def set_logging(enabled: bool) -> None:
    _FLAGS["print_to_logging"] = enabled


def logging(message: str) -> None:
    """Gated print (reference ConvexPruning.py:143-148)."""
    if _FLAGS["print_to_logging"]:
        print(message)


def print_device_usage() -> None:
    """Device memory stats (the reference shells out to nvidia-smi,
    :150-155; here we read jax device memory stats)."""
    if not _FLAGS["print_device_usage"]:
        return
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 2 ** 20
            lim = stats.get("bytes_limit", 0) / 2 ** 20
            print(f"[{d}] {used:.0f} MiB / {lim:.0f} MiB")
        except Exception:
            print(f"[{d}] memory stats unavailable")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler timeline trace around a block (view with
    tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class KernelStats:
    """Roofline accounting for a segment/SpMM launch."""

    num_edges: int
    num_nodes: int
    feature_dim: int
    dtype_bytes: int = 4
    elapsed_s: Optional[float] = None
    # per-chip peaks (TPU v5e defaults; override for other parts)
    hbm_gbps: float = 819.0
    peak_tflops: float = 197.0  # bf16

    @property
    def bytes_moved(self) -> int:
        """Min traffic: read one source row + weight per edge, write each
        output row once."""
        e, n, f, b = (self.num_edges, self.num_nodes, self.feature_dim,
                      self.dtype_bytes)
        return e * (f * b + 4 + 8) + n * f * b

    @property
    def flops(self) -> int:
        return 2 * self.num_edges * self.feature_dim

    def hbm_fraction(self) -> Optional[float]:
        if not self.elapsed_s:
            return None
        return (self.bytes_moved / self.elapsed_s) / (self.hbm_gbps * 1e9)

    def edges_per_sec(self) -> Optional[float]:
        if not self.elapsed_s:
            return None
        return self.num_edges / self.elapsed_s


def time_fn(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Best-of wall time with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def nan_guard(fn):
    """Wrap fn to raise on non-finite outputs (the reference relies on
    debug-mode input validation, SURVEY §5 race-detection row)."""

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        leaves = jax.tree_util.tree_leaves(out)
        for leaf in leaves:
            arr = np.asarray(leaf)
            if np.issubdtype(arr.dtype, np.floating) and \
                    not np.isfinite(arr).all():
                raise FloatingPointError(
                    f"nan_guard: non-finite output from {fn.__name__}")
        return out

    return wrapped


def save_dynamics_evolution(x, path: str, num_cutoff: int = 10,
                            history: Optional[List] = None):
    """SVD snapshot of an activation matrix appended to a .npy history
    (reference SaveDynamicsEvolution, ConvexPruning.py:98-104)."""
    import jax.numpy as jnp

    d = jnp.linalg.svd(jnp.asarray(x), compute_uv=False)
    history = history if history is not None else []
    history.append(np.asarray(d[:num_cutoff]).tolist())
    np.save(path, np.asarray(history, dtype=object), allow_pickle=True)
    return history
