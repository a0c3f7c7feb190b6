"""Best-metric checkpoint / resume.

Reference counterpart: ConvexPruning.py — checkpoint of
{net_state_dict, optimizer_state_dict, TrainConvergence, TestConvergence,
TestAcc} written only on best-metric improvement (:78-88), reloaded by
``ResumeModel`` (:362-371) under a hyperparameter-keyed filename (:526,
:535).  ``examples/MyGCN.py:39-47`` additionally restores start_epoch —
kept here too.

Storage: orbax-free pickle of numpy-ified pytrees (portable, no
device-specific layout), one file per run key.
"""

import os
import os.path as osp
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _to_device(tree):
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, tree)


class CheckpointManager:
    """Save-on-best checkpointing keyed by run name."""

    def __init__(self, directory: str = "checkpoint"):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def path(self, run_key: str) -> str:
        return osp.join(self.directory, f"{run_key}-ckpt.pkl")

    def save_best(self, run_key: str, metric: float, params, opt_state,
                  train_convergence=None, test_convergence=None,
                  epoch: int = 0, extra: Optional[Dict[str, Any]] = None
                  ) -> bool:
        """Write iff ``metric`` beats the stored best (higher is better,
        like the reference's accuracy criterion).  Returns written?"""
        prev = self.load(run_key)
        if prev is not None and prev["metric"] >= metric:
            return False
        payload = {
            "metric": float(metric),
            "epoch": int(epoch),
            "params": _to_numpy(params),
            "opt_state": _to_numpy(opt_state),
            "train_convergence": list(train_convergence or []),
            "test_convergence": list(test_convergence or []),
            "extra": extra or {},
        }
        tmp = self.path(run_key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, self.path(run_key))
        return True

    def load(self, run_key: str) -> Optional[Dict[str, Any]]:
        p = self.path(run_key)
        if not osp.exists(p):
            return None
        with open(p, "rb") as f:
            return pickle.load(f)

    def resume(self, run_key: str):
        """(params, opt_state, train_conv, test_conv, metric, epoch) or
        None (reference ResumeModel, ConvexPruning.py:362-371)."""
        ck = self.load(run_key)
        if ck is None:
            return None
        return (_to_device(ck["params"]), _to_device(ck["opt_state"]),
                ck["train_convergence"], ck["test_convergence"],
                ck["metric"], ck["epoch"])
