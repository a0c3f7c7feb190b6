"""Examples as integration tests (the reference's de-facto test layer,
SURVEY §4).  Full runs are slow on CPU (jit compiles), so they are
gated behind RUN_SLOW=1; CI keeps the always-on subset tiny."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SLOW = os.environ.get("RUN_SLOW") != "1"


def test_gcn_example_fast():
    from examples.gcn import run
    metrics = run(epochs=30)
    assert float(metrics["train_acc"]) > 0.6


@pytest.mark.skipif(SLOW, reason="RUN_SLOW=1 to enable")
@pytest.mark.parametrize("mod,kwargs", [
    ("examples.mutag_gin", dict(epochs=5)),
    ("examples.enzymes_topk_pool", dict(epochs=3)),
    ("examples.rgcn", dict(epochs=20)),
    ("examples.autoencoder", dict(epochs=30)),
    ("examples.reddit_sage", dict(epochs=1, max_batches=5)),
    ("examples.qm9_nn_conv", dict(epochs=1, num_samples=200)),
    ("examples.enzymes_diff_pool", dict(epochs=2)),
])
def test_example_smoke(mod, kwargs):
    import importlib

    m = importlib.import_module(mod)
    result = m.run(**kwargs)
    assert result is not None
