"""End-to-end slice: 2-layer GCN on (synthetic) Cora — the mirror of the
reference's examples/gcn.py integration workload (SURVEY §7 step 3)."""

import numpy as np

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets.synthetic import synthetic_citation_graph
from pytorch_geometric_tpu.models.citation import train_gcn
from pytorch_geometric_tpu.transforms import NormalizeFeatures


def test_gcn_cora_learns():
    data = NormalizeFeatures()(synthetic_citation_graph("cora", seed=0))
    graph = from_data(data)
    _, metrics = train_gcn(graph, num_classes=7, epochs=60, seed=0)
    # planted-partition synthetic task: must beat chance (1/7) handily
    assert float(metrics["train_acc"]) > 0.6
    assert float(metrics["test_acc"]) > 0.3
    curve = np.asarray(metrics["curve"]["loss"])
    assert curve.shape == (60,)
    assert curve[-1] < curve[0]


def test_gcn_output_respects_padding():
    data = synthetic_citation_graph("cora", seed=0)
    graph = from_data(data)
    # padding nodes must not influence real logits: perturbing padded x
    # rows leaves real rows unchanged
    import jax.numpy as jnp
    from pytorch_geometric_tpu.models.citation import GCN
    from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
    import jax

    model = GCN(hidden_channels=8, num_classes=7)
    norm = gcn_norm(graph)
    params = model.init(jax.random.PRNGKey(0), graph, graph.x, norm)
    logits1 = model.apply(params, graph, graph.x, norm)
    nm = graph.node_mask
    x2 = jnp.where(nm[:, None], graph.x, 123.0)
    logits2 = model.apply(params, graph.replace(x=x2), x2, norm)
    np.testing.assert_allclose(
        np.asarray(logits1)[np.asarray(nm)],
        np.asarray(logits2)[np.asarray(nm)], rtol=1e-5, atol=1e-5)


def test_gcn_pallas_hybrid_path_trains(rng):
    """create_gcn_train_step(pallas=True) now binds HybridSpmm."""
    import jax
    import numpy as np

    from pytorch_geometric_tpu.data import Data, from_data
    from pytorch_geometric_tpu.models.citation import (
        GCN, create_gcn_train_step)

    n = 60
    ei = np.stack([rng.integers(0, n, 300), rng.integers(0, n, 300)])
    tm = np.zeros(n, bool); tm[:10] = True
    g = from_data(Data(x=rng.normal(size=(n, 8)).astype(np.float32),
                       edge_index=ei, y=rng.integers(0, 3, n),
                       train_mask=tm, val_mask=tm, test_mask=tm))
    model = GCN(hidden_channels=4, num_classes=3)
    init_fn, epoch_step, eval_fn = create_gcn_train_step(
        model, g, pallas=True, window=128, tile=128)
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    (params, opt_state, _), metrics = epoch_step(
        (params, opt_state, jax.random.PRNGKey(1)), None)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(eval_fn(params)["test_acc"]))
