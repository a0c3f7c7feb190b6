"""Plot-script family (reference PlotNetworkContraction /
PlotDynamicalEvolution / PlotGraphPartition / DebugMonteConvergence):
each CLI subcommand consumes the .npy/.pkl store the driver produces
and writes a .png."""

import os.path as osp
import pickle

import numpy as np

from pytorch_geometric_tpu.research.plotting import (
    main as plot_main,
    plot_contraction,
    plot_convergence,
    plot_dynamics,
    plot_partition,
)


def _write_curves(results_dir, dataset="Cora"):
    d = results_dir / f"{dataset}Convergence"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for coeff in ("0.4", "0.8"):
        for monte in range(2):
            for which in ("Train", "Test"):
                curve = np.exp(-np.linspace(0, 3, 30)) \
                    + rng.normal(0, 0.02, 30)
                np.save(d / (f"{which}Convergence-{dataset}-GCN2-"
                             f"param_64_32_{coeff}-monte_{monte}.npy"),
                        curve)


def test_convergence_and_contraction_plots(tmp_path):
    _write_curves(tmp_path)
    out1 = plot_convergence(str(tmp_path), "Cora", "Test")
    assert out1 and osp.exists(out1)
    out2 = plot_contraction(str(tmp_path), "Cora", "Train",
                            sweep_key="param", start_plot=5)
    assert out2 and osp.exists(out2)


def test_dynamics_plot(tmp_path):
    from pytorch_geometric_tpu.profiling import save_dynamics_evolution

    rng = np.random.default_rng(0)
    path = str(tmp_path / "Cora-GCN-Pretrain-DiagElement.npy")
    hist = None
    for _ in range(4):
        hist = save_dynamics_evolution(
            rng.normal(size=(20, 12)).astype(np.float32), path,
            num_cutoff=5, history=hist)
    out = plot_dynamics(path)
    assert osp.exists(out)


def test_partition_plot_roundtrip(tmp_path):
    """weight_correction(dump=...) writes the pickles; the partition
    subcommand draws them (reference PlotGraphPartition.py flow)."""
    import jax.numpy as jnp

    from pytorch_geometric_tpu.research.spectral import weight_correction

    rng = np.random.default_rng(0)
    params = {"params": {
        "layers_0": {"weight": jnp.asarray(
            rng.normal(size=(8, 10)).astype(np.float32))},
        "layers_1": {"weight": jnp.asarray(
            rng.normal(size=(10, 6)).astype(np.float32))},
    }}
    weight_correction(params, num_classes=8, correction_coeff=0.01,
                      dump={"results_dir": str(tmp_path),
                            "dataset": "Cora", "model_name": "GCN",
                            "epoch": 40})
    base = tmp_path / "PartitionResults"
    pkls = list(base.glob("*.pkl")) if base.exists() else []
    if not pkls:
        # partition too coarse to dump (reference: len(G_array) > 4)
        return
    out = plot_partition(str(tmp_path), "Cora", "GCN", 40,
                         out=str(tmp_path / "part.png"))
    assert osp.exists(out)


def test_cli_subcommands(tmp_path):
    _write_curves(tmp_path, "Citeseer")
    plot_main(["convergence", "--results_dir", str(tmp_path),
               "--dataset", "Citeseer"])
    plot_main(["contraction", "--results_dir", str(tmp_path),
               "--dataset", "Citeseer", "--start_plot", "3"])
    assert osp.exists(tmp_path / "Citeseer_Test_convergence.png")
    assert osp.exists(tmp_path / "Citeseer_Train_contraction.png")
