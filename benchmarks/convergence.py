"""End-to-end learning validation on a structurally-determined synthetic task.

Trains the flagship RGCN node-multiclass model on graphs whose labels are a
function of the 1-hop neighbourhood (label bit c is set iff the mean of the
neighbours' c-th feature block is positive) — learnable only through message
passing, so a rising micro-F1 validates the whole stack end to end (batching,
fused kernels, training loop). Prints one JSON line per epoch and a final
summary line.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from tf2_gnn_tpu.data.graph_dataset import DataFold, GraphDataset, GraphSample
from tf2_gnn_tpu.data.graph_batch import pad_node_label_array
from tf2_gnn_tpu.data.preprocess import process_adjacency_lists

NUM_LABELS = 16
FEATURE_DIM = 32


class SyntheticNeighbourhoodDataset(GraphDataset):
    """Graphs with labels determined by neighbour feature-block means."""

    def __init__(self, params, num_graphs=200, nodes_per_graph=200, seed=0):
        super().__init__(params)
        rng = np.random.RandomState(seed)
        self._folds = {DataFold.TRAIN: [], DataFold.VALIDATION: []}
        for fold, count in ((DataFold.TRAIN, num_graphs),
                            (DataFold.VALIDATION, max(num_graphs // 5, 2))):
            for _ in range(count):
                n = nodes_per_graph
                feats = rng.randn(n, FEATURE_DIM).astype(np.float32)
                edges = np.stack(
                    [rng.randint(0, n, 8 * n), rng.randint(0, n, 8 * n)], axis=1
                ).astype(np.int32)
                # Self loops are load-bearing: without them a second MP
                # layer replaces each node's own 1-hop aggregate with pure
                # 2-hop information and the 1-hop rule becomes unrecoverable
                # (exactly why the reference datasets default them on).
                adjacency, indeg = process_adjacency_lists(
                    [edges], n, add_self_loop_edges=True,
                    tied_fwd_bkwd_edge_types=set(),
                )
                # Label bit c: mean over in-neighbours of feature block c > 0.
                block = FEATURE_DIM // NUM_LABELS
                sums = np.zeros((n, NUM_LABELS), dtype=np.float64)
                counts = np.zeros((n, 1), dtype=np.float64)
                for s, t in edges:
                    sums[t] += feats[s].reshape(NUM_LABELS, block).mean(axis=1)
                    counts[t] += 1
                labels = (sums / np.maximum(counts, 1) > 0).astype(np.float32)
                sample = GraphSample(adjacency, indeg, feats)
                sample.node_labels = labels
                self._folds[fold].append(sample)

    num_node_target_labels = NUM_LABELS

    @property
    def num_edge_types(self):
        return 3  # self loops + fwd + bkwd

    @property
    def node_feature_shape(self):
        return (FEATURE_DIM,)

    def load_data(self, path, folds_to_load=None):
        pass

    def _graph_iterator(self, fold):
        data = list(self._folds[fold])
        if fold == DataFold.TRAIN:
            np.random.shuffle(data)
        return iter(data)

    def _loaded_folds(self):
        return list(self._folds.keys())

    def _graphs_in_fold(self, fold):
        return self._folds[fold]

    def _batch_label_arrays(self, batch_graphs, config):
        labels = np.concatenate([g.node_labels for g in batch_graphs], axis=0)
        return {"node_labels": pad_node_label_array(labels, config.num_nodes)}


def run(epochs, flavour="rgcn", use_pairs=True, quiet=False,
        ppi_shaped=False, merge_targets=False, per_type=False):
    """Train one configuration; returns the per-epoch valid F1 trajectory.

    ``use_pairs=False`` runs the plain XLA gather/segment path (no plans at
    all) — the A/B twin for validating that the fused kernels learn the
    same function, not just match on fixed weights. ``ppi_shaped=True``
    scales the task to the shipped PPI_RGCN configuration (2400-node
    graphs, 8064-node batches, 4 layers, hidden 320) — the closest
    available stand-in for the real PPI convergence run (zero-egress
    environment; PARITY.md §3)."""
    from tf2_gnn_tpu.harness.training import build_training, train_loop
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    np.random.seed(0)  # identical TRAIN shuffles across A/B runs
    ds = SyntheticNeighbourhoodDataset(
        {**GraphDataset.get_default_hyperparameters(),
         "max_nodes_per_batch": 8064 if ppi_shaped else 1024,
         "use_pallas_spmm": use_pairs,
         "use_pair_spmm": use_pairs,
         "pair_merge_targets": merge_targets,
         "pair_per_type": per_type},
        num_graphs=60 if ppi_shaped else 200,
        nodes_per_graph=2400 if ppi_shaped else 200,
    )
    params = NodeMulticlassTask.get_default_hyperparameters(flavour)
    params.update(
        {
            "gnn_hidden_dim": 320 if ppi_shaped else 128,
            "gnn_num_layers": 4 if ppi_shaped else 2,
            "gnn_normalize_by_num_incoming": flavour != "rgat",
            "gnn_layer_input_dropout_rate": 0.0,
            "gnn_edge_dtype": "bfloat16",  # the flagship pair-kernel config
            "learning_rate": 0.002,
        }
    )
    if flavour == "rgat":
        params["gnn_num_heads"] = 4
    model = NodeMulticlassTask.from_params(params, ds)
    batch, _ = next(ds.batch_iterator(DataFold.TRAIN))
    state, train_step, eval_step = build_training(model, params, batch)

    f1s = []

    def log(msg):
        if "MicroF1" in msg and "Valid" in msg or msg.startswith("Initial"):
            token = msg.split("MicroF1:")[1].split("|")[0].split("(")[0]
            f1s.append(float(token.strip(" .\n")))
        if not quiet:
            print(msg, flush=True)

    train_loop(model, state, train_step, eval_step, ds,
               max_epochs=epochs, patience=epochs, log_fun=log)
    return f1s


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mode = sys.argv[2] if len(sys.argv) > 2 else "rgcn"

    if mode == "rgat-ab":
        # A/B: identical seeds/shuffles through the flash pair-attention
        # kernels vs the plain XLA path — the kernel family where a silent
        # numeric drift would hurt most (VERDICT r2 item 6). bf16 streams
        # vs f32 XLA math drift slowly, so the claim is trajectory-level
        # agreement, not bit equality.
        f1_pair = run(epochs, "rgat", use_pairs=True)
        f1_xla = run(epochs, "rgat", use_pairs=False)
        n = min(len(f1_pair), len(f1_xla))
        gap = max(abs(a - b) for a, b in zip(f1_pair[:n], f1_xla[:n]))
        print(json.dumps({
            "task": "synthetic_neighbourhood_multilabel_rgat_ab",
            "pair_trajectory": f1_pair,
            "xla_trajectory": f1_xla,
            "max_f1_gap": round(gap, 4),
            "final_valid_f1": f1_pair[-1] if f1_pair else None,
            "epochs": epochs,
        }), flush=True)
        return

    if mode == "qm9-dtype-ab":
        # f32 vs bf16 KERNEL STREAMS at the QM9 configuration scale
        # (8 layers, hidden 128, RMSProp, ~18-node molecules): the shipped
        # QM9 config keeps f32 streams for pinned reference parity; this
        # A/B is the learning-level evidence for flipping it (+7% step).
        mae_f32 = run_qm9_shaped(epochs, "float32")
        mae_bf16 = run_qm9_shaped(epochs, "bfloat16")
        n = min(len(mae_f32), len(mae_bf16))
        gap = max(abs(a - b) for a, b in zip(mae_f32[:n], mae_bf16[:n]))
        print(json.dumps({
            "task": "synthetic_molecule_regression_dtype_ab",
            "f32_mae_trajectory": mae_f32,
            "bf16_mae_trajectory": mae_bf16,
            "max_mae_gap": round(gap, 5),
            "epochs": epochs,
        }), flush=True)
        return

    if mode == "edge-mlp-ab":
        # A/B for the round-4 target-state 1-hidden pair kernel
        # (ops/pair_edge_mlp.py — the reference's DEFAULT GNN_Edge_MLP
        # config): identical seeds through the merged-target pair path vs
        # the plain XLA per-edge path. The pair forward rounds its
        # messages to the bf16 stream (like every fused path), so the
        # claim is trajectory-level agreement.
        f1_pair = run(epochs, "gnn_edge_mlp", use_pairs=True,
                      merge_targets=True)
        f1_xla = run(epochs, "gnn_edge_mlp", use_pairs=False)
        n = min(len(f1_pair), len(f1_xla))
        gap = max(abs(a - b) for a, b in zip(f1_pair[:n], f1_xla[:n]))
        print(json.dumps({
            "task": "synthetic_neighbourhood_multilabel_edge_mlp_ab",
            "pair_trajectory": f1_pair,
            "xla_trajectory": f1_xla,
            "max_f1_gap": round(gap, 4),
            "final_valid_f1": f1_pair[-1] if f1_pair else None,
            "epochs": epochs,
        }), flush=True)
        return

    if mode == "typed-ab":
        # A/B for the round-5 shipped form: per-type streamed single-sweep
        # plans vs plain XLA, identical seeds/shuffles.
        f1_typed = run(epochs, "rgcn", use_pairs=True, per_type=True)
        f1_xla = run(epochs, "rgcn", use_pairs=False)
        n = min(len(f1_typed), len(f1_xla))
        gap = max(abs(a - b) for a, b in zip(f1_typed[:n], f1_xla[:n]))
        print(json.dumps({
            "task": "synthetic_neighbourhood_multilabel_typed_ab",
            "typed_trajectory": f1_typed,
            "xla_trajectory": f1_xla,
            "max_f1_gap": round(gap, 4),
            "final_valid_f1": f1_typed[-1] if f1_typed else None,
            "epochs": epochs,
        }), flush=True)
        return

    ppi_shaped = mode == "ppi-shaped"
    # ppi-shaped mirrors the SHIPPED PPI_RGCN config, which since round 5
    # rides per-type streamed plans.
    f1s = run(epochs, "rgcn" if ppi_shaped else mode, use_pairs=True,
              ppi_shaped=ppi_shaped, per_type=ppi_shaped)
    print(json.dumps({
        "task": "synthetic_neighbourhood_multilabel"
                + ("_ppi_shaped" if ppi_shaped else ""),
        "flavour": "rgcn" if ppi_shaped else mode,
        "initial_valid_f1": f1s[0] if f1s else None,
        "final_valid_f1": f1s[-1] if f1s else None,
        "epochs": epochs,
    }), flush=True)

class SyntheticMoleculeRegressionDataset(GraphDataset):
    """QM9-shaped regression: ~18-node molecules whose Property is a 1-hop
    structural statistic (mean over edges of f_src[0] * f_tgt[1]) —
    learnable only through message passing. Used by the qm9-dtype-ab mode
    to validate that bf16 kernel streams learn the same function as f32 at
    the QM9 configuration scale."""

    def __init__(self, params, num_graphs=600, seed=0):
        super().__init__(params)
        from tf2_gnn_tpu.data.graph_batch import pad_graph_label_array

        self._pad_graph_label_array = pad_graph_label_array
        rng = np.random.RandomState(seed)
        self._folds = {DataFold.TRAIN: [], DataFold.VALIDATION: []}
        for fold, count in ((DataFold.TRAIN, num_graphs),
                            (DataFold.VALIDATION, max(num_graphs // 5, 2))):
            for _ in range(count):
                n = int(rng.randint(12, 24))
                feats = rng.randn(n, 15).astype(np.float32)
                raw = [np.stack([rng.randint(0, n, 2 * n),
                                 rng.randint(0, n, 2 * n)], axis=1
                                ).astype(np.int32)
                       for _ in range(2)]
                adjacency, indeg = process_adjacency_lists(
                    raw, n, add_self_loop_edges=True,
                    tied_fwd_bkwd_edge_types=set(),
                )
                prop = float(np.mean([
                    feats[s, 0] * feats[t, 1]
                    for e in raw for s, t in e
                ]))
                sample = GraphSample(adjacency, indeg, feats)
                sample.target_value = prop
                self._folds[fold].append(sample)

    @property
    def num_edge_types(self):
        return 5  # self loops + 2 fwd + 2 bkwd

    @property
    def node_feature_shape(self):
        return (15,)

    def load_data(self, path, folds_to_load=None):
        pass

    def _graph_iterator(self, fold):
        data = list(self._folds[fold])
        if fold == DataFold.TRAIN:
            np.random.shuffle(data)
        return iter(data)

    def _loaded_folds(self):
        return list(self._folds.keys())

    def _graphs_in_fold(self, fold):
        return self._folds[fold]

    def _batch_label_arrays(self, batch_graphs, config):
        values = np.asarray([g.target_value for g in batch_graphs],
                            dtype=np.float32)
        return {"target_value": self._pad_graph_label_array(
            values, config.num_graphs)}


def run_qm9_shaped(epochs, edge_dtype):
    """Valid-MAE trajectory of the QM9-shaped regression config at the
    given kernel stream dtype (identical seeds/shuffles across calls)."""
    from tf2_gnn_tpu.harness.training import build_training, train_loop
    from tf2_gnn_tpu.models.graph_regression_task import GraphRegressionTask

    np.random.seed(0)
    ds = SyntheticMoleculeRegressionDataset(
        {**GraphDataset.get_default_hyperparameters(),
         "max_nodes_per_batch": 2048,
         "use_pair_spmm": True},
    )
    params = GraphRegressionTask.get_default_hyperparameters("rgcn")
    params.update({
        "gnn_hidden_dim": 128,
        "gnn_num_layers": 8,
        "gnn_layer_input_dropout_rate": 0.0,
        "gnn_edge_dtype": edge_dtype,
        "optimizer": "RMSProp",
        "learning_rate": 0.001,
    })
    model = GraphRegressionTask.from_params(params, ds)
    batch, _ = next(ds.batch_iterator(DataFold.TRAIN))
    state, train_step, eval_step = build_training(model, params, batch)

    maes = []

    def log(msg):
        if "MAE" in msg and "Valid" in msg:
            maes.append(float(msg.split("MAE =")[1].split("|")[0].strip().rstrip(".")))

    train_loop(model, state, train_step, eval_step, ds, max_epochs=epochs,
               patience=epochs + 1, log_fun=log)
    return maes


if __name__ == "__main__":
    main()
