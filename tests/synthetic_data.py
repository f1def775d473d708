"""Synthetic dataset builders shared by dataset / model / harness tests.

Mirrors the role of the reference's test fixtures
(test/data/test_datasets.py:43-119): tiny QM9/PPI/JsonL-format files written
to a tmp directory so loaders are exercised end-to-end.
"""
import json
from pathlib import Path

import numpy as np

from tf2_gnn_tpu.data.io import write_jsonl_gz


def random_graph(rng, num_nodes, num_edges, feature_dim):
    nodes = rng.randint(0, num_nodes, size=(num_edges, 2))
    return {
        "node_features": rng.randn(num_nodes, feature_dim).round(3).tolist(),
        "adjacency_lists": [nodes.tolist()],
    }


def write_jsonl_property_dataset(
    path: Path, num_graphs=12, feature_dim=7, num_fwd_edge_types=1, seed=0
):
    """train/valid/test.jsonl.gz with a scalar Property per graph."""
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for fold in ("train", "valid", "test"):
        records = []
        for _ in range(num_graphs):
            num_nodes = rng.randint(4, 10)
            graph = {
                "node_features": rng.randn(num_nodes, feature_dim).round(3).tolist(),
                "adjacency_lists": [
                    rng.randint(0, num_nodes, size=(rng.randint(3, 8), 2)).tolist()
                    for _ in range(num_fwd_edge_types)
                ],
            }
            # Property correlated with mean feature so learning is possible.
            prop = float(np.mean(graph["node_features"]) * 3.0 + num_nodes * 0.1)
            records.append({"graph": graph, "Property": prop})
        write_jsonl_gz(path / f"{fold}.jsonl.gz", records)
    return path


def write_qm9_dataset(path: Path, num_graphs=10, feature_dim=6, seed=0):
    """QM9-format jsonl.gz: graph = (src, 1-indexed type, dst) triples."""
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for fold in ("train", "valid", "test"):
        records = []
        for _ in range(num_graphs):
            num_nodes = rng.randint(4, 9)
            edges = [
                [int(rng.randint(0, num_nodes)), int(rng.randint(1, 5)),
                 int(rng.randint(0, num_nodes))]
                for _ in range(rng.randint(3, 9))
            ]
            features = rng.randn(num_nodes, feature_dim).round(3)
            records.append(
                {
                    "graph": edges,
                    "node_features": features.tolist(),
                    "targets": [[float(features.sum() * 0.05)] for _ in range(13)],
                }
            )
        write_jsonl_gz(path / f"{fold}.jsonl.gz", records)
    return path


def write_ppi_dataset(path: Path, graphs_per_fold=2, nodes_per_graph=8,
                      feature_dim=5, num_labels=121, seed=0,
                      edges_per_graph=None,
                      folds=("train", "valid", "test")):
    """DGL-format PPI files: {fold}_graph.json + feats/labels/graph_id .npy.

    ``graphs_per_fold``/``edges_per_graph`` may be dicts keyed by fold name
    (benchmarks write real-PPI-sized folds: 20 train graphs of ~2400 nodes).
    """
    rng = np.random.RandomState(seed)
    path.mkdir(parents=True, exist_ok=True)
    for fold in folds:
        n_graphs = (graphs_per_fold.get(fold)
                    if isinstance(graphs_per_fold, dict) else graphs_per_fold)
        e_pg = (edges_per_graph.get(fold)
                if isinstance(edges_per_graph, dict) else edges_per_graph)
        if e_pg is None:
            e_pg = nodes_per_graph * 2
        total_nodes = n_graphs * nodes_per_graph
        feats = rng.randn(total_nodes, feature_dim).astype(np.float32)
        labels = (rng.rand(total_nodes, num_labels) > 0.9).astype(np.float32)
        graph_ids = np.repeat(np.arange(n_graphs), nodes_per_graph)
        links = []
        for g in range(n_graphs):
            base = g * nodes_per_graph
            if e_pg == nodes_per_graph * 2:
                # Original per-link draw order — BIT-COMPATIBLE with the
                # recorded reference fixtures (test_reference_parity
                # captured the executed reference on exactly this stream).
                for _ in range(e_pg):
                    links.append({
                        "source": int(base + rng.randint(0, nodes_per_graph)),
                        "target": int(base + rng.randint(0, nodes_per_graph)),
                    })
            else:
                src = base + rng.randint(0, nodes_per_graph, e_pg)
                tgt = base + rng.randint(0, nodes_per_graph, e_pg)
                links.extend(
                    {"source": int(s), "target": int(t)}
                    for s, t in zip(src, tgt)
                )
        with open(path / f"{fold}_graph.json", "w") as f:
            json.dump({"links": links}, f)
        np.save(path / f"{fold}_feats.npy", feats)
        np.save(path / f"{fold}_labels.npy", labels)
        np.save(path / f"{fold}_graph_id.npy", graph_ids)
    return path
