"""tf2_gnn_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
microsoft/tf2-gnn: the relational message-passing model family (GGNN, RGCN,
RGAT, RGIN, GNN-Edge-MLP, GNN-FiLM), statically-padded node-budget graph
batching, weighted-sum readouts and global exchange, task heads, and a
train/test harness — plus pjit/shard_map scale-out the reference never had.
"""

__version__ = "0.1.0"

from .data import DataFold, GraphBatch, GraphDataset, GraphSample, PaddingConfig
from .layers import (
    GNN,
    GGNN,
    GNN_Edge_MLP,
    GNN_FiLM,
    MessagePassing,
    RGAT,
    RGCN,
    RGIN,
    WASGraphRepresentation,
    WeightedSumGraphRepresentation,
    get_known_message_passing_classes,
    get_message_passing_class,
    register_message_passing_implementation,
)

from .harness import (
    get_known_tasks,
    register_task,
    run_train_from_args,
    save_model,
    test_model,
    train_loop,
)
from .models import (
    GraphBinaryClassificationTask,
    GraphRegressionTask,
    GraphTaskModel,
    NodeMulticlassTask,
    QM9RegressionTask,
)

__all__ = [
    "GraphBinaryClassificationTask",
    "GraphRegressionTask",
    "GraphTaskModel",
    "NodeMulticlassTask",
    "QM9RegressionTask",
    "get_known_tasks",
    "register_task",
    "run_train_from_args",
    "save_model",
    "test_model",
    "train_loop",
    "DataFold",
    "GraphBatch",
    "GraphDataset",
    "GraphSample",
    "PaddingConfig",
    "GNN",
    "GGNN",
    "GNN_Edge_MLP",
    "GNN_FiLM",
    "MessagePassing",
    "RGAT",
    "RGCN",
    "RGIN",
    "WASGraphRepresentation",
    "WeightedSumGraphRepresentation",
    "get_known_message_passing_classes",
    "get_message_passing_class",
    "register_message_passing_implementation",
]
