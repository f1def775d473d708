"""Message-passing flavours + registry (reference: tf2_gnn/layers/message_passing)."""
from .base import (
    MESSAGE_PASSING_IMPLEMENTATIONS,
    MessagePassing,
    calculate_type_to_num_incoming_edges,
    get_known_message_passing_classes,
    get_message_passing_class,
    register_message_passing_implementation,
)
from .typed_linear import TypedLinear
from .gnn_edge_mlp import GNN_Edge_MLP
from .rgcn import RGCN
from .ggnn import GGNN
from .rgin import RGIN
from .gnn_film import GNN_FiLM
from .rgat import RGAT

__all__ = [
    "MESSAGE_PASSING_IMPLEMENTATIONS",
    "MessagePassing",
    "TypedLinear",
    "calculate_type_to_num_incoming_edges",
    "get_known_message_passing_classes",
    "get_message_passing_class",
    "register_message_passing_implementation",
    "GNN_Edge_MLP",
    "RGCN",
    "GGNN",
    "RGIN",
    "GNN_FiLM",
    "RGAT",
]
