"""Message-passing template + registry.

TPU-native re-design of the reference's ``MessagePassing`` ABC
(tf2_gnn/layers/message_passing/message_passing.py:20-227). The computation is
reorganised around the hardware:

* **node-space transforms**: anything pointwise in the source (or target) node
  state — per-edge-type linear maps, MLPs, FiLM parameters, attention score
  halves — is computed densely as ``[V, D] @ [D, H]`` on the MXU *before*
  touching edges (V << E for typical graphs, and dense matmuls are
  MXU-friendly while per-edge matmuls are not);
* **edge-space combine**: per edge type, gather the node-space results at edge
  endpoints and combine elementwise (VPU / memory-bound);
* **aggregate**: concat messages of all types and scatter-reduce to nodes via
  segment ops (identical semantics to the reference's joint
  ``unsorted_segment_*`` over all types, message_passing.py:166-179).

Padded edges connect pad-node -> pad-node (see data/graph_batch.py), so no
masking is required anywhere in this file.
"""
import dataclasses
from abc import abstractmethod
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from ...ops.activations import get_activation_function
from ...ops.segment import (
    gather_rows,
    get_aggregation_function,
    segment_count,
)

MESSAGE_PASSING_IMPLEMENTATIONS: Dict[str, type] = {}


def register_message_passing_implementation(cls):
    """Register an MP flavour under its lowercased class name
    (reference: message_passing.py:221-227)."""
    MESSAGE_PASSING_IMPLEMENTATIONS[cls.__name__.lower()] = cls
    return cls


def get_message_passing_class(name: str):
    cls = MESSAGE_PASSING_IMPLEMENTATIONS.get(name.lower())
    if cls is None:
        raise ValueError(
            f"Unknown message passing class '{name}'. Known: "
            f"{sorted(MESSAGE_PASSING_IMPLEMENTATIONS)}"
        )
    return cls


def get_known_message_passing_classes():
    return sorted(MESSAGE_PASSING_IMPLEMENTATIONS.keys())


def calculate_type_to_num_incoming_edges(batch: GraphBatch) -> jnp.ndarray:
    """float32 [L, V]: per-type in-degree of every (locally owned) node.

    Equivalent of reference message_passing.py:230-263; padded edges target the
    pad node (SPMD: the local discard row) so real rows are exact without
    masking. In SPMD mode this needs no collective: every edge lives on the
    shard that owns its target.

    Batches built by the production batcher carry ``in_degrees`` precomputed
    on the host (data/graph_batch.py::host_in_degrees — bit-identical); the
    device scatter-count (~1.4 ms/step on the PPI bench) only runs for
    hand-built batches that lack it.
    """
    if batch.in_degrees is not None:
        return batch.in_degrees
    v = batch.aggregation_segments
    return jnp.stack(
        [batch.slice_aggregated(segment_count(tgt, v)) for tgt in batch.edge_targets],
        axis=0,
    )


class MessagePassing(nn.Module):
    """Template for one message-passing step: ``[V, D] -> [V, hidden_dim]``.

    Subclasses implement ``_compute_messages_per_type`` (node-space transforms
    + edge-space gather/combine) and may override
    ``_compute_new_node_embeddings`` for non-standard aggregation (GGNN's GRU,
    RGIN's aggregation MLP, RGAT's attention softmax).
    """

    hidden_dim: int = 7
    aggregation_function: str = "sum"
    message_activation_function: str = "relu"
    message_activation_before_aggregation: bool = False
    # Dtype of the per-edge message stream (gather + scatter operands).
    # "bfloat16" halves edge-path HBM traffic; aggregation accumulates f32.
    edge_dtype: str = "float32"
    # Compute dtype of the node-space TypedLinear transforms (f32 master
    # params, f32 accumulation — standard mixed precision). "bfloat16"
    # halves the dense operand bandwidth; the MXU's default single pass
    # truncates f32 inputs to bf16 per pass anyway, so the product rounding
    # is unchanged (measured -1.0 ms/layer on the RGAT bench shape).
    dense_dtype: str = "float32"

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        """Default hypers, composed up the inheritance chain like the
        reference (message_passing.py:42-49 + subclass updates)."""
        return {
            "aggregation_function": "sum",
            "message_activation_function": "relu",
            "message_activation_before_aggregation": False,
            "hidden_dim": 7,
            "edge_dtype": "float32",
            "dense_dtype": "float32",
        }

    @classmethod
    def from_params(cls, params: Dict[str, Any], name: str = None) -> "MessagePassing":
        """Build an instance from a flat hyperparameter dict, ignoring keys
        that don't correspond to constructor fields."""
        field_names = {f.name for f in dataclasses.fields(cls) if f.init}
        kwargs = {}
        for key, value in params.items():
            if key in field_names and key not in ("parent", "name"):
                if isinstance(value, list):
                    value = tuple(value)
                kwargs[key] = value
        return cls(name=name, **kwargs)

    # ------------------------------------------------------------------ hooks
    @abstractmethod
    def _compute_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ) -> List[Any]:
        """Return a list with one entry per edge type; entries are [E_l, H]
        message arrays (or flavour-specific tuples, cf. RGAT)."""
        ...

    # GGNN-style subclasses set this False: their update consumes the raw
    # aggregate and never applies the message activation (reference
    # ggnn.py:62-89).
    _apply_message_activation = True

    def _compute_new_node_embeddings(
        self,
        node_states: jnp.ndarray,
        messages_per_type: List[Any],
        batch: GraphBatch,
        training: bool,
    ) -> jnp.ndarray:
        """Default: concat all types, apply activation before/after the
        configured segment aggregation (reference message_passing.py:135-179),
        then hand the aggregate to ``_post_aggregate``."""
        activation = get_activation_function(self.message_activation_function)
        aggregation = get_aggregation_function(self.aggregation_function)

        messages = jnp.concatenate(messages_per_type, axis=0)  # [M, H]
        messages = messages.astype(jnp.float32)  # f32 accumulation
        targets = jnp.concatenate(batch.edge_targets, axis=0)  # [M]

        if self._apply_message_activation and self.message_activation_before_aggregation:
            messages = activation(messages)
        aggregated = batch.slice_aggregated(
            aggregation(messages, targets, batch.aggregation_segments)
        )
        return self._post_aggregate(aggregated, node_states, batch, training)

    def _post_aggregate(
        self,
        aggregated: jnp.ndarray,
        node_states: jnp.ndarray,
        batch: GraphBatch,
        training: bool,
    ) -> jnp.ndarray:
        """Turn the aggregated messages into new node states. Default: the
        (after-aggregation) activation; GGNN's GRU / RGIN's MLP override."""
        if self._apply_message_activation and not self.message_activation_before_aggregation:
            aggregated = get_activation_function(self.message_activation_function)(
                aggregated
            )
        return aggregated

    def _fused_sum_aggregate(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ):
        """Subclass hook: return the [V, H] sum-aggregated messages via the
        fused Pallas gather/scatter path, or None when not applicable."""
        return None

    def _halo_overlap_capable(self, batch: GraphBatch) -> bool:
        """Subclass hook: True when the flavour's fused path accepts LOCAL
        node states under SPMD-halo and self-assembles its ext source
        tables (the collective then overlaps the local transforms)."""
        return False

    @staticmethod
    def _globalize_tables(tables_flat: jnp.ndarray, batch: GraphBatch,
                          num_types: int) -> jnp.ndarray:
        """Legacy SPMD source-table resolution for the fused path:
        all_gather the per-type node tables over the mesh axis so GLOBAL
        merged source ids resolve ([L*Vp, ...] local -> [L*Vp*S, ...]
        global). In halo mode the tables already span the ext row space (the
        layer ran its node-space transforms on halo-exchanged states) and
        the plans were built with ext-local sources — identity. Identity
        off-SPMD too."""
        if batch.spmd_axis is None or batch.halo_mode:
            return tables_flat
        import jax as _jax

        v = batch.num_nodes_padded
        per_type = tables_flat.reshape(num_types, v, -1)
        gathered = _jax.lax.all_gather(
            per_type, batch.spmd_axis, axis=1, tiled=True
        )  # [L, Vp*S, ...]
        return gathered.reshape(num_types * v * batch.spmd_num_shards, -1)

    @staticmethod
    def _exchange_halo(node_states: jnp.ndarray,
                       batch: GraphBatch) -> jnp.ndarray:
        """Boundary-only halo exchange (SURVEY §2.4 item 2): the
        host-planned boundary rows replace the per-layer all_gather — bytes
        scale with the boundary size, not V. Two wire forms, chosen by the
        partitioner: a dense all_to_all (every (owner, consumer) pair
        padded alike — right for scattered connectivity) or one ppermute
        per ACTIVE ring distance (per-distance padding — right for
        locality-sorted graphs, where only neighbour shards exchange).
        Returns the ext state table ``[local | halo slabs | pad]`` that
        ext-local source ids index. The transpose (boundary-row gradients
        routed back to their owners and scatter-added) is the automatic AD
        of gather + collective + concat."""
        halo = MessagePassing._halo_recv(node_states, batch)
        parts = [node_states]
        if halo is not None:
            parts.append(halo)
        pad = batch.halo_ext_nodes - sum(p.shape[0] for p in parts)
        if pad:
            parts.append(jnp.zeros((pad, node_states.shape[-1]),
                                   node_states.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    @staticmethod
    def _halo_recv(node_states: jnp.ndarray,
                   batch: GraphBatch) -> Optional[jnp.ndarray]:
        """Just the received boundary rows (no local concat): the building
        block that lets consumers run their LOCAL node-space transforms
        concurrently with the collective (SURVEY hard part 4 — the
        collective's input is the raw states, so XLA's latency-hiding
        scheduler overlaps it with any transform of the local rows).
        None when the ring plan has no active distances."""
        import jax as _jax

        if batch.halo_ring_send is not None:
            s = batch.spmd_num_shards
            parts = []
            for k, idx in zip(batch.halo_ring_dists, batch.halo_ring_send):
                send = jnp.take(node_states, idx, axis=0, mode="clip")
                recv = _jax.lax.ppermute(
                    send, batch.spmd_axis,
                    perm=[(i, (i + k) % s) for i in range(s)])
                parts.append(recv.astype(node_states.dtype))
            if not parts:
                return None
            return (jnp.concatenate(parts, axis=0) if len(parts) > 1
                    else parts[0])
        idx = batch.halo_send_idx          # [S, max_send] per shard
        num_shards, max_send = idx.shape
        send = jnp.take(node_states, idx.reshape(-1), axis=0,
                        mode="clip").reshape(num_shards, max_send, -1)
        recv = _jax.lax.all_to_all(send, batch.spmd_axis, 0, 0,
                                   tiled=False)
        return recv.reshape(num_shards * max_send,
                            -1).astype(node_states.dtype)

    # ------------------------------------------------------------------ entry
    @nn.compact
    def __call__(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool = False
    ) -> jnp.ndarray:
        halo = batch.spmd_axis is not None and batch.halo_mode
        if halo and self._halo_overlap_capable(batch):
            # The fused path self-assembles its ext source tables: LOCAL
            # node-space transforms run concurrently with the boundary
            # collective (_fused_node_space_tables / _halo_recv).
            fused = self._fused_sum_aggregate(node_states, batch, training)
            if fused is not None:
                return self._post_aggregate(fused, node_states, batch,
                                            training)
            src_states = self._exchange_halo(node_states, batch)
        else:
            # Source-side transforms run over [local | halo] rows; the
            # aggregation/update side stays local-only.
            src_states = (self._exchange_halo(node_states, batch)
                          if halo else node_states)
            fused = self._fused_sum_aggregate(src_states, batch, training)
            if fused is not None:
                return self._post_aggregate(fused, node_states, batch,
                                            training)
        messages_per_type = self._compute_messages_per_type(src_states, batch, training)
        return self._compute_new_node_embeddings(
            node_states, messages_per_type, batch, training
        )

    # ------------------------------------------------------------ shared helpers
    def _normalize_by_incoming(
        self,
        messages: jnp.ndarray,
        edge_type: int,
        batch: GraphBatch,
        in_degrees: jnp.ndarray,
    ) -> jnp.ndarray:
        """Scale each message by 1/(in-degree of its target for this type)
        (reference gnn_edge_mlp.py:102-106, incl. the SMALL_NUMBER epsilon)."""
        from ...utils.constants import SMALL_NUMBER

        per_edge = gather_rows(in_degrees[edge_type], batch.edge_targets[edge_type])
        return messages * (1.0 / (per_edge + SMALL_NUMBER))[:, None]
