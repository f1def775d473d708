"""RGAT message passing (relational multi-head graph attention).

Reference semantics (tf2_gnn/layers/message_passing/rgat.py:91-163): per edge
type, transform source/target with a shared W_l; per head k, attention logit
``e = LeakyReLU(a_l_k . concat(src_k, tgt_k))``; softmax per *target node over
all edge types jointly*; weighted sum of transformed sources per head; concat
heads; activation.

TPU mapping (the classic GAT decomposition): since
``a . concat(s, t) = a_src . s + a_tgt . t``, the SDDMM collapses to two
node-space score tables [V, K] (one einsum each) gathered per edge — no
per-edge matmuls at all. The edge softmax is a segment-softmax over targets.
"""
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from ...ops.activations import get_activation_function
from ...ops.segment import segment_log_softmax, segment_sum
from .base import MessagePassing, register_message_passing_implementation
from .typed_linear import TypedLinear


@register_message_passing_implementation
class RGAT(MessagePassing):
    num_heads: int = 3
    # Softmax stabiliser of the pair-attention path: "bound" computes a
    # node-space upper bound on the per-(target, head) max logit with two
    # tiny dense reduces (ops/pair_attention.py::_bound_stabiliser) — the
    # NORMALISED attention output is exact under any stabiliser >= the true
    # max (shift invariance), and the exact max kernel's full pass over the
    # edge plans (~2.5 ms/layer at the PPI bench shape) disappears.
    # "exact" restores the max kernel.
    attention_stabiliser: str = "bound"

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update({"num_heads": 3, "attention_stabiliser": "bound"})
        return params

    def _padded_heads(self) -> int:
        """Heads padded up to the next divisor of the kernel TILE (the pair
        attention kernels tile per-head scales across the feature tile, so
        TILE % K must be 0; pad heads carry neutral scores)."""
        from ...ops.pair_attention import TILE

        k = self.num_heads
        while TILE % k:
            k += 1
        return k

    def _pair_attention_applicable_static(self, batch: GraphBatch) -> bool:
        """Shape-only gate for the flash pair-attention path — decided BEFORE
        any module creation (flax NameInUseError on re-creation). Under SPMD
        the path requires the halo form and merged (non-typed) plans: the
        kernels run per shard over the ext-local source row space
        ``[local | halo slabs]`` with local targets."""
        from ...ops.pair_attention import pair_attention_applicable

        if batch.pair_targets_merged:
            return False
        if batch.spmd_axis is not None and (
                not batch.halo_mode or batch.pair_plans is None):
            return False
        if batch.pair_plans is None and batch.pair_plans_typed is None:
            return False
        stream_dtype = jnp.dtype(
            self.edge_dtype if self.edge_dtype != "float32" else jnp.float32
        )
        k_pad = self._padded_heads()
        head_dim = self.hidden_dim // self.num_heads
        # Per-type (row-split) plans launch one type at a time, so each
        # launch's residency is one [V]-row slab.
        rows = (batch.pair_src_space if batch.pair_plans is None
                else batch.num_edge_types * batch.pair_src_space)
        return pair_attention_applicable(
            rows, batch.num_nodes_padded, head_dim * k_pad, k_pad,
            stream_dtype, stream_dtype, src_space=batch.pair_src_space,
        )

    def _halo_overlap_capable(self, batch: GraphBatch) -> bool:
        # Only the pair-attention path self-assembles its ext tables from
        # LOCAL states (so the boundary collective overlaps the local
        # transforms); the scatter-plan fused path expects pre-exchanged
        # ext states and must keep receiving them.
        return self._pair_attention_applicable_static(batch)

    def _pair_attention_aggregate(self, node_states, batch: GraphBatch):
        """Flash-style fused RGAT on the block-pair plans
        (ops/pair_attention.py): max, expd, denominators and exp-weighted
        sums all run on the chunk structure — no per-edge XLA gathers at
        all. Heads are padded to a TILE divisor with neutral scores
        (source half 0, target half NEG => expd exactly 0)."""
        from ...ops.pair_attention import (
            NEG,
            pair_attention,
            pair_attention_typed,
        )

        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        heads = self.num_heads
        head_dim = self.hidden_dim // heads
        k_pad = self._padded_heads()

        mod = TypedLinear(num_types, node_states.shape[-1], self.hidden_dim,
                          name="edge_weights",
                          compute_dtype=self.dense_dtype)
        if (batch.spmd_axis is not None and batch.halo_mode
                and node_states.shape[0] == batch.num_nodes_padded):
            # Halo-overlap form: LOCAL states in, ext tables self-assembled —
            # the boundary collective's input is the RAW states, so XLA's
            # latency-hiding scheduler runs it concurrently with the local
            # transform (the per-type map is row-wise, so
            # transform(exchange(x)) == exchange'(transform(x)) exactly).
            local_t = mod(node_states)
            halo = self._halo_recv(node_states, batch)
            parts = [local_t]
            if halo is not None:
                parts.append(mod(halo))
            pad = batch.halo_ext_nodes - sum(p.shape[1] for p in parts)
            if pad:
                parts.append(jnp.zeros(
                    (num_types, pad, self.hidden_dim), local_t.dtype))
            transformed = (jnp.concatenate(parts, axis=1)
                           if len(parts) > 1 else parts[0])
            vs = batch.halo_ext_nodes
        else:
            # Single-chip, or pre-exchanged EXT states ([local | halo] rows):
            # the tables span whatever row space arrives; targets stay local.
            transformed = mod(node_states)  # [L, Vs, H]
            vs = node_states.shape[0]
        attention_params = self.param(
            "edge_attention_parameters",
            nn.initializers.glorot_uniform(batch_axis=(0,)),
            (num_types, heads, 2 * head_dim),
        )
        per_head = transformed.reshape(num_types, vs, heads, head_dim)
        src_scores = jnp.einsum(
            "lvkd,lkd->lvk", per_head, attention_params[:, :, :head_dim]
        )
        tgt_scores = jnp.einsum(
            "lvkd,lkd->lvk", per_head, attention_params[:, :, head_dim:]
        )
        if k_pad != heads:
            pad = ((0, 0), (0, 0), (0, k_pad - heads))
            src_scores = jnp.pad(src_scores, pad)
            tgt_scores = jnp.pad(tgt_scores, pad, constant_values=NEG)
            per_head = jnp.pad(
                per_head, ((0, 0), (0, 0), (0, k_pad - heads), (0, 0))
            )
        # HK-MAJOR message layout (column hd * K + k) aligns a tiled repeat
        # of the K expd columns with the feature tile.
        table_hk = per_head.transpose(0, 1, 3, 2).reshape(
            num_types * vs, head_dim * k_pad
        )
        scores = jnp.concatenate(
            [src_scores.reshape(num_types * vs, k_pad),
             tgt_scores.reshape(num_types * vs, k_pad)],
            axis=1,
        )
        if self.edge_dtype != "float32":
            table_hk = table_hk.astype(self.edge_dtype)
            scores = scores.astype(self.edge_dtype)

        if batch.pair_plans is not None:
            denom, weighted = pair_attention(
                table_hk, scores, *batch.pair_plans[:10], v, k_pad,
                self.attention_stabiliser, vs if vs != v else None,
            )
        else:
            # Row-split form: one single-type launch per edge type (the
            # joint softmax stabiliser spans all launches).
            denom, weighted = pair_attention_typed(
                table_hk, scores, batch.pair_plans_typed, v, k_pad,
                self.attention_stabiliser,
            )
        # Where-guarded division, NOT +eps: the reference's softmax
        # (rgat.py:139-151, exp(log_softmax)) has no epsilon — empty targets
        # contribute exactly 0. An additive eps would also distort
        # loose-bound targets under the "bound" stabiliser, where the
        # unnormalised pair scales by exp(max - m̂) and denominators can sit
        # far below the exact path's >= 1 guarantee.
        denom_t = jnp.tile(denom, (1, head_dim))
        weighted = jnp.where(
            denom_t > 0.0,
            weighted / jnp.where(denom_t > 0.0, denom_t, 1.0),
            0.0,
        )
        # Drop pad heads and restore the reference's concat-head layout.
        out = weighted.reshape(v, head_dim, k_pad)[:, :, :heads]
        return out.transpose(0, 2, 1).reshape(v, self.hidden_dim)

    def _fused_sum_aggregate(self, node_states, batch: GraphBatch, training):
        """Fused RGAT: the SDDMM collapses to two node-space score tables, so
        per edge the path is ONE bundled source gather (transformed states +
        source score halves), one type-minor target gather of the target
        halves, the Pallas segment-max for softmax stabilisation, and the
        fused attention kernel that produces softmax denominators AND
        exp-weighted message sums in a single pass. Preferred: the fully
        gather-free pair-attention path (_pair_attention_aggregate)."""
        if (
            (batch.scatter_plans is None and batch.pair_plans is None
             and batch.pair_plans_typed is None)
            or (batch.spmd_axis is not None and batch.spmd_num_shards is None)
            or self.aggregation_function != "sum"
            or self.message_activation_before_aggregation
            or self.hidden_dim % self.num_heads
        ):
            return None
        if self._pair_attention_applicable_static(batch):
            return self._pair_attention_aggregate(node_states, batch)
        if batch.scatter_plans is None:
            return None
        from ...ops.segment import segment_log_softmax
        from ...ops.spmm_pallas import (
            BLOCK_NODES,
            PlanView,
            plan_gather_src,
            plan_gather_tgt_typed,
        )

        plan = PlanView(batch.scatter_plans)
        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        vr = node_states.shape[0]  # ext rows in halo-SPMD mode
        heads = self.num_heads
        head_dim = self.hidden_dim // heads

        transformed = TypedLinear(
            num_types, node_states.shape[-1], self.hidden_dim, name="edge_weights",
            compute_dtype=self.dense_dtype
        )(node_states)  # [L, Vr, H]
        attention_params = self.param(
            "edge_attention_parameters",
            nn.initializers.glorot_uniform(batch_axis=(0,)),
            (num_types, heads, 2 * head_dim),
        )
        per_head = transformed.reshape(num_types, vr, heads, head_dim)
        src_scores = jnp.einsum(
            "lvkd,lkd->lvk", per_head, attention_params[:, :, :head_dim]
        )
        tgt_scores = jnp.einsum(
            "lvkd,lkd->lvk", per_head, attention_params[:, :, head_dim:]
        )

        # One bundled source gather: [L*Vr, H + K]. Messages go in HK-MAJOR
        # head layout (column hk*K + k) to match the fused attention
        # kernel's tiled expd scaling.
        transformed_hk = per_head.transpose(0, 1, 3, 2).reshape(
            num_types, vr, self.hidden_dim
        )
        src_bundle = jnp.concatenate(
            [transformed_hk.reshape(num_types * vr, self.hidden_dim),
             src_scores.reshape(num_types * vr, heads)],
            axis=1,
        )
        if self.edge_dtype != "float32":
            src_bundle = src_bundle.astype(self.edge_dtype)
        src_bundle = self._globalize_tables(src_bundle, batch, num_types)
        bundle_g = plan_gather_src(
            src_bundle, plan.src_merged, plan.rel_src, plan.src_blocks,
            plan.bwd_to_fwd_slot, src_bundle.shape[0],
        ).astype(jnp.float32)
        msgs = bundle_g[:, : self.hidden_dim]
        src_score_g = bundle_g[:, self.hidden_dim:]

        tgt_score_g = plan_gather_tgt_typed(
            tgt_scores[:, :v].transpose(1, 0, 2).reshape(v * num_types, heads),
            plan.type_fwd, plan.tgtabs_fwd, plan.rel_tgt, plan.tgt_blocks,
            num_types,
        )

        logits = jax.nn.leaky_relu(src_score_g + tgt_score_g,
                                   negative_slope=0.2)  # [slots, K]
        # Per-(target, head) softmax over all edge types jointly (reference
        # rgat.py:139-151), entirely on the sorted chunk structure: the
        # per-segment max runs the Pallas max kernel (stop-gradient — the
        # stabiliser's true gradient is zero), the exp-sum runs the sorted
        # scatter with its gather-transpose VJP. Sentinel slots are excluded
        # by the kernels' one-hot; their exp is zeroed for the sum.
        from ...ops.spmm_pallas import attention_scatter, sorted_segment_max
        from ...utils.constants import SMALL_NUMBER

        sentinel = plan.rel_tgt >= BLOCK_NODES
        # stop_gradient on the INPUT: the kernel has no AD rules, and with
        # tangent-free operands JAX treats the call as a constant.
        maxes = sorted_segment_max(
            jax.lax.stop_gradient(logits), plan.rel_tgt, plan.tgt_blocks, v
        )  # [V, K]
        shifted = logits - jnp.take(maxes, plan.tgtabs_fwd, axis=0, mode="clip")
        expd = jnp.where(sentinel[:, None], 0.0, jnp.exp(shifted))
        # Fused kernel: denominators and exp-weighted message sums in ONE
        # pass — the per-edge attention weights are never materialised.
        denom, weighted = attention_scatter(
            expd, msgs, plan.rel_tgt, plan.tgt_blocks, plan.tgtabs_fwd,
            sentinel, v, heads,
        )
        weighted = weighted / (jnp.tile(denom, (1, head_dim)) + SMALL_NUMBER)
        # Back to the reference's concat-head (k-major) layout.
        return weighted.reshape(v, head_dim, heads).transpose(0, 2, 1).reshape(
            v, self.hidden_dim
        )

    def _compute_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError(
                f"hidden_dim {self.hidden_dim} must be divisible by num_heads "
                f"{self.num_heads}."
            )
        num_types = batch.num_edge_types
        heads = self.num_heads
        head_dim = self.hidden_dim // heads

        # Node space: transformed states for all types at once [L, V, K, H/K].
        transformed = TypedLinear(
            num_types, node_states.shape[-1], self.hidden_dim, name="edge_weights",
            compute_dtype=self.dense_dtype
        )(node_states).reshape(num_types, -1, heads, head_dim)

        # Per-type attention parameters [L, K, 2*H/K], split into source/target
        # halves so scores become two node-space tables.
        attention_params = self.param(
            "edge_attention_parameters",
            nn.initializers.glorot_uniform(batch_axis=(0,)),
            (num_types, heads, 2 * head_dim),
        )
        attn_src = attention_params[:, :, :head_dim]  # [L, K, H/K]
        attn_tgt = attention_params[:, :, head_dim:]

        # [L, V, K] per-node score halves (SDDMM done densely on the VPU/MXU).
        src_scores = jnp.einsum("lvkd,lkd->lvk", transformed, attn_src)
        tgt_scores = jnp.einsum("lvkd,lkd->lvk", transformed, attn_tgt)

        results = []
        for l in range(num_types):
            per_edge_messages = batch.gather_source_rows(transformed[l], l)  # [E,K,H/K]
            logits = jax.nn.leaky_relu(
                batch.gather_source_rows(src_scores[l], l)
                + batch.gather_target_rows(tgt_scores[l], l),
                negative_slope=0.2,  # tf.nn.leaky_relu default (reference rgat.py:113)
            )  # [E, K]
            results.append((per_edge_messages, logits))
        return results

    def _compute_new_node_embeddings(
        self,
        node_states: jnp.ndarray,
        messages_per_type: List[Tuple[jnp.ndarray, jnp.ndarray]],
        batch: GraphBatch,
        training: bool,
    ) -> jnp.ndarray:
        activation = get_activation_function(self.message_activation_function)
        num_segments = batch.aggregation_segments

        messages = jnp.concatenate([m for m, _ in messages_per_type], axis=0)  # [M,K,H/K]
        logits = jnp.concatenate([s for _, s in messages_per_type], axis=0)  # [M, K]
        targets = jnp.concatenate(batch.edge_targets, axis=0)  # [M]

        # Softmax per (target node, head) over all edge types jointly
        # (reference rgat.py:139-151 does exp(segment_log_softmax)). Targets
        # are local in SPMD mode, so no collective is needed here.
        attention = jnp.exp(segment_log_softmax(logits, targets, num_segments))  # [M, K]
        weighted = attention[:, :, None] * messages  # [M, K, H/K]
        aggregated = batch.slice_aggregated(
            segment_sum(weighted, targets, num_segments)
        )  # [V, K, H/K]
        return activation(
            aggregated.reshape(batch.num_nodes_padded, self.hidden_dim)
        )
