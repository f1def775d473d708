"""Edge-MLP message passing family (base of RGCN / GGNN / RGIN / GNN-FiLM).

Semantics match the reference's GNN_Edge_MLP
(tf2_gnn/layers/message_passing/gnn_edge_mlp.py:46-113):
``msg = MLP_l(h_src [|| h_tgt])``, optionally scaled by 1/(per-type in-degree
of the target + eps). The per-type MLP follows dpu-utils semantics: N hidden
layers of size hidden_dim with ReLU, a final linear layer, no biases.

TPU mapping:
* ``use_target_state_as_input=False``: the entire MLP is pointwise in the
  source node, so it runs in node space ([V, D] MXU matmuls for all L types at
  once via stacked weights) and is *gathered* per edge — E*D*H FLOPs collapse
  to V*D*H.
* ``use_target_state_as_input=True``: the first layer's kernel [2D, H] is
  split into source/target halves; both halves run in node space and are
  gathered + added per edge (exactly equal to Dense(concat(src, tgt))).
  Remaining layers run per edge with per-type kernels.
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from .base import (
    MessagePassing,
    calculate_type_to_num_incoming_edges,
    register_message_passing_implementation,
)
from .typed_linear import TypedLinear


@register_message_passing_implementation
class GNN_Edge_MLP(MessagePassing):
    use_target_state_as_input: bool = True
    normalize_by_num_incoming: bool = False
    num_edge_MLP_hidden_layers: int = 1
    # Preferred target-state route: the factorised merged-target pair path
    # (no per-edge target traffic at all — wins 3.8-5.4x over XLA,
    # PERFORMANCE.md round 2). This flag gates the scatter-plan FALLBACK
    # (second per-edge gather, type-minor layout) used when pair plans are
    # absent — e.g. SPMD batches; it measures at parity with XLA, so it is
    # on by default and kept only as an A/B escape hatch.
    fused_target_gather: bool = True

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update(
            {
                "use_target_state_as_input": True,
                "normalize_by_num_incoming": False,
                "num_edge_MLP_hidden_layers": 1,
                "fused_target_gather": True,
            }
        )
        return params

    def _edge_mlp_layer_sizes(self) -> List[int]:
        return [self.hidden_dim] * self.num_edge_MLP_hidden_layers + [self.hidden_dim]

    def _compute_raw_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch
    ) -> List[jnp.ndarray]:
        """Per-type [E_l, H] messages *before* in-degree normalisation."""
        num_types = batch.num_edge_types
        in_dim = node_states.shape[-1]
        layer_sizes = self._edge_mlp_layer_sizes()
        num_hidden = self.num_edge_MLP_hidden_layers

        if not self.use_target_state_as_input:
            # Whole MLP is pointwise in the source node: run it densely in node
            # space for all types at once, then gather per edge.
            hidden = node_states  # [V, D] -> becomes [L, V, *]
            for i, size in enumerate(layer_sizes):
                hidden = TypedLinear(
                    num_types, hidden.shape[-1], size, name=f"edge_mlp_layer_{i}",
                    compute_dtype=self.dense_dtype
                )(hidden)
                if i < num_hidden:  # hidden layers get ReLU; final layer doesn't
                    hidden = jax.nn.relu(hidden)
            if self.edge_dtype != "float32":
                hidden = hidden.astype(self.edge_dtype)
            return [
                batch.gather_source_rows(hidden[l], l) for l in range(num_types)
            ]

        # Split the first layer across source/target halves (node space), run
        # any remaining layers per edge.
        first_out = layer_sizes[0]
        src_half = TypedLinear(num_types, in_dim, first_out, name="edge_mlp_src_0",
                               compute_dtype=self.dense_dtype)(
            node_states
        )  # [L, V, first_out]
        tgt_half = TypedLinear(num_types, in_dim, first_out, name="edge_mlp_tgt_0",
                               compute_dtype=self.dense_dtype)(
            node_states
        )  # [L, V, first_out]

        rest_layers = [
            TypedLinear(
                num_types, layer_sizes[i - 1], layer_sizes[i], name=f"edge_mlp_layer_{i}",
                compute_dtype=self.dense_dtype
            )
            for i in range(1, len(layer_sizes))
        ]

        messages = []
        for l in range(num_types):
            h = batch.gather_source_rows(src_half[l], l) + batch.gather_target_rows(
                tgt_half[l], l
            )
            if num_hidden >= 1:
                h = jax.nn.relu(h)  # activation of the (split) first hidden layer
            for i, layer in enumerate(rest_layers, start=1):
                h = layer(h, edge_type=l)
                if i < num_hidden:
                    h = jax.nn.relu(h)
            messages.append(h)
        return messages

    def _compute_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ) -> List[jnp.ndarray]:
        messages = self._compute_raw_messages_per_type(node_states, batch)
        if self.normalize_by_num_incoming:
            in_degrees = calculate_type_to_num_incoming_edges(batch)
            messages = [
                self._normalize_by_incoming(messages[l], l, batch, in_degrees)
                for l in range(batch.num_edge_types)
            ]
        return messages

    def _fused_plan_applicable(self, batch: GraphBatch) -> bool:
        return not (
            (batch.scatter_plans is None and batch.pair_plans is None
             and batch.pair_plans_typed is None)
            or (batch.spmd_axis is not None and batch.spmd_num_shards is None)
            or self.aggregation_function != "sum"
            or (self._apply_message_activation
                and self.message_activation_before_aggregation)
        )

    def _pair_path_applicable(self, batch: GraphBatch, tables) -> bool:
        """The gather-free block-pair kernel needs plans and a VMEM-resident
        table tile."""
        return self._pair_path_applicable_static(
            batch, tables.shape[0], tables.dtype
        )

    def _pair_path_applicable_static(self, batch: GraphBatch, rows: int,
                                     dtype) -> bool:
        """Shape-only variant of ``_pair_path_applicable`` — callable BEFORE
        any parameters exist (flax disallows creating the same named module
        twice in one trace, so fallback decisions must precede creation).

        Under SPMD the pair path requires the halo form: partition_graph
        builds per-shard plans over the ext-local source row space
        ``[local | halo slabs]`` (parallel/spmd.py), so every shard runs the
        SAME gather-free kernels as single-chip on its own slice."""
        from ...ops.pair_spmm import pair_kernel_applicable

        if batch.spmd_axis is not None and not batch.halo_mode:
            return False
        if batch.pair_plans is not None:
            return pair_kernel_applicable(rows, dtype)
        # Per-type plans: each launch's resident table is ONE type's rows
        # (the per-type source row space), regardless of the stacked table's
        # total row count.
        return (batch.pair_plans_typed is not None
                and pair_kernel_applicable(batch.pair_src_space, dtype))

    def _pair_kernel_out(self, tables: jnp.ndarray, batch: GraphBatch,
                         normalize: bool) -> jnp.ndarray:
        """Run the block-pair kernel over the stacked [L*V, H] tables
        (ops/pair_spmm.py): both the per-edge gather and the scatter become
        MXU matmuls against one-hot factors, with the 1/deg normalisation
        folded into the one-hot scales. All per-slot scales are precomputed
        on the host (PairPlans.inv_*) — device-side scale gathers measure
        ~3.5 ms/step on the PPI bench.

        Output is the joint [V, H] sum, or the per-type [L*V, H] aggregates
        when the batch's plans were built with merged targets (or are
        per-type plans, which produce per-type aggregates natively)."""
        from ...ops.pair_spmm import pair_typed_gather_scatter, pair_unit_scales

        v = batch.num_nodes_padded
        if batch.pair_plans is None:
            # Row-split form (merged [L*V] tables exceed the VMEM residency
            # budget): ONE streamed launch per direction over the
            # concatenated per-type plans — the resident table slice is
            # re-DMA'd on type change inside the kernel, replacing the 2L
            # per-type launches whose overhead bound QM9-scale configs.
            from ...ops.pair_spmm import pair_stream_from_typed

            return pair_stream_from_typed(
                tables, batch.pair_plans_typed, v, normalize)
        out_rows = (batch.num_edge_types * v if batch.pair_targets_merged
                    else v)
        plans = batch.pair_plans
        if normalize:
            sf, sb, so = plans[10], plans[11], plans[12]
        else:
            sf, sb, so = pair_unit_scales(plans, out_rows)
        return pair_typed_gather_scatter(
            tables, sf, sb, so, *plans[:10], out_rows
        )

    def _pair_sum_aggregate(self, tables: jnp.ndarray, batch: GraphBatch):
        """Joint [V, H] sum over all types via the pair kernel (reducing the
        type axis afterwards when the output is per-type merged-target
        plans). Per-type plans ride the dedicated JOINT streamed op: no
        [L*V, H] forward materialisation when the output window fits VMEM,
        and the backward consumes the un-broadcast [V, H] cotangent."""
        if batch.pair_plans is None:
            from ...ops.pair_spmm import pair_stream_joint_from_typed

            return pair_stream_joint_from_typed(
                tables, batch.pair_plans_typed, batch.num_nodes_padded,
                self.normalize_by_num_incoming)
        out = self._pair_kernel_out(tables, batch,
                                    self.normalize_by_num_incoming)
        if batch.pair_targets_merged:
            v = batch.num_nodes_padded
            out = out.reshape(batch.num_edge_types, v, -1).sum(axis=0)
        return out

    def _pair_typed_aggregates(self, tables: jnp.ndarray, batch: GraphBatch,
                               normalize: bool) -> jnp.ndarray:
        """Per-type aggregates S_l[v] = sum over type-l edges into v of
        (scaled) tables[l*V+u], as [L, V, H]. Requires merged-target plans."""
        v = batch.num_nodes_padded
        out = self._pair_kernel_out(tables, batch, normalize)
        return out.reshape(batch.num_edge_types, v, -1)

    def _pair_factorised_typed_sums(self, node_states, batch: GraphBatch):
        """[L, V, H] per-type aggregated (normalised) messages via the
        merged-target pair kernel, or None when not factorisable.

        Covers source-only message MLPs of any depth and the 0-hidden-layer
        target-state form, whose aggregate factorises into node space:

            sum over type-l edges into v of s_l(v) * (W_src h_u + W_tgt h_v)
              = S_l(v) + c_l(v) * (W_tgt h_v),

        with S_l the kernel's per-type aggregate of the source halves and
        c_l(v) = deg_l(v) * s_l(v) (deg/(deg+eps) when normalising, plain deg
        otherwise) — the per-edge target gather disappears entirely.
        Consumers: the target-state edge MLP sums over the type axis;
        GNN-FiLM modulates each type densely first (gnn_film.py)."""
        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        stream_dtype = jnp.dtype(
            self.edge_dtype if self.edge_dtype != "float32" else jnp.float32
        )
        # Merged-target plans and per-type plans both yield per-type
        # aggregates; either satisfies the factorised paths.
        per_type_out = (batch.pair_targets_merged
                        or batch.pair_plans_typed is not None)
        if not (per_type_out and self._pair_path_applicable_static(
                batch, num_types * batch.pair_src_space, stream_dtype)):
            return None

        from ...ops.pair_spmm import TILE

        if not self.use_target_state_as_input:
            h_out = int(self._edge_mlp_layer_sizes()[-1])
            pad_to = h_out + (-h_out % TILE) if h_out % TILE else None
            tables = self._fused_node_space_tables(node_states, batch,
                                                   pad_to=pad_to)
            out = self._pair_typed_aggregates(
                tables, batch, self.normalize_by_num_incoming
            )
            # Drop the TILE-padding zero columns (fuses into the consumer).
            return out[..., :h_out] if pad_to else out

        if self.num_edge_MLP_hidden_layers != 0:
            return None
        from ...utils.constants import SMALL_NUMBER

        in_dim = node_states.shape[-1]
        pad_to = (self.hidden_dim + (-self.hidden_dim % TILE)
                  if self.hidden_dim % TILE else None)
        # Under SPMD-halo ``node_states`` are the pre-exchanged EXT states
        # ([local | halo slabs] rows — this form is not halo-overlap-capable,
        # base.py:282): the source half spans the ext row space the plans
        # address; the target half only needs the local rows.
        src_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_src_0",
                               compute_dtype=self.dense_dtype,
                               pad_out_to=pad_to)(node_states)
        tgt_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_tgt_0",
                               compute_dtype=self.dense_dtype)(node_states[:v])
        src_flat = src_half.reshape(num_types * src_half.shape[1], -1)
        if self.edge_dtype != "float32":
            src_flat = src_flat.astype(self.edge_dtype)
        agg = self._pair_typed_aggregates(
            src_flat, batch, self.normalize_by_num_incoming
        )  # [L, V, H_pad] f32
        if pad_to:
            agg = agg[..., :self.hidden_dim]
        deg = calculate_type_to_num_incoming_edges(batch)  # [L, V]
        if self.normalize_by_num_incoming:
            coeff = deg / (deg + SMALL_NUMBER)
        else:
            coeff = deg
        return agg + coeff[..., None] * tgt_half.astype(jnp.float32)

    def _pair_target_state_one_hidden(self, node_states, batch: GraphBatch):
        """Dedicated pair kernel for the target-state edge MLP with ONE
        hidden layer — the reference's DEFAULT GNN_Edge_MLP configuration
        (gnn_edge_mlp.py:48-52). Same commuted-W2 factorisation as
        ``_fused_target_state_one_hidden`` but edge space never touches HBM:
        ``ops/pair_edge_mlp.py`` recomputes ``z = A[src] + B[tgt]`` inside
        the block-pair kernels — the training forward emits the relu-mask
        aggregate M alongside R (so dB is a plain ``M * g``) and the one
        backward kernel (dA) recomputes the mask in-register — so the
        per-edge z gathers and the L type-masked scatters of the
        scatter-plan form disappear. Requires MERGED-TARGET pair plans
        (B's row space must be the kernel's output row space) and a
        dual-residency VMEM budget for the dA pass; returns None otherwise.
        """
        if batch.pair_plans is None or not batch.pair_targets_merged:
            return None
        from ...ops.pair_edge_mlp import (
            pair_edge_mlp_applicable,
            pair_relu_mlp_aggregate,
        )
        from ...ops.pair_spmm import pair_unit_scales

        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        stream_dtype = jnp.dtype(
            self.edge_dtype if self.edge_dtype != "float32" else jnp.float32
        )
        rows_a = num_types * batch.pair_src_space
        out_rows = num_types * v
        if not pair_edge_mlp_applicable(rows_a, out_rows, stream_dtype):
            return None

        plans = batch.pair_plans
        if self.normalize_by_num_incoming:
            sf, sb, so = plans[10], plans[11], plans[12]
        else:
            sf, sb, so = pair_unit_scales(plans, out_rows)
        in_dim = node_states.shape[-1]
        # Source half spans the (possibly ext/halo) source row space the
        # plans address; the target half only needs the local rows.
        src_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_src_0",
                               compute_dtype=self.dense_dtype)(node_states)
        tgt_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_tgt_0",
                               compute_dtype=self.dense_dtype)(node_states[:v])
        a = src_half.reshape(num_types * src_half.shape[1], -1)
        bt = tgt_half.reshape(out_rows, -1)  # merged-target layout l*V + v
        if self.edge_dtype != "float32":
            a = a.astype(self.edge_dtype)
            bt = bt.astype(self.edge_dtype)
        typed_sums = pair_relu_mlp_aggregate(
            a, bt, sf, sb, so, *plans[:10], out_rows
        )  # [L*V, H] f32
        w2 = TypedLinear(num_types, self.hidden_dim, self.hidden_dim,
                         name="edge_mlp_layer_1",
                         compute_dtype=self.dense_dtype)
        return w2(typed_sums.reshape(num_types, v, -1)).sum(axis=0)

    def _fused_target_state_one_hidden(self, node_states, batch: GraphBatch):
        """Fused target-state edge MLP with ONE hidden layer (the flavour
        default, reference gnn_edge_mlp.py:74-97): the first layer
        factorises into node space and — TypedLinear is bias-free (Keras
        Dense parity) — the LAST linear commutes with sum aggregation:

            out[v] = sum_l W2_l @ R_l[v],
            R_l[v] = sum over type-l edges e=(u -> v) of
                     scale_e * relu(A_l[u] + B_l[v]),

        with A = W1_src h, B = W1_tgt h dense node-space transforms. Edge
        space shrinks to two fused plan gathers + a relu + L type-masked MXU
        scatters; the per-edge [H, H] matmuls of the XLA fallback (measured
        76 ms/step vs 13.9 for the 0-hidden form at the PPI bench shape)
        vanish. Requires scatter plans (the pair kernels cannot aggregate a
        per-edge-computed value)."""
        if batch.scatter_plans is None or not self.fused_target_gather:
            return None
        from ...ops.spmm_pallas import (
            PlanView,
            plan_gather_src,
            plan_gather_tgt_typed,
            plan_scatter,
        )

        plan = PlanView(batch.scatter_plans)
        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        in_dim = node_states.shape[-1]
        src_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_src_0",
                               compute_dtype=self.dense_dtype)(node_states)
        # Target half on LOCAL rows only (under SPMD-halo ``node_states``
        # are the pre-exchanged ext states; targets never live in halo
        # rows, so transforming them would be wasted per-type matmuls).
        tgt_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_tgt_0",
                               compute_dtype=self.dense_dtype)(node_states[:v])
        src_flat = src_half.reshape(num_types * src_half.shape[1], -1)
        if self.edge_dtype != "float32":
            src_flat = src_flat.astype(self.edge_dtype)
        src_flat = self._globalize_tables(src_flat, batch, num_types)
        # Target half in TYPE-MINOR layout.
        tgt_tl = tgt_half.transpose(1, 0, 2).reshape(v * num_types, -1)
        if self.edge_dtype != "float32":
            tgt_tl = tgt_tl.astype(self.edge_dtype)
        z = plan_gather_src(
            src_flat, plan.src_merged, plan.rel_src, plan.src_blocks,
            plan.bwd_to_fwd_slot, src_flat.shape[0],
        ) + plan_gather_tgt_typed(
            tgt_tl, plan.type_fwd, plan.tgtabs_fwd, plan.rel_tgt,
            plan.tgt_blocks, num_types,
        )
        r = jax.nn.relu(z.astype(jnp.float32))
        if self.normalize_by_num_incoming:
            scale_fwd, _ = self._fused_normalisation_scales(batch, plan)
            r = r * scale_fwd[:, None]
        # Per-type aggregates via type-masked scatters (sentinel slots drop
        # in the scatter's one-hot; L is small).
        r_stream = r.astype(self.edge_dtype) if self.edge_dtype != "float32" \
            else r
        typed_sums = jnp.stack([
            plan_scatter(
                jnp.where((plan.type_fwd == l)[:, None], r_stream, 0),
                plan.rel_tgt, plan.tgt_blocks, plan.tgtabs_fwd, v,
            )
            for l in range(num_types)
        ])  # [L, V, H] f32
        w2 = TypedLinear(num_types, self.hidden_dim, self.hidden_dim,
                         name="edge_mlp_layer_1",
                         compute_dtype=self.dense_dtype)
        return w2(typed_sums.astype(r.dtype)).sum(axis=0)

    def _fused_normalisation_scales(self, batch: GraphBatch, plan):
        """Per-slot 1/deg_l(tgt) scales in forward and backward slot order —
        precomputed on the host at plan-build time (device-side per-slot
        gathers measure ~3.5 ms/step on the PPI bench)."""
        return plan.inv_fwd, plan.inv_bwd

    def _halo_overlap_capable(self, batch: GraphBatch) -> bool:
        # The source-only paths route every source table through
        # _fused_node_space_tables, which self-assembles the ext rows;
        # target-state forms gather source halves directly and still need
        # the pre-exchanged ext states.
        return not self.use_target_state_as_input

    def _fused_node_space_tables(self, node_states, batch: GraphBatch,
                                 pad_to: int = None):
        """The per-type message MLP run densely in node space -> [L*V, H].

        ``pad_to`` zero-pads the LAST linear's output columns inside its
        own matmul (TypedLinear.pad_out_to) so tables come out already
        feature-TILE-aligned for the pair kernels — the explicit jnp.pad of
        a [L*V, H] table costs a full HBM round trip per layer. Callers
        that pass it must slice the kernel's aggregate back to H.

        Under SPMD-halo with LOCAL input (num_nodes_padded rows), the
        boundary rows are exchanged RAW and transformed separately: the
        collective's input is the raw states, so XLA's latency-hiding
        scheduler runs it concurrently with the local transform (SURVEY
        hard part 4). The transform is row-wise, so transform(exchange(x))
        == exchange'(transform(x)) exactly."""
        from .base import MessagePassing

        num_types = batch.num_edge_types
        layer_sizes = self._edge_mlp_layer_sizes()
        num_hidden = self.num_edge_MLP_hidden_layers
        dims = [node_states.shape[-1]] + [int(s) for s in layer_sizes[:-1]]
        last = len(layer_sizes) - 1
        mlp = [
            TypedLinear(num_types, dims[i], size, name=f"edge_mlp_layer_{i}",
                        compute_dtype=self.dense_dtype,
                        pad_out_to=pad_to if i == last else None)
            for i, size in enumerate(layer_sizes)
        ]

        def apply(x):
            for i, mod in enumerate(mlp):
                x = mod(x)
                if i < num_hidden:
                    x = jax.nn.relu(x)
            return x

        hidden = apply(node_states)  # [L, rows, H]
        if (batch.spmd_axis is not None and batch.halo_mode
                and node_states.shape[0] == batch.num_nodes_padded):
            halo = MessagePassing._halo_recv(node_states, batch)
            parts = [hidden]
            if halo is not None:
                parts.append(apply(halo))
            pad = batch.halo_ext_nodes - sum(p.shape[1] for p in parts)
            if pad:
                parts.append(jnp.zeros(
                    (num_types, pad, hidden.shape[-1]), hidden.dtype))
            hidden = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                      else parts[0])
        # -1 row count: in halo-SPMD mode the tables span the ext row space
        # [local | halo], not just num_nodes_padded.
        tables = hidden.reshape(num_types * hidden.shape[1], -1)
        if self.edge_dtype != "float32":
            tables = tables.astype(self.edge_dtype)
        return tables

    def _fused_sum_aggregate(self, node_states, batch: GraphBatch, training):
        """Fused Pallas path (ops/spmm_pallas.py). ONE gather over the
        stacked [L*V, H] node-space tables + ONE MXU scatter covers every
        edge type; the per-edge 1/deg_l(tgt) normalisation folds into the
        kernel's one-hot columns. The target-state variant gathers the
        target half per edge through the merged-target plan ordering."""
        if not self._fused_plan_applicable(batch):
            return None
        from ...ops.spmm_pallas import (
            PlanView,
            plan_gather_src,
            plan_gather_tgt_typed,
            plan_scatter,
            typed_gather_scatter,
        )

        num_types = batch.num_edge_types
        v = batch.num_nodes_padded

        if not self.use_target_state_as_input:
            # Applicability is decided BEFORE creating any module: falling
            # back to the unfused path after creating the node-space MLP
            # would re-create the same named modules (flax NameInUseError).
            stream_dtype = jnp.dtype(
                self.edge_dtype if self.edge_dtype != "float32"
                else jnp.float32
            )
            use_pair = self._pair_path_applicable_static(
                batch, num_types * batch.pair_src_space, stream_dtype
            )
            if not use_pair and batch.scatter_plans is None:
                return None
            from ...ops.pair_spmm import TILE

            h_out = int(self._edge_mlp_layer_sizes()[-1])
            pad_to = (h_out + (-h_out % TILE)
                      if use_pair and h_out % TILE else None)
            tables = self._fused_node_space_tables(node_states, batch,
                                                   pad_to=pad_to)
            if use_pair:
                out = self._pair_sum_aggregate(tables, batch)
                # The TILE-padded zero columns ride through the kernel as
                # zeros; drop them here (the slice fuses into the
                # activation/residual consumers).
                return out[:, :h_out] if pad_to else out
            plan = PlanView(batch.scatter_plans)
            tables = self._globalize_tables(tables, batch, num_types)
            if self.normalize_by_num_incoming:
                scale_fwd, scale_bwd = self._fused_normalisation_scales(
                    batch, plan
                )
            else:
                scale_fwd = jnp.ones(plan.src_merged.shape, dtype=jnp.float32)
                scale_bwd = jnp.ones(plan.rel_src.shape, dtype=jnp.float32)
            return typed_gather_scatter(
                tables, scale_fwd, scale_bwd, plan.src_merged, plan.rel_tgt,
                plan.tgt_blocks, plan.type_fwd, plan.tgtabs_fwd,
                plan.tgtabs_by_src, plan.rel_src, plan.src_blocks, v,
            )

        # Target-state input with ONE hidden layer (the flavour default):
        # the last linear commutes with sum aggregation, so the per-edge
        # matmuls disappear. Preferred: the dedicated pair kernel (z
        # recomputed in-register, no per-edge HBM traffic at all); fallback:
        # the scatter-plan form (_fused_target_state_one_hidden).
        if self.num_edge_MLP_hidden_layers == 1:
            out = self._pair_target_state_one_hidden(node_states, batch)
            if out is not None:
                return out
            return self._fused_target_state_one_hidden(node_states, batch)
        # Deeper target-state MLPs keep per-edge matmuls (an MLP of a concat
        # neither factorises nor commutes past its inner relus) — XLA path.
        if self.num_edge_MLP_hidden_layers != 0:
            return None

        # Preferred: the factorised merged-target pair path (no per-edge
        # target gather at all — see _pair_factorised_typed_sums).
        typed = self._pair_factorised_typed_sums(node_states, batch)
        if typed is not None:
            return typed.sum(axis=0)

        if not self.fused_target_gather:
            return None
        if batch.scatter_plans is None:
            return None
        plan = PlanView(batch.scatter_plans)
        in_dim = node_states.shape[-1]
        src_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_src_0",
                               compute_dtype=self.dense_dtype)(node_states)
        tgt_half = TypedLinear(num_types, in_dim, self.hidden_dim,
                               name="edge_mlp_tgt_0",
                               compute_dtype=self.dense_dtype)(node_states)
        src_flat = src_half.reshape(num_types * src_half.shape[1], -1)
        if self.edge_dtype != "float32":
            src_flat = src_flat.astype(self.edge_dtype)

        src_flat = self._globalize_tables(src_flat, batch, num_types)
        # Target half in TYPE-MINOR layout: the gradient scatter reuses the
        # forward plan (see plan_gather_tgt_typed). Target rows are always
        # local — drop any halo rows of the ext state table.
        tgt_tl = tgt_half[:, :v].transpose(1, 0, 2).reshape(v * num_types, -1)
        if self.edge_dtype != "float32":
            tgt_tl = tgt_tl.astype(self.edge_dtype)
        msgs = plan_gather_src(
            src_flat, plan.src_merged, plan.rel_src, plan.src_blocks,
            plan.bwd_to_fwd_slot, src_flat.shape[0],
        ) + plan_gather_tgt_typed(
            tgt_tl, plan.type_fwd, plan.tgtabs_fwd, plan.rel_tgt,
            plan.tgt_blocks, num_types,
        )
        msgs = msgs.astype(jnp.float32)
        if self.normalize_by_num_incoming:
            scale_fwd, _ = self._fused_normalisation_scales(batch, plan)
            msgs = msgs * scale_fwd[:, None]
        return plan_scatter(msgs, plan.rel_tgt, plan.tgt_blocks,
                            plan.tgtabs_fwd, v)
