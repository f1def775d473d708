"""GNN-FiLM message passing (feature-wise linear modulation by target state).

``msg' = gamma_l(h_tgt) * (W_l h_src) + beta_l(h_tgt)`` applied after optional
in-degree normalisation — reference:
tf2_gnn/layers/message_passing/gnn_film.py:83-108 (FiLM modulation wraps the
GNN_Edge_MLP message, which already includes normalisation).

Both the message MLP (pointwise in source) and the FiLM parameter MLP
(pointwise in target) run densely in node space; edge space does two gathers
and a fused multiply-add.
"""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from .base import register_message_passing_implementation
from .gnn_edge_mlp import GNN_Edge_MLP
from .typed_linear import TypedLinear


@register_message_passing_implementation
class GNN_FiLM(GNN_Edge_MLP):
    use_target_state_as_input: bool = False
    normalize_by_num_incoming: bool = False
    num_edge_MLP_hidden_layers: int = 0
    film_parameter_MLP_hidden_layers: Tuple[int, ...] = ()

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update(
            {
                "use_target_state_as_input": False,
                "normalize_by_num_incoming": False,
                "num_edge_MLP_hidden_layers": 0,
                "film_parameter_MLP_hidden_layers": [],
            }
        )
        return params

    def _film_parameter_tables(self, node_states, batch):
        """The FiLM parameter MLP run densely in node space -> [L, V, 2H]."""
        num_types = batch.num_edge_types
        film = node_states
        sizes = list(self.film_parameter_MLP_hidden_layers) + [2 * self.hidden_dim]
        num_hidden = len(sizes) - 1
        for i, size in enumerate(sizes):
            film = TypedLinear(
                num_types, film.shape[-1], size, name=f"film_mlp_layer_{i}",
                compute_dtype=self.dense_dtype
            )(film)
            if i < num_hidden:
                film = jax.nn.relu(film)
        return film

    def _fused_sum_aggregate(self, node_states, batch, training):
        """Fused FiLM. Preferred: the FACTORISED pair path — since gamma/beta
        depend only on the target node and the edge type, the aggregated
        modulated messages factorise into dense node-space math,

            out[v] = sum_l gamma_l[v] * S_l[v] + deg_l[v] * beta_l[v],

        with S_l the per-type aggregated (normalised) message — including the
        factorised target term of the 0-hidden-layer target-state form — and
        deg the real per-type in-degree. NO per-edge gamma/beta traffic at
        all (see GNN_Edge_MLP._pair_factorised_typed_sums). Fallback: the
        scatter-plan path with one source gather + one merged-target-plan
        target gather + the gamma*msg+beta fuse in XLA, then the sorted MXU
        scatter."""
        if not self._fused_plan_applicable(batch):
            return None

        typed = self._pair_factorised_typed_sums(node_states, batch)
        if typed is not None:
            from .base import calculate_type_to_num_incoming_edges

            film = self._film_parameter_tables(node_states, batch)
            film = film.astype(jnp.float32)
            gamma = film[:, :, : self.hidden_dim]
            beta = film[:, :, self.hidden_dim:]
            deg = calculate_type_to_num_incoming_edges(batch)  # [L, V]
            return (gamma * typed + deg[..., None] * beta).sum(axis=0)

        if (batch.scatter_plans is None or not self.fused_target_gather
                or self.use_target_state_as_input):
            return None

        num_types = batch.num_edge_types
        v = batch.num_nodes_padded
        from ...ops.spmm_pallas import (
            PlanView,
            plan_gather_src,
            plan_gather_tgt_typed,
            plan_scatter,
        )

        plan = PlanView(batch.scatter_plans)
        msg_tables = self._fused_node_space_tables(node_states, batch)  # [LV,H]

        # FiLM parameter MLP in node space -> [L, V, 2H] -> [LV, 2H].
        # Type-minor layout so the gradient scatter reuses the forward plan.
        film = self._film_parameter_tables(node_states, batch)
        # Target-side table: always local rows (drop halo rows in SPMD).
        film_tl = film[:, :v].transpose(1, 0, 2).reshape(v * num_types, -1)
        if self.edge_dtype != "float32":
            film_tl = film_tl.astype(self.edge_dtype)

        msg_tables = self._globalize_tables(msg_tables, batch, num_types)
        msgs = plan_gather_src(
            msg_tables, plan.src_merged, plan.rel_src, plan.src_blocks,
            plan.bwd_to_fwd_slot, msg_tables.shape[0],
        ).astype(jnp.float32)
        film_g = plan_gather_tgt_typed(
            film_tl, plan.type_fwd, plan.tgtabs_fwd, plan.rel_tgt,
            plan.tgt_blocks, num_types,
        ).astype(jnp.float32)

        if self.normalize_by_num_incoming:
            scale_fwd, _ = self._fused_normalisation_scales(batch, plan)
            msgs = msgs * scale_fwd[:, None]
        # Modulation wraps the (normalised) message (reference
        # gnn_film.py:83-108).
        gamma = film_g[:, : self.hidden_dim]
        beta = film_g[:, self.hidden_dim:]
        weighted = gamma * msgs + beta
        # Sentinel slots carry garbage beta; zero them so they never reach the
        # scatter with a non-zero value... the one-hot drops them anyway, but
        # keep the stream clean for the f32 accumulate.
        return plan_scatter(weighted, plan.rel_tgt, plan.tgt_blocks,
                            plan.tgtabs_fwd, v)

    def _compute_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ) -> List[jnp.ndarray]:
        messages = super()._compute_messages_per_type(node_states, batch, training)

        # FiLM parameter MLP on the *target* state, per edge type — pointwise
        # in the target node, so computed in node space and gathered.
        num_types = batch.num_edge_types
        film = self._film_parameter_tables(node_states, batch)  # [L, V, 2H]

        modulated = []
        for l in range(num_types):
            per_edge_film = batch.gather_target_rows(film[l], l)
            gamma = per_edge_film[:, : self.hidden_dim]
            beta = per_edge_film[:, self.hidden_dim :]
            modulated.append(gamma * messages[l] + beta)
        return modulated
