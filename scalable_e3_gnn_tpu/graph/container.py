"""Static-shape graph container for batched point-cloud graphs.

TPU-first conventions (SURVEY.md §7 design stance):
- all arrays are padded to static shapes; padding edges carry
  ``receiver == senders == num_nodes`` (the trash segment) so they vanish in
  segment reductions without masks;
- padding nodes live at the tail with ``node_mask == False`` and zero features;
- edges are sorted by receiver (then sender) so scatter is a contiguous
  segment-sum (``indices_are_sorted=True``) — the graph builders guarantee it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SteerableGraph"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SteerableGraph:
    """A (batch of) graph(s) flattened into one node/edge address space.

    Registered pytree: array fields are leaves; ``n_graphs`` is static
    metadata so graphs pass through jit boundaries without tracing it (it
    feeds static segment counts)."""

    nodes: jnp.ndarray  # [N_pad, F] steerable node features (flat irreps layout)
    positions: jnp.ndarray  # [N_pad, 3]
    senders: jnp.ndarray  # [E_pad] int32; padding = N_pad
    receivers: jnp.ndarray  # [E_pad] int32, sorted ascending; padding = N_pad
    node_graph: jnp.ndarray  # [N_pad] graph id per node (pooling); padding = G
    node_mask: jnp.ndarray  # [N_pad] bool
    edge_mask: jnp.ndarray  # [E_pad] bool
    n_graphs: int = dataclasses.field(metadata=dict(static=True))  # static batch size

    def _replace(self, **kw) -> "SteerableGraph":
        return dataclasses.replace(self, **kw)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    def replace_nodes(self, nodes: jnp.ndarray) -> "SteerableGraph":
        return self._replace(nodes=nodes)

    def rel_positions(self) -> jnp.ndarray:
        """x_s - x_r per edge (pointing from receiver to sender); zero on padding."""
        xs = jnp.take(self.positions, jnp.minimum(self.senders, self.num_nodes - 1), axis=0)
        xr = jnp.take(self.positions, jnp.minimum(self.receivers, self.num_nodes - 1), axis=0)
        rel = xs - xr
        return jnp.where(self.edge_mask[:, None], rel, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseEdgeGraph:
    """Fixed-degree graph: exactly K neighbor slots per node ([N, K] arrays).

    The radius builders emit exactly this structure (nearest-K with validity
    mask), and it is the TPU-fast layout: aggregation is a dense masked sum
    over the K axis (no scatter), and receiver-side features broadcast instead
    of gathering.  Convert from a receiver-sorted fixed-K COO by reshaping.
    """

    nodes: jnp.ndarray  # [N, F]
    positions: jnp.ndarray  # [N, 3]
    senders: jnp.ndarray  # [N, K] int32; invalid slots clipped/ignored via mask
    edge_mask: jnp.ndarray  # [N, K] bool
    node_mask: jnp.ndarray  # [N] bool
    node_graph: jnp.ndarray  # [N] graph id (pooling)
    n_graphs: int = dataclasses.field(metadata=dict(static=True))
    # present only on symmetrized graphs (graph.radius.symmetrize_dense):
    # enables the scatter-free sender-gradient path
    reverse_slot: Optional[jnp.ndarray] = None  # [N, K] int32

    def _replace(self, **kw) -> "DenseEdgeGraph":
        return dataclasses.replace(self, **kw)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def max_neighbors(self) -> int:
        return self.senders.shape[1]

    @classmethod
    def from_radius_edges(
        cls, nodes, positions, edges, n_graphs=1, node_graph=None, node_mask=None,
        symmetrize: bool = False,
    ):
        """Build from a RadiusEdges result (receiver-major fixed-K COO).

        ``symmetrize=True`` drops K-truncation-asymmetric edges and records
        reverse-edge slots, enabling the scatter-free gradient path.
        """
        n = nodes.shape[0]
        k = edges.senders.shape[0] // n
        senders = edges.senders.reshape(n, k)
        mask = edges.mask.reshape(n, k)
        reverse_slot = None
        if symmetrize:
            from .radius import symmetrize_dense

            mask, reverse_slot = symmetrize_dense(senders, mask)
        return cls(
            nodes=nodes,
            positions=positions,
            senders=senders,
            edge_mask=mask,
            node_mask=node_mask if node_mask is not None else jnp.ones((n,), bool),
            node_graph=node_graph
            if node_graph is not None
            else jnp.zeros((n,), jnp.int32),
            n_graphs=n_graphs,
            reverse_slot=reverse_slot,
        )

    def rel_positions(self) -> jnp.ndarray:
        """[N, K, 3]: x_s - x_r per slot; zero on invalid slots."""
        xs = jnp.take(
            self.positions, jnp.minimum(self.senders, self.num_nodes - 1), axis=0
        )
        rel = xs - self.positions[:, None, :]
        return jnp.where(self.edge_mask[..., None], rel, 0.0)
