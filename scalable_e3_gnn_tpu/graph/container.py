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

from typing import NamedTuple, Optional

import jax.numpy as jnp

__all__ = ["SteerableGraph"]


class SteerableGraph(NamedTuple):
    """A (batch of) graph(s) flattened into one node/edge address space."""

    nodes: jnp.ndarray  # [N_pad, F] steerable node features (flat irreps layout)
    positions: jnp.ndarray  # [N_pad, 3]
    senders: jnp.ndarray  # [E_pad] int32; padding = N_pad
    receivers: jnp.ndarray  # [E_pad] int32, sorted ascending; padding = N_pad
    node_graph: jnp.ndarray  # [N_pad] graph id per node (pooling); padding = G
    node_mask: jnp.ndarray  # [N_pad] bool
    edge_mask: jnp.ndarray  # [E_pad] bool
    n_graphs: int  # static number of graphs in the batch

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
