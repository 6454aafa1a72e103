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

__all__ = ["SteerableGraph", "DenseEdgeGraph"]


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
    # per-tile compact sender tables (``with_gather_tables``): the fused
    # message kernel gathers only the ~U unique senders of each node tile
    # (h[gather_tab], ~4x less HBM traffic than the [N*K, F] row expansion,
    # which then happens on-chip via a one-hot MXU matmul), and sender
    # gradients come back through a dense reverse-table gather (no scatter).
    gather_loc: Optional[jnp.ndarray] = None  # [Npad, K] int32 -> [0, U]
    gather_tab: Optional[jnp.ndarray] = None  # [ntiles, U] int32 node ids
    gather_rev: Optional[jnp.ndarray] = None  # [Npad, Q] int32 flat tab slots
    gather_tile: int = dataclasses.field(default=0, metadata=dict(static=True))
    # split reverse table (r5): the [N, Q] rev gather-sum pays Q row-gathers
    # per node although the mean per-node table count is ~2.5-3.4 — and the
    # TPU gather cost is per ROW (~13-16 ns), not per byte
    # (tools/exp_tab250.py: [N,12] 44-49 ms vs split 12-15 ms at 250k/K=16).
    # Dense part: every node's first q0 entries; remainder: compacted COO
    # sorted by node, summed in via one short gather + sorted segment-sum.
    gather_rev_dense: Optional[jnp.ndarray] = None  # [Npad, q0] flat tab slots
    gather_rem_pos: Optional[jnp.ndarray] = None  # [M] flat tab slots
    gather_rem_node: Optional[jnp.ndarray] = None  # [M] node ids (sorted; pad=N)

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

    def with_gather_tables(
        self, tile: int = 64, table_size: int = 0, rev_size: int = 0
    ) -> "DenseEdgeGraph":
        """Precompute per-tile compact sender tables (host-side, numpy).

        Morton-ordered point clouds have strong tile locality: a tile of
        ``tile`` consecutive receivers touches only a few hundred unique
        senders (measured: max 356 at tile=64 for the 100k/K=24 config, vs
        tile*K = 1536 slot rows).  Per tile i we store the sorted unique
        sender ids ``gather_tab[i]`` (pad: Npad, reads as 0 via fill mode),
        each slot's index into its tile's table ``gather_loc`` (pad: U), and
        per node the flat table positions where it appears ``gather_rev``
        (pad: ntiles*U) — max 11 tiles/node measured, so sender gradients are
        a dense [N, Q] gather-sum, never a scatter.

        Geometry-static: runs once per graph on host (concrete arrays, not
        under jit).  ``table_size``/``rev_size`` override the measured U/Q
        (e.g. to share one compiled kernel across graphs).
        """
        import numpy as np

        senders = np.asarray(self.senders)
        mask = np.asarray(self.edge_mask)
        n, k = senders.shape
        ntiles = -(-n // tile)
        npad = ntiles * tile
        s = np.full((npad, k), npad, np.int64)
        s[:n] = np.where(mask, senders, npad)
        s = s.reshape(ntiles, tile * k)

        order = np.argsort(s, axis=1, kind="stable")
        ss = np.take_along_axis(s, order, axis=1)
        new = np.ones_like(ss, bool)
        new[:, 1:] = ss[:, 1:] != ss[:, :-1]
        real = ss < npad
        newreal = new & real
        # unique-rank of each sorted slot within its tile
        rank = np.cumsum(newreal, axis=1) - 1
        counts = newreal.sum(axis=1)
        u_needed = int(counts.max()) if ntiles else 0
        u = table_size or (-(-max(u_needed, 1) // 128) * 128)
        if u < u_needed:
            raise ValueError(f"table_size {u} < required {u_needed}")

        tab = np.full((ntiles, u), npad, np.int32)
        ti = np.broadcast_to(np.arange(ntiles)[:, None], ss.shape)
        tab[ti[newreal], rank[newreal]] = ss[newreal].astype(np.int32)

        loc_sorted = np.where(real, rank, u).astype(np.int32)
        loc = np.full_like(loc_sorted, u)
        np.put_along_axis(loc, order, loc_sorted, axis=1)
        loc = loc.reshape(npad, k)

        # reverse table: flat tab positions per node id
        flat = tab.ravel()
        sel = np.nonzero(flat < n)[0]
        vals = flat[sel]
        vorder = np.argsort(vals, kind="stable")
        sv, sp = vals[vorder], sel[vorder]
        starts = np.searchsorted(sv, np.arange(n))
        ends = np.searchsorted(sv, np.arange(n) + 1)
        q_needed = int((ends - starts).max()) if n else 0
        q = rev_size or (-(-max(q_needed, 1) // 4) * 4)
        if q < q_needed:
            raise ValueError(f"rev_size {q} < required {q_needed}")
        rev = np.full((npad, q), ntiles * u, np.int32)
        within = np.arange(len(sv)) - starts[sv]
        rev[sv, within] = sp.astype(np.int32)

        # split reverse table: dense [Npad, q0] + compacted remainder COO.
        # q0=2 measured fastest at the 250k config (the sorted segment-sum
        # absorbs the remainder almost for free; tools/exp_tab250.py).
        q0 = min(2, q)
        nodes_r, cols_r = np.nonzero(rev[:, q0:] < ntiles * u)
        pos_r = rev[nodes_r, q0 + cols_r]
        m = len(pos_r)
        mcap = -(-max(m, 1) // 1024) * 1024
        rem_pos = np.zeros((mcap,), np.int32)
        rem_node = np.full((mcap,), npad, np.int32)  # pad -> trash segment
        rem_pos[:m] = pos_r.astype(np.int32)
        rem_node[:m] = nodes_r.astype(np.int32)  # nonzero scans row-major:
        # already sorted by node, as the sorted segment-sum requires

        return self._replace(
            gather_loc=jnp.asarray(loc),
            gather_tab=jnp.asarray(tab),
            gather_rev=jnp.asarray(rev),
            gather_tile=tile,
            gather_rev_dense=jnp.asarray(rev[:, :q0].copy()),
            gather_rem_pos=jnp.asarray(rem_pos),
            gather_rem_node=jnp.asarray(rem_node),
        )
