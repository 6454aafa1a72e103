"""Batch many small graphs into one flat padded address space.

TPU-first: the batch is one ``SteerableGraph`` with static node/edge counts;
graph boundaries live in ``node_graph`` ids.  Receiver-sortedness is preserved
because per-graph edges are receiver-sorted and node ids are offset per graph
(SURVEY.md §7.5 — QM9-style padded batching).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .container import SteerableGraph

__all__ = ["batch_same_size", "pad_graph"]


def batch_same_size(
    node_feats: np.ndarray,  # [G, N, F]
    positions: np.ndarray,  # [G, N, 3]
    senders: np.ndarray,  # [E] per-graph template (receiver-sorted)
    receivers: np.ndarray,  # [E]
) -> SteerableGraph:
    """Batch G same-topology graphs (e.g. fully-connected N-body systems)."""
    G, N, F = node_feats.shape
    E = senders.shape[0]
    offs = (np.arange(G, dtype=np.int64) * N)[:, None]
    s = (senders[None, :] + offs).reshape(-1).astype(np.int32)
    r = (receivers[None, :] + offs).reshape(-1).astype(np.int32)
    return SteerableGraph(
        nodes=jnp.asarray(node_feats.reshape(G * N, F)),
        positions=jnp.asarray(positions.reshape(G * N, 3)),
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        node_graph=jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), N)),
        node_mask=jnp.ones((G * N,), dtype=bool),
        edge_mask=jnp.ones((G * E,), dtype=bool),
        n_graphs=G,
    )


def pad_graph(
    graph: SteerableGraph, num_nodes: int, num_edges: int, num_graphs: Optional[int] = None
) -> SteerableGraph:
    """Pad to static sizes: trash-segment edges, masked tail nodes."""
    N0, E0 = graph.num_nodes, graph.num_edges
    if num_nodes < N0 or num_edges < E0:
        raise ValueError("pad target smaller than graph")
    G = num_graphs if num_graphs is not None else graph.n_graphs
    pn = num_nodes - N0
    pe = num_edges - E0
    F = graph.nodes.shape[-1]
    return SteerableGraph(
        nodes=jnp.concatenate([graph.nodes, jnp.zeros((pn, F), graph.nodes.dtype)]),
        positions=jnp.concatenate(
            [graph.positions, jnp.zeros((pn, 3), graph.positions.dtype)]
        ),
        senders=jnp.concatenate(
            [graph.senders, jnp.full((pe,), num_nodes, jnp.int32)]
        ),
        receivers=jnp.concatenate(
            [graph.receivers, jnp.full((pe,), num_nodes, jnp.int32)]
        ),
        node_graph=jnp.concatenate(
            [graph.node_graph, jnp.full((pn,), G, jnp.int32)]
        ),
        node_mask=jnp.concatenate([graph.node_mask, jnp.zeros((pn,), bool)]),
        edge_mask=jnp.concatenate([graph.edge_mask, jnp.zeros((pe,), bool)]),
        n_graphs=G,
    )
