"""Exchange/compute overlap: structural proof on the dense distributed step.

SURVEY.md §7 hard part 2 asks that the boundary-feature collective overlap
local aggregation.  XLA's async collective scheduler can only overlap ops
with no data dependency — so the property to pin is *dependency structure*:
per layer, the interior-block fused message kernel must NOT transitively
depend on that layer's all_gather, while the boundary-block kernel MUST.
This test interprets the traced jaxpr of the distributed dense forward,
propagating all_gather provenance through every nested call, and checks
exactly that, layer by layer.  (Wall-clock overlap itself cannot be measured
in a 1-chip sandbox; given independence, the TPU scheduler issues the
all-gather-start before the independent compute and joins at -done — the
dependency structure is the controllable part.)
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core
from jax.sharding import Mesh

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import (
    make_dist_forward_dense,
    shard_partitioned_dense,
)
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense


def _sub_jaxprs(eqn):
    out = []
    for v in eqn.params.values():
        if isinstance(v, jex_core.ClosedJaxpr):
            out.append(v.jaxpr)
        elif isinstance(v, jex_core.Jaxpr):
            out.append(v)
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, jex_core.ClosedJaxpr):
                    out.append(x.jaxpr)
                elif isinstance(x, jex_core.Jaxpr):
                    out.append(x)
    return out


def _analyze(jaxpr, in_deps, events):
    """Propagate dependency sets (indices into ``events``) through a jaxpr.

    ``events`` collects ('all_gather'|'pallas_call', input_dep_set) in trace
    order.  Returns per-outvar dep sets.
    """
    env = {}

    def read(v):
        if isinstance(v, jex_core.Literal):
            return frozenset()
        return env.get(v, frozenset())

    def write(v, d):
        env[v] = d

    for v, d in zip(jaxpr.invars, in_deps):
        write(v, d)
    for v in jaxpr.constvars:
        write(v, frozenset())

    for eqn in jaxpr.eqns:
        din = frozenset().union(*[read(v) for v in eqn.invars]) if eqn.invars else frozenset()
        name = eqn.primitive.name
        subs = _sub_jaxprs(eqn)
        if name == "all_gather":
            idx = len(events)
            events.append(("all_gather", din))
            dout = din | {idx}
            for v in eqn.outvars:
                write(v, dout)
        elif name == "pallas_call":
            events.append(("pallas_call", din))
            for v in eqn.outvars:
                write(v, din)
        elif subs:
            # call primitive: align inner invars with outer invars from the
            # tail (leading positions may be consts the caller stages first)
            per_out = None
            for sub in subs:
                inner_deps = [frozenset()] * len(sub.invars)
                k = min(len(sub.invars), len(eqn.invars))
                tail = [read(v) for v in eqn.invars[len(eqn.invars) - k :]]
                inner_deps[len(sub.invars) - k :] = tail
                outs = _analyze(sub, inner_deps, events)
                if per_out is None:
                    per_out = outs
                else:
                    per_out = [a | b for a, b in zip(per_out, outs)]
            k = min(len(per_out), len(eqn.outvars))
            for v, d in zip(eqn.outvars[:k], per_out[:k]):
                write(v, d)
            for v in eqn.outvars[k:]:
                write(v, din)
        else:
            for v in eqn.outvars:
                write(v, din)

    return [read(v) for v in jaxpr.outvars]


def test_interior_kernel_independent_of_all_gather():
    rng = np.random.default_rng(0)
    n = 256
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    e = radius_graph_brute(jnp.asarray(pts), 0.7, max_neighbors=8)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g = DenseEdgeGraph.from_radius_edges(jnp.asarray(feats), jnp.asarray(pts), e)
    part = partition_graph_dense(
        pts, feats, np.array(g.senders), np.array(g.edge_mask), num_parts=4
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("graph",))
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"),
        num_layers=2, layout="cm", use_pallas=True,
    )
    assert model.layers[0].use_pallas
    params = model.init(jax.random.key(0))
    args = shard_partitioned_dense(part, mesh)
    fwd = make_dist_forward_dense(model, mesh)

    closed = jax.make_jaxpr(lambda p, a: fwd(p, a))(params, args)
    events = []
    _analyze(closed.jaxpr, [frozenset()] * len(closed.jaxpr.invars), events)

    ag_idx = [i for i, (kind, _) in enumerate(events) if kind == "all_gather"]
    pal = [(i, deps) for i, (kind, deps) in enumerate(events)
           if kind == "pallas_call"]
    assert len(ag_idx) == 2, f"expected one all_gather per layer, got {len(ag_idx)}"
    assert len(pal) == 4, f"expected 2 kernels per layer, got {len(pal)}"

    for layer, ag in enumerate(ag_idx):
        (_, anc_int), (_, anc_bnd) = pal[2 * layer], pal[2 * layer + 1]
        assert ag not in anc_int, (
            f"layer {layer}: interior kernel depends on the all_gather — "
            "no overlap possible"
        )
        assert ag in anc_bnd, (
            f"layer {layer}: boundary kernel does NOT consume the all_gather "
            "(dependency tracking broke — test needs updating)"
        )
