"""lmax=2 generic-kernel profile: fwd/bwd split + tile sweep (250k config).

The 250k/lmax=2 step is 1130 ms.  Measure fwd-only vs fwd+bwd and sweep
(tile, bwd_tile) to see whether grid-step overhead or VJP recompute
dominates before hand-deriving a backward.
"""

import sys
import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss


def main():
    rng = np.random.default_rng(0)
    n = 250_000
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.,)*3, (1.,)*3)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, (0.,)*3, (1.,)*3, max_neighbors=16, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)
    print("edges:", int(g.edge_mask.sum()), flush=True)
    tgt = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def run(tile, bwd, fwd_only=False):
        model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                      Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                      layout="cm", use_pallas=True)
        for layer in model.layers:
            layer._generic_tile = (tile, bwd)
        # monkey-free tile override: patch the dispatch constants
        import scalable_e3_gnn_tpu.models.segnn as SG

        orig = SG.SEGNNLayer._fused_messages_generic

        def patched(self, params, h_local, h_ext, senders, edge_attr,
                    edge_dist2, edge_mask, reverse_slot=None, edge_geo=None,
                    hs=None):
            from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
                FusedMessageGeneric,
            )

            nn, k = senders.shape
            f = h_local.shape[-1]
            npad = -(-nn // tile) * tile
            key = (k, npad, tile, bwd)
            if key not in self._generic_kernels:
                self._generic_kernels[key] = FusedMessageGeneric(
                    self.message_layers, k, tile=tile, bwd_tile=bwd)
            kern = self._generic_kernels[key]
            if hs is None:
                from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric_km
                if reverse_slot is not None and h_ext is h_local:
                    hs = take_dense_symmetric_km(h_ext, senders, reverse_slot, edge_mask)
                else:
                    hs = jnp.take(h_ext, senders.T, axis=0, mode="fill", fill_value=0)
            else:
                hs = jnp.swapaxes(hs, 0, 1)
            dt = h_local.dtype
            geo2 = self._geo2(edge_geo, edge_attr, edge_dist2, edge_mask, dt)
            h_p = h_local
            if npad != nn:
                hs = jnp.concatenate([hs, jnp.zeros((k, npad - nn, f), dt)], axis=1)
                geo2 = jnp.concatenate(
                    [geo2, jnp.zeros((npad - nn, geo2.shape[-1]), geo2.dtype)])
                h_p = jnp.concatenate(
                    [h_local, jnp.zeros((npad - nn, f), h_local.dtype)])
            ptuple = tuple(params[f"msg_{i}"] for i in range(len(self.message_layers)))
            return kern.geo_call(ptuple, hs, h_p, geo2)[:nn]

        SG.SEGNNLayer._fused_messages_generic = patched
        try:
            params = model.init(jax.random.key(0))
            attrs = jax.jit(model.compute_attributes_dense)(g)
            bf = jnp.bfloat16
            gb = g._replace(nodes=g.nodes.astype(bf))
            a = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
            if fwd_only:
                pbf = jax.tree.map(lambda x: x.astype(bf), params)
                fwd = jax.jit(lambda p: model(p, gb, attrs=a))
                out = fwd(pbf); jax.block_until_ready(out)
                t0 = time.time()
                for _ in range(6):
                    pbf = jax.tree.map(lambda x: x + 0 * out[0, 0].astype(x.dtype), pbf)
                    out = fwd(pbf)
                jax.block_until_ready(out)
                return (time.time() - t0) / 6 * 1e3

            def loss_fn(p, g_, a_, t):
                p = jax.tree.map(lambda x: x.astype(bf), p)
                return mse_loss(model(p, g_, attrs=a_).astype(jnp.float32), t)

            opt = optax.adam(1e-3)
            step = make_train_step(loss_fn, opt, donate=False)
            st = make_train_state(params, opt)
            st, m = step(st, gb, a, tgt); jax.block_until_ready(m["loss"])
            t0 = time.time()
            for _ in range(5):
                st, m = step(st, gb, a, tgt)
            jax.block_until_ready(m["loss"])
            return (time.time() - t0) / 5 * 1e3
        finally:
            SG.SEGNNLayer._fused_messages_generic = orig

    print(f"fwd-only (tile=64): {run(64, 32, fwd_only=True):.0f} ms", flush=True)
    for tile, bwd in ((64, 64), (128, 128), (128, 64), (96, 96), (64, 128)):
        try:
            ms = run(tile, bwd)
            print(f"tile={tile} bwd={bwd}: {ms:.0f} ms/step", flush=True)
        except Exception as ex:
            print(f"tile={tile} bwd={bwd}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
