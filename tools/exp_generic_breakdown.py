"""In-kernel stage breakdown of the generic fused message kernel forward.

The kernel runs at ~53 ms/layer fwd at the 256k/K=16 lmax=2 config vs an
~11 ms MXU floor (docs/PERF.md).  This builds truncated kernel variants that
run progressively more of the tile computation and times each on the chip,
so the gap can be attributed: geometry expansion, hr E-expand, m0 concat,
z outer-product builds, GEMMs, gates, K-sum.

Also A/Bs a z-concat-free GEMM formulation: y = Σ_c (m·attr_c) @ W'_c
(C2 narrow GEMMs, no [R, C2·C1] concat materialization) vs the production
z-concat + single wide GEMM.
"""

import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
    FusedMessageGeneric,
)
from scalable_e3_gnn_tpu.models.segnn import SEGNN

bf = jnp.bfloat16


class StagedKernel(FusedMessageGeneric):
    """Forward truncated after ``stage``; output always [T, F] via slice."""

    def __init__(self, *a, stage="full", **kw):
        self.stage = stage
        super().__init__(*a, **kw)
        self.residual_bwd = False

    def _message(self, params_tuple, hs_t, hr_rep, d2, attr, maskf,
                 ksum=None, psels=None):
        f = hr_rep.shape[-1]
        dt = hs_t.dtype
        psels = psels if psels is not None else [None] * len(self.layers)

        def out(m):
            # lane-sum sink so DCE cannot drop any computed column
            red = m[:, :f] + jnp.sum(
                m.astype(jnp.float32), axis=-1, keepdims=True).astype(dt)
            return self._ksum(red * maskf)

        if self.stage == "full_nz":  # production path (z-free _layer_tp)
            return super()._message(params_tuple, hs_t, hr_rep, d2, attr,
                                    maskf, psels=psels)
        if self.stage == "null":  # constants: grid + DMA + K-sum only
            r = hr_rep.shape[0]
            return self._ksum(jnp.ones((r, f), dt))
        if self.stage == "expand":  # geo rows + repeats only
            return out(hr_rep + d2.astype(dt) + attr[:, :1])
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(dt)], axis=-1)
        if self.stage == "concat":
            return out(m)
        layer0, p0 = self.layers[0], params_tuple[0]
        c1, c2 = layer0.tp.in1_dim, layer0.tp.in2_dim
        wf = p0["w_folded"].astype(dt)
        if self.stage == "gemm1_nz":  # z-free formulation of layer 1
            acc = None
            for c in range(c2):
                t = jnp.dot((m * attr[:, c : c + 1]),
                            wf[c * c1 : (c + 1) * c1],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            return out(acc.astype(dt))
        cols = [m * attr[:, c : c + 1] for c in range(c2)]
        z = jnp.concatenate(cols, axis=-1) if c2 > 1 else cols[0]
        if self.stage == "z1":
            return out(z)
        y = jnp.dot(z, wf, preferred_element_type=jnp.float32).astype(dt)
        if self.stage == "gemm1":
            return out(y)
        m = self._gate_apply(0, y, psels[0]) if self._gate_fast[0] is not None \
            else (layer0.gate(y) if layer0.gate is not None else y)
        if self.stage == "gate1":
            return out(m)
        for layer, p in zip(self.layers[1:], params_tuple[1:]):
            m = layer(p, m, attr)
        return self._ksum(m * maskf)


def timed(name, fn, x, iters=8):
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)
    out = fn(x)
    probe = jax.jit(lambda o: o[0, 0].astype(jnp.float32))
    p = probe(out)
    x = pert(x, p)
    out = fn(x)
    p = probe(out)
    float(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, p)
        out = fn(x)
        p = probe(out)
    float(p)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n, k = 256_000, 16
    lo, hi = (0.0,) * 3, (1.0,) * 3
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, lo, hi, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, lo, hi)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, lo, hi, max_neighbors=k, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)
    print("edges:", int(g.edge_mask.sum()), flush=True)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
    layer = model.layers[0]
    params = model.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])
    attrs = jax.jit(model.compute_attributes_dense)(g)
    _, _, _, edge_geo = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)

    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (n, f), bf)
    hs = jnp.take(h, g.senders.T, axis=0, mode="fill",
                  fill_value=0)  # [K, N, F]
    geo2 = edge_geo.reshape(n, -1)
    ptuple = tuple(lp[f"msg_{i}"] for i in range(2))

    import os
    stages = os.environ.get(
        "STAGES",
        "null,expand,concat,z1,gemm1,gemm1_nz,gate1,full_nz").split(",")
    tile = int(os.environ.get("TILE", "64"))
    for stage in stages:
        kern = StagedKernel(layer.message_layers, k, tile=tile, bwd_tile=64,
                            stage=stage)
        timed(f"fwd[{stage}] t{tile}", jax.jit(
            lambda hs_, kern=kern: kern.geo_call(ptuple, hs_, h, geo2)), hs)


if __name__ == "__main__":
    main()
