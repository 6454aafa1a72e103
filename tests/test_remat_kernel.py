"""Chip-gated correctness check for the ``remat_kernel`` flag.

``remat_kernel=True`` wraps the fused-kernel dispatch in ``jax.checkpoint``
(one redundant in-kernel forward per layer), dropping the per-layer packed
edge-stream residuals — the flag that lets 1M-point lmax=2 training fit HBM
(models/segnn.py).  Pallas interpret mode rejects checkpoint x ordered-IO
effects, so this runs ONLY on a real TPU:

    PYTHONPATH=$PWD:$PYTHONPATH SCALABLE_E3_TESTS_ON_TPU=1 \
      python -m pytest tests/test_remat_kernel.py -q

It is skipped on the CPU mesh (the default conftest platform).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="remat_kernel needs a real TPU (interpret mode rejects checkpoint"
    " around ordered-IO Pallas calls)",
)

LO, HI = (-4.0,) * 3, (4.0,) * 3


def _graph(n=2048, seed=0, k=8):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    e = radius_graph_brute(tree.points, 0.5, max_neighbors=k)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    return DenseEdgeGraph.from_radius_edges(feats, tree.points, e, symmetrize=True)


@pytest.mark.parametrize("hidden,lmax", [("16x0e+8x1o", 1), ("8x0e+4x1o+2x2e", 2)])
def test_remat_kernel_matches_unremat(hidden, lmax):
    """Loss and gradients with remat_kernel=True must match =False (both on
    the fused kernel path; the flag only changes what the backward saves)."""
    g = _graph()
    n = g.num_nodes
    tgt = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, 3)), jnp.float32
    )

    def build(remat_kernel):
        m = SEGNN(
            Irreps("2x0e+1x1o"), Irreps(hidden), Irreps("1x1o"),
            num_layers=2, layout="cm", use_pallas=True, lmax_attr=lmax,
            remat=True, remat_kernel=remat_kernel,
        )
        assert m.layers[0].use_pallas or m.layers[0].use_pallas_generic
        return m

    m0, m1 = build(False), build(True)
    params = m0.init(jax.random.key(0))
    attrs = jax.jit(m0.compute_attributes_dense)(g)

    def loss(model):
        return lambda p: ((model(p, g, attrs=attrs) - tgt) ** 2).mean()

    l0, g0 = jax.jit(jax.value_and_grad(loss(m0)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss(m1)))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

