"""AOT hardware-compile gate for the Pallas kernels (no chip needed).

Interpret mode executes kernels with numpy semantics and misses whole
classes of Mosaic restrictions: axis-inserting reshapes (the r2 bench
crash), concat lane-offset mismatches (r3 `_geo_rows`), DMA slice
alignment (r3 RDMA ring).  This module compiles the production kernels for
a REAL v5e topology through the local compile-only libtpu, so "it only
breaks on hardware" regressions fail in CI.

Skipped automatically where no local libtpu topology is available.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tpu_device():
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2x1")
    except Exception as ex:
        pytest.skip(f"no compile-only TPU topology here: {ex}")
    return topo.devices[0]


def _compile(fn, device, *args):
    from jax.sharding import SingleDeviceSharding

    sh = SingleDeviceSharding(device)
    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype,
                                       sharding=sh), args)
    return jax.jit(fn).lower(*sds).compile()  # raises on Mosaic failure


def test_generic_kernel_compiles_for_tpu(tpu_device):
    """Generic fused kernel fwd+bwd, both backward modes, production tile."""
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)
    from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

    layer = SEGNNLayer(Irreps("24x0e+12x1o+6x2e"),
                       Irreps.spherical_harmonics(2), layout="cm",
                       use_pallas=True)
    assert layer.use_pallas_generic
    n, k, f = 192, 16, layer.hidden_irreps.dim
    a = Irreps.spherical_harmonics(2).dim
    params = layer.init(jax.random.key(0))
    ptuple = (params["msg_0"], params["msg_1"])
    hs = jnp.zeros((k, n, f), jnp.bfloat16)
    h = jnp.zeros((n, f), jnp.bfloat16)
    geo2 = jnp.zeros((n, k * (a + 2)), jnp.bfloat16)

    for residual in (True, False):
        kern = FusedMessageGeneric(layer.message_layers, k, tile=96,
                                   bwd_tile=96 if residual else 64,
                                   residual_bwd=residual)
        assert kern.residual_bwd == residual

        def loss(args):
            p, hs_, h_ = args
            return kern.geo_call(p, hs_, h_, geo2).astype(jnp.float32).sum()

        _compile(jax.grad(loss), tpu_device, (ptuple, hs, h))


def test_lmax1_kernel_compiles_for_tpu(tpu_device):
    """lmax=1 fused kernel fwd+bwd at the 100k-bench configuration."""
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

    layer = SEGNNLayer(Irreps("32x0e+16x1o"),
                       Irreps.spherical_harmonics(1), layout="cm",
                       use_pallas=True)
    assert layer.use_pallas
    n, k, f = 128, 24, layer.hidden_irreps.dim
    params = layer.init(jax.random.key(0))
    h = jnp.zeros((n, f), jnp.bfloat16)
    senders = jnp.zeros((n, k), jnp.int32)
    eattr = jnp.zeros((n, k, 4), jnp.bfloat16)
    d2 = jnp.zeros((n, k), jnp.bfloat16)
    mask = jnp.ones((n, k), bool)

    def loss(args):
        p, h_ = args
        agg = layer._fused_messages(p, h_, h_, senders, eattr, d2, mask)
        return agg.astype(jnp.float32).sum()

    _compile(jax.grad(loss), tpu_device, (params, h))
