"""Pallas RDMA ring all-gather (interpret mode on the 8-virtual-CPU mesh)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from scalable_e3_gnn_tpu.kernels.halo_rdma import ring_all_gather
from scalable_e3_gnn_tpu.parallel.halo import exchange_halo


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("x",))


@pytest.mark.parametrize("n", [2, 8])
def test_ring_all_gather_forward(n):
    mesh = _mesh(n)
    H, F = 8, 16
    x = jnp.arange(n * H * F, dtype=jnp.float32).reshape(n, H, F)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False
    )
    def f(xb):
        return ring_all_gather(xb[0], "x", n, interpret=True)[None]

    out = np.array(jax.jit(f)(x))
    expect = np.broadcast_to(np.array(x)[None], (n, n, H, F))
    np.testing.assert_array_equal(out, expect)


def test_ring_all_gather_gradient():
    n = 8
    mesh = _mesh(n)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 8, 16)), jnp.float32
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("x"), out_specs=P(), check_vma=False
    )
    def loss(xb):
        pool = ring_all_gather(xb[0], "x", n, interpret=True)
        return jax.lax.psum((pool**2).sum(), "x")

    g = np.array(jax.grad(lambda v: jax.jit(loss)(v))(x))
    np.testing.assert_allclose(g, 2 * n * np.array(x), rtol=1e-6)


def test_exchange_halo_backends_agree():
    """xla and rdma backends produce identical extended features."""
    n = 4
    mesh = _mesh(n)
    rng = np.random.default_rng(1)
    Np, H, F = 16, 8, 12
    h = jnp.asarray(rng.standard_normal((n, Np, F)), jnp.float32)
    bidx = jnp.asarray(rng.integers(0, Np, (n, H)), jnp.int32)
    hmap = jnp.asarray(rng.integers(0, n * H, (n, H)), jnp.int32)

    def make(backend):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("x"), P("x"), P("x")), out_specs=P("x"), check_vma=False,
        )
        def f(hb, bb, mb):
            return exchange_halo(
                hb[0], bb[0], mb[0], "x", backend=backend, num_devices=n,
                interpret=True,
            )[None]

        return jax.jit(f)

    out_xla = np.array(make("xla")(h, bidx, hmap))
    out_rdma = np.array(make("rdma")(h, bidx, hmap))
    np.testing.assert_array_equal(out_xla, out_rdma)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ring_aot_compiles_for_real_topology(dtype):
    """AOT-compile the ring for a REAL v5e 4-chip topology (compile-only
    libtpu) — interpret mode does not model DMA slice alignment, which is
    exactly how an unaligned-F bug shipped in r2/r3 ('slice shape along
    dimension 2 must be aligned to tiling'); the ring now pads H to the
    dtype's sublane tile (8 fp32 / 16 bf16) and F to 128 lanes internally.
    H=117 exercises both pads: not a multiple of 8 or 16."""
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2x1")
    except Exception as ex:  # no local libtpu / unsupported
        pytest.skip(f"no compile-only TPU topology here: {ex}")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(topo.devices).reshape(4), ("graph",))

    def fwd(x):
        def local(a):
            return ring_all_gather(a[0], "graph", 4)[None]
        return jax.shard_map(local, mesh=mesh, in_specs=P("graph"),
                             out_specs=P("graph"), check_vma=False)(x)

    sds = jax.ShapeDtypeStruct((4, 117, 90), dtype,
                               sharding=NamedSharding(mesh, P("graph")))
    jax.jit(fwd).lower(sds).compile()  # raises on any Mosaic/HBM failure
