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

    for residual, colpad, replay in (
            (True, True, True), (True, False, True), (False, False, True),
            (False, True, True),   # 1M production combo: replay bwd + colpad
            (False, False, False),  # jax.vjp fallback keeps AOT coverage
    ):
        kern = FusedMessageGeneric(layer.message_layers, k, tile=96,
                                   bwd_tile=96 if residual else 64,
                                   residual_bwd=residual, colpad=colpad,
                                   replay_bwd=replay)
        assert kern.residual_bwd == residual
        assert kern.colpad == colpad
        assert kern.replay_bwd == replay

        def loss(args):
            p, hs_, h_ = args
            return kern.geo_call(p, hs_, h_, geo2).astype(jnp.float32).sum()

        _compile(jax.grad(loss), tpu_device, (ptuple, hs, h))


def test_tabled_generic_kernel_compiles_for_tpu(tpu_device):
    """Tabled generic kernel (geo_call_tab: in-kernel one-hot expand from
    compact per-tile sender tables, split-rev sender gradients) fwd+bwd in
    both the residual and the replay backward modes (r5)."""
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)
    from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

    layer = SEGNNLayer(Irreps("24x0e+12x1o+6x2e"),
                       Irreps.spherical_harmonics(2), layout="cm",
                       use_pallas=True)
    n, k, f = 192, 16, layer.hidden_irreps.dim
    a = Irreps.spherical_harmonics(2).dim
    tile, u, q0, m = 96, 256, 2, 1024
    ntiles = n // tile
    params = layer.init(jax.random.key(0))
    ptuple = (params["msg_0"], params["msg_1"])
    h = jnp.zeros((n, f), jnp.bfloat16)
    geo2 = jnp.zeros((n, k * (a + 2)), jnp.bfloat16)
    loc = jnp.zeros((n, k), jnp.int32)
    tab = jnp.zeros((ntiles, u), jnp.int32)
    revd = jnp.zeros((n, q0), jnp.int32)
    remp = jnp.zeros((m,), jnp.int32)
    remn = jnp.full((m,), n, jnp.int32)

    for residual in (True, False):
        kern = FusedMessageGeneric(layer.message_layers, k, tile=tile,
                                   bwd_tile=tile, residual_bwd=residual,
                                   colpad=True)

        def loss(args):
            p, h_ = args
            return kern.geo_call_tab(
                p, h_, geo2, loc, tab, revd, remp, remn
            ).astype(jnp.float32).sum()

        _compile(jax.grad(loss), tpu_device, (ptuple, h))


@pytest.mark.parametrize("pack", [1, 2])
def test_lmax1_kernel_compiles_for_tpu(tpu_device, pack):
    """lmax=1 fused kernel fwd+bwd at the 100k-bench configuration.

    pack=1 dispatches the slot-major km kernel (the r4 production path);
    pack=2 keeps AOT coverage on the legacy t-major stacked-lane kernel."""
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

    layer = SEGNNLayer(Irreps("32x0e+16x1o"),
                       Irreps.spherical_harmonics(1), layout="cm",
                       use_pallas=True, pack=pack)
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


def test_dist_train_step_compiles_for_tpu(tpu_device):
    """The full distributed dense TRAIN STEP (halo exchange + fused kernels
    + psum'd grads) AOT-compiled for a real v5e 4-chip topology — the
    multi-chip path has no other hardware-compile coverage in a 1-chip
    sandbox."""
    import optax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.models.segnn import SEGNN
    from scalable_e3_gnn_tpu.parallel import halo as H
    from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
    from scalable_e3_gnn_tpu.train.pipeline import make_train_state

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    mesh = Mesh(np.array(topo.devices).reshape(4), ("graph",))
    rng = np.random.default_rng(0)
    n, k = 1024, 8
    offs = rng.integers(-20, 21, size=(n, k))
    senders = ((np.arange(n)[:, None] + offs) % n).astype(np.int32)
    mask = rng.random((n, k)) < 0.9
    part = partition_graph_dense(
        rng.random((n, 3)).astype(np.float32),
        rng.standard_normal((n, 5)).astype(np.float32), senders, mask,
        num_parts=4)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"),
                  num_layers=2, layout="cm", use_pallas=True)
    bf = jnp.bfloat16
    raw = H._shard_args_dense(part)
    shd = lambda x: jax.ShapeDtypeStruct(
        x.shape, bf if x.dtype == jnp.float32 else x.dtype,
        sharding=NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1)))))
    sargs_s = tuple(shd(x) for x in raw)
    cpu_parts = [jax.devices("cpu")[0]] * 4
    attrs_shape = jax.eval_shape(
        lambda a: H.make_dist_geometry_dense(
            model, Mesh(np.array(cpu_parts).reshape(4), ("graph",)))(a),
        tuple(jnp.asarray(a) for a in raw))
    attrs_s = jax.tree.map(shd, attrs_shape)
    tgt_s = jax.ShapeDtypeStruct((4, part.n_per_part, 3), jnp.float32,
                                 sharding=NamedSharding(mesh, P("graph")))
    opt = optax.adam(1e-3)
    wrapper = H.make_dist_train_step_dense(model, opt, mesh, compute_dtype=bf)
    jstep = wrapper.jit_step  # the lowerable step, exposed as API (r4)
    st = make_train_state(model.init(jax.random.key(0)), opt)
    rep = NamedSharding(mesh, P())
    st_s = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                       sharding=rep), st)
    jstep.lower(st_s, sargs_s, tgt_s, attrs_s).compile()  # raises on failure
