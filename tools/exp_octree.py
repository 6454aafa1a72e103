"""Profile the 10M-point octree build: sort vs sweeps vs gathers."""

import sys

sys.path.insert(0, "/root/repo")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from scalable_e3_gnn_tpu.graph.morton import morton_encode_points
from scalable_e3_gnn_tpu.graph.octree import build_octree
from tools.tputime import timed

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
LO, HI = (0.0,) * 3, (1.0,) * 3

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.random((N, 3)).astype(np.float32))

enc = jax.jit(lambda p: morton_encode_points(p, LO, HI))
timed("encode", enc, pts)

codes = enc(pts)
srt = jax.jit(lambda c: jax.lax.sort_key_val(c, jnp.arange(c.shape[0], dtype=jnp.int32)))
timed("sort_key_val", srt, codes)

codes_s, order = srt(codes)
take = jax.jit(lambda p, o: jnp.take(p, o, axis=0))
timed("take points", take, pts, order)

cs = jax.jit(lambda c: jnp.cumsum((jnp.concatenate([jnp.ones((1,), c.dtype), c[1:] ^ c[:-1]]) != 0).astype(jnp.int32)))
timed("flags+cumsum 10M", cs, codes_s)

rank = cs(codes_s)


def scat(r, c):
    n = r.shape[0]
    cap = min(2097152, n)
    ids = jnp.where(jnp.ones((n,), bool), r, cap + 1)
    return jnp.full((cap + 2,), n, jnp.int32).at[ids].set(jnp.arange(n, dtype=jnp.int32))


timed("scatter 10M->2M", jax.jit(scat), rank, codes_s)

gat = jax.jit(lambda t, r: jnp.take(t, jnp.minimum(r, t.shape[0] - 1)))
tbl = jnp.arange(2097152, dtype=jnp.int32)
timed("gather [N] from 2M tbl", gat, tbl, rank)

build = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=8))
timed("full build (8 levels)", build, pts, iters=5)
