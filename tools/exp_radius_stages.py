"""Stage breakdown of the 10M-point cell radius build (VERDICT r4 next #5).

Times truncated variants of ``_cell_major_slots``'s block body at the real
10M/K=16 shapes: stencil math only, + candidate gathers, + d2 matmul,
+ selection (sort/approx) — plus two candidate fixes:

- ``gather_celltab``: gather candidates as 27 whole-cell rows from a
  cap-padded per-cell point table ([ncells, cap*3], built once from a
  nearly-sequential gather) instead of 27*cap random 12-byte point rows;
- ``d2_bf16``: recentered (cell-local, scaled) coordinates so the
  |r|^2+|q|^2-2rq cancellation survives bf16, 1-pass MXU instead of the
  6-pass "highest" f32.

Run on the real chip:  PYTHONPATH=. python tools/exp_radius_stages.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph import radius as R

LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    k = 16
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    lv = max(4, R.search_level_for_radius(r, LO, HI) + 1)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=lv))(
        jnp.asarray(pts))
    jax.block_until_ready(tree.points)
    cap = R.suggest_cell_capacity(tree, r, LO, HI)
    level = R._resolve_level(tree, r, LO, HI, None)
    print(f"# n={n} k={k} cap={cap} level={level}", flush=True)

    cell_code = tree.cell_code[level]
    cell_start = tree.cell_start[level]
    cell_count = tree.cell_count[level]
    capc = cell_code.shape[0]
    p = tree.points
    block_size = 2048
    cb = max(1, block_size // cap)
    nb = -(-capc // cb)
    pad_c = nb * cb + cb
    code_p = jnp.concatenate([cell_code, jnp.full((pad_c,), R.CODE_SENTINEL,
                                                  jnp.int32)])
    start_p = jnp.concatenate([cell_start, jnp.full((pad_c,), n, jnp.int32)])
    count_p = jnp.concatenate([cell_count, jnp.zeros((pad_c,), jnp.int32)])
    slot = jnp.arange(cap, dtype=jnp.int32)

    # cap-padded per-cell point table: [capc+1, cap*3] (last row = pad cell)
    def build_celltab(pts_):
        idx = jnp.clip(cell_start[:, None] + slot[None, :], 0, n - 1)
        valid = slot[None, :] < cell_count[:, None]
        tab = jnp.take(pts_, idx.reshape(-1), axis=0).reshape(capc, cap, 3)
        tab = jnp.where(valid[..., None], tab, jnp.float32(1e9))
        return jnp.concatenate(
            [tab, jnp.full((pad_c, cap, 3), 1e9, jnp.float32)], axis=0)

    def body(stage, with_tab=False):
        def one_block(b, celltab=None):
            c0 = b * cb
            ccode = jax.lax.dynamic_slice(code_p, (c0,), (cb,))
            cstart = jax.lax.dynamic_slice(start_p, (c0,), (cb,))
            ccount = jax.lax.dynamic_slice(count_p, (c0,), (cb,))
            nstart, ncount = R._stencil_lookup(
                ccode, cell_code, cell_start, cell_count, level)
            ncell = jnp.clip(
                jnp.searchsorted(cell_start, nstart, side="left"),
                0, capc + pad_c - 1)  # only for celltab variants
            cand = jnp.where(slot[None, None, :] < ncount[..., None],
                             nstart[..., None] + slot, 0)
            candf = cand.reshape(cb, 27 * cap)
            cvalidf = (slot[None, None, :] < ncount[..., None]).reshape(
                cb, 27 * cap)
            if stage == "stencil":
                return (nstart.sum() + ncount.sum()).astype(jnp.float32)
            rows_idx = cstart[:, None] + slot
            rvalid = slot < ccount[:, None]
            rpts = jnp.take(p, jnp.where(rvalid, rows_idx, 0), axis=0)
            if celltab is None:
                cpts = jnp.take(p, candf, axis=0)  # [cb, 27*cap, 3]
            else:
                blk = jnp.take(celltab, ncell.reshape(-1), axis=0)
                cpts = blk.reshape(cb, 27 * cap, 3)
            if stage == "gather":
                return cpts.sum() + rpts.sum()
            if stage == "d2_bf16":
                # recenter on the block's first receiver, scale by 1/(4r)
                ctr = rpts[:, :1, :]
                s = jnp.float32(1.0 / (4.0 * r))
                rb = ((rpts - ctr) * s).astype(jnp.bfloat16)
                qb = ((cpts - ctr) * s).astype(jnp.bfloat16)
                rq = jax.lax.dot_general(
                    rb, qb, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                d2 = (jnp.sum(rb.astype(jnp.float32) ** 2, -1)[..., None]
                      + jnp.sum(qb.astype(jnp.float32) ** 2, -1)[:, None, :]
                      - 2.0 * rq)
            else:
                rq = jax.lax.dot_general(
                    rpts, cpts, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision="highest")
                d2 = (jnp.sum(rpts * rpts, -1)[..., None]
                      + jnp.sum(cpts * cpts, -1)[:, None, :] - 2.0 * rq)
            if stage in ("d2", "d2_bf16"):
                return d2.sum()
            if stage.startswith("approx_bf16d2"):
                # bf16 recentered d2 (20x cheaper than highest-f32), f32
                # KEYS for approx_min_k (bf16 keys measured 30s+), no
                # refine — d2 only drives neighbor selection; the graph
                # recomputes geometry from positions downstream
                ctr = rpts[:, :1, :]
                s = jnp.float32(1.0 / (4.0 * r))
                rb = ((rpts - ctr) * s).astype(jnp.bfloat16)
                qb = ((cpts - ctr) * s).astype(jnp.bfloat16)
                rqb = jax.lax.dot_general(
                    rb, qb, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                d2b = (jnp.sum(rb.astype(jnp.float32) ** 2, -1)[..., None]
                       + jnp.sum(qb.astype(jnp.float32) ** 2, -1)[:, None, :]
                       - 2.0 * rqb)
                validb = (cvalidf[:, None, :]
                          & (slot < ccount[:, None])[..., None])
                key = jnp.where(validb, d2b, jnp.float32(1e9)).reshape(
                    cb * cap, 27 * cap)
                rc = float(stage.split("@")[1]) if "@" in stage else 0.95
                sk, pos = jax.lax.approx_min_k(key, k, recall_target=rc)
                return sk.sum() + pos.sum().astype(jnp.float32)
            if stage == "twostage":
                # bf16 recentered d2 -> approx shortlist of 2K -> exact
                # refine: gather shortlist coords, fp32 d2, full sort
                ctr = rpts[:, :1, :]
                s = jnp.float32(1.0 / (4.0 * r))
                rb = ((rpts - ctr) * s).astype(jnp.bfloat16)
                qb = ((cpts - ctr) * s).astype(jnp.bfloat16)
                rqb = jax.lax.dot_general(
                    rb, qb, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                d2b = (jnp.sum(rb.astype(jnp.float32) ** 2, -1)[..., None]
                       + jnp.sum(qb.astype(jnp.float32) ** 2, -1)[:, None, :]
                       - 2.0 * rqb)
                validb = (cvalidf[:, None, :]
                          & (slot < ccount[:, None])[..., None])
                big = jnp.float32(1e9)
                keyb = jnp.where(validb, d2b, big).reshape(
                    cb * cap, 27 * cap).astype(jnp.bfloat16)
                _, pos = jax.lax.approx_min_k(keyb, 2 * k,
                                              recall_target=0.95)
                candr = jnp.take_along_axis(
                    jnp.broadcast_to(candf[:, None, :],
                                     (cb, cap, 27 * cap)).reshape(
                        cb * cap, 27 * cap), pos, axis=1)  # [rows, 2k]
                vr = jnp.take_along_axis(
                    validb.reshape(cb * cap, 27 * cap), pos, axis=1)
                csel = jnp.take(p, candr.reshape(-1), axis=0).reshape(
                    cb * cap, 2 * k, 3)
                rsel = rpts.reshape(cb * cap, 1, 3)
                d2e = jnp.sum((csel - rsel) ** 2, axis=-1)
                rowsf2 = (cstart[:, None] + slot).reshape(cb * cap)
                keye = jnp.where(
                    vr & (d2e <= r * r)
                    & (candr != rowsf2[:, None]), d2e, big)
                sk, order = jax.lax.sort_key_val(keye, candr, dimension=1)
                return (sk[:, :k].sum()
                        + order[:, :k].sum().astype(jnp.float32))
            valid = (cvalidf[:, None, :] &
                     (slot < ccount[:, None])[..., None]).reshape(
                cb * cap, 27 * cap)
            sel = "approx" if stage == "approx" else "sort"
            s_cs, m_cs = R._topk_neighbors(
                d2.reshape(cb * cap, 27 * cap),
                jnp.broadcast_to(candf[:, None, :],
                                 (cb, cap, 27 * cap)).reshape(
                    cb * cap, 27 * cap),
                valid, r, (cstart[:, None] + slot).reshape(cb * cap), k,
                selection=sel)
            return s_cs.sum().astype(jnp.float32) + m_cs.sum()

        if with_tab:
            return jax.jit(lambda tab: jax.lax.map(
                lambda b: one_block(b, celltab=tab), jnp.arange(nb)).sum())
        return jax.jit(lambda _: jax.lax.map(
            one_block, jnp.arange(nb)).sum())

    def timed(fn, *a, iters=1):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    tab = None
    t_tab = None
    jtab = jax.jit(build_celltab)
    t_tab = timed(jtab, p)
    tab3 = jtab(p)  # [capc+pad, cap, 3] device array — passed as ARG
    print(f"# celltab build: {t_tab:.2f}s", flush=True)
    for stage in ("approx_bf16d2", "approx_bf16d2@0.85",
                  "approx_bf16d2@0.7", "approx"):
        dt = timed(body(stage, with_tab=True), tab3)
        print(f"# {stage:18s} (celltab): {dt:.2f}s", flush=True)


if __name__ == "__main__":
    main()
