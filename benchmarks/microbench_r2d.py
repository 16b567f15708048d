#!/usr/bin/env python
"""Round-2 microbench, part D: cost of the REAL traversal body (copied from
accel/traverse.py with a fixed iteration count), decomposed; plus honest
HBM bandwidth via in-jit repetition.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tinsel_tpu.accel.build import COUNT_SHIFT, ITEM_MASK


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def hbm_bandwidth():
    n = 16 * 1024 * 1024  # 64 MB
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)
    k = 8

    @jax.jit
    def run(a, b):
        def body(i, y):
            return y * 0.999999 + b
        return jax.lax.fori_loop(0, k, body, a)

    dt = timed(run, a, b, reps=3)
    return 3 * n * 4 * k / dt / 1e9


import os
SKIP_BW = os.environ.get("SKIP_BW", "") == "1"


def real_pool(n_tris=524288):
    """Build the real bigmesh pool (reuses scene flattening)."""
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    return flat.pool


def rays(r):
    side = int(np.sqrt(r))
    g = np.linspace(-1.2, 1.2, side, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    o = np.stack([x.ravel(), y.ravel(), np.full(side * side, -3.0, np.float32)], -1)
    d = np.tile(np.array([[1e-5, 1e-5, 1.0]], np.float32), (side * side, 1))
    return jnp.asarray(o), jnp.asarray(d)


def traversal_fixed_iters(pool, o3, d3, r, variant="full"):
    """The exact _traverse_tile body but with `i < n_iter` as the condition
    so per-iteration slope is measurable. variant: full | nodes_only |
    tris_only | no_gather."""
    node_packed = pool.node_packed
    tri_rows = pool.tri_rows

    @jax.jit
    def run(n_iter, node_packed, tri_rows, ox, oy, oz, dx, dy, dz):
        o = (ox, oy, oz)
        d = (dx, dy, dz)
        rd = tuple(1.0 / c for c in d)

        state = (
            jnp.zeros((r,), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.full((r,), jnp.inf, jnp.float32),
            jnp.full((r,), -1, jnp.int32),
            jnp.int32(0),
        )

        def body(s):
            cur, k, best_t, best_tri, i = s
            live = cur >= 0
            if variant in ("full", "nodes_only"):
                row = node_packed[jnp.maximum(cur, 0)]
                lo = (row[:, 0], row[:, 1], row[:, 2])
                hi = (row[:, 3], row[:, 4], row[:, 5])
                word = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                skip = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
            else:
                lo = (cur * 0.0 - 1e9,) * 3
                hi = (cur * 0.0 + 1e9,) * 3
                word = cur + 1
                skip = cur - 1
            count = jax.lax.shift_right_logical(word, COUNT_SHIFT)
            payload = jax.lax.bitwise_and(word, jnp.int32(ITEM_MASK))

            t0x = (lo[0] - o[0]) * rd[0]
            t1x = (hi[0] - o[0]) * rd[0]
            t0y = (lo[1] - o[1]) * rd[1]
            t1y = (hi[1] - o[1]) * rd[1]
            t0z = (lo[2] - o[2]) * rd[2]
            t1z = (hi[2] - o[2]) * rd[2]
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            box_ok = live & (tn <= tf) & (tn < best_t)
            is_leaf = count > 0
            dwell = box_ok & is_leaf & (k < count)
            tri_local = payload + k

            if variant in ("full", "tris_only"):
                trow = tri_rows[jnp.where(dwell, tri_local, 0) % tri_rows.shape[0]]
                va = (trow[:, 0], trow[:, 1], trow[:, 2])
                vb = (trow[:, 3], trow[:, 4], trow[:, 5])
                vc = (trow[:, 6], trow[:, 7], trow[:, 8])
                abx = vb[0] - va[0]
                aby = vb[1] - va[1]
                abz = vb[2] - va[2]
                acx = vc[0] - va[0]
                acy = vc[1] - va[1]
                acz = vc[2] - va[2]
                px = d[1] * acz - d[2] * acy
                py = d[2] * acx - d[0] * acz
                pz = d[0] * acy - d[1] * acx
                det = abx * px + aby * py + abz * pz
                inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
                tx = o[0] - va[0]
                ty = o[1] - va[1]
                tz = o[2] - va[2]
                u = (tx * px + ty * py + tz * pz) * inv
                qx = ty * abz - tz * aby
                qy = tz * abx - tx * abz
                qz = tx * aby - ty * abx
                v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv
                t = (acx * qx + acy * qy + acz * qz) * inv
                hit = (
                    (jnp.abs(det) >= 1e-9)
                    & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
                )
            else:
                hit = dwell
                t = tn
            hit = dwell & hit & (t < best_t)
            best_t = jnp.where(hit, t, best_t)
            best_tri = jnp.where(hit, tri_local, best_tri)

            k2 = jnp.where(dwell, k + 1, 0)
            stay = dwell & (k2 < count)
            nxt = jnp.where(box_ok & ~is_leaf, payload, skip)
            cur = jnp.where(live, jnp.where(stay, cur, nxt), cur)
            cur = jnp.where(cur >= 0, cur, 0)  # keep looping for timing
            k = jnp.where(stay, k2, 0)
            return cur, k, best_t, best_tri, i + 1

        out = jax.lax.while_loop(lambda s: s[4] < n_iter, body, state)
        return out[2]

    o = (o3[:, 0], o3[:, 1], o3[:, 2])
    d = (d3[:, 0], d3[:, 1], d3[:, 2])
    return run, (node_packed, tri_rows) + o + d


def slope_real(pool, r, variant):
    o3, d3 = rays(r)
    lo, hi = 64, 512
    f, a = traversal_fixed_iters(pool, o3, d3, r, variant)
    t_lo = timed(f, lo, *a)
    t_hi = timed(f, hi, *a)
    per = (t_hi - t_lo) / (hi - lo)
    return per, t_lo - per * lo


def main():
    print(f"platform: {jax.devices()[0].platform}")
    if not SKIP_BW:
        print(f"HBM BW (fori saxpy x8): {hbm_bandwidth():.0f} GB/s")
    pool = real_pool()
    print(f"pool: {pool.node_packed.shape[0]} nodes, {pool.num_tris} tris")
    for variant in ("no_gather", "nodes_only", "tris_only", "full"):
        for r in (4096,):
            per, icept = slope_real(pool, r, variant)
            print(
                f"real body {variant:10s} R={r:6d}: {per*1e6:7.2f} us/iter "
                f"(intercept {icept*1e3:5.1f} ms)"
            )


if __name__ == "__main__":
    main()
