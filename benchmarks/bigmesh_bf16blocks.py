#!/usr/bin/env python
"""Round-3 experiment: bf16-pair-packed leaf blocks (72 consumed cols vs
144) for the traversal's block test. At 4096-lane tiles the overlapped
loop moves ~644 B/lane/iter (~211 GB/s effective) — bandwidth-bound — so
halving the block bytes should cut iteration cost ~40%.

Correctness note: the PACKED test only picks the winning triangle and a
candidate t (pruning best_t); the final hit is refit against exact f32
vertices. Error appears only if bf16 vertex rounding flips the t-order of
two triangles closer than ~0.4%, i.e. at shared edges (visually
indistinguishable) or sub-0.4%-separated sheets. This script measures the
speed AND the disagreement rate vs the exact walk.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def pack_blocks_bf16(block_rows):
    """(B, 192) f32 -> (B, 72) f32 holding u32[bf16(hi)|bf16(lo)] pairs:
    col 8c+j packs triangles 2j and 2j+1 of component c."""
    b = np.asarray(block_rows)[:, :144].reshape(-1, 9, 16)
    bf = jax.device_get(
        jnp.asarray(b).astype(jnp.bfloat16)
    )  # round-to-nearest
    u = np.asarray(bf.view(np.uint16)).astype(np.uint32).reshape(-1, 9, 8, 2)
    packed = u[..., 0] | (u[..., 1] << 16)  # lo = tri 2j, hi = tri 2j+1
    return jnp.asarray(packed.reshape(-1, 72).view(np.float32))


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import tinsel_tpu.accel.traverse as trav
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    # -------- monkeypatched bf16 block test (same winner-select contract)
    def _block_test_row_packed(brow, blk_local, dwell, o, d, best_t):
        ob = tuple(c[:, None] for c in o)
        db = tuple(c[:, None] for c in d)

        def unpack(cols):  # (R, 8) packed -> (R, 16) f32
            u = jax.lax.bitcast_convert_type(cols, jnp.uint32)
            hi = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(u, jnp.uint32(0xFFFF0000)), jnp.float32
            )
            lo = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(u, jnp.uint32(16)), jnp.float32
            )
            # interleave: tri 2j = lo[:, j], tri 2j+1 = hi[:, j]
            return jnp.stack([lo, hi], axis=-1).reshape(lo.shape[0], 16)

        comps = [unpack(brow[:, 8 * c : 8 * (c + 1)]) for c in range(9)]
        va = tuple(comps[0:3])
        vb = tuple(comps[3:6])
        vc = tuple(comps[6:9])
        hit, t = trav._tri_hit(va, vb, vc, ob, db)
        INF = float("inf")
        tt = jnp.where(hit & dwell[:, None] & (t < best_t[:, None]), t, INF)
        t_min = tt.min(axis=1)
        found = t_min < best_t
        slot = jnp.argmin(tt, axis=1).astype(jnp.int32)
        tri_local = blk_local * trav.BLOCK_SIZE + slot
        return found, t_min, tri_local

    import os

    nt = int(os.environ.get("BIGMESH_N", "512"))  # CPU smoke: BIGMESH_N=96
    m = sphere(radius=1.0, n_theta=nt, n_phi=nt)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)

    def bench(pool, label):
        run = jax.jit(
            lambda pool, o, d, t: trav.intersect_mesh(
                pool, h.node_offset, h.tri_offset, o, d, t
            )
        )
        out = run(pool, origins, dirs, tmax)
        np.asarray(out[0].ravel()[:1])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = run(pool, origins, dirs, tmax)
        np.asarray(out[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:7.1f} ms  {r/dt/1e6:6.3f} Mrays/s",
              flush=True)
        return out

    out_exact = bench(flat.pool, "f32 blocks (144 cols)")

    packed = pack_blocks_bf16(flat.pool.block_rows)
    import dataclasses

    pool_bf = dataclasses.replace(flat.pool, block_rows=packed)
    orig = trav._block_test_row
    trav._block_test_row = _block_test_row_packed
    try:
        out_bf = bench(pool_bf, "bf16 blocks ( 72 cols)")
    finally:
        trav._block_test_row = orig

    t_e, tri_e = np.asarray(out_exact[0]), np.asarray(out_exact[1])
    t_b, tri_b = np.asarray(out_bf[0]), np.asarray(out_bf[1])
    hit_dis = (np.isfinite(t_e) != np.isfinite(t_b)).mean()
    both = np.isfinite(t_e) & np.isfinite(t_b)
    tri_dis = (tri_e[both] != tri_b[both]).mean()
    dt_rel = np.abs(t_e[both] - t_b[both]) / np.maximum(t_e[both], 1e-6)
    print(f"hit/miss disagreement: {hit_dis:.2e}; "
          f"winner-tri disagreement: {tri_dis:.2e}; "
          f"max |dt|/t: {dt_rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
