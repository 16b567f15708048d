import jax
import jax.numpy as jnp
import numpy as np

from tinsel_tpu.geometry import intersect as gi
from tinsel_tpu.accel.build import build_bvh, triangle_bounds, validate_bvh
from tinsel_tpu.accel.traverse import MeshPool, intersect_mesh


def test_ray_sphere_basic():
    o = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit, t, n = gi.intersect_ray_sphere(
        jnp.zeros((1, 3)), jnp.asarray([1.0]), o, d
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)


def test_ray_sphere_inside_hits_far_root():
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hit, t, n = gi.intersect_ray_sphere(jnp.zeros((1, 3)), jnp.asarray([2.0]), o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)


def test_ray_sphere_miss():
    o = jnp.asarray([[0.0, 5.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit, t, _ = gi.intersect_ray_sphere(jnp.zeros((1, 3)), jnp.asarray([1.0]), o, d)
    assert not bool(hit[0])
    assert np.isinf(float(t[0]))


def test_ray_plane():
    plane = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32)  # y = 0
    o = jnp.asarray([[0.0, 2.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hit, t, n = gi.intersect_ray_plane(plane, o, d)
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-5
    # parallel ray misses
    d2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hit2, _, _ = gi.intersect_ray_plane(plane, o, d2)
    assert not bool(hit2[0])


def test_ray_tri_two_sided_and_barycentrics():
    a = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    b = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    c = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    o = jnp.asarray([0.25, 0.25, 1.0], jnp.float32)
    d = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    hit, t, u, v, w, n = gi.intersect_ray_tri(a, b, c, o, d)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-5)
    # interpolate position back from barycentrics
    p = u * a + v * b + w * c
    np.testing.assert_allclose(np.asarray(p), [0.25, 0.25, 0.0], atol=1e-5)
    # normal faces the incoming ray (positive z here)
    assert float(n[2]) > 0.0

    # from the other side: still hits (two-sided), normal flipped
    hit2, t2, *_, n2 = gi.intersect_ray_tri(
        a, b, c, jnp.asarray([0.25, 0.25, -1.0], jnp.float32), -d
    )
    assert bool(hit2)
    assert float(n2[2]) < 0.0


def test_ray_aabb():
    o = jnp.asarray([-5.0, 0.5, 0.5], jnp.float32)
    d = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    hit, t = gi.intersect_ray_aabb(
        jnp.zeros(3), jnp.ones(3), o, 1.0 / d
    )
    assert bool(hit) and abs(float(t) - 5.0) < 1e-5
    # inside the box
    hit2, _ = gi.intersect_ray_aabb(
        jnp.zeros(3), jnp.ones(3), jnp.full(3, 0.5), 1.0 / d
    )
    assert bool(hit2)
    # pointing away
    hit3, _ = gi.intersect_ray_aabb(jnp.zeros(3), jnp.ones(3), o, -1.0 / d)
    assert not bool(hit3)


# ------------------------------------------------------------------ BVH build


def _random_tri_soup(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(n, 3))
    verts = centers[:, None, :] + rng.uniform(-0.5, 0.5, size=(n, 3, 3))
    positions = verts.reshape(-1, 3).astype(np.float32)
    indices = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return positions, indices


def test_bvh_build_structure():
    positions, indices = _random_tri_soup(257)
    lo, hi = triangle_bounds(positions, indices)
    bvh = build_bvh(lo, hi, max_items_per_leaf=1, use_native=False)
    assert bvh.num_nodes == 2 * 257 - 1
    assert validate_bvh(bvh, lo, hi)
    # ranged leaves: far fewer nodes, still structurally valid
    bvh8 = build_bvh(lo, hi, max_items_per_leaf=8, use_native=False)
    assert bvh8.num_nodes < bvh.num_nodes // 2
    assert int(bvh8.count.max()) <= 8
    assert validate_bvh(bvh8, lo, hi)


def test_bvh_native_matches_python_structurally():
    positions, indices = _random_tri_soup(5000, seed=1)
    lo, hi = triangle_bounds(positions, indices)
    from tinsel_tpu.native.bvh_native import build_bvh_native

    bvh = build_bvh_native(lo, hi, leaf_size=1)
    assert bvh.num_nodes == 2 * 5000 - 1
    assert validate_bvh(bvh, lo, hi)
    # root bounds identical to python builder's
    py = build_bvh(lo, hi, max_items_per_leaf=1, use_native=False)
    np.testing.assert_allclose(bvh.lower[0], py.lower[0], atol=1e-6)
    np.testing.assert_allclose(bvh.upper[0], py.upper[0], atol=1e-6)
    # ranged leaves agree with the python builder structurally
    bvh8 = build_bvh_native(lo, hi, leaf_size=8)
    assert validate_bvh(bvh8, lo, hi)
    py8 = build_bvh(lo, hi, max_items_per_leaf=8, use_native=False)
    assert bvh8.num_nodes == py8.num_nodes
    np.testing.assert_array_equal(bvh8.perm, py8.perm)


# ------------------------------------------------------------- traversal


def _pool_from_mesh(positions, indices, leaf_size=16):
    """Build a MeshPool the same way Scene.flatten does (4-ary wide layout,
    block-padded tris). Returns (pool, perm_padded)."""
    from tinsel_tpu.accel.build import BLOCK_SIZE, build_wide_bvh

    lo, hi = triangle_bounds(positions, indices)
    bvh = build_bvh(lo, hi, max_items_per_leaf=leaf_size, use_native=False)
    wide = build_wide_bvh(bvh)
    v = positions[indices[wide.perm_padded]]  # (Tp, 3, 3) block-padded
    # flat per-face normals, deindexed per-corner
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    areas = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
    )
    areas = np.where(wide.real_mask, areas, 0.0)
    cdf = np.cumsum(areas) / areas.sum()

    def blocks192(a, b, c):
        # component-major rows: 16x v0x | 16x v0y | ... | 16x v2z | pad
        comps = [arr[:, i] for arr in (a, b, c) for i in range(3)]
        n_blocks = a.shape[0] // BLOCK_SIZE
        out = np.zeros((n_blocks, BLOCK_SIZE * 12), np.float32)
        for g, comp in enumerate(comps):
            out[:, BLOCK_SIZE * g : BLOCK_SIZE * (g + 1)] = comp.reshape(
                n_blocks, BLOCK_SIZE
            )
        return jnp.asarray(out)

    def planes9(a, b, c):
        cols = []
        for arr in (a, b, c):
            cols.extend(
                jnp.asarray(np.ascontiguousarray(arr[:, i]), jnp.float32)
                for i in range(3)
            )
        return tuple(cols)

    pool = MeshPool(
        node_rows=jnp.asarray(wide.node_rows),
        block_rows=blocks192(v[:, 0], v[:, 1], v[:, 2]),
        tri_cdf=jnp.asarray(cdf, jnp.float32),
        tri_planes=planes9(v[:, 0], v[:, 1], v[:, 2]),
        nrm_planes=planes9(n, n, n),
    )
    return pool, wide.perm_padded


def _brute_force_closest(positions, indices, o, d):
    v = positions[indices]
    a, b, c = (jnp.asarray(v[:, i], jnp.float32) for i in range(3))
    ob = jnp.broadcast_to(o, a.shape)
    db = jnp.broadcast_to(d, a.shape)
    hit, t, u, vv, w, n = gi.intersect_ray_tri(a, b, c, ob, db)
    i = jnp.argmin(t)
    return float(t[i]), int(jnp.where(jnp.isinf(t[i]), -1, i))


def test_traversal_matches_brute_force():
    positions, indices = _random_tri_soup(300, seed=2)
    pool, perm = _pool_from_mesh(positions, indices)

    rng = np.random.default_rng(3)
    n_rays = 64
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    t_bvh, tri_bvh, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.full((n_rays,), np.inf, np.float32),
    )
    t_bvh = np.asarray(t_bvh)
    tri_bvh = np.asarray(tri_bvh)

    for i in range(n_rays):
        t_ref, tri_ref = _brute_force_closest(
            positions, indices, jnp.asarray(origins[i]), jnp.asarray(dirs[i])
        )
        if tri_ref < 0:
            assert tri_bvh[i] < 0, f"ray {i}: bvh hit but brute force missed"
        else:
            assert tri_bvh[i] >= 0, f"ray {i}: bvh missed but brute force hit"
            # winning triangle agrees through the BVH permutation
            assert perm[tri_bvh[i]] == tri_ref
            np.testing.assert_allclose(t_bvh[i], t_ref, rtol=1e-4)


def test_traversal_respects_tmax():
    positions, indices = _random_tri_soup(100, seed=4)
    pool, _ = _pool_from_mesh(positions, indices)
    o = jnp.asarray([[0.0, 0.0, -50.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t_any, tri, *_ = intersect_mesh(pool, 0, 0, o, d, jnp.asarray([np.inf], np.float32))
    if np.isfinite(float(t_any[0])):
        # shorten tmax below the hit: must miss
        t2, tri2, *_ = intersect_mesh(
            pool, 0, 0, o, d, jnp.asarray([float(t_any[0]) * 0.5], np.float32)
        )
        assert not np.isfinite(float(t2[0]))


def test_tiled_matches_untiled_traversal():
    """Per-tile early exit must be invisible to results: run the same batch
    with tile == batch (single while_loop) and with small tiles (lax.map)."""
    positions, indices = _random_tri_soup(500, seed=7)
    pool, _ = _pool_from_mesh(positions, indices)
    rng = np.random.default_rng(8)
    n_rays = 128
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n_rays,), np.inf, np.float32)

    t_a, tri_a, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax, tile=n_rays
    )
    t_b, tri_b, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax, tile=32
    )
    np.testing.assert_array_equal(np.asarray(tri_a), np.asarray(tri_b))
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), rtol=1e-5)


def test_packet_matches_per_ray():
    """Shared-walk packet traversal (accel.packets) must reproduce the
    per-ray walk's best_t exactly: the packet visits a superset of each
    ray's nodes and every test runs under that ray's own best_t bound.
    Winning-triangle ties may differ; where the pool carries no duplicate
    geometry (random soup), tri ids must match too. Exercises G in {2, 8},
    tiles small enough to force the packet compaction + phase 2."""
    from tinsel_tpu.accel.packets import intersect_mesh_packets

    positions, indices = _random_tri_soup(500, seed=11)
    pool, _ = _pool_from_mesh(positions, indices)
    rng = np.random.default_rng(12)
    n_rays = 256
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # half the rays truncated: tmax pruning must stay per-ray
    tmax = np.full((n_rays,), np.inf, np.float32)
    tmax[::2] = 10.0
    tmax_j = jnp.asarray(tmax)

    t_ref, tri_ref, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax_j,
        tile=n_rays,
    )
    for g, tile in ((2, 32), (8, 8), (8, 32)):
        t_p, tri_p = intersect_mesh_packets(
            pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax_j,
            g=g, stack_slots=48, tile=tile, cap=4,
        )
        # raw best_t semantics (= tmax on miss), like traverse._run_tiled
        t_p = np.where(np.asarray(tri_p) >= 0, np.asarray(t_p), np.inf)
        np.testing.assert_allclose(
            t_p, np.asarray(t_ref), rtol=1e-6,
            err_msg=f"packet g={g} tile={tile}",
        )
        np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_ref))


def test_brute_small_mesh_matches_traversal():
    positions, indices = _random_tri_soup(12, seed=9)
    pool, _ = _pool_from_mesh(positions, indices)
    rng = np.random.default_rng(10)
    n_rays = 64
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n_rays,), np.inf, np.float32)
    # num_tris <= 16 triggers the brute path
    t_a, tri_a, *_ = intersect_mesh(pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax, num_tris=12)
    t_b, tri_b, *_ = intersect_mesh(pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax)
    np.testing.assert_array_equal(np.asarray(tri_a), np.asarray(tri_b))
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), rtol=1e-5)


def test_stack_bound_sufficient():
    """wide_stack_bound computes the EXACT worst case for the slot-order
    DFS: traversal with exactly that many stack slots must agree with the
    brute force on an adversarial random soup (unbalanced tree, deep
    stacks), while the all-hit worst case can never exceed the bound."""
    from tinsel_tpu.accel.build import (
        build_bvh, build_wide_bvh, triangle_bounds, wide_stack_bound,
    )

    positions, indices = _random_tri_soup(800, seed=21)
    bvh = build_bvh(*triangle_bounds(positions, indices))
    wide = build_wide_bvh(bvh)
    bound = wide_stack_bound(wide)
    assert bound >= 1

    pool, _ = _pool_from_mesh(positions, indices)
    rng = np.random.default_rng(22)
    n_rays = 128
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n_rays,), np.inf, np.float32)

    t_exact, tri_exact, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax,
        stack_slots=bound,
    )
    t_wide, tri_wide, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax,
        stack_slots=bound + 8,
    )
    np.testing.assert_array_equal(np.asarray(tri_exact), np.asarray(tri_wide))
    np.testing.assert_allclose(
        np.asarray(t_exact), np.asarray(t_wide), rtol=1e-6
    )


def test_wide_bvh_structure():
    """The 4-ary collapse must cover every triangle exactly once, terminate
    under the all-hit walk, and keep child boxes containing their blocks —
    at several sizes including single-leaf and barely-multi-leaf meshes."""
    from tinsel_tpu.accel.build import build_wide_bvh, validate_wide_bvh

    for n, seed in ((5, 0), (17, 1), (65, 2), (300, 3), (5000, 4)):
        positions, indices = _random_tri_soup(n, seed=seed)
        lo, hi = triangle_bounds(positions, indices)
        bvh = build_bvh(lo, hi, use_native=False)
        wide = build_wide_bvh(bvh)
        assert validate_wide_bvh(wide, lo, hi, n), f"n={n}"
        # root bounds match the binary root
        np.testing.assert_allclose(wide.root_lower, bvh.lower[0], atol=1e-6)
        np.testing.assert_allclose(wide.root_upper, bvh.upper[0], atol=1e-6)


def test_skip_links_cover_tree():
    from tinsel_tpu.accel.build import compute_skip_links

    positions, indices = _random_tri_soup(100, seed=11)
    lo, hi = triangle_bounds(positions, indices)
    bvh = build_bvh(lo, hi, use_native=False)
    skip = compute_skip_links(bvh)
    # walking cur -> (left if internal else skip) with "always descend"
    # visits every node exactly once (full DFS)
    visited = []
    cur = 0
    while cur != -1:
        visited.append(cur)
        cur = int(bvh.left[cur]) if not bvh.leaf[cur] else int(skip[cur])
    assert sorted(visited) == list(range(bvh.num_nodes))


def test_any_hit_matches_closest_occlusion():
    from tinsel_tpu.accel.traverse import intersect_mesh_any

    positions, indices = _random_tri_soup(400, seed=21)
    pool, _ = _pool_from_mesh(positions, indices)
    rng = np.random.default_rng(22)
    n_rays = 128
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n_rays,), 20.0, jnp.float32)

    t, tri, *_ = intersect_mesh(
        pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.full((n_rays,), np.inf, np.float32),
    )
    expect = np.asarray((tri >= 0) & (t < 20.0))
    got = np.asarray(
        intersect_mesh_any(pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax)
    )
    np.testing.assert_array_equal(got, expect)


def test_trace_any_matches_trace_closest():
    from tinsel_tpu.render.trace import trace_any, trace_closest
    from tinsel_tpu.scene.presets import cornell_scene

    sc = cornell_scene(width=8, height=8, max_depth=1)
    flat = sc.flatten()
    rng = np.random.default_rng(23)
    n = 256
    origins = jnp.asarray(rng.uniform(-0.9, 0.9, size=(n, 3)), jnp.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    times = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 0.8, jnp.float32)

    hit = trace_closest(flat, origins, dirs, times)
    expect = np.asarray((hit.prim >= 0) & (hit.t < 0.8))
    got = np.asarray(trace_any(flat, origins, dirs, times, tmax))
    np.testing.assert_array_equal(got, expect)


def test_instance_shortlist_matches_brute():
    """The tn-ordered top-k instance rounds (render/trace.py
    _instance_rounds, VERDICT r3 #5) must agree EXACTLY with the brute
    (I*R) batch on closest hit and occlusion — including rays whose
    nearest-entry boxes do NOT contain the winner (the correctness trap
    the while-loop rounds exist to close). Two geometries: a 25-instance
    grid (typical) and a 20-instance overlapping cluster along the ray
    axis (adversarial: every box overlaps every ray)."""
    import tinsel_tpu.render.trace as tr
    from tinsel_tpu.render.trace import trace_any, trace_closest
    from tinsel_tpu.scene.model import (
        HostTransform, Material, MESH, Primitive, Scene,
    )
    from tinsel_tpu.scene.presets import instances_scene
    from tinsel_tpu.scene.procedural import capsule

    rng = np.random.default_rng(5)
    n = 512

    def compare(flat, origins, dirs, tmax):
        times = jnp.zeros((origins.shape[0],), jnp.float32)
        saved = tr.INSTANCE_TOPK_MIN
        try:
            tr.INSTANCE_TOPK_MIN = 10**9  # force brute
            hit_b = trace_closest(flat, origins, dirs, times)
            occ_b = np.asarray(trace_any(flat, origins, dirs, times, tmax))
            tr.INSTANCE_TOPK_MIN = 1  # force shortlist rounds
            hit_s = trace_closest(flat, origins, dirs, times)
            occ_s = np.asarray(trace_any(flat, origins, dirs, times, tmax))
        finally:
            tr.INSTANCE_TOPK_MIN = saved
        np.testing.assert_array_equal(
            np.asarray(hit_s.prim), np.asarray(hit_b.prim)
        )
        np.testing.assert_allclose(
            np.asarray(hit_s.t), np.asarray(hit_b.t), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(hit_s.normal), np.asarray(hit_b.normal), atol=1e-6
        )
        np.testing.assert_array_equal(occ_s, occ_b)

    # geometry 1: 5x5 capsule grid
    flat = instances_scene(grid=5, max_depth=1).flatten()
    origins = jnp.asarray(
        rng.uniform([-3, 0.1, -3], [3, 4, 6], size=(n, 3)), jnp.float32
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    compare(flat, origins, dirs, jnp.full((n,), 2.0, jnp.float32))

    # geometry 2: overlapping cluster — 20 instances of one capsule at
    # jittered positions inside a 1-unit ball; rays shot through it
    sc = Scene()
    shared = capsule(radius=0.25, half_height=0.2, slices=10, segments=18)
    shared.build()
    for i in range(20):
        sc.add_primitive(
            Primitive(
                type=MESH, mesh=shared,
                start_transform=HostTransform(
                    p=rng.uniform(-0.5, 0.5, 3).astype(np.float32)
                ),
                material=Material(),
            )
        )
    flat2 = sc.flatten()
    o2 = jnp.asarray(
        rng.uniform([-0.3, -0.3, 3.0], [0.3, 0.3, 4.0], size=(n, 3)),
        jnp.float32,
    )
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2[:, 2] -= 3.0  # bias through the cluster
    dirs2 = jnp.asarray(d2 / np.linalg.norm(d2, axis=-1, keepdims=True))
    compare(flat2, o2, dirs2, jnp.full((n,), 5.0, jnp.float32))


def test_bvh_build_methods_agree():
    """median/midpoint alternatives (bvh.h:105-150) produce valid trees
    whose traversal results are identical to SAH's."""
    from tinsel_tpu.accel.build import build_wide_bvh, validate_wide_bvh

    positions, indices = _random_tri_soup(400, seed=31)
    lo, hi = triangle_bounds(positions, indices)
    rng = np.random.default_rng(32)
    n_rays = 96
    origins = rng.uniform(-15, 15, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n_rays,), np.inf, np.float32)

    results = {}
    for method in ("sah", "median", "midpoint"):
        bvh = build_bvh(lo, hi, use_native=False, method=method)
        assert validate_bvh(bvh, lo, hi), method
        wide = build_wide_bvh(bvh)
        assert validate_wide_bvh(wide, lo, hi, 400), method
        (pool,) = _pool_with_method(positions, indices, method)
        t, tri, *_ = intersect_mesh(
            pool, 0, 0, jnp.asarray(origins), jnp.asarray(dirs), tmax
        )
        results[method] = np.asarray(t)
    for m in ("median", "midpoint"):
        np.testing.assert_allclose(results[m], results["sah"], rtol=1e-5)


def _pool_with_method(positions, indices, method):
    from tinsel_tpu.accel.build import BLOCK_SIZE, build_wide_bvh

    lo, hi = triangle_bounds(positions, indices)
    bvh = build_bvh(lo, hi, use_native=False, method=method)
    wide = build_wide_bvh(bvh)
    v = positions[indices[wide.perm_padded]]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    areas = np.where(
        wide.real_mask,
        0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
        ),
        0.0,
    )
    cdf = np.cumsum(areas) / areas.sum()

    comps = [v[:, j, i] for j in range(3) for i in range(3)]
    n_blocks = v.shape[0] // BLOCK_SIZE
    blocks = np.zeros((n_blocks, BLOCK_SIZE * 12), np.float32)
    for g, comp in enumerate(comps):
        blocks[:, BLOCK_SIZE * g : BLOCK_SIZE * (g + 1)] = comp.reshape(
            n_blocks, BLOCK_SIZE
        )

    def planes9(a, b, c):
        cols = []
        for arr in (a, b, c):
            cols.extend(
                jnp.asarray(np.ascontiguousarray(arr[:, i]), jnp.float32)
                for i in range(3)
            )
        return tuple(cols)

    pool = MeshPool(
        node_rows=jnp.asarray(wide.node_rows),
        block_rows=jnp.asarray(blocks),
        tri_cdf=jnp.asarray(cdf, jnp.float32),
        tri_planes=planes9(v[:, 0], v[:, 1], v[:, 2]),
        nrm_planes=planes9(n, n, n),
    )
    return (pool,)


def test_native_wide_collapse_matches_python():
    """The C++ wide-BVH collapse must be bit-identical to the NumPy one."""
    from tinsel_tpu.accel.build import build_wide_bvh
    from tinsel_tpu.scene.procedural import sphere

    m = sphere(1.0, 48, 96)  # ~9k tris: above the native threshold
    lo, hi = triangle_bounds(m.positions, m.indices)
    bvh = build_bvh(lo, hi)
    wp = build_wide_bvh(bvh, use_native=False)
    wn = build_wide_bvh(bvh, use_native=True)
    np.testing.assert_array_equal(
        wp.node_rows.view(np.uint32), wn.node_rows.view(np.uint32)
    )
    np.testing.assert_array_equal(wp.perm_padded, wn.perm_padded)
    np.testing.assert_array_equal(wp.real_mask, wn.real_mask)
    np.testing.assert_allclose(wp.root_lower, wn.root_lower)
