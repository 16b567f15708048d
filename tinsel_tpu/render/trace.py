"""Scene-level closest-hit and shadow tracing.

TPU-first replacement for the reference's two-level traversal
(render.cpp:17-99 Trace + QueryBVH over the top-level primitive BVH): the
primitive table in every shipped scene is tiny (< 100 rows), so the top level
is a *vectorized brute-force sweep* — every ray tests every primitive with
masks, which is branch-free VPU work and faster on a lockstep machine than a
per-ray top-level tree walk. Mesh primitives recurse into the shared
MeshPool BVH (accel/traverse.py) with the ray transformed to local space and
the running closest-t passed as the truncation bound, mirroring
intersection.h:984-1013 (including smooth-normal interpolation with the
geometric-side fixup).

Motion blur: the primitive transform is interpolated at each ray's time
inside the intersection, exactly like intersection.h:953.
"""

from __future__ import annotations

MESH_VERTEX_GRADS = False  # gradient flow INTO mesh vertex/normal tables.
# Default off: the vertex gathers' backward is a scatter-add with massive
# index collisions (every ray hitting one quad accumulates into the same
# 9 rows), measured as a dominant term of the 5.4x backward/forward ratio
# on the cornell bench. Transform/material/emission/camera gradients are
# unaffected (they flow through the instance transform and shading chain,
# not the vertex tables). Flip on for mesh-vertex-level optimization.

import dataclasses

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..accel.traverse import intersect_mesh, intersect_mesh_any
from ..core.math import (
    Transform,
    face_forward,
    dot,
    interpolate_transform,
    inverse_transform_point,
    inverse_transform_vector,
    quat_rotate,
    safe_normalize,
)
from ..geometry.intersect import (
    intersect_ray_plane,
    intersect_ray_sphere,
    intersect_ray_tri,
)
from ..scene.model import MESH, PLANE, SPHERE, SceneFlat

INF = float("inf")  # Python literal: an import-time device scalar closed
# over in jit hits a catastrophic constant path on TPU (measured 3000x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    t: jax.Array  # (R,) +inf on miss
    prim: jax.Array  # (R,) i32, -1 on miss
    normal: jax.Array  # (R, 3) shading normal, face-forwarded to -ray dir


STATIC_TRANSFORM_HOIST = True  # skip the per-lane lerp for host-static
# prims (start == end). Gradient caveat (ADVICE r4): the hoist routes the
# whole transform gradient to start_* and zeroes end_* — correct for the
# scene (start == end parameterize the same transform) but a surprise if
# you optimize end_* from a statically-initialized scene. Set False to
# keep the (1-t)/t lerp split so end_* gradients flow.


def prim_transform(scene: SceneFlat, i: int, times):
    """Interpolated transform of primitive i at per-ray times (R,).

    Static primitives (host-known start == end, PrimStatic.motion False)
    skip the per-lane lerp/nlerp entirely and return the start transform
    unbatched — it broadcasts against (R, ...) downstream. Gradient note:
    for static prims the transform gradient then flows only to the
    start_* parameters (end_* get zero) instead of a (1-t̄)/t̄ lerp split
    of the same total; with start == end the two parameterizations
    describe the same scene and tests treat start_* as the knob. Flip
    STATIC_TRANSFORM_HOIST off to restore end_* gradients."""
    start = Transform(
        p=scene.prims.start_p[i], q=scene.prims.start_q[i], s=scene.prims.start_s[i]
    )
    if STATIC_TRANSFORM_HOIST and not scene.prim_static[i].motion:
        return start
    end = Transform(
        p=scene.prims.end_p[i], q=scene.prims.end_q[i], s=scene.prims.end_s[i]
    )
    return interpolate_transform(start, end, times)


def _prim_transforms_batched(scene: SceneFlat, idxs, times):
    """(I, R)-batched interpolated transforms of primitives `idxs` — one
    set of ops regardless of instance count, so compile time stays flat in
    the number of primitives (an unrolled per-instance transform chain was
    measured to scale XLA compile time linearly in mesh count)."""
    import numpy as _np

    sel = _np.asarray(idxs, _np.int32)
    start = Transform(
        p=scene.prims.start_p[sel][:, None, :],
        q=scene.prims.start_q[sel][:, None, :],
        s=scene.prims.start_s[sel][:, None],
    )
    if STATIC_TRANSFORM_HOIST and not any(
        scene.prim_static[i].motion for i in idxs
    ):
        # all-static group: the (I, 1, ...) start transform broadcasts
        # against (I, R, ...) downstream — no per-lane interp (see
        # prim_transform; measured in benchmarks/r9_static_hoist note)
        return start
    end = Transform(
        p=scene.prims.end_p[sel][:, None, :],
        q=scene.prims.end_q[sel][:, None, :],
        s=scene.prims.end_s[sel][:, None],
    )
    return interpolate_transform(start, end, times[None, :])


def _mesh_partition(scene: SceneFlat):
    """Static partition of primitives:
    - tiny: mesh prims whose (padded) triangle count fits one block —
      grouped by pool segment and intersected by the brute broadcast sweep
      (an area-light quad never pays a traversal loop);
    - big: ALL other mesh prims as one flat instance list — they trace in
      a SINGLE batched traversal call with per-ray vector sub-BVH offsets,
      so a 48-mesh scene compiles ONE traversal subgraph, not 48 (the
      reference's two-level scene BVH, intersection.h:751-799, expressed
      as instance batching);
    - others: spheres/planes.
    """
    from ..accel.build import BLOCK_SIZE

    tiny_groups: dict = {}
    big = []
    others = []
    for i, ps in enumerate(scene.prim_static):
        if ps.type == MESH:
            if ps.mesh.num_tris <= BLOCK_SIZE:
                k = (ps.mesh.node_offset, ps.mesh.tri_offset)
                tiny_groups.setdefault(k, []).append(i)
            else:
                big.append(i)
        else:
            others.append(i)
    return tiny_groups, big, others


INSTANCE_TOPK = 4  # candidate instances traversed per shortlist round
INSTANCE_TOPK_MIN = 12  # shortlist rounds engage above this instance count
# (below it the plain (I*R) batch is cheaper than the round machinery)

COHERENCE_SORT = False  # per-instance octant+origin-Morton argsort of
# big-mesh traversal lanes before tiling (r3 VERDICT #2 / r5 #4).
# Measured-and-REJECTED as a default on device (benchmarks/
# r11_coherence.py, interleaved): envmesh 9.93 -> 6.41 spp/s, probemesh
# 5.89 -> 4.90 — the 262k-lane argsort + permutes cost more than bounce
# -ray coherence buys, and the sorted order still can't tame diffuse
# union inflation (directions diverge within an octant). Kept opt-in.
PACKET_TRACE_G = None  # shared-walk packet width (accel.packets) for
# scene big-mesh traversals of lanes the caller marks COHERENT
# (trace_closest(coherent=True) — the integrator marks bounce 0, whose
# camera lanes arrive in pixel order). Measured on device
# (benchmarks/r11_coherence.py RESULT): ALL-bounce packets lose big
# (envmesh 9.93 -> 4.20 spp/s, probemesh 5.89 -> 2.70 — diffuse-bounce
# union inflation eats the gather win exactly as r7_packet_sim.py's
# diffuse rows predict), and even bounce-0-only packets are a wash in
# FULL scenes (envmesh 10.01 -> 9.64, probemesh 5.85 -> 5.81 — the
# primary trace is a small share of frame time against mixed hit/miss
# lanes). Default None; the 2x packet win stands on traversal-bound
# workloads via intersect_mesh(packet_g=8) (BENCH bigmesh headline).
# Instance lane blocks stay g-aligned (each instance owns a contiguous
# multiple-of-R block), so per-ray offsets compose with packets.


def _coherence_perm(handles, o_l, d_l):
    """Per-instance coherence sort keys -> (I, R) argsort permutation.
    Key = direction octant (3 high bits) | 27-bit Morton code of the
    instance-local origin quantized against the static root AABB (9 bits
    per axis). Sorting is per instance row, so instance lane blocks stay
    contiguous (a packet never spans instances)."""
    import numpy as _np

    lo = jnp.asarray(
        _np.asarray([h.root_lower for h in handles], _np.float32)
    )[:, None, :]
    hi = jnp.asarray(
        _np.asarray([h.root_upper for h in handles], _np.float32)
    )[:, None, :]
    q = jnp.clip(
        (o_l - lo) / jnp.maximum(hi - lo, 1e-20) * 511.0, 0.0, 511.0
    ).astype(jnp.int32)

    def spread(x):  # 3D bit-interleave (classic Morton spread)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    m = (
        spread(q[..., 0])
        | (spread(q[..., 1]) << 1)
        | (spread(q[..., 2]) << 2)
    )
    octant = (
        (d_l[..., 0] < 0).astype(jnp.int32)
        + 2 * (d_l[..., 1] < 0).astype(jnp.int32)
        + 4 * (d_l[..., 2] < 0).astype(jnp.int32)
    )
    return jnp.argsort((octant << 27) | m, axis=1).astype(jnp.int32)


def _instance_box_entry(handles, o_l, d_l, tmax_b):
    """Top-level cull: per-instance local-space root-AABB slab test.
    handles: list of MeshHandle (static root bounds, one per instance);
    o_l/d_l: (I, R, 3) instance-local rays. Returns ((I, R) bool 'may
    hit', (I, R) f32 entry distance tn, +inf where missed). Rays failing
    the test get tmax 0 in that instance's traversal copy — a one-step
    exit, so camera-coherent tiles skip whole instances; the entry
    distance orders the shortlist rounds (the TPU form of the reference's
    near-child-first top-level scene BVH, intersection.h:751-799)."""
    import numpy as _np

    lo = jnp.asarray(
        _np.asarray([h.root_lower for h in handles], _np.float32)
    )[:, None, :]
    hi = jnp.asarray(
        _np.asarray([h.root_upper for h in handles], _np.float32)
    )[:, None, :]
    # zero direction components nudged to +/-tiny so an on-bound origin
    # yields 0 * huge = 0, not 0 * inf = NaN (false cull); matches
    # accel.traverse._safe_rcp3
    eps = 1e-30
    rd = 1.0 / jnp.where(jnp.abs(d_l) < eps, jnp.where(d_l < 0, -eps, eps), d_l)
    t0 = (lo - o_l) * rd
    t1 = (hi - o_l) * rd
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    tn = jnp.maximum(tn, 0.0)
    may = (tn <= tf) & (tn < tmax_b)
    return may, jnp.where(may, tn, INF)


def _instance_box_mask(handles, o_l, d_l, tmax_b):
    return _instance_box_entry(handles, o_l, d_l, tmax_b)[0]


def _shortlist_candidates(work, k):
    """Pick the k nearest-entry instances per ray from the (I, R) tn
    table `work` (visited/missed entries +inf). Returns ((k, R) i32
    instance ids, (k, R) f32 their tn, updated work with picks +inf)."""
    ids, tns = [], []
    for _ in range(k):
        j = jnp.argmin(work, axis=0).astype(jnp.int32)  # (R,)
        tns.append(jnp.take_along_axis(work, j[None, :], axis=0)[0])
        ids.append(j)
        work = jnp.where(
            jnp.arange(work.shape[0], dtype=jnp.int32)[:, None] == j[None, :],
            INF, work,
        )
    return jnp.stack(ids), jnp.stack(tns), work


def _instance_rounds(scene, o_l, d_l, tn, best_t0, noff_t, toff_t,
                     stack_slots):
    """tn-ordered top-k instance traversal rounds (closest hit). All
    inputs stop-gradient (the discrete search; the caller re-fits
    differentiably). o_l/d_l: (I, R, 3) local rays; tn: (I, R) box entry
    distances (+inf = culled). Returns (t (R,), tri (R,), inst (R,)).

    Measured (benchmarks/r8_instances.py, TPU v5e, capsule grid 256^2
    4spp, dispatch-free slope): shortlist 16/36/64 instances = 5.37 /
    4.24 / 4.21 spp/s (64-vs-16 degradation 1.28x, VERDICT asked <=2x);
    FORCE=brute (I*R) path = 2.55 / - / 0.54 spp/s, i.e. the rounds win
    2.1x at 16 and 7.8x at 64 instances and the scaling is now sub-linear
    (36 -> 64 is ~flat: lanes stay k*R while only the shortlist argmins
    grow with I). r5 stress past the recorded envelope (VERDICT r4 #7):
    64/256 instances = 4.20 / 3.43 spp/s — 256 costs 1.22x the
    64-instance time (target was <=1.5x); correctness at >TOPK_MIN
    counts is pinned by the instances16 golden
    (tests/test_goldens.py) on top of the equality tests."""
    k = INSTANCE_TOPK
    r = o_l.shape[1]
    noff_d = jnp.asarray(noff_t)
    toff_d = jnp.asarray(toff_t)
    cand = jnp.arange(k, dtype=jnp.int32)[:, None]

    def cond(c):
        work, t_b, tri_b, inst_b = c
        return jnp.any(work.min(axis=0) < t_b)

    def body(c):
        work, t_b, tri_b, inst_b = c
        ids, tns, work2 = _shortlist_candidates(work, k)
        o_c = jnp.take_along_axis(o_l, ids[:, :, None], axis=0)
        d_c = jnp.take_along_axis(d_l, ids[:, :, None], axis=0)
        tm_c = jnp.where(tns < t_b[None, :], t_b[None, :], 0.0)
        t_f, tri_f, *_ = intersect_mesh(
            scene.pool, noff_d[ids].reshape(-1), toff_d[ids].reshape(-1),
            o_c.reshape(k * r, 3), d_c.reshape(k * r, 3),
            tm_c.reshape(-1), stack_slots=stack_slots,
        )
        t_i = t_f.reshape(k, r)
        tri_i = tri_f.reshape(k, r)
        t_min = t_i.min(axis=0)
        closer = jnp.isfinite(t_min) & (t_min < t_b)
        ci = jnp.where(t_i == t_min[None, :], cand, jnp.int32(k))
        ci = jnp.minimum(ci.min(axis=0), k - 1)
        oh_k = cand == ci[None, :]
        inst_w = jnp.where(oh_k, ids, 0).sum(axis=0)
        tri_w = jnp.where(oh_k, tri_i, 0).sum(axis=0)
        return (
            work2,
            jnp.where(closer, t_min, t_b),
            jnp.where(closer, tri_w, tri_b),
            jnp.where(closer, inst_w, inst_b),
        )

    init = (
        tn, jnp.asarray(best_t0, jnp.float32),
        jnp.full((r,), -1, jnp.int32), jnp.zeros((r,), jnp.int32),
    )
    _, t_b, tri_b, inst_b = jax.lax.while_loop(cond, body, init)
    return t_b, tri_b, inst_b


def _instance_rounds_any(scene, o_l, d_l, tn, tmax, occ0, noff_t, toff_t,
                         stack_slots):
    """tn-ordered top-k instance rounds, occlusion form. tmax: (R,) f32
    (0 where already occluded). Returns (R,) bool occluded."""
    k = INSTANCE_TOPK
    r = o_l.shape[1]
    noff_d = jnp.asarray(noff_t)
    toff_d = jnp.asarray(toff_t)

    def cond(c):
        work, occ = c
        return jnp.any(~occ & (work.min(axis=0) < tmax))

    def body(c):
        work, occ = c
        ids, tns, work2 = _shortlist_candidates(work, k)
        o_c = jnp.take_along_axis(o_l, ids[:, :, None], axis=0)
        d_c = jnp.take_along_axis(d_l, ids[:, :, None], axis=0)
        tm_c = jnp.where(
            ~occ[None, :] & (tns < tmax[None, :]), tmax[None, :], 0.0
        )
        oc = intersect_mesh_any(
            scene.pool, noff_d[ids].reshape(-1), toff_d[ids].reshape(-1),
            o_c.reshape(k * r, 3), d_c.reshape(k * r, 3),
            tm_c.reshape(-1), stack_slots=stack_slots,
        )
        return work2, occ | oc.reshape(k, r).any(axis=0)

    _, occ = jax.lax.while_loop(cond, body, (tn, occ0))
    return occ


def trace_closest(scene: SceneFlat, origins, dirs, times,
                  coherent: bool = False) -> Hit:
    """Closest-hit over all primitives. origins/dirs (R,3), times (R,).

    coherent=True marks the batch as lane-ordered coherent (neighboring
    lanes trace neighboring rays — camera tiles); big-mesh traversals
    then use shared-walk packets (PACKET_TRACE_G). The integrator sets
    it for bounce 0 under the unrolled loop.

    Instances of one mesh are traced in ONE batched traversal: rays are
    transformed into every instance frame, the shared sub-BVH is traversed
    once over the (I*R,) batch, and the per-ray winner is a min over
    instances — the TPU answer to the reference's fused two-level stack
    with per-mesh re-transformation (render.cu:287-299). Serializing I
    traversals instead pays the loop fixed costs I times (measured 16
    capsule instances: ~10x slower than one batched traversal)."""
    r = origins.shape[0]
    best_t = jnp.full((r,), INF)
    best_prim = jnp.full((r,), -1, jnp.int32)
    best_n = jnp.zeros((r, 3), jnp.float32)
    sg = jax.lax.stop_gradient

    tiny_groups, big, others = _mesh_partition(scene)

    import numpy as _np

    # analytic primitives, batched by type: (S, R)/(P, R) broadcast tests
    # + a winner reduction (no per-primitive unrolling)
    spheres = [i for i in others if scene.prim_static[i].type == SPHERE]
    planes = [i for i in others if scene.prim_static[i].type == PLANE]

    def _merge_rows(t_rows, n_rows, ids):
        # unrolled per-row elementwise merge: rows are few (static prim
        # count) and a take_along_axis/argmin winner-select would be a
        # per-lane gather INSIDE the bounce loop (measured 2.3x on the
        # cornell forward)
        nonlocal best_t, best_prim, best_n
        for row, pid in enumerate(ids):
            t_r = t_rows[row]
            closer = jnp.isfinite(t_r) & (t_r > 0.0) & (t_r < best_t)
            best_t = jnp.where(closer, t_r, best_t)
            best_prim = jnp.where(closer, jnp.int32(pid), best_prim)
            best_n = jnp.where(closer[..., None], n_rows[row], best_n)

    if spheres:
        sel = _np.asarray(spheres, _np.int32)
        tr_b = _prim_transforms_batched(scene, spheres, times)  # (S, R)
        hit, t, n = intersect_ray_sphere(
            tr_b.p,
            scene.prims.radius[sel][:, None] * tr_b.s,
            origins[None, :, :],
            dirs[None, :, :],
        )
        _merge_rows(jnp.where(hit & (t > 0.0), t, INF), n, spheres)

    if planes:
        sel = _np.asarray(planes, _np.int32)
        hit, t, n = intersect_ray_plane(
            scene.prims.plane[sel][:, None, :],
            origins[None, :, :],
            dirs[None, :, :],
        )
        _merge_rows(jnp.where(hit & (t > 0.0), t, INF), n, planes)

    # one instance batch per tiny group (brute sweep), plus ONE batch for
    # every big-mesh primitive in the scene (vector sub-BVH offsets)
    batches = [(idxs, True) for idxs in tiny_groups.values()]
    if big:
        batches.append((big, False))

    for idxs, is_tiny in batches:
        handles = [scene.prim_static[i].mesh for i in idxs]
        n_inst = len(idxs)
        tr_b = _prim_transforms_batched(scene, idxs, times)  # (I, R)
        o_l = inverse_transform_point(tr_b, origins[None, :, :])
        d_l = inverse_transform_vector(tr_b, dirs[None, :, :])

        # Traversal is a *discrete search* for the winning triangle: run it
        # under stop_gradient (lax.while_loop has no reverse rule and
        # which-triangle-wins is piecewise constant anyway), then
        # re-evaluate the intersection differentiably at the found triangle
        # so gradients flow to vertices/transforms/ray params.
        tmax_b = jnp.broadcast_to(best_t[None, :], (n_inst, r))
        may_hit, tn = _instance_box_entry(handles, o_l, d_l, tmax_b)
        tmax_i = jnp.where(may_hit, tmax_b, 0.0)
        noff_t = _np.asarray([h.node_offset for h in handles], _np.int32)
        toff_t = _np.asarray([h.tri_offset for h in handles], _np.int32)
        ss_b = max(h.stack_slots for h in handles)
        inst_ids = jnp.arange(n_inst, dtype=jnp.int32)[:, None]
        if is_tiny or n_inst <= INSTANCE_TOPK_MIN:
            if is_tiny:
                # one shared segment: static scalar offsets keep the brute
                # sweep's static slice
                noff_b, toff_b = handles[0].node_offset, handles[0].tri_offset
            else:
                noff_b = jnp.broadcast_to(
                    jnp.asarray(noff_t)[:, None], (n_inst, r)
                ).reshape(-1)
                toff_b = jnp.broadcast_to(
                    jnp.asarray(toff_t)[:, None], (n_inst, r)
                ).reshape(-1)
            # NOTE measured-and-rejected: argsort-compacting the culled
            # (instance, ray) pairs before tiling (1.23 vs 1.45 spp/s on
            # the 16-instance scene — two 1M-lane argsorts + permutes cost
            # more than the dead tiles they remove), and growing tiles to
            # bound the serial tile count (0.38 spp/s — per-lane cost
            # rises with tile size). The plain batched call with the
            # root-box cull stands at low instance counts.
            # packets engage when the lanes are coherent: either the
            # caller says so (camera order) or the opt-in sort makes
            # them so; incoherent packets measured-and-rejected (see
            # PACKET_TRACE_G note)
            sort_on = COHERENCE_SORT and not is_tiny
            g_pk = (
                PACKET_TRACE_G
                if (coherent or sort_on) and not is_tiny
                and PACKET_TRACE_G and r % PACKET_TRACE_G == 0
                else None
            )
            o_b, d_b, tm_b = o_l, d_l, tmax_i
            perm = None
            if sort_on:
                perm = _coherence_perm(handles, sg(o_l), sg(d_l))
                pe = perm[..., None]
                o_b = jnp.take_along_axis(o_l, pe, axis=1)
                d_b = jnp.take_along_axis(d_l, pe, axis=1)
                tm_b = jnp.take_along_axis(tmax_i, perm, axis=1)
            t_f, tri_f, *_ = intersect_mesh(
                sg(scene.pool), noff_b, toff_b,
                sg(o_b.reshape(n_inst * r, 3)),
                sg(d_b.reshape(n_inst * r, 3)),
                sg(tm_b.reshape(n_inst * r)),
                num_tris=(handles[0].real_tris or handles[0].num_tris)
                if is_tiny else None,
                stack_slots=ss_b,
                packet_g=g_pk if sort_on else None,
            )
            # local t equals world t: the transform maps the ray's
            # parameter linearly (uniform scale folded into |d_l|), so
            # best_t is a valid truncation bound across primitives and
            # instances.
            t_i = t_f.reshape(n_inst, r)
            tri_i = tri_f.reshape(n_inst, r)
            if sort_on:
                # invert the per-instance sort with one scatter per field
                ii = jnp.arange(n_inst, dtype=jnp.int32)[:, None]
                t_i = jnp.zeros_like(t_i).at[ii, perm].set(t_i)
                tri_i = jnp.zeros_like(tri_i).at[ii, perm].set(tri_i)

            t_min = t_i.min(axis=0)
            inst = jnp.where(
                t_i == t_min[None, :], inst_ids, jnp.int32(n_inst)
            )
            inst = jnp.minimum(inst.min(axis=0), n_inst - 1)
            tri = jnp.where(
                inst_ids == inst[None, :], tri_i, jnp.int32(-1)
            ).max(axis=0)
        else:
            # Instance-scalable top level (VERDICT r3 #5): instead of an
            # (I*R) lane batch — linear in instance count — traverse the
            # k NEAREST-ENTRY instances per ray per round, repeating while
            # any lane's next unvisited box entry still beats its best
            # hit. Correct by construction: an excluded instance can only
            # contain the winner if its entry tn < best_t, and exactly
            # those lanes keep the loop alive; typical grids resolve in
            # one round, so the traversal lane count is k*R, not I*R
            # (the reference's scene-BVH near-first descent,
            # intersection.h:751-799, in batch form).
            t_min, tri, inst = _instance_rounds(
                scene, sg(o_l), sg(d_l), sg(tn), sg(best_t), noff_t, toff_t,
                ss_b,
            )
        hit = jnp.isfinite(t_min) & (t_min < best_t)
        onehot = (inst_ids == inst[None, :]).astype(jnp.float32)  # (I, R)

        # winning instance's local ray + rotation (differentiable selects)
        ow = (onehot[..., None] * o_l).sum(axis=0)
        dw = (onehot[..., None] * d_l).sum(axis=0)
        qw = (onehot[..., None] * tr_b.q).sum(axis=0)

        gt = jnp.asarray(toff_t)[inst] + jnp.maximum(tri, 0)
        v0, v1, v2 = scene.pool.gather_tri(gt)
        n0, n1, n2 = scene.pool.gather_normals(gt)
        if not MESH_VERTEX_GRADS:  # see module knob
            v0, v1, v2, n0, n1, n2 = map(sg, (v0, v1, v2, n0, n1, n2))
        _, t, u, v, w, n_geo = intersect_ray_tri(v0, v1, v2, ow, dw)
        t = jnp.where(hit & (tri >= 0), t, INF)
        ns = u[..., None] * n0 + v[..., None] * n1 + w[..., None] * n2
        # keep the smooth normal on the geometric side
        ns = ns * jnp.where(dot(ns, n_geo) < 0.0, -1.0, 1.0)[..., None]
        n = safe_normalize(
            quat_rotate(qw, ns), fallback=safe_normalize(quat_rotate(qw, n_geo))
        )

        prim_ids = jnp.asarray(_np.asarray(idxs, _np.int32))[inst]
        closer = hit & (t > 0.0) & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_prim = jnp.where(closer, prim_ids, best_prim)
        best_n = jnp.where(closer[..., None], n, best_n)

    best_n = face_forward(best_n, -dirs)
    # Residual checkpoint boundary: traversal outputs are tagged so the
    # integrator's remat policy (integrator.py path_trace) SAVES them in the
    # forward pass while recomputing all cheap elementwise shading in the
    # backward — re-running the BVH while_loops during the backward sweep
    # would double the dominant cost of the whole gradient step.
    name = checkpoint_name
    return Hit(
        t=name(best_t, "hit"),
        prim=name(best_prim, "hit"),
        normal=name(best_n, "hit"),
    )


def trace_any(scene: SceneFlat, origins, dirs, times, tmax) -> jax.Array:
    """Occlusion query: any primitive hit with 0 < t < tmax. (R,) bool.

    Cheaper than trace_closest for pure visibility (probe shadow rays):
    mesh traversal exits at the first intersection — an early-out the
    reference's shadow Trace (render.cpp:17-99) does not have."""
    import numpy as _np

    r = origins.shape[0]
    occ = jnp.zeros((r,), bool)
    tmax = jnp.asarray(tmax, jnp.float32)
    sg = jax.lax.stop_gradient

    tiny_groups, big, others = _mesh_partition(scene)

    spheres = [i for i in others if scene.prim_static[i].type == SPHERE]
    planes = [i for i in others if scene.prim_static[i].type == PLANE]
    if spheres:
        sel = _np.asarray(spheres, _np.int32)
        tr_b = _prim_transforms_batched(scene, spheres, times)
        hit, t, _ = intersect_ray_sphere(
            tr_b.p,
            scene.prims.radius[sel][:, None] * tr_b.s,
            origins[None, :, :],
            dirs[None, :, :],
        )
        occ = occ | (hit & (t > 0.0) & (t < tmax[None, :])).any(axis=0)
    if planes:
        sel = _np.asarray(planes, _np.int32)
        hit, t, _ = intersect_ray_plane(
            scene.prims.plane[sel][:, None, :],
            origins[None, :, :],
            dirs[None, :, :],
        )
        occ = occ | (hit & (t > 0.0) & (t < tmax[None, :])).any(axis=0)

    batches = [(idxs, True) for idxs in tiny_groups.values()]
    if big:
        batches.append((big, False))

    for idxs, is_tiny in batches:
        handles = [scene.prim_static[i].mesh for i in idxs]
        n_inst = len(idxs)
        tr_b = _prim_transforms_batched(scene, idxs, times)
        o_l = inverse_transform_point(tr_b, origins[None, :, :])
        d_l = inverse_transform_vector(tr_b, dirs[None, :, :])
        # already-occluded rays get tmax 0 -> immediate exit in every frame
        tmax_b = jnp.broadcast_to(
            jnp.where(occ, 0.0, tmax)[None, :], (n_inst, r)
        )
        may_hit, tn = _instance_box_entry(handles, o_l, d_l, tmax_b)
        tm = jnp.where(may_hit, tmax_b, 0.0).reshape(n_inst * r)
        noff_t = _np.asarray([h.node_offset for h in handles], _np.int32)
        toff_t = _np.asarray([h.tri_offset for h in handles], _np.int32)
        ss_b = max(h.stack_slots for h in handles)
        if is_tiny or n_inst <= INSTANCE_TOPK_MIN:
            if is_tiny:
                noff_b, toff_b = handles[0].node_offset, handles[0].tri_offset
            else:
                noff_b = jnp.broadcast_to(
                    jnp.asarray(noff_t)[:, None], (n_inst, r)
                ).reshape(-1)
                toff_b = jnp.broadcast_to(
                    jnp.asarray(toff_t)[:, None], (n_inst, r)
                ).reshape(-1)
            oc = intersect_mesh_any(
                sg(scene.pool), noff_b, toff_b,
                sg(o_l.reshape(n_inst * r, 3)),
                sg(d_l.reshape(n_inst * r, 3)), sg(tm),
                num_tris=(handles[0].real_tris or handles[0].num_tris)
                if is_tiny else None,
                stack_slots=ss_b,
            )
            occ = occ | oc.reshape(n_inst, r).any(axis=0)
        else:
            # shortlist rounds, occlusion form: unlike closest-hit the
            # rounds can stop at the FIRST occluder (tn order is only a
            # heuristic here); lanes stay live while unvisited boxes
            # intersect the unoccluded segment
            occ = _instance_rounds_any(
                scene, sg(o_l), sg(d_l), sg(tn),
                sg(jnp.where(occ, 0.0, tmax)), occ, noff_t, toff_t, ss_b,
            )
    # saved under the integrator's remat policy (see trace_closest)
    return checkpoint_name(occ, "hit")
