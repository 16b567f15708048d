"""Wavefront path-trace integrator: `lax.scan` over bounces, masked lanes.

This is the reference's megaloop integrator (render.cpp:230-388) re-expressed
the way its own GPU wavefront already hints (wavefront.cu:765-796 SoA path
state): path state is a structure-of-arrays over a flat ray batch, the depth
loop is a `lax.scan` whose body does

    closest-hit trace -> medium absorption -> emission MIS -> next-event
    estimation (probe + area lights) -> BSDF sample -> state update

with every per-path branch (hit/miss, light-hit termination, pdf<=0 death,
specular MIS exceptions, eta medium toggling) carried as masks. Dead lanes
idle exactly like the reference's Disabled paths (wavefront.cu:918).

Ragged-parallelism strategy (measured on TPU v5): full alive-compaction
(argsort by liveness + permute around trace) was prototyped and bought only
~10% on a half-dead 65k batch against a 524k-tri mesh — the surviving rays'
per-tile worst case dominates regardless of packing. What ships instead:
(a) per-tile early exit inside the traversal (accel/traverse.py), and
(b) a whole-bounce lax.cond skip once every lane is dead, which makes the
trailing bounces of deep scenes (furnace maxDepth 128) ~free while keeping
the scan structure reverse-differentiable.

Numerical contracts preserved: kRayEpsilon 1e-4 offsets along
FaceForward(n, dir) (render.cpp:363), MIS sample-count weighting with
kBsdfSamples = kProbeSamples = 1 (render.cpp:9-10), pdf clamp floors, Beer-
Lambert absorption exp(-sigma t) (render.cpp:272), first-bounce direct
emission, termination on explicit light hits (render.cpp:322-324), no
Russian roulette by default (opt-in via Options.rr_depth — an unbiased
extension the reference lacks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdf.disney import SPECULAR, bsdf_eval, bsdf_sample
from ..core.math import basis_from_vector, dot, face_forward, lerp
from ..scene.model import SceneFlat
from .lights import RAY_EPS, K_BSDF_SAMPLES, K_PROBE_SAMPLES, sample_lights
from .probe import probe_pdf, sky_eval
from .trace import trace_closest

from jax.ad_checkpoint import checkpoint_name

# Residuals the remat'd bounce SAVES in the forward pass (everything else
# is recomputed during the backward sweep). Names tagged in the body:
#   "hit" — BVH traversal outputs (render/trace.py) — re-running the
#           traversal while_loops in the backward would double the
#           dominant cost, so these are always saved;
#   "oh"  — the per-bounce one-hot primitive matrix;
#   "mat" — the selected per-lane material table;
#   "nee" — the next-event-estimation radiance.
# ("hit", "nee") measured best under the unrolled gradient loop (r5,
# benchmarks/grad_ab_r6.py full device sweep: u1+nee ratio 2.43 vs
# hit-only unroll 2.44 — within noise, saving NEE spares its recompute);
# under the scan loop, hit-only was best (r4, grad_sweep_r4.py).
REMAT_SAVE_NAMES: tuple = ("hit", "nee")

# Gradient-path A/B knobs (module-level like REMAT_SAVE_NAMES; flipped by
# benchmarks/grad_ab_r6.py and measured on TPU — see path_trace):
#   SCAN_SPLIT_TRANSPOSE: pass _split_transpose to the bounce scan so XLA
#     schedules the backward as independent per-iteration transposes.
#   GRAD_UNROLL: unroll the bounce loop in Python (same rematted bounce,
#     no lax.scan) — lets XLA fuse each bounce's recompute with its
#     transpose instead of round-tripping the scan carry through HBM.
# r5 DEVICE SWEEP (grad_ab_r6.py, cornell 256^2 d4 4spp, ratio vs the
# matched 10.0 ms forward): scan 2.75 / split-transpose 2.65 / unroll
# g=1 2.44 / g=2 2.52 / g=4 2.71 / u1+nee 2.43 / u4+nee 2.55.
# GRAD_UNROLL now defaults ON (the r3/r4 asks finally measured): the
# scan carry round-trip through HBM was the binding term, not the
# residual dtype — each unrolled bounce's recompute fuses with its own
# transpose, and the inter-bounce state never becomes a saved scan
# residual stream.
SCAN_SPLIT_TRANSPOSE = False
GRAD_UNROLL = True
# Bounces per remat unit when GRAD_UNROLL (1 = per-bounce like the scan;
# max_depth = one unit: the backward recomputes the whole shading chain
# once and transposes it fused, at higher live memory).
GRAD_UNROLL_GROUP = 1


def _initial_state(origins, dirs):
    r = origins.shape[0]
    f32 = jnp.float32
    return dict(
        o=origins,
        d=dirs,
        eta=jnp.ones((r,), f32),
        absorb=jnp.zeros((r, 3), f32),
        rtype=jnp.zeros((r,), jnp.int32),  # last BSDF event type
        bpdf=jnp.ones((r,), f32),  # pdf of the ray's generating BSDF sample
        thr=jnp.ones((r, 3), f32),
        rad=jnp.zeros((r, 3), f32),
        alive=jnp.ones((r,), bool),
    )


RR_MIN_Q = 0.05  # survival-probability floor (firefly guard)


def _make_bounce(scene: SceneFlat, times, key, r, rr_depth: int = 0,
                 light_sampling: str = "all"):
    """The integrator step shared by both backends (scan and while).

    rr_depth > 0 enables Russian-roulette termination from that bounce on
    — an improvement the reference explicitly lacks (render.cpp:230-388
    runs every path to maxDepth); off by default for parity. Survival
    q = clip(max throughput component, RR_MIN_Q, 1); surviving lanes
    rescale throughput by 1/q (q detached, so gradient estimates stay
    unbiased the same way the radiance estimate does)."""
    f32 = jnp.float32

    def bounce(st, i):
        kb = jax.random.fold_in(key, i)
        o, d = st["o"], st["d"]
        # bounce 0's lanes are camera rays in pixel order — a statically
        # known coherent batch when the loop is Python-unrolled (i is an
        # int); big-mesh traversal then uses shared-walk packets
        # (trace.PACKET_TRACE_G). Bounce rays stay on the per-ray walk
        # (incoherent packets measured-and-rejected, r11_coherence.py).
        coh = isinstance(i, int) and i == 0
        hit = trace_closest(scene, o, d, times, coherent=coh)
        found = hit.prim >= 0
        act_hit = st["alive"] & found
        act_miss = st["alive"] & ~found
        first = i == 0

        # ------------------------------------------------ escaped rays: sky
        if scene.probe is not None:
            sky_pdf = probe_pdf(scene.probe, d)
            ns = K_PROBE_SAMPLES + K_BSDF_SAMPLES
            c_bsdf = K_BSDF_SAMPLES / ns
            c_sky = K_PROBE_SAMPLES / ns
            w_sky = c_bsdf * st["bpdf"] / jnp.maximum(
                c_bsdf * st["bpdf"] + c_sky * sky_pdf, 1e-12
            )
            w_sky = jnp.where(first | (st["rtype"] == SPECULAR), 1.0, w_sky)
        else:
            w_sky = jnp.ones((r,), f32)
        sky = sky_eval(scene, d)
        rad = st["rad"] + jnp.where(
            act_miss[..., None], w_sky[..., None] * sky * st["thr"], 0.0
        )

        # ------------------------------------------------------- hit shading
        # one one-hot matrix per bounce drives every per-primitive lookup as
        # an exact f32 matmul: the backward is a matmul on the MXU instead
        # of a colliding scatter-add (see MaterialsFlat.select)
        idx = jnp.maximum(hit.prim, 0)
        oh = jax.nn.one_hot(idx, scene.num_prims, dtype=jnp.float32)
        oh = checkpoint_name(oh, "oh")
        ohpick = lambda a: jnp.matmul(
            oh, a, precision=jax.lax.Precision.HIGHEST
        )
        m = jax.tree.map(
            lambda x: checkpoint_name(x, "mat"), scene.materials.select_oh(oh)
        )
        in_air = st["eta"] == 1.0
        out_eta = jnp.where(in_air, m.eta, 1.0)
        out_absorb = jnp.where(in_air[..., None], m.absorption, 0.0)

        # inf-free hit distance: misses must never feed arithmetic, or their
        # NaN/inf poisons *gradients* through jnp.where (the where-grad trap)
        t_safe = jnp.where(found, hit.t, 0.0)

        thr = jnp.where(
            act_hit[..., None],
            st["thr"] * jnp.exp(-st["absorb"] * t_safe[..., None]),
            st["thr"],
        )

        p = o + d * t_safe[..., None]
        n = hit.normal
        if scene.has_bump:  # static gate: bump-free scenes compile nothing
            from .bump import bump_normal

            bmp = ohpick(scene.prim_bump)
            n = bump_normal(n, p, bmp[..., 0], bmp[..., 1])

        # emission: direct at depth 0; MIS-weighted on BSDF rays after
        lsamp = scene.prim_light_samples[idx]  # int lookup: gather, no grad
        s_t = lerp(
            ohpick(scene.prims.start_s), ohpick(scene.prims.end_s), times
        )
        area = ohpick(scene.prim_local_area) * s_t * s_t
        has_area = area > 0.0
        cos_term = jnp.clip(dot(-d, n), 1e-3, 1.0)
        light_pdf = t_safe * t_safe / jnp.maximum(area * cos_term, 1e-12)
        if light_sampling == "power":
            # NEE picked ONE light with pmf; its pdf for this direction is
            # pmf * area-pdf, one sample per strategy (coefficients cancel).
            # Non-selected lights have pmf 0 -> weight 1 automatically.
            pmf_hit = ohpick(scene.light_pmf)
            w_em = st["bpdf"] / jnp.maximum(
                st["bpdf"] + pmf_hit * light_pdf, 1e-12
            )
        else:
            ns_e = lsamp.astype(f32) + K_BSDF_SAMPLES
            c_b = K_BSDF_SAMPLES / ns_e
            c_l = lsamp.astype(f32) / ns_e
            w_em = c_b * st["bpdf"] / jnp.maximum(
                c_b * st["bpdf"] + c_l * light_pdf, 1e-12
            )
        w_em = jnp.where(st["rtype"] == SPECULAR, 1.0, w_em)
        # depth 0 -> weight 1; depth > 0 with zero area -> no emission pickup
        # (a BSDF ray can only have been light-sampled if the light has area)
        add_em = act_hit & (first | has_area)
        rad = rad + jnp.where(
            add_em[..., None],
            jnp.where(first, 1.0, w_em)[..., None] * thr * m.emission,
            0.0,
        )

        # next-event estimation
        nee = checkpoint_name(
            sample_lights(
                scene, m, st["eta"], out_eta, p, n, -d, times,
                jax.random.fold_in(kb, 1), light_sampling=light_sampling,
            ),
            "nee",
        )
        rad = rad + jnp.where(act_hit[..., None], thr * nee, 0.0)

        # terminate on explicit light sources
        alive = act_hit & (lsamp == 0)

        # BSDF sampling for the next bounce
        u_axis, v_axis = basis_from_vector(n)
        l, new_pdf, ev = bsdf_sample(
            m, st["eta"], out_eta, u_axis, v_axis, n, -d,
            jax.random.fold_in(kb, 2),
        )
        alive = alive & (new_pdf > 0.0)
        f_val = bsdf_eval(m, st["eta"], out_eta, n, -d, l)

        trans_side = dot(l, n) <= 0.0
        eta = jnp.where(alive & trans_side, out_eta, st["eta"])
        absorb = jnp.where((alive & trans_side)[..., None], out_absorb, st["absorb"])

        thr_next = thr * f_val * (
            jnp.abs(dot(n, l)) / jnp.maximum(new_pdf, 1e-12)
        )[..., None]
        thr = jnp.where(alive[..., None], thr_next, thr)

        if rr_depth > 0:
            q = jnp.clip(
                jax.lax.stop_gradient(thr.max(axis=-1)), RR_MIN_Q, 1.0
            )
            u_rr = jax.random.uniform(jax.random.fold_in(kb, 3), (r,))
            # applies to the NEXT bounce's ray; jnp.bool_ because i may be
            # a STATIC python int under the unrolled loop (python ~True
            # is -2, which would silently int-promote `alive`)
            roulette = jnp.bool_(i + 1 >= rr_depth)
            alive = alive & (~roulette | (u_rr < q))
            thr = jnp.where(
                (alive & roulette)[..., None], thr / q[..., None], thr
            )

        o = jnp.where(alive[..., None], p + face_forward(n, l) * RAY_EPS, o)
        d = jnp.where(alive[..., None], l, d)

        new_state = dict(
            o=o,
            d=d,
            eta=eta,
            absorb=absorb,
            rtype=jnp.where(alive, ev, st["rtype"]),
            bpdf=jnp.where(alive, new_pdf, st["bpdf"]),
            thr=thr,
            rad=rad,
            alive=alive,
        )
        return new_state

    return bounce


def path_trace(scene: SceneFlat, origins, dirs, times, max_depth: int, key,
               rr_depth: int = 0, light_sampling: str = "all",
               dead_bounce_skip: bool = True,
               grad_unroll: int | None = None):
    """Trace a batch of paths; returns (R, 3) radiance. The differentiable
    backend: `lax.scan` over bounces (reverse-mode needs the static loop
    structure), with a whole-bounce cond skip once every lane is dead so
    trailing bounces of deep scenes (furnace maxDepth 128) are ~free.

    dead_bounce_skip=False drops that cond: under reverse-mode AD the
    cond branch is an opaque remat unit — partial eval cannot DCE the
    stop-gradient traversal/NEE sweeps out of the rematted recompute
    through a branch boundary, so the backward re-executes them all.
    Gradient callers (diff/gradients.py) disable the skip; forward
    rendering keeps it (deep scenes profit, nothing differentiates).

    grad_unroll: bounce-loop structure for gradient callers. None = use
    the module knobs (GRAD_UNROLL/GRAD_UNROLL_GROUP, the A/B surface);
    0 = lax.scan; n >= 1 = Python-unrolled bounces with a rematted
    checkpoint every n bounces (see the knob comments above). Values are
    identical across all settings (loss bit-equal; grads to f32
    accumulation-order noise, tests/test_gradients.py).

    origins/dirs: (R, 3); times: (R,); key: single threefry key (all draws
    derive from it by fold_in, independent across lanes by shape).
    """
    if grad_unroll is None:
        grad_unroll = GRAD_UNROLL_GROUP if GRAD_UNROLL else 0
    r = origins.shape[0]
    bounce = _make_bounce(scene, times, key, r, rr_depth, light_sampling)
    state = _initial_state(origins, dirs)

    def bounce_or_skip(st, i):
        if not dead_bounce_skip:
            return bounce(st, i), None
        return (
            jax.lax.cond(
                jnp.any(st["alive"]) | (i == 0),
                lambda s: bounce(s, i),
                lambda s: s,
                st,
            ),
            None,
        )

    # Rematerialized bounce: the forward saves ONLY the traversal results
    # (tagged 'hit' in render/trace.py) plus the scan carry; the backward
    # recomputes the elementwise shading instead of loading its residuals.
    # Measured on TPU v5 (cornell 256^2 d4 material grads, r3
    # dispatch-free slope method): un-remat'd fwd+bwd is ~10.8x the
    # matched forward; this hit-save policy brings it to ~4.7x at 4 spp
    # per chunk (r2's "~2.6x" was measured with the session-variable
    # 14-28 ms tunnel dispatch inflating the forward baseline). Wider
    # save sets (oh/mat/nee) measure within noise of hit-only
    # (benchmarks/grad_sweep_r4.py). The residual gap is HBM traffic:
    # compiled cost analysis reads 14.6 GB in the backward vs 2.2 GB
    # forward at equal rays. Forward-only callers are unaffected (remat
    # changes nothing without a cotangent). The checkpoint must wrap the
    # cond, not sit inside it (the branches would disagree on residual
    # signatures).
    raw_step = bounce_or_skip
    if REMAT_SAVE_NAMES is not None:  # None = no checkpoint (A/B knob)
        bounce_or_skip = jax.checkpoint(
            bounce_or_skip,
            policy=jax.checkpoint_policies.save_only_these_names(
                *REMAT_SAVE_NAMES
            ),
        )

    if grad_unroll:
        g = max(1, grad_unroll)
        if g == 1:
            # the bounce index stays a STATIC python int through the
            # checkpoint (static_argnums) so bounce 0 can statically mark
            # its camera lanes coherent (packet traversal hint)
            step1 = raw_step
            if REMAT_SAVE_NAMES is not None:
                step1 = jax.checkpoint(
                    raw_step,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *REMAT_SAVE_NAMES
                    ),
                    static_argnums=(1,),
                )
            for i in range(max_depth):
                state, _ = step1(state, i)
            return state["rad"]

        def group(st, idxs):
            for j in idxs:
                st, _ = raw_step(st, j)
            return st

        if REMAT_SAVE_NAMES is not None:
            group = jax.checkpoint(
                group,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *REMAT_SAVE_NAMES
                ),
                static_argnums=(1,),
            )
        for i in range(0, max_depth, g):
            state = group(state, tuple(range(i, min(i + g, max_depth))))
        return state["rad"]
    state, _ = jax.lax.scan(
        bounce_or_skip, state, jnp.arange(max_depth),
        _split_transpose=SCAN_SPLIT_TRANSPOSE,
    )
    return state["rad"]


def path_trace_while(scene: SceneFlat, origins, dirs, times, max_depth: int,
                     key, rr_depth: int = 0, light_sampling: str = "all"):
    """Megakernel-style backend: one `lax.while_loop` over bounces that
    exits the moment every lane dies — the analog of the reference's GPU
    megakernel per-thread depth loop (render.cu:725-883), one of its
    interchangeable backends behind the Renderer interface (render.h:75-79).

    Shares `_make_bounce` with the scan backend, so results are identical
    at equal seeds. Forward-only: while_loop has no reverse rule — use
    path_trace (scan) for gradients."""
    r = origins.shape[0]
    bounce = _make_bounce(scene, times, key, r, rr_depth, light_sampling)
    state = _initial_state(origins, dirs)

    def cond(carry):
        st, i = carry
        return (i < max_depth) & (jnp.any(st["alive"]) | (i == 0))

    def body(carry):
        st, i = carry
        return bounce(st, i), i + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state["rad"]


def trace_normals(scene: SceneFlat, origins, dirs, times):
    """Normals debug view (render.cpp:494-515): n*0.5+0.5, black on miss."""
    hit = trace_closest(scene, origins, dirs, times, coherent=True)
    n = hit.normal
    if scene.has_bump:  # show the shading normal the integrator uses
        from .bump import bump_normal

        t_safe = jnp.where(hit.prim >= 0, hit.t, 0.0)
        bmp = scene.prim_bump[jnp.maximum(hit.prim, 0)]
        n = bump_normal(
            n, origins + dirs * t_safe[..., None], bmp[..., 0], bmp[..., 1]
        )
    n = n * 0.5 + 0.5
    return jnp.where((hit.prim >= 0)[..., None], n, 0.0)


def trace_complexity(scene: SceneFlat, origins, dirs, times, scale: float = 256.0):
    """Traversal-cost heat view — implements the `eComplexity` mode the
    reference reserves but leaves empty (render.h:45, render.cpp:516-519).
    Cost = total BVH node visits (+1 per analytic primitive test), mapped
    through an HSV blue->red ramp."""
    from ..accel.traverse import traversal_cost
    from ..core.color import hsv_to_rgb
    from ..core.math import inverse_transform_point, inverse_transform_vector
    from ..scene.model import MESH
    from .trace import prim_transform

    r = origins.shape[0]
    cost = jnp.zeros((r,), jnp.float32)
    for i, ps in enumerate(scene.prim_static):
        if ps.type == MESH:
            tr = prim_transform(scene, i, times)
            o_l = inverse_transform_point(tr, origins)
            d_l = inverse_transform_vector(tr, dirs)
            h = ps.mesh
            cost = cost + traversal_cost(
                scene.pool, h.node_offset, h.tri_offset, o_l, d_l,
                jnp.full((r,), jnp.inf), num_tris=h.num_tris,
                stack_slots=h.stack_slots,
            )
        else:
            cost = cost + 1.0
    x = jnp.clip(cost / scale, 0.0, 1.0)
    return hsv_to_rgb((1.0 - x) * 2.0 / 3.0, jnp.ones_like(x), jnp.ones_like(x))
