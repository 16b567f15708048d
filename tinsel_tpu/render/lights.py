"""Next-event estimation: probe + area-light sampling with MIS.

Functional parity with SampleLights (render.cpp:103-227):
 - HDR-probe sample + shadow ray + balance-heuristic weight with
   sample-count coefficients (render.cpp:107-144)
 - per-light area sampling (sphere surface / mesh triangle via area CDF,
   intersection.h:855-904), visibility with the distance tolerance that
   enables portal sampling (render.cpp:175-185), area->solid angle pdf
   conversion, pdf floor Max(1e-3, lightPdf) (render.cpp:217).

Shadow-ray visibility (r5): the default resolves area-light visibility
with a SEGMENT occlusion query — trace_any up to dist - kTolerance —
and uses the *sampled* light's emission and distance. The reference
instead traces a full closest hit and accepts when |t - dist| <= tol,
taking the emission of whatever was hit (render.cpp:172-218). The two
estimators agree except when a ray epsilon-misses its own light or two
emitters overlap within the tolerance; the occlusion form halves the
NEE stage cost (trace_any early-exits, skips the hit refit + one-hot
emission gather) and saves ONE BOOL of remat residual per shadow ray
instead of (t, prim, normal) — measured on TPU, see benchmarks/
r10_nee_ab.py. Set NEE_CLOSEST_SHADOW=True for the bit-level reference
estimator (the parity suite passes under both).

All loops over lights are static (unrolled per scene topology); per-lane
work is fully masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdf.disney import bsdf_eval, bsdf_pdf
from ..core.math import (
    dot,
    face_forward,
    length_sq,
    safe_normalize,
    transform_point,
    transform_vector,
)
from ..core.sampling import uniform_sample_sphere, uniform_sample_triangle
from ..core.search import lower_bound
from ..scene.model import MESH, SPHERE, SceneFlat
from .probe import probe_sample_uniforms
from .trace import prim_transform, trace_any, trace_closest

RAY_EPS = 1e-4  # kRayEpsilon, render.cpp:11
K_BSDF_SAMPLES = 1.0
K_PROBE_SAMPLES = 1.0
PORTAL_TOL = 1e-2  # kTolerance, render.cpp:182
NEE_CLOSEST_SHADOW = False  # True = reference estimator: closest hit,
# |t - dist| <= tol acceptance, emission of the hit prim (see module
# docstring). False = segment occlusion query (default, faster fwd+bwd).


def primitive_sample(scene: SceneFlat, j: int, times, key):
    """Uniform-area sample on light primitive j at per-ray times.

    Returns (pos (R,3), normal (R,3), area (R,)) in world space; area is the
    world-space surface area at the interpolated scale (so the pdf matches
    the true sampled density — the reference's s¹ mesh area and unscaled
    sphere area are corrected to s²).
    """
    ps = scene.prim_static[j]
    tr = prim_transform(scene, j, times)
    shape = times.shape
    u0 = jax.random.uniform(jax.random.fold_in(key, 0), shape)
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 2), shape)

    if ps.type == SPHERE:
        radius = scene.prims.radius[j]
        d = uniform_sample_sphere(u0, u1)
        pos = transform_point(tr, d * radius)
        normal = safe_normalize(pos - tr.p)
        area = 4.0 * jnp.pi * (radius * tr.s) ** 2
    elif ps.type == MESH:
        h = ps.mesh
        tri = lower_bound(scene.pool.tri_cdf, jnp.full(shape, h.tri_offset, jnp.int32), h.num_tris, u0)
        tri = jnp.clip(tri, h.tri_offset, h.tri_offset + h.num_tris - 1)
        bu, bv = uniform_sample_triangle(u1, u2)
        bw = 1.0 - bu - bv
        a, b, c = scene.pool.gather_tri(tri)
        n0, n1, n2 = scene.pool.gather_normals(tri)
        from .trace import MESH_VERTEX_GRADS
        if not MESH_VERTEX_GRADS:  # colliding scatter-add backward;
            # light position/size grads flow via the transform (tr)
            import jax.lax as _lax
            a, b, c, n0, n1, n2 = map(
                _lax.stop_gradient, (a, b, c, n0, n1, n2)
            )
        pos_l = bu[..., None] * a + bv[..., None] * b + bw[..., None] * c
        nrm_l = bu[..., None] * n0 + bv[..., None] * n1 + bw[..., None] * n2
        pos = transform_point(tr, pos_l)
        normal = safe_normalize(transform_vector(tr, nrm_l))
        area = h.area * tr.s * tr.s
    else:
        raise ValueError("plane primitives cannot be area lights")

    return pos, normal, area * jnp.ones(shape, jnp.float32)


def sample_lights(scene: SceneFlat, mat, eta_i, eta_o, p, n, wo, times, key,
                  light_sampling: str = "all"):
    """Direct lighting at surface points p with shading normals n.

    mat: per-lane material record (MaterialsFlat.select of the hit prims).
    Returns (R, 3) radiance (NOT multiplied by throughput).

    light_sampling="all" traces one shadow ray per light (reference
    parity, render.cpp:175-227); "power" picks ONE light per lane from
    the power-proportional CDF (SceneFlat.light_pmf) and traces a single
    shadow ray — O(1) traversals per bounce regardless of light count,
    unbiased, with the emission-hit MIS weight matched in the integrator.
    """
    total = jnp.zeros_like(p)
    shape = times.shape

    draw = 0
    if scene.probe is not None:
        kp = jax.random.fold_in(key, draw)
        draw += 1
        r1 = jax.random.uniform(jax.random.fold_in(kp, 0), shape)
        r2 = jax.random.uniform(jax.random.fold_in(kp, 1), shape)
        wi, sky_color, sky_pdf = probe_sample_uniforms(scene.probe, r1, r2)

        shadow_o = p + face_forward(n, wi) * RAY_EPS
        # probe rays only need visibility -> any-hit with early exit
        visible = ~trace_any(
            scene, shadow_o, wi, times, jnp.full(shape, jnp.inf, jnp.float32)
        )

        bpdf = bsdf_pdf(mat, eta_i, eta_o, n, wo, wi)
        f = bsdf_eval(mat, eta_i, eta_o, n, wo, wi)
        ns = K_PROBE_SAMPLES + K_BSDF_SAMPLES
        c_bsdf = K_BSDF_SAMPLES / ns
        c_sky = K_PROBE_SAMPLES / ns
        denom = c_bsdf * bpdf + c_sky * sky_pdf
        weight = c_sky * sky_pdf / jnp.maximum(denom, 1e-12)
        contrib = (
            (weight * jnp.abs(dot(wi, n)) / jnp.maximum(sky_pdf, 1e-12))[..., None]
            * sky_color
            * f
        )
        ok = visible & (bpdf > 0.0) & (sky_pdf > 0.0) & (weight > 0.0)
        total = total + jnp.where(ok[..., None], contrib, 0.0) / K_PROBE_SAMPLES

    if light_sampling == "power" and scene.light_indices:
        li = list(scene.light_indices)
        kl = jax.random.fold_in(key, draw)
        draw += 1
        pmf_l = jnp.stack([scene.light_pmf[j] for j in li])  # (L,)
        cdf = jnp.cumsum(pmf_l)
        u = jax.random.uniform(jax.random.fold_in(kl, 999), shape)
        sel = jnp.clip(
            jnp.searchsorted(cdf, u, side="right"), 0, len(li) - 1
        )
        # evaluate every light's candidate sample (cheap elementwise /
        # CDF math), select the chosen one per lane; the expensive part —
        # the shadow traversal — runs ONCE
        pos = jnp.zeros_like(p)
        nrm = jnp.zeros_like(p)
        area = jnp.zeros(shape, jnp.float32)
        pmf_sel = jnp.zeros(shape, jnp.float32)
        for jj, j in enumerate(li):
            pj, nj, aj = primitive_sample(
                scene, j, times, jax.random.fold_in(kl, jj)
            )
            m = sel == jj
            pos = jnp.where(m[..., None], pj, pos)
            nrm = jnp.where(m[..., None], nj, nrm)
            area = jnp.where(m, aj, area)
            pmf_sel = jnp.where(m, pmf_l[jj], pmf_sel)

        wi_un = pos - p
        dist = jnp.sqrt(jnp.maximum(length_sq(wi_un), 1e-20))
        wi = wi_un / dist[..., None]
        shadow_o = p + face_forward(n, wi) * RAY_EPS
        if NEE_CLOSEST_SHADOW:
            sh = trace_closest(scene, shadow_o, wi, times)
            hit_any = sh.prim >= 0
            t = jnp.where(hit_any, sh.t, 0.0)
            accept = hit_any & (jnp.abs(t - dist) <= PORTAL_TOL)
            light_t = t
            oh_sh = jax.nn.one_hot(
                jnp.maximum(sh.prim, 0), scene.num_prims, dtype=jnp.float32
            )
            emission = jnp.matmul(
                oh_sh, scene.materials.emission,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            # segment occlusion + per-lane select of the SAMPLED light's
            # emission (static unrolled selects; see module docstring)
            occ = trace_any(
                scene, shadow_o, wi, times,
                jnp.maximum(dist - PORTAL_TOL, 0.0),
            )
            accept = ~occ
            light_t = dist
            emission = jnp.zeros_like(p)
            for jj, j in enumerate(li):
                emission = jnp.where(
                    (sel == jj)[..., None], scene.materials.emission[j],
                    emission,
                )
        nl = jnp.abs(dot(nrm, wi))
        accept = accept & (nl >= 1e-6) & (pmf_sel > 0.0)

        # selection pmf folds into the NEE pdf; one sample per strategy
        # -> balance-heuristic coefficients are 1/2 each and cancel
        light_pdf = pmf_sel * (light_t * light_t) / jnp.maximum(
            area * nl, 1e-12
        )
        bpdf = bsdf_pdf(mat, eta_i, eta_o, n, wo, wi)
        f = bsdf_eval(mat, eta_i, eta_o, n, wo, wi)
        accept = accept & (bpdf > 0.0)
        weight = light_pdf / jnp.maximum(bpdf + light_pdf, 1e-12)
        contrib = (
            (weight * jnp.abs(dot(wi, n)) / jnp.maximum(light_pdf, 1e-3))[..., None]
            * f
            * emission
        )
        total = total + jnp.where(accept[..., None], contrib, 0.0)
        return total

    for j in scene.light_indices:
        n_samples = scene.prim_static[j].light_samples
        lj = jnp.zeros_like(p)
        for s in range(n_samples):
            ks = jax.random.fold_in(jax.random.fold_in(key, draw), s)
            light_pos, light_nrm, area = primitive_sample(scene, j, times, ks)

            wi_un = light_pos - p
            dist = jnp.sqrt(jnp.maximum(length_sq(wi_un), 1e-20))
            wi = wi_un / dist[..., None]

            shadow_o = p + face_forward(n, wi) * RAY_EPS
            if NEE_CLOSEST_SHADOW:
                # reference estimator: closest hit, tolerance acceptance,
                # emission of the *hit* prim (render.cpp:172-218)
                sh = trace_closest(scene, shadow_o, wi, times)
                hit_any = sh.prim >= 0
                t = jnp.where(hit_any, sh.t, 0.0)
                accept = hit_any & (jnp.abs(t - dist) <= PORTAL_TOL)
                light_t = t
                # one-hot matmul, not a gather: emission carries material
                # gradients; gather backward is a colliding scatter-add
                oh_sh = jax.nn.one_hot(
                    jnp.maximum(sh.prim, 0), scene.num_prims,
                    dtype=jnp.float32,
                )
                emission = jnp.matmul(
                    oh_sh, scene.materials.emission,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                # segment occlusion: anything strictly before the sampled
                # point (minus the portal tolerance) blocks; the sampled
                # light's own surface at ~dist does not. Emission is the
                # sampled light's row — a static differentiable slice
                occ = trace_any(
                    scene, shadow_o, wi, times,
                    jnp.maximum(dist - PORTAL_TOL, 0.0),
                )
                accept = ~occ
                light_t = dist
                emission = jnp.broadcast_to(
                    scene.materials.emission[j], p.shape
                )

            nl = jnp.abs(dot(light_nrm, wi))
            accept = accept & (nl >= 1e-6)

            light_pdf = (light_t * light_t) / jnp.maximum(area * nl, 1e-12)

            bpdf = bsdf_pdf(mat, eta_i, eta_o, n, wo, wi)
            f = bsdf_eval(mat, eta_i, eta_o, n, wo, wi)
            accept = accept & (bpdf > 0.0)

            ns_ = n_samples + K_BSDF_SAMPLES
            c_bsdf = K_BSDF_SAMPLES / ns_
            c_light = n_samples / ns_
            weight = c_light * light_pdf / jnp.maximum(
                c_bsdf * bpdf + c_light * light_pdf, 1e-12
            )
            contrib = (
                (weight * jnp.abs(dot(wi, n)) / jnp.maximum(light_pdf, 1e-3))[..., None]
                * f
                * emission
            )
            lj = lj + jnp.where(accept[..., None], contrib, 0.0)
        draw += 1
        total = total + lj / max(n_samples, 1)

    return total
