"""Disney BSDF (metallic/roughness workflow + specular transmission +
thin-shell subsurface), branchless and batched.

Functional parity with the reference's shading model (disney.h:34-405):
 - diffuse lobe with Schlick Fd90 retro-reflection
 - GTR2 (GGX) specular with Smith-GGX masking and Schlick or dielectric
   Fresnel, metallic/specularTint color mixing
 - GTR1 clearcoat lobe
 - specular transmission: rough GGX reflection vs. smooth refraction chosen
   by the dielectric Fresnel (disney.h:172-227)
 - thin-shell subsurface as uniform back-hemisphere diffuse with sqrt(color)
   (disney.h:246-253, 348-358)
 - importance sampling: 50/50 diffuse(cosine) / specular(GTR2 half vector),
   pdf mirroring the sampler exactly (disney.h:125-166)

Every branch in the reference becomes a mask here, so the same code path
evaluates a whole wavefront of lanes and is reverse-mode differentiable
w.r.t. all material parameters. Division guards keep masked-off lanes free
of NaNs (a NaN in a dead lane still poisons gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import (
    INV_2PI,
    INV_PI,
    PI,
    TWO_PI,
    dot,
    lerp,
    normalize,
    safe_normalize,
    sqr,
)
from ..core.sampling import cosine_sample_hemisphere, uniform_sample_hemisphere

# BSDF event types
REFLECTED = 0
TRANSMITTED = 1
SPECULAR = 2

_EPS = 1e-6


def schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def gtr1(n_dot_h, a):
    """Clearcoat NDF; a >= 1 degenerates to 1/pi."""
    a = jnp.asarray(a)
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    safe = (a2 - 1.0) / (PI * jnp.log(jnp.maximum(a2, _EPS)) * jnp.maximum(t, _EPS))
    return jnp.where(a >= 1.0, INV_PI, safe)


def gtr2(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    # t >= a^2 > 0 for any |n_dot_h| <= 1, so t^2 >= a^4 >= 1e-12 at the
    # reference's 0.001 roughness floor — a 1e-6 clamp here CAPPED the
    # near-mirror peak at 0.32 instead of ~3e5, deleting sharp specular
    # highlights entirely (found via reference parity: the light's
    # reflection on the glass ball was missing; r3). Keep only a
    # denormal-guard floor far below the math's own minimum.
    return a2 / (PI * jnp.maximum(t * t, 1e-20))


def smith_ggx(n_dot_v, alpha_g):
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return 1.0 / jnp.maximum(n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), _EPS)


def fresnel_dielectric(v_dot_n, eta_i, eta_o):
    """Exact unpolarized dielectric Fresnel (disney.h:79-96 `Fr`);
    returns 1 under total internal reflection."""
    sin2_t = sqr(eta_i / eta_o) * (1.0 - v_dot_n * v_dot_n)
    tir = sin2_t > 1.0
    l_dot_n = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    eta = eta_o / jnp.maximum(eta_i, _EPS)
    denom1 = v_dot_n + eta * l_dot_n
    denom2 = l_dot_n + eta * v_dot_n
    r1 = (v_dot_n - eta * l_dot_n) / jnp.where(jnp.abs(denom1) > _EPS, denom1, _EPS)
    r2 = (l_dot_n - eta * v_dot_n) / jnp.where(jnp.abs(denom2) > _EPS, denom2, _EPS)
    f = 0.5 * (sqr(r1) + sqr(r2))
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def refract(wi, n, eta):
    """Refract wi (pointing away from surface) about n. Returns (ok, wt);
    ok=False on total internal reflection."""
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    wt = -wi * eta[..., None] + (eta * cos_i - cos_t)[..., None] * n
    return ok, wt


def _spec_color(m):
    """Cspec0: tintable dielectric specular color lerped to base color by
    metallic (disney.h:306-310)."""
    cd = m.color
    lum = 0.3 * cd[..., 0] + 0.6 * cd[..., 1] + 0.1 * cd[..., 2]
    tint = jnp.where(
        (lum > 0.0)[..., None], cd / jnp.maximum(lum, _EPS)[..., None], jnp.ones_like(cd)
    )
    white = jnp.ones_like(cd)
    dielectric = (m.specular * 0.08)[..., None] * lerp(
        white, tint, m.specular_tint[..., None]
    )
    return lerp(dielectric, cd, m.metallic[..., None])


def bsdf_pdf(m, eta_i, eta_o, n, v, l):
    """Solid-angle pdf of `bsdf_sample` producing direction l (view v).

    Mirrors disney.h:125-166: below-horizon directions can only come from the
    subsurface lobe (brdf) — the smooth-refraction lobe is a delta and
    carries zero solid-angle pdf.
    """
    n_dot_l = dot(l, n)
    below = n_dot_l <= 0.0

    # below-horizon: uniform back hemisphere * P(subsurface) * P(diffuse)
    brdf_pdf_below = INV_2PI * m.subsurface * 0.5

    # above-horizon
    f = fresnel_dielectric(dot(n, v), eta_i, eta_o)
    a = jnp.maximum(0.001, m.roughness)
    half = safe_normalize(l + v)
    cos_theta_half = jnp.abs(dot(half, n))
    pdf_half = gtr2(cos_theta_half, a) * cos_theta_half
    pdf_spec = 0.25 * pdf_half / jnp.maximum(_EPS, dot(l, half))
    pdf_diff = jnp.abs(n_dot_l) * INV_PI * (1.0 - m.subsurface)
    bsdf_pdf_above = pdf_spec * f
    brdf_pdf_above = lerp(pdf_diff, pdf_spec, 0.5)

    above = lerp(brdf_pdf_above, bsdf_pdf_above, m.transmission)
    below_v = lerp(brdf_pdf_below, jnp.zeros_like(brdf_pdf_below), m.transmission)
    return jnp.where(below, below_v, above)


def _sample_gtr2_half(u, v, n, view, r1, r2, roughness):
    """Sample a GTR2 half-vector in the (u, v, n) frame and reflect view."""
    a = jnp.maximum(0.001, roughness)
    phi = r1 * TWO_PI
    cos_theta = jnp.sqrt((1.0 - r2) / (1.0 + (sqr(a) - 1.0) * r2))
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - sqr(cos_theta)))
    half = (
        u * (sin_theta * jnp.cos(phi))[..., None]
        + v * (sin_theta * jnp.sin(phi))[..., None]
        + n * cos_theta[..., None]
    )
    # keep half in the view hemisphere
    half = half * jnp.where(dot(half, view) <= 0.0, -1.0, 1.0)[..., None]
    light = 2.0 * dot(view, half)[..., None] * half - view
    return light


def bsdf_sample(m, eta_i, eta_o, u, v, n, view, key):
    """Importance-sample an outgoing direction.

    Returns (light, pdf, event_type). Lobe selection follows the reference
    (disney.h:170-293): transmission branch gated by the material's
    transmission, Fresnel-split into rough GGX reflection vs smooth
    refraction; otherwise 50/50 cosine-diffuse (with subsurface flip) / GGX.
    The smooth-refraction event returns its discrete probability
    (1-F)*transmission as `pdf` and type SPECULAR.
    """
    shape = m.roughness.shape
    draws = [
        jax.random.uniform(jax.random.fold_in(key, i), shape) for i in range(6)
    ]
    u0, u1, r1, r2, u4, u5 = draws

    f = fresnel_dielectric(dot(n, view), eta_i, eta_o)

    is_trans = u0 < m.transmission
    is_spec_reflect = is_trans & (u1 < f)
    is_refract = is_trans & ~is_spec_reflect
    is_brdf = ~is_trans
    is_brdf_spec = is_brdf & (u4 >= 0.5)
    is_brdf_diff = is_brdf & (u4 < 0.5)
    is_ss = is_brdf_diff & (u5 < m.subsurface)
    is_cos = is_brdf_diff & ~is_ss

    # candidate directions (all lanes compute all of them; masked select)
    l_spec = _sample_gtr2_half(u, v, n, view, r1, r2, m.roughness)

    refract_ok, l_refr = refract(view, n, eta_i / jnp.maximum(eta_o, _EPS))
    l_refr = safe_normalize(l_refr, fallback=-view)

    d_cos = cosine_sample_hemisphere(r1, r2)
    l_cos = u * d_cos[..., 0:1] + v * d_cos[..., 1:2] + n * d_cos[..., 2:3]

    d_ss = uniform_sample_hemisphere(r1, r2)
    l_ss = u * d_ss[..., 0:1] + v * d_ss[..., 1:2] - n * d_ss[..., 2:3]

    light = jnp.where(
        is_refract[..., None],
        l_refr,
        jnp.where(
            is_ss[..., None],
            l_ss,
            jnp.where(is_cos[..., None], l_cos, l_spec),
        ),
    )

    event = jnp.where(
        is_refract,
        SPECULAR,
        jnp.where(is_ss, TRANSMITTED, REFLECTED),
    ).astype(jnp.int32)

    pdf_smooth = jnp.where(refract_ok, (1.0 - f) * m.transmission, 0.0)
    pdf_solid = bsdf_pdf(m, eta_i, eta_o, n, view, light)
    pdf = jnp.where(is_refract, pdf_smooth, pdf_solid)

    return light, pdf, event


def bsdf_eval(m, eta_i, eta_o, n, v, l):
    """Evaluate the BSDF value f(v, l) (RGB); disney.h:296-405."""
    n_dot_l = dot(n, l)
    n_dot_v = dot(n, v)
    h = normalize(l + v)
    n_dot_h = dot(n, h)
    l_dot_h = dot(l, h)

    cdlin = m.color
    cspec0 = _spec_color(m)
    below = n_dot_l <= 0.0
    a = jnp.maximum(0.001, m.roughness)

    one_minus_metallic = 1.0 - m.metallic

    # ---- transmissive side (bsdf), weighted by m.transmission
    f_v = fresnel_dielectric(n_dot_v, eta_i, eta_o)
    bsdf_below = (
        m.transmission
        * (1.0 - f_v)
        / jnp.maximum(jnp.abs(n_dot_l), _EPS)
        * one_minus_metallic
    )[..., None] * jnp.ones_like(cdlin)

    ds = gtr2(n_dot_h, a)
    fh_diel = fresnel_dielectric(l_dot_h, eta_i, eta_o)
    fs_t = lerp(cspec0, jnp.ones_like(cspec0), fh_diel[..., None])
    gs = smith_ggx(n_dot_v, a) * smith_ggx(n_dot_l, a)
    bsdf_above = (gs * ds)[..., None] * fs_t

    bsdf = jnp.where(below[..., None], bsdf_below, bsdf_above)

    # ---- reflective side (brdf), weighted by 1 - m.transmission
    # below horizon: thin-shell subsurface with sqrt(color)
    s = jnp.sqrt(jnp.maximum(cdlin, 1e-12))
    fl_b = schlick_fresnel(jnp.abs(n_dot_l))
    fv_b = schlick_fresnel(n_dot_v)
    fd_b = (1.0 - 0.5 * fl_b) * (1.0 - 0.5 * fv_b)
    brdf_below = (
        (INV_PI * m.subsurface * fd_b * one_minus_metallic)[..., None] * s
    )
    brdf_below = jnp.where((m.subsurface > 0.0)[..., None], brdf_below, 0.0)

    # above horizon: diffuse retro + GGX specular + clearcoat
    fh = schlick_fresnel(l_dot_h)
    fs = lerp(cspec0, jnp.ones_like(cspec0), fh[..., None])
    fl = schlick_fresnel(n_dot_l)
    fv = schlick_fresnel(n_dot_v)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * m.roughness
    fd = lerp(1.0, fd90, fl) * lerp(1.0, fd90, fv)

    dr = gtr1(n_dot_h, lerp(0.1, 0.001, m.clearcoat_gloss))
    fc = lerp(0.04, 1.0, fh)
    gr = smith_ggx(n_dot_l, 0.25) * smith_ggx(n_dot_v, 0.25)

    brdf_above = (
        (INV_PI * fd * one_minus_metallic * (1.0 - m.subsurface))[..., None] * cdlin
        + (gs * ds)[..., None] * fs
        + (m.clearcoat * gr * fc * dr)[..., None] * jnp.ones_like(cdlin)
    )

    brdf = jnp.where(below[..., None], brdf_below, brdf_above)

    return lerp(brdf, bsdf, m.transmission[..., None])
