"""HDR environment probe: distributional, analytic, and end-to-end proofs.

The probe sampler's 2D-CDF inversion and the w*h/(2 pi^2 sin(theta))
Jacobian (probe.h:136-160, 205-236 parity) are the easiest place to hide a
silent MIS bias: every term is plausible-looking and the image just comes
out a few percent wrong. Three independent checks pin it down:

  1. pdf integrates to 1 over the sphere (uniform-direction Monte Carlo) —
     validates the Jacobian as a solid-angle density;
  2. importance-sampled power estimate E[L/pdf] matches direct texel
     quadrature sum(L * dOmega) — validates sampler and pdf AGAINST each
     other on a non-uniform probe (a wrong CDF or Jacobian cannot cancel
     in both);
  3. a constant probe must render EXACTLY like the constant gradient sky:
     same lighting environment, but the probe path runs NEE + MIS while
     the sky path is BSDF-only — double counting or a bad MIS weight
     shows up immediately.

Plus sample<->pdf self-consistency and an end-to-end probe-lit golden
(create_test_probe keeps it asset-free for CI).
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinsel_tpu.scene.model import (
    Material, Primitive, Scene, Sky, SPHERE, PLANE,
)
from tinsel_tpu.scene.probe_io import create_test_probe


def _smooth_random_probe(w=64, h=32, seed=7):
    """Non-uniform probe with smooth structure — errors in the CDF or
    Jacobian cannot cancel against symmetry. Pole rows are black: the
    sampler maps row r to the texel-CORNER direction v = r/h and reports
    pdf = 0 where sin(v*pi) == 0 (probe.h:225-233 parity), so a probe
    with pole luminance would emit unusable zero-pdf samples — the
    reference has the identical quirk, and real probes have negligible
    single-texel pole mass."""
    rng = np.random.default_rng(seed)
    base = rng.random((h, w)).astype(np.float32)
    # cheap separable blur for smoothness + a bright blob
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16
    for _ in range(2):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, base
        )
        base = np.apply_along_axis(
            lambda c: np.convolve(c, k, mode="same"), 0, base
        )
    base[h // 4 : h // 4 + 3, w // 3 : w // 3 + 4] += 8.0
    data = np.stack([base, base * 0.8 + 0.1, base * 0.6 + 0.2], -1)
    data[0] = 0.0  # black pole rows (see docstring)
    data[-1] = 0.0
    from tinsel_tpu.scene.model import HostProbe

    probe = HostProbe(data=np.ascontiguousarray(data, np.float32))
    probe.build_cdf()
    return probe


def _flat_probe_scene(probe):
    scene = Scene()
    scene.sky = Sky(
        horizon=np.zeros(3, np.float32), zenith=np.zeros(3, np.float32)
    )
    scene.sky.probe = probe
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=1.0,
            material=Material(
                color=np.full(3, 0.7, np.float32),
                roughness=0.9,
                specular=0.1,
            ),
        )
    )
    return scene


def _probe_flat(probe):
    sc = _flat_probe_scene(probe)
    return sc.flatten().probe


def test_probe_pdf_integrates_to_one():
    """E_uniform[pdf(d)] * 4pi = 1 (pdf is a solid-angle density)."""
    from tinsel_tpu.render.probe import probe_pdf

    pf = _probe_flat(_smooth_random_probe())
    n = 200_000
    key = jax.random.key(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    vals = probe_pdf(pf, d)
    est = float(jnp.mean(vals)) * 4.0 * np.pi
    # MC error ~ 1/sqrt(n) on an O(1) integrand with peaked regions
    assert abs(est - 1.0) < 0.03, est


def test_probe_sampled_power_matches_quadrature():
    """E[L(d)/pdf(d)] over importance samples == sum_texels L * dOmega."""
    from tinsel_tpu.render.probe import probe_sample_uniforms

    probe = _smooth_random_probe()
    pf = _probe_flat(probe)
    h, w = probe.data.shape[:2]

    # direct quadrature: dOmega(texel) = (2pi/w)(pi/h) sin(theta_texel),
    # theta at the texel CORNER grid used by the sampler/pdf (v = row/h)
    v = (np.arange(h)) / h
    sin_t = np.sin(v * np.pi)
    dom = (2 * np.pi / w) * (np.pi / h) * sin_t  # (h,)
    lum = probe.data.mean(-1)  # scalar "power" channel
    direct = float((lum * dom[:, None]).sum())

    n = 400_000
    k1, k2 = jax.random.split(jax.random.key(3))
    r1 = jax.random.uniform(k1, (n,))
    r2 = jax.random.uniform(k2, (n,))
    d, color, pdf = probe_sample_uniforms(pf, r1, r2)
    est = float(jnp.mean(jnp.mean(color, -1) / jnp.maximum(pdf, 1e-12)))
    assert abs(est - direct) / direct < 0.02, (est, direct)


def test_probe_pdf_matches_numpy_oracle():
    """probe_pdf on arbitrary (BSDF-sampled) directions == a float64
    numpy transcription of probe.h:136-160. Random interior directions —
    sampled dirs sit exactly on texel corners (u=col/w, probe.h:227-228)
    where the floor-binning is ambiguous between adjacent texels in both
    renderers (harmless for MIS: the weights stay a partition of unity),
    so corners are the wrong place to test."""
    from tinsel_tpu.render.probe import probe_pdf

    probe = _smooth_random_probe()
    pf = _probe_flat(probe)
    h, w = probe.data.shape[:2]
    n = 100_000
    d = jax.random.normal(jax.random.key(9), (n, 3))
    d = np.asarray(d / jnp.linalg.norm(d, axis=-1, keepdims=True))

    theta = np.arccos(np.clip(d[:, 1], -1, 1)).astype(np.float64)
    phi = np.where(
        (d[:, 0] == 0) & (d[:, 2] == 0), 0.0, np.arctan2(d[:, 2], d[:, 0])
    )
    u = (np.pi + phi) / (2 * np.pi)
    v = theta / np.pi
    col = np.clip((u * w).astype(int), 0, w - 1)
    row = np.clip((v * h).astype(int), 0, h - 1)
    pdf_tex = np.asarray(pf.pdf_x)[row, col] * np.asarray(pf.pdf_y)[row]
    sin_t = np.sin(v * np.pi)
    oracle = np.where(
        np.abs(sin_t) < 1e-4,
        0.0,
        pdf_tex * (w * h) / (2 * np.pi**2 * np.maximum(sin_t, 1e-12)),
    )
    ours = np.asarray(probe_pdf(pf, jnp.asarray(d)))
    # exclude rows where f32 row-binning can differ from f64 (direction
    # within ~1e-5 of a texel boundary)
    fr = (v * h) % 1.0
    fc = (u * w) % 1.0
    interior = (
        (fr > 1e-4) & (fr < 1 - 1e-4)
        & (fc > 1e-4) & (fc < 1 - 1e-4)
        & (np.abs(sin_t) > 1e-3)
    )
    rel = np.abs(ours - oracle) / np.maximum(oracle, 1e-9)
    assert float(rel[interior].max()) < 1e-3, float(rel[interior].max())


def test_probe_texel_histogram_matches_cdf():
    """Chi-square-style check: empirical texel pick frequencies follow
    pdf_y[r] * pdf_x[r, c] (the discrete distribution the 2D CDF encodes)."""
    from tinsel_tpu.render.probe import probe_dir_to_uv, probe_sample_uniforms

    probe = _smooth_random_probe(w=16, h=8)
    pf = _probe_flat(probe)
    h, w = probe.data.shape[:2]
    n = 500_000
    k1, k2 = jax.random.split(jax.random.key(17))
    r1 = jax.random.uniform(k1, (n,))
    r2 = jax.random.uniform(k2, (n,))
    d, _, _ = probe_sample_uniforms(pf, r1, r2)
    uv = np.asarray(probe_dir_to_uv(d))
    # sampled dirs are texel corners; bin with a half-texel shift so the
    # float dir->uv roundtrip can't flip a corner into the neighbor bin
    col = np.clip((uv[:, 0] * w + 0.5).astype(int), 0, w - 1)
    row = np.clip((uv[:, 1] * h + 0.5).astype(int), 0, h - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (row, col), 1.0)
    freq = counts / n
    expect = np.asarray(pf.pdf_y)[:, None] * np.asarray(pf.pdf_x)
    expect = expect / expect.sum()
    # every texel with meaningful mass within 5 sigma of binomial noise
    sig = np.sqrt(np.maximum(expect * (1 - expect) / n, 1e-18))
    mask = expect > 1e-5
    z = np.abs(freq - expect) / sig
    assert float(z[mask].max()) < 5.0, float(z[mask].max())


def test_constant_probe_equals_constant_sky():
    """A constant probe IS a constant sky. The probe path adds NEE + MIS
    weighting on top of the BSDF-only sky path — any double counting,
    missing MIS term, or Jacobian error breaks this equality."""
    from tinsel_tpu.render.integrator import path_trace
    from tinsel_tpu.scene.model import HostProbe

    def run(scene):
        flat = scene.flatten()
        n = 8192
        key = jax.random.key(5)
        th = jnp.linspace(0.0, 0.8, n)
        origins = jnp.stack(
            [jnp.sin(th) * 0.5, jnp.cos(th) * 0.5, jnp.full((n,), -3.0)], -1
        ).astype(jnp.float32)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        times = jnp.zeros((n,), jnp.float32)
        rad = path_trace(flat, origins, dirs, times, max_depth=3, key=key)
        return float(jnp.mean(rad))

    mat = Material(
        color=np.full(3, 0.65, np.float32), roughness=0.8, specular=0.2
    )

    sky_scene = Scene()
    sky_scene.sky = Sky(
        horizon=np.ones(3, np.float32), zenith=np.ones(3, np.float32)
    )
    sky_scene.add_primitive(Primitive(type=SPHERE, radius=1.0, material=mat))

    probe = HostProbe(data=np.ones((32, 64, 3), np.float32))
    probe.build_cdf()
    probe_scene = Scene()
    probe_scene.sky = Sky(
        horizon=np.zeros(3, np.float32), zenith=np.zeros(3, np.float32)
    )
    probe_scene.sky.probe = probe
    probe_scene.add_primitive(
        Primitive(type=SPHERE, radius=1.0, material=mat)
    )

    e_sky = run(sky_scene)
    e_probe = run(probe_scene)
    # the probe estimator has lower variance (NEE); tolerance covers the
    # sky path's MC noise at 8192 rays
    assert abs(e_probe - e_sky) / e_sky < 0.02, (e_probe, e_sky)


def test_probe_lit_render_golden():
    """End-to-end probe-lit image (disc-light test probe, glossy + matte
    geometry over a plane): exercises probe NEE (render/lights.py), the
    escape-ray probe MIS branch (render/integrator.py), and stays
    asset-free. Golden-checked like tests/test_goldens.py."""
    from tinsel_tpu.render.renderer import render

    scene = Scene()
    scene.sky = Sky(
        horizon=np.zeros(3, np.float32), zenith=np.zeros(3, np.float32)
    )
    scene.sky.probe = create_test_probe()
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0, 1, 0, 0], np.float32),
            material=Material(
                color=np.full(3, 0.6, np.float32), roughness=0.7,
                specular=0.1,
            ),
        )
    )
    from tinsel_tpu.scene.model import HostTransform

    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=0.6,
            start_transform=HostTransform(
                p=np.array([0.0, 0.6, 0.0], np.float32)
            ),
            material=Material(
                color=np.array([0.9, 0.9, 0.92], np.float32),
                roughness=0.2, specular=1.0, metallic=1.0,
            ),
        )
    )
    from tinsel_tpu.scene.model import Camera
    from tinsel_tpu.scene.loaders.tin import _look_at_quat

    pos = np.array([0.0, 1.0, 3.0], np.float32)
    scene.camera = Camera(
        position=pos,
        rotation=_look_at_quat(pos, np.array([0.0, 0.5, 0.0], np.float32)),
    )
    opts = dataclasses.replace(scene.options, width=32, height=32,
                               max_depth=3)
    acc = np.asarray(render(scene, spp=8, seed=42, options=opts))
    img = acc[..., :3] / np.maximum(acc[..., 3:4], 1e-7)
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3  # the probe actually lights the scene

    path = os.path.join(os.path.dirname(__file__), "goldens", "probe.npz")
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(path):
        np.savez_compressed(path, img=img.astype(np.float32))
        pytest.skip(f"golden written: {path}")
    ref = np.load(path)["img"]
    denom = max(float(np.abs(ref).mean()), 1e-6)
    mae = float(np.abs(img - ref).mean()) / denom
    assert mae < 0.02, f"probe golden drift mae={mae:.4f}"
