"""BSDF sample/pdf consistency visualizer.

Capability parity with the reference's `BSDFTest` harness (disney.h:409-482):
render f(v,l)/pdf(v,l) over a lat-long map of outgoing directions for a fixed
view vector, then scatter-plot N importance-sampled directions on top — a
visual chi-square check that the sampler's density matches the analytic pdf.
The map + scatter are written to PFM so ratios stay in HDR.

Fully vectorized: the whole lat-long grid is one batched bsdf_eval/bsdf_pdf
call, and the N samples are one vmapped bsdf_sample — no scalar loops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.math import basis_from_vector


def _latlong_dirs(width: int, height: int):
    """Direction grid over the full sphere (lat-long, y-up)."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    phi = u * 2.0 * jnp.pi
    theta = v * jnp.pi
    T, P = jnp.meshgrid(theta, phi, indexing="ij")
    return jnp.stack(
        [jnp.sin(T) * jnp.cos(P), jnp.cos(T), jnp.sin(T) * jnp.sin(P)], axis=-1
    )


def _dir_to_pixel(d, width: int, height: int):
    phi = jnp.arctan2(d[..., 2], d[..., 0]) % (2.0 * jnp.pi)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    x = jnp.clip((phi / (2.0 * jnp.pi) * width).astype(jnp.int32), 0, width - 1)
    y = jnp.clip((theta / jnp.pi * height).astype(jnp.int32), 0, height - 1)
    return x, y


def bsdf_test(material, bsdf_module=None, *, width: int = 512, height: int = 256,
              n_samples: int = 1000, view_theta: float = 0.35, seed: int = 0,
              pfm_path: str | None = None) -> np.ndarray:
    """Render the f/pdf map for `material` with `n_samples` importance samples
    marked in green. Returns the (H, W, 3) image; writes PFM if a path is
    given. `bsdf_module` defaults to the Disney BSDF."""
    if bsdf_module is None:
        from ..bsdf import disney as bsdf_module

    n = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    view = jnp.array(
        [jnp.sin(view_theta), jnp.cos(view_theta), 0.0], jnp.float32
    )
    eta_i = jnp.float32(1.0)
    eta_o = jnp.float32(material.index_of_refraction())
    # flatten the single material through the same SoA path the integrator
    # uses, so bsdf_eval sees an identical pytree record
    from ..scene.model import MaterialsFlat

    mflat = MaterialsFlat.from_host([material]).select(jnp.int32(0))

    dirs = _latlong_dirs(width, height)  # (H, W, 3)

    @jax.jit
    def ratio_map(mf):
        f = bsdf_module.bsdf_eval(mf, eta_i, eta_o, n, view, dirs)
        pdf = bsdf_module.bsdf_pdf(mf, eta_i, eta_o, n, view, dirs)
        return jnp.where(
            pdf[..., None] > 1e-7, f / jnp.maximum(pdf, 1e-7)[..., None], 0.0
        )

    img = np.array(ratio_map(mflat), np.float32)  # writable for scatter marks

    # importance samples scattered in green
    u_axis, v_axis = basis_from_vector(n)
    keys = jax.random.split(jax.random.key(seed), n_samples)
    sample = jax.jit(
        jax.vmap(
            lambda k: bsdf_module.bsdf_sample(
                mflat, eta_i, eta_o, u_axis, v_axis, n, view, k
            )
        )
    )
    l, spdf, _ = sample(keys)
    ok = np.asarray(spdf > 0.0)
    x, y = _dir_to_pixel(l, width, height)
    x, y = np.asarray(x)[ok], np.asarray(y)[ok]
    img[y, x] = [0.0, 10.0, 0.0]

    if pfm_path is not None:
        from ..io.hdr import save_pfm

        save_pfm(pfm_path, img)
    return img
