"""Host-side scene model (NumPy) and its flattening to device SoA pytrees.

This replaces the reference's pointer-based Scene (scene.h:183-215) with a
two-stage design that fits XLA's compilation model:

* **Host stage** — plain Python dataclasses (`Material`, `Mesh`, `Primitive`,
  `Scene`) built by the loaders; BVHs and CDFs are built here once.
* **Device stage** — `Scene.flatten()` produces a `SceneFlat` pytree of flat
  float32/int32 arrays: a primitive table (SoA, replacing the tagged union
  scene.h:148-153), a material table, one concatenated mesh/triangle/BVH pool
  (replacing per-mesh pointers scene.h:119-135), and the probe CDF tables.
  Everything discrete that shapes the computation graph (primitive types,
  mesh handles, light list) is kept *static* so the renderer can unroll over
  primitives and jit once per scene topology.

Continuous parameters (transforms, material params, emission, probe data)
stay traced arrays — they are the differentiable inputs for the gradient
path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.build import (
    BVH,
    build_bvh,
    build_wide_bvh,
    triangle_bounds,
    wide_stack_bound,
)
from ..accel.traverse import MeshHandle, MeshPool

# primitive type tags (static)
SPHERE = 0
PLANE = 1
MESH = 2


def _light_pmf(prims, local_area):
    """Power-proportional light-selection pmf (luminance x world area),
    normalized over emissive primitives; zero elsewhere."""
    pmf = np.zeros(max(len(prims), 1), np.float64)
    for i, p in enumerate(prims):
        if p.light_samples > 0:
            e = np.asarray(p.material.emission, np.float64)
            lum = 0.3 * e[0] + 0.6 * e[1] + 0.1 * e[2]
            s = float(p.start_transform.s)
            pmf[i] = max(lum, 1e-12) * max(local_area[i] * s * s, 1e-12)
    t = pmf.sum()
    if t > 0:
        pmf /= t
    return pmf.astype(np.float32)


# ---------------------------------------------------------------------- host


@dataclasses.dataclass
class Material:
    """Disney BSDF material; defaults mirror the reference's (scene.h:45-70)."""

    color: np.ndarray = field(default_factory=lambda: np.array([0.82, 0.67, 0.16], np.float32))
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    absorption: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    eta: float = 0.0  # 0 => infer from specular
    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 0.5
    roughness: float = 0.5
    specular_tint: float = 0.0
    anisotropic: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 1.0
    transmission: float = 0.0
    # procedural Perlin bump map (scene.h:97-99 bump/bumpTile; the
    # reference's evaluation path is dead code — render.cu:588
    # EvaluateBumpNormal is never called — this one works, render/bump.py)
    bump: float = 0.0
    bump_tile: float = 10.0

    def index_of_refraction(self) -> float:
        if self.eta == 0.0:
            return 2.0 / (1.0 - np.sqrt(0.08 * self.specular)) - 1.0
        return self.eta


@dataclasses.dataclass
class HostTransform:
    p: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    q: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    s: float = 1.0

    def copy(self) -> "HostTransform":
        return HostTransform(self.p.copy(), self.q.copy(), float(self.s))


@dataclasses.dataclass
class Mesh:
    """Host triangle mesh with BVH + area CDF (mesh.h:8-36 equivalent)."""

    positions: np.ndarray  # (V, 3) f32
    indices: np.ndarray  # (T, 3) i32
    normals: Optional[np.ndarray] = None  # (V, 3) f32
    bvh: Optional[BVH] = None
    cdf: Optional[np.ndarray] = None  # (T,) normalized area CDF
    area: float = 0.0
    name: str = ""

    def calculate_normals(self):
        """Area-weighted vertex normals (mesh.cpp:33-57 semantics)."""
        pos = self.positions
        idx = self.indices
        fn = np.cross(
            pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]]
        )  # unnormalized => area weighting
        normals = np.zeros_like(pos)
        np.add.at(normals, idx[:, 0], fn)
        np.add.at(normals, idx[:, 1], fn)
        np.add.at(normals, idx[:, 2], fn)
        norm = np.linalg.norm(normals, axis=-1, keepdims=True)
        self.normals = (normals / np.maximum(norm, 1e-20)).astype(np.float32)

    def rebuild_cdf(self):
        pos = self.positions
        idx = self.indices
        areas = 0.5 * np.linalg.norm(
            np.cross(pos[idx[:, 1]] - pos[idx[:, 0]], pos[idx[:, 2]] - pos[idx[:, 0]]),
            axis=-1,
        )
        total = float(areas.sum())
        self.area = total
        self.cdf = (np.cumsum(areas) / max(total, 1e-30)).astype(np.float32)

    def rebuild_bvh(self):
        lo, hi = triangle_bounds(self.positions, self.indices)
        self.bvh = build_bvh(lo, hi)

    def build(self):
        if self.normals is None or len(self.normals) != len(self.positions):
            self.calculate_normals()
        self.rebuild_cdf()
        self.rebuild_bvh()

    def normalize(self, size: float = 1.0):
        """Translate to origin and scale longest edge to `size`."""
        lo = self.positions.min(axis=0)
        hi = self.positions.max(axis=0)
        self.positions = (self.positions - lo).astype(np.float32)
        max_edge = float((hi - lo).max())
        if max_edge > 0:
            self.positions *= np.float32(size / max_edge)

    def transform(self, matrix: np.ndarray):
        """Apply a 4x4 affine to positions (and rotate normals)."""
        p = self.positions @ matrix[:3, :3].T + matrix[:3, 3]
        self.positions = p.astype(np.float32)
        if self.normals is not None:
            n = self.normals @ np.linalg.inv(matrix[:3, :3])
            norm = np.linalg.norm(n, axis=-1, keepdims=True)
            self.normals = (n / np.maximum(norm, 1e-20)).astype(np.float32)

    def add_mesh(self, other: "Mesh"):
        offset = len(self.positions)
        self.positions = np.concatenate([self.positions, other.positions]).astype(np.float32)
        if self.normals is not None and other.normals is not None:
            self.normals = np.concatenate([self.normals, other.normals]).astype(np.float32)
        else:
            self.normals = None
        self.indices = np.concatenate([self.indices, other.indices + offset]).astype(np.int32)


@dataclasses.dataclass
class Primitive:
    type: int = SPHERE
    start_transform: HostTransform = field(default_factory=HostTransform)
    end_transform: Optional[HostTransform] = None  # None => same as start
    radius: float = 1.0
    plane: np.ndarray = field(default_factory=lambda: np.array([0, 1, 0, 0], np.float32))
    mesh: Optional[Mesh] = None
    material: Material = field(default_factory=Material)
    light_samples: int = 0

    def resolved_end(self) -> HostTransform:
        return self.end_transform if self.end_transform is not None else self.start_transform


@dataclasses.dataclass
class Camera:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    fov: float = float(np.deg2rad(45.0))
    shutter_start: float = 0.0
    shutter_end: float = 1.0
    # thin-lens depth of field (extension — the reference's CameraSampler
    # is pinhole-only, util.h:45-83); aperture 0 keeps pinhole bit-parity
    aperture: float = 0.0
    focal_distance: float = 1.0


@dataclasses.dataclass
class Sky:
    horizon: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 0.0], np.float32))
    zenith: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 0.0], np.float32))
    probe: Optional["HostProbe"] = None


@dataclasses.dataclass
class HostProbe:
    """Lat-long HDR environment map with a luminance-weighted 2D CDF
    (probe.h:31-79 semantics, built vectorized)."""

    data: np.ndarray  # (H, W, 3) f32 linear radiance

    pdf_x: np.ndarray = None  # (H, W)
    cdf_x: np.ndarray = None  # (H, W)
    pdf_y: np.ndarray = None  # (H,)
    cdf_y: np.ndarray = None  # (H,)

    def build_cdf(self):
        lum = (
            0.3 * self.data[..., 0]
            + 0.6 * self.data[..., 1]
            + 0.1 * self.data[..., 2]
        ).astype(np.float64)
        row_sum = lum.sum(axis=1, keepdims=True)  # (H, 1)
        row_sum_safe = np.maximum(row_sum, 1e-30)
        self.pdf_x = (lum / row_sum_safe).astype(np.float32)
        self.cdf_x = (np.cumsum(lum, axis=1) / row_sum_safe).astype(np.float32)
        total = np.maximum(lum.sum(), 1e-30)
        self.pdf_y = (row_sum[:, 0] / total).astype(np.float32)
        self.cdf_y = (np.cumsum(row_sum[:, 0]) / total).astype(np.float32)

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]


@dataclasses.dataclass
class Options:
    """Render options (render.h:50-63 equivalent + defaults main.cpp:181-193)."""

    width: int = 512
    height: int = 256
    max_depth: int = 4
    max_samples: int = 512
    exposure: float = 1.0
    limit: float = 1.5
    clamp: float = float("inf")
    filter_type: str = "gaussian"  # "box" | "gaussian"
    filter_width: float = 0.75
    filter_falloff: float = 1.0
    mode: str = "pathtrace"  # "pathtrace" | "normals" | "complexity"
    backend: str = "scan"  # "scan" (differentiable) | "while" (megakernel)
    sampler: str = "random"  # "random" (reference-active parity,
    # sampler.h:235 USE_RANDOM 1) | "stratified" | "bluenoise" (wire the
    # QMC kit the reference left dead behind its compile-time switch)
    rr_depth: int = 0  # Russian-roulette start bounce; 0 = off (parity:
    # the reference runs every path to maxDepth, render.cpp:250). N>0
    # terminates low-throughput paths from bounce N on, unbiased.
    prng: str = "rbg"  # PRNG key impl for render entry points: "rbg"
    # (XLA RngBitGenerator; measured +6% cornell forward — threefry's
    # xor/or chains are a visible VPU cost) | "threefry" (jax default,
    # backend-stable bits). Draw-level determinism per seed holds for
    # both; rbg bits may differ across backends/compiler versions, which
    # only matters for bit-exact golden stability (goldens are
    # CPU-generated and CPU-checked).
    light_sampling: str = "all"  # "all" (parity: one NEE shadow ray per
    # light per bounce, render.cpp:175) | "power" (pick ONE light by a
    # power-proportional CDF: O(1) shadow traversals per bounce however
    # many lights the scene has; unbiased, MIS-consistent)


# --------------------------------------------------------------------- device


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialsFlat:
    emission: jax.Array  # (M, 3)
    color: jax.Array  # (M, 3)
    absorption: jax.Array  # (M, 3)
    eta: jax.Array  # (M,) resolved index of refraction (>0)
    metallic: jax.Array
    subsurface: jax.Array
    specular: jax.Array
    roughness: jax.Array
    specular_tint: jax.Array
    clearcoat: jax.Array
    clearcoat_gloss: jax.Array
    transmission: jax.Array

    def select(self, i):
        """Gather one (batched) material record by index array.

        Implemented as an exact one-hot matmul rather than a gather: the
        backward of a gather is a scatter-add, which is pathologically slow
        on TPU for colliding indices (every ray hits one of ~10 materials),
        while the matmul transpose lands on the MXU. f32-exact because the
        one-hot rows have a single 1.0 (precision pinned to HIGHEST)."""
        m = self.emission.shape[0]
        oh = jax.nn.one_hot(i, m, dtype=jnp.float32)
        return self.select_oh(oh)

    def select_oh(self, oh):
        """Select with a precomputed one-hot matrix (shared across the other
        per-primitive lookups of a bounce).

        Measured-and-rejected (r5, interleaved TPU A/B on the cornell
        forward): packing all 12 fields into ONE (R, P) x (P, 18) matmul
        + column slices LOST to this per-field tree_map form (36.5 vs
        39.2 ms/chunk — 229.9 vs 213.8 M rays/s). At small P the
        per-field "matmuls" compile to multiply-reduce fusions that fuse
        into their consumers, while the packed (R, 18) output pays a
        strided column extract per field (the same relayout tax the
        traversal rules document); re-reading the one-hot costs less
        than those relayouts."""
        pick = lambda a: jnp.matmul(oh, a, precision=jax.lax.Precision.HIGHEST)
        return jax.tree_util.tree_map(pick, self)

    @classmethod
    def from_host(cls, mats: list) -> "MaterialsFlat":
        """Stack a list of host Materials into the device SoA record."""
        return cls(
            emission=jnp.asarray(np.stack([m.emission for m in mats]) if mats else np.zeros((1, 3)), jnp.float32),
            color=jnp.asarray(np.stack([m.color for m in mats]) if mats else np.zeros((1, 3)), jnp.float32),
            absorption=jnp.asarray(np.stack([m.absorption for m in mats]) if mats else np.zeros((1, 3)), jnp.float32),
            eta=jnp.asarray([m.index_of_refraction() for m in mats] or [1.5], jnp.float32),
            metallic=jnp.asarray([m.metallic for m in mats] or [0.0], jnp.float32),
            subsurface=jnp.asarray([m.subsurface for m in mats] or [0.0], jnp.float32),
            specular=jnp.asarray([m.specular for m in mats] or [0.5], jnp.float32),
            roughness=jnp.asarray([m.roughness for m in mats] or [0.5], jnp.float32),
            specular_tint=jnp.asarray([m.specular_tint for m in mats] or [0.0], jnp.float32),
            clearcoat=jnp.asarray([m.clearcoat for m in mats] or [0.0], jnp.float32),
            clearcoat_gloss=jnp.asarray([m.clearcoat_gloss for m in mats] or [1.0], jnp.float32),
            transmission=jnp.asarray([m.transmission for m in mats] or [0.0], jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PrimsFlat:
    """Traced per-primitive parameters (continuous; differentiable)."""

    start_p: jax.Array  # (P, 3)
    start_q: jax.Array  # (P, 4)
    start_s: jax.Array  # (P,)
    end_p: jax.Array
    end_q: jax.Array
    end_s: jax.Array
    radius: jax.Array  # (P,)
    plane: jax.Array  # (P, 4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProbeFlat:
    data: jax.Array  # (H, W, 3)
    pdf_x: jax.Array  # (H, W)
    cdf_x: jax.Array  # (H, W)
    pdf_y: jax.Array  # (H,)
    cdf_y: jax.Array  # (H,)


@dataclasses.dataclass(frozen=True)
class PrimStatic:
    """Static (Python-land) facts about one primitive; shapes the jaxpr."""

    type: int
    mesh: Optional[MeshHandle]
    material_index: int
    light_samples: int
    # host-known "start == end transform": lets the trace path skip the
    # per-lane motion interpolation (lerp/nlerp over (I, R)) entirely for
    # static primitives — the common case for every non-motion-blur scene
    motion: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneFlat:
    prims: PrimsFlat
    materials: MaterialsFlat
    pool: MeshPool
    probe: Optional[ProbeFlat]
    sky_horizon: jax.Array  # (3,)
    sky_zenith: jax.Array  # (3,)
    # per-primitive lookup tables for data-dependent gathers at hit points
    prim_type: jax.Array = None  # (P,) i32
    prim_light_samples: jax.Array = None  # (P,) i32
    prim_local_area: jax.Array = None  # (P,) f32 (sphere: 4πr²; mesh: local area)
    prim_bump: jax.Array = None  # (P, 2) f32 [strength, tile]
    light_pmf: jax.Array = None  # (P,) f32: power-proportional selection
    # pmf over emissive prims (0 for non-lights) — used by the "power"
    # light-sampling mode; any positive pmf is unbiased, so it is frozen
    # at flatten time (luminance x world area) and NOT re-derived when
    # materials are replaced during optimization
    # static structure
    prim_static: tuple = field(metadata=dict(static=True), default=())
    light_indices: tuple = field(metadata=dict(static=True), default=())
    has_bump: bool = field(metadata=dict(static=True), default=False)
    # static: compiles the Perlin bump-normal evaluation only when some
    # material actually uses it, so bump-free scenes pay nothing

    @property
    def num_prims(self) -> int:
        return len(self.prim_static)


@dataclasses.dataclass
class Scene:
    primitives: List[Primitive] = field(default_factory=list)
    sky: Sky = field(default_factory=Sky)
    camera: Camera = field(default_factory=Camera)
    options: Options = field(default_factory=Options)

    def add_primitive(self, p: Primitive):
        self.primitives.append(p)

    # -- flattening ---------------------------------------------------------

    def flatten(self) -> SceneFlat:
        if not self.primitives:
            # sky-only scene: inject one invisible primitive (zero-radius
            # sphere, zero emission) so every per-primitive table has a
            # harmless row — rays can never hit it, so the render is
            # exactly the sky
            self = dataclasses.replace(
                self,
                primitives=[
                    Primitive(
                        type=SPHERE, radius=0.0,
                        material=Material(
                            color=np.zeros(3, np.float32),
                            emission=np.zeros(3, np.float32),
                        ),
                    )
                ],
            )
        # deduplicate meshes by object identity (instancing: many primitives
        # share one Mesh => one pool segment, like render.cu:1002-1011)
        mesh_list: List[Mesh] = []
        mesh_ids = {}
        for prim in self.primitives:
            if prim.type == MESH and prim.mesh is not None:
                if id(prim.mesh) not in mesh_ids:
                    mesh_ids[id(prim.mesh)] = len(mesh_list)
                    mesh_list.append(prim.mesh)

        handles: List[MeshHandle] = []
        node_rows_list = []
        tri_arrays = {k: [] for k in ("v0", "v1", "v2", "n0", "n1", "n2", "cdf")}
        node_off = 0
        tri_off = 0
        for m in mesh_list:
            if m.bvh is None or m.cdf is None or m.normals is None:
                m.build()
            # collapse the binary ranged-leaf tree into the 4-ary traversal
            # layout with padded 16-tri leaf blocks (accel/build.py)
            wide = build_wide_bvh(m.bvh)
            node_rows_list.append(wide.node_rows)
            # deindex triangles in block-padded order so a leaf is one
            # contiguous 192-float block row (one gather per leaf test)
            tri_idx = m.indices[wide.perm_padded]  # (Tp, 3) vertex ids
            v = m.positions[tri_idx]  # (Tp, 3, 3)
            n = m.normals[tri_idx]
            tri_arrays["v0"].append(v[:, 0])
            tri_arrays["v1"].append(v[:, 1])
            tri_arrays["v2"].append(v[:, 2])
            tri_arrays["n0"].append(n[:, 0])
            tri_arrays["n1"].append(n[:, 1])
            tri_arrays["n2"].append(n[:, 2])
            # area CDF over the padded order (padding slots contribute zero
            # mass, so lower_bound's first-index semantics never picks them)
            areas = 0.5 * np.linalg.norm(
                np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
            )
            areas = np.where(wide.real_mask, areas, 0.0)
            tri_arrays["cdf"].append(
                (np.cumsum(areas) / max(float(areas.sum()), 1e-30)).astype(
                    np.float32
                )
            )
            n_padded = len(wide.perm_padded)
            ss = wide_stack_bound(wide)
            # wider fan-out (set_wide_k 16) legitimately needs deeper
            # stacks (up to k-1 pushes per level); slots are cheap
            # (r5_periter_decomp: per-step cost is flat in slot count)
            if ss > 128:
                raise ValueError(
                    f"mesh BVH needs {ss} traversal stack slots (> 128): "
                    "pathologically deep tree — rebuild with a larger leaf "
                    "size or simplify the mesh"
                )
            handles.append(
                MeshHandle(
                    node_offset=node_off,
                    num_nodes=wide.num_nodes,
                    tri_offset=tri_off,
                    num_tris=n_padded,
                    real_tris=int(len(m.indices)),
                    area=float(m.area),
                    root_lower=tuple(float(x) for x in wide.root_lower),
                    root_upper=tuple(float(x) for x in wide.root_upper),
                    stack_slots=ss,
                )
            )
            node_off += wide.num_nodes
            tri_off += n_padded

        def cat(xs, dtype, width=None):
            if not xs:
                shape = (1, width) if width else (1,)
                return jnp.zeros(shape, dtype)
            out = np.concatenate([np.asarray(x) for x in xs], axis=0)
            return jnp.asarray(out, dtype)

        if node_rows_list:
            node_rows = np.concatenate(node_rows_list, axis=0)
        else:
            # empty pool: one terminal row (NaN child boxes never hit);
            # late import: the layout tracks the active WIDE_K
            from ..accel import build as _ab
            node_rows = np.full((1, _ab.NODE_ROW_WIDTH), np.nan, np.float32)
            node_rows[0, _ab.NODE_WORD_COL:] = 0.0
            node_rows[0, _ab.NODE_SKIP_COL] = np.int32(-1).view(np.float32)

        # (B, 12*BLOCK_SIZE) leaf-block rows: one row gather tests a whole
        # BLOCK_SIZE-tri leaf. Component-major within the row (B x v0x,
        # B x v0y, ..., B x v2z, 3B pad): the Moller-Trumbore sweep
        # consumes nine CONTIGUOUS B-wide column groups instead of 9
        # strided slices (see accel/traverse.py). Late import: tracks the
        # active set_block_size value.
        from ..accel import build as _abuild
        BLOCK_SIZE = _abuild.BLOCK_SIZE

        def blocks192():
            if not tri_arrays["v0"]:
                return jnp.zeros((1, BLOCK_SIZE * 12), jnp.float32)
            comps = [
                np.concatenate([np.asarray(x) for x in tri_arrays[key]])[:, i]
                for key in ("v0", "v1", "v2")
                for i in range(3)
            ]  # 9 x (Tp,)
            n_blocks = comps[0].shape[0] // BLOCK_SIZE
            out = np.zeros((n_blocks, BLOCK_SIZE * 12), np.float32)
            for g, comp in enumerate(comps):
                out[:, BLOCK_SIZE * g : BLOCK_SIZE * (g + 1)] = comp.reshape(
                    n_blocks, BLOCK_SIZE
                )
            return jnp.asarray(out)

        def planes9(k0, k1, k2):
            cols = []
            for k in (k0, k1, k2):
                a = (
                    np.concatenate([np.asarray(x) for x in tri_arrays[k]])
                    if tri_arrays[k]
                    else np.zeros((1, 3), np.float32)
                )
                cols.extend(
                    jnp.asarray(np.ascontiguousarray(a[:, i]), jnp.float32)
                    for i in range(3)
                )
            return tuple(cols)

        pool = MeshPool(
            node_rows=jnp.asarray(node_rows),
            block_rows=blocks192(),
            tri_cdf=cat(tri_arrays["cdf"], jnp.float32),
            tri_planes=planes9("v0", "v1", "v2"),
            nrm_planes=planes9("n0", "n1", "n2"),
        )

        # materials: one row per primitive (simple and gradient-friendly)
        mf = MaterialsFlat.from_host([p.material for p in self.primitives])

        prims = self.primitives or [Primitive()]
        ends = [p.resolved_end() for p in prims]
        pf = PrimsFlat(
            start_p=jnp.asarray(np.stack([p.start_transform.p for p in prims]), jnp.float32),
            start_q=jnp.asarray(np.stack([p.start_transform.q for p in prims]), jnp.float32),
            start_s=jnp.asarray([p.start_transform.s for p in prims], jnp.float32),
            end_p=jnp.asarray(np.stack([e.p for e in ends]), jnp.float32),
            end_q=jnp.asarray(np.stack([e.q for e in ends]), jnp.float32),
            end_s=jnp.asarray([e.s for e in ends], jnp.float32),
            radius=jnp.asarray([p.radius for p in prims], jnp.float32),
            plane=jnp.asarray(np.stack([p.plane for p in prims]), jnp.float32),
        )

        prim_static = []
        for i, p in enumerate(self.primitives):
            handle = None
            if p.type == MESH and p.mesh is not None:
                handle = handles[mesh_ids[id(p.mesh)]]
            e = p.resolved_end()
            st = p.start_transform
            # q and -q are the same rotation (quaternion double cover):
            # either match keeps the primitive on the static fast path
            sq, eq = np.asarray(st.q), np.asarray(e.q)
            moving = not (
                np.array_equal(np.asarray(st.p), np.asarray(e.p))
                and (np.array_equal(sq, eq) or np.array_equal(sq, -eq))
                and float(st.s) == float(e.s)
            )
            prim_static.append(
                PrimStatic(
                    type=p.type,
                    mesh=handle,
                    material_index=i,
                    light_samples=int(p.light_samples),
                    motion=moving,
                )
            )

        light_indices = tuple(
            i for i, p in enumerate(self.primitives) if p.light_samples > 0
        )

        probe_flat = None
        if self.sky.probe is not None:
            hp = self.sky.probe
            if hp.cdf_x is None:
                hp.build_cdf()
            probe_flat = ProbeFlat(
                data=jnp.asarray(hp.data, jnp.float32),
                pdf_x=jnp.asarray(hp.pdf_x, jnp.float32),
                cdf_x=jnp.asarray(hp.cdf_x, jnp.float32),
                pdf_y=jnp.asarray(hp.pdf_y, jnp.float32),
                cdf_y=jnp.asarray(hp.cdf_y, jnp.float32),
            )

        local_area = []
        for i, p in enumerate(prims):
            if p.type == SPHERE:
                local_area.append(4.0 * np.pi * p.radius * p.radius)
            elif p.type == MESH and p.mesh is not None:
                local_area.append(float(p.mesh.area))
            else:
                local_area.append(0.0)

        return SceneFlat(
            prims=pf,
            materials=mf,
            pool=pool,
            probe=probe_flat,
            sky_horizon=jnp.asarray(self.sky.horizon, jnp.float32),
            sky_zenith=jnp.asarray(self.sky.zenith, jnp.float32),
            prim_type=jnp.asarray([p.type for p in prims], jnp.int32),
            prim_light_samples=jnp.asarray(
                [p.light_samples for p in prims], jnp.int32
            ),
            prim_local_area=jnp.asarray(local_area, jnp.float32),
            prim_bump=jnp.asarray(
                [[p.material.bump, p.material.bump_tile] for p in prims]
                or np.zeros((1, 2)),
                jnp.float32,
            ),
            light_pmf=jnp.asarray(_light_pmf(prims, local_area), jnp.float32),
            prim_static=tuple(prim_static),
            light_indices=light_indices,
            has_bump=any(p.material.bump > 0.0 for p in prims),
        )
