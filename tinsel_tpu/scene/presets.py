"""Procedural test scenes (the analog of the reference's compiled-in
src/tests/ scene builders and data/*.tin classics)."""

from __future__ import annotations

import numpy as np

from .model import (
    Camera,
    HostTransform,
    Material,
    Mesh,
    MESH,
    Options,
    PLANE,
    Primitive,
    Scene,
    Sky,
    SPHERE,
)


def quad_mesh(half: float = 0.25) -> Mesh:
    return Mesh(
        positions=np.array(
            [[-half, 0, half], [half, 0, half], [half, 0, -half], [-half, 0, -half]],
            np.float32,
        ),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )


def sphere_mesh(radius: float = 1.0, n_theta: int = 16, n_phi: int = 32) -> Mesh:
    """UV-sphere triangle mesh (procedural, like mesh.cpp's CreateSphere)."""
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in th:
        for p in ph:
            verts.append(
                [
                    radius * np.sin(t) * np.cos(p),
                    radius * np.cos(t),
                    radius * np.sin(t) * np.sin(p),
                ]
            )
    verts = np.asarray(verts, np.float32)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            idx.append([a, c, b])
            idx.append([b, c, d])
    return Mesh(positions=verts, indices=np.asarray(idx, np.int32))


def cornell_scene(width: int = 256, height: int = 256, max_depth: int = 4) -> Scene:
    """The classic Cornell box (mirrors data/cornell.tin: five planes, quad
    area light, glossy + metal spheres)."""
    scene = Scene()
    scene.camera = Camera(
        position=np.array([0.0, 1.0, 4.0], np.float32),
        fov=float(np.deg2rad(35.0)),
    )
    scene.options = Options(
        width=width, height=height, max_depth=max_depth,
        filter_type="gaussian", filter_width=1.0, filter_falloff=1.0,
        exposure=1.0,
    )

    def wall(eq, color):
        return Primitive(
            type=PLANE,
            plane=np.array(eq, np.float32),
            material=Material(
                color=np.array(color, np.float32), roughness=1.0, specular=0.2
            ),
        )

    scene.add_primitive(wall([0, 1, 0, 0], [0.725, 0.71, 0.68]))
    scene.add_primitive(wall([1, 0, 0, 1], [0.63, 0.065, 0.05]))
    scene.add_primitive(wall([-1, 0, 0, 1], [0.14, 0.45, 0.091]))
    scene.add_primitive(wall([0, -1, 0, 2], [0.725, 0.71, 0.68]))
    scene.add_primitive(wall([0, 0, 1, 1], [0.725, 0.71, 0.68]))

    scene.add_primitive(
        Primitive(
            type=MESH,
            mesh=quad_mesh(0.25),
            start_transform=HostTransform(p=np.array([0, 1.9999, 0], np.float32)),
            material=Material(
                color=np.zeros(3, np.float32),
                emission=np.array([18.4, 15.6, 8.0], np.float32),
                specular=0.0,
                metallic=0.0,
            ),
            light_samples=1,
        )
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=0.5,
            start_transform=HostTransform(p=np.array([0.35, 0.5, 0], np.float32)),
            material=Material(
                color=np.full(3, 0.7, np.float32), roughness=0.1, specular=0.8
            ),
        )
    )
    scene.add_primitive(
        Primitive(
            type=SPHERE,
            radius=0.5,
            start_transform=HostTransform(
                p=np.array([-0.5, 0.25, 0], np.float32), s=0.5
            ),
            material=Material(
                color=np.full(3, 0.7, np.float32),
                roughness=0.1,
                specular=0.8,
                metallic=1.0,
            ),
        )
    )
    return scene


def envmesh_scene(width: int = 256, height: int = 256, max_depth: int = 4,
                  detail: int = 256, probe: bool = False) -> Scene:
    """Environment-lit high-poly mesh over a ground plane — the ajaxenv.tin
    analog (env-lit ~500k-tri bust, BASELINE.json configs): a Perlin-
    displaced sphere of 2*detail^2 triangles under the gradient sky, or
    under a procedural HDR probe (probe=True: probe NEE + escape MIS at
    heavy-BVH scale, the full ajaxenv configuration). The end-to-end
    heavy-traversal benchmark scene."""
    from .procedural import sphere as proc_sphere

    scene = Scene()
    scene.camera = Camera(
        position=np.array([0.0, 1.0, 3.2], np.float32),
        fov=float(np.deg2rad(40.0)),
    )
    scene.options = Options(
        width=width, height=height, max_depth=max_depth,
        filter_type="gaussian", filter_width=1.0, filter_falloff=1.0,
    )
    scene.sky = Sky(
        horizon=np.array([0.9, 0.85, 0.75], np.float32),
        zenith=np.array([0.25, 0.4, 0.75], np.float32),
    )
    if probe:
        from .probe_io import create_test_probe

        scene.sky.probe = create_test_probe(128, 64)

    mesh = proc_sphere(radius=0.8, n_theta=detail, n_phi=detail)
    # radial Perlin displacement -> irregular BVH like a scanned bust
    from ..utils.perlin import fractal3d

    p = mesh.positions
    disp = np.asarray(
        fractal3d(p[:, 0] * 3.0, p[:, 1] * 3.0, p[:, 2] * 3.0, octaves=4)
    ).astype(np.float32)
    r = np.linalg.norm(p, axis=-1, keepdims=True)
    mesh.positions = (p / np.maximum(r, 1e-9)) * (
        0.8 + 0.18 * disp[:, None]
    ).astype(np.float32)
    mesh.build()

    scene.add_primitive(
        Primitive(
            type=MESH,
            mesh=mesh,
            start_transform=HostTransform(
                p=np.array([0.0, 1.0, 0.0], np.float32)
            ),
            material=Material(
                color=np.array([0.65, 0.6, 0.55], np.float32),
                roughness=0.35,
                specular=0.6,
            ),
        )
    )
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
            material=Material(
                color=np.array([0.5, 0.5, 0.5], np.float32), roughness=0.8
            ),
        )
    )
    return scene


def instances_scene(width: int = 256, height: int = 256, max_depth: int = 3,
                    grid: int = 4) -> Scene:
    """Instancing stress test (TestPaniq analog, testMaterials.h:175-341):
    a grid x grid field of primitives SHARING one mesh object — the pool
    stores the geometry once (flatten dedups by object identity, like the
    reference's mesh.id dedup render.cu:1002-1011) while every instance
    gets its own transform and palette material."""
    from .procedural import capsule

    scene = Scene()
    scene.camera = Camera(
        position=np.array([0.0, 2.5, 6.0], np.float32),
        fov=float(np.deg2rad(42.0)),
    )
    scene.options = Options(width=width, height=height, max_depth=max_depth)
    scene.sky = Sky(
        horizon=np.array([0.8, 0.8, 0.85], np.float32),
        zenith=np.array([0.3, 0.4, 0.65], np.float32),
    )

    shared = capsule(radius=0.3, half_height=0.25, slices=12, segments=24)
    shared.build()

    for iy in range(grid):
        for ix in range(grid):
            t = (iy * grid + ix) / max(grid * grid - 1, 1)
            from ..core.color import hsv_to_rgb
            import jax.numpy as jnp

            rgb = np.asarray(
                hsv_to_rgb(jnp.float32(t * 0.8), jnp.float32(0.6), jnp.float32(0.8))
            ).astype(np.float32)
            scene.add_primitive(
                Primitive(
                    type=MESH,
                    mesh=shared,  # same object: instanced
                    start_transform=HostTransform(
                        p=np.array(
                            [
                                (ix - (grid - 1) / 2) * 1.2,
                                0.55,
                                (iy - (grid - 1) / 2) * 1.2,
                            ],
                            np.float32,
                        )
                    ),
                    material=Material(
                        color=rgb, roughness=0.3 + 0.5 * t, specular=0.6
                    ),
                )
            )
    scene.add_primitive(
        Primitive(
            type=PLANE,
            plane=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
            material=Material(
                color=np.array([0.55, 0.55, 0.55], np.float32), roughness=0.8
            ),
        )
    )
    return scene


def dryrun_scene(width: int = 16, height: int = 16) -> Scene:
    """Tiny scene exercising every primitive type + a light, for compile
    validation on virtual devices."""
    scene = cornell_scene(width=width, height=height, max_depth=2)
    return scene


def many_mesh_scene(n_meshes: int = 48, width: int = 128, height: int = 128,
                    max_depth: int = 2, seed: int = 0) -> Scene:
    """Sportscar/table-class stress scene: `n_meshes` DISTINCT meshes (no
    instancing dedup — every primitive owns its own sub-BVH segment), each
    with its own material, on a floor under a quad light. Exercises the
    many-primitive scaling path: all mesh primitives trace through ONE
    batched traversal with vector sub-BVH offsets (render/trace.py), so
    compile time stays flat in mesh count. Match:
    /root/reference/data/sportscar.tin, scene.h:138-159."""
    from .procedural import capsule, sphere, tetrahedron

    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.options = Options(width=width, height=height, max_depth=max_depth)
    scene.camera = Camera(
        position=np.array([0.0, 3.0, 9.0], np.float32),
        rotation=np.array([-0.12, 0, 0, 0.993], np.float32),
        fov=float(np.deg2rad(40)),
    )
    scene.sky = Sky(
        horizon=np.array([0.1, 0.12, 0.15], np.float32),
        zenith=np.array([0.03, 0.04, 0.08], np.float32),
    )
    scene.add_primitive(
        Primitive(type=PLANE, plane=np.array([0, 1, 0, 0], np.float32))
    )
    # quad light overhead
    scene.add_primitive(
        Primitive(
            type=MESH,
            mesh=quad_mesh(1.5),
            material=Material(
                emission=np.array([12.0, 11.0, 9.0], np.float32),
                color=np.zeros(3, np.float32),
            ),
            start_transform=HostTransform(
                p=np.array([0, 6.0, 0], np.float32)
            ),
            light_samples=1,
        )
    )
    side = int(np.ceil(np.sqrt(n_meshes)))
    for k in range(n_meshes):
        kind = k % 3
        # distinct tessellations -> distinct mesh objects and BVHs
        if kind == 0:
            m = sphere(1.0, 8 + (k % 5) * 2, 16 + (k % 7) * 2)
        elif kind == 1:
            m = capsule(0.5, 0.5, 8 + (k % 4) * 2, 12 + (k % 5) * 2)
        else:
            m = tetrahedron(0.0, 1.0 + 0.1 * (k % 4))
        gx = (k % side) - (side - 1) / 2.0
        gz = (k // side) - (side - 1) / 2.0
        scene.add_primitive(
            Primitive(
                type=MESH,
                mesh=m,
                material=Material(
                    color=rng.uniform(0.2, 0.9, 3).astype(np.float32),
                    roughness=float(rng.uniform(0.1, 0.9)),
                    metallic=float(k % 2),
                ),
                start_transform=HostTransform(
                    p=np.array([1.6 * gx, 0.55, 1.6 * gz], np.float32),
                    s=0.5,
                ),
            )
        )
    return scene
