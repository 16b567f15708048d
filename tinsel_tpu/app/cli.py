"""Command-line renderer (main.cpp parity, headless-first).

Flags mirror the reference CLI (main.cpp:143-171): `-spp= -width= -height=
-exposure= -maxdepth=` plus `-convert` (mesh -> cache). Batch animation mode
triggers on a `%d` pattern in the scene filename (main.cpp:105-118): each
frame renders to completion and writes `frame_N.png`. Additions over the
reference: `-o` output path, `-mode normals`, `-denoise` (NLM pass) and
`-denoise-guided` (AOV-guided joint NLM), `-aov` (normal/depth/albedo
PFMs), `-checkpoint/-resume` for preemptible renders, `-seed`,
`-sampler` (stratified/blue-noise), `-rr` (Russian roulette),
`-adaptive` (variance-driven tile sampling), `-lights power` (power-CDF
single-light NEE), `-view` (interactive HTTP viewer with fly camera).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        prog="tinsel-tpu", description="TPU-native path tracer"
    )
    p.add_argument("scene", nargs="?", help=".tin/.json scene (use %%d for batch)")
    p.add_argument("-spp", type=int, default=None, help="samples per pixel")
    p.add_argument("-width", type=int, default=None)
    p.add_argument("-height", type=int, default=None)
    p.add_argument("-exposure", type=float, default=None)
    p.add_argument("-maxdepth", type=int, default=None)
    p.add_argument("-clamp", type=float, default=None)
    p.add_argument(
        "-aov", action="store_true",
        help="also write per-pixel normal/depth/albedo AOV PFMs next to "
        "the output image (denoiser guide channels; extension)",
    )
    p.add_argument(
        "-adaptive", type=float, default=0.0, metavar="FRAC",
        help="adaptive sampling: each round spends the whole sample batch "
        "on the FRAC highest-variance 16x16 tiles (0 disables; an "
        "extension — the reference samples uniformly forever). "
        "Incompatible with -view/-checkpoint/-progressive",
    )
    p.add_argument(
        "-lights", choices=["all", "power"], default=None,
        help="NEE strategy: 'all' traces one shadow ray per light "
        "(reference parity); 'power' picks one light per lane from a "
        "power CDF — O(1) shadow traversals per bounce (extension)",
    )
    p.add_argument(
        "-rr", type=int, default=None, metavar="N",
        help="Russian-roulette start bounce (unbiased early termination "
        "of low-throughput paths; the reference has none — 0 disables, "
        "matching its run-to-maxDepth behavior)",
    )
    p.add_argument(
        "-mode", choices=["pathtrace", "normals", "complexity"], default=None
    )
    p.add_argument(
        "-sampler", choices=["random", "stratified", "bluenoise"],
        default=None,
        help="pixel/shutter sampler; stratified/bluenoise wire the QMC kit "
        "the reference ships disabled (sampler.h:6-45, 80-131)",
    )
    p.add_argument(
        "-progressive", type=int, default=0, metavar="N",
        help="write a preview PNG every N spp (headless analog of the "
        "reference's progressive GLUT viewer, main.cpp:242-258)",
    )
    p.add_argument("-o", "--output", default=None, help="output PNG path")
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-tonemap", choices=["filmic", "reinhard"], default="filmic",
                   help="display transform; reinhard consumes options.limit")
    p.add_argument("-denoise", action="store_true", help="NLM pass on output")
    p.add_argument(
        "-denoise-guided", action="store_true",
        help="joint NLM guided by normal/depth/albedo AOVs (extension; "
        "implies an AOV trace)",
    )
    p.add_argument("-nlm-falloff", type=float, default=200.0)
    p.add_argument("-nlm-radius", type=int, default=1)
    p.add_argument("-checkpoint", default=None, help="checkpoint file path")
    p.add_argument("-checkpoint-every", type=int, default=64)
    p.add_argument("-guard-retries", type=int, default=2,
                   help="per-chunk retry budget for NaN/device-failure "
                   "recovery (parallel/failure.py)")
    p.add_argument("-resume", action="store_true")
    p.add_argument("-convert", default=None, metavar="MESH",
                   help="convert a mesh to the .npz cache format and exit")
    p.add_argument("-view", action="store_true",
                   help="interactive progressive viewer (HTTP) — the "
                   "headless analog of the reference's GLUT loop")
    p.add_argument("-port", type=int, default=8000)
    p.add_argument("-batch-start", type=int, default=0)
    p.add_argument("-batch-count", type=int, default=1_000_000)
    return p


def load_scene(path: str):
    from ..scene.loaders.tin import load_tin

    if path.endswith(".json"):
        from ..scene.loaders.tungsten import load_tungsten

        return load_tungsten(path)
    return load_tin(path)


def render_one(scene, args, out_path: str):
    import jax
    import jax.numpy as jnp

    from ..core.color import resolve
    from ..io.png import write_png
    from ..render.camera import CameraParams
    from ..render.renderer import make_accumulate_fn
    from ..ops.pallas.nlm import nlm_denoise
    from ..parallel.checkpoint import load_checkpoint, save_checkpoint
    from ..parallel.failure import ChunkGuard

    o = scene.options
    if args.spp is not None:
        o.max_samples = args.spp
    if args.width is not None:
        o.width = args.width
    if args.height is not None:
        o.height = args.height
    if args.exposure is not None:
        o.exposure = args.exposure
    if args.maxdepth is not None:
        o.max_depth = args.maxdepth
    if args.rr is not None:
        o.rr_depth = args.rr
    if args.lights is not None:
        o.light_sampling = args.lights
    if args.clamp is not None:
        o.clamp = args.clamp
    if args.mode is not None:
        o.mode = args.mode
    if args.sampler is not None:
        o.sampler = args.sampler

    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(args.seed, impl=getattr(o, "prng", "rbg"))

    spp = o.max_samples if o.mode == "pathtrace" else 1

    if args.adaptive > 0.0 and o.mode == "pathtrace":
        if args.checkpoint or args.resume or args.progressive:
            raise SystemExit(
                "-adaptive does not combine with -checkpoint/-resume/"
                "-progressive (per-tile counts are not checkpointed)"
            )
        from ..render.adaptive import adaptive_render

        t0 = time.perf_counter()
        accum = adaptive_render(
            scene, budget_spp=spp, seed=args.seed, options=o,
            frac=args.adaptive,
        )
        accum.block_until_ready()
        dt = time.perf_counter() - t0
        print(
            f"adaptive: {spp} avg spp in {dt:.2f}s "
            f"({dt / max(spp, 1) * 1e3:.1f} ms/spp)"
        )
        img = np.asarray(resolve(accum, exposure=o.exposure,
                                 limit=o.limit, tonemap=args.tonemap))
        write_png(out_path, img)
        print(f"wrote {out_path}")
        return
    chunk = max(1, min(spp, (1 << 20) // max(o.width * o.height, 1)))
    if args.progressive:
        chunk = max(1, min(chunk, args.progressive))
    step = make_accumulate_fn(o, chunk)

    accum = jnp.zeros((o.height, o.width, 4), jnp.float32)
    start_spp = 0
    if args.resume and args.checkpoint and os.path.exists(args.checkpoint):
        a, start_spp, seed, _ = load_checkpoint(args.checkpoint)
        accum = jnp.asarray(a)
        print(f"resumed {args.checkpoint} at {start_spp} spp")

    guard = ChunkGuard(retries=args.guard_retries,
                       salvage_path=args.checkpoint, seed=args.seed)
    t0 = time.perf_counter()
    s = start_spp
    ckpt_mark = s
    c = s // chunk
    while s < spp:
        this = min(chunk, spp - s)
        if this == chunk:
            accum = guard.run(step, accum, flat, cam, key, c, spp_done=s)
        else:
            step_rem = make_accumulate_fn(o, this)
            accum = guard.run(step_rem, accum, flat, cam, key, c, spp_done=s)
        s += this
        c += 1
        if args.progressive and s % args.progressive == 0 and s < spp:
            img = np.asarray(resolve(accum, exposure=o.exposure,
                                     limit=o.limit, tonemap=args.tonemap))
            base, ext = os.path.splitext(out_path)
            write_png(f"{base}_spp{s:05d}{ext or '.png'}", img)
            el = time.perf_counter() - t0
            print(
                f"{s} spp  render: ({el / max(s - start_spp, 1) * 1e3:.1f} "
                f"ms/spp) total: ({el * 1e3:.1f} ms)", flush=True
            )
        if args.checkpoint and s - ckpt_mark >= args.checkpoint_every:
            accum.block_until_ready()
            save_checkpoint(args.checkpoint, np.asarray(accum), s, args.seed)
            ckpt_mark = s
            print(f"checkpoint @ {s} spp")
    accum.block_until_ready()
    dt = time.perf_counter() - t0
    done = max(spp - start_spp, 1)
    print(
        f"{spp} spp in {dt:.2f}s ({dt / done * 1000:.1f} ms/spp, "
        f"{o.width * o.height * done / max(dt, 1e-9) / 1e6:.2f} Mpaths/s)"
    )

    if o.mode in ("normals", "complexity"):
        img = np.asarray(jnp.clip(accum[..., :3], 0.0, 1.0))
    else:
        img = resolve(accum, exposure=o.exposure, limit=o.limit,
                      tonemap=args.tonemap)
        if args.denoise_guided:
            from ..render.aov import render_aovs
            from ..ops.pallas.nlm import nlm_guided_denoise

            aovs = render_aovs(flat, cam, o.width, o.height)
            img = nlm_guided_denoise(
                jnp.asarray(img), aovs["normal"], aovs["albedo"],
                aovs["depth"], falloff=args.nlm_falloff,
            )
        elif args.denoise:
            img = nlm_denoise(img, args.nlm_falloff, args.nlm_radius)
        img = np.asarray(img)
    from ..io.png import write_png as _wp

    _wp(out_path, img)
    print(f"wrote {out_path}")
    if args.aov:
        from ..render.aov import render_aovs, write_aovs

        base = os.path.splitext(out_path)[0]
        for pth in write_aovs(base, render_aovs(flat, cam, o.width, o.height)):
            print(f"wrote {pth}")


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    if args.convert:
        from ..scene.loaders.mesh_io import import_mesh, save_mesh_cache

        mesh = import_mesh(args.convert, cache=False)
        out = os.path.splitext(args.convert)[0] + ".npz"
        save_mesh_cache(out, mesh)
        print(f"converted {args.convert} -> {out}")
        return 0

    if not args.scene:
        print("error: no scene file given", file=sys.stderr)
        return 2

    if "%" in args.scene:  # batch animation mode
        frame = args.batch_start
        rendered = 0
        while rendered < args.batch_count:
            path = args.scene % frame
            if not os.path.exists(path):
                break
            scene = load_scene(path)
            out = args.output or f"frame_{frame}.png"
            out = out % frame if "%" in out else out
            render_one(scene, args, out)
            frame += 1
            rendered += 1
        return 0

    scene = load_scene(args.scene)
    if args.view:
        from .viewer import run_viewer

        o = scene.options
        for name, val in (("max_samples", args.spp), ("width", args.width),
                          ("height", args.height), ("exposure", args.exposure),
                          ("max_depth", args.maxdepth), ("clamp", args.clamp)):
            if val is not None:
                setattr(o, name, val)
        run_viewer(scene, o, seed=args.seed, port=args.port,
                   nlm_falloff=args.nlm_falloff, nlm_radius=args.nlm_radius)
        return 0
    out = args.output or os.path.splitext(os.path.basename(args.scene))[0] + ".png"
    render_one(scene, args, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
