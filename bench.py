#!/usr/bin/env python
"""Benchmark: Cornell-box path tracing throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Metric: traced rays/second, forward path. Ray count per 1spp pass =
W*H * maxDepth * (1 closest-hit + n_light shadow rays per bounce) — the
machine rate of the lockstep wavefront (dead lanes still occupy vector
lanes, exactly like idle reference wavefront threads, wavefront.cu:918).
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded round of this framework (r1 sets 1.0).

Timing note: on the tunneled TPU runtime, block_until_ready() returns
before device work completes — every timed section therefore ends with a
real host transfer (np.asarray), which cannot be faked.

Methodology (r3): every metric is a SLOPE between two in-jit iteration
counts. The tunnel's per-dispatch overhead was measured at 14-28 ms and
VARIES BY SESSION (benchmarks/r5_overhead.py) — single-dispatch timings
therefore measure the tunnel, not the machine (r2's apparent 11% cornell
"regression" was largely this). Work is iterated INSIDE one jit
(lax.fori_loop / lax.scan) and the constant cancels in the slope; a
`dispatch_ms` field reports the floor for the record.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# honest r1 anchor measured with host-transfer sync (this file's own method)
R1_FWD_RAYS_PER_SEC = 84_000_000.0


def _best_recorded():
    """Best forward/bigmesh numbers over all recorded driver rounds
    (BENCH_r*.json in the repo root) — the regression gate: vs_prev_round
    compares THIS run to the best any previous round achieved, so a
    regression shows up as < 1.0 even while vs_baseline still flatters."""
    import glob
    import os

    best_fwd, best_big = 0.0, 0.0
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                txt = f.read()
        except OSError:
            continue
        # driver files hold one or more {"parsed": {...}} records
        import re

        for m in re.finditer(r'"parsed"\s*:\s*{', txt):
            dec = json.JSONDecoder()
            try:
                rec, _ = dec.raw_decode(txt[m.end() - 1:])
            except ValueError:
                continue
            if "tpu" not in str(rec.get("platform", "")):
                continue  # CPU-fallback rounds are not comparable
            best_fwd = max(best_fwd, float(rec.get("value", 0.0)))
            best_big = max(
                best_big,
                float(rec.get("bigmesh_524k_closest_hit_mrays_per_sec", 0.0)),
            )
    return best_fwd, best_big


def _probe_device(timeout_s: int = 180) -> bool:
    """Check the default JAX backend initializes, from a SUBPROCESS with a
    timeout — a dead axon tunnel hangs device init forever inside the
    process, which would hang the whole benchmark run."""
    import os
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=dict(os.environ),
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def main():
    import os

    degraded = None
    if not _probe_device():
        # honest fallback: the TPU tunnel is down — measure on CPU and say
        # so, rather than hanging or printing nothing
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        degraded = "tpu unavailable (device init timed out); CPU fallback"

    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams

    width = height = 256 if not degraded else 64  # CPU fallback shrinks
    max_depth = 4
    scene = cornell_scene(width=width, height=height, max_depth=max_depth)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    n_lights = len(flat.light_indices)
    rays_per_pass = width * height * max_depth * (1 + n_lights)

    spp_chunk = 16 if not degraded else 4
    from tinsel_tpu.render.renderer import make_render_pass

    pass_fn = make_render_pass(scene.options, spp_chunk)
    key = jax.random.key(0, impl="rbg")
    acc0 = jnp.zeros((height, width, 4), jnp.float32)

    def n_chunk_fn(n):
        @jax.jit
        def run(flat, cam, key):
            def body(c, acc):
                return acc + pass_fn(flat, cam, jax.random.fold_in(key, c))
            return jax.lax.fori_loop(0, n, body, acc0)
        return run

    def timed(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2]

    lo, hi = (2, 8) if not degraded else (1, 2)
    t_lo = timed(n_chunk_fn(lo), flat, cam, key)
    t_hi = timed(n_chunk_fn(hi), flat, cam, key)
    per_chunk = (t_hi - t_lo) / (hi - lo)
    dt = per_chunk * hi  # back-compat for spp_per_sec below
    n_timed = hi * spp_chunk
    fwd_rays_per_sec = rays_per_pass * spp_chunk / per_chunk

    # dispatch floor, for the record (varies by tunnel session)
    triv = jax.jit(lambda x: x + 1.0)
    dispatch_ms = timed(triv, acc0) * 1e3

    # fwd+bwd step (material+camera gradients); keys derived on device.
    # 4 spp per dispatch: grad throughput saturates there (measured r2);
    # the matched-granularity forward is timed alongside so the reported
    # ratio compares like with like.
    grad_spp = 4
    opts = dict(
        width=width, height=height, max_depth=max_depth,
        samples_per_pass=grad_spp,
    )
    target = jnp.zeros((height, width, 3), jnp.float32)
    from tinsel_tpu.diff.gradients import render_loss, render_loss_and_grads_scan

    def grad_n_fn(n):
        # reduce the gradients into the output — returning loss alone
        # lets XLA dead-code-eliminate the whole backward pass (measured:
        # "backward" 0.92x forward)
        def run(f, c, k):
            loss, grads = render_loss_and_grads_scan(
                f, c, k, target, n, **opts
            )
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
            return jnp.stack([loss, gsum])  # both live outputs
        return jax.jit(run)

    # r5: widened from (1, 4) — the 3-chunk slope (~78 ms of work) left
    # the ratio swinging 2.56-3.31 between runs under dispatch jitter
    glo, ghi = (2, 10) if not degraded else (1, 2)
    tg_lo = timed(grad_n_fn(glo), flat, cam, key, reps=5)
    tg_hi = timed(grad_n_fn(ghi), flat, cam, key, reps=5)
    per_grad = (tg_hi - tg_lo) / (ghi - glo)
    fwdbwd_rays_per_sec = rays_per_pass * grad_spp / per_grad

    def fwd_n_fn(n):
        @jax.jit
        def run(f, c, k):
            def body(i, acc):
                return acc + render_loss(
                    f, c, jax.random.fold_in(k, i), target, **opts
                )
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    tf_lo = timed(fwd_n_fn(glo), flat, cam, key, reps=5)
    tf_hi = timed(fwd_n_fn(ghi), flat, cam, key, reps=5)
    per_fwd_matched = (tf_hi - tf_lo) / (ghi - glo)
    bwd_ratio_matched = per_grad / per_fwd_matched

    # secondary: large-mesh BVH closest-hit (524k-tri sphere, 65k rays)
    # (skipped in CPU fallback: a 524k-tri traversal takes tens of minutes
    # off-accelerator and measures nothing about the framework)
    if not degraded:
        bigmesh_mrays, bigmesh_perray = _bigmesh_metric()
    else:
        bigmesh_mrays = bigmesh_perray = 0.0

    # speed-of-light accounting (see README "Speed of light" for the model)
    hbm_gbps = _measure_hbm_bw()
    bigmesh_sol_mrays = hbm_gbps * 1e9 / _BIGMESH_BYTES_PER_RAY / 1e6
    fwd_bpr = _fwd_bytes_per_ray(
        pass_fn, flat, cam, key, rays_per_pass * spp_chunk
    )
    fwd_sol_rays = hbm_gbps * 1e9 / fwd_bpr
    # the MEASURED limiter for traversal is not HBM bandwidth but the
    # per-lane issue rate of the dependent in-loop gather step. Both
    # roofline inputs are RE-MEASURED each run (r3 VERDICT #4 — the old
    # hardcoded 8.5 ns x 5.5 steps drifted as the tree changed):
    # steps/ray from traversal_cost on the exact bench workload, and
    # ns/lane/step from a chained capped-walk slope of the SHIPPED _step
    # (method: benchmarks/r7_stepcost.py).
    # NOTE r5: this roofline models the PER-RAY walk (one gather lane
    # per ray-step). The headline bigmesh number now uses shared-walk
    # packets (accel/packets.py), which amortize ~G/inflation gather
    # lanes per ray-step — the packet number can legitimately approach
    # or EXCEED this model's ceiling; compare bigmesh_perray to it.
    if not degraded:
        step_stats = _bigmesh_step_stats()
        bigmesh_issue_sol_mrays = 1e3 / (
            step_stats["step_ns_per_lane"] * step_stats["steps_mean"]
        )
    else:
        step_stats = dict(
            steps_mean=0.0, steps_p99=0.0, steps_max=0.0,
            tile_max_mean=0.0, step_ns_per_lane=0.0,
        )
        bigmesh_issue_sol_mrays = float("inf")

    platform = jax.devices()[0].platform
    if degraded:
        platform = f"{platform} [{degraded}]"
    best_fwd, best_big = _best_recorded()
    print(
        json.dumps(
            {
                "metric": f"cornell_{width}_d{max_depth}_forward_rays_per_sec",
                "value": round(fwd_rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": round(fwd_rays_per_sec / R1_FWD_RAYS_PER_SEC, 3),
                "vs_prev_round": round(fwd_rays_per_sec / best_fwd, 3)
                if best_fwd else None,
                "bigmesh_vs_prev_round": round(bigmesh_mrays / best_big, 3)
                if (best_big and bigmesh_mrays) else None,
                "fwd_bwd_rays_per_sec": round(fwdbwd_rays_per_sec),
                "fwd_bwd_over_fwd_matched_spp": round(bwd_ratio_matched, 2),
                "spp_per_sec": round(n_timed / dt, 3),
                "bigmesh_524k_closest_hit_mrays_per_sec": bigmesh_mrays,
                "bigmesh_perray_mrays_per_sec": bigmesh_perray,
                "hbm_bw_gbps": round(hbm_gbps, 1),
                "bigmesh_sol_mrays_per_sec": round(bigmesh_sol_mrays, 1),
                "bigmesh_sol_fraction": round(
                    bigmesh_mrays / bigmesh_sol_mrays, 4
                ) if bigmesh_mrays else 0.0,
                "bigmesh_issue_sol_mrays_per_sec": round(
                    bigmesh_issue_sol_mrays, 1
                ) if bigmesh_mrays else None,
                "bigmesh_issue_sol_fraction": round(
                    bigmesh_mrays / bigmesh_issue_sol_mrays, 4
                ) if bigmesh_mrays else 0.0,
                "bigmesh_steps_per_ray_mean": step_stats["steps_mean"],
                "bigmesh_steps_per_ray_p99": step_stats["steps_p99"],
                "bigmesh_steps_per_ray_max": step_stats["steps_max"],
                "bigmesh_steps_per_tile_max_mean": step_stats[
                    "tile_max_mean"
                ],
                "bigmesh_step_ns_per_lane": step_stats["step_ns_per_lane"],
                "fwd_sol_rays_per_sec": round(fwd_sol_rays),
                "fwd_sol_fraction": round(fwd_rays_per_sec / fwd_sol_rays, 4),
                "fwd_bytes_per_ray": round(fwd_bpr, 1),
                "dispatch_ms": round(dispatch_ms, 1),
                "platform": platform,
            }
        )
    )


# --------------------------------------------------- speed-of-light model
#
# The roofline is HBM-traffic based: a machine limited only by memory
# bandwidth must move at least the bytes below per ray; SOL rays/s =
# measured_BW / bytes_per_ray. Per-ray byte minima come from the step
# simulators in benchmarks/step_stats*.py run on exactly the bench
# workloads (provenance in README). The measured fraction is honest about
# this machine's real limiter — serial gather LATENCY, not bandwidth —
# which is why it is far below 1.

# bigmesh: mean 13.5 node visits x 68 consumed bytes (17 cols) + mean 2.1
# hit leaf blocks x 576 bytes (144 consumed cols of the 192-col block row)
_BIGMESH_BYTES_PER_RAY = 13.5 * 68 + 2.1 * 576

# cornell forward: derived per run from XLA's own cost analysis of the
# compiled render pass ("bytes accessed" / counted rays) instead of the
# r1-r4 hand guess (2*32*4 = 256 B). NOTE the accounting: a lax.scan
# body's bytes count ONCE regardless of trip count (an early r5 probe
# read ~1100 B/ray from the scan-structured pass — an undercount); the
# unrolled pass reports ~4000 B/ray. "Bytes accessed" is per-op operand
# traffic, not unique HBM traffic, so achieved rays/s can exceed
# BW/bytes (VMEM reuse) — a fraction near/above 1 reads as "the forward
# streams its accounted operand bytes at full bandwidth", i.e. it is
# fusion/traffic bound, not compute bound. Fallback if the backend
# offers no cost analysis:
_FWD_BYTES_PER_RAY_FALLBACK = 4000.0


def _fwd_bytes_per_ray(pass_fn, flat, cam, key, rays_per_pass):
    """XLA-reported bytes accessed per counted ray for one compiled
    render pass — the forward roofline's traffic model (measured, not
    modeled by hand; see benchmarks/r8_fwd_decomp.py)."""
    try:
        ca = jax.jit(pass_fn).lower(flat, cam, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        b = float(ca.get("bytes accessed", 0.0))
        if b > 0:
            return b / rays_per_pass
    except Exception:
        pass
    return _FWD_BYTES_PER_RAY_FALLBACK


def _measure_hbm_bw():
    """Effective streaming HBM bandwidth from an in-jit repeated saxpy
    (2 reads + 1 write per element per iteration), measured BY SLOPE
    between two in-jit iteration counts like every other number here.
    The r1-r3 version timed a single small dispatch (64 MB x 8 iters
    ~ 2 ms of real work under a 14-31 ms tunnel dispatch) and reported
    127-156 GB/s; the slope on a VMEM-exceeding working set measures
    ~713 GB/s on the same chip (benchmarks/r9_vpu_ceiling.py) — the r4
    SoL fractions changed accordingly, the machine did not."""
    n = 32 * 1024 * 1024  # 128 MB per array (working set > VMEM)
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    def make(k):
        @jax.jit
        def run(a, b):
            def body(i, y):
                return y * 0.999999 + b

            return jax.lax.fori_loop(0, k, body, a)
        return run

    def t_of(k):
        fn = make(k)
        np.asarray(fn(a, b).ravel()[:1])
        ss = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(a, b)
            np.asarray(out.ravel()[:1])
            ss.append(time.perf_counter() - t0)
        return sorted(ss)[2]

    # r5: the 4->20 slope moved ~8 ms of real work under a +-5 ms
    # dispatch jitter and reported 603-1047 GB/s across sessions for the
    # same chip; 8->72 puts ~32 ms of work in the slope
    lo, hi = 8, 72
    per_iter = (t_of(hi) - t_of(lo)) / (hi - lo)
    return 3 * n * 4 / per_iter / 1e9


def _bigmesh_workload():
    """The canonical 524k-tri closest-hit workload: (flat, handle,
    origins, dirs, tmax) — shared by the throughput metric and the
    measured-roofline step-stats pass so both see the identical tree and
    rays."""
    from tinsel_tpu.scene.procedural import sphere
    from tinsel_tpu.scene.model import Scene, Primitive, Material, MESH

    m = sphere(radius=1.0, n_theta=512, n_phi=512)
    m.build()
    sc = Scene()
    sc.add_primitive(Primitive(type=MESH, mesh=m, material=Material()))
    flat = sc.flatten()
    h = flat.prim_static[0].mesh

    r = 256 * 256
    g = np.linspace(-1.2, 1.2, 256, dtype=np.float32)
    x, y = np.meshgrid(g, g)
    origins = jnp.asarray(
        np.stack([x.ravel(), y.ravel(), np.full(r, -3.0, np.float32)], -1)
    )
    dirs = jnp.tile(jnp.array([[1e-5, 1e-5, 1.0]], jnp.float32), (r, 1))
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    return flat, h, origins, dirs, tmax


def _bigmesh_step_stats():
    """Measured roofline inputs, fresh each run: steps/ray statistics of
    the shipped walk on the exact bench workload (traversal_cost), and
    the marginal cost of ONE shipped _step in ns/lane (slope between two
    step CAPS of chained capped walks — two nested slopes so neither the
    per-dispatch tunnel floor nor the per-walk setup leaks in; method
    validated in benchmarks/r7_stepcost.py)."""
    import tinsel_tpu.accel.traverse as trav
    from tinsel_tpu.accel import build as _b

    flat, h, origins, dirs, tmax = _bigmesh_workload()
    pool = flat.pool

    steps = np.asarray(
        trav.traversal_cost(
            pool, h.node_offset, h.tri_offset, origins, dirs, tmax,
            stack_slots=h.stack_slots,
        )
    )
    tile_max = steps.reshape(-1, trav.TILE).max(axis=1)

    tile = trav.TILE
    o1, d1, t1 = origins[:tile], dirs[:tile], tmax[:tile]
    block_base = h.tri_offset // _b.BLOCK_SIZE

    def make_chain(n, cap):
        @jax.jit
        def run(pool, o, d, t):
            o3 = tuple(o[:, i] for i in range(3))
            d3 = tuple(d[:, i] for i in range(3))
            rd = trav._safe_rcp3(d3)

            def one_walk(w, acc):
                st = trav._init_state(tile, t + 0.0 * acc, h.stack_slots)

                def body(i, s):
                    return trav._step(
                        pool, h.node_offset, block_base, o3, d3, rd, s
                    )

                out = jax.lax.fori_loop(0, cap, body, st)
                return acc + out["best_t"] * 0.0 + out["cur"].astype(
                    jnp.float32
                ) * 1e-9

            return jax.lax.fori_loop(
                0, n, one_walk, jnp.zeros((tile,), jnp.float32)
            )
        return run

    def med_time(fn, reps=5):
        out = fn(pool, o1, d1, t1)
        np.asarray(out.ravel()[:1])
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(pool, o1, d1, t1)
            np.asarray(out.ravel()[:1])
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2]

    per_walk = {}
    for cap in (8, 32):
        # r5: chains doubled (8/40 -> 16/80) — the old nested slope left
        # ~23 ms of work under +-5 ms dispatch jitter and reported
        # 6.2-12.0 ns/lane for the same binary across sessions
        t_lo = med_time(make_chain(16, cap))
        t_hi = med_time(make_chain(80, cap))
        per_walk[cap] = (t_hi - t_lo) / 64
    per_step = (per_walk[32] - per_walk[8]) / 24

    return dict(
        steps_mean=round(float(steps.mean()), 2),
        steps_p99=round(float(np.percentile(steps, 99)), 1),
        steps_max=round(float(steps.max()), 0),
        tile_max_mean=round(float(tile_max.mean()), 1),
        step_ns_per_lane=round(per_step * 1e9 / tile, 2),
    )


def _bigmesh_metric():
    """Returns (packet_mrays, perray_mrays): the headline number is the
    shared-walk packet path (intersect_mesh packet_g=8, the product's
    fast path for coherent batches — accel/packets.py, r5); the per-ray
    walk is kept alongside for continuity with r1-r4 records and because
    it remains the default for incoherent bounce rays. Both are slopes
    between two in-jit chain lengths, INTERLEAVED (the tunnel's session
    drift is +-15-20%; only same-run comparisons are trustworthy)."""
    import tinsel_tpu.accel.traverse as trav

    flat, h, origins, dirs, tmax = _bigmesh_workload()

    def chain(n, g):
        def run(pool, o, d, t):
            def body(i, bt):
                o2 = o + (0.0 * bt[:1]).reshape(1, 1)  # serialize iterations
                tt, *_ = trav.intersect_mesh(
                    pool, h.node_offset, h.tri_offset, o2, d, t,
                    stack_slots=h.stack_slots, packet_g=g,
                )
                return jnp.where(jnp.isfinite(tt), tt, 0.0)
            return jax.lax.fori_loop(0, n, body, t * 0.0)
        return jax.jit(run)

    fns = {}
    for g in (8, None):
        for n in (1, 4):
            fn = chain(n, g)
            np.asarray(fn(flat.pool, origins, dirs, tmax).ravel()[:1])
            fns[(g, n)] = fn
    samples = {k: [] for k in fns}
    for _ in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            out = fn(flat.pool, origins, dirs, tmax)
            np.asarray(out.ravel()[:1])
            samples[k].append(time.perf_counter() - t0)

    def rate(g):
        t1 = sorted(samples[(g, 1)])[2]
        t4 = sorted(samples[(g, 4)])[2]
        return round(origins.shape[0] / ((t4 - t1) / 3) / 1e6, 3)

    return rate(8), rate(None)


if __name__ == "__main__":
    main()
