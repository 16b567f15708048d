#!/usr/bin/env python
"""Profile the gradient step on TPU and print the op-level time breakdown.

Captures a jax.profiler trace of (a) the matched forward and (b) the
fwd+bwd step on the cornell bench workload, then sums device-side op
durations by fusion/op name so the backward's extra ~2x has names
attached (VERDICT r3 #3: attack the measured top term, not a guess).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/r8_grad_profile.py
"""

import collections
import glob
import gzip
import json
import os
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp


def summarize(trace_dir, top=25):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    tot = collections.Counter()
    cnt = collections.Counter()
    for fp in files:
        with gzip.open(fp) as f:
            tr = json.load(f)
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                if name.startswith("$") or "asarray" in name:
                    continue  # host-side python frames
                tot[name] += e["dur"]
                cnt[name] += 1
    rows = tot.most_common(top)
    for name, us in rows:
        print(f"  {us/1e3:9.2f} ms  x{cnt[name]:5d}  {name}")
    return tot


def main():
    from tinsel_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.render.camera import CameraParams
    from tinsel_tpu.diff.gradients import render_loss, render_loss_and_grads

    width = height = 256
    scene = cornell_scene(width=width, height=height, max_depth=4)
    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(0)
    target = jnp.zeros((height, width, 3), jnp.float32)
    opts = dict(width=width, height=height, max_depth=4, samples_per_pass=4)

    @jax.jit
    def fwd(f, c, k):
        return render_loss(f, c, k, target, **opts)

    @jax.jit
    def fwdbwd(f, c, k):
        loss, grads = render_loss_and_grads(f, c, k, target, **opts)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return jnp.stack([loss, gsum])

    for name, fn in (("forward", fwd), ("fwd+bwd", fwdbwd)):
        out = fn(flat, cam, key)  # compile
        np.asarray(out.ravel()[:1])
        d = f"/tmp/grad_prof_{name.replace('+', '')}"
        shutil.rmtree(d, ignore_errors=True)
        with jax.profiler.trace(d):
            for _ in range(3):
                out = fn(flat, cam, key)
            np.asarray(out.ravel()[:1])
        print(f"== {name} (3 dispatches) ==", flush=True)
        summarize(d)


if __name__ == "__main__":
    main()
