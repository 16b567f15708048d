#!/usr/bin/env python
"""Round-4 traversal design microbenchmarks (run on the real TPU).

Questions this answers (all by slope between two in-jit trip counts,
synced by a 1-element host transfer — see bench.py methodology):

A. Dependent row-gather chain cost vs (lanes, table rows, row width):
   is the 8.5 ns/lane/step law table-size dependent (VMEM-resident node
   tables vs HBM block tables)?
B. S INDEPENDENT gather chains fused in one loop body: how much of the
   serial gather latency amortizes at S = 2/4/8? (r3 measured the 2nd
   independent gather at +~4 ns/lane — if the marginal keeps falling,
   interleaving S ray-batches per loop is a union-free speedup.)
C. Packet step: one row gather per PACKET + dense (P, K, G) slab tests
   + an any-reduce over G rays. Is the VPU side free next to the
   gather, i.e. does a packet step cost ~a per-ray step while covering
   G rays?
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_slope(make_fn, lo, hi, *args, reps=5):
    """Median per-iteration seconds from the slope between trip counts."""
    ts = {}
    for n in (lo, hi):
        fn = make_fn(n)
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            samples.append(time.perf_counter() - t0)
        ts[n] = sorted(samples)[len(samples) // 2]
    return (ts[hi] - ts[lo]) / (hi - lo)


def bench_dependent_gather():
    print("== A. dependent gather chain: ns/lane/iter ==", flush=True)
    for n_rows in (2048, 32768):
        for width in (72, 192):
            table = jnp.asarray(
                np.random.default_rng(0).random((n_rows, width), np.float32)
            )
            for lanes in (1024, 4096, 8192, 16384):
                idx0 = jnp.asarray(
                    np.random.default_rng(1).integers(
                        0, n_rows, lanes
                    ).astype(np.int32)
                )

                def make(n):
                    @jax.jit
                    def run(table, idx):
                        def body(i, ix):
                            row = table[ix]
                            # cheap dependent update: next index from data
                            v = jax.lax.bitcast_convert_type(
                                row[:, 0], jnp.int32
                            )
                            return jnp.abs(v + ix + i) % n_rows
                        return jax.lax.fori_loop(0, n, body, idx)
                    return run

                per = timed_slope(make, 256, 2048, table, idx0)
                print(
                    f"rows={n_rows:6d} w={width:3d} lanes={lanes:6d}: "
                    f"{per*1e6:8.2f} us/iter = "
                    f"{per*1e9/lanes:6.2f} ns/lane",
                    flush=True,
                )


def bench_independent_gathers():
    print("== B. S independent gather chains fused per iter ==", flush=True)
    n_rows, width, lanes = 32768, 72, 4096
    table = jnp.asarray(
        np.random.default_rng(0).random((n_rows, width), np.float32)
    )
    for S in (1, 2, 4, 8):
        idx0 = tuple(
            jnp.asarray(
                np.random.default_rng(s).integers(0, n_rows, lanes)
                .astype(np.int32)
            )
            for s in range(S)
        )

        def make(n):
            @jax.jit
            def run(table, idxs):
                def body(i, ixs):
                    outs = []
                    for ix in ixs:
                        row = table[ix]
                        v = jax.lax.bitcast_convert_type(
                            row[:, 0], jnp.int32
                        )
                        outs.append(jnp.abs(v + ix + i) % n_rows)
                    return tuple(outs)
                return jax.lax.fori_loop(0, n, body, idxs)
            return run

        per = timed_slope(make, 256, 2048, table, idx0)
        print(
            f"S={S}: {per*1e6:8.2f} us/iter = "
            f"{per*1e9/(lanes*S):6.2f} ns/lane-gather "
            f"({per*1e9/lanes:6.2f} ns per lane of one chain)",
            flush=True,
        )


def bench_packet_step():
    print("== C. packet step: gather(P,72) + slab(P,K,G) + reduce ==",
          flush=True)
    n_rows, K = 32768, 16
    table = jnp.asarray(
        np.random.default_rng(0).random((n_rows, 72), np.float32)
    )
    for P in (1024, 4096):
        for G in (0, 8, 16, 32):
            idx0 = jnp.asarray(
                np.random.default_rng(1).integers(0, n_rows, P)
                .astype(np.int32)
            )
            o = jnp.asarray(
                np.random.default_rng(2).random((3, P, max(G, 1)), np.float32)
            )
            rd = jnp.asarray(
                np.random.default_rng(3).random((3, P, max(G, 1)), np.float32)
            )

            def make(n):
                @jax.jit
                def run(table, idx, o, rd):
                    def body(i, carry):
                        ix, acc = carry
                        row = table[ix]
                        if G == 0:
                            v = jax.lax.bitcast_convert_type(
                                row[:, 0], jnp.int32
                            )
                            return jnp.abs(v + ix + i) % n_rows, acc
                        # unpack K child boxes (component-major cols) and
                        # slab-test all G rays: (P, K, G)
                        lo_x = row[:, 0:K, None]
                        lo_y = row[:, K:2 * K, None]
                        lo_z = row[:, 2 * K:3 * K, None]
                        t0x = (lo_x - o[0][:, None, :]) * rd[0][:, None, :]
                        t0y = (lo_y - o[1][:, None, :]) * rd[1][:, None, :]
                        t0z = (lo_z - o[2][:, None, :]) * rd[2][:, None, :]
                        tn = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
                        ok = (tn < 1.0).any(axis=2)  # (P, K)
                        hits = ok.sum(axis=1).astype(jnp.int32)
                        v = jax.lax.bitcast_convert_type(
                            row[:, 0], jnp.int32
                        )
                        return (
                            jnp.abs(v + ix + hits + i) % n_rows,
                            acc + hits,
                        )
                    return jax.lax.fori_loop(
                        0, n, body, (idx, jnp.zeros((P,), jnp.int32))
                    )
                return run

            per = timed_slope(make, 256, 2048, table, idx0, o, rd)
            label = "gather only" if G == 0 else f"G={G:3d}"
            print(
                f"P={P:5d} {label}: {per*1e6:8.2f} us/iter = "
                f"{per*1e9/P:6.2f} ns/packet-lane",
                flush=True,
            )


if __name__ == "__main__":
    from tinsel_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    bench_dependent_gather()
    bench_independent_gathers()
    bench_packet_step()
