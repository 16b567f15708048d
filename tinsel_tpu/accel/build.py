"""Host-side SAH AABB-tree builder (NumPy), producing flat SoA node arrays.

Runs once at scene-load time (never inside jit), like the reference's
BVHBuilder (bvh.h:34-57). Same algorithm family: full-sweep SAH along the
longest axis with prefix/suffix area scans minimizing pBelow*i + pAbove*(n-i)
(bvh.h:160-211), middle-split fallback when the sweep degenerates
(bvh.h:245-249), one item per leaf by default.

Instead of the reference's 32-byte packed C struct (bvh.h:9-20), nodes are
structure-of-arrays float32/int32 NumPy arrays — the layout the TPU traversal
kernels consume directly (gather-friendly, no bitfields).

A C++ fast path (tinsel_tpu/native/bvh_builder.cpp) is used automatically for
large meshes; this module is the always-available reference implementation
and oracle for it.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BVH:
    """Flat SoA BVH with ranged leaves. Internal nodes store child node
    indices in (left, right); a leaf (count > 0) stores in `left` the start
    of its item range *in the permuted item order* `perm`, and in `count`
    the range length. Root is node 0.

    Ranged leaves are the TPU-first departure from the reference's
    one-item-per-leaf trees (bvh.h:243): a leaf hit tests `count` contiguous
    triangle rows in one vectorized sweep, and trees are ~2*leaf_size times
    smaller, which directly cuts the lockstep traversal's step count."""

    lower: np.ndarray  # (N, 3) f32
    upper: np.ndarray  # (N, 3) f32
    left: np.ndarray  # (N,) i32 — child node, or perm-range start if leaf
    right: np.ndarray  # (N,) i32 — child node (leaves: 0)
    leaf: np.ndarray  # (N,) i32 (0/1)
    count: np.ndarray = None  # (N,) i32 — items in leaf range (0 = internal)
    perm: np.ndarray = None  # (n,) i32 — item order referenced by leaves

    def __post_init__(self):
        if (self.count is None) != (self.perm is None):
            raise ValueError(
                "BVH: count and perm must be provided together "
                "(a ranged-leaf tree is not reconstructible from one alone)"
            )
        if self.count is None:
            # Legacy single-item layout: each leaf's `left` is the raw item
            # index. Only valid if those indices form a permutation of
            # 0..n_items-1 — a ranged tree that lost count/perm fails this
            # loudly instead of silently rendering wrong geometry.
            leaf_items = self.left[self.leaf.astype(bool)]
            n_items = leaf_items.shape[0]
            if not np.array_equal(np.sort(leaf_items), np.arange(n_items)):
                raise ValueError(
                    "BVH: leaf item indices are not a permutation — this is "
                    "a ranged-leaf tree missing its count/perm fields"
                )
            self.count = self.leaf.astype(np.int32)
            # rewrite leaf starts to positions in a perm array
            self.perm = np.empty(n_items, np.int32)
            pos = 0
            for i in np.flatnonzero(self.leaf):
                self.perm[pos] = self.left[i]
                self.left[i] = pos
                pos += 1

    @property
    def num_nodes(self) -> int:
        return int(self.lower.shape[0])


def _surface_area(lower, upper):
    e = np.maximum(upper - lower, 0.0)
    return 2.0 * (e[..., 0] * e[..., 1] + e[..., 0] * e[..., 2] + e[..., 1] * e[..., 2])


# Tuned on TPU v5 (524k-tri sphere, dwell traversal): 16 beats 8 by ~1.85x
# (walk steps dominate; halving node count outweighs the longer dwell) and
# beats 31 (dwell starts to dominate). Must stay < 2^(31-COUNT_SHIFT).
DEFAULT_LEAF_SIZE = 16


def build_bvh(lowers: np.ndarray, uppers: np.ndarray,
              max_items_per_leaf: int = DEFAULT_LEAF_SIZE,
              use_native: bool = True) -> BVH:
    """Build a SAH BVH over item AABBs.

    lowers/uppers: (n, 3) float arrays. Returns flat SoA nodes (root at 0).
    """
    lowers = np.asarray(lowers, np.float32).reshape(-1, 3)
    uppers = np.asarray(uppers, np.float32).reshape(-1, 3)
    n = lowers.shape[0]
    if n == 0:
        raise ValueError("cannot build BVH over zero items")

    if use_native and n >= 4096:
        try:
            from ..native import bvh_native

            return bvh_native.build_bvh_native(
                lowers, uppers, leaf_size=max_items_per_leaf
            )
        except Exception:
            pass  # fall back to the NumPy builder

    centers = 0.5 * (lowers + uppers)

    max_nodes = 2 * n
    out_lower = np.empty((max_nodes, 3), np.float32)
    out_upper = np.empty((max_nodes, 3), np.float32)
    out_left = np.zeros(max_nodes, np.int32)
    out_right = np.zeros(max_nodes, np.int32)
    out_leaf = np.zeros(max_nodes, np.int32)
    out_count = np.zeros(max_nodes, np.int32)

    indices = np.arange(n, dtype=np.int64)
    used = 0

    def alloc():
        nonlocal used
        i = used
        used += 1
        return i

    # explicit stack of (node_index, start, end); children filled post-order
    root = alloc()
    stack = [(root, 0, n)]
    while stack:
        node, start, end = stack.pop()
        idx = indices[start:end]
        lo = lowers[idx].min(axis=0)
        hi = uppers[idx].max(axis=0)
        out_lower[node] = lo
        out_upper[node] = hi
        count = end - start

        if count <= max_items_per_leaf:
            out_leaf[node] = 1
            out_left[node] = start  # range start in the final permutation
            out_right[node] = 0
            out_count[node] = count
            continue

        # longest-axis full SAH sweep
        axis = int(np.argmax(hi - lo))
        order = np.argsort(centers[idx, axis], kind="stable")
        idx_sorted = idx[order]
        indices[start:end] = idx_sorted

        slo = lowers[idx_sorted]
        shi = uppers[idx_sorted]
        # prefix bounds from the left, suffix bounds from the right
        left_lo = np.minimum.accumulate(slo, axis=0)
        left_hi = np.maximum.accumulate(shi, axis=0)
        right_lo = np.minimum.accumulate(slo[::-1], axis=0)[::-1]
        right_hi = np.maximum.accumulate(shi[::-1], axis=0)[::-1]

        left_area = _surface_area(left_lo, left_hi)
        right_area = _surface_area(right_lo, right_hi)
        counts = np.arange(count, dtype=np.float64)
        # cost of splitting after item i: left has i items, right count-i
        # (identical objective to the reference sweep)
        cost = left_area * counts + right_area * (count - counts)
        split = int(np.argmin(cost)) + 1
        if split <= 0 or split >= count:
            split = count // 2

        lchild = alloc()
        rchild = alloc()
        out_leaf[node] = 0
        out_left[node] = lchild
        out_right[node] = rchild
        stack.append((lchild, start, start + split))
        stack.append((rchild, start + split, end))

    return BVH(
        lower=out_lower[:used].copy(),
        upper=out_upper[:used].copy(),
        left=out_left[:used].copy(),
        right=out_right[:used].copy(),
        leaf=out_leaf[:used].copy(),
        count=out_count[:used].copy(),
        perm=indices.astype(np.int32),
    )


def compute_skip_links(bvh: BVH) -> np.ndarray:
    """Escape ("skip") links for stackless DFS traversal.

    skip[i] = the node visited next when the subtree rooted at i is done
    (or when i's AABB is missed); -1 terminates. Traversal then keeps ONE
    int of state per ray instead of a stack — the layout TPU lockstep
    traversal needs (a per-lane stack is a huge scatter per step).
    """
    n = bvh.num_nodes
    skip = np.full(n, -1, np.int32)
    # iterative DFS with explicit (node, escape) stack — host side only
    stack = [(0, -1)]
    while stack:
        node, esc = stack.pop()
        skip[node] = esc
        if not bvh.leaf[node]:
            l, r = int(bvh.left[node]), int(bvh.right[node])
            stack.append((r, esc))  # right subtree escapes to parent's escape
            stack.append((l, r))  # left subtree escapes to right child
    return skip


def triangle_bounds(positions: np.ndarray, indices: np.ndarray):
    """AABBs per triangle. positions (V,3), indices (T,3)."""
    tris = positions[indices]  # (T, 3, 3)
    return tris.min(axis=1), tris.max(axis=1)


COUNT_SHIFT = 26  # leaf count lives in the top bits of the packed word
ITEM_MASK = (1 << COUNT_SHIFT) - 1


def pack_nodes(bvh: BVH, skip: np.ndarray) -> np.ndarray:
    """Pack a BVH + skip links into one (N, 8) f32 row per node so traversal
    gathers a single contiguous row per step instead of five separate arrays:

        cols 0-2  lower.xyz
        cols 3-5  upper.xyz
        col  6    bitcast i32: (leaf_count << 26) | payload
                  payload = first-child node index (internal, count=0)
                          = item-range start in perm order (leaf, count>0)
        col  7    bitcast i32: skip link (-1 terminates)
    """
    n = bvh.num_nodes
    assert int(bvh.count.max(initial=0)) < (1 << (31 - COUNT_SHIFT))
    assert int(bvh.left.max(initial=0)) <= ITEM_MASK
    enc = (bvh.count.astype(np.int64) << COUNT_SHIFT) | bvh.left.astype(np.int64)
    packed = np.empty((n, 8), np.float32)
    packed[:, 0:3] = bvh.lower
    packed[:, 3:6] = bvh.upper
    packed[:, 6] = enc.astype(np.int32).view(np.float32)
    packed[:, 7] = np.asarray(skip, np.int32).view(np.float32)
    return packed


def validate_bvh(bvh: BVH, lowers: np.ndarray, uppers: np.ndarray) -> bool:
    """Structural sanity: every item appears in exactly one leaf range, and
    every node's bounds contain its children/items. Used by tests."""
    n = lowers.shape[0]
    seen = np.zeros(n, np.int64)
    eps = 1e-5

    def walk(i):
        if bvh.count[i] > 0:
            for p in range(bvh.left[i], bvh.left[i] + bvh.count[i]):
                item = bvh.perm[p]
                seen[item] += 1
                assert np.all(bvh.lower[i] <= lowers[item] + eps)
                assert np.all(bvh.upper[i] >= uppers[item] - eps)
        else:
            for c in (bvh.left[i], bvh.right[i]):
                assert np.all(bvh.lower[i] <= bvh.lower[c] + eps)
                assert np.all(bvh.upper[i] >= bvh.upper[c] - eps)
                walk(c)

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 2 * n + 1000))
    try:
        walk(0)
    finally:
        sys.setrecursionlimit(old)
    return bool(np.all(seen == 1))
