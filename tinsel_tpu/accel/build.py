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


# Tuned on TPU v5 (524k-tri sphere): with one-step leaf blocks, 16 beats 8
# (1.21 vs 1.11 Mrays/s — halving block columns does not pay for the extra
# walk steps) and matches the block row width in accel/traverse.py.
DEFAULT_LEAF_SIZE = 16


def build_bvh(lowers: np.ndarray, uppers: np.ndarray,
              max_items_per_leaf: int | None = None,
              use_native: bool = True, method: str = "sah") -> BVH:
    """Build a BVH over item AABBs.

    lowers/uppers: (n, 3) float arrays. Returns flat SoA nodes (root at 0).
    method: "sah" (full-sweep, default, bvh.h:160-211), "median" (split at
    the item median, bvh.h:137-150) or "midpoint" (split at the spatial
    midpoint, bvh.h:105-122) — the alternatives the reference keeps
    switchable for bisection; the native C++ fast path covers SAH only.
    """
    if max_items_per_leaf is None:
        max_items_per_leaf = DEFAULT_LEAF_SIZE
    lowers = np.asarray(lowers, np.float32).reshape(-1, 3)
    uppers = np.asarray(uppers, np.float32).reshape(-1, 3)
    n = lowers.shape[0]
    if n == 0:
        raise ValueError("cannot build BVH over zero items")
    if method not in ("sah", "median", "midpoint"):
        raise ValueError(f"unknown BVH build method: {method}")

    if use_native and method == "sah" and n >= 4096:
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

        # sort by centroid along the longest axis (all three methods)
        axis = int(np.argmax(hi - lo))
        order = np.argsort(centers[idx, axis], kind="stable")
        idx_sorted = idx[order]
        indices[start:end] = idx_sorted

        if method == "median":
            split = count // 2
        elif method == "midpoint":
            mid = 0.5 * (lo[axis] + hi[axis])
            split = int(np.searchsorted(
                centers[idx_sorted, axis], mid, side="left"
            ))
            if split <= 0 or split >= count:
                split = count // 2  # degenerate: fall back (bvh.h:246-249)
        else:  # full SAH sweep
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
            # cost of splitting after item i: left has i items, right
            # count-i (identical objective to the reference sweep)
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


# ------------------------------------------------------------- wide (4-ary)
#
# Traversal-facing layout measured for this TPU runtime (see
# accel/traverse.py): per-step cost is dominated by the latency of ONE
# dependent row gather and is flat in row width far beyond 32 floats, so a
# step should consume as much tree as possible. A 4-ary node row carries all
# four child AABBs + child words + skip in one 32-float row (one gather
# tests four children), and leaves are padded 16-triangle blocks tested in
# one step. Simulated on the 524k-tri benchmark mesh, this cuts the
# worst-ray step count per tile from 367 to ~101 vs the round-1 binary
# dwell walk.

WIDE_K = 16  # node fan-out; see set_wide_k. r3: per-step gather cost is a
# per-lane FLOOR independent of consumed columns up to ~128-col rows, so
# 16-ary nodes test 4x the children at the 4-ary price and cut steps/ray
# ~1.5x; with the compressed stack + component-major rows the measured
# machine rate is 3.35 (k=16) vs 1.36 (k=4) Mrays/s on the 524k-tri
# bench (benchmarks/r5_gather_shape.py, r5_chained.py)
_NAN_PACKED = np.uint32(0x7FC07FC0)  # bf16 quiet-NaN in both halves


def _node_layout(k: int):
    """(row_width, word_col, skip_col) of a k-ary node row: 3k packed box
    cols + k child words + 1 skip, padded to a multiple of 8."""
    word_col = 3 * k
    skip_col = 4 * k
    row_width = ((4 * k + 1 + 7) // 8) * 8
    return row_width, word_col, skip_col


NODE_ROW_WIDTH, NODE_WORD_COL, NODE_SKIP_COL = _node_layout(WIDE_K)


def set_wide_k(k: int):
    """Switch the global node fan-out (4 / 8 / 16). Takes effect for
    meshes built afterwards; a process uses ONE k at a time (the layout
    constants are module state, like the traversal-phase knobs)."""
    global WIDE_K, NODE_ROW_WIDTH, NODE_WORD_COL, NODE_SKIP_COL
    WIDE_K = k
    NODE_ROW_WIDTH, NODE_WORD_COL, NODE_SKIP_COL = _node_layout(k)


def _bf16_pack_bounds(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Pack (lo, hi) f32 pairs into one u32 each: bf16(hi) in the high
    half rounded UP, bf16(lo) in the low half rounded DOWN — conservative
    bounds so the quantized box always contains the true box. In-loop
    gather cost on this runtime scales with CONSUMED row columns, so
    halving the box columns (12 -> 6... here 24 -> 12 per node) directly
    cuts the traversal step cost."""
    lo = np.asarray(lo, np.float32).ravel()
    hi = np.asarray(hi, np.float32).ravel()
    lob = lo.view(np.uint32).copy()
    hib = hi.view(np.uint32).copy()
    lot = lob & np.uint32(0xFFFF0000)
    hit = hib & np.uint32(0xFFFF0000)
    # truncation rounds toward zero: fix lo for negatives (round away),
    # hi for positives (round away) by stepping one bf16 ulp outward
    lo_need = lot.view(np.float32) > lo  # only possible when lo < 0
    hi_need = hit.view(np.float32) < hi  # only possible when hi > 0
    lot[lo_need] += np.uint32(0x10000)
    hit[hi_need] += np.uint32(0x10000)
    return hit | (lot >> np.uint32(16))


def _bf16_unpack_bounds(packed: np.ndarray):
    """Host-side decode of _bf16_pack_bounds (tests/validation)."""
    packed = np.asarray(packed, np.uint32)
    hi = (packed & np.uint32(0xFFFF0000)).view(np.float32)
    lo = (packed << np.uint32(16)).view(np.float32)
    return lo, hi


@dataclasses.dataclass(frozen=True)
class WideBVH:
    """4-ary collapsed tree in traversal row layout (all ids mesh-local).

    node_rows: (Ni, 24) f32 —
        cols [3c, 3c+3): child c box, one packed u32 per axis (bitcast):
                         high half bf16(upper) rounded up, low half
                         bf16(lower) rounded down (see _bf16_pack_bounds);
                         empty slots hold bf16 NaNs (an unconditional miss
                         — inverted bounds would be re-validated by the
                         slab test's min/max)
        cols 12..15:     bitcast i32 word per child:
                           >= 0  -> internal child, id = word
                           <  0  -> leaf child, block id = ~word
        col 16:          bitcast i32 skip: next internal node after this
                         node's subtree (-1 terminates)
    perm_padded: (16 * n_blocks,) int64 indices into the mesh's original
        triangle array; block b owns rows [16b, 16b+16). Padding slots
        repeat the leaf's last real triangle (harmless duplicates for
        intersection; excluded from area CDFs via real_mask).
    real_mask: (16 * n_blocks,) bool — False on padding slots.
    root_lower/root_upper: (3,) f32 — mesh root AABB (for instance culls).
    """

    node_rows: np.ndarray
    perm_padded: np.ndarray
    real_mask: np.ndarray
    root_lower: np.ndarray
    root_upper: np.ndarray
    k: int = 4  # node fan-out this tree was collapsed with

    @property
    def num_nodes(self) -> int:
        return int(self.node_rows.shape[0])

    @property
    def num_blocks(self) -> int:
        return len(self.perm_padded) // BLOCK_SIZE


BLOCK_SIZE = 16  # triangles per leaf block (== DEFAULT_LEAF_SIZE)


def set_block_size(b: int):
    """Switch the leaf-block width (16 / 32 / 64). Affects meshes built
    afterwards; one value per process, like set_wide_k. The binary build's
    leaf size follows so every leaf fills one block."""
    global BLOCK_SIZE, DEFAULT_LEAF_SIZE
    BLOCK_SIZE = b
    DEFAULT_LEAF_SIZE = b


def build_wide_bvh(bvh: BVH, k: int | None = None,
                   use_native: bool = True) -> WideBVH:
    """Collapse a binary ranged-leaf BVH into the 4-ary traversal layout.

    Each internal node adopts the frontier obtained by expanding its
    binary descendants (largest-volume internal child first) until k
    entries. Leaves become padded 16-triangle blocks owned by their parent
    row; they have no rows of their own — the traversal kernel processes
    hit leaf children while dwelling at the parent, so leaf "skip" state
    never needs to be stored (accel/traverse.py).

    A bit-identical C++ fast path (native/bvh_builder.cpp
    tinsel_collapse_wide) handles big trees; this NumPy version is the
    always-available oracle."""
    if k is None:
        k = WIDE_K
    row_w, word_col, skip_col = _node_layout(k)
    if (use_native and k in (4, 8, 16) and bvh.num_nodes >= 4096
            and bvh.count[0] == 0):
        try:
            from ..native.bvh_native import collapse_wide_native

            return collapse_wide_native(bvh, k=k, block_size=BLOCK_SIZE)
        except Exception:
            pass  # fall back to the NumPy collapse
    count = bvh.count
    left = bvh.left
    right = bvh.right
    lower = bvh.lower
    upper = bvh.upper

    # children frontier per retained internal node (binary ids)
    def expand(i):
        front = [int(left[i]), int(right[i])]
        while len(front) < k:
            pick, best = None, -1.0
            for j, c in enumerate(front):
                if count[c] == 0:
                    span = float(np.prod(np.maximum(upper[c] - lower[c], 0)))
                    if span > best:
                        best, pick = span, j
            if pick is None:
                break
            c = front.pop(pick)
            front[pick:pick] = [int(left[c]), int(right[c])]
        return front

    # synthetic root wrapper when the whole mesh is one leaf
    if count[0] > 0:
        n_real = int(count[0])
        pad = BLOCK_SIZE - n_real
        perm_padded = np.concatenate(
            [bvh.perm[:n_real], np.repeat(bvh.perm[n_real - 1], pad)]
        ).astype(np.int64)
        real_mask = np.zeros(BLOCK_SIZE, bool)
        real_mask[:n_real] = True
        row = np.zeros((1, row_w), np.float32)
        # component-major box columns: x-packed cols [0,k), y [k,2k),
        # z [2k,3k) — the traversal consumes them as contiguous (R, k)
        # groups (strided per-child extracts cost a relayout each;
        # measured 10x per-step blowup at k=16)
        row[0, [0, k, 2 * k]] = _bf16_pack_bounds(
            lower[0], upper[0]
        ).view(np.float32)
        for c in range(1, k):
            row[0, [c, k + c, 2 * k + c]] = np.full(
                3, _NAN_PACKED, np.uint32
            ).view(np.float32)
        words = np.zeros(k, np.int32)
        words[0] = ~np.int32(0)  # leaf block 0
        row[0, word_col : word_col + k] = words.view(np.float32)
        row[0, skip_col] = np.int32(-1).view(np.float32)
        return WideBVH(
            node_rows=row,
            perm_padded=perm_padded,
            real_mask=real_mask,
            root_lower=lower[0].copy(),
            root_upper=upper[0].copy(),
            k=k,
        )

    # pass 1: DFS assigning internal ids (preorder) and leaf block ids in
    # order of first appearance — block order defines the padded tri layout
    children: dict[int, list[int]] = {}
    internal_id: dict[int, int] = {}
    block_id: dict[int, int] = {}
    order: list[int] = []
    stack = [0]
    while stack:
        b = stack.pop()
        internal_id[b] = len(internal_id)
        order.append(b)
        ch = expand(b)
        children[b] = ch
        for c in reversed(ch):
            if count[c] == 0:
                stack.append(c)
    # leaf block ids in forward DFS child order
    def walk_blocks(b):
        for c in children[b]:
            if count[c] > 0:
                block_id[c] = len(block_id)
            else:
                walk_blocks(c)
    import sys
    old_lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_lim, 4 * bvh.num_nodes + 1000))
    try:
        walk_blocks(0)
    finally:
        sys.setrecursionlimit(old_lim)

    # pass 2: skip links over internal nodes only (leaf children are
    # processed at the parent, so the skip chain threads internal siblings)
    skip = {0: -1}
    stack = [0]
    while stack:
        b = stack.pop()
        esc = skip[b]
        internal_children = [c for c in children[b] if count[c] == 0]
        for j, c in enumerate(internal_children):
            skip[c] = (
                internal_children[j + 1] if j + 1 < len(internal_children) else esc
            )
        stack.extend(internal_children)

    # pass 3: emit rows + padded permutation
    n_int = len(internal_id)
    rows = np.zeros((n_int, row_w), np.float32)
    n_blocks = len(block_id)
    perm_padded = np.zeros(BLOCK_SIZE * n_blocks, np.int64)
    real_mask = np.zeros(BLOCK_SIZE * n_blocks, bool)
    for b, nid in internal_id.items():
        ch = children[b]
        words = np.zeros(k, np.int32)
        for c_idx in range(k):
            o = [c_idx, k + c_idx, 2 * k + c_idx]  # component-major
            if c_idx < len(ch):
                c = ch[c_idx]
                rows[nid, o] = _bf16_pack_bounds(
                    lower[c], upper[c]
                ).view(np.float32)
                if count[c] > 0:
                    blk = block_id[c]
                    words[c_idx] = ~np.int32(blk)
                    start = BLOCK_SIZE * blk
                    n_real = int(count[c])
                    src = bvh.perm[left[c] : left[c] + n_real]
                    perm_padded[start : start + n_real] = src
                    perm_padded[start + n_real : start + BLOCK_SIZE] = src[-1]
                    real_mask[start : start + n_real] = True
                else:
                    words[c_idx] = np.int32(internal_id[c])
            else:
                # empty slot: bf16 NaN box (unconditional miss)
                rows[nid, o] = np.full(
                    3, _NAN_PACKED, np.uint32
                ).view(np.float32)
        rows[nid, word_col : word_col + k] = words.view(np.float32)
        esc = skip[b]
        esc_id = -1 if esc == -1 else internal_id[esc]
        rows[nid, skip_col] = np.int32(esc_id).view(np.float32)

    return WideBVH(
        node_rows=rows,
        perm_padded=perm_padded,
        real_mask=real_mask,
        root_lower=lower[0].copy(),
        root_upper=upper[0].copy(),
        k=k,
    )


def wide_stack_bound(wide: WideBVH) -> int:
    """Exact worst-case per-lane stack usage for the COMPRESSED-stack walk
    (accel/traverse.py _step): a node contributes at most ONE live
    (node << 4 | resume_slot) entry, and only while the walk is inside a
    non-last internal child — i.e. only when the node has >= 2 internal
    children. The bound is the max over root-leaf paths of the count of
    such ancestors, assuming every child hits (pruning only ever uses
    less). Compare the old value-stack bound sum(m-1): 64 -> ~6 on the
    524k-tri sphere at k=16.

    Word semantics (build_wide_bvh): child word >= 1 -> internal child id;
    word < 0 -> leaf block; word == 0 -> empty slot (the root, id 0, is
    never anyone's child)."""
    rows = wide.node_rows
    _, word_col, _ = _node_layout(wide.k)
    words = rows[:, word_col : word_col + wide.k].view(np.int32)
    best = 0
    stack = [(0, 0)]  # (internal node id, live entries on arrival)
    while stack:
        node, p = stack.pop()
        internals = [int(w) for w in words[node] if w >= 1]
        mine = 1 if len(internals) >= 2 else 0
        best = max(best, p + mine)
        for ch in internals:
            stack.append((ch, p + mine))
    return max(best, 1)


def validate_wide_bvh(wide: WideBVH, lowers: np.ndarray, uppers: np.ndarray,
                      n_items: int) -> bool:
    """Structural sanity of the 4-ary traversal layout: the all-hit walk
    (descend first internal child, dwell every leaf child, escape along
    skips) terminates, reaches every leaf block exactly once, every real
    item appears exactly once across blocks, child boxes contain their
    items, and an acyclicity bound holds. Used by tests."""
    rows = wide.node_rows
    _, word_col, skip_col = _node_layout(wide.k)
    words = rows[:, word_col : word_col + wide.k].view(np.int32)
    skips = rows[:, skip_col : skip_col + 1].view(np.int32)[:, 0]
    packed = rows[:, : 3 * wide.k].view(np.uint32)
    n_int = wide.num_nodes
    n_blocks = wide.num_blocks
    eps = 1e-5

    def child_box(i, c):
        lo, hi = _bf16_unpack_bounds(
            packed[i, [c, wide.k + c, 2 * wide.k + c]]
        )
        return lo, hi

    def child_empty(i, c):
        lo, _ = child_box(i, c)
        return bool(np.isnan(lo).any())

    seen_blocks = np.zeros(n_blocks, np.int64)
    cur, lc, steps = 0, 0, 0
    limit = 10 * (n_int + n_blocks) + 100
    while cur >= 0:
        steps += 1
        assert steps < limit, "walk did not terminate (cycle?)"
        assert 0 <= cur < n_int
        s = None
        for c in range(wide.k):
            if words[cur, c] < 0 and c >= lc and not child_empty(cur, c):
                s = c
                break
        if s is not None:
            blk = ~words[cur, s]
            assert 0 <= blk < n_blocks
            seen_blocks[blk] += 1
            # child box contains its block's real items (bf16 bounds are
            # rounded outward, so containment must still hold)
            lo_c, hi_c = child_box(cur, s)
            for p in range(BLOCK_SIZE * blk, BLOCK_SIZE * (blk + 1)):
                if wide.real_mask[p]:
                    item = wide.perm_padded[p]
                    assert np.all(lo_c <= lowers[item] + eps)
                    assert np.all(hi_c >= uppers[item] - eps)
            lc = s + 1
            continue
        nxt = skips[cur]
        for c in range(wide.k - 1, -1, -1):
            if words[cur, c] >= 0 and not child_empty(cur, c):
                nxt = words[cur, c]
        cur, lc = nxt, 0

    if not np.all(seen_blocks == 1):
        return False
    real_items = wide.perm_padded[wide.real_mask]
    return bool(
        len(real_items) == n_items
        and np.array_equal(np.sort(real_items), np.arange(n_items))
    )


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
