"""SELL (sliced-ELL) format — the TPU path for *unstructured* sparsity.

The reference runs arbitrary-CSR SpMV at memory bandwidth through
``mkl_sparse_d_mv`` / ``cusparseDcsrmv`` (``kernels_mkl.cpp:326-352``,
``kernels_cuda.cpp:576-614``) because CPUs and GPUs have hardware gather.
TPU v5e has none usable from Pallas (probed: Mosaic ``dynamic_gather`` only
works within a single 128-lane register and lowers ~1000x off bandwidth;
XLA's gather runs at ~0.08 Gelem/s).  So the TPU-native design makes the
gather *disappear*:

- rows are grouped into **slabs of C=128** (one sublane-tile of lanes);
- columns are cut into **static buckets of width W** — bucket ``b`` covers
  ``[b*W, (b+1)*W)``, so the operand window for a chunk is the *contiguous*
  slice ``x[b*W : (b+1)*W]``, fetched by the Pallas pipeline as an ordinary
  BlockSpec block (index from a scalar-prefetch array) — no indexed loads;
- each (slab, bucket) pair packs its entries into **K-wide ELL layers**:
  chunk ``(slab, bucket, layer)`` holds slot ``k`` of every row's entries
  ``[layer*K, layer*K + K)`` that fall in the bucket;
- in-kernel, the per-slot "gather" is an iota-compare + select over the
  W lanes of the window (pure VPU):  ``acc[r, :] += (iota_W == col[r, k])
  * val[r, k] * x_window`` — ~``4*W/128`` vector registers per K-step for
  128 rows, i.e. ``W/256`` VREG-ops per nonzero at full occupancy;
- chunk results accumulate into a revisited (8, 128) output block
  (chunks are sorted by slab), one row-sum + one small transpose per chunk.

Scalar-prefetch metadata lives in SMEM, so the chunk list is pre-split at
pack time into parts of at most ``MAX_CHUNKS_PER_CALL`` chunks, cut at
output-block boundaries; each part becomes one ``pallas_call`` whose
output rows concatenate (the split is static metadata — the SpMV itself
stays fully traceable).

``sell_from_csr`` auto-tunes (W, K) against a VPU cost model and refuses
(returns None) when the estimated work per nonzero is worse than the XLA
fallback — exactly like ``dia.from_csr`` refuses unprofitable bandings.

Matrices with *scattered* rows pack badly here (every nonzero in its own
bucket); a bandwidth-reducing reordering (``solve(reorder="rcm")``) is the
standard unlock, mirroring how the reference's suite matrices are
preprocessed for banded solvers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu.sparse import CSRMatrix

C = 128              # rows per slab (one lane-tile)
SLABS_PER_BLOCK = 8  # output block = (8 slabs, 128 lanes) = 1024 rows
ROWS_PER_BLOCK = C * SLABS_PER_BLOCK

# Scalar-prefetch arrays live in SMEM; the chunk list is pre-split into
# parts no longer than this (2 int32 arrays of this length per call).
MAX_CHUNKS_PER_CALL = 32768


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "cols", "bucket", "slab"),
    meta_fields=("n_rows", "n_cols", "nnz", "W", "K", "parts",
                 "n_rows_pad", "n_buckets"),
)
@dataclasses.dataclass(frozen=True)
class SELLMatrix:
    """Sliced-ELL matrix, chunked and pre-split for the Pallas kernel.

    Per part ``p``: ``data[p][c, r, k]``/``cols[p][c, r, k]`` hold the value
    / *bucket-relative* column of slot ``k`` of row ``slab[p][c]*C + r``
    (0/0 for padding slots — they select ``x_window[0]`` with weight 0).
    Chunks are sorted by ``slab``; every output block of ``ROWS_PER_BLOCK``
    rows has at least one chunk (dummies inserted) so the kernel
    zero-initializes it.  ``parts[p] = (n_chunks, first_block, n_blocks)``
    — each part owns a disjoint, contiguous output-block range.
    """

    data: tuple    # tuple of (n_chunks_p, C, K) arrays
    cols: tuple    # tuple of (n_chunks_p, C, K) int32 arrays, in [0, W)
    bucket: tuple  # tuple of (n_chunks_p,) int32 arrays — x window index
    slab: tuple    # tuple of (n_chunks_p,) int32 arrays, non-decreasing
    n_rows: int
    n_cols: int
    nnz: int
    W: int                    # bucket width (lane window)
    K: int                    # ELL slots per (row, chunk)
    parts: tuple              # ((n_chunks, first_block, n_blocks), ...)
    n_rows_pad: int           # rows padded to ROWS_PER_BLOCK multiple
    n_buckets: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.data[0].dtype

    @property
    def n_chunks(self) -> int:
        return sum(p[0] for p in self.parts)

    @property
    def vals(self) -> jax.Array:
        """Values view (Frobenius-norm compatible: padding slots are 0)."""
        flats = [d.reshape(-1) for d in self.data]
        return flats[0] if len(flats) == 1 else jnp.concatenate(flats)

    def astype(self, dtype) -> "SELLMatrix":
        return dataclasses.replace(
            self, data=tuple(d.astype(dtype) for d in self.data)
        )


def _chunk_stats(rows, cols, n_cols, W, K):
    """Number of chunks for candidate (W, K).

    Entries are CSR-ordered (row asc, col asc within row), so each
    (row, bucket) group is contiguous; a (slab, bucket) pair needs
    ``ceil(max_count_over_rows / K)`` layers, and every layer is a chunk.
    """
    nb = np.int64(max(1, -(-n_cols // W)))
    bucket = cols // W
    key = rows.astype(np.int64) * nb + bucket
    uk, counts = np.unique(key, return_counts=True)
    sb_key = (uk // nb // C) * nb + uk % nb  # (slab, bucket)
    order = np.argsort(sb_key, kind="stable")
    sb_sorted = sb_key[order]
    cnt_sorted = counts[order]
    starts = np.flatnonzero(
        np.concatenate([[True], sb_sorted[1:] != sb_sorted[:-1]])
    )
    max_cnt = np.maximum.reduceat(cnt_sorted, starts)
    layers = -(-max_cnt // K)
    return int(layers.sum())


def _plan_parts(chunk_blocks: np.ndarray, n_blocks_total: int):
    """Split chunk indices into parts of <= MAX_CHUNKS_PER_CALL chunks,
    cut at output-block boundaries.  Returns [(lo, hi, blk_lo, blk_hi)]."""
    n_chunks = chunk_blocks.shape[0]
    splits = []
    lo = 0
    while lo < n_chunks:
        hi = min(lo + MAX_CHUNKS_PER_CALL, n_chunks)
        if hi < n_chunks:
            b = chunk_blocks[hi]
            while hi > lo and chunk_blocks[hi - 1] == b:
                hi -= 1
            if hi == lo:  # a single block larger than the budget
                hi = lo + 1
                while hi < n_chunks and chunk_blocks[hi] == chunk_blocks[lo]:
                    hi += 1
        blk_lo = int(chunk_blocks[lo])
        blk_hi = int(chunk_blocks[hi - 1]) + 1
        splits.append((lo, hi, blk_lo, blk_hi))
        lo = hi
    assert splits[0][2] == 0 and splits[-1][3] == n_blocks_total
    return splits


def sell_from_csr(
    A: CSRMatrix,
    W: int | None = None,
    K: int | None = None,
    max_vreg_per_nnz: float = 24.0,
    dtype=None,
) -> SELLMatrix | None:
    """Pack CSR into SELL, auto-tuning (W, K); None when unprofitable.

    The cost model counts 4 VREG-ops on (C, W) tiles per K-step plus a
    fixed per-chunk overhead; packing is refused when the estimated
    VREG-ops per true nonzero exceed ``max_vreg_per_nnz`` (the XLA
    gather fallback is then no worse).
    """
    n = A.n_rows
    rp = np.asarray(A.row_ptr).astype(np.int64)
    nnz = int(rp[-1])
    if nnz == 0:
        return None
    ci = np.asarray(A.col_idx)[:nnz].astype(np.int64)
    v = np.asarray(A.vals)[:nnz]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))

    if W is None or K is None:
        best = None
        for Wc in (128, 256, 512, 1024):
            for Kc in (4, 8, 16):
                n_chunks = _chunk_stats(rows, ci, A.n_cols, Wc, Kc)
                # VREG cost: 4 ops on (C, Wc) tiles per K-step + ~96 fixed
                vregs = n_chunks * (4 * Kc * (C * Wc // 1024) + 96)
                if best is None or vregs < best[0]:
                    best = (vregs, Wc, Kc, n_chunks)
        vregs, W, K, _ = best
        if vregs / nnz > max_vreg_per_nnz:
            return None

    n_rows_pad = -(-n // ROWS_PER_BLOCK) * ROWS_PER_BLOCK
    n_buckets = max(1, -(-A.n_cols // W))

    slab = rows // C
    bucket = ci // W
    col_rel = (ci - bucket * W).astype(np.int32)

    # position of each entry within its (row, bucket) group (groups are
    # contiguous in CSR order)
    key = rows * n_buckets + bucket
    new_group = np.concatenate([[True], key[1:] != key[:-1]])
    idx = np.arange(nnz, dtype=np.int64)
    group_start = np.maximum.accumulate(np.where(new_group, idx, 0))
    seq = idx - group_start
    layer = seq // K
    slot = (seq - layer * K).astype(np.int64)

    max_layers = int(layer.max()) + 1
    ckey = (slab * n_buckets + bucket) * max_layers + layer
    uniq, inv = np.unique(ckey, return_inverse=True)
    n_chunks = uniq.shape[0]

    chunk_slab = (uniq // max_layers // n_buckets).astype(np.int64)
    chunk_bucket = (uniq // max_layers % n_buckets).astype(np.int32)

    # ensure every output block has a chunk (zero-init coverage)
    n_blocks = n_rows_pad // ROWS_PER_BLOCK
    covered = np.zeros(n_blocks, dtype=bool)
    covered[chunk_slab // SLABS_PER_BLOCK] = True
    missing = np.flatnonzero(~covered)
    n_dummy = missing.shape[0]
    if n_dummy:
        dummy_slab = missing.astype(np.int64) * SLABS_PER_BLOCK
        chunk_slab = np.concatenate([chunk_slab, dummy_slab])
        chunk_bucket = np.concatenate(
            [chunk_bucket, np.zeros(n_dummy, np.int32)]
        )
        order = np.argsort(chunk_slab, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(order.shape[0])
        inv = rank[inv]  # old chunk c is now at position rank[c]
        chunk_slab = chunk_slab[order]
        chunk_bucket = chunk_bucket[order]
        n_chunks += n_dummy

    vals_arr = np.zeros((n_chunks, C, K),
                        dtype=v.dtype if dtype is None else dtype)
    cols_arr = np.zeros((n_chunks, C, K), dtype=np.int32)
    row_local = (rows - slab * C).astype(np.int64)
    flat = (inv * C + row_local) * K + slot
    vals_arr.reshape(-1)[flat] = v
    cols_arr.reshape(-1)[flat] = col_rel

    chunk_blocks = chunk_slab // SLABS_PER_BLOCK
    splits = _plan_parts(chunk_blocks, n_blocks)
    data_p, cols_p, bucket_p, slab_p, parts = [], [], [], [], []
    for (lo, hi, blk_lo, blk_hi) in splits:
        data_p.append(vals_arr[lo:hi])
        cols_p.append(cols_arr[lo:hi])
        bucket_p.append(jnp.asarray(chunk_bucket[lo:hi]))
        slab_p.append(jnp.asarray(chunk_slab[lo:hi].astype(np.int32)))
        parts.append((hi - lo, blk_lo, blk_hi - blk_lo))

    return SELLMatrix(
        data=tuple(jnp.asarray(d) for d in data_p),
        cols=tuple(jnp.asarray(c) for c in cols_p),
        bucket=tuple(bucket_p),
        slab=tuple(slab_p),
        n_rows=n,
        n_cols=A.n_cols,
        nnz=nnz,
        W=W,
        K=K,
        parts=tuple(parts),
        n_rows_pad=n_rows_pad,
        n_buckets=n_buckets,
    )


def _pad_x(A: "SELLMatrix", x: jax.Array) -> jax.Array:
    total = A.n_buckets * A.W
    if x.shape[0] < total:
        return jnp.pad(x, (0, total - x.shape[0]))
    return x[:total]


def sell_spmv_xla(A: SELLMatrix, x: jax.Array) -> jax.Array:
    """Reference/CPU execution of the SELL layout (XLA gather — correctness
    path; the Pallas kernel in ``ops/pallas/sell_kernel.py`` is the fast
    one)."""
    x = x.astype(A.dtype)
    xp = _pad_x(A, x)
    y = jnp.zeros((A.n_rows_pad // C, C), dtype=A.dtype)
    for p in range(len(A.parts)):
        gcols = A.cols[p] + A.bucket[p][:, None, None].astype(jnp.int32) * A.W
        prod = A.data[p] * xp[gcols]             # (n_chunks_p, C, K)
        contrib = prod.sum(axis=2)               # (n_chunks_p, C)
        y = y.at[A.slab[p]].add(contrib)
    return y.reshape(-1)[: A.n_rows]


def sell_spmv(A: SELLMatrix, x: jax.Array, use_pallas: bool = True) -> jax.Array:
    """y = A @ x, routed to the Pallas windowed-compare kernel on TPU."""
    from gmres_tpu.ops.dia import _PALLAS_DISABLED

    if (use_pallas and not _PALLAS_DISABLED
            and A.dtype == jnp.float32
            and jax.default_backend() == "tpu"):
        from gmres_tpu.ops.pallas.sell_kernel import sell_spmv_pallas

        return sell_spmv_pallas(A, x)
    return sell_spmv_xla(A, x)
