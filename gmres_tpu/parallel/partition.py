"""1-D row partitioning of CSR matrices over a device mesh.

The scaling axis of this framework (new scope vs the single-device
reference — SURVEY.md §2.6/§5.8): each chip owns a contiguous block of rows
of A and the matching slice of every vector (x, b, r, and each Krylov basis
vector).  Rows are padded so every shard has identical static shapes:

- row count padded to a multiple of the shard count (padded rows are empty
  — they contribute zeros everywhere and never affect norms);
- per-shard nnz padded to the max across shards (padded entries have
  value 0 and point at local row ``rows_per-1`` / global column 0).

Column indices stay **global**: the baseline distributed SpMV all-gathers
the operand vector and gathers locally (``ops/spmv.py``).  The
local/halo-split optimization lives in ``parallel/halo.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np

from gmres_tpu.sparse import CSRMatrix


@dataclasses.dataclass
class ShardStack:
    """Host-side stand-in for a ``(P, ...)``-stacked numpy array that holds
    only the shards THIS process owns (multi-host per-host partitioning,
    SURVEY.md §5.8: a process must not materialize every shard's data —
    that is a host-RAM wall of ``P x global`` at pod scale).

    ``pieces[s]`` is shard ``s``'s slice WITHOUT the leading shard dim;
    ``shape`` is the global stacked shape.  Uploading goes through
    ``jax.make_array_from_callback`` (``dist_gmres._to_device``), which
    only ever asks for the shards this process's devices address.
    """

    shape: tuple
    dtype: np.dtype
    pieces: dict  # shard id -> np.ndarray of shape ``shape[1:]``

    def astype(self, dtype) -> "ShardStack":
        dt = np.dtype(dtype)
        if dt == self.dtype:
            return self
        return ShardStack(
            shape=self.shape, dtype=dt,
            pieces={s: p.astype(dt) for s, p in self.pieces.items()},
        )

    @property
    def local_nbytes(self) -> int:
        return sum(p.nbytes for p in self.pieces.values())


def local_partition_nbytes(tree) -> int:
    """Host bytes this process materialized for a partitioned operator:
    ShardStack leaves count only their owned pieces; plain arrays count in
    full (the single-host path stacks everything)."""
    total = 0
    for leaf in jax.tree.leaves(
        tree, is_leaf=lambda x: isinstance(x, ShardStack)
    ):
        if isinstance(leaf, ShardStack):
            total += leaf.local_nbytes
        elif isinstance(leaf, (np.ndarray, jax.Array)):
            total += leaf.nbytes
    return total


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("row_ptr", "col_idx", "row_ids", "vals"),
    meta_fields=("n_shards", "rows_per_shard", "n_cols", "nnz"),
)
@dataclasses.dataclass(frozen=True)
class PartitionedCSR:
    """Row-partitioned CSR: arrays stacked over a leading shard axis."""

    row_ptr: jax.Array  # (P, rows_per+1) int32, shard-local offsets
    col_idx: jax.Array  # (P, K) int32, GLOBAL column indices
    row_ids: jax.Array  # (P, K) int32, shard-LOCAL row ids (sorted)
    vals: jax.Array     # (P, K) dtype
    n_shards: int
    rows_per_shard: int
    n_cols: int         # global (padded) column count
    nnz: int            # true global stored-entry count

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> "PartitionedCSR":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))

    def local_block(self) -> CSRMatrix:
        """Rebuild the shard-local CSRMatrix inside shard_map (arrays there
        have leading dim 1)."""
        return CSRMatrix(
            row_ptr=self.row_ptr[0],
            col_idx=self.col_idx[0],
            row_ids=self.row_ids[0],
            vals=self.vals[0],
            n_rows=self.rows_per_shard,
            n_cols=self.n_cols,
            nnz=self.nnz,
        )


def padded_size(n: int, n_shards: int) -> int:
    return -(-n // n_shards) * n_shards


def pad_vector(v: np.ndarray, n_shards: int,
               rows_per: int | None = None) -> np.ndarray:
    """Zero-pad to ``n_shards`` equal shards.  ``rows_per`` overrides the
    per-shard length (e.g. the SELL partition's ROWS_PER_BLOCK-aligned
    blocks, ``parallel/sell_dist.py``)."""
    n_pad = (rows_per * n_shards if rows_per is not None
             else padded_size(v.shape[0], n_shards))
    if n_pad == v.shape[0]:
        return v
    out = np.zeros((n_pad,), dtype=v.dtype)
    out[: v.shape[0]] = v
    return out


def partition_rows(A: CSRMatrix, n_shards: int, pad_multiple: int = 1024,
                   rows_per: int | None = None,
                   owned=None) -> PartitionedCSR:
    """Split A into n_shards contiguous row blocks with identical shapes.
    ``rows_per`` overrides the block height (must cover ceil(n/P)) so
    mixed-format partitions (e.g. CSR factors alongside a SELL operator)
    agree on shard shapes.

    ``owned`` (an iterable of shard ids): materialize value/index arrays
    ONLY for those shards, returning ``ShardStack`` leaves — the per-host
    partitioning mode for multi-host meshes.  The padding width K and all
    other metadata come from O(n) ``row_ptr`` scans, so they agree across
    processes without communication.

    ``A`` may be a ``RowBlockCSR`` (per-host INPUT, SURVEY.md §5.8 pod
    scale): its global ``row_ptr`` drives all metadata and entry slices
    come from ``A.entries`` — the owned shards must then sit inside the
    loaded row block."""
    from gmres_tpu.sparse import RowBlockCSR

    n = A.n_rows
    if rows_per is not None:
        assert rows_per * n_shards >= n, (rows_per, n_shards, n)
        n_pad = rows_per * n_shards
    else:
        n_pad = padded_size(n, n_shards)
        rows_per = n_pad // n_shards

    rp = np.asarray(A.row_ptr).astype(np.int64)
    nnz = int(rp[-1])
    is_block = isinstance(A, RowBlockCSR)
    if is_block:
        vdtype = A.vals.dtype
    else:
        ci = np.asarray(A.col_idx)[:nnz]
        v = np.asarray(A.vals)[:nnz]
        vdtype = v.dtype

    # global padded row_ptr
    rp_pad = np.concatenate([rp, np.full(n_pad - n, rp[-1], dtype=np.int64)])

    starts = [rp_pad[s * rows_per] for s in range(n_shards)]
    ends = [int(rp_pad[min((s + 1) * rows_per, n_pad)]) for s in range(n_shards)]
    local_nnz = [int(e - s0) for s0, e in zip(starts, ends)]
    K = max(pad_multiple, -(-max(local_nnz) // pad_multiple) * pad_multiple)

    fill = sorted(owned) if owned is not None else range(n_shards)
    rptr_pieces, col_pieces, rid_pieces, val_pieces = {}, {}, {}, {}
    for s in fill:
        lo, hi = int(starts[s]), int(ends[s])
        cnt = hi - lo
        rptr_s = (rp_pad[s * rows_per : (s + 1) * rows_per + 1] - lo).astype(
            np.int32
        )
        col_s = np.zeros((K,), dtype=np.int32)
        rid_s = np.full((K,), rows_per - 1, dtype=np.int32)
        val_s = np.zeros((K,), dtype=vdtype)
        if is_block:
            ci_s, v_s = A.entries(min(s * rows_per, n),
                                  min((s + 1) * rows_per, n))
            assert ci_s.shape[0] == cnt, (s, ci_s.shape[0], cnt)
            col_s[:cnt] = ci_s
            val_s[:cnt] = v_s
        else:
            col_s[:cnt] = ci[lo:hi]
            val_s[:cnt] = v[lo:hi]
        rid_s[:cnt] = np.repeat(
            np.arange(rows_per, dtype=np.int32),
            np.diff(rp_pad[s * rows_per : (s + 1) * rows_per + 1]).astype(np.int64),
        )
        rptr_pieces[s] = rptr_s
        col_pieces[s] = col_s
        rid_pieces[s] = rid_s
        val_pieces[s] = val_s

    if owned is not None:
        row_ptr_stack = ShardStack((n_shards, rows_per + 1), np.dtype(np.int32),
                                   rptr_pieces)
        col_stack = ShardStack((n_shards, K), np.dtype(np.int32), col_pieces)
        rid_stack = ShardStack((n_shards, K), np.dtype(np.int32), rid_pieces)
        val_stack = ShardStack((n_shards, K), np.dtype(vdtype), val_pieces)
    else:
        row_ptr_stack = np.stack([rptr_pieces[s] for s in range(n_shards)])
        col_stack = np.stack([col_pieces[s] for s in range(n_shards)])
        rid_stack = np.stack([rid_pieces[s] for s in range(n_shards)])
        val_stack = np.stack([val_pieces[s] for s in range(n_shards)])

    return PartitionedCSR(
        row_ptr=row_ptr_stack,
        col_idx=col_stack,
        row_ids=rid_stack,
        vals=val_stack,
        n_shards=n_shards,
        rows_per_shard=rows_per,
        n_cols=n_pad,
        nnz=nnz,
    )
