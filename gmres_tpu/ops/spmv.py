"""Sparse matrix-vector products on TPU.

The reference dispatches SpMV to ``mkl_sparse_?_mv`` / ``cusparse?csrmv``
(``kernels_mkl.cpp:326-352``, ``kernels_cuda.cpp:576-614``).  On TPU the
XLA-native formulation is a gather + sorted segment-sum over the
pre-expanded COO row ids (host-computed once in ``sparse.py``):

    y[i] = sum_{k : row_ids[k] == i} vals[k] * x[col_idx[k]]

Padding entries carry ``vals == 0`` and point at row ``n_rows-1``, so they
contribute nothing while keeping shapes static.

In distributed mode each shard holds a row block of A with *global* column
indices; the dense operand is all-gathered over the mesh axis before the
local gather (the allgather-then-SpMV baseline of SURVEY.md §7; the
halo-exchange overlap optimization lives in ``parallel/halo.py``).

A Pallas kernel for the hot path lives in ``ops/pallas/spmv_kernel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gmres_tpu.sparse import CSRMatrix


def gather_operand(x_local: jax.Array, axis_name: str | None) -> jax.Array:
    """Materialize the full operand vector from row shards."""
    if axis_name is None:
        return x_local
    return jax.lax.all_gather(x_local, axis_name, tiled=True)


def spmv(
    A,
    x: jax.Array,
    axis_name: str | None = None,
    x_is_global: bool = False,
    use_pallas: bool = True,
) -> jax.Array:
    """y = A @ x in A's dtype.  Dispatches on the operator format:
    DIA (shifted elementwise — the TPU fast path) or CSR
    (gather + sorted segment-sum fallback for unstructured matrices).

    ``x`` may be in a different dtype; it is cast to A's dtype first (the
    reference's SpMV is always dtype-uniform — casts happen at staging
    boundaries, ``gmres.cpp:173-175``).
    """
    from gmres_tpu.ops.dia import DIAMatrix, dia_spmv

    if hasattr(A, "halo_left"):  # HaloDIA / HaloCSR (distributed fast path)
        from gmres_tpu.parallel.halo import halo_spmv

        return halo_spmv(A, x, axis_name, use_pallas)

    if hasattr(A, "sell"):  # DF64Sell: double-float SELL (unstructured)
        from gmres_tpu.ops.pallas.df64_kernel import merge_f64, split_f64
        from gmres_tpu.ops.pallas.sell_kernel import sell_spmv_df64

        xg = x if x_is_global else gather_operand(x, axis_name)
        yh, yl = sell_spmv_df64(A.sell, *split_f64(xg.astype(jnp.float64)))
        return merge_f64(yh, yl)

    if hasattr(A, "data_hi"):  # DF64Dia: double-float emulated-fp64 kernel
        from gmres_tpu.ops.pallas.df64_kernel import dia_spmv_df64

        xg = x if x_is_global else gather_operand(x, axis_name)
        return dia_spmv_df64(A, xg)

    xg = x if x_is_global else gather_operand(x, axis_name)
    if isinstance(A, DIAMatrix):
        return dia_spmv(A, xg, use_pallas)
    from gmres_tpu.ops.sell import SELLMatrix, sell_spmv

    if isinstance(A, SELLMatrix):
        return sell_spmv(A, xg, use_pallas)
    xg = xg.astype(A.vals.dtype)
    # A single >16M-element XLA gather reproducibly faults the TPU worker
    # (measured round 2; cli/bench_kernels.py documents the crash), and this
    # branch is solve()'s fallback whenever SELL's cost gate refuses the
    # pattern.  Chunk the gather + segment-sum into <=GATHER_CHUNK_NNZ
    # slices on TPU — slow (the gather path always is, ~5e7 nnz/s) but it
    # completes instead of crashing the worker mid-solve (VERDICT round-2
    # item 7; re-verified as round-4 item 3).
    nnz_pad = A.vals.shape[0]
    if jax.default_backend() == "tpu" and nnz_pad > 2 * GATHER_CHUNK_NNZ:
        return csr_spmv_chunked(A, xg, GATHER_CHUNK_NNZ)
    prod = A.vals * xg[A.col_idx]
    return jax.ops.segment_sum(
        prod,
        A.row_ids,
        num_segments=A.n_rows,
        indices_are_sorted=True,
    )


# Largest single gather the TPU path will emit; one >16M-element gather
# reproducibly faults the v5e worker (round-2 probe), so stay at half that.
GATHER_CHUNK_NNZ = 8 * 1024 * 1024


def csr_spmv_chunked(A, xg: jax.Array, chunk: int) -> jax.Array:
    """Gather + segment-sum in <=``chunk``-nnz slices (static split — the
    slices are Python-loop unrolled under jit).  Rows straddling a chunk
    boundary accumulate their partials in a different order than the
    one-shot segment-sum — ulp-level reassociation only."""
    y = jnp.zeros((A.n_rows,), dtype=A.vals.dtype)
    nnz_pad = A.vals.shape[0]
    for lo in range(0, nnz_pad, chunk):
        hi = min(lo + chunk, nnz_pad)
        prod = A.vals[lo:hi] * xg[A.col_idx[lo:hi]]
        y = y + jax.ops.segment_sum(
            prod,
            A.row_ids[lo:hi],
            num_segments=A.n_rows,
            indices_are_sorted=True,
        )
    return y


def spmv_accum(
    A: CSRMatrix,
    x: jax.Array,
    alpha,
    beta,
    y: jax.Array,
    axis_name: str | None = None,
) -> jax.Array:
    """y <- alpha*A@x + beta*y (the reference's full spmv signature)."""
    return alpha * spmv(A, x, axis_name) + beta * y
