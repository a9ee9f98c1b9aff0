"""Per-host ("owned shards") partitioning — VERDICT round-2 item 4.

At pod scale a process must not materialize every shard's partitioned
arrays (P x global host RAM).  ``owned=...`` makes each partitioner build
value arrays only for the given shards (``ShardStack`` leaves) while
deriving identical metadata from range-at-a-time structure scans.  These
tests pin (a) exact equality of owned pieces vs the global path's rows,
(b) the memory fraction, for all three partition families.
"""

import numpy as np
import pytest

from gmres_tpu.io.synth import convection_diffusion_2d
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.parallel.partition import (
    ShardStack,
    local_partition_nbytes,
    partition_rows,
)
from gmres_tpu.parallel.halo import HaloCSR, HaloDIA, partition_halo
from gmres_tpu.sparse import csr_from_arrays

P = 4
OWNED = (1, 3)


def _unstructured(n=4096, row_nnz=9, seed=7):
    """Random-ish sparse pattern that DIA rejects (scattered columns)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), row_nnz)
    cols = rng.integers(0, n, size=n * row_nnz)
    # force the diagonal so the matrix is solvable-ish; dedupe (row, col)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    key = rows.astype(np.int64) * n + cols
    _, keep = np.unique(key, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.shape[0])
    vals[rows == cols] = row_nnz + 1.0
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rp = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=n))])
    return csr_from_arrays(rp, cols, vals, n_cols=n)


def _assert_stack_matches(stack, full, owned):
    assert isinstance(stack, ShardStack)
    assert stack.shape == tuple(np.asarray(full).shape)
    assert sorted(stack.pieces) == sorted(owned)
    for s in owned:
        np.testing.assert_array_equal(stack.pieces[s], np.asarray(full)[s])


def test_partition_rows_owned_matches_global():
    A = convection_diffusion_2d(40)
    full = partition_rows(A, P)
    own = partition_rows(A, P, owned=OWNED)
    assert own.rows_per_shard == full.rows_per_shard
    assert own.n_cols == full.n_cols and own.nnz == full.nnz
    for field in ("row_ptr", "col_idx", "row_ids", "vals"):
        _assert_stack_matches(getattr(own, field), getattr(full, field), OWNED)
    # memory: owned fraction of the global stack (exact for equal pieces)
    full_bytes = sum(
        np.asarray(getattr(full, f)).nbytes
        for f in ("row_ptr", "col_idx", "row_ids", "vals")
    )
    assert local_partition_nbytes(own) == full_bytes * len(OWNED) // P


def test_partition_halo_dia_owned_matches_global():
    A = convection_diffusion_2d(40)  # banded -> HaloDIA
    full = partition_halo(A, P)
    own = partition_halo(A, P, owned=OWNED)
    assert isinstance(full, HaloDIA) and isinstance(own, HaloDIA)
    assert own.offsets == full.offsets
    assert (own.halo_left, own.halo_right) == (full.halo_left, full.halo_right)
    assert own.rows_per_shard == full.rows_per_shard
    _assert_stack_matches(own.data, full.data, OWNED)
    assert local_partition_nbytes(own) * P == np.asarray(full.data).nbytes * len(OWNED)


def test_partition_halo_csr_owned_matches_global():
    # neighbor-local but too many distinct diagonals for DIA: a band of
    # width ~b with random holes
    n, b = 2048, 300
    rng = np.random.default_rng(3)
    rows_l, cols_l = [], []
    for i in range(n):
        lo, hi = max(0, i - b), min(n, i + b + 1)
        picks = np.unique(rng.integers(lo, hi, size=6))
        rows_l.append(np.full(picks.shape[0], i))
        cols_l.append(picks)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = rng.standard_normal(rows.shape[0]) + (rows == cols) * 10.0
    rp = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=n))])
    A = csr_from_arrays(rp, cols, vals, n_cols=n)

    full = partition_halo(A, P)
    own = partition_halo(A, P, owned=OWNED)
    assert isinstance(full, HaloCSR), type(full)
    assert isinstance(own, HaloCSR)
    assert (own.halo_left, own.halo_right) == (full.halo_left, full.halo_right)
    for field in ("row_ptr", "col_idx", "row_ids", "vals"):
        _assert_stack_matches(getattr(own, field), getattr(full, field), OWNED)


def test_partition_halo_owned_refuses_like_global():
    A = _unstructured()  # fully-scattered columns: halo > r on both paths
    assert partition_halo(A, P) is None
    assert partition_halo(A, P, owned=OWNED) is None


def test_partition_sell_owned_matches_global():
    from gmres_tpu.parallel.sell_dist import partition_sell

    A = _unstructured()
    full = partition_sell(A, P, df64=True)
    own = partition_sell(A, P, df64=True, owned=OWNED)
    assert full is not None and own is not None
    assert (own.W, own.K) == (full.W, full.K)
    assert own.n_chunks == full.n_chunks
    assert own.n_dense_chunks == full.n_dense_chunks
    assert own.n_dense_blocks == full.n_dense_blocks
    assert own.rows_per_shard == full.rows_per_shard
    # data/cols are views derived from packed — only the merged kernel
    # view (+ lo sidecar) is stored/stacked (round-3 VERDICT item 1b)
    for field in ("packed", "packed_lo", "bucket", "slab"):
        _assert_stack_matches(getattr(own, field), getattr(full, field), OWNED)
    for field in ("dense_data", "dense_lo", "dense_bucket", "dense_slab",
                  "dense_vidx"):
        f_full, f_own = np.asarray(getattr(full, field)), getattr(own, field)
        if isinstance(f_own, ShardStack):
            _assert_stack_matches(f_own, f_full, OWNED)
        else:  # inert placeholder leaves stay plain arrays on both paths
            np.testing.assert_array_equal(f_own, f_full)
    # retained bytes ~ owned fraction
    frac = local_partition_nbytes(own) / max(1, local_partition_nbytes(full))
    assert frac <= len(OWNED) / P + 0.05, frac


def test_owned_solve_matches_plain_distributed():
    """A mesh solve fed per-host-partitioned operators (ShardStack staged
    through make_array_from_callback) must reproduce the plain distributed
    solve exactly — single-process harness for the multi-host staging path
    (the 2-process gloo test asserts the memory bound end to end)."""
    import jax
    import jax.numpy as jnp

    from gmres_tpu import GmresConfig, PrecisionSpec
    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.parallel import dist_gmres

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")

    A = convection_diffusion_2d(24, beta=1.0)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr", precond="ilu_jacobi", jacobi_steps=2,
        restart_length=10, tol=1e-9, max_restarts=60,
    )
    mesh = jax.make_mesh((4,), (dist_gmres.AXIS,))
    res_plain = dist_gmres.solve_distributed(A, b, cfg, mesh=mesh,
                                             record_history=True)

    # monkeypatch-free: drive the owned path by pretending to be multihost
    # with a single process owning every shard
    A2 = convection_diffusion_2d(24, beta=1.0)  # fresh object: no cache hit
    res_owned = dist_gmres.solve_distributed(A2, b, cfg, mesh=mesh,
                                             record_history=True,
                                             multihost=True)
    assert res_owned.converged and res_plain.converged
    assert res_owned.total_iters == res_plain.total_iters
    assert res_owned.restarts == res_plain.restarts
    np.testing.assert_allclose(
        np.asarray(res_owned.x), np.asarray(res_plain.x), rtol=1e-12, atol=0
    )
    assert res_owned.partition_local_bytes is not None
