"""Matrix/vector loading with the reference's exact CSR-build contract.

Replicates ``LoadMatrix.hpp:17-154`` as pure, testable functions:

- accepts ``coordinate x (real|integer) x (general|symmetric)`` only
  (``LoadMatrix.hpp:49-54``);
- symmetric files are expanded to full storage (every off-diagonal entry is
  mirrored, ``LoadMatrix.hpp:79-83,118-124``);
- an explicit diagonal entry is guaranteed for every row: a zero-valued
  placeholder is inserted and overwritten if the file provides the value
  (``LoadMatrix.hpp:97-101,110-112``; note "last file occurrence wins" for
  duplicated diagonal entries, and duplicated off-diagonal entries are kept
  as separate stored entries, exactly as the reference does);
- each row's entries are sorted by column index (the reference bubble-sorts,
  ``LoadMatrix.hpp:128-145``; we use a stable vectorized sort — identical
  result, including preserved file order among duplicate (row, col) pairs).

Documented divergence: the reference conflates M and N when allocating the
row array (``LoadMatrix.hpp:62-66``) and silently misbehaves on non-square
inputs; we raise ``ValueError`` instead.

If the native C++ extension is built (``csrc/``), large files are parsed
there; otherwise the numpy path is used.
"""

from __future__ import annotations

import os

import numpy as np

from gmres_tpu.io import mmio
from gmres_tpu.sparse import CSRMatrix, csr_from_arrays


def assemble_reference_csr(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    symmetric: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO -> CSR with the reference's diagonal/symmetry/dup semantics.

    Returns (row_ptr, col_idx, vals) host arrays.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)

    diag_mask = rows == cols
    # Guaranteed diagonal: placeholder 0, overwritten by file entries (last
    # occurrence wins — the reference overwrites the same slot per entry).
    diag_vals = np.zeros(n, dtype=np.float64)
    diag_vals[rows[diag_mask]] = vals[diag_mask]

    off_r, off_c, off_v = rows[~diag_mask], cols[~diag_mask], vals[~diag_mask]

    all_r = [np.arange(n, dtype=np.int64), off_r]
    all_c = [np.arange(n, dtype=np.int64), off_c]
    all_v = [diag_vals, off_v]
    if symmetric:
        all_r.append(off_c)
        all_c.append(off_r)
        all_v.append(off_v)

    r = np.concatenate(all_r)
    c = np.concatenate(all_c)
    v = np.concatenate(all_v)

    # Stable sort by (row, col): keeps duplicate (row, col) pairs in
    # concatenation order, matching the reference's stable bubble sort over
    # its insertion order.
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]

    counts = np.bincount(r, minlength=n).astype(np.int64)
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return row_ptr.astype(np.int32), c.astype(np.int32), v


def load_matrix(path: str | os.PathLike, dtype=np.float64) -> CSRMatrix:
    """The reference's ``LoadMatrix<Scalar>`` (``LoadMatrix.hpp:17-154``)."""
    header, data = mmio.read(path)
    if not (
        header.is_coordinate
        and header.field in ("real", "integer")
        and header.symmetry in ("general", "symmetric")
    ):
        raise ValueError("Unsupported matrix type")
    if header.n_rows != header.n_cols:
        raise ValueError(
            f"non-square matrix ({header.n_rows}x{header.n_cols}); the "
            "reference loader only supports square matrices"
        )
    rows, cols, vals = data
    n = header.n_rows
    row_ptr, col_idx, v = assemble_reference_csr(
        rows, cols, vals, n, symmetric=header.is_symmetric
    )
    return csr_from_arrays(row_ptr, col_idx, v.astype(dtype), n_cols=n)


def assemble_reference_csr_rows(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    row_lo: int,
    row_hi: int,
    symmetric: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``assemble_reference_csr`` restricted to assembled rows
    ``[row_lo, row_hi)`` — bit-identical to slicing the full assembly
    (tests/test_loader_rows.py) but touching only the entries that land in
    the block.  The inputs are the kept entries from
    ``mmio.read_coordinate_rows`` (file order preserved: the stable sort
    keeps duplicate (row, col) pairs in the reference's insertion order —
    diagonal placeholder, then direct entries, then mirrored entries).

    Returns ``(row_ptr_local, col_idx, vals)`` with ``row_ptr_local`` of
    length ``row_hi - row_lo + 1`` and LOCAL offsets; columns stay global.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    nb = row_hi - row_lo

    diag_mask = rows == cols
    in_blk_d = diag_mask & (rows >= row_lo) & (rows < row_hi)
    diag_vals = np.zeros(nb, dtype=np.float64)
    diag_vals[rows[in_blk_d] - row_lo] = vals[in_blk_d]  # last wins

    off = ~diag_mask
    direct = off & (rows >= row_lo) & (rows < row_hi)
    all_r = [np.arange(row_lo, row_hi, dtype=np.int64), rows[direct]]
    all_c = [np.arange(row_lo, row_hi, dtype=np.int64), cols[direct]]
    all_v = [diag_vals, vals[direct]]
    if symmetric:
        mirror = off & (cols >= row_lo) & (cols < row_hi)
        all_r.append(cols[mirror])
        all_c.append(rows[mirror])
        all_v.append(vals[mirror])

    r = np.concatenate(all_r)
    c = np.concatenate(all_c)
    v = np.concatenate(all_v)
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]

    counts = np.bincount(r - row_lo, minlength=nb).astype(np.int64)
    row_ptr = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return row_ptr, c.astype(np.int32), v


def load_matrix_rows(
    path: str | os.PathLike,
    row_lo: int,
    row_hi: int,
    dtype=np.float64,
):
    """Per-host row-block loading (SURVEY.md §5.8 pod scale): stream the
    .mtx keeping only the entries assembled rows ``[row_lo, row_hi)`` need
    (``mmio.read_coordinate_rows``), apply the reference CSR contract to
    the block, and return a ``RowBlockCSR`` — global ``row_ptr`` (O(n)),
    local entries (O(local nnz)).  Every process calling this with its own
    range reconstructs exactly its slice of ``load_matrix(path)``."""
    from gmres_tpu.sparse import RowBlockCSR

    header, rows, cols, vals, counts = mmio.read_coordinate_rows(
        path, row_lo, row_hi
    )
    if not (
        header.field in ("real", "integer")
        and header.symmetry in ("general", "symmetric")
    ):
        raise ValueError("Unsupported matrix type")
    if header.n_rows != header.n_cols:
        raise ValueError(
            f"non-square matrix ({header.n_rows}x{header.n_cols}); the "
            "reference loader only supports square matrices"
        )
    n = header.n_rows
    if not (0 <= row_lo <= row_hi <= n):
        raise ValueError(f"bad row range [{row_lo}, {row_hi}) for n={n}")
    rp_local, ci, v = assemble_reference_csr_rows(
        rows, cols, vals, n, row_lo, row_hi,
        symmetric=header.is_symmetric,
    )
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    assert row_ptr[row_hi] - row_ptr[row_lo] == rp_local[-1], (
        "assembled block nnz disagrees with the global counts scan"
    )
    return RowBlockCSR(
        row_ptr=row_ptr,
        col_idx=ci,
        vals=v.astype(dtype),
        row_lo=row_lo,
        row_hi=row_hi,
        n_rows=n,
        n_cols=n,
    )


def load_vector(path: str | os.PathLike, col: int = 0, dtype=np.float64) -> np.ndarray:
    """The reference's ``LoadVector`` (``LoadMatrix.hpp:156-233``): column
    ``col`` of a dense array file, or the ``col``-column entries of a
    coordinate file scattered into a zero vector."""
    header, data = mmio.read(path)
    if header.is_coordinate:
        n_vecs = header.n_cols
        if col >= n_vecs:
            raise ValueError(f"Column {col} is too large for the {n_vecs} vectors")
        rows, cols, vals = data
        out = np.zeros(header.n_rows, dtype=np.float64)
        sel = cols == col
        out[rows[sel]] = vals[sel]
        return out.astype(dtype)
    else:
        if col >= header.n_cols:
            raise ValueError(f"Column {col} is too large for the {header.n_cols} vectors")
        return np.asarray(data)[:, col].astype(dtype)
