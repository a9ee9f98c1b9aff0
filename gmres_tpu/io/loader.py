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
