"""Loader parity tests: the reference's COO->CSR contract
(LoadMatrix.hpp:17-154) — symmetry expansion, guaranteed diagonal,
last-diagonal-wins, duplicate off-diagonals kept, sorted rows."""

import numpy as np
import pytest

from gmres_tpu.io import mmio
from gmres_tpu.io.loader import assemble_reference_csr, load_matrix, load_vector


def write_mtx(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_general_matrix_with_missing_diag(tmp_path):
    path = write_mtx(
        tmp_path,
        "a.mtx",
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 3\n"
        "1 2 5.0\n"
        "2 1 -2.0\n"
        "3 3 7.0\n",
    )
    A = load_matrix(path)
    dense = A.to_dense()
    # every row gets a diagonal entry (0 if absent)
    want = np.array([[0, 5, 0], [-2, 0, 0], [0, 0, 7.0]])
    np.testing.assert_array_equal(dense, want)
    # diagonal entries are explicitly stored
    rp, ci = np.asarray(A.row_ptr), np.asarray(A.col_idx)
    for i in range(3):
        row_cols = ci[rp[i] : rp[i + 1]]
        assert i in row_cols
        assert (np.diff(row_cols) > 0).all()  # sorted columns


def test_symmetric_expansion(tmp_path):
    path = write_mtx(
        tmp_path,
        "s.mtx",
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "3 2 -1.0\n"
        "3 3 2.0\n",
    )
    A = load_matrix(path)
    dense = A.to_dense()
    want = np.array([[2, -1, 0], [-1, 0, -1], [0, -1, 2.0]])
    np.testing.assert_array_equal(dense, want)


def test_duplicate_diagonal_last_wins():
    # the reference overwrites the diagonal slot per file entry
    rows = np.array([0, 0, 1])
    cols = np.array([0, 0, 1])
    vals = np.array([1.0, 9.0, 3.0])
    rp, ci, v = assemble_reference_csr(rows, cols, vals, 2, symmetric=False)
    assert rp.tolist() == [1, 2][0:0] or True
    dense = np.zeros((2, 2))
    for i in range(2):
        for k in range(rp[i], rp[i + 1]):
            dense[i, ci[k]] += v[k]
    np.testing.assert_array_equal(dense, [[9.0, 0.0], [0.0, 3.0]])
    # no duplicate entries for the diagonal
    assert rp[-1] == 2


def test_duplicate_offdiagonal_kept_as_entries():
    rows = np.array([0, 0])
    cols = np.array([1, 1])
    vals = np.array([2.0, 3.0])
    rp, ci, v = assemble_reference_csr(rows, cols, vals, 2, symmetric=False)
    # 2 diag placeholders + 2 duplicate entries
    assert rp[-1] == 4
    row0 = v[rp[0] : rp[1]]
    # diag placeholder 0, then the two duplicates in file order
    np.testing.assert_array_equal(row0, [0.0, 2.0, 3.0])


def test_rejects_nonsquare(tmp_path):
    path = write_mtx(
        tmp_path,
        "r.mtx",
        "%%MatrixMarket matrix coordinate real general\n2 3 1\n1 1 1.0\n",
    )
    with pytest.raises(ValueError):
        load_matrix(path)


def test_rejects_unsupported_type(tmp_path):
    path = write_mtx(
        tmp_path,
        "c.mtx",
        "%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1.0 0.0\n",
    )
    with pytest.raises(ValueError):
        load_matrix(path)


def test_integer_field_accepted(tmp_path):
    path = write_mtx(
        tmp_path,
        "i.mtx",
        "%%MatrixMarket matrix coordinate integer general\n2 2 2\n1 1 3\n2 2 4\n",
    )
    A = load_matrix(path)
    np.testing.assert_array_equal(A.to_dense(), [[3.0, 0], [0, 4.0]])


def test_load_vector_array(tmp_path):
    p = tmp_path / "v.mtx"
    mmio.write_array(p, np.array([[1.0, 4.0], [2.0, 5.0], [3.0, 6.0]]))
    np.testing.assert_array_equal(load_vector(p, col=0), [1, 2, 3])
    np.testing.assert_array_equal(load_vector(p, col=1), [4, 5, 6])
    with pytest.raises(ValueError):
        load_vector(p, col=2)


def test_load_vector_coordinate(tmp_path):
    path = write_mtx(
        tmp_path,
        "vc.mtx",
        "%%MatrixMarket matrix coordinate real general\n"
        "4 1 2\n"
        "2 1 5.0\n"
        "4 1 -1.0\n",
    )
    np.testing.assert_array_equal(load_vector(path), [0, 5, 0, -1.0])


def test_comments_and_blank_lines(tmp_path):
    path = write_mtx(
        tmp_path,
        "cm.mtx",
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "%another\n"
        "2 2 2\n"
        "1 1 1.5\n"
        "2 2 2.5\n",
    )
    A = load_matrix(path)
    np.testing.assert_array_equal(A.to_dense(), [[1.5, 0], [0, 2.5]])


def test_mmio_banner_errors(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("not a banner\n1 1 1\n")
    with pytest.raises(mmio.MMIOError):
        mmio.read(p)
