"""Per-host row-block loading (SURVEY.md §5.8 pod scale): every process
loads only its assembled row range from disk; the blocks must concatenate
bit-exactly to the full ``load_matrix`` result, for general and symmetric
files, duplicates, and chunked streaming."""

import numpy as np
import pytest

from gmres_tpu.io import mmio
from gmres_tpu.io.loader import load_matrix, load_matrix_rows


def _write_mtx(path, n, entries, symmetry="general"):
    lines = [
        f"%%MatrixMarket matrix coordinate real {symmetry}",
        "% comment line",
        f"{n} {n} {len(entries)}",
    ]
    for (r, c, v) in entries:
        lines.append(f"{r + 1} {c + 1} {v!r}")
    path.write_text("\n".join(lines) + "\n")


def _rand_entries(n, m, rng, symmetric=False):
    rs = rng.integers(0, n, size=m)
    cs = rng.integers(0, n, size=m)
    if symmetric:
        rs, cs = np.maximum(rs, cs), np.minimum(rs, cs)  # lower triangle
    vs = rng.standard_normal(m)
    return list(zip(rs.tolist(), cs.tolist(), vs.tolist()))


def _assert_blocks_match_full(path, n, splits):
    full = load_matrix(path)
    rp = np.asarray(full.row_ptr).astype(np.int64)
    ci = np.asarray(full.col_idx)[: full.nnz]
    v = np.asarray(full.vals)[: full.nnz]
    for lo, hi in splits:
        blk = load_matrix_rows(path, lo, hi)
        assert blk.n_rows == n and blk.nnz == full.nnz
        np.testing.assert_array_equal(blk.row_ptr, rp)
        a, b = int(rp[lo]), int(rp[hi])
        bci, bv = blk.entries(lo, hi)
        np.testing.assert_array_equal(bci, ci[a:b])
        np.testing.assert_array_equal(bv, v[a:b])


@pytest.mark.parametrize("symmetry", ["general", "symmetric"])
def test_blocks_concatenate_to_full(tmp_path, symmetry):
    rng = np.random.default_rng(3)
    n = 97
    entries = _rand_entries(n, 400, rng, symmetric=(symmetry == "symmetric"))
    # duplicated off-diagonal + duplicated diagonal entries (last-wins)
    entries += [(5, 9, 1.25), (5, 9, -2.5), (7, 7, 3.0), (7, 7, 4.0)]
    p = tmp_path / "m.mtx"
    _write_mtx(p, n, entries, symmetry)
    _assert_blocks_match_full(
        p, n, [(0, 97), (0, 25), (25, 60), (60, 97), (40, 41), (97, 97)]
    )


def test_streaming_chunks_equal_one_shot(tmp_path):
    rng = np.random.default_rng(5)
    n = 211
    entries = _rand_entries(n, 3000, rng)
    p = tmp_path / "big.mtx"
    _write_mtx(p, n, entries)
    h1, r1, c1, v1, cnt1 = mmio.read_coordinate_rows(p, 50, 150)
    # force many tiny chunks (cut lines mid-buffer)
    h2, r2, c2, v2, cnt2 = mmio.read_coordinate_rows(
        p, 50, 150, chunk_bytes=97
    )
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(cnt1, cnt2)


def test_symmetric_mirror_lands_in_block(tmp_path):
    # entry (90, 10): symmetric load must deliver its mirror (10, 90) to
    # the block owning row 10 even though row 90 is outside the block
    p = tmp_path / "s.mtx"
    _write_mtx(p, 100, [(90, 10, 2.5), (0, 0, 1.0)], "symmetric")
    blk = load_matrix_rows(p, 0, 20)
    ci, v = blk.entries(10, 11)
    assert 90 in ci.tolist()
    assert v[ci.tolist().index(90)] == 2.5
    full = load_matrix(p)
    d = full.to_dense()
    np.testing.assert_array_equal(
        blk.local_block().to_dense()[10], d[10]
    )


def test_local_block_matches_full_slice(tmp_path):
    rng = np.random.default_rng(11)
    n = 64
    p = tmp_path / "g.mtx"
    _write_mtx(p, n, _rand_entries(n, 300, rng))
    full = load_matrix(p).to_dense()
    blk = load_matrix_rows(p, 16, 48)
    np.testing.assert_array_equal(blk.local_block().to_dense(), full[16:48])


def test_counts_scan_matches_row_ptr(tmp_path):
    rng = np.random.default_rng(13)
    n = 50
    p = tmp_path / "c.mtx"
    _write_mtx(p, n, _rand_entries(n, 220, rng, symmetric=True), "symmetric")
    full = load_matrix(p)
    blk = load_matrix_rows(p, 10, 30)
    np.testing.assert_array_equal(
        blk.row_ptr, np.asarray(full.row_ptr).astype(np.int64)
    )


def test_bad_range_and_outside_access(tmp_path):
    p = tmp_path / "r.mtx"
    _write_mtx(p, 10, [(0, 1, 1.0)])
    with pytest.raises(ValueError):
        load_matrix_rows(p, 5, 20)
    blk = load_matrix_rows(p, 2, 6)
    with pytest.raises(IndexError):
        blk.entries(0, 4)
