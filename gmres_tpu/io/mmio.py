"""MatrixMarket parsing/writing (numpy, scipy-free).

Replaces the reference's bundled NIST ``mmio.c``/``mmio.h`` with a compact
reader built on modern ``np.loadtxt`` (compiled fast path).  The typecode
model follows the MM spec: ``matrix (coordinate|array)
(real|integer|pattern|complex) (general|symmetric|skew-symmetric|hermitian)``.
"""

from __future__ import annotations

import dataclasses
import io
import os

import numpy as np


class MMIOError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class MMHeader:
    fmt: str        # "coordinate" | "array"
    field: str      # "real" | "integer" | "pattern" | "complex"
    symmetry: str   # "general" | "symmetric" | "skew-symmetric" | "hermitian"
    n_rows: int
    n_cols: int
    nnz: int | None  # None for array format

    @property
    def is_coordinate(self) -> bool:
        return self.fmt == "coordinate"

    @property
    def is_symmetric(self) -> bool:
        return self.symmetry == "symmetric"


def _read_banner(f) -> tuple[str, str, str]:
    banner = f.readline()
    if not banner:
        raise MMIOError("Banner is missing")
    parts = banner.split()
    if len(parts) < 5:
        raise MMIOError("Missing values in banner")
    if parts[0] != "%%MatrixMarket" or parts[1].lower() != "matrix":
        raise MMIOError("Banner is missing")
    fmt, field, symmetry = (p.lower() for p in parts[2:5])
    if fmt not in ("coordinate", "array"):
        raise MMIOError("Unrecognized description")
    if field not in ("real", "integer", "pattern", "complex"):
        raise MMIOError("Unrecognized description")
    if symmetry not in ("general", "symmetric", "skew-symmetric", "hermitian"):
        raise MMIOError("Unrecognized description")
    return fmt, field, symmetry


def _read_size_line(f) -> list[int]:
    while True:
        line = f.readline()
        if not line:
            raise MMIOError("Malformed matrix size information")
        line = line.strip()
        if line and not line.startswith("%"):
            try:
                return [int(tok) for tok in line.split()]
            except ValueError as e:
                raise MMIOError("Malformed matrix size information") from e


def read_header(path: str | os.PathLike) -> MMHeader:
    with open(path, "r") as f:
        fmt, field, symmetry = _read_banner(f)
        size = _read_size_line(f)
        if fmt == "coordinate":
            if len(size) != 3:
                raise MMIOError("Malformed matrix size information")
            return MMHeader(fmt, field, symmetry, size[0], size[1], size[2])
        if len(size) != 2:
            raise MMIOError("Malformed matrix size information")
        return MMHeader(fmt, field, symmetry, size[0], size[1], None)


def read(path: str | os.PathLike):
    """Read a .mtx file.

    Returns ``(header, data)`` where for coordinate format ``data`` is
    ``(rows, cols, vals)`` (0-based int64 indices; vals are float64, or all
    ones for pattern files), and for array format ``data`` is a dense
    ``(n_rows, n_cols)`` float64 array in column-major entry order as
    stored.
    """
    with open(path, "r") as f:
        fmt, field, symmetry = _read_banner(f)
        size = _read_size_line(f)
        if fmt == "coordinate":
            if len(size) != 3:
                raise MMIOError("Malformed matrix size information")
            n_rows, n_cols, nnz = size
            header = MMHeader(fmt, field, symmetry, n_rows, n_cols, nnz)
            ncols_data = 2 if field == "pattern" else (4 if field == "complex" else 3)
            if field in ("real", "integer", "pattern") and nnz > 0:
                # native fast path (C strtol/strtod parser)
                try:
                    from gmres_tpu.native import parse_coord_native

                    rest = f.read().encode()
                    rows, cols, vals = parse_coord_native(
                        rest, nnz, pattern=(field == "pattern")
                    )
                    return header, (rows, cols, vals)
                except (ImportError, ValueError):
                    f.seek(0)
                    _read_banner(f)
                    _read_size_line(f)
            raw = np.loadtxt(f, dtype=np.float64, comments="%", ndmin=2,
                             max_rows=nnz if nnz > 0 else None)
            if nnz == 0:
                raw = np.empty((0, ncols_data), dtype=np.float64)
            if raw.shape[0] != nnz or raw.shape[1] < ncols_data:
                raise MMIOError("Malformed matrix data")
            rows = raw[:, 0].astype(np.int64) - 1
            cols = raw[:, 1].astype(np.int64) - 1
            if field == "pattern":
                vals = np.ones(nnz, dtype=np.float64)
            elif field == "complex":
                vals = raw[:, 2] + 1j * raw[:, 3]
            else:
                vals = raw[:, 2]
            return header, (rows, cols, vals)
        else:
            if len(size) != 2:
                raise MMIOError("Malformed matrix size information")
            n_rows, n_cols = size
            header = MMHeader(fmt, field, symmetry, n_rows, n_cols, None)
            flat = np.loadtxt(f, dtype=np.float64, comments="%").reshape(-1)
            if symmetry == "general":
                expected = n_rows * n_cols
            else:
                expected = n_rows * (n_rows + 1) // 2
            if flat.shape[0] != expected:
                raise MMIOError("Malformed matrix data")
            if symmetry == "general":
                dense = flat.reshape(n_cols, n_rows).T  # column-major storage
            else:
                dense = np.zeros((n_rows, n_cols), dtype=np.float64)
                iu = np.tril_indices(n_rows)  # MM stores lower triangle col-major
                # column-major lower triangle: for each col j, rows j..n-1
                idx = 0
                for j in range(n_cols):
                    cnt = n_rows - j
                    dense[j:, j] = flat[idx : idx + cnt]
                    idx += cnt
                del iu
                dense = dense + np.tril(dense, -1).T
            return header, dense


def read_coordinate_rows(
    path: str | os.PathLike,
    row_lo: int,
    row_hi: int,
    chunk_bytes: int = 64 << 20,
):
    """Stream a coordinate .mtx keeping only the entries a row block needs.

    The pod-scale loader (SURVEY.md §5.8): a process reading rows
    ``[row_lo, row_hi)`` of the ASSEMBLED matrix must keep a file entry
    (r, c, v) when ``r`` is in range, or — for symmetric files — when
    ``c`` is in range (the mirrored entry (c, r) lands in the block).
    The file is parsed in ``chunk_bytes`` pieces (native strtol parser per
    chunk), so peak memory is O(kept entries + chunk + n), never O(nnz).

    Returns ``(header, rows, cols, vals, counts)`` with 0-based kept
    entries in file order and ``counts[r]`` = the ASSEMBLED per-row entry
    count for every global row (forced diagonal + off-diagonals + mirrored
    off-diagonals) — the cumsum is the assembled global row_ptr.

    Only ``coordinate x (real|integer|pattern)`` files (the loader's
    supported set; complex needs no row-block path).
    """
    header = read_header(path)
    if not header.is_coordinate or header.field not in (
        "real", "integer", "pattern",
    ):
        raise MMIOError("row-block reading supports coordinate real/integer/"
                        "pattern files")
    symmetric = header.symmetry in ("symmetric", "skew-symmetric")
    pattern = header.field == "pattern"
    n = header.n_rows
    counts = np.ones(n, dtype=np.int64)  # forced diagonal per row
    kept_r, kept_c, kept_v = [], [], []

    def _parse(buf: bytes, max_entries: int):
        try:
            from gmres_tpu.native import parse_coord_native

            return parse_coord_native(buf, max_entries, pattern=pattern)
        except (ImportError, ValueError):
            raw = np.loadtxt(
                __import__("io").StringIO(buf.decode()),
                dtype=np.float64, comments="%", ndmin=2,
            )
            if raw.size == 0:
                return (np.empty(0, np.int64), np.empty(0, np.int64),
                        np.empty(0, np.float64))
            r = raw[:, 0].astype(np.int64) - 1
            c = raw[:, 1].astype(np.int64) - 1
            v = (np.ones(r.shape[0]) if pattern else raw[:, 2])
            return r, c, v

    remaining = header.nnz
    with open(path, "rb") as f:
        # skip banner + comment/size lines
        f.readline()
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                raise MMIOError("Malformed matrix size information")
            s = line.strip()
            if s and not s.startswith(b"%"):
                break  # the size line; data starts after it
        del pos
        tail = b""
        while remaining > 0:
            buf = f.read(chunk_bytes)
            if not buf:
                break
            buf = tail + buf
            cut = buf.rfind(b"\n")
            if cut < 0:
                tail = buf
                continue
            tail = buf[cut + 1:]
            chunk = buf[: cut + 1]
            est = chunk.count(b"\n")
            r, c, v = _parse(chunk, min(est, remaining))
            got = r.shape[0]
            if got == 0:
                continue
            remaining -= got
            off = r != c
            np.add.at(counts, r[off], 1)
            if symmetric:
                np.add.at(counts, c[off], 1)
            keep = (r >= row_lo) & (r < row_hi)
            if symmetric:
                keep |= (c >= row_lo) & (c < row_hi)
            if keep.any():
                kept_r.append(r[keep])
                kept_c.append(c[keep])
                kept_v.append(v[keep])
        if remaining > 0 and tail.strip():
            r, c, v = _parse(tail + b"\n", remaining)
            if r.shape[0]:
                remaining -= r.shape[0]
                off = r != c
                np.add.at(counts, r[off], 1)
                if symmetric:
                    np.add.at(counts, c[off], 1)
                keep = (r >= row_lo) & (r < row_hi)
                if symmetric:
                    keep |= (c >= row_lo) & (c < row_hi)
                if keep.any():
                    kept_r.append(r[keep])
                    kept_c.append(c[keep])
                    kept_v.append(v[keep])
    if remaining != 0:
        raise MMIOError(f"Malformed matrix data ({remaining} entries missing)")
    cat = lambda parts, dt: (np.concatenate(parts) if parts
                             else np.empty(0, dt))
    return (header, cat(kept_r, np.int64), cat(kept_c, np.int64),
            cat(kept_v, np.float64), counts)


def write_coordinate(
    path: str | os.PathLike,
    n_rows: int,
    n_cols: int,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray | None = None,
    symmetry: str = "general",
    field: str | None = None,
    comment: str | None = None,
):
    """Write a coordinate .mtx file (1-based on disk)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if field is None:
        field = "pattern" if vals is None else "real"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n")
        f.write(f"{n_rows} {n_cols} {rows.shape[0]}\n")
        if vals is None:
            np.savetxt(f, np.column_stack([rows + 1, cols + 1]), fmt="%d %d")
        else:
            np.savetxt(
                f,
                np.column_stack([rows + 1, cols + 1, np.asarray(vals)]),
                fmt="%d %d %.17g",
            )


def write_array(path: str | os.PathLike, a: np.ndarray, comment: str | None = None):
    """Write a dense array .mtx file (column-major entry order)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    if a.shape[0] == 1 and a.ndim == 2 and a.shape[1] > 1:
        a = a.T
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n")
        f.write(f"{a.shape[0]} {a.shape[1]}\n")
        np.savetxt(f, a.T.reshape(-1), fmt="%.17g")
