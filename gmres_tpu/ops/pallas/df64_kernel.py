"""Double-float (two-fp32) DIA SpMV — emulated-fp64 Pallas kernel.

TPU has no fp64 ALUs; XLA emulates fp64 in software (the honest `baseline`
mode).  This kernel implements the alternative SURVEY.md §7.3 calls out:
carry each fp64 value as an unevaluated pair of fp32s (hi + lo, Dekker /
Knuth error-free transformations) and run the whole SpMV on the VPU in
fp32.  Accuracy is ~2^-48 relative (vs fp64's 2^-53) — far below the
fp32 inner loop's 2^-24, so it is a drop-in for the mixed scheme's outer
residual; it is NOT bit-identical to IEEE fp64 (no native rounding), which
is why the `baseline` mode keeps XLA's emulation.

Error-free transforms need strict fp32 semantics; Veltkamp splitting (no
FMA assumed) keeps the error terms exact under Mosaic's default float
behavior.  The accuracy test (tests/test_df64.py) guards against compiler
contraction regressions.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 32 * 1024
_LANES = 128


def _resolve_interpret(interpret):
    """None = auto: interpret off-TPU so the same code path is exercised
    (and testable) on CPU."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pick_block(n_pad: int) -> int:
    """Largest block <= _BLOCK that divides n_pad (callers align n_pad to
    either a multiple of _BLOCK or something <= _BLOCK)."""
    if n_pad <= _BLOCK:
        return n_pad
    assert n_pad % _BLOCK == 0, n_pad
    return _BLOCK
_SPLIT = 4097.0  # 2^12 + 1 (Veltkamp split for fp32); python float
# literal so it folds into the kernel ops instead of being a captured array


def split_f64(x) -> tuple[jax.Array, jax.Array]:
    """fp64 array -> (hi, lo) fp32 pair with x == hi + lo exactly
    (up to double rounding of the tail)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def merge_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    err = b - (s - a)
    return s, err


def _two_prod(a, b):
    p = a * b
    ca = _SPLIT * a
    a_hi = ca - (ca - a)
    a_lo = a - a_hi
    cb = _SPLIT * b
    b_hi = cb - (cb - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def _df_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _quick_two_sum(p, e)


def _df_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    e = e + al + bl
    return _quick_two_sum(s, e)


def _dia_df64_kernel(dh_ref, dl_ref, x_hbm_h, x_hbm_l, yh_ref, yl_ref,
                     xh_vmem, xl_vmem, semh, seml, *, offsets, pad, block):
    i = pl.program_id(0)
    start = i * block
    cph = pltpu.make_async_copy(
        x_hbm_h.at[pl.ds(start, block + 2 * pad)], xh_vmem, semh
    )
    cpl = pltpu.make_async_copy(
        x_hbm_l.at[pl.ds(start, block + 2 * pad)], xl_vmem, seml
    )
    cph.start()
    cpl.start()
    cph.wait()
    cpl.wait()

    acc_h = jnp.zeros((block,), jnp.float32)
    acc_l = jnp.zeros((block,), jnp.float32)
    for d, off in enumerate(offsets):
        ah = dh_ref[d, :]
        al = dl_ref[d, :]
        xh = xh_vmem[pl.ds(pad + off, block)]
        xl = xl_vmem[pl.ds(pad + off, block)]
        ph, plo = _df_mul(ah, al, xh, xl)
        acc_h, acc_l = _df_add(acc_h, acc_l, ph, plo)
    yh_ref[:] = acc_h
    yl_ref[:] = acc_l


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_spmv_df64(dh, dl, xh_padded, xl_padded, offsets, interpret=None):
    interpret = _resolve_interpret(interpret)
    D, n_pad = dh.shape
    pad = (xh_padded.shape[0] - n_pad) // 2
    block = _pick_block(n_pad)
    grid = n_pad // block
    kernel = functools.partial(
        _dia_df64_kernel, offsets=offsets, pad=pad, block=block
    )
    with jax.enable_x64(False):
        yh, yl = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((D, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block + 2 * pad,), jnp.float32),
                pltpu.VMEM((block + 2 * pad,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(dh, dl, xh_padded, xl_padded)
    return yh, yl


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _halo_pad(offsets) -> int:
    """Operand halo width: at least max|offset|, rounded so the kernels'
    manual DMA windows (``block + 2*pad`` f32 elements) stay multiples of
    the 1-D Mosaic tile (1024 32-bit words) — an unaligned memref_slice
    is a hard compile error at small shapes (e.g. the 1-device dryrun's
    n=256 solve sliced 1280 from a 2048 buffer: 'Slice shape along
    dimension 0 must be aligned to tiling (1024)')."""
    return _round_up(max(1, max(abs(o) for o in offsets)), 512)


def _residual_kernel(dh_ref, dl_ref, bh_ref, bl_ref, x_hbm_h, x_hbm_l,
                     rh_ref, rl_ref, acc_ref, xh_vmem, xl_vmem, semh, seml,
                     *, offsets, pad, block):
    """r = b - A x in double-float, plus ||r||^2 and ||x||^2 partials
    (lanes 0 and 1 of the accumulator) — the mixed scheme's entire fp64
    outer-residual phase in one sweep."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = i * block
    cph = pltpu.make_async_copy(
        x_hbm_h.at[pl.ds(start, block + 2 * pad)], xh_vmem, semh
    )
    cpl = pltpu.make_async_copy(
        x_hbm_l.at[pl.ds(start, block + 2 * pad)], xl_vmem, seml
    )
    cph.start()
    cpl.start()
    cph.wait()
    cpl.wait()

    acc_h = jnp.zeros((block,), jnp.float32)
    acc_l = jnp.zeros((block,), jnp.float32)
    for d, off in enumerate(offsets):
        ph, plo = _df_mul(
            dh_ref[d, :], dl_ref[d, :],
            xh_vmem[pl.ds(pad + off, block)], xl_vmem[pl.ds(pad + off, block)],
        )
        acc_h, acc_l = _df_add(acc_h, acc_l, ph, plo)
    # r = b - y  (negate y, then df-add)
    rh, rl = _df_add(bh_ref[0, :], bl_ref[0, :], -acc_h, -acc_l)
    rh_ref[0, :] = rh
    rl_ref[0, :] = rl

    xh_c = xh_vmem[pl.ds(pad, block)]  # center block (no halo double count)
    r_ss = jnp.sum(rh * rh)
    x_ss = jnp.sum(xh_c * xh_c)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
    acc_ref[0, :] += jnp.where(lane == 0, r_ss, jnp.where(lane == 1, x_ss, 0.0))


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def residual_df64(dh, dl, bh, bl, xh_padded, xl_padded, offsets,
                  interpret=None):
    """(r_hi, r_lo, ||r||^2, ||x||^2) for r = b - A x, all inputs split
    fp32 pairs; the operand x is pre-padded with the halo like
    dia_spmv_df64.  Sum-of-squares (not norms) so distributed callers can
    psum the shard partials before the sqrt."""
    interpret = _resolve_interpret(interpret)
    D, n_pad = dh.shape
    pad = (xh_padded.shape[0] - n_pad) // 2
    block = _pick_block(n_pad)
    grid = n_pad // block
    kernel = functools.partial(
        _residual_kernel, offsets=offsets, pad=pad, block=block
    )
    with jax.enable_x64(False):
        rh, rl, acc = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((D, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block + 2 * pad,), jnp.float32),
                pltpu.VMEM((block + 2 * pad,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(dh, dl, bh[None, :], bl[None, :], xh_padded, xl_padded)
    return rh[0], rl[0], acc[0, 0], acc[0, 1]


def _axpy_kernel(xh_ref, xl_ref, inc_ref, oh_ref, ol_ref):
    """(xh, xl) += inc (fp32 solution increment), in double-float."""
    oh, ol = _df_add(xh_ref[0, :], xl_ref[0, :], inc_ref[0, :],
                     jnp.zeros_like(inc_ref[0, :]))
    oh_ref[0, :] = oh
    ol_ref[0, :] = ol


@functools.partial(jax.jit, static_argnames=("interpret",))
def axpy_df64(xh, xl, inc, interpret=None):
    interpret = _resolve_interpret(interpret)
    n_in = xh.shape[0]
    block = min(_BLOCK, _round_up(n_in, _LANES * 8))
    n = _round_up(n_in, block)
    if n != n_in:
        xh = jnp.pad(xh, (0, n - n_in))
        xl = jnp.pad(xl, (0, n - n_in))
        inc = jnp.pad(inc, (0, n - n_in))
    grid = n // block
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            _axpy_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
            ),
            interpret=interpret,
        )(xh[None, :], xl[None, :], inc[None, :])
    return oh[0, :n_in], ol[0, :n_in]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data_hi", "data_lo"),
    meta_fields=("offsets", "n_rows", "n_cols", "nnz"),
)
@dataclasses.dataclass(frozen=True)
class DF64Dia:
    """Pre-split double-float view of a DIAMatrix (fp64 values).  A pytree,
    so it threads through jit like the other operator containers."""

    data_hi: jax.Array
    data_lo: jax.Array
    offsets: tuple
    n_rows: int
    n_cols: int
    nnz: int

    @staticmethod
    def from_dia(A) -> "DF64Dia":
        dh, dl = split_f64(jnp.asarray(A.data, jnp.float64))
        return DF64Dia(
            data_hi=jax.device_put(dh),
            data_lo=jax.device_put(dl),
            offsets=tuple(A.offsets),
            n_rows=A.n_rows,
            n_cols=A.n_cols,
            nnz=A.nnz,
        )

    @property
    def vals(self):
        """Frobenius-norm-compatible values view (fp64 reconstruction)."""
        return merge_f64(self.data_hi, self.data_lo).reshape(-1)


def dia_spmv_df64(A, x, interpret: bool = False):
    """y = A @ x with double-float arithmetic.

    ``A``: DF64Dia (pre-split) or a DIAMatrix with fp64 data.
    ``x``: fp64 vector.  Returns an fp64 vector accurate to ~2^-48."""
    if not isinstance(A, DF64Dia):
        A = DF64Dia.from_dia(A)
    n = A.n_rows
    block = min(_BLOCK, _round_up(n, _LANES * 8))
    n_pad = _round_up(n, block)
    pad = _halo_pad(A.offsets)

    dh, dl = A.data_hi, A.data_lo
    if n_pad != n:
        dh = jnp.pad(dh, ((0, 0), (0, n_pad - n)))
        dl = jnp.pad(dl, ((0, 0), (0, n_pad - n)))
    xh, xl = split_f64(jnp.asarray(x, jnp.float64))
    xh = jnp.pad(xh, (pad, pad + (n_pad - n)))
    xl = jnp.pad(xl, (pad, pad + (n_pad - n)))

    yh, yl = _dia_spmv_df64(dh, dl, xh, xl, A.offsets, interpret=interpret)
    return merge_f64(yh[:n], yl[:n])


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data_hi", "data_lo"),
    meta_fields=("offsets", "n_shards", "rows_per_shard", "halo_left",
                 "halo_right", "nnz"),
)
@dataclasses.dataclass(frozen=True)
class DF64HaloDia:
    """Row-partitioned double-float DIA (the distributed analog of DF64Dia:
    hi/lo splits of a ``parallel.halo.HaloDIA``).  Lets the sharded mixed
    solver run its fp64 outer residual through the two-fp32 kernels instead
    of XLA's emulated fp64 (VERDICT round-1 item 3)."""

    data_hi: jax.Array         # (P, D, rows_per_shard)
    data_lo: jax.Array
    offsets: tuple
    n_shards: int
    rows_per_shard: int
    halo_left: int
    halo_right: int
    nnz: int

    @staticmethod
    def from_halo(H) -> "DF64HaloDia":
        from gmres_tpu.parallel.partition import ShardStack

        if isinstance(H.data, ShardStack):
            # per-host partitioned data: split each owned piece on the host
            hi_p, lo_p = {}, {}
            for s, piece in H.data.pieces.items():
                p64 = np.asarray(piece, dtype=np.float64)
                hi_p[s] = p64.astype(np.float32)
                lo_p[s] = (p64 - hi_p[s].astype(np.float64)).astype(np.float32)
            dh = ShardStack(H.data.shape, np.dtype(np.float32), hi_p)
            dl = ShardStack(H.data.shape, np.dtype(np.float32), lo_p)
        else:
            dh, dl = split_f64(jnp.asarray(H.data, jnp.float64))
        return DF64HaloDia(
            data_hi=dh,
            data_lo=dl,
            offsets=tuple(H.offsets),
            n_shards=H.n_shards,
            rows_per_shard=H.rows_per_shard,
            halo_left=H.halo_left,
            halo_right=H.halo_right,
            nnz=H.nnz,
        )

    @property
    def vals(self):
        return merge_f64(self.data_hi, self.data_lo).reshape(-1)


def residual_df64_halo(A: DF64HaloDia, bh, bl, xh_local, xl_local,
                       axis_name: str):
    """Shard-local r = b - A x through the df64 residual kernel, inside
    shard_map: the (hi, lo) operand halos ride one stacked ppermute
    exchange; the kernel's ||r||^2 / ||x||^2 partials are psum'd by the
    caller.  Returns (r_hi, r_lo, r_ss_local, x_ss_local)."""
    from gmres_tpu.parallel.halo import _exchange_halos

    hl, hr, P = A.halo_left, A.halo_right, A.n_shards
    r = A.rows_per_shard
    stacked = jnp.stack([xh_local, xl_local])           # (2, r)
    xx = _exchange_halos(stacked, hl, hr, P, axis_name, axis=1)  # (2, r+hl+hr)

    dh, dl = A.data_hi[0], A.data_lo[0]                 # (D, r)
    pad = _halo_pad(A.offsets)
    assert pad >= hl and pad >= hr, (pad, hl, hr)
    block = min(_BLOCK, _round_up(r, _LANES * 8))
    n_pad = _round_up(r, block)
    if n_pad != r:
        dh = jnp.pad(dh, ((0, 0), (0, n_pad - r)))
        dl = jnp.pad(dl, ((0, 0), (0, n_pad - r)))
        bh = jnp.pad(bh, (0, n_pad - r))
        bl = jnp.pad(bl, (0, n_pad - r))
    tail = pad - hr + (n_pad - r)
    xh_p = jnp.pad(xx[0], (pad - hl, tail))
    xl_p = jnp.pad(xx[1], (pad - hl, tail))
    rh, rl, r_ss, _ = residual_df64(dh, dl, bh, bl, xh_p, xl_p, A.offsets)
    # the kernel's ||x||^2 reads its center region, which in the halo
    # layout also contains the right-halo copy of the neighbor's x —
    # compute the local partial from the unexchanged shard instead
    x_ss = jnp.sum(xh_local * xh_local)
    return rh[:r], rl[:r], r_ss, x_ss


# ---------------------------------------------------------------------------
# Double-float orthogonalization kernels (the df64 INNER tier's hot loop).
#
# The jnp pair path in ops/df64.py is correct everywhere but materializes
# every EFT intermediate in HBM: the pairwise-halving df_sum alone re-reads
# O(m * n) arrays log2(n) times, which measured 7x SLOWER than XLA's own
# emulated fp64 at bench scale (round-3 VERDICT weak item 5).  These
# kernels stream the (hi, lo) basis pair through VMEM once per sweep and
# run the whole EFT chain in registers, mirroring the f32 trio
# (_gram / _update_gram / _update_sumsq) used by cgsr2_pallas.
#
# Cross-block reductions accumulate PER-LANE pair partials (128 lanes) in
# a VMEM-resident output block with df-adds; the final 128 -> 1 lane fold
# happens outside the kernel (7 tiny df-adds).  Reduction order is
# deterministic, error growth O(log n) * 2^-48 like the jnp tree.
# ---------------------------------------------------------------------------

# V-pair block budget: hi+lo blocks are double-buffered by the pipeline,
# so bytes = 2 (pair) * m1 * B * 4 (f32) * 2 (buffering) <= ~7 MB
_DF_ORTH_VMEM = 7 * 1024 * 1024


def _df_orth_block(m1: int, n: int) -> int | None:
    for B in (32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128):
        if n % B == 0 and 16 * m1 * B <= _DF_ORTH_VMEM:
            return B
    return None


def _pair_tree_lanes(ph, plo):
    """(r, B) pair -> (r, 128) per-lane pair partials: fold the
    sublane-reshaped middle axis by halving df-adds (B is a power-of-two
    multiple of 128 by construction)."""
    r, B = ph.shape
    ph = ph.reshape(r, B // 128, 128)
    plo = plo.reshape(r, B // 128, 128)
    while ph.shape[1] > 1:
        half = ph.shape[1] // 2
        ph, plo = _df_add(ph[:, :half], plo[:, :half],
                          ph[:, half:], plo[:, half:])
    return ph[:, 0, :], plo[:, 0, :]


def _finish_lane_pairs(sh, sl):
    """(..., 128) per-lane pair partials -> fp64 totals (host-side jnp)."""
    while sh.shape[-1] > 1:
        half = sh.shape[-1] // 2
        sh, sl = _df_add(sh[..., :half], sl[..., :half],
                         sh[..., half:], sl[..., half:])
    return merge_f64(sh[..., 0], sl[..., 0])


def _accum_pair_block(out_ref, sh, sl, m1):
    """df-accumulate an (m1, 128) pair partial into the (256, 128) output
    block (rows [0,128) hi, [128,256) lo)."""
    if m1 < 128:
        z = jnp.zeros((128 - m1, 128), jnp.float32)
        sh = jnp.concatenate([sh, z])
        sl = jnp.concatenate([sl, z])
    nh, nl = _df_add(out_ref[:128, :], out_ref[128:, :], sh, sl)
    out_ref[:128, :] = nh
    out_ref[128:, :] = nl


def _pair_comb(Vh, Vl, uh_row, ul_row, m1):
    """sum_j u_j * V_j in pairs -> (B,) pair (the CGS elimination vector).
    Tree-reduce over the (padded power-of-two) row axis."""
    ph, plo = _df_mul(Vh, Vl, uh_row[:, None], ul_row[:, None])
    p = 1 << max(0, (m1 - 1).bit_length())
    if p != m1:
        z = jnp.zeros((p - m1,) + ph.shape[1:], ph.dtype)
        ph = jnp.concatenate([ph, z])
        plo = jnp.concatenate([plo, z])
    while ph.shape[0] > 1:
        half = ph.shape[0] // 2
        ph, plo = _df_add(ph[:half], plo[:half], ph[half:], plo[half:])
    return ph[0], plo[0]


def _df_gram_kernel(Vh_ref, Vl_ref, wh_ref, wl_ref, out_ref, *, m1):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ph, plo = _df_mul(Vh_ref[:, :], Vl_ref[:, :],
                      wh_ref[0, :][None, :], wl_ref[0, :][None, :])
    sh, sl = _pair_tree_lanes(ph, plo)
    _accum_pair_block(out_ref, sh, sl, m1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def df_gram_pallas(Vh, Vl, wh, wl, interpret=None):
    """u[j] = <V_j, w> over (hi, lo) pairs; returns (m1,) fp64."""
    interpret = _resolve_interpret(interpret)
    m1, n = Vh.shape
    block = _df_orth_block(m1, n)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_df_gram_kernel, m1=m1),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((256, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            interpret=interpret,
        )(Vh, Vl, wh[None, :], wl[None, :])
    return _finish_lane_pairs(out[:128], out[128:])[:m1]


def _df_update_gram_kernel(Vh_ref, Vl_ref, wh_ref, wl_ref, uh_ref, ul_ref,
                           woh_ref, wol_ref, u2_ref, *, m1):
    """Fused df64 CGSR middle pass: w' = w - u @ V, then u2 = V @ w' with
    the SAME V pair blocks resident — one pair sweep instead of two."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        u2_ref[...] = jnp.zeros_like(u2_ref)

    Vh, Vl = Vh_ref[:, :], Vl_ref[:, :]
    ch, cl = _pair_comb(Vh, Vl, uh_ref[0, :], ul_ref[0, :], m1)
    wh, wl = _df_add(wh_ref[0, :], wl_ref[0, :], -ch, -cl)
    woh_ref[0, :] = wh
    wol_ref[0, :] = wl
    ph, plo = _df_mul(Vh, Vl, wh[None, :], wl[None, :])
    sh, sl = _pair_tree_lanes(ph, plo)
    _accum_pair_block(u2_ref, sh, sl, m1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def df_update_gram_pallas(Vh, Vl, wh, wl, u64, interpret=None):
    """(w', u2) = (w - u @ V, V @ w') on pairs; u is fp64 (m1,)."""
    interpret = _resolve_interpret(interpret)
    m1, n = Vh.shape
    block = _df_orth_block(m1, n)
    uh, ul = split_f64(u64)
    with jax.enable_x64(False):
        woh, wol, u2 = pl.pallas_call(
            functools.partial(_df_update_gram_kernel, m1=m1),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((256, 128), jnp.float32),
            ),
            interpret=interpret,
        )(Vh, Vl, wh[None, :], wl[None, :], uh[None, :], ul[None, :])
    return woh[0], wol[0], _finish_lane_pairs(u2[:128], u2[128:])[:m1]


def _df_update_sumsq_kernel(Vh_ref, Vl_ref, wh_ref, wl_ref, uh_ref, ul_ref,
                            woh_ref, wol_ref, ss_ref, *, m1):
    """Final df64 update pass with ||w'||^2 pair partials accumulated in
    the same sweep (rows 0/1 of the (8, 128) accumulator = hi/lo)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        ss_ref[...] = jnp.zeros_like(ss_ref)

    Vh, Vl = Vh_ref[:, :], Vl_ref[:, :]
    ch, cl = _pair_comb(Vh, Vl, uh_ref[0, :], ul_ref[0, :], m1)
    wh, wl = _df_add(wh_ref[0, :], wl_ref[0, :], -ch, -cl)
    woh_ref[0, :] = wh
    wol_ref[0, :] = wl
    ph, plo = _df_mul(wh[None, :], wl[None, :], wh[None, :], wl[None, :])
    sh, sl = _pair_tree_lanes(ph, plo)      # (1, 128)
    nh, nl = _df_add(ss_ref[0, :], ss_ref[1, :], sh[0], sl[0])
    ss_ref[0, :] = nh
    ss_ref[1, :] = nl


@functools.partial(jax.jit, static_argnames=("interpret",))
def df_update_sumsq_pallas(Vh, Vl, wh, wl, u64, interpret=None):
    """(w', ||w'||^2) = (w - u @ V, <w', w'>) on pairs; fp64 sumsq."""
    interpret = _resolve_interpret(interpret)
    m1, n = Vh.shape
    block = _df_orth_block(m1, n)
    uh, ul = split_f64(u64)
    with jax.enable_x64(False):
        woh, wol, ss = pl.pallas_call(
            functools.partial(_df_update_sumsq_kernel, m1=m1),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
            interpret=interpret,
        )(Vh, Vl, wh[None, :], wl[None, :], uh[None, :], ul[None, :])
    return woh[0], wol[0], _finish_lane_pairs(ss[0], ss[1])


def df_orth_pallas_ok(m1: int, n: int) -> bool:
    """Shape gate shared by the solver's df64 tier and the fallbacks:
    a power-of-two x 128 block must divide n within the VMEM budget
    (the solver's _ALIGN=32K padding guarantees it at bench shapes)."""
    return m1 <= 128 and n % 128 == 0 and _df_orth_block(m1, n) is not None
