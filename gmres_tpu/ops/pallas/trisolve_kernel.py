"""Pallas TPU kernel: exact ILU(0) triangular solves, fused in VMEM.

The reference's exact-ILU preconditioner does two sparse triangular solves
per application (``ilusv``, ``kernels_mkl.cpp:355-383``; csrsv2 with level
scheduling, ``kernels_cuda.cpp:617-695``).  The TPU-native equivalent used
here exploits nilpotency: for a strictly-triangular N, the Jacobi sweep
``x <- b - N x`` reaches the exact substitution result after
``levels`` sweeps (the pattern's dependency-level count).  Done as XLA ops
that is ~1000 sequential dispatches per apply at bench scale — the round-1
scaling landmine (VERDICT item 5).

This kernel instead keeps the DIA-formatted factor bands, the operand and
the iterate entirely in VMEM and runs *all* sweeps of both triangles in a
single kernel launch: per sweep each band is a static in-VMEM shifted FMA,
so 1000 sweeps cost ~(D+2)*levels vector passes at VMEM bandwidth
(sub-millisecond) and zero intermediate HBM traffic.

Fits VMEM when ``(D_l + D_u + ~5) * 4 * n <= ~12 MB`` — n up to ~400K for
5-point-stencil factors; larger problems keep the honest refusal in
``precond/build.py``.

Solve semantics (``kernels.hpp:223-248``, unit-diagonal L then U):

    L-phase: x_{t+1} = b  - L_strict x_t,            x_0 = b
    U-phase: x_{t+1} = D^{-1} (b' - U_strict x_t),   x_0 = b' (L result)

(the U recursion is the algebraic simplification of the reference's
``x + D^{-1}(b' - U x)`` with U = D + U_strict).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _trisolve_kernel(ld_ref, ud_ref, invd_ref, b_ref, out_ref, xbuf, b2buf,
                     *, offs_l, offs_u, pad, n, steps_l, steps_u):
    # haloed iterate buffer: zeros outside [pad, pad+n)
    xbuf[...] = jnp.zeros_like(xbuf)
    b = b_ref[...]
    xbuf[pl.ds(pad, n)] = b

    def l_sweep(_, carry):
        acc = jnp.zeros((n,), b.dtype)
        for d, off in enumerate(offs_l):
            acc += ld_ref[d, :] * xbuf[pl.ds(pad + off, n)]
        xbuf[pl.ds(pad, n)] = b - acc
        return carry

    if offs_l:
        jax.lax.fori_loop(0, steps_l, l_sweep, 0)

    b2buf[...] = xbuf[pl.ds(pad, n)]
    # U-phase starts from x_0 = b' (already in xbuf)

    def u_sweep(_, carry):
        acc = jnp.zeros((n,), b.dtype)
        for d, off in enumerate(offs_u):
            acc += ud_ref[d, :] * xbuf[pl.ds(pad + off, n)]
        xbuf[pl.ds(pad, n)] = invd_ref[...] * (b2buf[...] - acc)
        return carry

    if offs_u:
        jax.lax.fori_loop(0, steps_u, u_sweep, 0)
    else:
        xbuf[pl.ds(pad, n)] = invd_ref[...] * b2buf[...]

    out_ref[...] = xbuf[pl.ds(pad, n)]


@functools.partial(
    jax.jit,
    static_argnames=("offs_l", "offs_u", "steps_l", "steps_u", "interpret"),
)
def ilu_trisolve_fused(ld, ud, invd, w, offs_l, offs_u, steps_l, steps_u,
                       interpret=None):
    """x = U^{-1} L^{-1} w with strictly-triangular DIA bands ``ld``/``ud``
    (shape (D, n)) and the inverse diagonal, all VMEM-resident.

    ``w`` may be shorter than the (lane-aligned) band length; it is padded
    with zeros (padded rows have zero bands and inv_diag 1, so they stay 0).
    """
    interpret = _resolve_interpret(interpret)
    n = ld.shape[1] if ld.shape[0] else ud.shape[1]
    n_in = w.shape[0]
    if n_in != n:
        w = jnp.pad(w, (0, n - n_in))
    all_offs = tuple(offs_l) + tuple(offs_u) or (1,)
    pad = _round_up(max(1, max(abs(o) for o in all_offs)), _LANES)

    kernel = functools.partial(
        _trisolve_kernel, offs_l=tuple(offs_l), offs_u=tuple(offs_u),
        pad=pad, n=n, steps_l=steps_l, steps_u=steps_u,
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), w.dtype),
            scratch_shapes=[
                pltpu.VMEM((n + 2 * pad,), w.dtype),
                pltpu.VMEM((n,), w.dtype),
            ],
            interpret=interpret,
        )(ld, ud, invd, w)
    return out[:n_in]
