"""Givens rotation machinery (BLAS rotg/rot semantics).

The reference uses cblas_?rotg / cublas?rotg and explicitly zeroes the
eliminated entry afterwards (``kernels_mkl.cpp:217-218``,
``kernels_cuda.cpp:404``); ``rot`` is the standard plane rotation
(``x' = c x + s y; y' = c y - s x``).  These run on O(m) data and stay as
jnp scalar ops inside the jitted cycle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotg(a: jax.Array, b: jax.Array):
    """BLAS ?rotg: returns (r, c, s) with [c s; -s c] @ [a; b] = [r; 0].

    Matches the reference BLAS convention: r carries the sign of the larger-
    magnitude input; (c, s) = (1, 0) when both inputs are zero.
    """
    dt = a.dtype
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    roe = jnp.where(abs_a > abs_b, a, b)
    scale = abs_a + abs_b
    safe_scale = jnp.where(scale == 0, dt.type(1), scale)
    r = safe_scale * jnp.sqrt((a / safe_scale) ** 2 + (b / safe_scale) ** 2)
    r = jnp.where(scale == 0, dt.type(0), jnp.sign(roe) * r)
    safe_r = jnp.where(r == 0, dt.type(1), r)
    c = jnp.where(scale == 0, dt.type(1), a / safe_r)
    s = jnp.where(scale == 0, dt.type(0), b / safe_r)
    return r, c, s


def apply_rotations(h: jax.Array, cs: jax.Array, sn: jax.Array, k) -> jax.Array:
    """Apply the k stored rotations (j = 0..k-1) to the new Hessenberg
    column prefix — the reference's vector-``rot`` call (``gmres.cpp:108``;
    the intended semantics per SURVEY.md §2.2, not the mixed-path
    subview off-by-one accident)."""

    def body(j, hcol):
        c, s = cs[j], sn[j]
        hj = hcol[j]
        hj1 = hcol[j + 1]
        hcol = hcol.at[j].set(c * hj + s * hj1)
        return hcol.at[j + 1].set(c * hj1 - s * hj)

    return jax.lax.fori_loop(0, k, body, h)
