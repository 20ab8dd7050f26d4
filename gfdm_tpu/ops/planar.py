"""Planar complex arithmetic: complex tensors as stacked real planes.

TPU hardware has no complex arithmetic units, and this image's TPU backend
rejects complex dtypes outright (UNIMPLEMENTED). Instead of relying on XLA's
complex decomposition, the framework's TPU compute path represents a complex
tensor of shape (..., n) as a real tensor of shape (..., 2, n) - plane 0 the
real part, plane 1 the imaginary part. The layout is chosen so that:

  - flattening the last two axes gives the concatenation [re | im] of length
    2n with zero data movement, and
  - a complex matmul y = x @ W becomes ONE real matmul of the flattened
    (..., 2n) against the realified operator [[Wr, Wi], [-Wi, Wr]] - exactly
    what the MXU wants, at the same FLOP count as 4 split real matmuls.

All functions are jit-safe and dtype-preserving (float32 by default).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "to_planar",
    "from_planar",
    "real_operator",
    "gauss_stack",
    "pmatmul",
    "pmul",
    "pconj",
    "pdiv",
    "pabs2",
    "pangle",
    "pexp_i",
    "pscale_real",
    "re",
    "im",
]


# ---------------------------------------------------------------------------
# conversions (host side, numpy in / numpy out)
# ---------------------------------------------------------------------------
def to_planar(x, dtype=np.float32) -> np.ndarray:
    """complex (..., n) -> real (..., 2, n)."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-2).astype(dtype)


def from_planar(x) -> np.ndarray:
    """real (..., 2, n) -> complex (..., n)."""
    x = np.asarray(x)
    return x[..., 0, :] + 1j * x[..., 1, :]


def real_operator(W, dtype=np.float32) -> np.ndarray:
    """Realify a complex operator for right-multiplication.

    For y = x @ W (x a row of length n_in, W (n_in, n_out) complex), the
    planar form is  y2 = x2 @ real_operator(W)  with x2 = [x_re | x_im]:

        [[ Wr,  Wi],
         [-Wi,  Wr]]    of shape (2*n_in, 2*n_out).
    """
    W = np.asarray(W)
    Wr, Wi = W.real.astype(dtype), W.imag.astype(dtype)
    top = np.concatenate([Wr, Wi], axis=1)
    bot = np.concatenate([-Wi, Wr], axis=1)
    return np.concatenate([top, bot], axis=0)


def gauss_stack(W, dtype=np.float32) -> np.ndarray:
    """Complex operator as the 3-real-matmul (Gauss/Karatsuba) stack.

    For y = x @ W with W (n_in, n_out) complex, real_operator() costs
    4*n_in*n_out MXU MACs per row; Gauss's identity does it in 3:

        P1 = x_re @ Wr;  P2 = x_im @ Wi;  P3 = (x_re + x_im) @ (Wr + Wi)
        y_re = P1 - P2;  y_im = P3 - P1 - P2

    Returns the (3*n_in, n_out) stack [Wr; Wi; Wr+Wi] consumed by the fused
    Pallas kernels (25% fewer matmul FLOPs and 25% less operator VMEM than
    the realified form).
    """
    W = np.asarray(W)
    Wr, Wi = W.real.astype(dtype), W.imag.astype(dtype)
    return np.concatenate([Wr, Wi, Wr + Wi], axis=0)


# ---------------------------------------------------------------------------
# jit-side primitives (operate on jnp arrays shaped (..., 2, n))
# ---------------------------------------------------------------------------
def re(x):
    return x[..., 0, :]


def im(x):
    return x[..., 1, :]


def _pack(r, i):
    return jnp.stack([r, i], axis=-2)


def pmatmul(x, W_real, preferred_element_type=None):
    """Planar complex matmul: (..., 2, n) @ realified (2n, 2m) -> (..., 2, m).

    If the operator is bfloat16, the activation is cast to bfloat16 for the
    MXU and accumulated in float32 (the 4x-throughput fast mode).
    """
    n2 = x.shape[-1] * 2
    flat = x.reshape(x.shape[:-2] + (n2,))
    out_dtype = x.dtype
    if W_real.dtype == jnp.bfloat16:
        flat = flat.astype(jnp.bfloat16)
        if preferred_element_type is None:
            preferred_element_type = jnp.float32
    y = jnp.matmul(flat, W_real, preferred_element_type=preferred_element_type)
    y = y.astype(out_dtype)
    return y.reshape(x.shape[:-2] + (2, W_real.shape[-1] // 2))


def pmul(a, b):
    """Elementwise complex multiply."""
    ar, ai = re(a), im(a)
    br, bi = re(b), im(b)
    return _pack(ar * br - ai * bi, ar * bi + ai * br)


def pconj(a):
    return _pack(re(a), -im(a))


def pabs2(a):
    """|a|^2 (real array, no plane axis)."""
    return re(a) ** 2 + im(a) ** 2


def pdiv(a, b, eps=0.0):
    """Elementwise complex divide a/b."""
    d = pabs2(b)
    if eps:
        d = jnp.maximum(d, eps)
    num = pmul(a, pconj(b))
    return _pack(re(num) / d, im(num) / d)


def pangle(a):
    return jnp.arctan2(im(a), re(a))


def pexp_i(phase):
    """e^{j phase} as a planar tensor (phase real, shape (..., n))."""
    return _pack(jnp.cos(phase), jnp.sin(phase))


def pscale_real(a, s):
    """Multiply by a real scalar/array broadcast over both planes."""
    return a * s[..., None, :] if hasattr(s, "ndim") and s.ndim == a.ndim - 1 else a * s
