"""Closed-form batched 3x3 linear algebra for the hot mapping kernels.

The scan-to-map constraint builders need, per map point, a symmetric 3x3
eigendecomposition (line fits, reference: mapOptmization.cpp:1101-1138) and a
3x3 linear solve (plane fits, reference: mapOptmization.cpp:1183-1207).  XLA
lowers ``jnp.linalg.eigh`` / ``jnp.linalg.solve`` on TPU to iterative
Jacobi / LU routines whose control flow leaves the vector units mostly idle
for matrices this small.  The closed forms below are pure elementwise
arithmetic (VPU-friendly, fully fused by XLA).

Formulas: Smith's trigonometric method for symmetric 3x3 eigenvalues
(Cardano on the characteristic polynomial of the deviatoric part), adjugate /
Cramer for the solve, and null-space cross products for eigenvectors.
Everything is float32; callers gate results with coarse validity thresholds
(eigenvalue-ratio and residual tests), which absorb the ~1e-6-relative noise
vs LAPACK.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve by adjugate: x = adj(A) b / det(A).

    A: (..., 3, 3), b: (..., 3).  Singular matrices produce non-finite
    outputs, exactly like ``jnp.linalg.solve`` — callers already guard with
    ``isfinite``.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02

    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = c00 * b0 + c10 * b1 + c20 * b2
    x1 = c01 * b0 + c11 * b1 + c21 * b2
    x2 = c02 * b0 + c12 * b1 + c22 * b2
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched eigenvalues of symmetric 3x3 matrices, ascending (..., 3).

    Smith's method: shift by the mean eigenvalue q = tr(A)/3, scale by the
    deviatoric norm p, and read the three roots off the trigonometric form of
    the depressed cubic.  Matches ``jnp.linalg.eigvalsh`` ordering.
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12)
    p = jnp.sqrt(p2 / 6.0 + _EPS)

    # r = det((A - qI)/p) / 2, expanded directly on the shifted entries
    detB = (d0 * (d1 * d2 - a12 * a12)
            - a01 * (a01 * d2 - a12 * a02)
            + a02 * (a01 * a12 - d1 * a02))
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    # p == 0 means A = qI: all eigenvalues q (the formula already yields q
    # because p multiplies the cosines, but keep it exact)
    iso = p2 <= 1e-20
    e_lo = jnp.where(iso, q, e_lo)
    e_mid = jnp.where(iso, q, e_mid)
    e_hi = jnp.where(iso, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def principal_axis3(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the LARGEST eigenvalue of symmetric 3x3 A.

    lam: (..., 3) ascending eigenvalues from :func:`eigvalsh3`.  Uses the
    spectral projector (A - lam_mid I)(A - lam_lo I): its columns span the
    top eigenspace; pick the column with the largest norm.  When the top
    eigenvalue is (near-)degenerate the projector collapses — callers only
    consume the vector when the line-likeness ratio test passes (top
    eigenvalue well separated), so the fallback just has to stay finite.
    """
    I = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    B = (A - lam[..., 1, None, None] * I) @ (A - lam[..., 0, None, None] * I)
    nrm2 = jnp.sum(B * B, axis=-2)                      # column norms (..., 3)
    col = jnp.argmax(nrm2, axis=-1)
    v = jnp.take_along_axis(B, col[..., None, None], axis=-1)[..., 0]
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    safe = n > 1e-12
    v = jnp.where(safe, v / jnp.where(safe, n, 1.0),
                  jnp.array([1.0, 0.0, 0.0], dtype=A.dtype))
    return v
