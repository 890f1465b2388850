"""SO(3)/SE(3) utilities.

The reference threads two ad-hoc Euler conventions and a lidar<->camera axis
swap through every file (reference: featureAssociation.cpp:500-502, 955-1042;
mapOptmization.cpp:376-461, 947-954).  This module replaces all of that with
one convention:

  * lidar frame everywhere: x forward, y left, z up;
  * rotations as 3x3 matrices, with Euler (roll, pitch, yaw) about (x, y, z),
    composed as R = Rz(yaw) @ Ry(pitch) @ Rx(roll) for I/O only;
  * exp/log maps for interpolation and Gauss-Newton local charts.

All functions are jit/vmap-friendly (pure jnp, static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-9


class Pose(NamedTuple):
    """Rigid transform: x_out = R @ x_in + t.  Batchable ((..., 3, 3)/(..., 3))."""

    R: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch: tuple = (), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
        t = jnp.zeros(batch + (3,), dtype)
        return Pose(R, t)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 3) or (..., 3)."""
        return pts @ jnp.swapaxes(self.R, -1, -2) + self.t[..., None, :] \
            if pts.ndim == self.R.ndim else self.R @ pts + self.t

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: first apply `other`, then `self`."""
        return Pose(self.R @ other.R,
                    jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def inverse(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def euler_to_mat(roll, pitch, yaw):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) (ZYX / lidar convention)."""
    return rot_z(yaw) @ rot_y(pitch) @ rot_x(roll)


def mat_to_euler(R):
    """Inverse of euler_to_mat.  Returns (roll, pitch, yaw)."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def hat(w):
    """Skew-symmetric matrix of (..., 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], -2)


def so3_exp(w):
    """Rodrigues: exp of (..., 3) axis-angle -> (..., 3, 3) rotation.

    The (1 - cos theta)/theta^2 coefficient is computed via the half-angle
    identity 0.5*(sin(t/2)/(t/2))^2: the direct form cancels
    catastrophically in float32 for the small inter-scan rotations this
    code lives on (relative error up to ~6% at theta=1e-3, which made
    every accumulated pose rotation drift off SO(3) — det grew ~1e-4 per
    compose — and wrecked long-trajectory scan-to-map registration).
    """
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor-safe coefficients.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    half = 0.5 * theta
    sinc_h = jnp.where(theta2 > _EPS, jnp.sin(half) / half,
                       1.0 - theta2 / 24.0)
    b = 0.5 * sinc_h * sinc_h
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def project_so3(R):
    """One Newton step of the polar decomposition: R (3I - R^T R)/2.

    Removes first-order orthonormality error (float32 product roundoff
    accumulating over thousands of composes) at the cost of two 3x3
    matmuls; exact rotations are fixed points.  Applied at low-rate
    accumulation points (keyframe insertion, odometry pose integration),
    not inside solver iterations.
    """
    RtR = jnp.swapaxes(R, -1, -2) @ R
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return R @ (1.5 * eye - 0.5 * RtR)


def so3_log(R):
    """Log map: (..., 3, 3) rotation -> (..., 3) axis-angle.

    sin(theta) is taken from ||vee(R - R^T)||/2 rather than from
    sin(arccos(trace)) — the latter loses all precision near theta = pi in
    float32 (the trace rounds to -1 long before theta reaches pi).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    sin_t = 0.5 * jnp.linalg.norm(vee, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    # theta/(2 sin theta), Taylor-safe near 0; near pi fall back below.
    scale = jnp.where(sin_t > 1e-6, theta / (2.0 * sin_t + _EPS), 0.5 + theta * theta / 12.0)
    w_small = scale[..., None] * vee
    # Near theta = pi: axis from the diagonal of (R + I)/2 = aa^T formula.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # Fix signs from off-diagonal sums; use the largest axis component as anchor.
    signs = jnp.sign(jnp.where(jnp.abs(vee) > 1e-7, vee, jnp.stack([
        R[..., 1, 0] + R[..., 0, 1],
        R[..., 2, 1] + R[..., 1, 2],
        R[..., 0, 2] + R[..., 2, 0],
    ], -1)))
    signs = jnp.where(signs == 0, 1.0, signs)
    w_pi = theta[..., None] * axis * signs
    use_small = (sin_t > 1e-3) | (cos_t > 0.0)
    return jnp.where(use_small[..., None], w_small, w_pi)


def pose_exp(xi):
    """se(3)-style chart used by the GN solvers: xi = (w, v) -> Pose.

    Uses the simple (exp(w), v) chart rather than the full SE(3) exp; the two
    agree to first order, which is all Gauss-Newton needs.
    """
    return Pose(so3_exp(xi[..., :3]), xi[..., 3:])


def pose_log(p: Pose):
    return jnp.concatenate([so3_log(p.R), p.t], -1)


def pose_interp(p: Pose, s):
    """Geodesic interpolation from identity to p by fraction s (broadcastable)."""
    w = so3_log(p.R)
    s = jnp.asarray(s)
    R = so3_exp(s[..., None] * w)
    t = s[..., None] * p.t
    return Pose(R, t)


def transform_points(R, t, pts):
    """(3,3), (3,), (N,3) -> (N,3)."""
    return pts @ R.T + t


def wrap_angle(a):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))
