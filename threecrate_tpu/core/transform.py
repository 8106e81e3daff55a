"""Rigid/affine 3D transforms as jit-friendly (4,4) arrays.

TPU-native rework of the reference's ``Transform3D`` wrapper over
``nalgebra::Matrix4<f32>`` (threecrate-core/src/transform.rs:417-535):
identity / translation / rotation(quaternion, axis-angle, euler) / scaling
constructors, point and vector application, composition, inversion.

Design: a :class:`Transform` is a frozen pytree holding one ``(4,4)``
float32 matrix (or a batch ``(..., 4, 4)``). All methods are pure and
traceable; ``apply`` on an ``(N, 3)`` array is a single fused
matmul+add, which is what the TPU wants (the reference loops per point).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

ArrayLike = Union[jnp.ndarray, np.ndarray]


def _as_matrix(m: ArrayLike) -> jnp.ndarray:
    m = jnp.asarray(m, dtype=jnp.float32)
    if m.shape[-2:] != (4, 4):
        raise ValueError(f"Transform matrix must be (..., 4, 4), got {m.shape}")
    return m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Transform:
    """A 3D homogeneous transform; wraps a ``(..., 4, 4)`` float32 matrix."""

    matrix: jnp.ndarray

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.matrix,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- constructors ----------------------------------------------------
    @classmethod
    def identity(cls) -> "Transform":
        return cls(jnp.eye(4, dtype=jnp.float32))

    @classmethod
    def from_matrix(cls, m: ArrayLike) -> "Transform":
        return cls(_as_matrix(m))

    @classmethod
    def from_translation(cls, t: ArrayLike) -> "Transform":
        t = jnp.asarray(t, dtype=jnp.float32)
        m = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(t)
        return cls(m)

    @classmethod
    def from_scaling(cls, s: ArrayLike) -> "Transform":
        s = jnp.broadcast_to(jnp.asarray(s, dtype=jnp.float32), (3,))
        m = jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))
        return cls(m)

    @classmethod
    def from_rotation_matrix(cls, r: ArrayLike, t: ArrayLike | None = None) -> "Transform":
        r = jnp.asarray(r, dtype=jnp.float32)
        m = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(r)
        if t is not None:
            m = m.at[:3, 3].set(jnp.asarray(t, dtype=jnp.float32))
        return cls(m)

    @classmethod
    def from_quaternion(cls, q: ArrayLike, t: ArrayLike | None = None) -> "Transform":
        """Unit quaternion ``(w, x, y, z)`` (+ optional translation)."""
        return cls.from_rotation_matrix(quaternion_to_matrix(q), t)

    @classmethod
    def from_axis_angle(cls, axis: ArrayLike, angle: ArrayLike,
                        t: ArrayLike | None = None) -> "Transform":
        return cls.from_rotation_matrix(axis_angle_to_matrix(axis, angle), t)

    @classmethod
    def from_euler_xyz(cls, angles: ArrayLike, t: ArrayLike | None = None) -> "Transform":
        """Intrinsic XYZ euler angles ``(rx, ry, rz)`` in radians."""
        rx, ry, rz = jnp.asarray(angles, dtype=jnp.float32)
        ex = axis_angle_to_matrix(jnp.array([1.0, 0, 0]), rx)
        ey = axis_angle_to_matrix(jnp.array([0, 1.0, 0]), ry)
        ez = axis_angle_to_matrix(jnp.array([0, 0, 1.0]), rz)
        return cls.from_rotation_matrix(ez @ ey @ ex, t)

    @classmethod
    def from_exp_coords(cls, xi: ArrayLike) -> "Transform":
        """se(3) exponential of a 6-vector ``(rx, ry, rz, tx, ty, tz)``."""
        return cls(se3_exp(jnp.asarray(xi, dtype=jnp.float32)))

    # -- accessors -------------------------------------------------------
    @property
    def rotation(self) -> jnp.ndarray:
        return self.matrix[..., :3, :3]

    @property
    def translation(self) -> jnp.ndarray:
        return self.matrix[..., :3, 3]

    # -- ops ---------------------------------------------------------------
    def apply(self, points: ArrayLike) -> jnp.ndarray:
        """Transform ``(..., N, 3)`` points: homogeneous ``R p + t``.

        HIGHEST precision: the TPU MXU defaults to bf16 passes, which is
        ~4e-3 relative error — unacceptable for metric geometry. K=3
        matmuls are memory-bound anyway, so full precision is free.
        """
        p = jnp.asarray(points, dtype=jnp.float32)
        rp = jnp.matmul(p, jnp.swapaxes(self.rotation, -1, -2),
                        precision=jax.lax.Precision.HIGHEST)
        return rp + self.translation[..., None, :]

    def apply_point(self, point: ArrayLike) -> jnp.ndarray:
        p = jnp.asarray(point, dtype=jnp.float32)
        return self.rotation @ p + self.translation

    def apply_vector(self, vec: ArrayLike) -> jnp.ndarray:
        """Rotate only (3x3 block); matches reference transform_vector."""
        v = jnp.asarray(vec, dtype=jnp.float32)
        return jnp.matmul(v, jnp.swapaxes(self.rotation, -1, -2),
                          precision=jax.lax.Precision.HIGHEST)

    def compose(self, other: "Transform") -> "Transform":
        """Returns ``self ∘ other`` (apply ``other`` first)."""
        return Transform(self.matrix @ other.matrix)

    def __matmul__(self, other: "Transform") -> "Transform":
        return self.compose(other)

    def inverse(self) -> "Transform":
        """Closed-form rigid inverse: ``[Rᵀ | -Rᵀ t]``.

        Valid for rigid transforms; for general affine use
        ``Transform(jnp.linalg.inv(self.matrix))``.
        """
        rt = jnp.swapaxes(self.rotation, -1, -2)
        t = -(rt @ self.translation[..., None])[..., 0]
        m = jnp.zeros_like(self.matrix)
        m = m.at[..., :3, :3].set(rt)
        m = m.at[..., :3, 3].set(t)
        m = m.at[..., 3, 3].set(1.0)
        return Transform(m)


# ---------------------------------------------------------------------------
# rotation helpers (pure functions, usable inside kernels/jit)
# ---------------------------------------------------------------------------

def quaternion_to_matrix(q: ArrayLike) -> jnp.ndarray:
    """Unit quaternion ``(w, x, y, z)`` → (3,3) rotation matrix."""
    q = jnp.asarray(q, dtype=jnp.float32)
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=jnp.float32)


def matrix_to_quaternion(r: ArrayLike) -> jnp.ndarray:
    """(3,3) rotation matrix → unit quaternion (w, x, y, z); branch-free."""
    r = jnp.asarray(r, dtype=jnp.float32)
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically safest by largest pivot
    qw = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.array([qw, qx, qy, qz])
    return q / jnp.linalg.norm(q)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) → (..., 3, 3) cross-product matrix."""
    v = jnp.asarray(v)
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ], axis=-2)


def axis_angle_to_matrix(axis: ArrayLike, angle: ArrayLike) -> jnp.ndarray:
    """Rodrigues rotation; ``axis`` need not be normalised."""
    axis = jnp.asarray(axis, dtype=jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
    angle = jnp.asarray(angle, dtype=jnp.float32)
    k = skew(axis)
    eye = jnp.eye(3, dtype=jnp.float32)
    return eye + jnp.sin(angle) * k + (1 - jnp.cos(angle)) * (k @ k)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) → SE(3): 6-vector (ω | v) → (4,4).

    Taylor-guarded at small angles so it is safe under jit/grad.
    """
    omega, v = xi[:3], xi[3:]
    theta2 = jnp.dot(omega, omega)
    theta = jnp.sqrt(theta2 + 1e-30)
    k = skew(omega)
    k2 = k @ k
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.eye(3, dtype=xi.dtype)
    r = eye + a * k + b * k2
    vmat = eye + b * k + c * k2
    m = jnp.eye(4, dtype=xi.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(vmat @ v)
    return m
