"""Rigid transforms as (R, p) pairs — functional analog of Drake's RigidTransform.

Reference: math/rigid_transform.h.  A transform X_AB is represented as a
pytree dataclass holding a ``(..., 3, 3)`` rotation and ``(..., 3)`` position;
all ops broadcast and are vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.utils.struct import pytree_dataclass
from drake_tpu.math import rotations as rot


@pytree_dataclass
class RigidTransform:
    """X_AB: rotation R_AB and position p_AoBo_A (Drake naming)."""

    R: jnp.ndarray  # (..., 3, 3)
    p: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32, batch_shape=()):
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        p = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return RigidTransform(R=R, p=p)

    def compose(self, other: "RigidTransform") -> "RigidTransform":
        """X_AC = X_AB.compose(X_BC)."""
        return RigidTransform(
            R=self.R @ other.R,
            p=self.p + jnp.einsum("...ij,...j->...i", self.R, other.p),
        )

    def __matmul__(self, other):
        if isinstance(other, RigidTransform):
            return self.compose(other)
        return self.apply(other)

    def apply(self, p_B):
        """p_A = X_AB * p_B for points p_B: (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, p_B) + self.p

    def rotate(self, v_B):
        """v_A = R_AB * v_B (free vectors: no translation)."""
        return jnp.einsum("...ij,...j->...i", self.R, v_B)

    def inverse(self) -> "RigidTransform":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return RigidTransform(R=Rt, p=-jnp.einsum("...ij,...j->...i", Rt, self.p))

    def as_matrix(self):
        """Homogeneous (..., 4, 4) matrix."""
        batch = self.p.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.p.dtype), batch + (4,)
        )
        top = jnp.concatenate([self.R, self.p[..., None]], axis=-1)
        return jnp.concatenate([top, bottom[..., None, :]], axis=-2)

    @staticmethod
    def from_rpy_xyz(rpy, xyz):
        return RigidTransform(R=rot.rpy_to_rotation(rpy), p=jnp.asarray(xyz))
