"""Polynomial values with basis tags + Rotation.

TPU-native analog of the reference ``Polynomial<F, Basis>`` type-state wrapper
(poly.rs:48-72): values are a Montgomery limb array of shape (16, n); the basis
is a lightweight runtime tag.  Registered as a pytree so polynomials flow
through jit/scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import FieldSpec

COEFF = "coeff"
LAGRANGE = "lagrange"
EXTENDED = "extended_lagrange"


@dataclasses.dataclass(frozen=True)
class Rotation:
    """Rotation of a Lagrange polynomial over the domain (poly.rs:311)."""

    i: int = 0

    @staticmethod
    def cur() -> "Rotation":
        return Rotation(0)

    @staticmethod
    def prev() -> "Rotation":
        return Rotation(-1)

    @staticmethod
    def next() -> "Rotation":
        return Rotation(1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Poly:
    values: jnp.ndarray  # (16, n) Montgomery limbs
    basis: str

    def tree_flatten(self):
        return (self.values,), self.basis

    @classmethod
    def tree_unflatten(cls, basis, children):
        return cls(children[0], basis)

    def __len__(self):
        return self.values.shape[1]

    def rotate(self, rotation: Rotation) -> "Poly":
        """Cyclic left-rotation by ``rotation`` (Lagrange basis, poly.rs:145)."""
        assert self.basis == LAGRANGE
        return Poly(jnp.roll(self.values, -rotation.i, axis=1), self.basis)

    def add(self, spec: FieldSpec, other: "Poly") -> "Poly":
        assert self.basis == other.basis
        return Poly(limb.fadd(spec, self.values, other.values), self.basis)

    def sub(self, spec: FieldSpec, other: "Poly") -> "Poly":
        assert self.basis == other.basis
        return Poly(limb.fsub(spec, self.values, other.values), self.basis)

    def mul_pointwise(self, spec: FieldSpec, other: "Poly") -> "Poly":
        assert self.basis == other.basis
        return Poly(limb.fmul(spec, self.values, other.values), self.basis)

    def scale(self, spec: FieldSpec, scalar: jnp.ndarray) -> "Poly":
        s = jnp.broadcast_to(scalar.reshape(scalar.shape[0], 1), self.values.shape)
        return Poly(limb.fmul(spec, self.values, s), self.basis)
