"""Permutation argument: keygen assembly (union-find cycles) + sigma polys.

Rebuild of plonk/permutation.rs + permutation/keygen.rs (SURVEY.md §2.18).
Cycle bookkeeping is host-side numpy; the sigma polynomials are produced by a
single device gather into the (delta^i * omega^j) table followed by the usual
NTT pipeline.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import NLIMBS, FieldSpec
from ..ops import ntt as ntt_ops
from ..plonk.error import BoundsFailure, ColumnNotInPermutation
from ..poly.domain import EvaluationDomain
from ..poly.polynomial import LAGRANGE, Poly
from .circuit import Column, PermutationArgument


class PermutationAssembly:
    """permutation/keygen.rs:16-103 — union-find over copy cycles."""

    def __init__(self, n: int, p: PermutationArgument):
        self.columns: List[Column] = list(p.columns)
        m = len(self.columns)
        self.n = n
        # mapping/aux as (m, n) arrays of flat indices i*n + j
        base = np.arange(m * n, dtype=np.int64).reshape(m, n)
        self.mapping = base.copy()
        self.aux = base.copy()
        self.sizes = np.ones((m, n), dtype=np.int64)

    def _col_index(self, column: Column) -> int:
        try:
            return self.columns.index(column)
        except ValueError:
            raise ColumnNotInPermutation(column)

    def copy(self, left_column: Column, left_row: int, right_column: Column, right_row: int):
        lc, rc = self._col_index(left_column), self._col_index(right_column)
        n = self.n
        if left_row >= n or right_row >= n:
            raise BoundsFailure()
        left_cycle = self.aux[lc, left_row]
        right_cycle = self.aux[rc, right_row]
        if left_cycle == right_cycle:
            return
        lci, lcj = divmod(int(left_cycle), n)
        rci, rcj = divmod(int(right_cycle), n)
        if self.sizes[lci, lcj] < self.sizes[rci, rcj]:
            left_cycle, right_cycle = right_cycle, left_cycle
            lci, lcj, rci, rcj = rci, rcj, lci, lcj
        self.sizes[lci, lcj] += self.sizes[rci, rcj]
        i = right_cycle
        while True:
            ii, ij = divmod(int(i), n)
            self.aux[ii, ij] = left_cycle
            i = self.mapping[ii, ij]
            if i == right_cycle:
                break
        li, lj = divmod(int(self.mapping[lc, left_row]), n)
        self.mapping[lc, left_row], self.mapping[rc, right_row] = (
            self.mapping[rc, right_row],
            self.mapping[lc, left_row],
        )

    # ------------------------------------------------------------------
    def _sigma_lagrange(self, spec: FieldSpec, domain: EvaluationDomain) -> List[Poly]:
        """sigma_i[j] = delta^pi * omega^pj where (pi,pj) = mapping[i][j]."""
        m = len(self.columns)
        n = self.n
        omega_pows = ntt_ops.power_table(spec, domain.omega, n)  # (16, n)
        delta_pows = ntt_ops.power_table(spec, spec.delta, m)  # (16, m)
        # deltaomega[(i, j)] = delta^i * omega^j laid out flat as i*n+j
        do = limb.fmul(
            spec,
            jnp.repeat(delta_pows, n, axis=1),  # (16, m*n)
            jnp.tile(omega_pows, (1, m)),
        )
        flat = jnp.asarray(self.mapping.reshape(-1), dtype=jnp.int32)
        sigma = do[:, flat]  # (16, m*n)
        return [
            Poly(sigma[:, i * n : (i + 1) * n], LAGRANGE) for i in range(m)
        ]

    def build_vk(self, params, domain: EvaluationDomain, p: PermutationArgument):
        spec = domain.spec
        sigmas = self._sigma_lagrange(spec, domain)
        commitments = [params.commit_lagrange(s, 1) for s in sigmas]  # Blind::default()
        return PermutationVK(commitments)

    def build_pk(self, params, domain: EvaluationDomain, p: PermutationArgument):
        spec = domain.spec
        permutations = self._sigma_lagrange(spec, domain)
        polys = [domain.lagrange_to_coeff(s) for s in permutations]
        cosets = [domain.coeff_to_extended(q) for q in polys]
        return PermutationPK(permutations, polys, cosets)


class PermutationVK:
    def __init__(self, commitments):
        # projective device Points; normalized to host affine by the caller
        self.commitments = commitments


class PermutationPK:
    def __init__(self, permutations, polys, cosets):
        self.permutations = permutations  # Lagrange sigma polys
        self.polys = polys  # coefficient form
        self.cosets = cosets  # extended cosets
