"""Key generation: circuit synthesis into fixed columns, sigma polys, keys.

Rebuild of plonk/keygen.rs (SURVEY.md §2.17, call stack §3.1) plus the
VerifyingKey/ProvingKey containers (plonk.rs §2.24).

Selector handling: selectors are currently converted *directly* — one fixed
column per selector, with gate/lookup expressions rewritten to query it.  This
matches the semantics (and self-consistency) of the reference's
compress_selectors pipeline but not yet its column-packing optimization
(compress_selectors.rs; planned follow-up).
"""

from __future__ import annotations

import hashlib
from typing import List

import jax.numpy as jnp
import numpy as np

from ..circuit.layouter import Assignment
from ..circuit.value import Assigned, Value, to_assigned
from ..fields import limb
from ..fields.spec import FieldSpec
from ..plonk.error import NotEnoughRowsAvailable
from ..poly.domain import EvaluationDomain
from ..poly.polynomial import LAGRANGE, Poly, Rotation
from .circuit import (
    ADVICE,
    FIXED,
    Column,
    ConstraintSystem,
    Expression,
    FixedExpr,
    FixedQuery,
    Negated,
    Product,
    Scaled,
    SelectorExpr,
    Sum,
)
from .permutation import PermutationAssembly


# ---------------------------------------------------------------------------
# selector -> fixed conversion
# ---------------------------------------------------------------------------

def _replace_selectors(expr: Expression, replacements) -> Expression:
    if isinstance(expr, SelectorExpr):
        return replacements[expr.selector.index]
    if isinstance(expr, Negated):
        return Negated(_replace_selectors(expr.expr, replacements))
    if isinstance(expr, Sum):
        return Sum(
            _replace_selectors(expr.a, replacements),
            _replace_selectors(expr.b, replacements),
        )
    if isinstance(expr, Product):
        return Product(
            _replace_selectors(expr.a, replacements),
            _replace_selectors(expr.b, replacements),
        )
    if isinstance(expr, Scaled):
        return Scaled(_replace_selectors(expr.expr, replacements), expr.factor)
    return expr


def convert_selectors(cs: ConstraintSystem, selectors: List[np.ndarray]):
    """Turn every virtual selector into its own fixed column.

    Returns the selector polynomial values (list of 0/1 numpy arrays).  The
    ConstraintSystem is mutated: new fixed columns + rewritten expressions.
    """
    replacements = []
    for _ in range(cs.num_selectors):
        column = cs.fixed_column()
        cs.selector_map.append(column)
        idx = cs.query_fixed_index(column, Rotation.cur())
        replacements.append(FixedExpr(FixedQuery(idx, column.index, Rotation.cur())))
    for gate in cs.gates:
        gate.polys = [_replace_selectors(p, replacements) for p in gate.polys]
    for lk in cs.lookups:
        lk.input_expressions = [
            _replace_selectors(e, replacements) for e in lk.input_expressions
        ]
        lk.table_expressions = [
            _replace_selectors(e, replacements) for e in lk.table_expressions
        ]
    return [np.asarray(s, dtype=np.uint8) for s in selectors]


# ---------------------------------------------------------------------------
# keygen assembly
# ---------------------------------------------------------------------------


class KeygenAssembly(Assignment):
    """keygen.rs:50-200 — captures fixed values, selectors and copies."""

    def __init__(self, k: int, cs: ConstraintSystem, n: int):
        self.k = k
        self.n = n
        # fixed values as per-column dict {row: Assigned}; default zero
        self.fixed = [dict() for _ in range(cs.num_fixed_columns)]
        self.permutation = PermutationAssembly(n, cs.permutation)
        self.selectors = [np.zeros(n, dtype=bool) for _ in range(cs.num_selectors)]
        self.usable_rows = n - (cs.blinding_factors() + 1)

    def _check_row(self, row):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)

    def enable_selector(self, selector, row):
        self._check_row(row)
        self.selectors[selector.index][row] = True

    def query_instance(self, column, row):
        self._check_row(row)
        return Value.unknown()

    def assign_advice(self, column, row, to):
        pass  # only fixed matters during keygen

    def assign_fixed(self, column, row, to):
        self._check_row(row)
        v = to()
        if not v.is_none():
            self.fixed[column.index][row] = to_assigned(v.value())

    def copy(self, left_column, left_row, right_column, right_row):
        self._check_row(left_row)
        self._check_row(right_row)
        self.permutation.copy(left_column, left_row, right_column, right_row)

    def fill_from_row(self, column, from_row, to: Value):
        self._check_row(from_row)
        v = to_assigned(to.value()) if not to.is_none() else Assigned.zero()
        col = self.fixed[column.index]
        for row in range(from_row, self.usable_rows):
            col[row] = v


def batch_invert_assigned(
    spec: FieldSpec, columns: List[dict], n: int
) -> List[Poly]:
    """Materialize Assigned columns: num * den^-1, batched on device
    (reference poly.rs:180-209)."""
    if not columns:
        return []
    p = spec.p
    nums, dens = [], []
    for col in columns:
        cn = [0] * n
        cd = [1] * n
        for row, a in col.items():
            cn[row] = a.numerator % p
            cd[row] = a.denominator % p
        nums.extend(cn)
        dens.extend(cd)
    num_arr = limb.from_canonical_ints(spec, nums)
    den_arr = limb.from_canonical_ints(spec, dens)
    vals = limb.fmul(spec, num_arr, limb.finv(spec, den_arr))
    return [
        Poly(vals[:, i * n : (i + 1) * n], LAGRANGE) for i in range(len(columns))
    ]


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------


class VerifyingKey:
    """plonk.rs:49-259."""

    def __init__(self, domain, cs, fixed_commitments, permutation_commitments, selectors):
        self.domain: EvaluationDomain = domain
        self.cs: ConstraintSystem = cs
        self.fixed_commitments = fixed_commitments  # host affine points
        self.permutation_commitments = permutation_commitments
        self.selectors = selectors
        self.transcript_repr = self._compute_repr()

    def pinned(self):
        return {
            "base_modulus": "<curve base>",
            "scalar_modulus": hex(self.domain.spec.p),
            "domain": self.domain.pinned(),
            "cs": self.cs.pinned(),
            "fixed_commitments": self.fixed_commitments,
            "permutation": self.permutation_commitments,
        }

    def _compute_repr(self) -> int:
        """Blake2b('Halo2-Verify-Key') over a deterministic pinned repr.

        NOTE: the reference hashes Rust's Debug formatting of PinnedVerifyingKey
        (plonk.rs:192-204); our repr is deterministic but not byte-identical to
        that Debug string yet, so vk hashes differ from Rust until the exact
        formatter is replicated.
        """
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        h.update(repr(self.pinned()).encode())
        return self.domain.spec.from_bytes_wide(h.digest())

    def hash_into(self, transcript):
        transcript.common_scalar(self.transcript_repr)


class ProvingKey:
    def __init__(
        self,
        vk: VerifyingKey,
        l0: Poly,
        l_last: Poly,
        l_active_row: Poly,
        fixed_values: List[Poly],
        fixed_polys: List[Poly],
        fixed_cosets: List[Poly],
        permutation_pk,
        ev,
    ):
        self.vk = vk
        self.l0 = l0
        self.l_last = l_last
        self.l_active_row = l_active_row
        self.fixed_values = fixed_values
        self.fixed_polys = fixed_polys
        self.fixed_cosets = fixed_cosets
        self.permutation = permutation_pk
        self.ev = ev

    def get_vk(self):
        return self.vk


# ---------------------------------------------------------------------------
# keygen entry points (keygen.rs:203-367)
# ---------------------------------------------------------------------------


def create_domain(spec: FieldSpec, circuit_cls, k: int):
    cs = ConstraintSystem()
    config = circuit_cls.configure(cs)
    degree = cs.degree()
    domain = EvaluationDomain(spec, degree, k)
    return domain, cs, config


def _run_keygen_synthesis(params, spec, circuit, k):
    domain, cs, config = create_domain(spec, type(circuit), k)
    n = 1 << k
    if n < cs.minimum_rows():
        raise NotEnoughRowsAvailable(k)
    assembly = KeygenAssembly(k, cs, n)
    circuit.floor_planner.synthesize(assembly, circuit, config, list(cs.constants))
    fixed = batch_invert_assigned(spec, assembly.fixed, n)
    selector_values = convert_selectors(cs, assembly.selectors)
    for sv in selector_values:
        vals = limb.from_canonical_ints(spec, [int(b) for b in sv])
        fixed.append(Poly(vals, LAGRANGE))
    return domain, cs, assembly, fixed


def keygen_vk(params, circuit, spec: FieldSpec | None = None) -> VerifyingKey:
    spec = spec or params.curve.scalar
    domain, cs, assembly, fixed = _run_keygen_synthesis(params, spec, circuit, params.k)
    perm_vk = assembly.permutation.build_vk(params, domain, cs.permutation)

    from ..curves.point import to_affine_ints

    fixed_commitments = [
        to_affine_ints(params.curve, params.commit_lagrange(poly))[0] for poly in fixed
    ]
    perm_comms = [
        to_affine_ints(params.curve, c)[0] for c in perm_vk.commitments
    ]
    return VerifyingKey(domain, cs, fixed_commitments, perm_comms, assembly.selectors)


def keygen_pk(params, vk: VerifyingKey, circuit, spec: FieldSpec | None = None) -> ProvingKey:
    spec = spec or params.curve.scalar
    domain, cs, assembly, fixed = _run_keygen_synthesis(params, spec, circuit, params.k)
    n = 1 << params.k

    fixed_polys = [domain.lagrange_to_coeff(p) for p in fixed]
    fixed_cosets = [domain.coeff_to_extended(p) for p in fixed_polys]
    perm_pk = assembly.permutation.build_pk(params, domain, cs.permutation)

    bf = cs.blinding_factors()
    one = 1

    def indicator(rows):
        vals = [0] * n
        for r in rows:
            vals[r] = one
        lagr = Poly(limb.from_canonical_ints(spec, vals), LAGRANGE)
        return domain.coeff_to_extended(domain.lagrange_to_coeff(lagr))

    l0 = indicator([0])
    l_blind = indicator(range(n - bf, n))
    l_last = indicator([n - bf - 1])
    ones_ext = domain.constant_extended(limb.from_int(spec, 1))
    l_active_row = Poly(
        limb.fsub(
            spec, ones_ext.values, limb.fadd(spec, l_last.values, l_blind.values)
        ),
        l_last.basis,
    )

    from .evaluation import Evaluator

    ev = Evaluator(vk.cs)
    return ProvingKey(
        vk, l0, l_last, l_active_row, fixed, fixed_polys, fixed_cosets, perm_pk, ev
    )
