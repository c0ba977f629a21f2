"""Quotient polynomial evaluation — THE prover hot loop.

Rebuild of plonk/evaluation.rs (SURVEY.md §2.21).  The reference compiles
gate expressions into a serial per-row Calculation tape executed across rayon
threads; here every constraint is evaluated as fused whole-array limb ops over
the extended domain (rows ride the TPU lane dimension), with rotations as
jnp.roll and the per-row omega/delta geometric factors as precomputed power
tables.  XLA's CSE plays the role of the reference's tape deduplication.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import NLIMBS, FieldSpec
from ..ops import ntt as ntt_ops
from ..poly.domain import EvaluationDomain
from ..poly.polynomial import EXTENDED, LAGRANGE, Poly
from .circuit import (
    AdviceExpr,
    ChallengeExpr,
    Constant,
    ConstraintSystem,
    Expression,
    FixedExpr,
    InstanceExpr,
    Negated,
    Product,
    Scaled,
    SelectorExpr,
    Sum,
)


class EvalContext:
    """Value sources for expression evaluation over a (16, size) row space.

    ``fixed``/``advice``/``instance`` are either lists of (16, size) arrays or
    a callable ``index -> array`` (the streaming coset provider below).
    ``max_cached_rolls=None`` caches every rotation (fast, memory-heavy);
    a number caps the rotation cache LRU-style for large extended domains.
    """

    def __init__(
        self,
        spec: FieldSpec,
        size: int,
        rot_scale: int,
        fixed,
        advice,
        instance,
        challenges: List[jnp.ndarray],
        max_cached_rolls: int | None = None,
    ):
        self.spec = spec
        self.size = size
        self.rot_scale = rot_scale
        self.fixed = fixed
        self.advice = advice
        self.instance = instance
        self.challenges = challenges
        self.max_cached_rolls = max_cached_rolls
        self._rolls: "OrderedDict" = OrderedDict()

    def _source(self, kind: str, index: int) -> jnp.ndarray:
        src = {"fixed": self.fixed, "advice": self.advice, "instance": self.instance}[kind]
        return src(index) if callable(src) else src[index]

    def rotated(self, kind: str, index: int, rot: int) -> jnp.ndarray:
        if rot == 0:
            return self._source(kind, index)
        key = (kind, index, rot)
        if key in self._rolls:
            self._rolls.move_to_end(key)
            return self._rolls[key]
        out = jnp.roll(self._source(kind, index), -rot * self.rot_scale, axis=1)
        self._rolls[key] = out
        if self.max_cached_rolls is not None:
            while len(self._rolls) > self.max_cached_rolls:
                self._rolls.popitem(last=False)
        return out

    def constant(self, v: int) -> jnp.ndarray:
        c = limb.from_int(self.spec, v % self.spec.p)
        return jnp.broadcast_to(c.reshape(NLIMBS, 1), (NLIMBS, self.size))


def evaluate_expr(expr: Expression, ctx: EvalContext) -> jnp.ndarray:
    spec = ctx.spec
    if isinstance(expr, Constant):
        return ctx.constant(expr.value)
    if isinstance(expr, SelectorExpr):
        raise ValueError("virtual selectors must be converted before evaluation")
    if isinstance(expr, FixedExpr):
        return ctx.rotated("fixed", expr.query.column_index, expr.query.rotation.i)
    if isinstance(expr, AdviceExpr):
        return ctx.rotated("advice", expr.query.column_index, expr.query.rotation.i)
    if isinstance(expr, InstanceExpr):
        return ctx.rotated("instance", expr.query.column_index, expr.query.rotation.i)
    if isinstance(expr, ChallengeExpr):
        ch = ctx.challenges[expr.challenge.index]
        return jnp.broadcast_to(ch.reshape(NLIMBS, 1), (NLIMBS, ctx.size))
    if isinstance(expr, Negated):
        return limb.fneg(spec, evaluate_expr(expr.expr, ctx))
    if isinstance(expr, Sum):
        return limb.fadd(spec, evaluate_expr(expr.a, ctx), evaluate_expr(expr.b, ctx))
    if isinstance(expr, Product):
        return limb.fmul(spec, evaluate_expr(expr.a, ctx), evaluate_expr(expr.b, ctx))
    if isinstance(expr, Scaled):
        return limb.fmul(spec, evaluate_expr(expr.expr, ctx), ctx.constant(expr.factor))
    raise TypeError(f"unknown expression {type(expr)}")


def evaluate_on_lagrange(
    spec: FieldSpec,
    expr: Expression,
    n: int,
    fixed: List[jnp.ndarray],
    advice: List[jnp.ndarray],
    instance: List[jnp.ndarray],
    challenges: List[jnp.ndarray],
) -> jnp.ndarray:
    """Evaluate an expression over the n-row Lagrange basis (lookup
    compression; reference evaluation.rs evaluate())."""
    ctx = EvalContext(spec, n, 1, fixed, advice, instance, challenges)
    return evaluate_expr(expr, ctx)


class Evaluator:
    """Holds the constraint system; evaluates h over the extended domain."""

    def __init__(self, cs: ConstraintSystem):
        self.cs = cs

    def evaluate_h(
        self,
        pk,
        advice_polys: List[List[Poly]],  # coeff, per circuit instance
        instance_polys: List[List[Poly]],
        challenges: List[jnp.ndarray],
        y: jnp.ndarray,
        beta: jnp.ndarray,
        gamma: jnp.ndarray,
        theta: jnp.ndarray,
        lookups: List[List],  # per instance, list of lookup Committed
        permutations: List,  # per instance, permutation Committed
    ) -> Poly:
        cs = self.cs
        domain: EvaluationDomain = pk.vk.domain
        spec = domain.spec
        size = domain.extended_len
        rot_scale = 1 << (domain.extended_k - domain.k)
        fixed = [p.values for p in pk.fixed_cosets]
        l0 = pk.l0.values
        l_last = pk.l_last.values
        l_active = pk.l_active_row.values
        one = limb.from_int(spec, 1)
        one_b = jnp.broadcast_to(one.reshape(NLIMBS, 1), (NLIMBS, size))

        def bcast(s):
            return jnp.broadcast_to(s.reshape(NLIMBS, 1), (NLIMBS, size))

        yb = bcast(y)
        betab = bcast(beta)
        gammab = bcast(gamma)
        thetab = bcast(theta)

        def fold(acc, term):
            return limb.fadd(spec, limb.fmul(spec, acc, yb), term)

        values = limb.zeros((size,))

        # Streaming cosets (SURVEY §7 hard part #5; the reference's analog is
        # on-the-fly lookup cosets, evaluation.rs:447-459): above the size
        # threshold (or with HALO2_TPU_STREAM_COSETS=1) advice/instance
        # extended cosets are computed on demand from their coefficient polys
        # and held in a small LRU, so peak memory is O(budget) columns instead
        # of O(num_columns) — at k=20 an extended coset is ~100-500 MB per
        # column.  Costs one extra extended NTT per evicted re-use; gate
        # expressions touch each column a handful of times so the budget
        # rarely evicts a live column.
        force = os.environ.get("HALO2_TPU_STREAM_COSETS")
        streaming = force == "1" or (force != "0" and size >= (1 << 20))
        budget = int(os.environ.get("HALO2_TPU_COSET_BUDGET", "6"))

        for inst_idx in range(len(advice_polys)):
            if streaming:
                cache: "OrderedDict" = OrderedDict()

                def provider(polys, tag):
                    def get(index):
                        key = (tag, index)
                        if key in cache:
                            cache.move_to_end(key)
                            return cache[key]
                        arr = domain.coeff_to_extended(polys[index]).values
                        cache[key] = arr
                        while len(cache) > budget:
                            cache.popitem(last=False)
                        return arr

                    return get

                advice = provider(advice_polys[inst_idx], "advice")
                instance = provider(instance_polys[inst_idx], "instance")
                max_rolls = 2
            else:
                advice = [
                    domain.coeff_to_extended(p).values for p in advice_polys[inst_idx]
                ]
                instance = [
                    domain.coeff_to_extended(p).values for p in instance_polys[inst_idx]
                ]
                max_rolls = None
            ctx = EvalContext(
                spec, size, rot_scale, fixed, advice, instance, challenges,
                max_cached_rolls=max_rolls,
            )

            # Custom gates (Horner fold with y, evaluation.rs:229-240)
            for gate in cs.gates:
                for poly in gate.polynomials():
                    values = fold(values, evaluate_expr(poly, ctx))

            # Permutation constraints (evaluation.rs:364-444)
            perm = permutations[inst_idx]
            sets = perm.sets if perm is not None else []
            if sets:
                bf = cs.blinding_factors()
                last_rot = -(bf + 1)
                chunk_len = cs.degree() - 2
                first_z = sets[0].product_coset
                last_z = sets[-1].product_coset

                # l_0(X) * (1 - z_0(X))
                values = fold(
                    values, limb.fmul(spec, limb.fsub(spec, one_b, first_z), l0)
                )
                # l_last(X) * (z_l(X)^2 - z_l(X))
                values = fold(
                    values,
                    limb.fmul(
                        spec,
                        limb.fsub(spec, limb.fmul(spec, last_z, last_z), last_z),
                        l_last,
                    ),
                )
                # l_0(X) * (z_i(X) - z_{i-1}(omega^last X)) for i > 0
                for set_idx in range(1, len(sets)):
                    prev_rot = jnp.roll(
                        sets[set_idx - 1].product_coset, -last_rot * rot_scale, axis=1
                    )
                    values = fold(
                        values,
                        limb.fmul(
                            spec,
                            limb.fsub(spec, sets[set_idx].product_coset, prev_rot),
                            l0,
                        ),
                    )
                # main constraint per set
                ext_omega_pows = domain._ext_tw_full  # (16, size) table of ext_omega^i
                delta_start = limb.fmul(
                    spec, betab, bcast(limb.from_int(spec, spec.zeta))
                )
                beta_terms = ext_omega_pows
                col_counter = 0
                columns = cs.permutation.columns
                for set_idx, pset in enumerate(sets):
                    cols = columns[set_idx * chunk_len : (set_idx + 1) * chunk_len]
                    cosets = pk.permutation.cosets[
                        set_idx * chunk_len : (set_idx + 1) * chunk_len
                    ]
                    left = jnp.roll(pset.product_coset, -rot_scale, axis=1)
                    right = pset.product_coset
                    for column, sigma in zip(cols, cosets):
                        vals = ctx.rotated(column.kind, column.index, 0)
                        left = limb.fmul(
                            spec,
                            left,
                            limb.fadd(
                                spec,
                                limb.fadd(
                                    spec, vals, limb.fmul(spec, betab, sigma.values)
                                ),
                                gammab,
                            ),
                        )
                        # current_delta = beta * zeta * delta^col_counter * ext_omega^idx
                        dpow = limb.from_int(spec, pow(spec.delta, col_counter, spec.p))
                        cur_delta = limb.fmul(
                            spec,
                            limb.fmul(spec, delta_start, bcast(dpow)),
                            beta_terms,
                        )
                        right = limb.fmul(
                            spec,
                            right,
                            limb.fadd(spec, limb.fadd(spec, vals, cur_delta), gammab),
                        )
                        col_counter += 1
                    values = fold(
                        values,
                        limb.fmul(spec, limb.fsub(spec, left, right), l_active),
                    )

            # Lookup constraints (evaluation.rs:446-519)
            for lk_idx, lk in enumerate(lookups[inst_idx]):
                arg = cs.lookups[lk_idx]
                product_coset = domain.coeff_to_extended(lk.product_poly).values
                input_coset = domain.coeff_to_extended(lk.permuted_input_poly).values
                table_coset = domain.coeff_to_extended(lk.permuted_table_poly).values

                def compress(exprs):
                    acc = None
                    for e in exprs:
                        ev = evaluate_expr(e, ctx)
                        acc = (
                            ev
                            if acc is None
                            else limb.fadd(spec, limb.fmul(spec, acc, thetab), ev)
                        )
                    return acc

                comp_input = compress(arg.input_expressions)
                comp_table = compress(arg.table_expressions)
                table_value = limb.fmul(
                    spec,
                    limb.fadd(spec, comp_input, betab),
                    limb.fadd(spec, comp_table, gammab),
                )
                z_next = jnp.roll(product_coset, -rot_scale, axis=1)
                input_prev = jnp.roll(input_coset, rot_scale, axis=1)
                a_minus_s = limb.fsub(spec, input_coset, table_coset)

                values = fold(
                    values, limb.fmul(spec, limb.fsub(spec, one_b, product_coset), l0)
                )
                values = fold(
                    values,
                    limb.fmul(
                        spec,
                        limb.fsub(
                            spec,
                            limb.fmul(spec, product_coset, product_coset),
                            product_coset,
                        ),
                        l_last,
                    ),
                )
                left = limb.fmul(
                    spec,
                    limb.fmul(spec, z_next, limb.fadd(spec, input_coset, betab)),
                    limb.fadd(spec, table_coset, gammab),
                )
                right = limb.fmul(spec, product_coset, table_value)
                values = fold(
                    values, limb.fmul(spec, limb.fsub(spec, left, right), l_active)
                )
                values = fold(values, limb.fmul(spec, a_minus_s, l0))
                values = fold(
                    values,
                    limb.fmul(
                        spec,
                        limb.fmul(
                            spec, a_minus_s, limb.fsub(spec, input_coset, input_prev)
                        ),
                        l_active,
                    ),
                )

        return Poly(values, EXTENDED)
