"""create_proof — the prover orchestrator.

Rebuild of plonk/prover.rs (SURVEY.md §2.22; full call stack §3.2).  The
transcript interaction order below IS the proof format and mirrors the
reference exactly.  Device work: witness materialization, MSM commitments,
NTTs, grand-product scans (jax.lax.associative_scan replacing the reference's
serial running products, lookup/prover.rs:237-248, permutation/prover.rs:
151-166), quotient evaluation.  Host work: transcript hashing, challenge
derivation, lookup multiset matching.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..circuit.layouter import Assignment
from ..circuit.value import Value, to_assigned
from ..curves.point import to_affine_ints
from ..fields import limb
from ..fields.spec import NLIMBS, FieldSpec
from ..ops import arith, ntt as ntt_ops
from ..plonk.error import InstanceTooLarge, NotEnoughRowsAvailable
from ..utils import profiling
from ..poly.domain import EvaluationDomain
from ..poly.polynomial import COEFF, LAGRANGE, Poly, Rotation
from .circuit import ConstraintSystem
from .evaluation import evaluate_on_lagrange
from .keygen import ProvingKey, batch_invert_assigned


# ---------------------------------------------------------------------------
# witness collection (prover.rs:150-280)
# ---------------------------------------------------------------------------


class WitnessCollection(Assignment):
    def __init__(self, k, cs: ConstraintSystem, current_phase, instances, challenges, usable_rows):
        self.k = k
        self.cs = cs
        self.current_phase = current_phase
        self.advice = [dict() for _ in range(cs.num_advice_columns)]
        self.instances = instances  # list of lists of ints
        self.challenges = challenges  # dict index -> int
        self.usable_rows = usable_rows

    def query_instance(self, column, row):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        col = self.instances[column.index]
        return Value.known(col[row]) if row < len(col) else Value.known(0)

    def assign_advice(self, column, row, to):
        # ignore assignments for columns in a different phase
        if self.cs.advice_column_phase[column.index] != self.current_phase:
            return None
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        v = to()
        if not v.is_none():
            self.advice[column.index][row] = to_assigned(v.value())
        return v

    def assign_fixed(self, column, row, to):
        pass

    def copy(self, *args):
        pass

    def fill_from_row(self, *args):
        pass

    def enable_selector(self, selector, row):
        pass

    def get_challenge(self, challenge):
        if challenge.index in self.challenges:
            return Value.known(self.challenges[challenge.index])
        return Value.unknown()


# ---------------------------------------------------------------------------
# helper containers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PermutationCommittedSet:
    product_poly: Poly  # coeff
    product_coset: jnp.ndarray  # extended values
    product_blind: int


@dataclasses.dataclass
class PermutationCommitted:
    sets: List[PermutationCommittedSet]


@dataclasses.dataclass
class LookupCommitted:
    permuted_input_poly: Poly
    permuted_input_blind: int
    permuted_table_poly: Poly
    permuted_table_blind: int
    product_poly: Poly
    product_blind: int


@dataclasses.dataclass
class ProverQuery:
    point: int  # canonical host scalar
    poly: Poly  # coeff basis
    blind: int = 0


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------


def _sanity_checks_enabled() -> bool:
    """In-prover well-formedness asserts, the analog of the reference's
    `sanity-checks` cargo feature (lookup/prover.rs:252-288,
    permutation/prover.rs).  Off by default: they force device->host syncs."""
    return os.environ.get("HALO2_TPU_SANITY_CHECKS") == "1"


def _assert_product_telescopes(spec: FieldSpec, z: jnp.ndarray, u: int, what: str):
    """z[0] = 1 and z[u] = 1 — the grand product telescopes back to one.
    A z[u] != 1 here means soundness is already broken upstream."""
    z0, zu = limb.to_ints(spec, z[:, [0, u]])
    assert z0 == 1, f"{what}: z[0] = {z0} != 1"
    assert zu == 1, f"{what}: z[u] = {zu} != 1 (soundness broken)"


def _prefix_product_with_start(spec: FieldSpec, mv: jnp.ndarray, start: jnp.ndarray):
    """z[0] = start, z[i] = start * prod_{r<i} mv[r]  (grand-product scan)."""
    t = jnp.moveaxis(mv, 1, 0)
    scan = jax.lax.associative_scan(
        lambda a, b: jnp.moveaxis(
            limb.fmul(spec, jnp.moveaxis(a, 0, 1), jnp.moveaxis(b, 0, 1)), 1, 0
        ),
        t,
    )
    prefix = jnp.moveaxis(scan, 0, 1)  # inclusive products
    one = limb.from_int(spec, 1).reshape(NLIMBS, 1)
    shifted = jnp.concatenate([one, prefix[:, :-1]], axis=1)
    startb = jnp.broadcast_to(start.reshape(NLIMBS, 1), shifted.shape)
    return limb.fmul(spec, shifted, startb)


def _set_rows(values: jnp.ndarray, start_row: int, replacement: jnp.ndarray):
    """Replace values[:, start_row:] with replacement columns."""
    return jnp.concatenate([values[:, :start_row], replacement], axis=1)


def _write_commitment(params, transcript, values_lagrange: jnp.ndarray, blind: int = 0):
    pt = params.commit_lagrange(Poly(values_lagrange, LAGRANGE), blind)
    affine = to_affine_ints(params.curve, pt)[0]
    transcript.write_point(affine)
    return affine


# ---------------------------------------------------------------------------
# permutation commit (permutation/prover.rs:44-191)
# ---------------------------------------------------------------------------


@profiling.profiled("permutation: grand products + commits")
def _permutation_commit(
    params, pk: ProvingKey, advice_values, fixed_values, instance_values,
    beta: int, gamma: int, rng, transcript,
) -> PermutationCommitted:
    domain = pk.vk.domain
    spec = domain.spec
    cs = pk.vk.cs
    n = domain.n
    p = spec.p
    cs_degree = cs.degree()
    assert cs_degree >= 3
    chunk_len = cs_degree - 2
    bf = cs.blinding_factors()
    columns = cs.permutation.columns

    omega_pows = domain._omega_pows_full  # (16, n) table of omega^i

    def col_values(column):
        return {"advice": advice_values, "fixed": fixed_values, "instance": instance_values}[
            column.kind
        ][column.index]

    gamma_b = jnp.broadcast_to(
        limb.from_int(spec, gamma).reshape(NLIMBS, 1), (NLIMBS, n)
    )
    beta_b = jnp.broadcast_to(limb.from_int(spec, beta).reshape(NLIMBS, 1), (NLIMBS, n))

    sets = []
    last_z = limb.from_int(spec, 1)
    col_counter = 0
    for chunk_start in range(0, len(columns), chunk_len):
        cols = columns[chunk_start : chunk_start + chunk_len]
        sigmas = pk.permutation.permutations[chunk_start : chunk_start + chunk_len]

        mv = None  # denominator: prod (value + beta*sigma + gamma)
        for column, sigma in zip(cols, sigmas):
            vals = col_values(column)
            term = limb.fadd(
                spec,
                limb.fadd(spec, vals, limb.fmul(spec, beta_b, sigma.values)),
                gamma_b,
            )
            mv = term if mv is None else limb.fmul(spec, mv, term)
        mv = limb.finv(spec, mv)
        # numerator: prod (value + delta^j * beta * omega^i + gamma)
        for column in cols:
            vals = col_values(column)
            scalar = pow(spec.delta, col_counter, p) * beta % p
            deltaomega = limb.fmul(
                spec,
                omega_pows,
                jnp.broadcast_to(
                    limb.from_int(spec, scalar).reshape(NLIMBS, 1), (NLIMBS, n)
                ),
            )
            term = limb.fadd(spec, limb.fadd(spec, vals, deltaomega), gamma_b)
            mv = limb.fmul(spec, mv, term)
            col_counter += 1

        z = _prefix_product_with_start(spec, mv, last_z)
        # blinding rows
        blinds = limb.from_ints(spec, [rng() for _ in range(bf)])
        z = _set_rows(z, n - bf, blinds)
        last_z = z[:, n - (bf + 1)]

        z_blind = rng()  # commitment blind (KZG ignores the value; IPA uses it)
        _write_commitment(params, transcript, z, z_blind)
        zc = domain.lagrange_to_coeff(Poly(z, LAGRANGE))
        coset = domain.coeff_to_extended(zc)
        sets.append(PermutationCommittedSet(zc, coset.values, z_blind))
    if _sanity_checks_enabled() and sets:
        # across all chunks the permutation grand product telescopes to 1:
        # the final chunk's chained last_z must be one (permutation/prover.rs
        # sanity analog)
        final = limb.to_ints(spec, last_z.reshape(NLIMBS, 1))[0]
        assert final == 1, f"permutation product: final z = {final} != 1"
    return PermutationCommitted(sets)


# ---------------------------------------------------------------------------
# lookup commit (lookup/prover.rs:64-305, permute at :391-475)
# ---------------------------------------------------------------------------


def _permute_expression_pair(pk, rng, input_vals: List[int], table_vals: List[int], n, bf):
    """Host multiset matching — mirrors lookup/prover.rs:391-475 exactly."""
    usable = n - (bf + 1)
    permuted_input = sorted(input_vals[:usable])
    leftover: Dict[int, int] = {}
    for v in table_vals[:usable]:
        leftover[v] = leftover.get(v, 0) + 1
    permuted_table = [0] * usable
    repeated_rows = []
    for row, v in enumerate(permuted_input):
        if row == 0 or v != permuted_input[row - 1]:
            permuted_table[row] = v
            if leftover.get(v, 0) > 0:
                leftover[v] -= 1
                if leftover[v] == 0:
                    del leftover[v]
            else:
                from ..plonk.error import ConstraintSystemFailure

                raise ConstraintSystemFailure("lookup input not in table")
        else:
            repeated_rows.append(row)
    for v in sorted(leftover.keys()):
        for _ in range(leftover[v]):
            permuted_table[repeated_rows.pop()] = v
    assert not repeated_rows
    permuted_input.extend(rng() for _ in range(bf + 1))
    permuted_table.extend(rng() for _ in range(bf + 1))
    return permuted_input, permuted_table


@profiling.profiled("lookup: permute + commit")
def _lookup_commit_permuted(
    arg, params, pk, theta_b, advice_values, fixed_values, instance_values,
    challenges_dev, rng, transcript,
):
    domain = pk.vk.domain
    spec = domain.spec
    n = domain.n
    bf = pk.vk.cs.blinding_factors()

    def compress(exprs):
        acc = None
        for e in exprs:
            ev = evaluate_on_lagrange(
                spec, e, n, fixed_values, advice_values, instance_values, challenges_dev
            )
            acc = ev if acc is None else limb.fadd(
                spec, limb.fmul(spec, acc, jnp.broadcast_to(theta_b.reshape(NLIMBS, 1), ev.shape)), ev
            )
        return acc

    comp_input = compress(arg.input_expressions)
    comp_table = compress(arg.table_expressions)
    input_ints = limb.to_ints(spec, comp_input)
    table_ints = limb.to_ints(spec, comp_table)
    pi, pt = _permute_expression_pair(pk, rng, input_ints, table_ints, n, bf)
    pi_dev = limb.from_ints(spec, pi)
    pt_dev = limb.from_ints(spec, pt)

    input_blind = rng()
    _write_commitment(params, transcript, pi_dev, input_blind)
    table_blind = rng()  # commit_values samples the blind before committing
    return {
        "comp_input": comp_input,
        "comp_table": comp_table,
        "perm_input": pi_dev,
        "perm_table": pt_dev,
        "input_blind": input_blind,
        "table_blind": table_blind,
    }


def _lookup_write_permuted_table(params, transcript, permuted):
    _write_commitment(params, transcript, permuted["perm_table"], permuted["table_blind"])


@profiling.profiled("lookup: product commit")
def _lookup_commit_product(
    permuted, params, pk, beta: int, gamma: int, rng, transcript
) -> LookupCommitted:
    domain = pk.vk.domain
    spec = domain.spec
    n = domain.n
    bf = pk.vk.cs.blinding_factors()
    beta_b = jnp.broadcast_to(limb.from_int(spec, beta).reshape(NLIMBS, 1), (NLIMBS, n))
    gamma_b = jnp.broadcast_to(limb.from_int(spec, gamma).reshape(NLIMBS, 1), (NLIMBS, n))

    denom = limb.fmul(
        spec,
        limb.fadd(spec, beta_b, permuted["perm_input"]),
        limb.fadd(spec, gamma_b, permuted["perm_table"]),
    )
    prod = limb.finv(spec, denom)
    prod = limb.fmul(spec, prod, limb.fadd(spec, permuted["comp_input"], beta_b))
    prod = limb.fmul(spec, prod, limb.fadd(spec, permuted["comp_table"], gamma_b))

    z = _prefix_product_with_start(spec, prod, limb.from_int(spec, 1))
    if _sanity_checks_enabled():
        _assert_product_telescopes(spec, z, n - (bf + 1), "lookup product")
    blinds = limb.from_ints(spec, [rng() for _ in range(bf)])
    z = _set_rows(z, n - bf, blinds)

    product_blind = rng()
    _write_commitment(params, transcript, z, product_blind)

    return LookupCommitted(
        permuted_input_poly=domain.lagrange_to_coeff(Poly(permuted["perm_input"], LAGRANGE)),
        permuted_input_blind=permuted["input_blind"],
        permuted_table_poly=domain.lagrange_to_coeff(Poly(permuted["perm_table"], LAGRANGE)),
        permuted_table_blind=permuted["table_blind"],
        product_poly=domain.lagrange_to_coeff(Poly(z, LAGRANGE)),
        product_blind=product_blind,
    )


# ---------------------------------------------------------------------------
# main prover
# ---------------------------------------------------------------------------


def create_proof(params, pk: ProvingKey, circuits, instances, rng, transcript, multiopen,
                 query_instance: bool = False, mesh=None):
    """instances: list (per circuit) of list (per instance column) of int lists.

    ``multiopen`` is a callable (params, rng, transcript, queries) -> None
    (GWC / SHPLONK / IPA provers).  ``query_instance`` selects the scheme's
    instance handling (prover.rs:79-132): False (KZG) hashes instance values
    as common scalars; True (IPA) commits each instance column with
    Blind::default()=1 and hashes the commitment, writing instance evals and
    opening instance polynomials in the multiopen.

    ``mesh`` (optional jax.sharding.Mesh): the whole prover runs sharded over
    the mesh — commitments via the distributed MSM (parallel/msm.py), NTTs as
    the four-step collective transform (parallel/ntt.py), and the quotient
    evaluation over cosets whose rows are sharded across chips (the GSPMD
    partitioner propagates the sharding through the elementwise constraint
    graph and turns rotations into collective permutes).  The TPU-native
    analog of the reference's rayon row/chunk splitting (evaluation.rs:
    336-362, arithmetic.rs:136-153).  Proof bytes are unchanged: all
    arithmetic is exact, so sharded and single-device runs are bit-identical
    (asserted by __graft_entry__.dryrun_multichip).
    """
    domain: EvaluationDomain = pk.vk.domain
    spec = domain.spec
    cs = pk.vk.cs
    n = domain.n
    p = spec.p
    # unconditional (including None): mesh must not stick across calls
    params.mesh = mesh
    domain.mesh = mesh

    pk.vk.hash_into(transcript)

    bf = cs.blinding_factors()
    usable = n - (bf + 1)

    # --- instances (prover.rs:79-132) --------------------------------------
    instance_singles = []
    for inst in instances:
        values, polys = [], []
        for col_values in inst:
            if len(col_values) > usable:
                raise InstanceTooLarge()
            if not query_instance:
                for v in col_values:
                    transcript.common_scalar(v % p)
            padded = list(col_values) + [0] * (n - len(col_values))
            lagr = Poly(limb.from_ints(spec, padded), LAGRANGE)
            values.append(lagr.values)
            polys.append(domain.lagrange_to_coeff(lagr))
        if query_instance:
            for vals in values:
                cpt = params.commit_lagrange(Poly(vals, LAGRANGE), 1)  # Blind::default()
                transcript.common_point(to_affine_ints(params.curve, cpt)[0])
        instance_singles.append({"values": values, "polys": polys})

    # --- phase loop: witness synthesis + advice commitments ----------------
    num_circuits = len(circuits)
    advice_values = [
        [limb.zeros((n,)) for _ in range(cs.num_advice_columns)]
        for _ in range(num_circuits)
    ]
    advice_blinds = [[1] * cs.num_advice_columns for _ in range(num_circuits)]
    challenges: Dict[int, int] = {}
    # the frontend circuit was configured against an un-optimized cs; re-run
    # configure to obtain a config bound to a fresh cs with virtual selectors
    cfg_cs = ConstraintSystem()
    config = type(circuits[0]).configure(cfg_cs)

    for phase in cs.phases():
        col_indices = [
            i for i, ph in enumerate(cs.advice_column_phase) if ph == phase
        ]
        for c_idx, circuit in enumerate(circuits):
            witness = WitnessCollection(
                params.k, cs, phase, instances[c_idx], challenges, usable
            )
            with profiling.phase("witness synthesis (host)"):
                circuit.floor_planner.synthesize(
                    witness, circuit, config, list(cs.constants)
                )
            with profiling.phase("advice: materialize + commit"):
                cols = batch_invert_assigned(
                    spec, [witness.advice[i] for i in col_indices], n
                )
                for poly_idx, col_idx in enumerate(col_indices):
                    vals = cols[poly_idx].values
                    blind_rows = limb.from_ints(spec, [rng() for _ in range(bf + 1)])
                    vals = _set_rows(vals, usable, blind_rows)
                    advice_values[c_idx][col_idx] = vals
                blinds = [rng() for _ in col_indices]
                for blind, col_idx in zip(blinds, col_indices):
                    advice_blinds[c_idx][col_idx] = blind
                batched = getattr(params, "commit_lagrange_many", None)
                if batched is not None and params.mesh is None and len(col_indices) > 1:
                    # all same-phase columns in ONE MSM dispatch + host sync
                    # (SURVEY §3.2 hard part #4; VERDICT r3 weak #5)
                    pts = batched(
                        [Poly(advice_values[c_idx][i], LAGRANGE) for i in col_indices],
                        blinds,
                    )
                    for aff in to_affine_ints(params.curve, pts):
                        transcript.write_point(aff)
                else:
                    for blind, col_idx in zip(blinds, col_indices):
                        _write_commitment(
                            params, transcript, advice_values[c_idx][col_idx], blind
                        )
        for index, ch_phase in enumerate(cs.challenge_phase):
            if ch_phase == phase:
                challenges[index] = transcript.squeeze_challenge()

    challenges_list = [challenges[i] for i in range(cs.num_challenges)]
    challenges_dev = [limb.from_int(spec, c) for c in challenges_list]

    # --- theta + lookups: commit permuted ---------------------------------
    theta = transcript.squeeze_challenge()
    theta_dev = limb.from_int(spec, theta)

    lookups_permuted = []
    for c_idx in range(num_circuits):
        per_circ = []
        for arg in cs.lookups:
            permuted = _lookup_commit_permuted(
                arg, params, pk, theta_dev,
                advice_values[c_idx], [f.values for f in pk.fixed_values],
                instance_singles[c_idx]["values"], challenges_dev, rng, transcript,
            )
            _lookup_write_permuted_table(params, transcript, permuted)
            per_circ.append(permuted)
        lookups_permuted.append(per_circ)

    # --- beta, gamma; permutation + lookup products ------------------------
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    permutations = [
        _permutation_commit(
            params, pk, advice_values[c_idx], [f.values for f in pk.fixed_values],
            instance_singles[c_idx]["values"], beta, gamma, rng, transcript,
        )
        for c_idx in range(num_circuits)
    ]

    lookups_committed = [
        [
            _lookup_commit_product(perm, params, pk, beta, gamma, rng, transcript)
            for perm in lookups_permuted[c_idx]
        ]
        for c_idx in range(num_circuits)
    ]

    # --- vanishing random poly --------------------------------------------
    random_vals = [rng() for _ in range(n)]
    random_poly = Poly(limb.from_ints(spec, random_vals), COEFF)
    random_blind = rng()
    rp_commit = params.commit(random_poly, random_blind)
    transcript.write_point(to_affine_ints(params.curve, rp_commit)[0])

    # --- y; h(X) -----------------------------------------------------------
    y = transcript.squeeze_challenge()

    with profiling.phase("advice: iNTT to coeff"):
        advice_polys = [
            [domain.lagrange_to_coeff(Poly(v, LAGRANGE)) for v in advice_values[c]]
            for c in range(num_circuits)
        ]
    instance_polys = [s["polys"] for s in instance_singles]

    with profiling.phase("quotient: evaluate_h"):
        h_poly = pk.ev.evaluate_h(
            pk,
            advice_polys,
            instance_polys,
            challenges_dev,
            limb.from_int(spec, y),
            limb.from_int(spec, beta),
            limb.from_int(spec, gamma),
            limb.from_int(spec, theta),
            lookups_committed,
            permutations,
        )

    # --- vanishing construct (vanishing/prover.rs:68-120) -------------------
    with profiling.phase("vanishing: h divide/split/commit"):
        h_poly = domain.divide_by_vanishing_poly(h_poly)
        h_coeffs = domain.extended_to_coeff(h_poly)  # (16, n * quotient_degree)
        qd = domain.quotient_poly_degree
        h_pieces = [
            Poly(h_coeffs[:, i * n : (i + 1) * n], COEFF) for i in range(qd)
        ]
        h_blinds = [rng() for _ in h_pieces]
        for piece, h_blind in zip(h_pieces, h_blinds):
            cpt = params.commit(piece, h_blind)
            transcript.write_point(to_affine_ints(params.curve, cpt)[0])

    # --- x; evaluations -----------------------------------------------------
    x = transcript.squeeze_challenge()
    xn = pow(x, n, p)

    # All opening evaluations are collected first (every point derives from x
    # alone), computed in ONE batched device dispatch + ONE host pull
    # (ops/arith.eval_polynomials_batched), then written to the transcript in
    # collection order — byte-identical to the reference's eval-by-eval order
    # (prover.rs:521-575), ~19 tunnel round trips collapsed into one.
    eval_vals: List[jnp.ndarray] = []
    eval_pts: List[int] = []

    def queue_eval(poly: Poly, point: int):
        eval_vals.append(poly.values)
        eval_pts.append(point)

    if query_instance:
        # prover.rs:521-545: instance evals at rotated points
        for c_idx in range(num_circuits):
            for column, at in cs.instance_queries:
                queue_eval(
                    instance_polys[c_idx][column.index], domain.rotate_omega(x, at)
                )

    for c_idx in range(num_circuits):
        for column, at in cs.advice_queries:
            queue_eval(
                advice_polys[c_idx][column.index], domain.rotate_omega(x, at)
            )

    for column, at in cs.fixed_queries:
        queue_eval(pk.fixed_polys[column.index], domain.rotate_omega(x, at))

    # vanishing.evaluate: fold h pieces by xn; random_eval queued at x
    h_folded = None
    for piece in reversed(h_pieces):
        if h_folded is None:
            h_folded = piece.values
        else:
            xnb = jnp.broadcast_to(
                limb.from_int(spec, xn).reshape(NLIMBS, 1), h_folded.shape
            )
            h_folded = limb.fadd(spec, limb.fmul(spec, h_folded, xnb), piece.values)
    h_poly_final = Poly(h_folded, COEFF)
    h_blind_final = 0
    for hb in reversed(h_blinds):
        h_blind_final = (h_blind_final * xn + hb) % p
    queue_eval(random_poly, x)

    # pk.permutation.evaluate: sigma evals
    for poly in pk.permutation.polys:
        queue_eval(poly, x)

    # permutations evaluate
    x_next = domain.rotate_omega(x, Rotation.next())
    x_last = domain.rotate_omega(x, Rotation(-(bf + 1)))
    for committed in permutations:
        for set_idx, pset in enumerate(committed.sets):
            queue_eval(pset.product_poly, x)
            queue_eval(pset.product_poly, x_next)
            if set_idx < len(committed.sets) - 1:
                queue_eval(pset.product_poly, x_last)

    # lookups evaluate (x, x_next, x_inv order per lookup/prover.rs:309-337)
    x_inv = domain.rotate_omega(x, Rotation.prev())
    for per_circ in lookups_committed:
        for lk in per_circ:
            queue_eval(lk.product_poly, x)
            queue_eval(lk.product_poly, x_next)
            queue_eval(lk.permuted_input_poly, x)
            queue_eval(lk.permuted_input_poly, x_inv)
            queue_eval(lk.permuted_table_poly, x)

    with profiling.phase("evaluations at x (one batched dispatch)"):
        stacked = jnp.stack(eval_vals, axis=1)  # (16, m, n)
        pts_mont = limb.from_ints(spec, eval_pts)  # (16, m)
        out = arith.eval_polynomials_batched(spec, stacked, pts_mont)
        for v in limb.to_ints(spec, out):
            transcript.write_scalar(v)

    # --- assemble multiopen queries (prover.rs:599-645) ----------------------
    queries: List[ProverQuery] = []
    for c_idx in range(num_circuits):
        if query_instance:
            for column, at in cs.instance_queries:
                queries.append(
                    ProverQuery(
                        domain.rotate_omega(x, at),
                        instance_polys[c_idx][column.index],
                        1,  # Blind::default()
                    )
                )
        for column, at in cs.advice_queries:
            queries.append(
                ProverQuery(
                    domain.rotate_omega(x, at),
                    advice_polys[c_idx][column.index],
                    advice_blinds[c_idx][column.index],
                )
            )
        committed = permutations[c_idx]
        for pset in committed.sets:
            queries.append(ProverQuery(x, pset.product_poly, pset.product_blind))
            queries.append(ProverQuery(x_next, pset.product_poly, pset.product_blind))
        for pset in list(reversed(committed.sets))[1:]:
            queries.append(ProverQuery(x_last, pset.product_poly, pset.product_blind))
        for lk in lookups_committed[c_idx]:
            queries.append(ProverQuery(x, lk.product_poly, lk.product_blind))
            queries.append(ProverQuery(x, lk.permuted_input_poly, lk.permuted_input_blind))
            queries.append(ProverQuery(x, lk.permuted_table_poly, lk.permuted_table_blind))
            queries.append(ProverQuery(x_inv, lk.permuted_input_poly, lk.permuted_input_blind))
            queries.append(ProverQuery(x_next, lk.product_poly, lk.product_blind))
    for column, at in cs.fixed_queries:
        queries.append(
            ProverQuery(
                domain.rotate_omega(x, at), pk.fixed_polys[column.index], 1
            )
        )
    for poly in pk.permutation.polys:
        queries.append(ProverQuery(x, poly, 1))
    queries.append(ProverQuery(x, h_poly_final, h_blind_final))
    queries.append(ProverQuery(x, random_poly, random_blind))

    with profiling.phase("multiopen"):
        multiopen(params, rng, transcript, queries)
    return transcript.finalize()
