"""
Algebraic schedule rewrites — the TPU analog of the reference's loopy-level
expression transforms (``feinsum/loopy_utils/__init__.py:588-943`` and
``cse.py``):

* ``hoist_invariant_multiplicative_terms_in_sum_reduction`` (reference :659):
  pull operands that don't depend on part of a reduction out of it — e.g.
  ``Σ_{x,r,j} J·D·u → Σ_{r,j} D·(Σ_x J·u)``, a 4.14x flop cut on DG grad.
  In this architecture that's a *contraction-schedule* choice, so the helper
  returns a rescheduled program rather than rewriting expressions.
* ``extract_multiplicative_terms_in_sum_reduction_as_subst`` (reference
  :796): name a sub-product as an explicit intermediate — here, a schedule
  step.

Both operate on :class:`EinsumProgram` and leave the einsum untouched.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .codegen.program import EinsumProgram
from .contraction_schedule import (
    ContractionSchedule,
    EinsumOperand,
    IntermediateResult,
    get_opt_einsum_contraction_schedule,
)
from .einsum import BatchedEinsum


def _step_for_positions(einsum: BatchedEinsum, positions: Sequence[int],
                        tmp_name: str):
    """Schedule step contracting the given operand positions; result keeps
    every index used by the remaining operands or the output."""
    used_elsewhere = set(einsum.out_idx_set)
    for j in range(einsum.n):
        if j not in positions:
            used_elsewhere |= set(einsum.in_idx_sets[j])
    in_subs = ["".join(einsum.in_idx_sets[j]) for j in positions]
    step_letters = []
    for s in in_subs:
        for l in s:
            if l not in step_letters:
                step_letters.append(l)
    out_sub = "".join(l for l in step_letters if l in used_elsewhere)
    return f"{','.join(in_subs)}->{out_sub}", out_sub


def extract_multiplicative_terms_in_sum_reduction_as_subst(
        program: EinsumProgram, positions: Sequence[int], *,
        tmp_name: str = "_fe_tmp_hoist") -> EinsumProgram:
    """Reschedule so the product of operands at *positions* (with any of
    their private reduction indices summed away) becomes an explicit first
    step (parity: reference loopy_utils/__init__.py:796-866)."""
    e = program.einsum
    positions = sorted(positions)
    if not positions or not all(0 <= p < e.n for p in positions):
        raise ValueError(f"invalid operand positions {positions}")
    if len(positions) == e.n:
        raise ValueError("cannot hoist every operand")

    step1_subs, tmp_sub = _step_for_positions(e, positions, tmp_name)
    rest = [j for j in range(e.n) if j not in positions]
    in2 = [tmp_sub] + ["".join(e.in_idx_sets[j]) for j in rest]
    step2_subs = f"{','.join(in2)}->{''.join(e.out_idx_set)}"
    schedule = ContractionSchedule(
        subscripts=(step1_subs, step2_subs),
        result_names=(tmp_name, "_fe_out"),
        arguments=(
            tuple(EinsumOperand(p) for p in positions),
            (IntermediateResult(tmp_name),)
            + tuple(EinsumOperand(j) for j in rest),
        ))
    return program.copy(schedule=schedule)


def hoist_invariant_multiplicative_terms_in_sum_reduction(
        program: EinsumProgram,
        invariant_positions: Optional[Sequence[int]] = None
) -> EinsumProgram:
    """Hoist the reduction's separable factor (parity: reference
    loopy_utils/__init__.py:659-687).  With explicit *invariant_positions*
    those operands' product becomes the inner step; otherwise the flop-
    optimal (opt_einsum) multi-step schedule is used, which performs the same
    factorization automatically."""
    if invariant_positions is not None:
        return extract_multiplicative_terms_in_sum_reduction_as_subst(
            program, invariant_positions)
    return program.copy(
        schedule=get_opt_einsum_contraction_schedule(program.einsum))

def hoist_cses(program: EinsumProgram) -> EinsumProgram:
    """Deduplicate identical schedule steps so each distinct computation runs
    once and later steps reference the first occurrence (parity: reference
    ``hoist_cses``, cse.py:307-448 — there a DAG walk over loopy expressions;
    here steps *are* the DAG nodes).  The Pallas emitter additionally CSEs
    identical steps across batch rows inside the kernel at lowering time."""
    sched = program.schedule
    seen: dict = {}
    alias: dict = {}
    subscripts, result_names, arguments = [], [], []
    for subs, name, step_args in zip(sched.subscripts, sched.result_names,
                                     sched.arguments):
        resolved = tuple(
            IntermediateResult(alias.get(a.name, a.name))
            if isinstance(a, IntermediateResult) else a
            for a in step_args)
        key = (subs, resolved)
        if key in seen and name != "_fe_out":
            alias[name] = seen[key]
            continue
        seen.setdefault(key, name)
        subscripts.append(subs)
        result_names.append(name)
        arguments.append(resolved)
    if len(subscripts) == sched.nsteps:
        return program
    return program.copy(schedule=ContractionSchedule(
        subscripts=tuple(subscripts), result_names=tuple(result_names),
        arguments=tuple(arguments)))


def hoist_cses_in_jaxpr(closed):
    """Hash-cons a traced jaxpr: equations computing the same value (same
    primitive, same params, same — canonicalized — inputs) collapse to one,
    and every later reference is rewired to the first occurrence.

    This is the expression-level analog of the reference's user-kernel CSE
    pass (``loopy_utils/cse.py:45-448``, NSuccRecorder + CSEMapper): there a
    DAG walk over loopy expressions assigns successor-counted subexpressions
    to predicate-guarded temporaries; a jaxpr is already in ANF (every
    subexpression IS a named assignment, so successor counting is implicit)
    and its equations are effect-free (no predicate guards needed — values
    inside ``cond`` branches live in sub-jaxprs, which are left alone,
    matching the reference's same-loop-nest restriction).  JAX *tracing*
    does not deduplicate: a user computing ``2*J+1`` as the operand of two
    einsum calls produces two equation chains, which inflate the matcher's
    backward slices and the consumer path's epilogue replays.

    The pass RECURSES into sub-jaxpr params (pjit/cond/scan bodies), so
    duplicates inside a ``cond`` branch collapse too — and stay inside
    their branch, which is the jaxpr-shaped analog of the reference's
    predicate-guarded CSE temporaries (a value computed under a predicate
    is deduplicated without ever being evaluated unguarded).  Identical
    nested-jit equations (same sub-jaxpr alpha-equivalently, same consts,
    same inputs) also merge: sub-jaxprs are keyed by their canonical
    pretty-printed form, which is alpha-invariant.

    Equations whose params contain other unhashable values (arrays) or
    that carry effects are kept verbatim (inputs still rewired)."""
    from jax.extend.core import ClosedJaxpr, Jaxpr, Literal, Var

    jaxpr = closed.jaxpr
    canon: dict = {}         # Var -> canonical Var (identity-keyed)
    _subjaxpr_keys: dict = {}     # id(jaxpr) -> structural key (memo)

    def atom_key(a):
        if isinstance(a, Literal):
            v = np.asarray(a.val)
            if v.ndim == 0:
                return ("lit", str(v.dtype), v.item())
            return ("lit-arr", id(a))          # arrays: unique, no CSE
        return ("var", id(canon.get(a, a)))

    def _const_key(c, h):
        """Feed one const's VALUE into the digest: the pretty-printed
        jaxpr shows consts as avals only, so values must join the key or
        alpha-equal closures over different coefficients would merge
        (review r4: confirmed silent wrong numerics).  Big consts are too
        expensive to fetch/hash (device consts pull through the ~35 MB/s
        relay) — key them by identity, which only disables merging."""
        try:
            arr = np.asarray(c)
        except Exception:  # noqa: BLE001
            h.update(f"obj{id(c)}".encode())
            return
        if arr.size > 65536:
            h.update(f"bigconst{id(c)}".encode())
            return
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())

    def _iter_closed(v):
        if isinstance(v, ClosedJaxpr):
            yield v
        elif isinstance(v, (tuple, list)):
            for b in v:
                yield from _iter_closed(b)

    def _feed_nested_consts(jaxpr, h):
        """Nested sub-jaxprs' consts are invisible in the ancestor's
        pretty-print too — walk them recursively."""
        for eqn in jaxpr.eqns:
            for v in eqn.params.values():
                for cj in _iter_closed(v):
                    for c in cj.consts:
                        _const_key(c, h)
                    _feed_nested_consts(cj.jaxpr, h)

    def subjaxpr_key(x):
        """Alpha-invariant structural key: jax's pretty-printer names vars
        canonically per print, so equal strings <=> equal structure; const
        VALUES at every nesting depth join via a digest (stored keys stay
        small — review r4 perf note)."""
        import hashlib
        k = _subjaxpr_keys.get(id(x))
        if k is None:
            h = hashlib.blake2b(digest_size=16)
            if isinstance(x, ClosedJaxpr):
                h.update(str(x.jaxpr).encode())
                for c in x.consts:
                    _const_key(c, h)
                _feed_nested_consts(x.jaxpr, h)
                k = ("closed-jaxpr", h.digest())
            else:
                h.update(str(x).encode())
                _feed_nested_consts(x, h)
                k = ("jaxpr", h.digest())
            _subjaxpr_keys[id(x)] = k
        return k

    def freeze(x):
        if isinstance(x, dict):
            return tuple(sorted((k, freeze(v)) for k, v in x.items()))
        if isinstance(x, (list, tuple)):
            return tuple(freeze(v) for v in x)
        if isinstance(x, (ClosedJaxpr, Jaxpr)):
            return subjaxpr_key(x)
        try:
            hash(x)
            return x
        except TypeError:
            return ("unhashable", id(x))       # other opaque params: unique

    def rec_params(params):
        """CSE inside sub-jaxpr params (pjit 'jaxpr', cond 'branches',
        scan/while bodies): pure sub-jaxprs dedup the same way, and the
        rewrite stays inside its branch/body."""
        changed = False
        out = {}
        for k, v in params.items():
            if isinstance(v, ClosedJaxpr):
                v2 = hoist_cses_in_jaxpr(v)
                changed |= v2 is not v
                out[k] = v2
            elif (isinstance(v, tuple)
                  and v and all(isinstance(b, ClosedJaxpr) for b in v)):
                v2 = tuple(hoist_cses_in_jaxpr(b) for b in v)
                changed |= any(a is not b for a, b in zip(v, v2))
                out[k] = v2
            else:
                out[k] = v
        return (out if changed else params), changed

    seen: dict = {}
    new_eqns = []
    n_changed = 0
    for eqn in jaxpr.eqns:
        invars = [canon.get(a, a) if isinstance(a, Var) else a
                  for a in eqn.invars]
        eqn = eqn.replace(invars=invars)
        if eqn.effects:
            new_eqns.append(eqn)
            continue
        params2, ch = rec_params(eqn.params)
        if ch:
            eqn = eqn.replace(params=params2)
            n_changed += 1
        key = (eqn.primitive.name, freeze(eqn.params),
               tuple(atom_key(a) for a in invars),
               tuple(str(v.aval) for v in eqn.outvars))
        prev = seen.get(key)

        def _dropped(v):
            # DropVar ('_') marks a discarded output; not in jax.extend
            return type(v).__name__ == "DropVar"

        if prev is not None and all(
                _dropped(old) or not _dropped(new)
                for old, new in zip(eqn.outvars, prev)):
            # safe merge: every LIVE output of the duplicate has a live
            # counterpart in the kept equation (rewiring a live var to a
            # DropVar would produce an invalid jaxpr — review r4)
            for old, new in zip(eqn.outvars, prev):
                if not _dropped(old):
                    canon[old] = new
            continue
        if prev is None:
            seen[key] = eqn.outvars
        new_eqns.append(eqn)
    if len(new_eqns) == len(jaxpr.eqns) and not n_changed:
        return closed
    outvars = [canon.get(v, v) if isinstance(v, Var) else v
               for v in jaxpr.outvars]
    return ClosedJaxpr(jaxpr.replace(eqns=new_eqns, outvars=outvars),
                       closed.consts)


def hoist_cses_in_fn(fn, example_args):
    """User-facing analog of the reference's ``hoist_cses`` on a traced
    function: returns a callable computing exactly what *fn* computes with
    repeated subexpressions evaluated once (:func:`hoist_cses_in_jaxpr`).
    Mostly useful for inspection — XLA re-CSEs under ``jit`` anyway, but
    the matcher and :func:`~feinsum_tpu.compile_fn_with_archive` call the
    jaxpr-level pass internally, where it shrinks backward slices and
    epilogue replays."""
    import jax
    from jax.extend.core import jaxpr_as_fun

    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    deduped = hoist_cses_in_jaxpr(closed)
    out_tree = jax.tree_util.tree_structure(out_shape)

    def fn2(*args):
        flat = jax.tree_util.tree_leaves(args)
        return jax.tree_util.tree_unflatten(out_tree,
                                            jaxpr_as_fun(deduped)(*flat))

    return fn2
