"""
Matcher: infer the :class:`BatchedEinsum` a JAX computation evaluates.

The TPU-native analog of the reference's loopy-kernel matcher
(``feinsum/loopy_utils/__init__.py:202-506``): instead of pattern-matching a
``loopy.TranslationUnit`` against the einsum grammar, we trace a JAX callable
to a jaxpr and run index-label unification over the primitives ``jnp.einsum``
lowers to (``dot_general``/``transpose``/``reduce_sum``/``mul``/
``broadcast_in_dim``/``convert_element_type``).  Each input axis gets a fresh
label; primitives unify labels (union-find); the final classes become einsum
index letters.  Axes at least ``long_dim_length`` long are promoted to
:class:`SizeParam` (the reference's rule, loopy_utils/__init__.py:121-128).

Beyond single einsums, a traced function may be a **sum of einsums**
(``div(v) + lift(flux)``): each maximal product/reduction subtree is an
*instruction*, and ``insn_match`` selects which instruction(s) to match —
the analog of the reference's loopy ``insn_match`` filter
(``loopy_utils/__init__.py:233-254``).  Scalar *literal* factors
(``2.0 * einsum(...)``) pass through: they scale the value but do not change
the einsum's structure, so matching succeeds and the factor is not part of
the returned einsum (the reference keeps such factors in the operand
substitution-rule expression, ``codegen/loopy.py:94-95``).

Grammar violations raise :class:`EinsumMatchError`.
"""

from __future__ import annotations

import inspect
import string
from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Union

import numpy as np

from .canonicalization import (
    get_substitution_mapping_between_isomorphic_batched_einsums,
)
from .diagnostics import EinsumMatchError
from .einsum import BatchedEinsum
from .make_einsum import array as make_array, batched_einsum

DEFAULT_LONG_DIM_LENGTH = 500


class _Labels:
    """Union-find over axis labels."""

    def __init__(self) -> None:
        self.parent: list = []

    def fresh(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def unify(self, a: int, b: int) -> None:
        a, b = self.find(a), self.find(b)
        if a != b:
            self.parent[max(a, b)] = min(a, b)


class _Term:
    """A labeled tensor value in the dataflow: which operand uses it reaches
    back to, and the product/contraction structure so far."""

    def __init__(self, labels, operands, contracted):
        self.labels = tuple(labels)          # per-axis label ids
        self.operands = tuple(operands)      # (input_index, axis labels) uses
        self.contracted = frozenset(contracted)  # label ids summed over


class _Sum:
    """A sum of einsum terms sharing the value's axes (one per addend of
    ``add``/``sub`` chains).  Signs are dropped: they scale terms without
    changing einsum structure (see module docstring on scalar factors)."""

    def __init__(self, terms):
        self.terms = tuple(terms)


def _as_terms(val) -> tuple:
    return val.terms if isinstance(val, _Sum) else (val,)


@dataclass(frozen=True)
class InsnInfo:
    """What ``insn_match`` predicates see about one matched instruction
    (one addend of one traced output): which output it contributes to, its
    position among that output's addends, and the argument names of the
    operands it reads (in use order)."""

    out_index: int
    term_index: int
    arg_names: tuple
    flat_index: int


InsnMatchT = Union[int, tuple, Callable[[InsnInfo], bool], None]


def _trace(fn: Callable, example_args) -> tuple:
    import jax
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    return jaxpr


def _collect_instructions(fn: Callable, example_args: Sequence, *,
                          arg_names: Optional[Sequence] = None) -> tuple:
    """Trace *fn* and walk its jaxpr under the (extended) einsum grammar.

    Returns ``(jaxpr, labels, in_axis_labels, arg_names, out_sums)`` where
    ``out_sums[k]`` is the tuple of einsum instructions (:class:`_Term`)
    whose sum the k-th traced output computes (a single-term tuple for a
    plain einsum output).
    """
    from jax.extend.core import Literal

    if arg_names is None:
        try:
            sig = inspect.signature(fn)
            arg_names = [p.name for p in sig.parameters.values()
                         if p.kind in (p.POSITIONAL_ONLY,
                                       p.POSITIONAL_OR_KEYWORD)]
        except (TypeError, ValueError):
            arg_names = []
    if len(arg_names) < len(example_args):
        arg_names = list(arg_names) + [
            f"arg{i}" for i in range(len(arg_names), len(example_args))]

    closed = _trace(fn, example_args)
    jaxpr = closed.jaxpr
    if closed.consts:
        raise EinsumMatchError(
            "matched function must not capture traced constants")

    labels = _Labels()
    env: dict = {}

    in_axis_labels = []
    for i, var in enumerate(jaxpr.invars):
        axis_labels = [labels.fresh() for _ in var.aval.shape]
        in_axis_labels.append(axis_labels)
        env[var] = _Term(axis_labels, [(i, tuple(axis_labels))], ())

    def is_scalar_literal(atom) -> bool:
        return isinstance(atom, Literal) and np.ndim(atom.val) == 0

    def read(atom):
        if isinstance(atom, Literal):
            raise EinsumMatchError(
                f"literal {atom} is not part of the einsum grammar")
        if atom not in env:
            raise EinsumMatchError(f"value {atom} has unknown provenance")
        return env[atom]

    def read_term(atom, prim) -> _Term:
        """Read an atom that must be a single einsum term (not a sum)."""
        val = read(atom)
        terms = _as_terms(val)
        if len(terms) > 1:
            raise EinsumMatchError(
                f"'{prim}' applied to a sum of einsums: products of sums "
                f"are outside the grammar — factor the function so each "
                f"addend is a standalone einsum, then select with "
                f"insn_match")
        return terms[0]

    def map_terms(val, f):
        terms = tuple(f(t) for t in _as_terms(val))
        return terms[0] if len(terms) == 1 else _Sum(terms)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            a = read_term(eqn.invars[0], prim)
            b = read_term(eqn.invars[1], prim)
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            for la, ra in zip(lc, rc):
                labels.unify(a.labels[la], b.labels[ra])
            for la, ra in zip(lb, rb):
                labels.unify(a.labels[la], b.labels[ra])
            batch = [a.labels[d] for d in lb]
            lfree = [l for d, l in enumerate(a.labels)
                     if d not in set(lc) | set(lb)]
            rfree = [l for d, l in enumerate(b.labels)
                     if d not in set(rc) | set(rb)]
            out_labels = batch + lfree + rfree
            contracted = (set(a.contracted) | set(b.contracted)
                          | {a.labels[d] for d in lc})
            env[eqn.outvars[0]] = _Term(
                out_labels, a.operands + b.operands, contracted)
        elif prim == "transpose":
            perm = eqn.params["permutation"]
            env[eqn.outvars[0]] = map_terms(
                read(eqn.invars[0]),
                lambda t: _Term([t.labels[p] for p in perm],
                                t.operands, t.contracted))
        elif prim == "reduce_sum":
            axes = set(eqn.params["axes"])
            env[eqn.outvars[0]] = map_terms(
                read(eqn.invars[0]),
                lambda t: _Term(
                    [l for d, l in enumerate(t.labels) if d not in axes],
                    t.operands,
                    set(t.contracted) | {t.labels[d] for d in axes}))
        elif prim == "mul":
            # scalar *literal* factors scale a term without changing its
            # einsum structure (reference keeps them in the operand subst
            # expression, codegen/loopy.py:94-95) — pass the value through
            scalar_side = [is_scalar_literal(v) for v in eqn.invars]
            if any(scalar_side):
                other = eqn.invars[1 - scalar_side.index(True)]
                env[eqn.outvars[0]] = read(other)
                continue
            a = read_term(eqn.invars[0], prim)
            b = read_term(eqn.invars[1], prim)
            if len(a.labels) != len(b.labels):
                raise EinsumMatchError(
                    "elementwise product of mismatched ranks; broadcast"
                    " explicitly")
            for la, lb_ in zip(a.labels, b.labels):
                labels.unify(la, lb_)
            env[eqn.outvars[0]] = _Term(
                a.labels, a.operands + b.operands,
                set(a.contracted) | set(b.contracted))
        elif prim in ("add", "sub"):
            if any(isinstance(v, Literal) for v in eqn.invars):
                raise EinsumMatchError(
                    f"'{prim}' with a scalar offset is outside the einsum"
                    f" grammar (only sums of einsum terms are matched)")
            ta = _as_terms(read(eqn.invars[0]))
            tb = _as_terms(read(eqn.invars[1]))
            rank = len(ta[0].labels)
            if any(len(t.labels) != rank for t in ta + tb):
                raise EinsumMatchError(
                    f"'{prim}' of values with different ranks")
            # all addends share the value's axes
            for t in ta[1:] + tb:
                for la, lb_ in zip(ta[0].labels, t.labels):
                    labels.unify(la, lb_)
            env[eqn.outvars[0]] = _Sum(ta + tb)
        elif prim == "neg":
            env[eqn.outvars[0]] = read(eqn.invars[0])
        elif prim == "broadcast_in_dim":
            bdims = eqn.params["broadcast_dimensions"]
            shape = eqn.params["shape"]

            def bcast(t):
                out_labels = [None] * len(shape)
                for src, dst in enumerate(bdims):
                    out_labels[dst] = t.labels[src]
                out_labels = [labels.fresh() if l is None else l
                              for l in out_labels]
                return _Term(out_labels, t.operands, t.contracted)

            env[eqn.outvars[0]] = map_terms(read(eqn.invars[0]), bcast)
        elif prim in ("convert_element_type",):
            env[eqn.outvars[0]] = map_terms(
                read(eqn.invars[0]),
                lambda t: _Term(t.labels, t.operands, t.contracted))
        else:
            raise EinsumMatchError(
                f"primitive '{prim}' is outside the batched-einsum grammar")

    out_sums = [_as_terms(read(v)) for v in jaxpr.outvars]
    return jaxpr, labels, in_axis_labels, list(arg_names), out_sums


def _insn_infos(out_sums, arg_names) -> list:
    infos, flat = [], 0
    for oi, terms in enumerate(out_sums):
        for ti, term in enumerate(terms):
            names = tuple(dict.fromkeys(
                arg_names[idx] for idx, _ in term.operands))
            infos.append(InsnInfo(oi, ti, names, flat))
            flat += 1
    return infos


def _select_instructions(out_sums, arg_names, insn_match) -> list:
    """Resolve *insn_match* to the list of selected instruction terms."""
    insns = [(oi, ti, term)
             for oi, terms in enumerate(out_sums)
             for ti, term in enumerate(terms)]
    if insn_match is None:
        multi = [oi for oi, terms in enumerate(out_sums) if len(terms) > 1]
        if multi:
            raise EinsumMatchError(
                f"traced output(s) {multi} are sums of "
                f"{[len(t) for t in out_sums]} einsum instructions; pass "
                f"insn_match= to select — a flat instruction index, an "
                f"(out_index, term_index) pair, or a predicate over "
                f"InsnInfo (see get_matched_einsums to enumerate them)")
        return insns
    infos = _insn_infos(out_sums, arg_names)
    if callable(insn_match):
        selected = [insn for insn, info in zip(insns, infos)
                    if insn_match(info)]
    elif isinstance(insn_match, tuple):
        selected = [insn for insn, info in zip(insns, infos)
                    if (info.out_index, info.term_index) == tuple(insn_match)]
    else:
        selected = [insn for insn, info in zip(insns, infos)
                    if info.flat_index == int(insn_match)]
    if not selected:
        raise EinsumMatchError(
            f"insn_match={insn_match!r} selected no instruction out of "
            f"{[(i.out_index, i.term_index, i.arg_names) for i in infos]}")
    return selected


def get_a_matched_einsum(
        fn: Callable, example_args: Sequence, *,
        long_dim_length: int = DEFAULT_LONG_DIM_LENGTH,
        arg_names: Optional[Sequence] = None,
        insn_match: InsnMatchT = None) -> tuple:
    """Match the traced *fn* against the batched-einsum grammar.

    Returns ``(einsum, name_map)`` where the einsum's operand names are *fn*'s
    parameter names and ``name_map`` maps them to input positions (parity:
    reference ``get_a_matched_einsum``; the name map plays the bidict role).

    If *fn* computes a sum of einsums, *insn_match* selects the
    instruction(s) to match (reference parity: the loopy ``insn_match``
    filter, loopy_utils/__init__.py:233-254): a flat instruction index, an
    ``(out_index, term_index)`` pair, or a predicate over :class:`InsnInfo`.
    Multiple selected instructions must form batch rows of one einsum.
    """
    jaxpr, labels, in_axis_labels, arg_names, out_sums = (
        _collect_instructions(fn, example_args, arg_names=arg_names))
    selected = _select_instructions(out_sums, arg_names, insn_match)
    rows = [term for _oi, _ti, term in selected]

    # batched-einsum structure: rows share the output index space
    # (positionally) and per-position operand index spaces
    for row in rows[1:]:
        if len(row.labels) != len(rows[0].labels):
            raise EinsumMatchError("batch rows have different output ranks")
        for la, lb in zip(rows[0].labels, row.labels):
            labels.unify(la, lb)
        if len(row.operands) != len(rows[0].operands):
            raise EinsumMatchError(
                "batch rows use different operand counts")
        for (_, ls0), (_, lsk) in zip(rows[0].operands, row.operands):
            if len(ls0) != len(lsk):
                raise EinsumMatchError(
                    "batch rows disagree on operand ranks")
            for la, lb in zip(ls0, lsk):
                labels.unify(la, lb)

    # every label class must have a single consistent axis length
    class_size: dict = {}
    for i, var in enumerate(jaxpr.invars):
        for lbl, size in zip(in_axis_labels[i], var.aval.shape):
            root = labels.find(lbl)
            if class_size.setdefault(root, size) != size:
                raise EinsumMatchError(
                    "unified axes have inconsistent lengths — not a valid"
                    " batched einsum")

    # assign letters per label class; outputs first for stable naming.
    # letters must not collide with operand names (IR invariant)
    letter_of: dict = {}
    taken = set(arg_names)
    letter_pool = iter(c for c in string.ascii_lowercase if c not in taken)

    def letter(lbl: int) -> str:
        root = labels.find(lbl)
        if root not in letter_of:
            try:
                letter_of[root] = next(letter_pool)
            except StopIteration:
                raise EinsumMatchError("more than 26 distinct indices")
        return letter_of[root]

    out_subs = ["".join(letter(l) for l in row.labels) for row in rows]
    if len(set(out_subs)) != 1:
        raise EinsumMatchError(
            f"batch rows disagree on output subscripts: {out_subs}")
    for row in rows:
        if len(set(labels.find(l) for l in row.labels)) != len(row.labels):
            raise EinsumMatchError("output repeats an index")
        op_roots = {labels.find(l) for _idx, ls in row.operands for l in ls}
        orphans = [letter(l) for l in row.labels
                   if labels.find(l) not in op_roots]
        if orphans:
            raise EinsumMatchError(
                f"output ax{'es' if len(orphans) > 1 else 'is'} {orphans} "
                f"come(s) from a broadcast, not from any operand — "
                f"broadcast-created output axes are outside the einsum "
                f"grammar")

    # operands: all rows must use the same number of operands with the same
    # per-position subscripts
    row_ops = []
    for row in rows:
        ops = [(idx, "".join(letter(l) for l in ls))
               for idx, ls in row.operands]
        row_ops.append(ops)
    n = len(row_ops[0])
    if any(len(ops) != n for ops in row_ops):
        raise EinsumMatchError("batch rows use different operand counts")
    for j in range(n):
        if len({ops[j][1] for ops in row_ops}) != 1:
            raise EinsumMatchError(
                f"batch rows disagree on operand {j} subscripts")

    # axis lengths (+ long-axis promotion) and dtypes from the traced avals
    def length_of(lbl: int, size: int):
        if size >= long_dim_length:
            return f"N{letter(lbl)}_"
        return int(size)

    arrays = []
    for ops in row_ops:
        row_arrays = []
        for idx, subs in ops:
            aval = jaxpr.invars[idx].aval
            shape = [length_of(l, s)
                     for l, s in zip(in_axis_labels[idx], aval.shape)]
            row_arrays.append(
                make_array(arg_names[idx], shape, np.dtype(aval.dtype)))
        arrays.append(row_arrays)

    in_spec = ",".join(ops_j[1] for ops_j in row_ops[0])
    einsum = batched_einsum(f"{in_spec}->{out_subs[0]}", arrays)
    used = sorted({idx for row in rows for idx, _ in row.operands})
    name_map = {arg_names[i]: i for i in used}
    return einsum, name_map


def get_matched_einsums(
        fn: Callable, example_args: Sequence, *,
        long_dim_length: int = DEFAULT_LONG_DIM_LENGTH,
        arg_names: Optional[Sequence] = None) -> list:
    """Match every einsum instruction of *fn* separately (the enumeration
    companion of ``insn_match``): returns a list of
    ``(einsum, name_map, InsnInfo)`` triples, one per addend per traced
    output."""
    _jaxpr, _labels, _in_labels, names, out_sums = _collect_instructions(
        fn, example_args, arg_names=arg_names)
    infos = _insn_infos(out_sums, names)
    out = []
    for info in infos:
        einsum, name_map = get_a_matched_einsum(
            fn, example_args, long_dim_length=long_dim_length,
            arg_names=arg_names, insn_match=info.flat_index)
        out.append((einsum, name_map, info))
    return out


def match_fn_to_einsum(fn: Callable, example_args: Sequence,
                       ref_einsum: BatchedEinsum, *,
                       long_dim_length: int = DEFAULT_LONG_DIM_LENGTH,
                       insn_match: InsnMatchT = None) -> dict:
    """Map *ref_einsum*'s entity names onto the names used by *fn* (parity:
    reference ``match_t_unit_to_einsum``, loopy_utils/__init__.py:471-506;
    *insn_match* selects a sub-instruction of a composite *fn*, reference
    :233-254)."""
    matched, _ = get_a_matched_einsum(
        fn, example_args, long_dim_length=long_dim_length,
        insn_match=insn_match)
    return get_substitution_mapping_between_isomorphic_batched_einsums(
        ref_einsum, matched)


# reference-compatible aliases (loopy_utils/__init__.py:509 and :471 — the
# "translation unit" here is a traceable callable + example args)
identify_as_einsum = get_a_matched_einsum
match_t_unit_to_einsum = match_fn_to_einsum


def get_call_ids(fn: Callable, example_args: Sequence) -> frozenset:
    """The operand names a matched callable consumes (parity: reference
    ``get_call_ids``, loopy_utils/__init__.py:552 — there: the substitution-
    call identifiers in a kernel's expressions; here: the traced function's
    matched array-argument names)."""
    einsum, name_map = get_a_matched_einsum(fn, example_args)
    return frozenset(name_map)


def abstract_long_axes(einsum: BatchedEinsum, *,
                       long_dim_length: int = DEFAULT_LONG_DIM_LENGTH
                       ) -> BatchedEinsum:
    """Promote every concrete axis >= *long_dim_length* to a
    :class:`SizeParam` (named ``N<index>_``), so concrete user shapes match
    parametric archive entries."""
    lengths = einsum.index_to_dim_length
    promote = {ix for ix, ln in lengths.items()
               if isinstance(ln, (int, np.integer)) and ln >= long_dim_length}
    if not promote:
        return einsum

    args = [[make_array(arg.name,
                        [f"N{ix}_" if ix in promote else ln
                         for ix, ln in zip(idx_set, arg.shape)],
                        arg.dtype)
             for arg, idx_set in zip(row, einsum.in_idx_sets)]
            for row in einsum.args]
    from .make_einsum import batched_einsum as be
    subs = (",".join("".join(s) for s in einsum.in_idx_sets)
            + "->" + "".join(einsum.out_idx_set))
    return be(subs, args)


def map_names(ref_einsum: BatchedEinsum, user_einsum: BatchedEinsum) -> dict:
    """Substitution map ref names -> user names (for impls applying an
    archived, canonically-named transform to a user's program)."""
    return get_substitution_mapping_between_isomorphic_batched_einsums(
        ref_einsum, user_einsum)
