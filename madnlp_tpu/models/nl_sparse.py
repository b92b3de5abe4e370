"""Sparse .nl compilation — the ExaModels-style template compiler.

The dense ``.nl`` path (:func:`madnlp_tpu.models.nl.read_nl`) densifies:
dense linear matrix, dense AD Jacobian/Hessian.  For large models that is
O(n·m) memory and O(n²) AD work.  This module compiles the same parsed
expression graphs into a :class:`~madnlp_tpu.models.model.SparseNLPModel`
with *exact* COO derivative sparsity and nnz-sized evaluation, using the
SIMD-abstraction insight of the reference's GPU model front end (ExaModels,
BASELINE.md; the same role MOI.Nonlinear's sparse AD plays for the CPU
path, reference: ext/MadNLPMOI/MOI_wrapper.jl:1376-1561):

1. **Inline** defined variables (V segments) so locality analysis sees
   plain variable leaves.
2. **Split** each constraint/objective graph into additive *terms*
   (flattening ``+``, ``-``, unary minus, OPSUMLIST).  AMPL/Pyomo models
   are sums of small indexed terms, so each term touches few variables.
3. **Canonicalize** each term: variable ids and numeric constants become
   slot references; the remaining pure structure is the *template* key.
   (``pow`` exponents stay frozen in the key — linearity depends on them.)
4. **Group** terms by template.  Per group, ONE jax-traced local function
   of the slot vector, and its grad/Hessian ``vmap``-ed over the stacked
   per-term data arrays — the exact analogue of the per-edge AD kernels
   in :mod:`madnlp_tpu.models.instances.opf`.
5. **Hessian sparsity** comes from slot-level linearity propagation over
   the template AST (which slot pairs can have a nonzero second
   derivative), mapped through each term's variable ids, with the
   duplicate-COO convention of the KKT layer (diagonal-landing off-slot
   pairs weighted ×2, lower-triangular storage).

The resulting model evaluates constraints, Jacobian values and Hessian
values in O(total term size) with a handful of vmapped kernels — MXU/VPU
friendly, static shapes, no gathers beyond the slot loads.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import SparseNLPModel
from .nl import _BINARY, _NARY, _RELATIONAL, _UNARY, ParsedNL

# ---------------------------------------------------------------------------
# defined-variable inlining
# ---------------------------------------------------------------------------


def _inline_defined(parsed: ParsedNL):
    """Return (con_exprs, obj_exprs) with every defined-variable reference
    (index >= n_var) replaced by its defining expression.  .nl guarantees
    definition-before-use order, so one forward pass suffices."""
    n_var = parsed.n_var
    defmap = {}
    for vi, lin, expr in parsed.defined:
        body = _substitute(expr, defmap, n_var)
        for v, cf in lin:
            leaf = _substitute(("var", v), defmap, n_var)
            body = (0, (body, (2, (("const", cf), leaf))))
        defmap[vi] = body

    cons = [None if e is None else _substitute(e, defmap, n_var)
            for e in parsed.con_expr]
    objs = [None if e is None else _substitute(e, defmap, n_var)
            for e in parsed.obj_expr]
    return cons, objs


def _substitute(node, defmap, n_var):
    kind, payload = node
    if kind == "const":
        return node
    if kind == "var":
        if payload >= n_var:
            return defmap[payload]
        return node
    return (kind, tuple(_substitute(c, defmap, n_var) for c in payload))


# ---------------------------------------------------------------------------
# additive term splitting
# ---------------------------------------------------------------------------


def _split_terms(node, sign=1.0, out=None):
    """Flatten +/−/neg/OPSUMLIST chains into [(sign, term_ast)]."""
    if out is None:
        out = []
    kind, payload = node
    if kind == 0:                       # add
        _split_terms(payload[0], sign, out)
        _split_terms(payload[1], sign, out)
    elif kind == 1:                     # subtract
        _split_terms(payload[0], sign, out)
        _split_terms(payload[1], -sign, out)
    elif kind == 16:                    # negate
        _split_terms(payload[0], -sign, out)
    elif kind == 54:                    # OPSUMLIST
        for c in payload:
            _split_terms(c, sign, out)
    else:
        out.append((sign, node))
    return out


# ---------------------------------------------------------------------------
# template canonicalization
# ---------------------------------------------------------------------------


def _canon(node, var_slots: List[int], const_slots: List[float]):
    """Rewrite leaves into slot references; returns the canonical AST.
    ``pow`` exponents that are constants stay frozen in the structure
    (integer-power exactness for AD and linearity-correct Hessian pattern)."""
    kind, payload = node
    if kind == "const":
        const_slots.append(float(payload))
        return ("cslot", len(const_slots) - 1)
    if kind == "var":
        var_slots.append(int(payload))
        return ("vslot", len(var_slots) - 1)
    if kind == 5 and payload[1][0] == "const":
        base = _canon(payload[0], var_slots, const_slots)
        return (5, (base, ("const", float(payload[1][1]))))
    return (kind, tuple(_canon(c, var_slots, const_slots) for c in payload))


def _eval_canon(node, zv, zc):
    """Evaluate a canonical AST against slot vectors (trace time only)."""
    kind, payload = node
    if kind == "vslot":
        return zv[payload]
    if kind == "cslot":
        return zc[payload]
    if kind == "const":
        return payload
    args = [_eval_canon(c, zv, zc) for c in payload]
    if kind in _BINARY:
        return _BINARY[kind](*args)
    if kind in _UNARY:
        return _UNARY[kind](*args)
    if kind in _RELATIONAL:
        return _RELATIONAL[kind](*args)
    if kind in _NARY:
        return _NARY[kind](args)
    if kind == 5:
        expo = payload[1]
        if expo[0] == "const" and float(expo[1]).is_integer():
            return args[0] ** int(expo[1])
        return args[0] ** args[1]
    if kind == 20:
        return jnp.logical_or(args[0], args[1])
    if kind == 21:
        return jnp.logical_and(args[0], args[1])
    if kind == 34:
        return jnp.logical_not(args[0])
    if kind == 35:
        return jnp.where(args[0], args[1], args[2])
    raise AssertionError(f"unreachable opcode {kind}")


# ---------------------------------------------------------------------------
# Hessian-sparsity propagation (slot level)
# ---------------------------------------------------------------------------

_ZERO_DERIV_UNARY = {13, 14}            # floor, ceil: derivative 0 a.e.
_PIECEWISE_LINEAR_UNARY = {15}          # abs: second derivative 0 a.e.


def _cross(a, b):
    return {(max(i, j), min(i, j)) for i in a for j in b}


def _hess_pairs(node) -> Tuple[frozenset, frozenset]:
    """Return (vars, pairs): the slot ids the node's derivative can depend
    on, and the slot pairs (a>=b) with a possibly-nonzero second derivative.
    Constants (cslot/frozen const) carry no variables, so scaling by data
    stays linear automatically."""
    kind, payload = node
    if kind in ("cslot", "const"):
        return frozenset(), frozenset()
    if kind == "vslot":
        return frozenset([payload]), frozenset()
    sub = [_hess_pairs(c) for c in payload]
    if kind in (0, 1, 54):              # add, subtract, sumlist
        return (frozenset().union(*(v for v, _ in sub)),
                frozenset().union(*(p for _, p in sub)))
    if kind == 16:                      # negate
        return sub[0]
    if kind == 2:                       # multiply
        (va, pa), (vb, pb) = sub
        return va | vb, pa | pb | _cross(va, vb)
    if kind in (3, 4, 55):              # divide, rem, int div
        (va, pa), (vb, pb) = sub
        if kind == 55:                  # trunc(a/b): derivative 0 a.e.
            return frozenset(), frozenset()
        if not vb:
            return va, pa               # divide/rem by data: linearity kept
        if kind == 4:                   # rem: a − b·trunc(a/b), linear a.e.
            return va | vb, pa | pb
        v = va | vb
        return v, pa | pb | _cross(va, vb) | _cross(vb, vb)
    if kind == 5:                       # pow
        (va, pa) = sub[0]
        expo = payload[1]
        if expo[0] == "const":
            e = float(expo[1])
            if e == 0.0:
                return frozenset(), frozenset()
            if e == 1.0:
                return va, pa
            return va, pa | _cross(va, va)
        vb, pb = sub[1]
        v = va | vb
        return v, pa | pb | _cross(v, v)
    if kind == 48:                      # arctan2
        (va, pa), (vb, pb) = sub
        v = va | vb
        return v, pa | pb | _cross(v, v)
    if kind == 6:                       # `less`: max(a−b, 0), piecewise linear
        (va, pa), (vb, pb) = sub
        return va | vb, pa | pb
    if kind in (11, 12):                # min/max lists: piecewise
        return (frozenset().union(*(v for v, _ in sub)),
                frozenset().union(*(p for _, p in sub)))
    if kind in _ZERO_DERIV_UNARY:
        return frozenset(), frozenset()
    if kind in _PIECEWISE_LINEAR_UNARY:
        return sub[0]
    if kind in _UNARY:                  # smooth nonlinear unary
        va, pa = sub[0]
        return va, pa | _cross(va, va)
    if kind in _RELATIONAL or kind in (20, 21, 34):
        return frozenset(), frozenset()  # boolean: derivative 0 a.e.
    if kind == 35:                      # if(c, t, e): piecewise in t/e
        (_, _), (vt, pt), (ve, pe) = sub
        return vt | ve, pt | pe
    raise AssertionError(f"unreachable opcode {kind}")


# ---------------------------------------------------------------------------
# group compilation
# ---------------------------------------------------------------------------


class _Group:
    """All terms sharing one template: stacked slot data + static maps.
    Objective and constraint terms never share a group (the key is tagged)
    so the Hessian weight is uniformly ``obj_weight`` or ``y[rows]``."""

    def __init__(self, key, is_obj):
        self.key = key                  # canonical AST
        self.is_obj = is_obj
        self.rows: List[int] = []       # constraint index (−1 = objective)
        self.signs: List[float] = []
        self.var_ids: List[List[int]] = []
        self.consts: List[List[float]] = []

    def finalize(self):
        self.rows = np.asarray(self.rows, dtype=np.int64)
        self.signs = np.asarray(self.signs, dtype=np.float64)
        self.var_ids = np.asarray(self.var_ids, dtype=np.int64)
        if self.var_ids.ndim == 1:      # zero var slots
            self.var_ids = self.var_ids.reshape(len(self.rows), 0)
        self.consts = np.asarray(self.consts, dtype=np.float64)
        if self.consts.ndim == 1:
            self.consts = self.consts.reshape(len(self.rows), 0)

        # hessian pair slots (static, shared by all members)
        _, pairs = _hess_pairs(self.key)
        self.pairs = sorted(pairs)
        if self.pairs:
            pa = np.array([p[0] for p in self.pairs])
            pb = np.array([p[1] for p in self.pairs])
            ra = self.var_ids[:, pa]            # (G, npairs) global var ids
            rb = self.var_ids[:, pb]
            self.hrows = np.maximum(ra, rb)
            self.hcols = np.minimum(ra, rb)
            # distinct slots landing on one variable: the symmetric mirror
            # H[b,a] folds onto the diagonal — weight ×2 (cf. the duplicate-
            # record convention in kkt/sparse.py assembly)
            self.hweight = np.where((pa != pb) & (ra == rb), 2.0, 1.0)
            self.pa, self.pb = pa, pb
        else:
            self.hrows = np.zeros((len(self.rows), 0), dtype=np.int64)
            self.hcols = np.zeros((len(self.rows), 0), dtype=np.int64)
            self.hweight = np.zeros((len(self.rows), 0))
            self.pa = self.pb = np.zeros((0,), dtype=np.int64)

        key = self.key
        nvs = self.var_ids.shape[1]

        def local(zv, zc):
            return _eval_canon(key, zv, zc)

        self.fn = local
        self.grad_fn = jax.grad(local, argnums=0) if nvs else None
        self.hess_fn = (
            jax.hessian(local, argnums=0) if len(self.pairs) else None
        )


def _collect_groups(exprs_with_rows, groups: Dict, offsets: np.ndarray):
    """Split each (row, expr) into terms and register them in ``groups``;
    constant terms accumulate into ``offsets`` (objective row −1 maps to
    offsets[-1], an extra trailing cell)."""
    for row, expr in exprs_with_rows:
        if expr is None:
            continue
        for sign, term in _split_terms(expr):
            if term[0] == "const":
                offsets[row] += sign * term[1]
                continue
            var_slots: List[int] = []
            const_slots: List[float] = []
            key = (row < 0, _canon(term, var_slots, const_slots))
            g = groups.get(key)
            if g is None:
                g = groups[key] = _Group(key[1], is_obj=key[0])
            g.rows.append(row)
            g.signs.append(sign)
            g.var_ids.append(var_slots)
            g.consts.append(const_slots)


def compile_sparse(parsed: ParsedNL, objno: int = 0) -> SparseNLPModel:
    """Compile a parsed .nl file into a :class:`SparseNLPModel`."""
    n, m = parsed.n_var, parsed.n_con
    con_exprs, obj_exprs = _inline_defined(parsed)
    maximize = parsed.obj_sense[objno] == 1

    offsets = np.zeros(m + 1)           # [-1] = objective constant
    groups: Dict = {}
    _collect_groups(
        [(i, e) for i, e in enumerate(con_exprs)], groups, offsets)
    _collect_groups([(-1, obj_exprs[objno])], groups, offsets)
    glist = list(groups.values())
    for g in glist:
        g.finalize()
    con_groups = [g for g in glist if not g.is_obj]
    obj_groups = [g for g in glist if g.is_obj]

    # ---- linear parts (sparse COO, static) -------------------------------
    # (AMPL J segments carry a 0.0 linear coefficient for purely nonlinear
    # entries — drop those; the nonlinear groups already cover them)
    lin_rows, lin_cols, lin_vals = [], [], []
    for i, terms in enumerate(parsed.jac_lin):
        for v, cf in terms:
            if cf != 0.0:
                lin_rows.append(i)
                lin_cols.append(v)
                lin_vals.append(cf)
    lin_rows = np.asarray(lin_rows, dtype=np.int64)
    lin_cols = np.asarray(lin_cols, dtype=np.int64)
    lin_vals = np.asarray(lin_vals)
    g0 = [(v, cf) for v, cf in parsed.grad_lin[objno] if cf != 0.0]
    g0_cols = np.array([v for v, _ in g0], dtype=np.int64)
    g0_vals = np.array([cf for _, cf in g0])

    con_off = jnp.asarray(offsets[:m])
    obj_off = float(offsets[-1])

    # ---- evaluation closures ---------------------------------------------
    def _group_vals(g, x):
        zv = x[g.var_ids] if g.var_ids.shape[1] else jnp.zeros(
            (len(g.rows), 0), x.dtype)
        zc = jnp.asarray(g.consts, dtype=x.dtype)
        return jax.vmap(g.fn)(zv, zc) * jnp.asarray(g.signs, x.dtype)

    def cons(x):
        body = jnp.zeros((m,), x.dtype) + con_off.astype(x.dtype)
        for g in con_groups:
            body = body.at[g.rows].add(_group_vals(g, x))
        if len(lin_rows):
            body = body.at[lin_rows].add(
                jnp.asarray(lin_vals, x.dtype) * x[lin_cols])
        return body

    def obj(x):
        val = jnp.asarray(obj_off, x.dtype)
        for g in obj_groups:
            val = val + jnp.sum(_group_vals(g, x))
        if len(g0_cols):
            val = val + jnp.dot(jnp.asarray(g0_vals, x.dtype), x[g0_cols])
        return val

    def grad(x):
        out = jnp.zeros((n,), x.dtype)
        for g in obj_groups:
            if g.grad_fn is None:
                continue
            zv = x[g.var_ids]
            zc = jnp.asarray(g.consts, dtype=x.dtype)
            gv = jax.vmap(g.grad_fn)(zv, zc) * jnp.asarray(
                g.signs, x.dtype)[:, None]
            out = out.at[g.var_ids].add(gv)
        if len(g0_cols):
            out = out.at[g0_cols].add(jnp.asarray(g0_vals, x.dtype))
        return out

    # ---- jacobian: nonlinear group entries + static linear entries -------
    jac_rows, jac_cols = [], []
    jgroups = []                        # groups with >=1 var slot on a constraint
    for g in con_groups:
        nv = g.var_ids.shape[1]
        if nv == 0:
            continue
        jgroups.append(g)
        jac_rows.append(np.repeat(g.rows, nv))
        jac_cols.append(g.var_ids.reshape(-1))
    jac_rows.append(lin_rows)
    jac_cols.append(lin_cols)
    jac_rows = np.concatenate(jac_rows) if jac_rows else np.zeros(0, np.int64)
    jac_cols = np.concatenate(jac_cols) if jac_cols else np.zeros(0, np.int64)

    def jac_coords(x):
        parts = []
        for g in jgroups:
            zv = x[g.var_ids]
            zc = jnp.asarray(g.consts, dtype=x.dtype)
            gv = jax.vmap(g.grad_fn)(zv, zc) * jnp.asarray(
                g.signs, x.dtype)[:, None]
            parts.append(gv.reshape(-1))
        parts.append(jnp.asarray(lin_vals, x.dtype))
        return (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), x.dtype))

    # ---- hessian: per-group pair extraction -------------------------------
    hgroups = [g for g in glist if g.hess_fn is not None]
    hess_rows = (np.concatenate([g.hrows.reshape(-1) for g in hgroups])
                 if hgroups else np.zeros(0, np.int64))
    hess_cols = (np.concatenate([g.hcols.reshape(-1) for g in hgroups])
                 if hgroups else np.zeros(0, np.int64))

    def hess_coords(x, y, obj_weight):
        parts = []
        for g in hgroups:
            zv = x[g.var_ids]
            zc = jnp.asarray(g.consts, dtype=x.dtype)
            H = jax.vmap(g.hess_fn)(zv, zc)          # (G, nv, nv)
            vals = H[:, g.pa, g.pb]                  # (G, npairs)
            if g.is_obj:
                w = jnp.full((len(g.rows),), obj_weight, x.dtype)
            else:
                w = y[g.rows]
            vals = vals * (w * jnp.asarray(g.signs, x.dtype))[:, None]
            vals = vals * jnp.asarray(g.hweight, x.dtype)
            parts.append(vals.reshape(-1))
        return (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), x.dtype))

    return SparseNLPModel(
        n=n, m=m, obj=obj, cons=cons, grad=grad, x0=parsed.x0,
        jac_rows=jac_rows, jac_cols=jac_cols, jac_coords=jac_coords,
        hess_rows=hess_rows, hess_cols=hess_cols, hess_coords=hess_coords,
        lvar=parsed.lvar, uvar=parsed.uvar, lcon=parsed.lcon,
        ucon=parsed.ucon, y0=parsed.y0,
        minimize=not maximize, name=parsed.path,
    )
