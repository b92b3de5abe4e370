"""Two-stage structure auto-detection for the Schur-complement KKT system.

The reference resolves Schur dimensions from explicit options or from
ExaModels-convention scenario tags on the model
(``/root/reference/src/KKT/Schur/schur.jl:160-235``: ``tags.ns``,
``tags.var_scenario`` with 0 = design / k = scenario k, same for
``con_scenario``, validated per-scenario-uniform).  This module provides

* :func:`from_tags` — the same convention: a model carrying a ``tags``
  attribute (object or dict with ``ns``, ``var_scenario``,
  ``con_scenario``) in the canonical layout ``x = [v_1 … v_N, d]``,
  constraints grouped per scenario; and
* :func:`from_jac_structure` — **structural** inference with no tags at
  all: given the Jacobian COO pattern in the canonical layout, recover
  ``(N, nv, nd, ms)`` by finding the scenario count whose induced blocks
  touch disjoint private column ranges plus a shared design tail.  (The
  reference cannot do this; its auto-detection requires model
  annotations.)

Both run host-side at setup time (numpy only) — the detected structure
becomes static shapes for the scenario-batched factorization.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models.instances.twostage import TwoStageStructure


def _get(tags, name):
    if isinstance(tags, dict):
        return tags.get(name)
    return getattr(tags, name, None)


def from_tags(model) -> Optional[TwoStageStructure]:
    """Detect from ExaModels-style scenario tags; None when the model has
    no (complete) tags.  Raises ValueError on malformed/non-canonical
    tags, mirroring the reference's validation errors."""
    tags = getattr(model, "tags", None)
    if tags is None:
        return None
    ns = _get(tags, "ns")
    var_scen = _get(tags, "var_scenario")
    con_scen = _get(tags, "con_scenario")
    if ns is None or var_scen is None or con_scen is None:
        return None
    ns = int(ns)
    var_scen = np.asarray(var_scen, dtype=np.int64)
    con_scen = np.asarray(con_scen, dtype=np.int64)
    if var_scen.min(initial=0) < 0 or var_scen.max(initial=0) > ns:
        raise ValueError(f"var_scenario tags out of range [0, {ns}]")
    if con_scen.min(initial=1) < 1 or con_scen.max(initial=1) > ns:
        bad = int((con_scen < 1).sum())
        if bad:
            raise ValueError(
                f"{bad} constraints have con_scenario tag 0; design-only "
                "constraints are not supported by the Schur KKT system")
        raise ValueError(f"con_scenario tags out of range [1, {ns}]")
    var_hist = np.bincount(var_scen, minlength=ns + 1)
    con_hist = np.bincount(con_scen, minlength=ns + 1)
    nd, nv, ms = int(var_hist[0]), int(var_hist[1]), int(con_hist[1])
    if not (var_hist[1:] == nv).all():
        k = int(np.argmin(var_hist[1:] == nv)) + 1
        raise ValueError(
            f"scenario {k} has {var_hist[k]} variables; scenario 1 has "
            f"{nv} — per-scenario sizes must be uniform")
    if not (con_hist[1:] == ms).all():
        k = int(np.argmin(con_hist[1:] == ms)) + 1
        raise ValueError(
            f"scenario {k} has {con_hist[k]} constraints; scenario 1 has "
            f"{ms} — per-scenario sizes must be uniform")
    # canonical layout check: [v_1 … v_N, d], constraints grouped by scenario
    expect_var = np.repeat(np.arange(1, ns + 1), nv)
    if not (var_scen[: ns * nv] == expect_var).all() or not (
            var_scen[ns * nv:] == 0).all():
        raise ValueError(
            "variables are not in the canonical [v_1 … v_N, d] order; "
            "permute the model so scenario variables are contiguous "
            "(scenario-major) with design variables last")
    if not (con_scen == np.repeat(np.arange(1, ns + 1), ms)).all():
        raise ValueError(
            "constraints are not grouped scenario-major; permute the model")
    return TwoStageStructure(N=ns, nv=nv, nd=nd, ms=ms)


def from_jac_structure(
    jac_rows, jac_cols, n: int, m: int, ns: Optional[int] = None,
    hess_rows=None, hess_cols=None,
) -> Optional[TwoStageStructure]:
    """Structural detection from the Jacobian COO pattern (canonical
    layout assumed).  For a candidate scenario count N (m must divide):
    constraint block k = rows [k·ms, (k+1)·ms); *private* columns are those
    touched by exactly one block; detection succeeds when the private
    columns of block k are exactly [k·nv, (k+1)·nv) for a uniform nv and
    every shared column lies in the design tail [N·nv, n).  Tries the
    given ``ns`` or all divisors of m in decreasing order; returns None
    when nothing matches (never raises — callers fall back to an explicit
    ``schur_structure=`` error)."""
    jac_rows = np.asarray(jac_rows, dtype=np.int64)
    jac_cols = np.asarray(jac_cols, dtype=np.int64)
    if m <= 1 or len(jac_rows) == 0:
        return None
    cands = ([ns] if ns else
             [N for N in range(m, 1, -1) if m % N == 0])
    for N in cands:
        ms = m // N
        blk = jac_rows // ms                     # block of each record
        # per-column touched-block range (cheap uniqueness test: a column
        # touched by one block has min==max)
        lo = np.full(n, N, dtype=np.int64)
        hi = np.full(n, -1, dtype=np.int64)
        np.minimum.at(lo, jac_cols, blk)
        np.maximum.at(hi, jac_cols, blk)
        touched = hi >= 0
        private = touched & (lo == hi)
        shared = touched & ~private
        if not private.any():
            continue
        priv_cols = np.where(private)[0]
        owner = lo[priv_cols]
        counts = np.bincount(owner, minlength=N)
        nv_sizes = np.unique(counts)
        # uniform private width; untouched interior columns break canonical
        # contiguity below, so only the width needs checking here
        if len(nv_sizes) != 1:
            continue
        nv = int(nv_sizes[0])
        if nv == 0 or N * nv > n:
            continue
        nd = n - N * nv
        # canonical ranges: block k owns exactly [k·nv, (k+1)·nv)
        if not (owner == priv_cols // nv).all():
            continue
        if (priv_cols >= N * nv).any():
            continue
        if shared[: N * nv].any():
            continue
        if nd == 0:
            continue                             # no coupling — not two-stage
        if hess_rows is not None and len(np.asarray(hess_rows)):
            # Hessian must not couple two scenarios directly (entries live
            # in A_kk, C_dk, or S blocks only)
            hb_r = np.asarray(hess_rows, dtype=np.int64) // nv
            hb_c = np.asarray(hess_cols, dtype=np.int64) // nv
            in_v_r = np.asarray(hess_rows) < N * nv
            in_v_c = np.asarray(hess_cols) < N * nv
            if ((hb_r != hb_c) & in_v_r & in_v_c).any():
                continue
        return TwoStageStructure(N=N, nv=nv, nd=nd, ms=ms)
    return None


def detect_two_stage(model) -> Optional[TwoStageStructure]:
    """Resolve a :class:`TwoStageStructure` for ``model``: scenario tags
    first (the reference's convention), then structural inference from the
    sparse Jacobian pattern when available."""
    ts = from_tags(model)
    if ts is not None:
        return ts
    if getattr(model, "is_dense", True):
        return None
    return from_jac_structure(
        model.jac_rows, model.jac_cols, model.n, model.m,
        hess_rows=model.hess_rows, hess_cols=model.hess_cols)
