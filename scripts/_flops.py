"""Analytic FLOP counting from a jaxpr.

XLA's `compiled.cost_analysis()` is wrong for the programs this repo
cares about: a `lax.scan`/`while` body is counted ONCE (not x trip
count) and `pallas_call` flops are counted as zero — the r5 MFU capture
read 2.7 TF for a 50-step fused scan whose true work is ~50 TF. This
module walks the jaxpr instead: dot_general and conv_general_dilated
from their shapes, scans multiplied by their static `length`, flash
`pallas_call`s by the 4*B*H*Sq*Sk*D attention formula, and everything
else ignored (elementwise flops are noise next to the MXU work).

`lax.while_loop` trip counts are data-dependent; `count_flops` returns
them separately as (per-trip flops of each while body) so callers can
bound or estimate (e.g. null-text's <=10 inner Adam steps).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    a, b = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    batch = math.prod(a[i] for i in lb)
    contract = math.prod(a[i] for i in lc)
    lfree = math.prod(a[i] for i in range(len(a)) if i not in set(lc) | set(lb))
    rfree = math.prod(b[i] for i in range(len(b)) if i not in set(rc) | set(rb))
    return 2.0 * batch * contract * lfree * rfree


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
    c_in = rhs[dn.rhs_spec[1]]  # already per-group in the rhs layout
    return 2.0 * math.prod(out) * k_spatial * c_in


def _flash_flops(eqn) -> float:
    """4*B*H*Sq*Sk*D for the QK+PV dots of one flash call (fwd). The
    backward kernels (dq; dk/dv) each re-do both dots plus one more:
    ~2.5x fwd; they carry 'bwd' in their kernel name.

    ops/flash_attention.py hands the kernels 3D (B*H, seq, d) operands
    (d unpadded when d%8==0, i.e. all SD head dims on hardware); the
    first two such invars are q,k (fwd / dq kernel) or k,v (dkv kernel)
    — the formula is symmetric in the two seq lengths either way."""
    arrs = [v.aval.shape for v in eqn.invars
            if hasattr(v.aval, "shape") and len(v.aval.shape) == 3
            and v.aval.shape[1] > 1]  # skip (B*H, 1, Sq) lse/delta rows
    if len(arrs) < 2:
        return 0.0
    bh, s1, d = arrs[0]
    s2 = arrs[1][1]
    base = 4.0 * bh * s1 * s2 * d
    # this JAX's pallas_call eqns carry no kernel name; tell the kernels
    # apart structurally: fwd is (q,k,v)->(out,lse); the bwd kernels take
    # (.,.,.,do,lse,delta) — dq returns one array (3 dots: s, ds, dq),
    # dkv returns two (4 dots: s, ds, dk, dv)
    if len(eqn.invars) >= 6:
        return base * (2.0 if len(eqn.outvars) >= 2 else 1.5)
    return base


def count_flops(jaxpr) -> Tuple[float, List[float]]:
    """(total flops with scans unrolled, [per-trip flops of each while])."""
    total = 0.0
    whiles: List[float] = []
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "pallas_call":
            total += _flash_flops(eqn)
        elif prim == "scan":
            sub, w = count_flops(eqn.params["jaxpr"].jaxpr)
            total += sub * eqn.params["length"]
            whiles += [x * eqn.params["length"] for x in w]
        elif prim == "while":
            sub, w = count_flops(eqn.params["body_jaxpr"].jaxpr)
            whiles.append(sub + sum(w))  # nested whiles: fold at 1 trip
        elif prim in ("jit", "pjit", "closed_call", "core_call", "remat_call",
                      "custom_jvp_call", "custom_vjp_call", "checkpoint",
                      "remat", "remat2", "custom_vjp_call_jaxpr", "cond"):
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr", "branches"):
                if key in eqn.params:
                    subs = eqn.params[key]
                    subs = subs if isinstance(subs, (list, tuple)) else [subs]
                    best, bw = 0.0, []
                    for s in subs:  # cond: count the widest branch
                        t, w = count_flops(getattr(s, "jaxpr", s))
                        if t + sum(w) >= best + sum(bw):
                            best, bw = t, w
                    total += best
                    whiles += bw
                    break
    return total, whiles


def fn_flops(fn, *args, **kw) -> Dict[str, Any]:
    """Trace fn(*args) and return {'static_tf', 'while_bodies_tf'}:
    static work in TF plus each while body's per-trip TF (caller applies
    its known trip bound)."""
    jaxpr = jax.make_jaxpr(fn, **kw)(*args)
    total, whiles = count_flops(jaxpr.jaxpr)
    return {"static_tf": total / 1e12,
            "while_bodies_tf": [w / 1e12 for w in whiles]}
