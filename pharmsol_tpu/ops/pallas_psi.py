"""Pallas TPU kernels: fused psi tiles for all analytical model structures.

The population workload (BASELINE: psi over subjects x support points for
closed-form PK structures) gets hand-scheduled kernels:

- grid tiles of (row_block subjects) x (sp_block support points) live in VMEM;
- support-dependent eigen quantities are computed once per tile (the
  "prepared" split, mirroring engine/analytical.py PREPARED_KERNELS), states
  are held as [row_block, sp_block] lanes, and the segment loop is fully
  unrolled (M is small and static);
- per-segment work is a handful of exponentials plus the affine propagator,
  and the log-likelihood accumulates in VMEM — nothing round-trips to HBM
  until the final [row_block, sp_block] psi tile is written.

Every structure in ``engine.analytical.KERNELS`` is covered: the six
micro-constant kernels have dedicated prepare/propagate pairs and the six
CL-parameterized variants reuse them through an XLA-side support-row remap
(exactly the reparameterization the reference applies in
one/two/three_compartment_cl_models.rs). Output equations are handled
generically: any observation function linear in the state
(``y_k = C_k(p) . x + b_k(p)``) is supported, including multiple output
equations — the coefficient rows are extracted OUTSIDE the kernel by basis
evaluation of the model's ``out`` closure (support-only work) and streamed
in as extra parameter rows; per-observation outeq indices ride a segment
stream and select coefficients with one-hot lane math.

Mosaic-friendliness notes: every intermediate stays 2-D (column slices use
one-hot lane reductions), support parameter quantities are [1, sp_block]
lane vectors that broadcast against [row_block, sp_block] states, and
segment streams are lane-padded to 128.

Optional features (infusion rates, censoring, multi-output, covariate
multipliers) ride extra streams that are statically compiled out when
absent. Time-constant covariates acting through a multiplicative seq
equation decompose into per-row parameter multipliers (built and validated
by likelihood/matrix._decompose_seq) streamed as one extra row input; the
kernel forms effective per-row parameter tiles and runs the CL remap
in-kernel, so covariate populations keep the fused path for the 1/2-cmt
families. Infusion segments propagate via the steady-state offset
``x(dt) = ss + expm(A dt)(x - ss)``.
Mosaic lowers neither ``acos`` nor ``erf``: the 3-cmt eigenvalue cubic is
prepared in XLA before the pallas_call and the kernel carries its own
log_ndtr. Compiled kernels are float32-only; off-TPU the kernels run in
interpret mode (which is also how the CPU/f64 parity tests run).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = math.log(2.0 * math.pi)

SUB_TILE = 8  # minimum row-padding unit (callers pad R to a multiple of this)
SP_TILE = 128
SEG_PAD = 128  # segment streams are lane-padded to this width
# Kernel tile sizes: the largest row/support blocks dividing R/S are used
# per call, capped so row_block * sp_block stays within the known-compiling
# VMEM budget. Bigger tiles amortize grid-step overhead dramatically
# (measured on v5e at 16384x512: (8,128) -> 3.9 B sims/s, (512,256) ->
# 13-26 B sims/s depending on chip hour, bit-identical output); tiles with
# row_block * sp_block > 512*256 fail to compile (VMEM).
ROW_BLOCKS = (512, 256, 128, 64, 32, 16, 8)
SP_BLOCKS = (256, 128)
TILE_BUDGET = 512 * 256


def _log_ndtr(x):
    """Mosaic-compatible log of the standard normal CDF.

    Mosaic lowers neither acos nor erf, so: Abramowitz-Stegun 7.1.26 erf for
    x >= -3 (abs err 1.5e-7) and the Laplace continued fraction for the Mills
    ratio in the left tail. Max abs error ~6e-5 over [-30, 8] in float32 —
    well inside assay-likelihood noise. The engine's exact log_ndtr remains
    the reference path.
    """
    sqrt2 = math.sqrt(2.0)
    u = x / sqrt2
    a = jnp.abs(u)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.where(u >= 0.0, erf_abs, -erf_abs)
    log_direct = jnp.log(jnp.maximum(0.5 * (1.0 + erf), 1e-38))
    # tail: logPhi(x) = logpdf(x) - log(cf), cf = Laplace continued fraction
    z = jnp.maximum(-x, 3.0)
    cf = z + 9.0
    for k in range(8, 0, -1):
        cf = z + k / cf
    log_tail = -0.5 * x * x - 0.5 * LOG_2PI - jnp.log(cf)
    return jnp.where(x < -3.0, log_tail, log_direct)


def _obs_ll(val, pred, sig, mask, s, has_cens: bool):
    """Per-observation log-likelihood lane: normal pdf, or log CDF/CCDF for
    censored rows (s = +1 BLOQ, -1 ALOQ, 0 none; loglik.py parity)."""
    z = (val - pred) / sig
    normal = -0.5 * LOG_2PI - jnp.log(sig) - 0.5 * z * z
    if not has_cens:
        return mask * normal
    return mask * jnp.where(s == 0.0, normal, _log_ndtr(s * z))


# ---------------------------------------------------------------------------
# Structure definitions.
#
# ``prepare(params)`` does parameter-only work once per tile (eigen
# quantities, coefficient ratios — the PREPARED_KERNELS split); it receives
# the base-parameterization lane rows (plus any XLA-prepared extras such as
# the 3-cmt decay constants) and returns an aux tuple. ``propagate(aux, xs,
# dt, rate)`` advances the state lanes over one segment; ``rate`` is None
# when the workload has no infusions (the infusion compute is then compiled
# out entirely). All quantities are broadcastable 2-D lanes: parameter rows
# are [1, sp_block], states [row_block, sp_block].
#
# Closed-form algebra parity: one/two/three_compartment_models.rs (the same
# eigen solutions; divergences documented in engine/analytical.py:18-21).
# ---------------------------------------------------------------------------


def _prep_1cmt_iv(p):
    (ke,) = p
    return (ke, 1.0 / ke)


def _prop_1cmt_iv(aux, xs, dt, rate):
    ke, inv_ke = aux
    (x1,) = xs
    e = jnp.exp(-ke * dt)
    if rate is None:
        return [x1 * e]
    ss = rate * inv_ke
    return [ss + (x1 - ss) * e]


def _prep_1cmt_oral(p):
    ka, ke = p
    return (ka, ke, ka / (ka - ke), 1.0 / ke)


def _prop_1cmt_oral(aux, xs, dt, rate):
    ka, ke, ratio, inv_ke = aux
    x0, x1 = xs
    eka = jnp.exp(-ka * dt)
    eke = jnp.exp(-ke * dt)
    nx1 = x1 * eke + ratio * x0 * (eke - eka)
    if rate is not None:
        nx1 = nx1 + rate * inv_ke * (1.0 - eke)
    return [x0 * eka, nx1]


def _two_cmt_eigs(ke, kcp, kpc):
    disc = (ke + kcp + kpc) ** 2 - 4.0 * ke * kpc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    l1 = (ke + kcp + kpc + sq) * 0.5
    l2 = (ke + kcp + kpc - sq) * 0.5
    return l1, l2


def _prep_2cmt_iv(p):
    ke, kcp, kpc = p
    l1, l2 = _two_cmt_eigs(ke, kcp, kpc)
    inv_denom = 1.0 / (l1 - l2)
    return (ke, kcp, kpc, l1, l2, inv_denom, 1.0 / ke, kcp / (ke * kpc))


def _prop_2cmt_iv(aux, xs, dt, rate):
    ke, kcp, kpc, l1, l2, inv_denom, inv_ke, ss_ratio2 = aux
    x1, x2 = xs
    if rate is not None:
        ss1 = rate * inv_ke
        ss2 = rate * ss_ratio2
        y1 = x1 - ss1
        y2 = x2 - ss2
    else:
        y1, y2 = x1, x2
    e1 = jnp.exp(-l1 * dt)
    e2 = jnp.exp(-l2 * dt)
    nx1 = (((l1 - kpc) * e1 + (kpc - l2) * e2) * y1
           + kpc * (e2 - e1) * y2) * inv_denom
    nx2 = (kcp * (e2 - e1) * y1
           + ((l1 - ke - kcp) * e1 + (ke + kcp - l2) * e2) * y2) * inv_denom
    if rate is not None:
        nx1 = nx1 + ss1
        nx2 = nx2 + ss2
    return [nx1, nx2]


def _prep_2cmt_oral(p):
    ke, ka, kcp, kpc = p
    l1, l2 = _two_cmt_eigs(ke, kcp, kpc)
    return (ke, ka, kcp, kpc, l1, l2, 1.0 / (l1 - l2),
            1.0 / (ka - l1), 1.0 / (ka - l2), 1.0 / ke, kcp / (ke * kpc))


def _prop_2cmt_oral(aux, xs, dt, rate):
    (ke, ka, kcp, kpc, l1, l2, inv_denom, inv_ka_l1, inv_ka_l2, inv_ke,
     ss_ratio2) = aux
    x0, x1, x2 = xs
    e1 = jnp.exp(-l1 * dt)
    e2 = jnp.exp(-l2 * dt)
    eka = jnp.exp(-ka * dt)
    if rate is not None:
        ss1 = rate * inv_ke
        ss2 = rate * ss_ratio2
        y1 = x1 - ss1
        y2 = x2 - ss2
    else:
        y1, y2 = x1, x2
    hom0 = ((l1 - kpc) * e1 + (kpc - l2) * e2) * y1 + kpc * (e2 - e1) * y2
    hom1 = kcp * (e2 - e1) * y1 + ((l1 - ke - kcp) * e1 + (ke + kcp - l2) * e2) * y2
    abs0 = (l1 - kpc) * inv_ka_l1 * (e1 - eka) + (kpc - l2) * inv_ka_l2 * (e2 - eka)
    abs1 = kcp * (inv_ka_l2 * (e2 - eka) - inv_ka_l1 * (e1 - eka))
    scale = ka * x0 * inv_denom
    nx1 = hom0 * inv_denom + abs0 * scale
    nx2 = hom1 * inv_denom + abs1 * scale
    if rate is not None:
        nx1 = nx1 + ss1
        nx2 = nx2 + ss2
    return [x0 * eka, nx1, nx2]


def _prep_3cmt_projectors(k10, k12, k13, k21, k31, lam):
    """Lagrange spectral projectors of the mammillary rate matrix:
    ``P_k = prod_{j!=k}(A + l_j I) / prod_{j!=k}(l_j - l_k)``, prepared once
    per tile from the XLA-side decay constants ``lam``."""
    a11 = -(k10 + k12 + k13)
    m11 = a11 * a11 + k21 * k12 + k31 * k13
    m12 = k21 * (a11 - k21)
    m13 = k31 * (a11 - k31)
    m21 = k12 * (a11 - k21)
    m22 = k12 * k21 + k21 * k21
    m23 = k12 * k31
    m31 = k13 * (a11 - k31)
    m32 = k13 * k21
    m33 = k13 * k31 + k31 * k31
    proj = []
    for k in range(3):
        lk = lam[k]
        lj, ll_ = lam[(k + 1) % 3], lam[(k + 2) % 3]
        s = lj + ll_
        pr = lj * ll_
        invd = 1.0 / ((lj - lk) * (ll_ - lk))
        P = (
            (m11 + s * a11 + pr) * invd,
            (m12 + s * k21) * invd,
            (m13 + s * k31) * invd,
            (m21 + s * k12) * invd,
            (m22 + s * (-k21) + pr) * invd,
            m23 * invd,
            (m31 + s * k13) * invd,
            m32 * invd,
            (m33 + s * (-k31) + pr) * invd,
        )
        proj.append((lk, P))
    return proj


def _prep_3cmt_iv(p):
    k10, k12, k13, k21, k31, l1, l2, l3 = p
    proj = _prep_3cmt_projectors(k10, k12, k13, k21, k31, (l1, l2, l3))
    return (proj, 1.0 / k10, k12 / (k10 * k21), k13 / (k10 * k31))


def _prop_3cmt_iv(aux, xs, dt, rate):
    proj, inv_k10, ss_ratio2, ss_ratio3 = aux
    x1, x2, x3 = xs
    if rate is not None:
        ss1 = rate * inv_k10
        ss2 = rate * ss_ratio2
        ss3 = rate * ss_ratio3
        y1, y2, y3 = x1 - ss1, x2 - ss2, x3 - ss3
        nx1, nx2, nx3 = ss1, ss2, ss3
    else:
        y1, y2, y3 = x1, x2, x3
        nx1 = nx2 = nx3 = jnp.zeros_like(x1)
    for lk, P in proj:
        ek = jnp.exp(-lk * dt)
        nx1 = nx1 + ek * (P[0] * y1 + P[1] * y2 + P[2] * y3)
        nx2 = nx2 + ek * (P[3] * y1 + P[4] * y2 + P[5] * y3)
        nx3 = nx3 + ek * (P[6] * y1 + P[7] * y2 + P[8] * y3)
    return [nx1, nx2, nx3]


def _prep_3cmt_oral(p):
    ka, k10, k12, k13, k21, k31, l1, l2, l3 = p
    proj = _prep_3cmt_projectors(k10, k12, k13, k21, k31, (l1, l2, l3))
    proj = [(lk, P, 1.0 / (ka - lk)) for lk, P in proj]
    return (ka, proj, 1.0 / k10, k12 / (k10 * k21), k13 / (k10 * k31))


def _prop_3cmt_oral(aux, xs, dt, rate):
    ka, proj, inv_k10, ss_ratio2, ss_ratio3 = aux
    x0, x1, x2, x3 = xs
    eka = jnp.exp(-ka * dt)
    if rate is not None:
        ss1 = rate * inv_k10
        ss2 = rate * ss_ratio2
        ss3 = rate * ss_ratio3
        y1, y2, y3 = x1 - ss1, x2 - ss2, x3 - ss3
        nx1, nx2, nx3 = ss1, ss2, ss3
    else:
        y1, y2, y3 = x1, x2, x3
        nx1 = nx2 = nx3 = jnp.zeros_like(x1)
    for lk, P, inv_ka_lk in proj:
        ek = jnp.exp(-lk * dt)
        nx1 = nx1 + ek * (P[0] * y1 + P[1] * y2 + P[2] * y3)
        nx2 = nx2 + ek * (P[3] * y1 + P[4] * y2 + P[5] * y3)
        nx3 = nx3 + ek * (P[6] * y1 + P[7] * y2 + P[8] * y3)
        # depot forcing: ka*x0 * (ek - eka)/(ka - lk) * (P @ e1)
        f = ka * x0 * (ek - eka) * inv_ka_lk
        nx1 = nx1 + f * P[0]
        nx2 = nx2 + f * P[3]
        nx3 = nx3 + f * P[6]
    return [x0 * eka, nx1, nx2, nx3]


def _prep_3cmt_eigenvalues(base_rows):
    """Decay constants of the mammillary 3-cmt rate matrix, per support row.

    Trigonometric solution of the monic cubic l^3 - A l^2 + B l - C with the
    symmetric sums of the three (real, positive) decay constants
    (three_compartment_models.rs:24-45). Runs in XLA before the pallas_call —
    support-only work, one cubic per support point (Mosaic has no acos
    lowering).

    ``base_rows`` is the micro-constant parameterization; for oral
    structures the leading ka row is present and skipped.
    """
    k10, k12, k13, k21, k31 = base_rows[-5:]
    A = k10 + k12 + k13 + k21 + k31
    B = k10 * k21 + k10 * k31 + k12 * k31 + k13 * k21 + k21 * k31
    C = k10 * k21 * k31
    p = B - A * A / 3.0
    q = -2.0 * A * A * A / 27.0 + A * B / 3.0 - C
    mp3 = jnp.maximum(-p / 3.0, 1e-30)
    rt = jnp.sqrt(mp3)
    arg = jnp.clip(3.0 * q / (2.0 * jnp.minimum(p, -1e-30)) / rt, -1.0, 1.0)
    phi = jnp.arccos(arg) / 3.0
    two_pi_3 = 2.0 * math.pi / 3.0
    l1 = 2.0 * rt * jnp.cos(phi) + A / 3.0
    l2 = 2.0 * rt * jnp.cos(phi - two_pi_3) + A / 3.0
    l3 = 2.0 * rt * jnp.cos(phi - 2.0 * two_pi_3) + A / 3.0
    return [l1, l2, l3]


# CL-parameterization remaps (XLA-side, on support rows or planes): the same
# micro-constant reparameterizations as engine/analytical.py one/two/
# three_compartments_cl* (parity: *_cl_models.rs).


def _remap_1cmt_cl(r):
    cl, v = r
    return [cl / v]


def _remap_1cmt_cl_abs(r):
    ka, cl, v = r
    return [ka, cl / v]


def _remap_2cmt_cl(r):
    cl, q, vc, vp = r
    return [cl / vc, q / vc, q / vp]


def _remap_2cmt_cl_abs(r):
    ka, cl, q, vc, vp = r
    return [cl / vc, ka, q / vc, q / vp]


def _remap_3cmt_cl(r):
    cl, q1, q2, vc, vp1, vp2 = r
    return [cl / vc, q1 / vc, q2 / vc, q1 / vp1, q2 / vp2]


def _remap_3cmt_cl_abs(r):
    ka, cl, q1, q2, vc, vp1, vp2 = r
    return [ka, cl / vc, q1 / vc, q2 / vc, q1 / vp1, q2 / vp2]


def _struct(n_params, n_states, dose_state, central, prepare, propagate,
            prep_xla=None, remap=None):
    return {
        "n_params": n_params,       # support columns consumed by the kernel
        "n_states": n_states,
        "dose_state": dose_state,   # bolus destination
        "central": central,         # state index of the default central/v output
        "prepare": prepare,
        "propagate": propagate,
        "prep_xla": prep_xla,       # extra param rows computed in XLA
        "remap": remap,             # CL -> micro-constant reparameterization
    }


STRUCTURES = {
    "one_compartment": _struct(1, 1, 0, 0, _prep_1cmt_iv, _prop_1cmt_iv),
    "one_compartment_with_absorption": _struct(
        2, 2, 0, 1, _prep_1cmt_oral, _prop_1cmt_oral),
    "one_compartment_cl": _struct(
        2, 1, 0, 0, _prep_1cmt_iv, _prop_1cmt_iv, remap=_remap_1cmt_cl),
    "one_compartment_cl_with_absorption": _struct(
        3, 2, 0, 1, _prep_1cmt_oral, _prop_1cmt_oral, remap=_remap_1cmt_cl_abs),
    "two_compartments": _struct(3, 2, 0, 0, _prep_2cmt_iv, _prop_2cmt_iv),
    "two_compartments_with_absorption": _struct(
        4, 3, 0, 1, _prep_2cmt_oral, _prop_2cmt_oral),
    "two_compartments_cl": _struct(
        4, 2, 0, 0, _prep_2cmt_iv, _prop_2cmt_iv, remap=_remap_2cmt_cl),
    "two_compartments_cl_with_absorption": _struct(
        5, 3, 0, 1, _prep_2cmt_oral, _prop_2cmt_oral, remap=_remap_2cmt_cl_abs),
    "three_compartments": _struct(
        5, 3, 0, 0, _prep_3cmt_iv, _prop_3cmt_iv,
        prep_xla=_prep_3cmt_eigenvalues),
    "three_compartments_with_absorption": _struct(
        6, 4, 0, 1, _prep_3cmt_oral, _prop_3cmt_oral,
        prep_xla=_prep_3cmt_eigenvalues),
    "three_compartments_cl": _struct(
        6, 3, 0, 0, _prep_3cmt_iv, _prop_3cmt_iv,
        prep_xla=_prep_3cmt_eigenvalues, remap=_remap_3cmt_cl),
    "three_compartments_cl_with_absorption": _struct(
        7, 4, 0, 1, _prep_3cmt_oral, _prop_3cmt_oral,
        prep_xla=_prep_3cmt_eigenvalues, remap=_remap_3cmt_cl_abs),
}


def _make_kernel(sdef, *, n_seg: int, has_inf: bool, has_cens: bool,
                 n_out: int, has_bias: bool, n_param_rows: int,
                 mult_mode: Optional[str] = None, has_lag: bool = False,
                 has_fa: bool = False, n_levels: int = 0,
                 has_offsets: bool = False, has_init: bool = False,
                 n_lag_planes: int = 0, n_fa_planes: int = 0,
                 lag_slots=None, fa_slots=None, lag_depth: bool = False,
                 lag_post: bool = False):
    """Build the psi tile kernel for one structure + feature combination.

    Ref layout (in order): segment streams (dt, bolus, [rateiv], mask, value,
    sigma, [cens], [outeq], [param-mult | per-param seg-mult streams]) each
    [row_block, SEG_PAD]; parameter rows (base params + XLA-prepared extras)
    each [1, sp_block]; output coefficient rows (n_out * n_states) and
    optional bias rows (n_out); then out_ref [row_block, sp_block].

    ``mult_mode``:
    - ``'row'``: per-row multiplicative covariate effects. One param-mult
      stream carries one multiplier per RAW support column in its leading
      lanes; effective parameter tiles become [row_block, sp_block] (raw row
      x per-row multiplier), the CL remap runs in-kernel on those tiles, and
      ``prepare`` broadcasts over both axes — this is how time-constant
      covariates ride the fused kernel without a [R, S, P] blowup.
    - ``'segment'``: per-row per-SEGMENT multipliers, one stream per raw
      support column, each [row_block, SEG_PAD] like the dt stream. The
      effective parameters and ``prepare`` are re-evaluated inside the
      segment loop — this carries time-VARYING covariates and the engine's
      seq carry-across-infusion-end compounding (the plan bakes that chain
      into the streams host-side).

    Mosaic note: per-segment scalars are extracted with one-hot lane
    reductions instead of strided slices (sub-tile slicing fails to legalize
    on some Mosaic versions).

    ``mult_mode == 'levels'`` (seq chain-depth scheme): a covariate-free,
    time-independent seq equation — of ANY form, including non-separable
    parameter mixing — evaluates to ``seq^d(p)`` where the chain depth d
    depends only on the row's event structure (resets at real events,
    compounds across infusion-end sub-splits, analytical/mod.rs:331,360).
    The iterated level tables are computed host-side on the support matrix
    and stream as ``n_levels`` sets of parameter rows (post-remap, with
    XLA-prepared eigen extras per level — so this is the 3-cmt+seq path);
    a depth stream [rows, SEG_PAD] selects the level per segment with
    one-hot lane math and ``prepare`` runs per segment on the blended
    [rows, sp] parameter tiles.

    ``has_offsets`` extends 'row'/'segment' multiplier modes to the AFFINE
    decomposition ``seq[i] = p[i] * g_i + h_i`` (additive covariate
    effects): each multiplier stream is followed by a matching offset
    stream and effective parameters become ``p * g + h``.

    ``has_lag`` / ``has_fa``: per-(row, support) lag shift / bioavailability
    scale planes ride as [row_block, sp_block] tile inputs (after the
    segment streams, before the parameter rows). fa scales the bolus amount
    at its breakpoint (structs.rs:611-666 add_fa). lag is implemented as a
    PENDING dose: the bolus parks in (pend_amt, pend_rem) lanes at its
    original breakpoint and materializes once its remaining lag elapses
    inside a segment — the partial-segment propagation
    ``x += propagate(dt - rem)(D e_dose)`` is exact for these linear
    kernels by superposition, and an observation at a breakpoint before
    the (per-support!) shifted dose time correctly reads the pre-dose
    state. Fires use strict ``rem < dt`` so a dose landing exactly ON a
    breakpoint is applied after that breakpoint's observation
    (observation-before-dose parity). The plan validates that no two doses
    of a row are ever pending simultaneously.

    ``lag_slots`` / ``fa_slots`` (static length-``n_seg`` tuples of plane
    indices, -1 = the host proved no dose lands at that column) switch the
    single [row_block, sp_block] plane to per-DOSE-SEGMENT planes — the
    exact-evaluation path for time-dependent lag/fa closures and closures
    that READ a time-varying covariate (same mechanism as the ODE tier's
    slot tables; each dose's lag/fa is evaluated host-side at ITS OWN
    breakpoint time with the engine's CovView, structs.rs:629 semantics).

    ``lag_depth`` (requires ``has_lag`` and a levels/planes mult_mode):
    lag composed with seq chain depth > 1. A lag-shifted bolus moves the
    engine's seq-reset breakpoint to the (per-lane!) shifted fire time, so
    the host's seg_depth stream is replaced by an IN-KERNEL depth counter
    driven by an event-code stream (1 = obs/infusion-start: reset the
    chain — those breakpoints never move; 2 = infusion-end sub-split:
    compound; 0 = bolus column — a PHANTOM split whose event moved away
    with the lag: the engine segment continues through it, applying seq
    at most once, tracked by the ``app`` flag). Superposition no longer
    holds across the fire (parameters change there), so the segment
    becomes a TRUE split march: propagate to the fire offset at the
    pre-fire depth, apply the pending dose, reset the chain, and
    propagate the remainder with depth-1 parameters (``aux_fire``).

    ``lag_post`` (requires ``has_lag`` and planes mult_mode): lag
    composed with a time-varying/time-dependent seq. The host computed
    the full per-lane chain (static resets + each lane's own fire
    times) into per-COLUMN planes: a second slot stream (postdepths)
    selects the POST-fire parameters for the split march's remainder,
    while the main depth stream selects the pre-fire/span parameters.
    No in-kernel chain state is needed — both slot streams are exact
    per (row, column) with per-lane values inside the planes.
    """
    prepare = sdef["prepare"]
    propagate = sdef["propagate"]
    n_states = sdef["n_states"]
    dose_state = sdef["dose_state"]
    remap = sdef["remap"]
    has_outeq = n_out > 1

    def kernel(*refs):
        it = iter(refs)
        dts = next(it)[:, :]
        bols = next(it)[:, :]
        rates = next(it)[:, :] if has_inf else None
        masks = next(it)[:, :]
        vals = next(it)[:, :]
        sigs = next(it)[:, :]
        censs = next(it)[:, :] if has_cens else None
        outeqs = next(it)[:, :] if has_outeq else None
        mults = next(it)[:, :] if mult_mode == "row" else None
        offs = next(it)[:, :] if mult_mode == "row" and has_offsets else None
        seg_mults = (
            [next(it)[:, :] for _ in range(n_param_rows)]
            if mult_mode == "segment" else None
        )
        seg_offs = (
            [next(it)[:, :] for _ in range(n_param_rows)]
            if mult_mode == "segment" and has_offsets else None
        )
        depths = evcodes = postdepths = None
        if mult_mode in ("levels", "planes"):
            if lag_depth:
                evcodes = next(it)[:, :]
            else:
                depths = next(it)[:, :]
                if lag_post:
                    postdepths = next(it)[:, :]
        initm = next(it)[:, :] if has_init else None
        lag_planes = ([next(it)[:, :] for _ in range(max(n_lag_planes, 1))]
                      if has_lag else None)
        fa_planes = ([next(it)[:, :] for _ in range(max(n_fa_planes, 1))]
                     if has_fa else None)
        if mult_mode in ("levels", "planes"):
            level_params = [
                [next(it)[:, :] for _ in range(n_param_rows)]
                for _ in range(n_levels)
            ]
            params = level_params[0]  # layout reference only
        else:
            params = [next(it)[:, :] for _ in range(n_param_rows)]
        coefs = [[next(it)[:, :] for _ in range(n_states)] for _ in range(n_out)]
        biases = [next(it)[:, :] for _ in range(n_out)] if has_bias else None
        init_srows = ([next(it)[:, :] for _ in range(n_states)]
                      if has_init else None)
        out_ref = next(it)

        if mult_mode == "row":
            mlane = jax.lax.broadcasted_iota(jnp.int32, mults.shape, 1)
            eff = []
            for i in range(n_param_rows):
                sel_i = (mlane == np.int32(i)).astype(mults.dtype)
                m_i = jnp.sum(mults * sel_i, axis=1, keepdims=True)  # [rows, 1]
                e_i = params[i] * m_i  # [rows, sp_block]
                if has_offsets:
                    e_i = e_i + jnp.sum(offs * sel_i, axis=1, keepdims=True)
                eff.append(e_i)
            aux = prepare(remap(eff) if remap else eff)
        elif mult_mode in ("segment", "levels", "planes"):
            aux = None  # rebuilt per segment from the streams
        else:
            aux = prepare(params)
        shape = (out_ref.shape[0], out_ref.shape[1])
        zeros = jnp.zeros(shape, dtype=out_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)
        if has_init:
            # per-row occasion-0 flag rides lane 0 of the initm stream;
            # initial state = flag * init(p) per support (engine/sim.py:147)
            l0 = (lane == 0).astype(zeros.dtype)
            im0 = jnp.sum(initm * l0, axis=1, keepdims=True)  # [rows, 1]
            xs = [im0 * init_srows[s] + zeros for s in range(n_states)]
        else:
            xs = [zeros] * n_states
        ll = zeros
        pend_amt = zeros if has_lag else None
        pend_rem = zeros if has_lag else None
        if lag_depth:
            # in-kernel seq chain state: dc = applied depth of the ongoing
            # engine segment, app = 1 once that segment's seq application
            # has happened (both per-LANE: fires are per-(row, support))
            dc = zeros
            app = zeros
            # post-fire parameters: the fire is a real bolus event, so the
            # remainder of its segment runs at chain depth 1
            aux_fire = prepare([level_params[0][i]
                                for i in range(n_param_rows)])

        for m in range(n_seg):
            sel = (lane == np.int32(m)).astype(dts.dtype)

            def col(a):
                return jnp.sum(a * sel, axis=1, keepdims=True)  # [rows, 1]

            dt = col(dts)
            bol = col(bols)
            mask = col(masks)
            val = col(vals)
            sig = col(sigs) + (1.0 - mask)  # padded sigma lanes were zeroed

            # observation before dose: y_k = C_k . x (+ b_k)
            def pred_out(k):
                p = coefs[k][0] * xs[0]
                for i in range(1, n_states):
                    p = p + coefs[k][i] * xs[i]
                if has_bias:
                    p = p + biases[k]
                return p

            if n_out == 1:
                pred = pred_out(0)
            else:
                oe = col(outeqs)
                pred = jnp.zeros_like(ll)
                for k in range(n_out):
                    pred = pred + (oe == float(k)).astype(ll.dtype) * pred_out(k)

            s_c = col(censs) if has_cens else None
            ll = ll + _obs_ll(val, pred, sig, mask, s_c, has_cens)

            # plane selection: slot tables pick the per-dose-segment plane
            # (slot -1 = no dose lands at this column on any row, so the
            # arrival code is statically skipped); without slots the single
            # per-(row, support) plane applies to every dose
            fap_m = None
            if has_fa:
                fap_m = (fa_planes[0] if fa_slots is None
                         else (None if fa_slots[m] < 0
                               else fa_planes[fa_slots[m]]))
            lagp_m = None
            if has_lag:
                lagp_m = (lag_planes[0] if lag_slots is None
                          else (None if lag_slots[m] < 0
                                else lag_planes[lag_slots[m]]))
            bol_eff = bol * fap_m if fap_m is not None else bol
            if has_lag:
                if lagp_m is not None:
                    has_new = bol != 0.0
                    pend_amt = jnp.where(has_new, bol_eff, pend_amt)
                    pend_rem = jnp.where(has_new, lagp_m, pend_rem)
            else:
                xs[dose_state] = xs[dose_state] + bol_eff
            rate = col(rates) if has_inf else None
            if mult_mode == "segment":
                eff = [params[i] * col(seg_mults[i]) for i in range(n_param_rows)]
                if has_offsets:
                    eff = [e + col(seg_offs[i]) for i, e in enumerate(eff)]
                aux_m = prepare(remap(eff) if remap else eff)
            elif mult_mode in ("levels", "planes"):
                if lag_depth:
                    # replay the engine's reset/carry recurrence on the
                    # event codes (1 = obs/inf-start boundary: reset;
                    # 2 = infusion-end sub-split: compound; 0 = phantom
                    # bolus split / dead): the engine segment continues
                    # through phantom columns, applying seq at most once
                    code = col(evcodes)
                    span = (dt > 0.0).astype(dt.dtype)
                    is_ev = code == 1.0
                    is_ie = code == 2.0
                    dc = jnp.where(
                        is_ev, span + jnp.zeros_like(dc),
                        jnp.where(is_ie, dc + span,
                                  dc + span * (1.0 - app)),
                    )
                    app = jnp.where(is_ev | is_ie,
                                    span + jnp.zeros_like(app),
                                    jnp.maximum(app, span))
                    d = dc  # [rows, sp]
                else:
                    d = col(depths)  # [rows, 1]

                def _level_select(dsel):
                    eff_s = []
                    for i in range(n_param_rows):
                        e_i = (dsel == 1.0).astype(dsel.dtype) \
                            * level_params[0][i]
                        for l in range(1, n_levels):
                            e_i = e_i + (dsel == float(l + 1)).astype(
                                dsel.dtype) * level_params[l][i]
                        eff_s.append(e_i)  # [rows, sp_block]
                    return eff_s

                eff = _level_select(d)
                aux_m = prepare(eff)  # levels are pre-remapped host-side
                if lag_post:
                    # post-fire parameters for this column's split march
                    aux_fire_m = prepare(_level_select(col(postdepths)))
            else:
                aux_m = aux
            live = dt > 0.0
            if lag_depth or lag_post:
                # TRUE split march: the fire is a seq-reset event, so
                # superposition does not hold across it — propagate to the
                # fire offset at the pre-fire parameters, apply the dose,
                # then run the remainder at the post-fire parameters
                # (lag_depth: chain depth 1 / aux_fire; lag_post: this
                # column's host-computed post plane / aux_fire_m). Infusion
                # forcing rides both halves (rate is segment-constant).
                fire = ((pend_amt != 0.0) & (pend_rem < dt)
                        if has_lag else None)
                dt1 = jnp.where(fire, pend_rem, dt) if has_lag else dt
                live1 = dt1 > 0.0
                nxs = propagate(aux_m, xs, dt1, rate)
                xs = [jnp.where(live1, nx, x) for nx, x in zip(nxs, xs)]
                if has_lag:
                    xs[dose_state] = xs[dose_state] + jnp.where(
                        fire, pend_amt, zeros
                    )
                    dt2 = jnp.where(fire, dt - pend_rem, zeros)
                    live2 = dt2 > 0.0
                    nxs2 = propagate(
                        aux_fire_m if lag_post else aux_fire, xs, dt2, rate
                    )
                    xs = [jnp.where(live2, nx, x)
                          for nx, x in zip(nxs2, xs)]
                    if lag_depth:
                        dc = jnp.where(fire, jnp.ones_like(dc), dc)
                        app = jnp.where(fire, jnp.ones_like(app), app)
                    pend_amt = jnp.where(fire, zeros, pend_amt)
                    pend_rem = jnp.where(
                        fire, zeros,
                        jnp.where(live, jnp.maximum(pend_rem - dt, 0.0),
                                  pend_rem),
                    )
            else:
                nxs = propagate(aux_m, xs, dt, rate)
                xs = [jnp.where(live, nx, x) for nx, x in zip(nxs, xs)]
            if has_lag and not (lag_depth or lag_post):
                # the pending dose materializes once its remaining lag
                # elapses within this segment: homogeneous propagation over
                # the residual span dt - rem (superposition; infusion
                # forcing is already in the main propagate above)
                fire = (pend_amt != 0.0) & (pend_rem < dt)
                dose_xs = [
                    pend_amt if s == dose_state else zeros
                    for s in range(n_states)
                ]
                contrib = propagate(
                    aux_m, dose_xs, jnp.maximum(dt - pend_rem, 0.0), None
                )
                xs = [
                    jnp.where(fire, x + c, x) for x, c in zip(xs, contrib)
                ]
                pend_amt = jnp.where(fire, zeros, pend_amt)
                pend_rem = jnp.where(
                    fire, zeros,
                    jnp.where(live, jnp.maximum(pend_rem - dt, 0.0), pend_rem),
                )

        out_ref[:, :] = ll

    return kernel


def _pad_lanes(a, width: int):
    pad = width - a.shape[1]
    if pad <= 0:
        return a
    return jnp.concatenate([a, jnp.zeros((a.shape[0], pad), dtype=a.dtype)], axis=1)


def _static_any(a):
    if a is None:
        return False
    try:  # concrete host arrays: compile the feature out when all-zero
        return bool(np.any(np.asarray(a)))
    except Exception:
        return True  # traced value: keep the general path


def psi_oral(
    seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma, obs_cens,
    support,
    structure: str = "two_compartments_with_absorption",
    interpret: Optional[bool] = None,
    obs_outeq=None,
    out_coef=None,
    out_bias=None,
    param_mult=None,
    param_mult_seg=None,
    param_offset=None,
    param_offset_seg=None,
    param_levels=None,
    param_planes=None,
    seg_depth=None,
    seg_evcode=None,
    seg_postdepth=None,
    lag_plane=None,
    fa_plane=None,
    lag_slots=None,
    fa_slots=None,
    init_rows=None,
    init_planes=None,
    init_mask=None,
):
    """Fused psi for the closed-form analytical structures.

    Arguments are per-subject segment streams [R, M] (sorted breakpoints,
    observation-before-bolus semantics baked in; ``seg_rateiv`` is the
    infusion rate into central active during each segment, or None;
    ``obs_cens`` is the per-segment censoring sign, +1 BLOQ / -1 ALOQ / 0,
    or None) and the support matrix ``[S, n_cols]`` whose leading columns are
    the structure's parameterization (micro constants, or CL params for the
    ``*_cl*`` structures — remapped in XLA exactly as *_cl_models.rs).

    Output equations: ``out_coef`` [n_out, n_states, S] (and optional
    ``out_bias`` [n_out, S]) give each output as a linear function of the
    state per support point; ``obs_outeq`` [R, M] selects the outeq per
    observation segment (required when n_out > 1). When ``out_coef`` is None
    the classic convention applies: one extra support column (v, last) and
    the single output is central/v.

    ``lag_plane`` / ``fa_plane`` [R, S] carry per-(row, support) bolus lag
    shifts / bioavailability scales (structs.rs:611-666); boluses with lag
    ride the kernel's pending-dose mechanism (see _make_kernel). The
    caller must guarantee no two doses of a row are pending simultaneously
    (max lag < the row's minimum inter-bolus gap). With ``lag_slots`` /
    ``fa_slots`` (static [M] tuples of plane indices, -1 = no dose at that
    column) the argument is instead a SEQUENCE of [R, S] planes selected
    per dose segment — the exact path for time-dependent closures and
    closures that read a time-varying covariate.

    ``param_mult`` [R, n_params] carries per-row multiplicative covariate
    effects on the RAW support columns (the seq-eq decomposition built by
    likelihood/matrix._PallasPsiPlan); requires a structure without XLA-side
    eigen preparation (1/2-cmt families). ``param_mult_seg``
    [R, n_params, M] carries per-SEGMENT multipliers instead (time-varying
    covariates / seq compounding across infusion-end sub-splits); mutually
    exclusive with ``param_mult``. ``param_offset`` / ``param_offset_seg``
    extend either mode to the affine form ``p * g + h`` (additive
    covariate effects); same shapes as their multiplier counterparts.

    ``param_levels`` [L, n_base, S] + ``seg_depth`` [R, M]: the seq
    chain-depth scheme for covariate-free time-independent seq equations
    of any form (see _make_kernel). Level rows must already be in the
    structure's MICRO-CONSTANT parameterization (remap applied host-side);
    eigen extras for 3-cmt structures are prepared here per level. Depth
    values are 1-based level indices (0 on dead segments).

    ``seg_evcode`` [R, M] replaces ``seg_depth`` when an active lag
    coexists with seq chain depth > 1: per-column event codes
    (1 = obs/inf-start reset, 2 = inf-end compound, 0 = phantom bolus /
    dead) drive an in-kernel depth counter that resets at each per-lane
    dose fire (see _make_kernel ``lag_depth``). Requires lag_plane.

    ``param_planes`` [L, n_base, R, S] + ``seg_depth``: the per-(row,
    support) generalization of ``param_levels`` for COVARIATE-dependent
    time-independent seq equations of any form (true parameter x covariate
    mixing included) over time-constant covariates: each level carries one
    full micro-constant parameter plane per (row, support) cell, exact by
    construction (the seq chain is iterated host-side with each row's own
    covariate values). Eigen extras for 3-cmt structures are prepared here
    per level on the planes; in-kernel the planes ride as
    [row_block, sp_block] tiles selected per segment by the depth stream.

    ``init_rows`` [n_states, S] + ``init_mask`` [R, M]: initial state per
    support point from a (covariate-independent) init equation, applied on
    rows whose lane-0 init_mask flag is 1 (occasion-0 rows only,
    engine/sim.py:147, analytical/mod.rs:408-426); all other rows start
    at zero. ``init_planes`` [n_states, R, S] instead when the init
    equation reads covariates (exact per-(row, support) values; mutually
    exclusive with ``init_rows``).

    Returns psi [R, S]. R must be a multiple of SUB_TILE and S a multiple of
    SP_TILE (pad rows with dt=0/mask=0 and supports by repetition; pad
    param_mult rows with ones).
    """
    from jax.experimental import pallas as pl

    if structure not in STRUCTURES:
        raise ValueError(
            f"unknown pallas psi structure `{structure}` "
            f"(available: {', '.join(sorted(STRUCTURES))})"
        )
    sdef = STRUCTURES[structure]
    n_params = sdef["n_params"]
    n_states = sdef["n_states"]
    R, M = seg_dt.shape
    S = support.shape[0]
    if out_coef is None:
        if support.shape[1] != n_params + 1:
            raise ValueError(
                f"{structure} needs {n_params} support columns plus v (last)"
            )
    elif support.shape[1] < n_params:
        raise ValueError(f"{structure} needs >= {n_params} support columns")
    if R % SUB_TILE or S % SP_TILE:
        raise ValueError(
            f"R ({R}) must be a multiple of {SUB_TILE} and S ({S}) of {SP_TILE}"
        )
    if M > SEG_PAD:
        raise ValueError(f"segment stream too long ({M} > {SEG_PAD})")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dtype = seg_dt.dtype
    if not interpret and dtype != jnp.float32:
        raise ValueError(
            f"compiled pallas psi kernels are float32-only (got {dtype}); "
            "cast the streams/support to float32 or pass interpret=True"
        )

    has_inf = _static_any(seg_rateiv)
    has_cens = _static_any(obs_cens)
    zeros_rm = jnp.zeros_like(jnp.asarray(seg_dt, dtype))
    if seg_rateiv is None:
        seg_rateiv = zeros_rm
    if obs_cens is None:
        obs_cens = zeros_rm
    # output coefficient rows
    sp = jnp.asarray(support, dtype)
    if out_coef is None:
        n_out = 1
        v = sp[:, n_params].reshape(1, S)
        coef_rows = [
            (1.0 / v) if i == sdef["central"] else jnp.zeros_like(v)
            for i in range(n_states)
        ]
        has_bias = False
        bias_rows = []
    else:
        out_coef = jnp.asarray(out_coef, dtype)
        n_out = out_coef.shape[0]
        if out_coef.shape != (n_out, n_states, S):
            raise ValueError(
                f"out_coef must be [n_out, {n_states}, {S}], got {out_coef.shape}"
            )
        coef_rows = [
            out_coef[k, i].reshape(1, S)
            for k in range(n_out) for i in range(n_states)
        ]
        has_bias = _static_any(out_bias)
        bias_rows = (
            [jnp.asarray(out_bias, dtype)[k].reshape(1, S) for k in range(n_out)]
            if has_bias else []
        )
    has_outeq = n_out > 1
    if has_outeq and obs_outeq is None:
        raise ValueError("obs_outeq stream required for multi-output psi")
    if obs_outeq is None:
        obs_outeq = zeros_rm

    full = [
        _pad_lanes(jnp.asarray(a, dtype), SEG_PAD)
        for a in (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value,
                  obs_sigma, obs_cens, obs_outeq)
    ]
    # zero out sigma where masked; the kernel re-adds 1.0 on masked lanes so
    # log() stays finite
    full[5] = full[5] * full[3]
    n_modes = sum(x is not None for x in (param_mult, param_mult_seg,
                                          param_levels, param_planes))
    if n_modes > 1:
        raise ValueError(
            "param_mult, param_mult_seg, param_levels and param_planes are "
            "mutually exclusive"
        )
    mult_mode = ("row" if param_mult is not None
                 else "segment" if param_mult_seg is not None
                 else "levels" if param_levels is not None
                 else "planes" if param_planes is not None else None)
    if mult_mode in ("row", "segment") and sdef["prep_xla"] is not None:
        raise ValueError(
            f"param multipliers are not supported for `{structure}` (its "
            "eigen preparation runs in XLA per support point, not per row; "
            "covariate-free seq models ride param_levels instead)"
        )
    has_offsets = False
    n_levels = 0
    if mult_mode == "row":
        pm = jnp.asarray(param_mult, dtype)
        if pm.shape != (R, n_params):
            raise ValueError(
                f"param_mult must be [{R}, {n_params}], got {pm.shape}"
            )
        full.append(_pad_lanes(pm, SEG_PAD))
        has_offsets = _static_any(param_offset)
        if has_offsets:
            po = jnp.asarray(param_offset, dtype)
            if po.shape != (R, n_params):
                raise ValueError(
                    f"param_offset must be [{R}, {n_params}], got {po.shape}"
                )
            full.append(_pad_lanes(po, SEG_PAD))
    elif mult_mode == "segment":
        pms = jnp.asarray(param_mult_seg, dtype)
        if pms.shape != (R, n_params, M):
            raise ValueError(
                f"param_mult_seg must be [{R}, {n_params}, {M}], got {pms.shape}"
            )
        for i in range(n_params):
            full.append(_pad_lanes(pms[:, i, :], SEG_PAD))
        has_offsets = _static_any(param_offset_seg)
        if has_offsets:
            pos = jnp.asarray(param_offset_seg, dtype)
            if pos.shape != (R, n_params, M):
                raise ValueError(
                    f"param_offset_seg must be [{R}, {n_params}, {M}], "
                    f"got {pos.shape}"
                )
            for i in range(n_params):
                full.append(_pad_lanes(pos[:, i, :], SEG_PAD))
    elif mult_mode in ("levels", "planes"):
        if (seg_depth is None) == (seg_evcode is None):
            raise ValueError(
                "param_levels/param_planes require exactly one of the "
                "seg_depth or seg_evcode streams"
            )
        sd = jnp.asarray(
            seg_depth if seg_depth is not None else seg_evcode, dtype
        )
        if sd.shape != (R, M):
            raise ValueError(
                f"seg_depth/seg_evcode must be [{R}, {M}], got {sd.shape}"
            )
        full.append(_pad_lanes(sd, SEG_PAD))
        if seg_postdepth is not None:
            if (mult_mode != "planes" or seg_depth is None
                    or lag_plane is None):
                raise ValueError(
                    "seg_postdepth (lag + tv-seq column planes) requires "
                    "param_planes, seg_depth and a lag_plane"
                )
            sp_d = jnp.asarray(seg_postdepth, dtype)
            if sp_d.shape != (R, M):
                raise ValueError(
                    f"seg_postdepth must be [{R}, {M}], got {sp_d.shape}"
                )
            full.append(_pad_lanes(sp_d, SEG_PAD))
    elif seg_postdepth is not None:
        raise ValueError("seg_postdepth requires the planes mult mode")
    if seg_evcode is not None and (
            mult_mode not in ("levels", "planes") or lag_plane is None):
        raise ValueError(
            "seg_evcode (lag + seq depth > 1) requires param_levels/"
            "param_planes and a lag_plane"
        )
    # init equation: per-support initial-state rows gated by the per-row
    # occasion-0 flag (lane 0 of the init_mask stream)
    if init_rows is not None and init_planes is not None:
        raise ValueError("pass init_rows OR init_planes, not both")
    has_init = init_rows is not None or init_planes is not None
    if has_init:
        if init_mask is None:
            raise ValueError("init_rows requires the init_mask stream")
        im = jnp.asarray(init_mask, dtype)
        if im.shape != (R, M):
            raise ValueError(f"init_mask must be [{R}, {M}], got {im.shape}")
        full.append(_pad_lanes(im, SEG_PAD))
    # base parameter rows: with per-row multipliers the CL remap moves into
    # the kernel (it must act on the effective per-row params); otherwise
    # remap CL columns and XLA-prepare eigen extras here
    raw_rows = [sp[:, i].reshape(1, S) for i in range(n_params)]
    level_plane_list = []
    if mult_mode == "levels":
        lv = jnp.asarray(param_levels, dtype)
        n_levels = lv.shape[0]
        n_base_l = lv.shape[1]
        level_rows_all = []
        rows_l = None
        for l in range(n_levels):
            rows_l = [lv[l, i].reshape(1, S) for i in range(n_base_l)]
            if sdef["prep_xla"] is not None:
                rows_l = rows_l + [
                    jnp.asarray(r, dtype) for r in sdef["prep_xla"](rows_l)
                ]
            level_rows_all.extend(rows_l)
        base_rows = rows_l  # per-level layout; sets the kernel's row count
        p_rows = level_rows_all + coef_rows + bias_rows
    elif mult_mode == "planes":
        pp = jnp.asarray(param_planes, dtype)
        n_levels = pp.shape[0]
        if pp.ndim != 4 or pp.shape[2:] != (R, S):
            raise ValueError(
                f"param_planes must be [L, n_base, {R}, {S}], got {pp.shape}"
            )
        planes_l = None
        for l in range(n_levels):
            planes_l = [pp[l, i] for i in range(pp.shape[1])]
            if sdef["prep_xla"] is not None:
                planes_l = planes_l + [
                    jnp.asarray(r, dtype)
                    for r in sdef["prep_xla"](planes_l)
                ]
            level_plane_list.extend(planes_l)
        base_rows = planes_l  # per-level layout; sets the kernel's row count
        p_rows = coef_rows + bias_rows
    elif mult_mode is not None:
        base_rows = raw_rows
        p_rows = base_rows + coef_rows + bias_rows
    else:
        base_rows = sdef["remap"](raw_rows) if sdef["remap"] else raw_rows
        if sdef["prep_xla"] is not None:
            base_rows = base_rows + [
                jnp.asarray(r, dtype) for r in sdef["prep_xla"](base_rows)
            ]
        p_rows = base_rows + coef_rows + bias_rows
    init_plane_list = []
    if has_init and init_planes is None:
        ir = jnp.asarray(init_rows, dtype)
        if ir.shape != (n_states, S):
            raise ValueError(
                f"init_rows must be [{n_states}, {S}], got {ir.shape}"
            )
        p_rows = p_rows + [ir[s].reshape(1, S) for s in range(n_states)]
    elif has_init:
        # covariate-dependent init: per-(row, support) planes ride as
        # trailing tile-spec inputs in the same kernel slots (the gating
        # expression broadcasts [rows, sp] exactly like [1, sp] rows)
        ip = jnp.asarray(init_planes, dtype)
        if ip.shape != (n_states, R, S):
            raise ValueError(
                f"init_planes must be [{n_states}, {R}, {S}], got {ip.shape}"
            )
        init_plane_list = [ip[s] for s in range(n_states)]

    def _norm_planes(p, slots, pname):
        if p is None:
            return None
        lst = list(p) if isinstance(p, (list, tuple)) else [p]
        if slots is not None:
            slots_t = tuple(int(x) for x in slots)
            if len(slots_t) != M:
                raise ValueError(
                    f"{pname} slots must have length {M}, got {len(slots_t)}"
                )
            if max(slots_t) + 1 != len(lst):
                raise ValueError(
                    f"{pname} carries {len(lst)} planes, slots expect "
                    f"{max(slots_t) + 1}"
                )
        elif len(lst) != 1:
            raise ValueError(f"{pname} without slots must be one plane")
        out = []
        for arr in lst:
            pa = jnp.asarray(arr, dtype)
            if pa.shape != (R, S):
                raise ValueError(
                    f"{pname} must be [{R}, {S}], got {pa.shape}"
                )
            out.append(pa)
        return out

    if lag_slots is not None:
        lag_slots = tuple(int(x) for x in lag_slots)
    if fa_slots is not None:
        fa_slots = tuple(int(x) for x in fa_slots)
    lag_list = _norm_planes(lag_plane, lag_slots, "lag_plane")
    fa_present = fa_plane is not None and (
        isinstance(fa_plane, (list, tuple)) or _static_any(fa_plane)
    )
    fa_list = _norm_planes(fa_plane, fa_slots, "fa_plane") if fa_present \
        else None
    has_lag = lag_list is not None
    has_fa = fa_list is not None
    planes = (lag_list or []) + (fa_list or [])

    kernel = _make_kernel(
        sdef, n_seg=M, has_inf=has_inf, has_cens=has_cens, n_out=n_out,
        has_bias=has_bias, n_param_rows=len(base_rows), mult_mode=mult_mode,
        has_lag=has_lag, has_fa=has_fa, n_levels=n_levels,
        has_offsets=has_offsets, has_init=has_init,
        n_lag_planes=len(lag_list) if has_lag else 0,
        n_fa_planes=len(fa_list) if has_fa else 0,
        lag_slots=lag_slots, fa_slots=fa_slots,
        lag_depth=seg_evcode is not None,
        lag_post=seg_postdepth is not None,
    )
    # all-zero optional streams are dropped from the pipeline entirely
    # (no DMA, no VMEM block); the kernel never reads those refs
    include = ([True, True, has_inf, True, True, True, has_cens, has_outeq]
               + [True] * (len(full) - 8))
    streams = [a for a, inc in zip(full, include) if inc]
    n_streams = len(streams)

    row_block = next(b for b in ROW_BLOCKS if R % b == 0)
    sp_block = next(b for b in SP_BLOCKS if S % b == 0)
    # per-row effective params make prepare()'s aux [rows, sp] instead of
    # [1, sp]; shrink the tile budget to keep those intermediates in VMEM
    budget = TILE_BUDGET // 4 if mult_mode is not None else TILE_BUDGET
    if has_lag:  # pending-dose lanes + a second propagate's intermediates
        budget = min(budget, TILE_BUDGET // 4)
    if seg_evcode is not None:  # split-march second propagate + dc/app tiles
        budget = min(budget, TILE_BUDGET // 8)
    if len(planes) > 2:  # per-dose-segment plane tiles live in VMEM
        budget = min(budget, TILE_BUDGET // max(4, len(planes)))
    if level_plane_list:  # L x n_rows extra [rb, sb] tiles live in VMEM
        budget = min(budget, TILE_BUDGET // max(4, len(level_plane_list)))
    while row_block * sp_block > budget and row_block > 8:
        row_block //= 2
    row_spec = pl.BlockSpec((row_block, SEG_PAD), lambda i, j: (i, 0))
    p_spec = pl.BlockSpec((1, sp_block), lambda i, j: (0, j))
    tile_spec = pl.BlockSpec((row_block, sp_block), lambda i, j: (i, j))

    def call():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, S), dtype),
            grid=(R // row_block, S // sp_block),
            in_specs=([row_spec] * n_streams + [tile_spec] * len(planes)
                      + [tile_spec] * len(level_plane_list)
                      + [p_spec] * len(p_rows)
                      + [tile_spec] * len(init_plane_list)),
            out_specs=tile_spec,
            interpret=interpret,
        )(*streams, *planes, *level_plane_list, *p_rows, *init_plane_list)

    if dtype == jnp.float32:
        # Trace with x64 disabled: under jax_enable_x64 the grid pipeline
        # picks up an i64 scalar that this environment's Mosaic toolchain
        # cannot legalize ("func.return (i32, i64)"). All operands are
        # explicitly 32-bit, so disabling x64 changes nothing else.
        with jax.enable_x64(False):
            return call()
    return call()


class _CheckedParams:
    """Bounds-checking support-row proxy for output-coefficient extraction.

    JAX clamps out-of-bounds gather indices silently, so an out closure
    reading a support column that doesn't exist would produce wrong values
    instead of an error. This proxy raises IndexError for static integer
    indices past the row width; everything else delegates to the array.
    """

    def __init__(self, p):
        self._p = p

    def __getitem__(self, idx):
        n = self._p.shape[0]
        if isinstance(idx, (int, np.integer)):
            if not (-n <= idx < n):
                raise IndexError(
                    f"support column {idx} out of range ({n} support columns)"
                )
        return self._p[idx]

    def __len__(self):
        return self._p.shape[0]

    def __iter__(self):
        return iter(self._p)

    def __getattr__(self, name):
        return getattr(self._p, name)


def extract_linear_out(out_fn, support, n_states: int, n_out: int, cov,
                       dtype, ts=(0.0, 17.31)):
    """Extract per-support linear output coefficients from an out closure.

    Evaluates ``out_fn(e_i, p, t, cov)`` on the state basis per support row
    (vmapped — support-only work) to recover ``y = C(p) x + b(p)``; verifies
    linearity on a fixed pseudo-random state and time-invariance at a second
    t. Returns (C [S, n_out, n_states], b [S, n_out]) as numpy, or raises
    ValueError when the output is not linear/time-invariant (callers fall
    back to the general engine or surface the error).
    """
    support = jnp.asarray(support, dtype)

    def eval_all(t):
        def one(p):
            pc = _CheckedParams(p)
            zero = jnp.asarray(
                out_fn(jnp.zeros(n_states, dtype), pc, t, cov), dtype
            ).reshape(n_out)
            cols = []
            for i in range(n_states):
                e = jnp.zeros(n_states, dtype).at[i].set(1.0)
                cols.append(
                    jnp.asarray(out_fn(e, pc, t, cov), dtype).reshape(n_out) - zero
                )
            return jnp.stack(cols, axis=1), zero  # [n_out, n_states], [n_out]

        return jax.vmap(one)(support)

    C, b = eval_all(ts[0])
    C2, b2 = eval_all(ts[1])
    Cn, bn = np.asarray(C, np.float64), np.asarray(b, np.float64)
    scale = np.maximum(np.abs(Cn).max(), 1e-12)
    if (np.abs(np.asarray(C2, np.float64) - Cn).max() > 1e-5 * scale
            or np.abs(np.asarray(b2, np.float64) - bn).max() > 1e-5 * scale):
        raise ValueError("output equation depends on t")
    # linearity probe at a fixed non-trivial state
    x_probe = jnp.asarray(
        1.0 + np.linspace(0.3, 1.7, n_states), dtype
    )
    direct = np.asarray(
        jax.vmap(lambda p: jnp.asarray(
            out_fn(x_probe, p, ts[0], cov), dtype).reshape(n_out))(support),
        np.float64,
    )
    lin = np.einsum("ski,i->sk", Cn, np.asarray(x_probe, np.float64)) + bn
    denom = np.maximum(np.abs(direct).max(), 1e-12)
    if np.abs(direct - lin).max() > 1e-4 * denom:
        raise ValueError("output equation is not linear in the state")
    return Cn, bn


def segment_stream_from_schedule(obs_times, obs_values, obs_sigmas, dose: float):
    """Build the [M] segment stream for one bolus-at-0 oral schedule.

    Breakpoints: bolus@0 then each observation; segment m spans to the next
    breakpoint. Returns (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value,
    obs_sigma, obs_cens) each [M] with M = n_obs + 1.
    """
    obs_times = np.asarray(obs_times, dtype=np.float64)
    n = obs_times.shape[0]
    times = np.concatenate([[0.0], obs_times])
    seg_dt = np.concatenate([np.diff(times), [0.0]])
    seg_bolus = np.zeros(n + 1)
    seg_bolus[0] = dose
    seg_rateiv = np.zeros(n + 1)
    obs_mask = np.concatenate([[0.0], np.ones(n)])
    obs_value = np.concatenate([[0.0], np.asarray(obs_values, dtype=np.float64)])
    obs_sigma = np.concatenate([[1.0], np.asarray(obs_sigmas, dtype=np.float64)])
    obs_cens = np.zeros(n + 1)
    return seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma, obs_cens


def psi_2cmt_oral(seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
                  obs_cens, support, interpret: Optional[bool] = None):
    """Back-compat alias for the 2-cmt oral structure."""
    return psi_oral(seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
                    obs_cens, support,
                    structure="two_compartments_with_absorption",
                    interpret=interpret)


def segment_schedule(rows, with_ranks: bool = False):
    """Host-side replica of the engine's breakpoint sort (grid.build_segments).

    Valid because the pallas path rejects lag/fa (the only
    parameter-dependent time shifts). Returns ``(order, t_sorted, seg_dt,
    is_event)`` each [R, M]: the lexsort permutation, sorted breakpoint
    times, segment spans, and the engine's seq-reset flag (real events reset
    seq parameters; infusion-end sub-splits carry them —
    grid.build_segments is_event = rank >= RANK_OBSERVATION).
    ``with_ranks=True`` appends ``rank_sorted`` [R, M] (engine ranks:
    inf-end 0, obs 1, bolus 2, inf-start 3) — the lag+seq-depth path needs
    to tell bolus columns (whose event moves with the lag) apart from
    obs/infusion boundaries (which stay put).
    """
    from ..config import BIG_TIME

    bolus_t = np.asarray(rows.bolus_t, dtype=np.float64)
    inf_t = np.asarray(rows.inf_t, dtype=np.float64)
    obs_t = np.asarray(rows.obs_t, dtype=np.float64)
    inf_dur = np.asarray(rows.inf_dur, dtype=np.float64)
    inf_end = np.where(inf_t < BIG_TIME / 2, inf_t + inf_dur, inf_t)
    # breakpoints: [obs..., bolus..., inf-start..., inf-end...]; sort by
    # (time, rank) with engine ranks inf-end 0 < obs 1 < bolus 2 < inf-start 3
    times = np.concatenate([obs_t, bolus_t, inf_t, inf_end], axis=1)
    ranks = np.concatenate(
        [
            np.ones_like(obs_t),
            2.0 * np.ones_like(bolus_t),
            3.0 * np.ones_like(inf_t),
            np.zeros_like(inf_end),
        ],
        axis=1,
    )
    order = np.lexsort((ranks, times), axis=1)
    t_sorted = np.take_along_axis(times, order, axis=1)
    rank_sorted = np.take_along_axis(ranks, order, axis=1)
    t_next = np.concatenate([t_sorted[:, 1:], t_sorted[:, -1:]], axis=1)
    live = t_next < BIG_TIME / 2
    seg_dt = np.where(live, np.maximum(t_next - t_sorted, 0.0), 0.0)
    if with_ranks:
        return order, t_sorted, seg_dt, rank_sorted >= 1.0, rank_sorted
    return order, t_sorted, seg_dt, rank_sorted >= 1.0


def streams_from_grid(rows, lowered_em, inputs: Optional[int] = None):
    """Convert stacked OccasionArrays rows into kernel segment streams.

    ``inputs=None`` (the analytical tier): doses must target input 0 and
    ``seg_bolus`` / ``seg_rateiv`` are [R, M]. ``inputs=k`` (the ODE
    tier's multi-input mode): doses may target any input < k and the two
    dose streams come back stacked per input as [R, M, k].

    Requirements of the fused kernel's model shape: a single bolus route into
    the structure's dose compartment (depot for *_with_absorption, central
    for IV structures), infusions into central only, outputs linear in the
    state, no covariates/lag/fa/seq, additive or proportional assay error.
    BLOQ/ALOQ-censored observations contribute log CDF/CCDF terms.
    Multi-dose schedules like the reference's "Repeat" workload
    (benches/common/mod.rs:7) and mixed bolus+infusion regimens are
    supported; the per-segment infusion rate uses the same midpoint
    containment as the general engine (grid.build_segments). Observation
    sigmas use each observation's own outeq error model
    (loglik.observation_sigmas parity), so multi-output models work.

    Returns (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
    obs_cens, obs_outeq), each [R, M].
    """
    from ..config import BIG_TIME

    bolus_t = np.asarray(rows.bolus_t, dtype=np.float64)
    inf_t = np.asarray(rows.inf_t, dtype=np.float64)
    valid_rows = np.asarray(rows.obs_valid) & np.asarray(rows.obs_has_value)
    real_bolus = bolus_t < BIG_TIME / 2
    bolus_input = np.asarray(rows.bolus_input)
    if inputs is None and np.any(bolus_input[real_bolus] != 0):
        raise ValueError(
            "pallas psi fast path supports boluses into input 0 (the "
            "structure's dose compartment) only"
        )
    if inputs is not None and np.any(bolus_input[real_bolus] >= inputs):
        raise ValueError(
            f"bolus targets input >= ninput ({inputs})"
        )
    NI = inf_t.shape[1]
    if NI:
        real_inf = inf_t < BIG_TIME / 2
        inf_input = np.asarray(rows.inf_input)
        if inputs is None and np.any(inf_input[real_inf] != 0):
            raise ValueError(
                "pallas psi fast path supports infusions into input 0 (central) only"
            )
        if inputs is not None and np.any(inf_input[real_inf] >= inputs):
            raise ValueError(
                f"infusion targets input >= ninput ({inputs})"
            )
    obs_t = np.asarray(rows.obs_t, dtype=np.float64)
    R, NO = obs_t.shape
    inf_dur = np.asarray(rows.inf_dur, dtype=np.float64)
    inf_end = np.where(inf_t < BIG_TIME / 2, inf_t + inf_dur, inf_t)
    order, t_sorted, seg_dt, _ = segment_schedule(rows)
    M = t_sorted.shape[1]

    def scatter(unsorted):
        return np.take_along_axis(unsorted, order, axis=1)

    def with_zero_pads(obs_col, bolus_col):
        return np.concatenate(
            [obs_col, bolus_col, np.zeros((R, 2 * NI))], axis=1
        )

    # padded bolus slots (time >= BIG_TIME) must contribute zero dose — the
    # kernel applies the bolus column even on dt==0 terminal segments
    bolus_amt = np.where(
        bolus_t < BIG_TIME / 2, np.asarray(rows.bolus_amt, dtype=np.float64), 0.0
    )
    if inputs is None:
        seg_bolus = scatter(with_zero_pads(np.zeros_like(obs_t), bolus_amt))
    else:
        seg_bolus = np.stack(
            [
                scatter(with_zero_pads(
                    np.zeros_like(obs_t),
                    np.where(bolus_input == j, bolus_amt, 0.0),
                ))
                for j in range(inputs)
            ],
            axis=-1,
        )  # [R, M, inputs]
    # per-segment infusion rate: midpoint containment (engine parity)
    if NI:
        rate = np.where(
            (inf_t < BIG_TIME / 2) & (inf_dur > 0),
            np.asarray(rows.inf_amt, dtype=np.float64) / np.maximum(inf_dur, 1e-300),
            0.0,
        )
        mid = t_sorted + 0.5 * seg_dt  # [R, M]
        contained = (
            (mid[:, :, None] >= inf_t[:, None, :])
            & (mid[:, :, None] < inf_end[:, None, :])
            & (seg_dt[:, :, None] > 0)
        )
        if inputs is None:
            seg_rateiv = np.einsum(
                "rmi,ri->rm", contained.astype(np.float64), rate
            )
        else:
            seg_rateiv = np.stack(
                [
                    np.einsum(
                        "rmi,ri->rm", contained.astype(np.float64),
                        np.where(inf_input == j, rate, 0.0),
                    )
                    for j in range(inputs)
                ],
                axis=-1,
            )  # [R, M, inputs]
    elif inputs is None:
        seg_rateiv = np.zeros_like(seg_dt)
    else:
        seg_rateiv = np.zeros(seg_dt.shape + (inputs,))
    valid = valid_rows
    obs_value_u = np.asarray(rows.obs_value, dtype=np.float64)
    # observation-based sigma from each observation's outeq error model;
    # per-observation errorpoly overrides replace the poly, keeping
    # kind/factor (loglik.observation_sigmas parity)
    outeq_u = np.asarray(rows.obs_outeq, dtype=np.int64)
    kind = np.asarray(lowered_em.kind)[outeq_u]          # [R, NO]
    factor = np.asarray(lowered_em.factor, dtype=np.float64)[outeq_u]
    shared_poly = np.asarray(lowered_em.poly, dtype=np.float64)[outeq_u]
    poly = np.where(
        np.asarray(rows.obs_has_poly)[:, :, None],
        np.asarray(rows.obs_poly, dtype=np.float64),
        shared_poly,
    )
    alpha = (poly[..., 0] + poly[..., 1] * obs_value_u
             + poly[..., 2] * obs_value_u**2 + poly[..., 3] * obs_value_u**3)
    sigma_u = np.where(
        kind == 1, np.sqrt(alpha**2 + factor**2), factor * alpha
    )
    seg_mask = scatter(with_zero_pads(valid.astype(np.float64), np.zeros_like(bolus_t)))
    seg_value = scatter(with_zero_pads(obs_value_u, np.zeros_like(bolus_t)))
    seg_sigma = scatter(with_zero_pads(sigma_u, np.zeros_like(bolus_t)))
    seg_sigma = np.where(seg_mask > 0, seg_sigma, 1.0)
    # censoring sign: +1 BLOQ (logCDF), -1 ALOQ (logCCDF), 0 uncensored
    cens_code = np.asarray(rows.obs_cens, dtype=np.int64)
    cens_sign = np.where(cens_code == 1, 1.0, np.where(cens_code == 2, -1.0, 0.0))
    cens_sign = np.where(valid_rows, cens_sign, 0.0)
    seg_cens = scatter(with_zero_pads(cens_sign, np.zeros_like(bolus_t)))
    seg_outeq = scatter(
        with_zero_pads(outeq_u.astype(np.float64), np.zeros_like(bolus_t))
    )
    return (seg_dt, seg_bolus, seg_rateiv, seg_mask, seg_value, seg_sigma,
            seg_cens, seg_outeq)
