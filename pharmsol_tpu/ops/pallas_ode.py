"""Pallas TPU kernel: fused psi for numerically-integrated ODE models.

The analytical structures got hand-scheduled psi kernels (ops/pallas_psi.py,
8-26 B sims/s); this module gives the *general nonlinear ODE* family the
same treatment — the path every model outside the closed forms and the
linear-``expm`` class must take, and the reference's own perf identity
("analytical 20-33x over ODE", README.md:127) says it should sit roughly
one order of magnitude below the analytical tier, not two.

Design
------
The XLA engine evaluates ODE psi as ``vmap(support) x vmap(row) x
scan(segments) x while_loop(adaptive steps)``: every while iteration is a
separate fused-kernel dispatch whose carry round-trips HBM, and the masked
convergence loop is lockstep across the WHOLE batch — the slowest lane of
all R x S stalls everyone. Here the entire occasion — segment loop,
embedded Dormand-Prince 5(4) stepper, observation log-likelihood — runs
inside ONE pallas kernel per [row_block x sp_block] tile:

- states, step sizes and the FSAL stage live as [row_block, sp_block] VMEM
  lanes; nothing touches HBM between the stream DMA in and the psi tile out;
- the adaptive while_loop is per-TILE: a tile retires as soon as its own
  lanes finish, so one stiff subject no longer stalls the full batch;
- the user RHS closure is traced straight into the kernel body through an
  indexable lane shim (states/params as 2-D lanes, broadcasting does the
  rest) — no interpreter, no callback, the same jnp ops the XLA path sees;
- per-support quantities that the RHS does NOT need per-step (bolus state
  increments via the RHS-difference probe, init states, linear output
  coefficients) are extracted OUTSIDE the kernel by host-side probing and
  streamed in as [1, sp_block] parameter rows.

Semantics parity with the XLA engine (engine/sim.py + engine/ode.py):
observation-before-bolus ordering, RHS-difference bolus application
(ode/mod.rs:644-687 — probed-static maps ride precomputed per-unit
increment rows; nonlinear/state-dependent mappings run the difference
trick IN-KERNEL, two traced RHS calls per dose boundary),
constant-rate infusion forcing through the RHS, cross-segment step-size
warm start, stall-guarded controller with NaN poisoning on step-budget
exhaustion (-> -inf cells downstream). Tolerances/h0/max_steps come from
the model's ODEOptions (defaults rtol=atol=1e-4, ode/mod.rs:40-41).

Scope (validated by likelihood/matrix._PallasOdePsiPlan; anything else
falls back to the general XLA engine): explicit solvers (dopri5/tsit5)
plus the in-kernel SDIRK stiff tier, in-kernel variable-order ``bdf``,
and the in-kernel EXACT ``expm`` march for affine-in-state RHS (host
affinity/autonomy probes gate it), boluses and infusions into any RHS
input (one stream per active input; static mappings ride a probed bolus
map, nonlinear/state-dependent mappings the in-kernel RHS-difference —
no model-class restriction, matching ode/mod.rs:644-687), covariates that
are time-constant OR piecewise-linear with every knot on a segment
boundary (per-segment affine (a, b) streams — exact vs the reference
interpolation), outputs linear in the state, lag/fa via the per-input
pending-dose split march (time-dependent closures and closures reading
a time-varying covariate ride exact per-dose-segment planes selected by
static (input, segment)->slot tables), init equations via per-support
rows or per-(row, support) planes.
Compiled kernels are float32-only; off-TPU the kernel runs in interpret
mode (which is also how the CPU/f64 parity tests exercise it).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_psi import SEG_PAD, SP_TILE, SUB_TILE, _obs_ll, _pad_lanes, _static_any

# Dormand-Prince 5(4) tableau (same constants as engine/ode.py — published
# coefficients, Dormand & Prince 1980).
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)
_DP_E = tuple(b5 - b4 for b5, b4 in zip(_DP_B5, _DP_B4))

# Dormand-Prince 5(4) dense-output interpolant (Shampine 1986 — the same
# published quartic used by scipy's RK45.P):
#   x(t0 + theta*h) = x0 + h * sum_i k_i * theta * (P[i][0] + theta*(P[i][1]
#                     + theta*(P[i][2] + theta*P[i][3])))
# Row sums equal _DP_B5 (theta=1 reproduces the step) and P[0][0] = 1 with
# zeros elsewhere in column 0 (theta->0 derivative is k1).
_DP_P = (
    (1.0, -8048581381 / 2820520608, 8663915743 / 2820520608,
     -12715105075 / 11282082432),
    (0.0, 0.0, 0.0, 0.0),
    (0.0, 131558114200 / 32700410799, -68118460800 / 10900136933,
     87487479700 / 32700410799),
    (0.0, -1754552775 / 470086768, 14199869525 / 1410260304,
     -10690763975 / 1880347072),
    (0.0, 127303824393 / 49829197408, -318862633887 / 49829197408,
     701980252875 / 199316789632),
    (0.0, -282668133 / 205662961, 2019193451 / 616988883,
     -1453857185 / 822651844),
    (0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423),
)

_DENSE_P = {"dopri5": _DP_P}


def _derive_dense_P(A, B, C):
    """Derive a quartic dense-output interpolant from order conditions.

    Solves for stage-weight polynomials ``b_i(theta) = sum_q P[i][q] *
    theta^(q+1)`` satisfying the eight order-4 continuous-extension
    conditions (Hairer-Norsett-Wanner II.6: the theta-dependent analogues
    of the trees up to order 4) plus theta=1 consistency with the step
    weights ``B``. The system is linear in the 4*ns monomial coefficients;
    a least-squares solve + residual check either yields an interpolant
    whose capture error is within the integration tolerance (same order
    as Shampine's published dopri5 quartic, which this reproduces up to
    interpolant non-uniqueness) or proves none exists for the tableau.
    Returns a P-matrix tuple like ``_DP_P`` or None.
    """
    ns = len(C)
    a = np.zeros((ns, ns))
    for i, row in enumerate(A):
        a[i, : len(row)] = row
    c = np.asarray(C, np.float64)
    ac = a @ c
    conds = (
        (np.ones(ns), 1, 1.0),
        (c, 2, 1.0 / 2.0),
        (c ** 2, 3, 1.0 / 3.0),
        (ac, 3, 1.0 / 6.0),
        (c ** 3, 4, 1.0 / 4.0),
        (c * ac, 4, 1.0 / 8.0),
        (a @ (c ** 2), 4, 1.0 / 12.0),
        (a @ ac, 4, 1.0 / 24.0),
    )
    rows, rhs = [], []
    for w, r, gamma in conds:
        for q in range(1, 5):
            row = np.zeros(ns * 4)
            for i in range(ns):
                row[i * 4 + (q - 1)] = w[i]
            rows.append(row)
            rhs.append(gamma if q == r else 0.0)
    for i in range(ns):  # b_i(1) == B_i: theta=1 reproduces the step
        row = np.zeros(ns * 4)
        row[i * 4: (i + 1) * 4] = 1.0
        rows.append(row)
        rhs.append(B[i])
    M = np.asarray(rows)
    y = np.asarray(rhs)
    sol, *_ = np.linalg.lstsq(M, y, rcond=None)
    if np.max(np.abs(M @ sol - y)) > 1e-10:
        return None
    # the quartic family satisfying the hard constraints is not unique;
    # pick the member minimizing the ORDER-5 defect (sampled-L2 over
    # theta) — min-norm solutions can carry a ~50x larger leading error
    # constant than published interpolants. Order-5 trees (phi, gamma):
    conds5 = (
        (c ** 4, 5.0),
        (c ** 2 * ac, 10.0),
        (ac ** 2, 20.0),
        (c * (a @ (c ** 2)), 15.0),
        (c * (a @ ac), 30.0),
        (a @ (c ** 3), 20.0),
        (a @ (c * ac), 40.0),
        (a @ (a @ (c ** 2)), 60.0),
        (a @ (a @ ac), 120.0),
    )
    u, s, vt = np.linalg.svd(M, full_matrices=True)
    null = vt[np.sum(s > 1e-9 * s[0]):].T  # [4*ns, k]
    if null.shape[1]:
        thetas = np.linspace(0.1, 1.0, 10)
        soft_rows, soft_rhs = [], []
        for w, gamma in conds5:
            for th in thetas:
                row = np.zeros(ns * 4)
                for i in range(ns):
                    for q in range(1, 5):
                        row[i * 4 + (q - 1)] += w[i] * th ** q
                soft_rows.append(row)
                soft_rhs.append(th ** 5 / gamma)
        S5 = np.asarray(soft_rows)
        y5 = np.asarray(soft_rhs)
        z, *_ = np.linalg.lstsq(S5 @ null, y5 - S5 @ sol, rcond=None)
        sol = sol + null @ z
        if np.max(np.abs(M @ sol - y)) > 1e-9:  # hard constraints intact
            return None
    return tuple(tuple(float(v) for v in sol[i * 4: (i + 1) * 4])
                 for i in range(ns))


def dense_P_for(solver: str):
    """The solver's dense-output P matrix (published for dopri5, derived
    from order conditions otherwise), or None if the tableau has no
    4th-order quartic interpolant."""
    if solver in _DENSE_P:
        return _DENSE_P[solver]
    if solver in _TABLEAUS:
        A, B, _, C = _TABLEAUS[solver]
        _DENSE_P[solver] = _derive_dense_P(A, B, C)
        return _DENSE_P[solver]
    return None

# Tsitouras 5(4) (Tsitouras 2011), FSAL.
_TS_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_TS_A = (
    (),
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
_TS_B = _TS_A[6] + (0.0,)
_TS_E = (
    -0.00178001105222577714, -0.0008164344596567469, 0.007880878010261995,
    -0.1447110071732629, 0.5823571654525552, -0.45808210592918697,
    0.015151515151515152,
)

_TABLEAUS = {
    "dopri5": (_DP_A, _DP_B5, _DP_E, _DP_C),
    "tsit5": (_TS_A, _TS_B, _TS_E, _TS_C),
}

# SDIRK methods for the in-kernel stiff path (same tableaus as
# engine/ode.py: TR-BDF2 as an ESDIRK 2(3), Kvaerno 3/2). Newton systems
# are solved per LANE with an explicit frozen-Jacobian inverse (unrolled
# pivot-free Gauss-Jordan — the iteration matrix I - h*gamma*J has a
# dominant positive diagonal for compartment kinetics).
import numpy as _np

_TRBDF2_D = float((2.0 - _np.sqrt(2.0)) / 2.0)
_TRBDF2_W = float(_np.sqrt(2.0) / 4.0)
_SDIRK_TABLEAUS = {
    "trbdf2": {
        "A": ((0.0,), (_TRBDF2_D, _TRBDF2_D), (_TRBDF2_W, _TRBDF2_W, _TRBDF2_D)),
        "B": (_TRBDF2_W, _TRBDF2_W, _TRBDF2_D),
        "BHAT": ((1.0 - _TRBDF2_W) / 3.0, (3.0 * _TRBDF2_W + 1.0) / 3.0,
                 _TRBDF2_D / 3.0),
        "C": (0.0, 2.0 * _TRBDF2_D, 1.0),
        "gamma": _TRBDF2_D,
        "order": 2.0,
        "max_growth": 5.0,
    },
    "kvaerno3": {
        "A": ((0.0,), (0.4358665215084590, 0.4358665215084590),
              (0.490563388419108, 0.073570090080892, 0.4358665215084590),
              (0.308809969973036, 1.490563388254106, -1.235239879727145,
               0.4358665215084590)),
        "B": (0.308809969973036, 1.490563388254106, -1.235239879727145,
              0.4358665215084590),
        "BHAT": (0.490563388419108, 0.073570090080892, 0.4358665215084590,
                 0.0),
        "C": (0.0, 2 * 0.4358665215084590, 1.0, 1.0),
        "gamma": 0.4358665215084590,
        "order": 3.0,
        "max_growth": 5.0,
    },
}
_SDIRK_TABLEAUS["esdirk34"] = _SDIRK_TABLEAUS["kvaerno3"]


def _kv5_tableau():
    # published Kvaerno (2004) 7-stage stiffly-accurate ESDIRK — same
    # constants as engine/ode.py (_KV5_*). max_growth 1.5 mirrors the
    # XLA engine: the order-5 embedded estimator is optimistic across
    # sharp nonlinear transitions (engine/ode.py:438-446). Order > 3, so
    # the cubic-Hermite merge capture is NOT order-matched — the plan
    # never merges kvaerno5 (_ode_merge_runs).
    from ..engine.ode import _KV5_A, _KV5_B, _KV5_BHAT, _KV5_C, _KV5_GAMMA

    return {
        "A": _KV5_A, "B": _KV5_B, "BHAT": _KV5_BHAT, "C": _KV5_C,
        "gamma": _KV5_GAMMA, "order": 5.0, "max_growth": 1.5,
    }


_SDIRK_TABLEAUS["kvaerno5"] = _kv5_tableau()

# Variable-order BDF (1-5) constants — same published family as
# engine/ode.py:480-520 (SUNDIALS/ode15s fixed-leading-coefficient form):
# kappa-stabilized alpha, gamma sums, per-order error constants, and the
# involutory difference-array transform U = R(1).
_BDF_MAX_ORDER = 5
_BDF_KAPPA = (0.0, -0.1850, -1.0 / 9.0, -0.0823, -0.0415, 0.0)
_BDF_GAMMA = tuple(
    float(g) for g in
    np.hstack(([0.0], np.cumsum(1.0 / np.arange(1, _BDF_MAX_ORDER + 1))))
)
_BDF_ALPHA = tuple(
    (1.0 - k) * g for k, g in zip(_BDF_KAPPA, _BDF_GAMMA)
)
_BDF_ERROR_CONST = tuple(
    k * g + 1.0 / (i + 1.0)
    for i, (k, g) in enumerate(zip(_BDF_KAPPA, _BDF_GAMMA))
)


def _bdf_U():
    """R(1): the involutory backward-difference transform, 6x6 floats."""
    K = _BDF_MAX_ORDER + 1
    U = np.zeros((K, K))
    U[0, :] = 1.0
    for i in range(1, K):
        for j in range(1, K):
            U[i, j] = U[i - 1, j] * ((i - 1.0 - j) / i)
    return U


_BDF_U = _bdf_U()

# expm tier constants — same chain as engine/ode.py:668-669 (Taylor radius
# 1.0 with 13 terms; 16 masked squarings cover ||[A u]|| dt up to 2^16).
_EXPM_TAYLOR = 13
_EXPM_SQUARINGS = 16


def _dotn(row, col):
    """Unrolled lane dot product (no dot_general — pure VPU FMAs)."""
    acc = row[0] * col[0]
    for x, y in zip(row[1:], col[1:]):
        acc = acc + x * y
    return acc


def _lane_inverse(M, n: int):
    """Inverse of an n x n matrix whose entries are lane arrays.

    Pivot-free Gauss-Jordan unrolled over the static size — every entry
    is a [rows, sp] array so the whole elimination is elementwise VPU
    work. Diagonals are clamped away from zero (the SDIRK iteration
    matrix is diagonally dominant; a singular lane produces garbage that
    the Newton residual check rejects).
    """
    aug = [[M[i][j] for j in range(n)]
           + [jnp.full_like(M[0][0], 1.0 if j == i else 0.0)
              for j in range(n)]
           for i in range(n)]
    for k in range(n):
        d = aug[k][k]
        d = jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
        inv_d = 1.0 / d
        aug[k] = [e * inv_d for e in aug[k]]
        for i in range(n):
            if i == k:
                continue
            factor = aug[i][k]
            aug[i] = [e_i - factor * e_k for e_i, e_k in zip(aug[i], aug[k])]
    return [row[n:] for row in aug]

# ODE tiles are much smaller than the analytical ones: the stepper holds
# ~(7 stages + 2) * n_states live [rows, sp] lanes, and the whole working
# set must stay in vector registers/VMEM across while_loop iterations.
# Measured on v5e at population scale (4096x512 dopri5 3-state psi,
# same-session sweeps, iteration-scaling protocol): row_block 64 beats 32
# consistently (234.7M vs 202.6M sims/s head-to-head; 229M vs 196M in a
# second session), 128-row and 512-lane tiles lose (199M / 189M), and
# sp_block 256 is within noise of 128 (282M once, 225M once). An earlier
# 512x128-scale sweep that crowned 32x128 was tunnel-floor noise
# (k_hi*t_psi << 40 ms) — tile choices must be measured at scale.
ODE_ROW_BLOCKS = (64, 32, 16, 8)
ODE_SP_BLOCKS = (128,)
ODE_TILE_BUDGET = 64 * 128


class LaneVec:
    """Indexable shim presenting per-state 2-D lanes as the RHS's ``x``.

    User RHS code indexes ``x[i]`` / slices ``x[:k]``; each entry is a
    [rows, sp] (or broadcastable) lane array. Also serves for ``b`` (zeros
    inside segments), ``rateiv`` (the segment rate in slot 0) and ``p``
    (support-column rows).
    """

    def __init__(self, lanes):
        self._lanes = list(lanes)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return LaneVec(self._lanes[idx])
        if isinstance(idx, (int, np.integer)):
            n = len(self._lanes)
            if not (-n <= idx < n):
                raise IndexError(
                    f"index {idx} out of range ({n} lanes)"
                )
            return self._lanes[idx]
        raise TypeError(
            f"pallas ODE lane vectors support static integer indexing only "
            f"(got {type(idx).__name__})"
        )

    def __len__(self):
        return len(self._lanes)

    def __iter__(self):
        return iter(self._lanes)

    @property
    def shape(self):
        return (len(self._lanes),)


class LaneCov:
    """Covariate shim for the kernel RHS.

    Entries are either a per-row constant lane (time-constant covariates)
    or an ``(a, b)`` pair of lanes encoding the segment-affine
    interpolation ``cov(t) = a + b * t``. The host plan guarantees the
    affine form is EXACT: the reference interpolation (covariate.rs —
    linear between knots, carry-forward for fixed) is affine within any
    span containing no interior knot, and _PallasOdePsiPlan validates
    that for every integration segment (falling back to XLA otherwise).
    """

    def __init__(self, values: dict):
        self._values = values

    def __call__(self, name, t):
        try:
            v = self._values[str(name)]
        except KeyError:
            raise KeyError(
                f"RHS reads unknown covariate `{name}`"
            )
        if isinstance(v, tuple):
            a, b = v
            return a + b * t
        return v

    def value(self, name, t):
        return self(name, t)


def make_lane_rhs(diffeq, n_states: int, n_params: int, ninput: int = None,
                  rate_inputs: tuple = (0,)):
    """Wrap a user ``diffeq(x, p, t, b, rateiv, cov)`` for lane evaluation.

    Returns ``rhs(xs, p_lanes, t, rate, cov_lanes, shape, dtype,
    b_lanes=None) -> [n_states lanes]`` where every lane is a
    broadcastable 2-D array. ``rate`` may be None (no infusions — all
    forcing slots compiled out), a single lane (applied to
    ``rate_inputs[0]``), or a list of lanes matching ``rate_inputs`` —
    the static input indices that receive infusions. ``b`` and ``rateiv``
    are ``ninput`` wide; ``b_lanes`` (``{input_j: lane}``) is only
    non-zero for the in-kernel RHS-difference bolus application
    (ode/mod.rs:644-687) — inside segments ``b`` is always zero.
    """
    if ninput is None:
        ninput = n_states

    def rhs(xs, p_lanes, t, rate, cov_lanes, shape, dtype, b_lanes=None):
        zero = jnp.zeros((), dtype)
        bl = [zero] * max(ninput, 1)
        if b_lanes:
            for j, v in b_lanes.items():
                bl[j] = v
        b = LaneVec(bl)
        lanes = [zero] * max(ninput, 1)
        if rate is not None:
            rl = list(rate) if isinstance(rate, (list, tuple)) else [rate]
            for j, r in zip(rate_inputs, rl):
                lanes[j] = r
        rateiv = LaneVec(lanes)
        out = diffeq(LaneVec(xs), LaneVec(p_lanes), t, b, rateiv,
                     LaneCov(cov_lanes))
        if isinstance(out, LaneVec):
            comps = list(out)
        elif isinstance(out, (list, tuple)):
            comps = list(out)
        else:
            comps = [out[i] for i in range(n_states)]
        if len(comps) != n_states:
            raise ValueError(
                f"RHS returned {len(comps)} components, expected {n_states}"
            )
        return [jnp.broadcast_to(jnp.asarray(c, dtype), shape) for c in comps]

    return rhs


def make_stacked_rhs(diffeq, n_states: int, n_params: int,
                     ninput: int = None, rate_inputs: tuple = (0,)):
    """Stacked-ARRAY RHS evaluation: the fallback for closure styles the
    ``LaneVec`` shim cannot trace.

    ``x``/``p``/``b``/``rateiv`` are handed to the user closure as REAL
    jnp arrays of shape [n, rows, sp] (states stacked on a small leading
    axis), so vector-style RHS code — ``jnp.zeros_like(x)``, ``.at[i]``
    updates, static fancy indexing, whole-vector arithmetic — traces
    as written. Costs broadcast materialization of the per-support
    parameter rows to full tiles (a few hundred KB of VMEM at 64x128),
    which the lane representation avoids; the plan prefers lanes and
    only switches here when the lane probe fails.
    """
    if ninput is None:
        ninput = n_states

    def rhs(xs, p_lanes, t, rate, cov_lanes, shape, dtype, b_lanes=None):
        X = jnp.stack([
            jnp.broadcast_to(jnp.asarray(x, dtype), shape) for x in xs
        ])
        Pv = jnp.stack([
            jnp.broadcast_to(jnp.asarray(p, dtype), shape) for p in p_lanes
        ])
        nin = max(ninput, 1)
        bl = [jnp.zeros(shape, dtype)] * nin
        if b_lanes:
            for j, v in b_lanes.items():
                bl[j] = jnp.broadcast_to(jnp.asarray(v, dtype), shape)
        B = jnp.stack(bl)
        rl = [jnp.zeros(shape, dtype)] * nin
        if rate is not None:
            rr = list(rate) if isinstance(rate, (list, tuple)) else [rate]
            for j, r in zip(rate_inputs, rr):
                rl[j] = jnp.broadcast_to(jnp.asarray(r, dtype), shape)
        Rt = jnp.stack(rl)
        out = diffeq(X, Pv, t, B, Rt, LaneCov(cov_lanes))
        if isinstance(out, (list, tuple, LaneVec)):
            comps = list(out)
        else:
            comps = [out[i] for i in range(n_states)]
        if len(comps) != n_states:
            raise ValueError(
                f"RHS returned {len(comps)} components, expected {n_states}"
            )
        return [jnp.broadcast_to(jnp.asarray(c, dtype), shape)
                for c in comps]

    return rhs


def _make_ode_kernel(
    rhs, *, n_states: int, n_params: int, n_seg: int, has_inf: bool,
    has_cens: bool, n_out: int, has_bias: bool, has_init: bool,
    cov_names: tuple, cov_affine: tuple = (),
    has_lag: bool = False, has_fa: bool = False,
    n_lag_planes: int = 0, n_fa_planes: int = 0,
    lag_slots=None, fa_slots=None,
    n_bolus_in: int = 1, n_rate_in: int = 1,
    bolus_rhs_diff: bool = False, bolus_inputs: tuple = (0,),
    A=None, B=None, E=None, C=None, sdirk=None, use_bdf: bool = False,
    use_expm: bool = False, expm_squarings: int = _EXPM_SQUARINGS,
    bdf_max_order: int = 3, bdf_max_growth: float = 10.0,
    rtol: float, atol: float, h0: float,
    max_iters: int, unroll: int, newton_iters: int = 4,
    controller: str = "i", init_mode: str = "rows",
    runs=None, dense_P=None, lazy_capture: bool = False,
    debug_trials: bool = False,
):
    """Build the fused ODE psi tile kernel.

    Ref layout (in order): segment streams (dt, bolus, [rateiv], mask,
    value, sigma, [cens], [outeq], t0, [init_mask], cov...) each
    [row_block, SEG_PAD]; [lag planes], [fa planes] (one per bolus input)
    each [row_block, sp_block]; parameter rows (p columns, bolus-map rows,
    [init rows], coef rows, [bias rows]) each [1, sp_block]; out_ref
    [row_block, sp_block].

    ``has_lag``: a lagged dose parks in per-input (pend_amt, pend_rem)
    lanes at its original breakpoint and fires once its remaining lag
    elapses. Unlike the analytical kernel's superposition (invalid for
    nonlinear RHS), the segment march SPLITS at the per-lane fire times:
    one pass per bolus input advances to the next earliest fire time
    (inputs due at equal times fire together), applies the bolus, and
    integrates on. A dose due exactly at a breakpoint fires after that
    breakpoint's observation (observation-before-dose parity,
    structs.rs:611-666); the plan guarantees no two doses of one (lane,
    input) slot pend simultaneously. ``has_fa`` scales each input's dose
    amounts by its per-(row, support) plane.
    """
    n_stages = len(C) if C is not None else 0
    has_outeq = n_out > 1
    n_cov = len(cov_names)
    if not cov_affine:
        cov_affine = (False,) * n_cov

    def kernel(*refs):
        it = iter(refs)
        dts = next(it)[:, :]
        bols_l = [next(it)[:, :] for _ in range(n_bolus_in)]
        rates_l = ([next(it)[:, :] for _ in range(n_rate_in)]
                   if has_inf else None)
        masks = next(it)[:, :]
        vals = next(it)[:, :]
        sigs = next(it)[:, :]
        censs = next(it)[:, :] if has_cens else None
        outeqs = next(it)[:, :] if has_outeq else None
        t0s = next(it)[:, :]
        initm = next(it)[:, :] if has_init else None
        cov_streams = [
            ((next(it)[:, :], next(it)[:, :]) if aff else next(it)[:, :])
            for aff in cov_affine
        ]
        lag_planes = ([next(it)[:, :]
                       for _ in range(n_lag_planes or n_bolus_in)]
                      if has_lag else None)
        fa_planes = ([next(it)[:, :]
                      for _ in range(n_fa_planes or n_bolus_in)]
                     if has_fa else None)
        # covariate-dependent init: per-(row, support) planes instead of
        # per-support rows — same init expression, tile-shaped source
        init_planes = ([next(it)[:, :] for _ in range(n_states)]
                       if has_init and init_mode == "planes" else None)
        params = [next(it)[:, :] for _ in range(n_params)]
        # rhs_diff mode computes the per-dose state increment in-kernel
        # (two RHS calls at the boundary, ode/mod.rs:644-687) — no
        # precomputed bolus-map rows ride in
        bmaps = ([[next(it)[:, :] for _ in range(n_states)]
                  for _ in range(n_bolus_in)]
                 if not bolus_rhs_diff else None)
        init_rows = (
            [next(it)[:, :] for _ in range(n_states)]
            if has_init and init_mode == "rows" else init_planes
        )
        coefs = [[next(it)[:, :] for _ in range(n_states)] for _ in range(n_out)]
        biases = [next(it)[:, :] for _ in range(n_out)] if has_bias else None
        out_ref = next(it)

        dtype = out_ref.dtype
        shape = (out_ref.shape[0], out_ref.shape[1])
        zeros = jnp.zeros(shape, dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

        def col(a, m):
            sel = (lane == np.int32(m)).astype(a.dtype)
            return jnp.sum(a * sel, axis=1, keepdims=True)  # [rows, 1]

        # time-constant covariate lanes, one value per row; affine ones
        # get their per-segment (a, b) lanes in cov_for_seg below
        const_lanes = {
            name: col(cs, 0)
            for name, cs, aff in zip(cov_names, cov_streams, cov_affine)
            if not aff
        }

        def cov_for_seg(m):
            lanes = dict(const_lanes)
            for name, cs, aff in zip(cov_names, cov_streams, cov_affine):
                if aff:
                    lanes[name] = (col(cs[0], m), col(cs[1], m))
            return lanes

        def make_f(cov_lanes):
            def f(xs, t, rate):
                return rhs(xs, params, t, rate, cov_lanes, shape, dtype)
            return f

        # -- merged-run interior observation capture (shared helpers) -----
        def out_k(k, xs_v):
            p = coefs[k][0] * xs_v[0]
            for s_ in range(1, n_states):
                p = p + coefs[k][s_] * xs_v[s_]
            return p

        def sel_out(oe_j, per_out):
            if n_out == 1:
                return per_out[0]
            acc = jnp.zeros(shape, dtype)
            for k in range(n_out):
                acc = acc + (oe_j == float(k)).astype(dtype) * per_out[k]
            return acc

        def interior_setup(interior, target, xs):
            """(T_eff, oe, preds0): effective capture offsets clamped just
            inside the done-threshold (so a span-end obs is captured by the
            final accepted step at theta ~ 1), plus at-start captures for
            zero-offset observations (they read the post-bolus span-start
            state, matching the zero-dt segment in the unmerged march)."""
            t_end_eff = target - 1e-6 * jnp.maximum(target, 1e-30)
            T_eff = [
                jnp.minimum(jnp.broadcast_to(Tj, shape), t_end_eff)
                for Tj in interior["T"]
            ]
            start_preds = [out_k(k, xs) for k in range(n_out)]
            preds0 = [
                jnp.where(jnp.broadcast_to(Tj, shape) <= 0.0,
                          sel_out(interior["oe"][j], start_preds), 0.0)
                for j, Tj in enumerate(interior["T"])
            ]
            return T_eff, interior["oe"], preds0

        def interior_poison(interior, T_eff, tau_f, preds_f):
            """NaN-poison captures an incomplete lane never reached — the
            same downstream -inf the step-by-step march produces."""
            nan = jnp.full(shape, jnp.nan, dtype)
            return [
                jnp.where((T_eff[j] > tau_f)
                          & (jnp.broadcast_to(interior["T"][j], shape)
                             > 0.0),
                          nan, p)
                for j, p in enumerate(preds_f)
            ]

        def integrate(f, xs, h, dt_col, rate, t0_col, estimate_h: bool,
                      interior=None):
            """Adaptive embedded-RK march over one segment, all lanes.

            ``tau`` is segment-relative time; the RHS sees ``t0 + tau``.
            Returns (xs_end, h_cruise, preds): lanes that exhaust the
            iteration budget or stall are NaN-poisoned (engine parity:
            -inf cells).

            ``estimate_h`` (first segment only): the classic
            Hairer-Norsett-Wanner II.4 starting-step estimate from two RHS
            evaluations, floored at the configured h0 — skipping the
            5-accept geometric ramp from h0=1e-3 that every lane would
            otherwise pay before reaching its cruise step. Later segments
            warm-start from the carried cruise h instead.

            ``interior`` (merged runs): {"T": [J x [rows, 1] run-relative
            observation offsets], "oe": [J x [rows, 1] outeq cols or
            None]}. The march then crosses observation-only breakpoints
            without stopping and captures each interior prediction from
            the tableau's dense-output interpolant on the accepted step
            that crosses it. Per-trial cost stays small because the
            quartic b_i(theta) stage weights are pre-contracted with the
            (linear) output extraction: one Horner evaluation per
            (observation, output) per trial. ``preds`` returns the J
            captured predictions (bias NOT yet added); observations an
            incomplete lane never reached come back NaN (the same
            poisoning the segment-by-segment march produces).
            """
            target = jnp.broadcast_to(dt_col, shape)
            live0 = target > 0.0
            # a lane whose state arrives non-finite (poisoned by an
            # earlier segment) must NOT march: every trial would reject
            # on the finite check, and at tau=0 the stall guard
            # (tau + h <= tau) can never fire — the lane would silently
            # burn the ENTIRE iteration budget in every remaining
            # segment (measured: ~2% poisoned lanes made bdf psi ~860x
            # slower than trbdf2). Dead-on-entry lanes exit immediately
            # and stay NaN -> -inf downstream.
            for s_ in range(n_states):
                live0 = live0 & jnp.isfinite(xs[s_])
            k1_0 = f(xs, t0_col, rate)
            n_int = len(interior["T"]) if interior else 0
            if n_int:
                T_eff, oe_int, preds0 = interior_setup(interior, target, xs)
            if estimate_h:
                d0 = zeros
                d1 = zeros
                for s in range(n_states):
                    sc = atol + rtol * jnp.abs(xs[s])
                    d0 = d0 + (xs[s] / sc) ** 2
                    d1 = d1 + (k1_0[s] / sc) ** 2
                d0 = jnp.sqrt(d0 / float(n_states))
                d1 = jnp.sqrt(d1 / float(n_states))
                h0a = jnp.where((d0 > 1e-5) & (d1 > 1e-5),
                                0.01 * d0 / jnp.maximum(d1, 1e-30), 1e-6)
                x1 = [x + h0a * k for x, k in zip(xs, k1_0)]
                f1 = f(x1, t0_col + h0a, rate)
                d2 = zeros
                for s in range(n_states):
                    sc = atol + rtol * jnp.abs(xs[s])
                    d2 = d2 + ((f1[s] - k1_0[s]) / sc) ** 2
                d2 = jnp.sqrt(d2 / float(n_states)) / h0a
                dmax = jnp.maximum(d1, d2)
                h1 = jnp.where(
                    dmax > 1e-15,
                    jnp.power(0.01 / jnp.maximum(dmax, 1e-30), 0.2),
                    jnp.maximum(1e-6, h0a * 1e3),
                )
                h_est = jnp.minimum(100.0 * h0a, h1)
                # floor at the configured h0: a zero-dynamics lane would
                # otherwise ramp from 1e-6; genuinely stiff lanes reject
                # back down exactly as the reference controller does
                h_est = jnp.where(
                    jnp.isfinite(h_est), jnp.maximum(h_est, h0), h
                )
                h = h_est

            def one_trial(carry):
                # the live mask rides the carry as 0/1 float lanes: Mosaic
                # cannot legalize i1 vectors in scf.while yields
                tau, xs_c, h_c, k1_c, rp_c, live_f, it_, preds_c = carry
                live = live_f > 0.5
                rem = target - tau
                h_try = jnp.minimum(h_c, jnp.maximum(rem, 1e-14))
                ks = [k1_c]
                for i in range(1, n_stages):
                    xi = [
                        xs_c[s] + h_try * _wsum(
                            [ks[j][s] for j in range(i)], A[i]
                        )
                        for s in range(n_states)
                    ]
                    ks.append(f(xi, t0_col + tau + C[i] * h_try, rate))
                xs_new = [
                    x + h_try * _wsum([k[s] for k in ks], B)
                    for s, x in enumerate(xs_c)
                ]
                err2 = zeros
                for s in range(n_states):
                    e = h_try * _wsum([k[s] for k in ks], E)
                    scale = atol + rtol * jnp.maximum(
                        jnp.abs(xs_c[s]), jnp.abs(xs_new[s])
                    )
                    err2 = err2 + (e / scale) ** 2
                ratio = jnp.sqrt(err2 / float(n_states))
                finite = jnp.isfinite(ratio)
                for s in range(n_states):
                    finite = finite & jnp.isfinite(xs_new[s])
                accept = live & (ratio <= 1.0) & finite
                r_fl = jnp.maximum(ratio, 1e-10)
                if controller == "pi":
                    # Lund-stabilized PI (Hairer dopri5 beta=0.04,
                    # expo1 = 1/5 - 0.75*beta): growth tempered by the
                    # previous accepted error — fewer accept/reject
                    # oscillations on mildly stiff lanes. Rejections use
                    # the plain I-step with growth capped at 1.
                    fac_acc = (0.9 * jnp.power(r_fl, -0.17)
                               * jnp.power(rp_c, 0.04))
                    fac_rej = 0.9 * jnp.power(r_fl, -0.2)
                    factor = jnp.where(
                        ratio <= 1.0,
                        jnp.clip(fac_acc, 0.2, 5.0),
                        jnp.clip(fac_rej, 0.2, 1.0),
                    )
                    factor = jnp.where(finite, factor, 0.25)
                else:
                    factor = jnp.where(
                        finite,
                        jnp.clip(0.9 * jnp.power(r_fl, -0.2), 0.2, 5.0),
                        0.25,
                    )
                rp_n = jnp.where(accept, jnp.maximum(ratio, 1e-4), rp_c)
                tau_n = jnp.where(accept, tau + h_try, tau)
                xs_n = [
                    jnp.where(accept, xn, x) for xn, x in zip(xs_new, xs_c)
                ]
                k_last_ok = finite
                for s in range(n_states):
                    k_last_ok = k_last_ok & jnp.isfinite(ks[-1][s])
                k1_n = [
                    jnp.where(accept & k_last_ok, kl, k)
                    for kl, k in zip(ks[-1], k1_c)
                ]
                h_n = jnp.where(
                    live, jnp.maximum(h_try * factor, 1e-14), h_c
                )
                done_n = tau_n >= target - 1e-6 * jnp.maximum(target, 1e-30)
                # stall guard (engine/ode.py:_h_stalled): a lane whose h
                # underflows ulp(tau) can never advance — kill it now, the
                # poison below turns it into -inf
                stalled = live & ((tau_n + h_n) <= tau_n) & ~done_n
                live_n = live & ~done_n & ~stalled
                preds_n = preds_c
                if n_int:
                    # dense-output capture: per output, contract the stage
                    # slopes with the linear extraction (ci), then with the
                    # interpolant's quartic columns (d_q) — per interior
                    # observation the capture is then one Horner chain
                    crossed_l = [
                        accept & (tau < T_eff[j]) & (T_eff[j] <= tau + h_try)
                        for j in range(n_int)
                    ]

                    def _capture(_):
                        dqs = []
                        c0s = []
                        for k in range(n_out):
                            c0s.append(out_k(k, xs_c))
                            ci = [out_k(k, [kk[s_]
                                            for s_ in range(n_states)])
                                  for kk in ks]
                            dqs.append([
                                _wsum(ci, [dense_P[i][q]
                                           for i in range(n_stages)])
                                for q in range(4)
                            ])
                        out_l = []
                        for j in range(n_int):
                            th = (T_eff[j] - tau) / h_try
                            per_out = [
                                c0s[k] + h_try * th * (
                                    dqs[k][0] + th * (dqs[k][1] + th * (
                                        dqs[k][2] + th * dqs[k][3]))
                                )
                                for k in range(n_out)
                            ]
                            out_l.append(jnp.where(
                                crossed_l[j], sel_out(oe_int[j], per_out),
                                preds_c[j],
                            ))
                        return tuple(out_l)

                    if lazy_capture:
                        # each interior obs is crossed ONCE per lane over
                        # the whole march, so on most trials no lane in
                        # the tile crosses anything — skip the stage-slope
                        # contraction behind a scalar-predicate cond. The
                        # reduce rides the kernel float dtype (same trick
                        # as the while cond's live_f lanes: bool reduces
                        # don't lower under an x64-ambient outer trace)
                        any_c = crossed_l[0]
                        for c_ in crossed_l[1:]:
                            any_c = any_c | c_
                        pred = jnp.max(any_c.astype(dtype)) > 0.5
                        preds_n = list(jax.lax.cond(
                            pred, lambda: _capture(0),
                            lambda: tuple(preds_c),
                        ))
                    else:
                        preds_n = list(_capture(0))
                return (tau_n, xs_n, h_n, k1_n, rp_n,
                        live_n.astype(live_f.dtype), it_ + 1, preds_n)

            def body(carry):
                for _ in range(max(1, unroll)):
                    carry = one_trial(carry)
                return carry

            def cond(carry):
                tau, _, _, _, _, live_f, it_, _ = carry
                return (it_ < max_iters) & (jnp.max(live_f) > 0.5)

            h_start = jnp.minimum(h, jnp.maximum(target, 1e-14))
            init = (zeros, list(xs), h_start, k1_0,
                    jnp.full(shape, 1e-4, dtype),
                    live0.astype(dtype), jnp.zeros((), jnp.int32),
                    preds0 if n_int else [])
            tau_f, xs_f, h_f, _, _, _, _, preds_f = jax.lax.while_loop(
                cond, body, init
            )
            incomplete = tau_f < target - 1e-6 * jnp.maximum(target, 1e-30)
            nan = jnp.full(shape, jnp.nan, dtype)
            xs_out = [jnp.where(incomplete, nan, x) for x in xs_f]
            # warm start for the next segment; lanes that never integrated
            # (dt == 0) keep their carried h
            h_out = jnp.where(live0, h_f, h)
            if n_int:
                preds_f = interior_poison(interior, T_eff, tau_f, preds_f)
            return xs_out, h_out, preds_f

        def integrate_sdirk(f, xs, h, dt_col, rate, t0_col,
                            estimate_h: bool, interior=None):
            """Adaptive SDIRK march (stiff path): per-lane Newton stages.

            The iteration matrix ``I - h*gamma*J`` uses a Jacobian frozen
            at the step start (J columns via ``jax.jvp`` on the lane RHS)
            and is inverted ONCE per trial with the unrolled pivot-free
            Gauss-Jordan — each Newton iteration is then one RHS + one
            lane matvec. Non-converged Newton (residual > 0.1 in WRMS)
            rejects the step exactly like engine/ode._esdirk_segment.

            ``interior`` (merged runs): captured with CUBIC HERMITE on
            (x0, f0, x1, f1) — order-matched for these 2nd/3rd-order
            stiffly-accurate tableaus, whose last stage slope IS
            f(x_new) (B equals the last A row for trbdf2/kvaerno3).
            """
            tab = sdirk
            sA, sB = tab["A"], tab["B"]
            sBHAT, sC = tab["BHAT"], tab["C"]
            gamma = tab["gamma"]
            order = tab["order"]
            max_growth = tab["max_growth"]
            ns = len(sC)
            target = jnp.broadcast_to(dt_col, shape)
            live0 = target > 0.0
            # a lane whose state arrives non-finite (poisoned by an
            # earlier segment) must NOT march: every trial would reject
            # on the finite check, and at tau=0 the stall guard
            # (tau + h <= tau) can never fire — the lane would silently
            # burn the ENTIRE iteration budget in every remaining
            # segment (measured: ~2% poisoned lanes made bdf psi ~860x
            # slower than trbdf2). Dead-on-entry lanes exit immediately
            # and stay NaN -> -inf downstream.
            for s_ in range(n_states):
                live0 = live0 & jnp.isfinite(xs[s_])
            n_int = len(interior["T"]) if interior else 0
            if n_int:
                T_eff, oe_int, preds0 = interior_setup(interior, target, xs)

            def jac(xs_c, t_base):
                cols = []
                for j in range(n_states):
                    tangent = tuple(
                        jnp.ones(shape, dtype) if s == j else zeros
                        for s in range(n_states)
                    )
                    _, jv = jax.jvp(
                        lambda *x: f(list(x), t_base, rate),
                        tuple(xs_c), tangent,
                    )
                    cols.append(list(jv))
                # J[i][j] = df_i/dx_j
                return [[cols[j][i] for j in range(n_states)]
                        for i in range(n_states)]

            def one_trial(carry):
                tau, xs_c, h_c, live_f, it_, preds_c = carry
                live = live_f > 0.5
                rem = target - tau
                h_try = jnp.minimum(h_c, jnp.maximum(rem, 1e-14))
                t_base = t0_col + tau
                J = jac(xs_c, t_base)
                M = [
                    [
                        (1.0 if i == j else 0.0) - h_try * gamma * J[i][j]
                        for j in range(n_states)
                    ]
                    for i in range(n_states)
                ]
                Minv = _lane_inverse(M, n_states)
                ks = []
                resid_max = zeros
                for i in range(ns):
                    if i == 0:
                        ks.append(f(xs_c, t_base, rate))
                        continue
                    base = [
                        xs_c[s] + h_try * _wsum(
                            [ks[j][s] for j in range(i)], sA[i][:i]
                        )
                        for s in range(n_states)
                    ]
                    t_st = t_base + sC[i] * h_try
                    z = [b + h_try * gamma * k for b, k in zip(base, ks[i - 1])]
                    for _ in range(newton_iters):
                        fz = f(z, t_st, rate)
                        F = [
                            zz - bb - h_try * gamma * ff
                            for zz, bb, ff in zip(z, base, fz)
                        ]
                        z = [
                            zz - sum(Minv[s][j] * F[j]
                                     for j in range(n_states))
                            for s, zz in enumerate(z)
                        ]
                    fz = f(z, t_st, rate)
                    r2 = zeros
                    for s in range(n_states):
                        Fs = z[s] - base[s] - h_try * gamma * fz[s]
                        sc = atol + rtol * jnp.abs(z[s])
                        r2 = r2 + (Fs / sc) ** 2
                    resid_max = jnp.maximum(
                        resid_max, jnp.sqrt(r2 / float(n_states))
                    )
                    ks.append(fz)
                xs_new = [
                    x + h_try * _wsum([k[s] for k in ks], sB)
                    for s, x in enumerate(xs_c)
                ]
                err2 = zeros
                for s in range(n_states):
                    e = h_try * (_wsum([k[s] for k in ks], sB)
                                 - _wsum([k[s] for k in ks], sBHAT))
                    sc = atol + rtol * jnp.maximum(
                        jnp.abs(xs_c[s]), jnp.abs(xs_new[s])
                    )
                    err2 = err2 + (e / sc) ** 2
                ratio = jnp.sqrt(err2 / float(n_states))
                finite = jnp.isfinite(ratio) & (resid_max <= 0.1)
                growth = zeros
                xmax = zeros
                for s in range(n_states):
                    finite = finite & jnp.isfinite(xs_new[s])
                    growth = jnp.maximum(growth, jnp.abs(xs_new[s] - xs_c[s]))
                    xmax = jnp.maximum(xmax, jnp.abs(xs_c[s]))
                # engine parity: a 10x state jump is a spurious Newton root
                finite = finite & (growth <= 10.0 * (1.0 + xmax))
                accept = live & (ratio <= 1.0) & finite
                factor = jnp.where(
                    finite,
                    jnp.clip(
                        0.9 * jnp.power(
                            jnp.maximum(ratio, 1e-10), -1.0 / (order + 1.0)
                        ),
                        0.2, max_growth,
                    ),
                    0.25,
                )
                tau_n = jnp.where(accept, tau + h_try, tau)
                xs_n = [
                    jnp.where(accept, xn, x) for xn, x in zip(xs_new, xs_c)
                ]
                h_n = jnp.where(
                    live, jnp.maximum(h_try * factor, 1e-14), h_c
                )
                done_n = tau_n >= target - 1e-6 * jnp.maximum(target, 1e-30)
                stalled = live & ((tau_n + h_n) <= tau_n) & ~done_n
                live_n = live & ~done_n & ~stalled
                preds_n = preds_c
                if n_int:
                    # cubic Hermite capture on (x0, f0, x1, f1), all
                    # pre-contracted with the linear output extraction
                    c0s = [out_k(k, xs_c) for k in range(n_out)]
                    c1s = [out_k(k, xs_new) for k in range(n_out)]
                    f0s = [out_k(k, [ks[0][s_] for s_ in range(n_states)])
                           for k in range(n_out)]
                    f1s = [out_k(k, [ks[-1][s_] for s_ in range(n_states)])
                           for k in range(n_out)]
                    preds_n = []
                    for j in range(n_int):
                        crossed = accept & (tau < T_eff[j]) \
                            & (T_eff[j] <= tau + h_try)
                        th = (T_eff[j] - tau) / h_try
                        per_out = []
                        for k in range(n_out):
                            d = c1s[k] - c0s[k]
                            a_ = h_try * f0s[k] - d
                            b_ = d - h_try * f1s[k]
                            per_out.append(
                                c0s[k] + th * d
                                + th * (1.0 - th)
                                * ((1.0 - th) * a_ + th * b_)
                            )
                        preds_n.append(jnp.where(
                            crossed, sel_out(oe_int[j], per_out),
                            preds_c[j],
                        ))
                return (tau_n, xs_n, h_n, live_n.astype(live_f.dtype),
                        it_ + 1, preds_n)

            def body(carry):
                for _ in range(max(1, unroll)):
                    carry = one_trial(carry)
                return carry

            def cond(carry):
                tau, _, _, live_f, it_, _ = carry
                return (it_ < max_iters) & (jnp.max(live_f) > 0.5)

            h_start = jnp.minimum(h, jnp.maximum(target, 1e-14))
            init = (zeros, list(xs), h_start, live0.astype(dtype),
                    jnp.zeros((), jnp.int32), preds0 if n_int else [])
            tau_f, xs_f, h_f, _, _, preds_f = jax.lax.while_loop(
                cond, body, init
            )
            incomplete = tau_f < target - 1e-6 * jnp.maximum(target, 1e-30)
            nan = jnp.full(shape, jnp.nan, dtype)
            xs_out = [jnp.where(incomplete, nan, x) for x in xs_f]
            h_out = jnp.where(live0, h_f, h)
            if n_int:
                preds_f = interior_poison(interior, T_eff, tau_f, preds_f)
            return xs_out, h_out, preds_f

        def integrate_expm(f, xs, h, dt_col, rate, t0_col,
                           estimate_h: bool, interior=None):
            """EXACT affine-segment propagation — the in-kernel version of
            engine/ode.expm_segment for user-written LINEAR compartment
            ODEs (the dominant PK case outside the 12 closed forms).

            Within a segment the RHS is autonomous-affine (parameters
            fixed, rateiv constant, covariates per-segment constant —
            the host plan validated affinity/autonomy with f64 probes, so
            no runtime superposition guard is needed): ``dx = A x + u``
            with ``u = f(0)`` and A columns via ``jax.jvp`` at 0 against
            the segment's actual rate. The exact step is the matrix
            exponential of the augmented block ``[[A, u], [0, 0]]``,
            evaluated in the (P, q) affine form with a Taylor-Horner
            chain plus a static MASKED squaring chain (the count is
            data-dependent under jit) — a fixed, loop-free op chain: no
            while_loop, no step-count divergence, no tolerance error.
            Lanes whose scaled norm exceeds the squaring budget or that
            go non-finite are NaN-poisoned (-> -inf downstream), the
            same degradation as the XLA expm path. ``dt == 0`` lanes get
            P = I, q = 0 exactly; NaN-on-entry lanes stay NaN through
            the FMAs at no extra cost (no iteration budget to burn).
            """
            assert interior is None or not interior["T"], \
                "expm never merges (each capture costs a full propagation)"
            target = jnp.broadcast_to(dt_col, shape)
            t_base = t0_col + zeros
            u = f([zeros] * n_states, t_base, rate)
            cols = []
            for j in range(n_states):
                tangent = tuple(
                    jnp.ones(shape, dtype) if s == j else zeros
                    for s in range(n_states)
                )
                _, jv = jax.jvp(
                    lambda *x: f(list(x), t_base, rate),
                    tuple(zeros for _ in range(n_states)), tangent,
                )
                cols.append(list(jv))
            # Adt[i][j] = dt * df_i/dx_j, udt[i] = dt * f_i(0)
            Adt = [[cols[j][i] * target for j in range(n_states)]
                   for i in range(n_states)]
            udt = [u[i] * target for i in range(n_states)]
            norm = None
            for i in range(n_states):
                row = jnp.abs(udt[i])
                for j in range(n_states):
                    row = row + jnp.abs(Adt[i][j])
                norm = row if norm is None else jnp.maximum(norm, row)
            norm = jnp.maximum(norm, 1e-30)
            s_cnt = jnp.ceil(jnp.maximum(
                jnp.log2(norm), jnp.zeros_like(norm)))
            sc = jnp.exp2(-s_cnt)
            As = [[Adt[i][j] * sc for j in range(n_states)]
                  for i in range(n_states)]
            us = [udt[i] * sc for i in range(n_states)]

            def mm(X, Y):
                return [[_dotn(X[i], [Y[l][j] for l in range(n_states)])
                         for j in range(n_states)]
                        for i in range(n_states)]

            def mv(X, v):
                return [_dotn(X[i], v) for i in range(n_states)]

            # Taylor-Horner on the affine block form (engine/ode.py:706):
            # (P, q) <- (I + A P / d, (A q + u) / d). Both chains ride
            # lax.fori_loop: fully unrolling 13 + 16 matrix products per
            # segment multiplies the trace by ~30x and stalls compilation
            # (minutes on the CPU interpreter for a 10-subject test);
            # the loop bodies are tiny and loop overhead is negligible
            # next to the adaptive solvers' while_loops.
            def flat(Pm, qv):
                return tuple(e for row in Pm for e in row) + tuple(qv)

            def unflat(t):
                Pm = [[t[i * n_states + j] for j in range(n_states)]
                      for i in range(n_states)]
                return Pm, list(t[n_states * n_states:])

            inv_d = 1.0 / float(_EXPM_TAYLOR)
            P = [[As[i][j] * inv_d + (1.0 if i == j else 0.0)
                  for j in range(n_states)] for i in range(n_states)]
            q = [us[i] * inv_d for i in range(n_states)]

            def taylor_body(it_t, carry):
                Pm, qv = unflat(carry)
                d = float(_EXPM_TAYLOR - 1) - it_t.astype(dtype)
                inv = 1.0 / d
                AP = mm(As, Pm)
                Aq = mv(As, qv)
                Pn = [[AP[i][j] * inv + (1.0 if i == j else 0.0)
                       for j in range(n_states)] for i in range(n_states)]
                qn = [(Aq[i] + us[i]) * inv for i in range(n_states)]
                return flat(Pn, qn)

            P, q = unflat(jax.lax.fori_loop(
                0, _EXPM_TAYLOR - 1, taylor_body, flat(P, q)))

            # tile-adaptive squaring: lanes are masked per squaring exactly
            # like the XLA chain (engine/ode.py:765-769), but the loop runs
            # only to the TILE's max count (typical PK segments need 2-6 of
            # the worst-case 16) — lanes needing more than the budget are
            # poisoned below, identical to the XLA path's s > 16 guard
            s_tile = jnp.minimum(jnp.max(s_cnt), float(expm_squarings))

            def square_cond(carry):
                return carry[0] < s_tile

            def square_body(carry):
                it_sq = carry[0]
                Pm, qv = unflat(carry[1:])
                PP = mm(Pm, Pm)
                Pq = mv(Pm, qv)
                on = s_cnt > it_sq
                Pn = [[jnp.where(on, PP[i][j], Pm[i][j])
                       for j in range(n_states)] for i in range(n_states)]
                qn = [jnp.where(on, Pq[i] + qv[i], qv[i])
                      for i in range(n_states)]
                return (it_sq + 1.0,) + flat(Pn, qn)

            out_sq = jax.lax.while_loop(
                square_cond, square_body,
                (jnp.zeros((), dtype),) + flat(P, q))
            P, q = unflat(out_sq[1:])
            xs_new = [mv(P, list(xs))[i] + q[i] for i in range(n_states)]
            bad = s_cnt > float(expm_squarings)
            for i in range(n_states):
                bad = bad | ~jnp.isfinite(xs_new[i])
            live = target > 0.0
            nan = jnp.full(shape, jnp.nan, dtype)
            xs_out = [
                jnp.where(live, jnp.where(bad, nan, xn), x)
                for xn, x in zip(xs_new, xs)
            ]
            return xs_out, h, []

        def integrate_bdf(f, xs, h, dt_col, rate, t0_col,
                          estimate_h: bool, interior=None):
            """Variable-order (1-5) BDF march, all lanes — the in-kernel
            version of engine/ode._bdf_segment (SUNDIALS/ode15s family:
            quasi-constant steps, backward-difference array D[8][n] as
            per-lane state, kappa-stabilized fixed leading coefficient,
            frozen-Jacobian Newton reusing the SDIRK lane machinery).
            Per-lane order/step adaptation rides masked selects; the 6x6
            difference-array rescale RU^T @ D is applied as two masked
            static transforms (R(factor)^T then U^T), each 36*n lane FMAs.
            No dense-output interpolant -> merged runs never reach here.
            """
            assert interior is None or not interior["T"]
            MAXO = int(bdf_max_order)
            K6 = MAXO + 1
            target = jnp.broadcast_to(dt_col, shape)
            live0 = target > 0.0
            # a lane whose state arrives non-finite (poisoned by an
            # earlier segment) must NOT march: every trial would reject
            # on the finite check, and at tau=0 the stall guard
            # (tau + h <= tau) can never fire — the lane would silently
            # burn the ENTIRE iteration budget in every remaining
            # segment (measured: ~2% poisoned lanes made bdf psi ~860x
            # slower than trbdf2). Dead-on-entry lanes exit immediately
            # and stay NaN -> -inf downstream.
            for s_ in range(n_states):
                live0 = live0 & jnp.isfinite(xs[s_])

            def near(v, k):
                # order lanes hold exact small ints, but compiled Mosaic
                # fast-math may perturb select chains — use half-open
                # bands instead of float equality
                return (v > float(k) - 0.5) & (v < float(k) + 0.5)

            def tab_at(table, order_l, lo, hi):
                acc = zeros
                for k in range(lo, hi + 1):
                    ki = min(k, len(table) - 1)
                    acc = acc + jnp.where(
                        near(order_l, k), float(table[ki]), 0.0)
                return acc

            def rms_states(vs, scales):
                r2 = zeros
                for s in range(n_states):
                    r2 = r2 + (vs[s] / scales[s]) ** 2
                return jnp.sqrt(r2 / float(n_states))

            def change_D(D, order_l, fac):
                # lane R(fac): R[0][j]=1, R[i][0]=0 (i>=1),
                # R[i][j] = R[i-1][j] * (i-1-fac*j)/i
                R = [[None] * K6 for _ in range(K6)]
                for i in range(1, K6):
                    for j in range(1, K6):
                        m_ij = (float(i - 1) - fac * float(j)) / float(i)
                        R[i][j] = m_ij if i == 1 else R[i - 1][j] * m_ij

                def act(i, j):
                    return (order_l >= float(max(i, j)))

                # tmp = Rm^T @ D[:6]
                tmp = [[None] * n_states for _ in range(K6)]
                for a in range(K6):
                    for s in range(n_states):
                        acc = D[0][s] if a == 0 else (
                            jnp.where(act(0, a), 1.0, 0.0) * D[0][s])
                        for b in range(1, K6):
                            if a == 0:
                                continue  # Rm[b][0] = 0 off-diag, diag b>0
                            r_ba = R[b][a]
                            ent = jnp.where(
                                act(b, a), r_ba,
                                1.0 if b == a else 0.0)
                            acc = acc + ent * D[b][s]
                        tmp[a][s] = acc
                # out = Um^T @ tmp
                out = [[None] * n_states for _ in range(K6)]
                for c_ in range(K6):
                    for s in range(n_states):
                        acc = zeros
                        for a in range(K6):
                            u = float(_BDF_U[a][c_])
                            ent = jnp.where(
                                act(a, c_), u, 1.0 if a == c_ else 0.0)
                            acc = acc + ent * tmp[a][s]
                        out[c_][s] = acc
                return out + [row[:] for row in D[K6:]]

            def jac(xs_c, t_base):
                cols = []
                for j in range(n_states):
                    tangent = tuple(
                        jnp.ones(shape, dtype) if s == j else zeros
                        for s in range(n_states)
                    )
                    _, jv = jax.jvp(
                        lambda *x: f(list(x), t_base, rate),
                        tuple(xs_c), tangent,
                    )
                    cols.append(list(jv))
                return [[cols[j][i] for j in range(n_states)]
                        for i in range(n_states)]

            def one_trial(carry):
                (tau, D, h_c, order_l, neq, live_f, it_, trials,
                 nrej) = carry
                live = live_f > 0.5
                rem = target - tau
                # clip the step to the remaining span, rescaling history
                h_try = jnp.minimum(h_c, jnp.maximum(rem, 1e-14))
                fac_clip = h_try / jnp.maximum(h_c, 1e-30)
                clip = fac_clip < 1.0
                D_cl = change_D(D, order_l, fac_clip)
                D = [[jnp.where(clip, D_cl[i][s], D[i][s])
                      for s in range(n_states)]
                     for i in range(len(D))]
                neq = jnp.where(clip, zeros, neq)

                alpha_k = tab_at(_BDF_ALPHA, order_l, 1, MAXO)
                c = h_try / jnp.maximum(alpha_k, 1e-30)
                x_pred = [zeros] * n_states
                psi_v = [zeros] * n_states
                for i in range(K6):
                    wi = (order_l >= float(i)).astype(dtype)
                    gi = float(_BDF_GAMMA[i]) if i >= 1 else 0.0
                    for s in range(n_states):
                        x_pred[s] = x_pred[s] + wi * D[i][s]
                        if i >= 1:
                            psi_v[s] = psi_v[s] + wi * gi * D[i][s]
                psi_v = [p / jnp.maximum(alpha_k, 1e-30) * 1.0
                         for p in psi_v]
                scales = [atol + rtol * jnp.abs(x_pred[s])
                          for s in range(n_states)]
                t_new = t0_col + tau + h_try

                J = jac(x_pred, t_new)
                A_l = [
                    [
                        (1.0 if i == j else 0.0) - c * J[i][j]
                        for j in range(n_states)
                    ]
                    for i in range(n_states)
                ]
                Minv = _lane_inverse(A_l, n_states)
                d_l = [zeros] * n_states
                y = list(x_pred)
                for _ in range(newton_iters):
                    fy = f(y, t_new, rate)
                    res = [c * fy[s] - psi_v[s] - d_l[s]
                           for s in range(n_states)]
                    step = [
                        sum(Minv[s][j] * res[j] for j in range(n_states))
                        for s in range(n_states)
                    ]
                    d_l = [dd + st for dd, st in zip(d_l, step)]
                    y = [yy + st for yy, st in zip(y, step)]
                fy = f(y, t_new, rate)
                resid = [c * fy[s] - psi_v[s] - d_l[s]
                         for s in range(n_states)]

                ec_k = tab_at(_BDF_ERROR_CONST, order_l, 1, MAXO)
                err_norm = rms_states(
                    [ec_k * dd for dd in d_l], scales)
                res_norm = rms_states(resid, scales)
                finite = jnp.isfinite(err_norm)
                for s in range(n_states):
                    finite = finite & jnp.isfinite(y[s])
                converged = res_norm <= 0.1
                accept = live & (err_norm <= 1.0) & converged & finite

                # accepted-path difference update (in registers):
                # D[k+2] = d - D[k+1]; D[k+1] = d; D[i] += D[i+1] downward
                d_op1 = [zeros] * n_states  # D[order+1] pre-update
                for k in range(2, MAXO + 2):
                    w = near(order_l + 1.0, k).astype(dtype)
                    for s in range(n_states):
                        d_op1[s] = d_op1[s] + w * D[k][s]
                D_acc = []
                for i in range(len(D)):
                    is2 = near(order_l + 2.0, i)
                    is1 = near(order_l + 1.0, i)
                    D_acc.append([
                        jnp.where(is2, d_l[s] - d_op1[s],
                                  jnp.where(is1, d_l[s], D[i][s]))
                        for s in range(n_states)
                    ])
                for i in range(MAXO, -1, -1):
                    wi = (order_l >= float(i)).astype(dtype)
                    for s in range(n_states):
                        D_acc[i][s] = D_acc[i][s] + wi * D_acc[i + 1][s]

                neq_acc = neq + 1.0
                do_adapt = accept & (neq_acc > order_l)

                # order adaptation: error norms at order-1/order/order+1
                d_at_k = [zeros] * n_states    # D_acc[order]
                d_at_k2 = [zeros] * n_states   # D_acc[order+2]
                for k in range(1, MAXO + 1):
                    w = near(order_l, k).astype(dtype)
                    for s in range(n_states):
                        d_at_k[s] = d_at_k[s] + w * D_acc[k][s]
                        d_at_k2[s] = d_at_k2[s] + w * D_acc[k + 2][s]
                ec_m = tab_at(_BDF_ERROR_CONST, order_l - 1.0, 0,
                              MAXO - 1)
                ec_p = tab_at(_BDF_ERROR_CONST, order_l + 1.0, 2,
                              MAXO + 1)
                err_m = rms_states([ec_m * v for v in d_at_k], scales)
                err_p = rms_states([ec_p * v for v in d_at_k2], scales)
                e_mid = jnp.maximum(err_norm, 1e-16)

                def fac_of(e_, dord):
                    # explicit exp/log: Mosaic's pow with a LANE-varying
                    # exponent is the prime suspect for the compiled-only
                    # controller traps (constant-exponent pow elsewhere
                    # compiles fine); exp/log are known-good lowerings
                    return jnp.exp(
                        jnp.log(jnp.maximum(e_, 1e-16))
                        * (-1.0 / (order_l + dord)))

                f_m = fac_of(err_m, 0.0)
                f_0 = fac_of(e_mid, 1.0)
                f_p = fac_of(err_p, 2.0)
                f_m = jnp.where(
                    (order_l > 1.0) & jnp.isfinite(f_m), f_m, -1.0)
                f_p = jnp.where(
                    (order_l < float(MAXO))
                    & jnp.isfinite(f_p), f_p, -1.0)
                # argmax over {m, 0, p} with the middle winning ties
                best_p = (f_p > f_0) & (f_p > f_m)
                best_m = (f_m > f_0) & ~best_p
                order_adapted = jnp.clip(
                    order_l + jnp.where(best_p, 1.0,
                                        jnp.where(best_m, -1.0, 0.0)),
                    1.0, float(MAXO))
                fac_best = jnp.where(best_p, f_p,
                                     jnp.where(best_m, f_m, f_0))
                factor_adapt = jnp.clip(0.9 * fac_best, 0.2,
                                         bdf_max_growth)

                factor_rej = jnp.where(
                    finite & converged,
                    jnp.clip(0.9 * fac_of(jnp.maximum(err_norm, 1e-16),
                                          1.0), 0.2, 1.0),
                    0.25,
                )
                factor = jnp.where(
                    accept,
                    jnp.where(do_adapt, factor_adapt, 1.0),
                    factor_rej,
                )
                order_n = jnp.where(do_adapt, order_adapted, order_l)
                # SUNDIALS-style robustness: a 3rd consecutive rejection
                # hard-resets to order 1 at h/4 — clears high-order
                # history the f32 error estimates can no longer trust
                # (without this, ~2% of lanes fall into collapse/recover
                # cycles that burn thousands of trials)
                nrej_n = jnp.where(accept, zeros, nrej + 1.0)
                hard = ~accept & (nrej >= 2.0) & live
                order_n = jnp.where(hard, 1.0, order_n)
                factor = jnp.where(hard, 0.25, factor)
                nrej_n = jnp.where(hard, zeros, nrej_n)
                # escape hatch for the f32 alternating accept/reject
                # limit cycle: the quasi-constant policy only grows h
                # after order+1 CONSECUTIVE accepts, so a lane whose
                # err estimate noise-flips around 1.0 can never grow and
                # trudges at a tiny step forever (measured: ~16k trials
                # on ~2% of lanes, bit-identical under controller tweaks
                # that only fire on consecutive rejections). An accept
                # whose error is clearly small grows 1.4x immediately —
                # the difference array is rescaled exactly either way.
                grow_now = accept & ~do_adapt & (err_norm < 0.25)
                factor = jnp.where(grow_now, 1.4, factor)
                neq_n = jnp.where(
                    accept & ~do_adapt & ~grow_now, neq_acc, zeros)
                D_sel = [
                    [jnp.where(accept, D_acc[i][s], D[i][s])
                     for s in range(n_states)]
                    for i in range(len(D))
                ]
                D_fac = change_D(D_sel, order_n, factor)
                refac = factor != 1.0
                D_n = [
                    [jnp.where(live & refac, D_fac[i][s], D_sel[i][s])
                     for s in range(n_states)]
                    for i in range(len(D))
                ]
                tau_n = jnp.where(accept, tau + h_try, tau)
                h_n = jnp.where(
                    live, jnp.maximum(h_try * factor, 1e-14), h_c)
                done_n = tau_n >= target - 1e-6 * jnp.maximum(
                    target, 1e-30)
                stalled = live & ((tau_n + h_n) <= tau_n) & ~done_n
                live_n = live & ~done_n & ~stalled
                return (tau_n, D_n, h_n, order_n, neq_n,
                        live_n.astype(live_f.dtype), it_ + 1,
                        trials + live_f, nrej_n)

            def body(carry):
                for _ in range(max(1, unroll)):
                    carry = one_trial(carry)
                return carry

            def cond(carry):
                live_f, it_ = carry[5], carry[6]
                return (it_ < max_iters) & (jnp.max(live_f) > 0.5)

            h_start = jnp.minimum(h, jnp.maximum(target, 1e-14))
            f0 = f(xs, t0_col, rate)
            D0 = [[zeros] * n_states
                  for _ in range(MAXO + 3)]
            D0[0] = [x + zeros for x in xs]
            D0[1] = [h_start * k for k in f0]
            init = (zeros, D0, h_start, jnp.full(shape, 1.0, dtype),
                    zeros, live0.astype(dtype), jnp.zeros((), jnp.int32),
                    zeros, zeros)
            out_c = jax.lax.while_loop(cond, body, init)
            tau_f, D_f, h_f, trials_f = out_c[0], out_c[1], out_c[2], out_c[7]
            dbg_acc[0] = dbg_acc[0] + trials_f
            incomplete = tau_f < target - 1e-6 * jnp.maximum(target, 1e-30)
            nan = jnp.full(shape, jnp.nan, dtype)
            xs_out = [jnp.where(incomplete, nan, D_f[0][s])
                      for s in range(n_states)]
            h_out = jnp.where(live0, h_f, h)
            return xs_out, h_out, []

        if has_init:
            im = col(initm, 0)
            xs = [im * init_rows[s] + zeros for s in range(n_states)]
        else:
            xs = [zeros] * n_states
        ll = zeros
        dbg_acc = [zeros]  # per-lane BDF trial counts (debug_trials)
        h = jnp.full(shape, h0, dtype)
        f_const = None if any(cov_affine) else make_f(const_lanes)
        if has_lag:
            pend_amt = [zeros] * n_bolus_in
            pend_rem = [zeros] * n_bolus_in

        run_list = (tuple(runs) if runs
                    else tuple((m, m + 1) for m in range(n_seg)))
        for (m0, m1) in run_list:
            m = m0
            dt = col(dts, m)
            bol = col(bols_l[0], m)
            mask = col(masks, m)
            val = col(vals, m)
            sig = col(sigs, m) + (1.0 - mask)

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
                oe = col(outeqs, m)
                pred = jnp.zeros_like(ll)
                for k in range(n_out):
                    pred = pred + (oe == float(k)).astype(ll.dtype) * pred_out(k)

            s_c = col(censs, m) if has_cens else None
            ll = ll + _obs_ll(val, pred, sig, mask, s_c, has_cens)

            rate = [col(r, m) for r in rates_l] if has_inf else None
            t0_col = col(t0s, m)
            cov_m = cov_for_seg(m) if any(cov_affine) else const_lanes
            f_m = make_f(cov_m) if any(cov_affine) else f_const
            march = (integrate_expm if use_expm
                     else integrate_bdf if use_bdf
                     else integrate_sdirk if sdirk is not None
                     else integrate)

            def apply_dose(xs_d, jb, amt, t_abs, _cov=cov_m, _rate=rate):
                """Dose ``amt`` (already fa-scaled / fire-masked) into
                input ``jb``. Static map: precomputed per-unit state
                increment rows. rhs_diff: the reference's in-kernel
                difference trick (ode/mod.rs:644-687) — two RHS calls at
                the boundary honor state-dependent / nonlinear bolus
                mappings exactly (a zero amount yields a zero delta, so
                fire masks fold into ``amt``)."""
                if not bolus_rhs_diff:
                    return [x + amt * bmaps[jb][s]
                            for s, x in enumerate(xs_d)]
                b_lanes = {bolus_inputs[jb]: amt}
                d_w = rhs(xs_d, params, t_abs, _rate, _cov, shape, dtype,
                          b_lanes)
                d_o = rhs(xs_d, params, t_abs, _rate, _cov, shape, dtype)
                return [x + (w - o)
                        for x, w, o in zip(xs_d, d_w, d_o)]

            def fa_src(jb, _m=m):
                """fa plane for input jb at segment _m (None = scale 1):
                slot tables select the per-dose-segment plane when the fa
                closure is time- or tv-covariate-dependent; slot -1 means
                the host proved no bolus lands at that column."""
                if not has_fa:
                    return None
                if fa_slots is not None:
                    si = fa_slots[jb][_m]
                    return None if si < 0 else fa_planes[si]
                return fa_planes[jb]

            def lag_src(jb, _m=m):
                if lag_slots is not None:
                    si = lag_slots[jb][_m]
                    return None if si < 0 else lag_planes[si]
                return lag_planes[jb]

            def amt_for(jb, _m=m, _bol=bol):
                a = _bol if jb == 0 else col(bols_l[jb], _m)
                f_ = fa_src(jb, _m)
                return a * f_ if f_ is not None else a

            if m1 > m0 + 1:
                # merged run: the host plan proved columns m0+1..m1-1 are
                # observation-only breakpoints (no dose on any row, rate
                # and covariate streams unchanged, contiguous times) — the
                # march crosses them with dense output instead of stopping
                for jb in range(n_bolus_in):
                    xs = apply_dose(xs, jb, amt_for(jb), t0_col)
                dt_run = dt
                t_offs = []
                for mm in range(m0 + 1, m1):
                    t_offs.append(dt_run)
                    dt_run = dt_run + col(dts, mm)
                interior = {
                    "T": t_offs,
                    "oe": [col(outeqs, mm) if has_outeq else None
                           for mm in range(m0 + 1, m1)],
                }
                xs, h, preds = march(
                    f_m, xs, h, dt_run, rate, t0_col,
                    estimate_h=(m0 == 0), interior=interior,
                )
                for j, mm in enumerate(range(m0 + 1, m1)):
                    mask_j = col(masks, mm)
                    val_j = col(vals, mm)
                    sig_j = col(sigs, mm) + (1.0 - mask_j)
                    pred_j = preds[j]
                    if has_bias:
                        if n_out == 1:
                            pred_j = pred_j + biases[0]
                        else:
                            oe_j = interior["oe"][j]
                            for k in range(n_out):
                                pred_j = pred_j + (
                                    (oe_j == float(k)).astype(ll.dtype)
                                    * biases[k]
                                )
                    s_cj = col(censs, mm) if has_cens else None
                    ll = ll + _obs_ll(val_j, pred_j, sig_j, mask_j, s_cj,
                                      has_cens)
                continue
            if not has_lag:
                for jb in range(n_bolus_in):
                    xs = apply_dose(xs, jb, amt_for(jb), t0_col)
                xs, h, _ = march(f_m, xs, h, dt, rate, t0_col,
                                 estimate_h=(m == 0))
            else:
                # doses due exactly at this breakpoint (rem elapsed) fire
                # first — after the observation above, before new doses
                # can park in their slots
                for jb in range(n_bolus_in):
                    fire0 = (pend_amt[jb] != 0.0) & (pend_rem[jb] <= 0.0)
                    amt0 = jnp.where(fire0, pend_amt[jb], zeros)
                    xs = apply_dose(xs, jb, amt0, t0_col)
                    pend_amt[jb] = jnp.where(fire0, zeros, pend_amt[jb])
                # arrivals: park each input's (fa-scaled) dose with its
                # per-lane lag; a None lag source means the host plan
                # proved no bolus lands at this column (slot -1), so the
                # arrival code is statically skipped
                for jb in range(n_bolus_in):
                    lp_ = lag_src(jb)
                    if lp_ is None:
                        continue
                    bol_j = bol if jb == 0 else col(bols_l[jb], m)
                    amt_j = amt_for(jb)
                    arrive = bol_j != 0.0
                    pend_amt[jb] = jnp.where(
                        arrive, pend_amt[jb] + amt_j, pend_amt[jb])
                    pend_rem[jb] = jnp.where(
                        arrive, lp_ + zeros, pend_rem[jb])
                # split march: one pass per input, each advancing to the
                # next earliest per-lane fire time (equal times fire
                # together; for one input this is the classic two-piece
                # split)
                dt_b = jnp.broadcast_to(dt, shape)
                elapsed = zeros
                for p_ in range(n_bolus_in):
                    will = [(pend_amt[jb] != 0.0) & (pend_rem[jb] < dt_b)
                            for jb in range(n_bolus_in)]
                    t_next = dt_b
                    for jb in range(n_bolus_in):
                        t_next = jnp.minimum(
                            t_next,
                            jnp.where(will[jb], pend_rem[jb], dt_b),
                        )
                    t_next = jnp.maximum(t_next, elapsed)
                    xs, h, _ = march(f_m, xs, h, t_next - elapsed, rate,
                                     t0_col + elapsed,
                                     estimate_h=(m == 0 and p_ == 0))
                    for jb in range(n_bolus_in):
                        fire = will[jb] & (pend_rem[jb] <= t_next)
                        amt_f = jnp.where(fire, pend_amt[jb], zeros)
                        xs = apply_dose(xs, jb, amt_f, t0_col + t_next)
                        pend_amt[jb] = jnp.where(fire, zeros, pend_amt[jb])
                    elapsed = t_next
                xs, h, _ = march(f_m, xs, h, dt_b - elapsed, rate,
                                 t0_col + elapsed, estimate_h=False)
                live = dt_b > 0.0
                for jb in range(n_bolus_in):
                    pend_rem[jb] = jnp.where(
                        (pend_amt[jb] != 0.0) & live,
                        pend_rem[jb] - dt_b, pend_rem[jb],
                    )

        out_ref[:, :] = dbg_acc[0] if debug_trials else ll

    return kernel


def _wsum(terms, weights):
    """Weighted sum of lane arrays, skipping zero coefficients."""
    acc = None
    for t, w in zip(terms, weights):
        if w == 0.0:
            continue
        acc = t * w if acc is None else acc + t * w
    if acc is None:
        return jnp.zeros_like(terms[0])
    return acc


def psi_ode(
    seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma, obs_cens,
    seg_t0, support, diffeq,
    *,
    n_states: int,
    ninput: int = None,
    solver: str = "dopri5",
    rtol: float = 1e-4,
    atol: float = 1e-4,
    h0: float = 1e-3,
    max_iters: int = 10_000,
    unroll: int = 4,
    newton_iters: int = 4,
    controller: str = None,
    obs_outeq=None,
    out_coef=None,
    out_bias=None,
    bolus_map=None,
    bolus_rhs_diff: bool = False,
    init_rows=None,
    init_planes=None,
    init_mask=None,
    cov_streams=None,
    cov_names=(),
    lag_plane=None,
    fa_plane=None,
    lag_slots=None,
    fa_slots=None,
    bolus_inputs=(0,),
    rate_inputs=(0,),
    merge_runs=None,
    rhs_style: str = "lanes",
    interpret: Optional[bool] = None,
):
    """Fused psi for ODE models: one pallas kernel per tile.

    Segment streams are [R, M] exactly as :func:`pallas_psi.psi_oral`, plus
    ``seg_t0`` [R, M] (segment start times — the RHS may read t) and the
    per-support probe products:

    - ``bolus_map`` [n_states, S] (single input) or [nb, n_states, S]:
      state increment per unit dose into each input in ``bolus_inputs``
      (the RHS-difference probe result; ode/mod.rs:644-687). Multi-input
      models pass ``seg_bolus`` / ``seg_rateiv`` as [R, M, nb] /
      [R, M, nr] stacked per active input, with ``bolus_inputs`` /
      ``rate_inputs`` naming the RHS input index of each slice;
    - ``out_coef`` [n_out, n_states, S] / ``out_bias`` [n_out, S]: linear
      output extraction (pallas_psi.extract_linear_out);
    - ``init_rows`` [n_states, S] + ``init_mask`` [R, M] (lane 0): initial
      state on occasion-0 rows; ``init_planes`` [n_states, R, S] instead
      when the init equation reads covariates (per-(row, support) values,
      mutually exclusive with ``init_rows``);
    - ``cov_streams`` {name: [R, M] (lane 0 = the row's constant value) or
      an ``(a, b)`` pair of [R, M] per-segment affine streams for
      time-varying covariates: cov(t) = a[m] + b[m] * t inside segment m};
    - ``lag_plane`` / ``fa_plane``: per-(row, support) dose lag shift /
      bioavailability scale — one [R, S] plane, or a sequence of one
      plane per bolus input for multi-drug regimens (the kernel's
      per-input pending-dose split march / amount scaling; see
      _make_ode_kernel). With ``lag_slots`` / ``fa_slots`` (static
      [n_bolus_inputs][M] tables of plane indices, -1 = no dose at that
      column) the sequence is instead slot-indexed per-DOSE-SEGMENT
      planes — the exact-evaluation path for time-dependent closures and
      closures that read a time-varying covariate;
    - ``merge_runs``: static tuple of (m0, m1) column spans. Within a span
      the adaptive march does NOT stop at interior breakpoints — the host
      caller must have proven they are observation-only (no dose on any
      row, rate/covariate streams unchanged, contiguous t0) — and interior
      observations are captured from the tableau's dense-output
      interpolant (dopri5: Shampine's 4th-order quartic; tsit5: a quartic
      DERIVED from the continuous-extension order conditions at build
      time — dense_P_for; SDIRK solvers: cubic Hermite on
      (x0, f0, x1, f1), order-matched for these stiffly-accurate
      2nd/3rd-order tableaus — error within the integration tolerance
      either way). Spans must tile [0, M) consecutively; requires no
      lag. ``None`` = one span per segment (the classic
      stop-at-every-breakpoint march).

    Returns psi [R, S]. R must be a multiple of SUB_TILE, S of SP_TILE.
    """
    from jax.experimental import pallas as pl

    if controller is None:
        controller = os.environ.get("PHARMSOL_ODE_CONTROLLER", "i")
    if controller not in ("i", "pi"):
        raise ValueError(
            f"controller must be 'i' or 'pi' (got `{controller}`)"
        )
    use_bdf = solver == "bdf"
    use_expm = solver == "expm"
    if solver in _TABLEAUS:
        A, B, E, C = _TABLEAUS[solver]
        sdirk = None
    elif solver in _SDIRK_TABLEAUS:
        A = B = E = C = None
        sdirk = _SDIRK_TABLEAUS[solver]
    elif use_bdf or use_expm:
        A = B = E = C = None
        sdirk = None
    else:
        raise ValueError(
            f"pallas ODE psi supports solvers "
            f"{sorted(_TABLEAUS) + sorted(_SDIRK_TABLEAUS) + ['bdf', 'expm']}"
            f" (got `{solver}`)"
        )
    R, M = seg_dt.shape
    S = support.shape[0]
    n_params = support.shape[1]
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
            f"compiled pallas ODE kernels are float32-only (got {dtype}); "
            "cast the streams/support to float32 or pass interpret=True"
        )
    if bolus_map is None and not bolus_rhs_diff:
        raise ValueError(
            "bolus_map [n_states, S] is required (or pass "
            "bolus_rhs_diff=True for in-kernel RHS-difference dosing)"
        )
    if out_coef is None:
        raise ValueError("out_coef [n_out, n_states, S] is required")

    has_inf = _static_any(seg_rateiv)
    has_cens = _static_any(obs_cens)
    if init_rows is not None and init_planes is not None:
        raise ValueError("pass init_rows OR init_planes, not both")
    has_init = init_rows is not None or init_planes is not None
    init_mode = "planes" if init_planes is not None else "rows"
    zeros_rm = jnp.zeros_like(jnp.asarray(seg_dt, dtype))
    bolus_inputs = tuple(int(j) for j in bolus_inputs)
    rate_inputs = tuple(int(j) for j in rate_inputs)
    sb = jnp.asarray(seg_bolus, dtype)
    bol_list = ([sb] if sb.ndim == 2
                else [sb[..., i] for i in range(sb.shape[-1])])
    if len(bol_list) != len(bolus_inputs):
        raise ValueError(
            f"seg_bolus carries {len(bol_list)} input slices, bolus_inputs "
            f"names {len(bolus_inputs)}"
        )
    if seg_rateiv is None:
        rate_list = [zeros_rm]
    else:
        sr = jnp.asarray(seg_rateiv, dtype)
        rate_list = ([sr] if sr.ndim == 2
                     else [sr[..., i] for i in range(sr.shape[-1])])
    if len(rate_list) != len(rate_inputs):
        raise ValueError(
            f"seg_rateiv carries {len(rate_list)} input slices, rate_inputs "
            f"names {len(rate_inputs)}"
        )
    if obs_cens is None:
        obs_cens = zeros_rm
    out_coef = jnp.asarray(out_coef, dtype)
    n_out = out_coef.shape[0]
    if out_coef.shape != (n_out, n_states, S):
        raise ValueError(
            f"out_coef must be [n_out, {n_states}, {S}], got {out_coef.shape}"
        )
    has_outeq = n_out > 1
    if has_outeq and obs_outeq is None:
        raise ValueError("obs_outeq stream required for multi-output psi")
    if obs_outeq is None:
        obs_outeq = zeros_rm
    has_bias = _static_any(out_bias)

    cov_names = tuple(cov_names)
    cov_list = []
    cov_affine = []
    for name in cov_names:
        entry = (cov_streams or {})[name]
        if isinstance(entry, tuple):  # per-segment affine (a, b) streams
            cov_affine.append(True)
            cov_list.append(jnp.asarray(entry[0], dtype))
            cov_list.append(jnp.asarray(entry[1], dtype))
        else:
            cov_affine.append(False)
            cov_list.append(jnp.asarray(entry, dtype))
    cov_affine = tuple(cov_affine)

    nb = len(bol_list)
    nr = len(rate_list)
    full = [
        _pad_lanes(jnp.asarray(a, dtype), SEG_PAD)
        for a in ([seg_dt] + bol_list + rate_list
                  + [obs_mask, obs_value, obs_sigma, obs_cens, obs_outeq,
                     seg_t0])
    ]
    i_mask = 1 + nb + nr
    # masked sigma lanes -> 0 (kernel re-adds 1)
    full[i_mask + 2] = full[i_mask + 2] * full[i_mask]
    if has_init:
        full.append(_pad_lanes(jnp.asarray(init_mask, dtype), SEG_PAD))
    full.extend(_pad_lanes(cs, SEG_PAD) for cs in cov_list)
    n_head = 1 + nb + nr + 6
    include = ([True] + [True] * nb + [has_inf] * nr
               + [True, True, True, has_cens, has_outeq, True]
               + [True] * (len(full) - n_head))
    streams = [a for a, inc in zip(full, include) if inc]

    sp = jnp.asarray(support, dtype)
    p_rows = [sp[:, i].reshape(1, S) for i in range(n_params)]
    if not bolus_rhs_diff:
        bm = jnp.asarray(bolus_map, dtype)
        if bm.ndim == 2:
            bm = bm.reshape(1, n_states, S)
        if bm.shape != (nb, n_states, S):
            raise ValueError(
                f"bolus_map must be [{nb}, {n_states}, {S}], got {bm.shape}"
            )
        p_rows += [bm[j, s].reshape(1, S)
                   for j in range(nb) for s in range(n_states)]
    if has_init and init_mode == "rows":
        ir = jnp.asarray(init_rows, dtype)
        p_rows += [ir[s].reshape(1, S) for s in range(n_states)]
    p_rows += [
        out_coef[k, i].reshape(1, S)
        for k in range(n_out) for i in range(n_states)
    ]
    if has_bias:
        ob = jnp.asarray(out_bias, dtype)
        p_rows += [ob[k].reshape(1, S) for k in range(n_out)]

    def as_plane_list(p, slots, what):
        """Normalize a plane argument: one [R, S] plane per bolus input
        (``slots`` None), or a flat slot-indexed list selected per
        (input, segment) by the static ``slots`` table."""
        if p is None:
            return None
        lst = list(p) if isinstance(p, (list, tuple)) else [p]
        if slots is None:
            expect = nb
        else:
            if len(slots) != nb or any(len(rw) != M for rw in slots):
                raise ValueError(
                    f"{what} slots must be [{nb}][{M}] (input x segment)"
                )
            expect = max(max(rw) for rw in slots) + 1
        if len(lst) == 1 and expect > 1:
            raise ValueError(
                f"{what} must carry {expect} [R, S] planes"
            )
        if len(lst) != expect:
            raise ValueError(
                f"{what} carries {len(lst)} planes, expected {expect}"
            )
        out = []
        for arr in lst:
            arr = jnp.asarray(arr, dtype)
            if arr.shape != (R, S):
                raise ValueError(
                    f"{what} must be [R, S] = [{R}, {S}], got {arr.shape}"
                )
            out.append(arr)
        return out

    if lag_slots is not None:
        lag_slots = tuple(tuple(int(x) for x in rw) for rw in lag_slots)
    if fa_slots is not None:
        fa_slots = tuple(tuple(int(x) for x in rw) for rw in fa_slots)
    lag_list = as_plane_list(lag_plane, lag_slots, "lag_plane")
    fa_list = as_plane_list(fa_plane, fa_slots, "fa_plane")
    has_lag = lag_list is not None
    has_fa = fa_list is not None
    planes = []
    if has_lag:
        planes.extend(lag_list)
    if has_fa:
        planes.extend(fa_list)
    if init_planes is not None:
        ip = jnp.asarray(init_planes, dtype)
        if ip.shape != (n_states, R, S):
            raise ValueError(
                f"init_planes must be [{n_states}, {R}, {S}], got {ip.shape}"
            )
        planes.extend(ip[s] for s in range(n_states))

    dense_P = dense_P_for(solver)
    if merge_runs is not None:
        merge_runs = tuple((int(a), int(b)) for a, b in merge_runs)
        if dense_P is None and sdirk is None:
            raise ValueError(
                f"merge_runs requires a dense-output interpolant "
                f"(solver `{solver}` has none; SDIRK solvers use cubic "
                f"Hermite)"
            )
        if has_lag:
            raise ValueError("merge_runs is incompatible with lag planes")
        flat = [0]
        for a, b in merge_runs:
            if a != flat[-1] or b <= a:
                raise ValueError(
                    f"merge_runs must tile [0, {M}) consecutively, got "
                    f"{merge_runs}"
                )
            flat.append(b)
        if flat[-1] != M:
            raise ValueError(
                f"merge_runs must cover all {M} segments, got {merge_runs}"
            )
    rhs = (make_stacked_rhs if rhs_style == "stacked"
           else make_lane_rhs)(
        diffeq, n_states, n_params, ninput, rate_inputs)
    kernel = _make_ode_kernel(
        rhs, n_states=n_states, n_params=n_params, n_seg=M, has_inf=has_inf,
        has_cens=has_cens, n_out=n_out, has_bias=has_bias, has_init=has_init,
        cov_names=cov_names, cov_affine=cov_affine,
        has_lag=has_lag, has_fa=has_fa,
        n_lag_planes=len(lag_list) if has_lag else 0,
        n_fa_planes=len(fa_list) if has_fa else 0,
        lag_slots=lag_slots, fa_slots=fa_slots,
        n_bolus_in=nb, n_rate_in=nr,
        bolus_rhs_diff=bolus_rhs_diff, bolus_inputs=bolus_inputs,
        A=A, B=B, E=E, C=C, sdirk=sdirk, use_bdf=use_bdf,
        use_expm=use_expm,
        # order cap 3 for the f32 in-kernel tier: orders 4-5 backward
        # differences sit at the f32 noise floor, and the controller
        # reading noise as error drives a near-permanent accept/reject
        # oscillation (measured: a smooth 2-cmt lane burned the full 10k
        # budget at cap 5, converged ~50 iters at cap 3; the f64 XLA
        # engine keeps the full 1-5 range). Round 5 ran the promised
        # mixed-precision experiment — a compensated (Knuth two-sum)
        # difference array with a compensation row per D row — and
        # reverted it per keep-only-if-it-wins: CPU-interpret parity was
        # unchanged at every order (1.2-1.5e-4, budget 2e-3), and while
        # compensation DOES stabilize order 5 on-chip (finite cells,
        # completes), it ran 1.90M sims/s with a 628 s Mosaic compile
        # vs the plain order-3 kernel's 5.16M / 38 s — the doubled
        # while-carry is a pure loss (benches/recorded/
        # r05_bdf_mixed.json; same-session A/B, 512x128 TMDD rtol 1e-4)
        bdf_max_order=int(os.environ.get("PHARMSOL_BDF_MAX_ORDER", "3")),
        bdf_max_growth=float(
            os.environ.get("PHARMSOL_BDF_MAX_GROWTH", "10.0")),
        debug_trials=os.environ.get("PHARMSOL_ODE_DEBUG_TRIALS") == "1",
        rtol=float(rtol),
        atol=float(atol), h0=float(h0), max_iters=int(max_iters),
        unroll=int(unroll), newton_iters=int(newton_iters),
        controller=controller, init_mode=init_mode,
        runs=merge_runs, dense_P=dense_P,
        # measured on-chip (4096x256 dopri5, same session): the
        # cond-guarded "lazy" capture is 0.88x the eager per-trial one —
        # the scalar scf.if plus the preds carried through both branches
        # cost more than the skipped stage-slope contraction, so eager
        # stays the default (hook kept for re-measurement on other chips)
        lazy_capture=os.environ.get("PHARMSOL_ODE_LAZY_CAPTURE") == "1",
    )

    row_block = next(b for b in ODE_ROW_BLOCKS if R % b == 0)
    sp_block = next(b for b in ODE_SP_BLOCKS if S % b == 0)
    # the stepper holds ~(stages+2) * n_states lanes live; shrink tiles as
    # the state count grows so the working set stays inside VMEM (the
    # measured 32x128 sweet spot covers the 1-4 state PK families)
    budget = max(ODE_TILE_BUDGET // max(1, (n_states + 3) // 4), 8 * 128)
    if sdirk is not None or use_bdf:
        # the frozen Jacobian + its inverse add ~2*n^2 live lane arrays;
        # BDF additionally carries the 8*n difference array
        budget = max(budget // 2, 8 * 128)
    while row_block * sp_block > budget and row_block > 8:
        row_block //= 2
    override = os.environ.get("PHARMSOL_ODE_ROW_BLOCK")
    if override:  # perf-experiment hook (scripts/tpu_ode_psi_ab.py A/Bs)
        rb = int(override)
        if R % rb == 0:
            row_block = rb
    sp_override = os.environ.get("PHARMSOL_ODE_SP_BLOCK")
    if sp_override:
        sb_ = int(sp_override)
        if S % sb_ == 0 and sb_ % 128 == 0:
            sp_block = sb_
    row_spec = pl.BlockSpec((row_block, SEG_PAD), lambda i, j: (i, 0))
    p_spec = pl.BlockSpec((1, sp_block), lambda i, j: (0, j))
    tile_spec = pl.BlockSpec((row_block, sp_block), lambda i, j: (i, j))

    def call():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, S), dtype),
            grid=(R // row_block, S // sp_block),
            in_specs=([row_spec] * len(streams) + [tile_spec] * len(planes)
                      + [p_spec] * len(p_rows)),
            out_specs=tile_spec,
            interpret=interpret,
        )(*streams, *planes, *p_rows)

    if dtype == jnp.float32:
        # see pallas_psi.psi_oral: trace with x64 disabled so the grid
        # pipeline never picks up an i64 scalar Mosaic cannot legalize
        with jax.enable_x64(False):
            return call()
    return call()
