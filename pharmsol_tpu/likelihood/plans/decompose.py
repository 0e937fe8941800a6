"""Shared host-side decomposition machinery for the fused psi plans.

Everything here turns model structure (covariates, seq chains, lag/fa,
kernel inputs) into the static streams and per-(row, support) planes the
pallas kernels consume.  Split out of likelihood/matrix.py in round 5
(VERDICT item 5) as pure code movement — behavior, plan cache keys and
error messages are bit-identical; the parity suites pin them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import float_dtype
from ...errors import PharmsolError

def _pallas_structure_name(equation) -> str:
    """Map an Analytical equation's kernel fn to a pallas psi structure."""
    from ...engine.analytical import KERNELS
    from ...ops.pallas_psi import STRUCTURES

    declared = getattr(equation, "_pallas_structure", None)
    if declared is not None:  # declarative authoring surface names it directly
        if declared not in STRUCTURES:
            raise PharmsolError(
                f"analytical structure `{declared}` has no pallas psi "
                f"structure (available: {', '.join(sorted(STRUCTURES))})"
            )
        return declared
    eq_fn = getattr(equation, "_eq", None)
    for name, (fn, _, _) in KERNELS.items():
        if fn is eq_fn:
            if name not in STRUCTURES:
                raise PharmsolError(
                    f"analytical kernel `{name}` has no pallas psi structure "
                    f"(available: {', '.join(sorted(STRUCTURES))})"
                )
            return name
    raise PharmsolError(
        "engine='pallas' requires an Analytical equation built on a named "
        "built-in kernel (one_compartment, two_compartments, "
        "*_with_absorption, *_cl, ...)"
    )


def _constant_covariate_values(grid) -> dict:
    """Per-row covariate values, requiring time-constant covariates.

    The pallas path folds covariates into per-row parameter multipliers, so
    each covariate must hold one value for the whole occasion row (a single
    knot, or identical knot values — padding repeats the last knot).
    """
    cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)  # [R, ncov, K]
    if cov_v.ndim != 3 or not grid.cov_names:
        return {}
    if not np.all(cov_v == cov_v[..., :1]):
        raise PharmsolError(
            "engine='pallas' supports time-constant covariates only "
            "(a covariate changes value within an occasion; use the "
            "default XLA engine)"
        )
    return {name: cov_v[:, c, 0] for c, name in enumerate(grid.cov_names)}


def _classify_covariates(grid):
    """Split covariates into time-constant and time-varying sets.

    Returns ``(row_values, varying)``: ``row_values[name]`` is the per-row
    value at the row's first knot (the probe reference — and the exact
    per-row constant for non-varying covariates); ``varying`` holds the
    names whose value changes within at least one occasion row.
    """
    cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)  # [R, ncov, K]
    if cov_v.ndim != 3 or not grid.cov_names:
        return {}, set()
    row_values = {}
    varying = set()
    for c, name in enumerate(grid.cov_names):
        row_values[name] = cov_v[:, c, 0]
        if not np.all(cov_v[:, c, :] == cov_v[:, c, :1]):
            varying.add(name)
    return row_values, varying


def _covariate_values_at(grid, tq: float):
    """Exact per-row covariate values at absolute time ``tq``.

    Mirrors the reference interpolation (covariate.rs: linear between
    knots, clamped outside the knot range, carry-forward for ``!`` fixed
    covariates). Returns ``{name: [R] float64}`` — used to evaluate
    covariate-dependent init equations at t=0 (engine/sim.py applies
    init at t=0.0; analytical/mod.rs:408-426).
    """
    cov_t = np.asarray(grid.rows.cov_t, np.float64)  # [R, ncov, K]
    cov_v = np.asarray(grid.rows.cov_v, np.float64)
    if cov_t.ndim != 3 or not grid.cov_names:
        return {}
    fixed = np.asarray(grid.rows.cov_fixed)
    rr = np.arange(cov_t.shape[0])
    out = {}
    for c, name in enumerate(grid.cov_names):
        ts, vs = cov_t[:, c, :], cov_v[:, c, :]
        K = ts.shape[1]
        tcl = np.clip(tq, ts[:, 0], ts[:, -1])
        idx = np.clip((ts <= tcl[:, None]).sum(-1) - 1, 0, K - 1)
        nxt = np.minimum(idx + 1, K - 1)
        tk0, tk1 = ts[rr, idx], ts[rr, nxt]
        vk0, vk1 = vs[rr, idx], vs[rr, nxt]
        denom = np.where(tk1 > tk0, tk1 - tk0, 1.0)
        lin = np.where(
            tk1 > tk0, vk0 + (vk1 - vk0) * (tcl - tk0) / denom, vk0
        )
        out[name] = np.where(fixed[:, c].astype(bool), vk0, lin)
    return out


def _affine_covariate_streams(grid, names, seg_t0, seg_dt):
    """Per-segment affine ``(a, b)`` streams for time-varying covariates.

    The reference interpolation (covariate.rs: linear between knots, clamp
    outside the knot range, carry-forward for ``!`` fixed covariates) is
    affine within any time span containing no interior knot — so inside an
    integration segment cov(t) = a + b*t EXACTLY, provided every knot falls
    on a segment boundary. Validates that and returns the coefficient
    streams; raises PharmsolError (``engine='auto'`` then falls back to the
    XLA engine, whose CovView interpolates globally) when a knot lies
    strictly inside a segment span.
    """
    cov_t = np.asarray(grid.rows.cov_t, np.float64)  # [R, ncov, K]
    cov_v = np.asarray(grid.rows.cov_v, np.float64)
    fixed = np.asarray(grid.rows.cov_fixed)          # [R, ncov]
    t0 = np.asarray(seg_t0, np.float64)              # [R, M]
    dt = np.asarray(seg_dt, np.float64)
    t1 = t0 + dt
    name_to_idx = {n: i for i, n in enumerate(grid.cov_names)}
    out = {}
    for name in names:
        c = name_to_idx[name]
        ts = cov_t[:, c, :]  # [R, K]
        vs = cov_v[:, c, :]
        K = ts.shape[1]
        # boundary comparison with roundoff headroom: segment ends are
        # t0 + dt where dt came from a sorted-time difference, so a knot
        # exactly on a breakpoint can sit 1 ulp "inside" (0.3 + (0.9-0.3)
        # = 0.9000000000000001) — treat knots within relative 1e-9 of a
        # boundary as ON it
        eps = 1e-9 * np.maximum(1.0, np.abs(ts))[:, None, :]
        interior = ((ts[:, None, :] > t0[:, :, None] + eps)
                    & (ts[:, None, :] < t1[:, :, None] - eps))
        if np.any(interior & (dt > 0.0)[:, :, None]):
            raise PharmsolError(
                f"engine='pallas' ODE psi requires covariate `{name}`'s "
                "change points to fall on event/segment boundaries (a "
                "knot lies strictly inside an integration segment — use "
                "the default XLA engine)"
            )
        fx = fixed[:, c:c + 1].astype(bool)

        def interp(tq):
            tcl = np.clip(tq, ts[:, :1], ts[:, -1:])
            idx = np.clip(
                (ts[:, None, :] <= tcl[:, :, None]).sum(-1) - 1, 0, K - 1
            )
            nxt = np.minimum(idx + 1, K - 1)
            tk0 = np.take_along_axis(ts, idx, 1)
            tk1 = np.take_along_axis(ts, nxt, 1)
            vk0 = np.take_along_axis(vs, idx, 1)
            vk1 = np.take_along_axis(vs, nxt, 1)
            denom = np.where(tk1 > tk0, tk1 - tk0, 1.0)
            lin = vk0 + (vk1 - vk0) * (tcl - tk0) / denom
            lin = np.where(tk1 > tk0, lin, vk0)
            return np.where(fx, vk0, lin)

        v0 = interp(t0)
        v1 = interp(t1)
        span = np.where(dt > 0.0, dt, 1.0)
        b = np.where(dt > 0.0, (v1 - v0) / span, 0.0)
        b = np.where(fx, 0.0, b)  # fixed: carry v(t0) across the span
        a = v0 - b * t0
        out[name] = (a, b)
    return out


class _RowCov:
    """Covariate shim handing per-row constants to a seq probe."""

    def __init__(self, vals: dict):
        self.vals = vals

    def __call__(self, name, t):
        try:
            return self.vals[str(name)]
        except KeyError:
            raise PharmsolError(
                f"seq equation reads unknown covariate `{name}`"
            )

    def value(self, name, t):
        return self(name, t)


def _decompose_input_seg_planes(equation, sp, grid, ninput: int,
                                dose_cols, t0_np):
    """Exact per-(row, support) lag/fa planes per dose-carrying segment.

    For closures that are time-dependent or READ a time-varying covariate
    (the cases _decompose_input_planes rejects as _InputPlaneDynamic): lag
    is evaluated at each bolus's ORIGINAL breakpoint time (structs.rs:629)
    and fa at the lag-SHIFTED time per input (add_lagtime runs first —
    engine/grid.py:502-512 parity), on the host CPU with the same CovView
    interpolation the in-jit engine uses — exact, not approximated.

    ``dose_cols``: sorted segment columns that carry a bolus on any row;
    ``t0_np`` [R, M]: segment start times. Returns
    ``{m: (lag [ninput, R, S], fa [ninput, R, S])}`` float64.
    """
    from ...engine.grid import CovView, _as_input_vector

    lag_fn, fa_fn = equation._lag, equation._fa
    names = tuple(grid.cov_names)
    R = grid.n_rows
    kt = jnp.asarray(np.asarray(grid.rows.cov_t, np.float64))
    kv = jnp.asarray(np.asarray(grid.rows.cov_v, np.float64))
    kf = jnp.asarray(np.asarray(grid.rows.cov_fixed))
    sp_j = jnp.asarray(sp, jnp.float64)

    def per_cell(p, tr, kt_r, kv_r, kf_r):
        cv = CovView(kt_r, kv_r, kf_r, names)
        if lag_fn is not None:
            lag_v = _as_input_vector(
                lag_fn(p, tr, cv), ninput, fill=0.0)
        else:
            lag_v = jnp.zeros((ninput,), jnp.float64)
        if fa_fn is not None:
            fa_v = jnp.stack([
                _as_input_vector(
                    fa_fn(p, tr + lag_v[j], cv), ninput, fill=1.0)[j]
                for j in range(ninput)
            ])
        else:
            fa_v = jnp.ones((ninput,), jnp.float64)
        return lag_v, fa_v

    def per_row(tr, kt_r, kv_r, kf_r):
        return jax.vmap(lambda p: per_cell(p, tr, kt_r, kv_r, kf_r))(sp_j)

    out = {}
    try:
        with _host_cpu_device():
            fn = jax.jit(jax.vmap(per_row))
            for m in dose_cols:
                t_col = jnp.asarray(t0_np[:, m], jnp.float64)
                lag_rs, fa_rs = fn(t_col, kt, kv, kf)  # [R, S, ninput]
                lag_p = np.transpose(np.asarray(lag_rs, np.float64),
                                     (2, 0, 1))
                fa_p = np.transpose(np.asarray(fa_rs, np.float64),
                                    (2, 0, 1))
                if not (np.all(np.isfinite(lag_p))
                        and np.all(np.isfinite(fa_p))):
                    raise PharmsolError(
                        "engine='pallas' lag/fa probe produced non-finite "
                        "values"
                    )
                out[int(m)] = (lag_p, fa_p)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not evaluate the lag/fa equations per "
            f"dose segment: {e}"
        ) from e
    if R and any(np.any(v[0] < 0.0) for v in out.values()):
        raise PharmsolError(
            "engine='pallas' does not support negative lag times — use "
            "the default XLA engine"
        )
    return out


def _affine_solve(f_a, f_b, f_c, p_a, p_b, p_c, tol):
    """Solve/validate the diagonal-affine decomposition from three probes.

    ``f_x[..., i] = g[..., i] * p_x[i] + h[..., i]`` — g/h solved from
    probes a/b, validated at c (catches cross-parameter mixing and genuine
    nonlinearity). Returns (g, h) or None when the form does not hold.
    """
    denom = p_a - p_b  # nonzero by probe construction
    g = (f_a - f_b) / denom
    h = f_a - g * p_a
    pred_c = g * p_c + h
    scale = np.maximum(np.abs(f_c), 1.0)
    if not (np.all(np.isfinite(g)) and np.all(np.isfinite(h))
            and np.all(np.abs(pred_c - f_c) <= tol * 100 * scale)):
        return None
    return g, h




def _host_cpu_device():
    """Context manager pinning tiny probe evaluations to the host CPU.

    The pallas-plan decompositions evaluate the seq/derive closures a
    handful of times on scalar-sized inputs; on the default backend those
    would be device round trips (through the axon tunnel: ~40 ms each,
    M+3 of them per plan build). The CPU backend coexists with the TPU, so
    the probes run locally; results feed numpy and later transfer with the
    real streams.
    """
    import contextlib

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except Exception:
        return contextlib.nullcontext()


def _host_cov_values(grid, te: np.ndarray) -> dict:
    """Covariate values per row at per-row times ``te`` [R] (host numpy).

    Replicates CovView.value semantics (engine/grid.py): clamp into the knot
    range (first value carried backward, last forward), linear interpolation
    between knots, carry-forward for `!`-fixed covariates.
    """
    names = list(grid.cov_names)
    if not names:
        return {}
    cov_t = np.asarray(grid.rows.cov_t, dtype=np.float64)  # [R, C, K]
    cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)
    fixed = np.asarray(grid.rows.cov_fixed)
    if fixed.ndim == 2:
        fixed = fixed[0]
    R, C, K = cov_t.shape
    out = {}
    for c, name in enumerate(names):
        ts, vs = cov_t[:, c, :], cov_v[:, c, :]  # [R, K]
        tc = np.clip(te, ts[:, 0], ts[:, -1])
        idx = np.clip(
            np.sum(ts <= tc[:, None], axis=1) - 1, 0, K - 1
        )  # rightmost knot <= tc (searchsorted 'right' - 1)
        nxt = np.minimum(idx + 1, K - 1)
        r = np.arange(R)
        t0, t1 = ts[r, idx], ts[r, nxt]
        v0, v1 = vs[r, idx], vs[r, nxt]
        denom = np.where(t1 > t0, t1 - t0, 1.0)
        lin = np.where(t1 > t0, v0 + (v1 - v0) * (tc - t0) / denom, v0)
        out[name] = v0 if bool(fixed[c]) else lin
    return out




def _decompose_kernel_inputs(kernel_inputs, sp, grid, n_kernel_params: int,
                             allow_mult: bool):
    """Anchored decomposition of a declarative kernel-input mapping.

    Declarative analytical models (models/declarative.py analytical_model)
    compute kernel parameters as ``kp(p, t, cov)`` from DECLARED parameters
    (arbitrary reordering + derive closures), so the support matrix is not
    in kernel order. Writing ``kp_i(p, t, cov) = b_i(p) * g_i(t, cov)
    + h_i(t, cov)`` (covariate scaling AND additive effects), everything
    the kernel needs factors through an arbitrary anchor A = (t=0,
    first-row first-knot covariates):

        kernel support  sp_k[s, i]   = kp_i(sp_s, A)        [per support]
        g, h per (row, segment) solved from TWO parameter probes
        (kp(p_ref) and kp(p_alt) at the anchor vs at (t_seg, cov_r)),
        validated at a third probe p_val.

    No reset/carry chain applies: the declarative propagate re-derives
    from the RAW parameters at every segment end (engine parity:
    declarative.py propagate).

    Returns (sp_kernel [S, P], mult_row [R, P] | None, off_row | None,
    mult_seg [R, P, M] | None, off_seg | None) — time-constant effects
    collapse to the cheaper row mode; purely multiplicative effects drop
    the offsets (None).
    """
    from ...config import BIG_TIME, float_dtype
    from ...engine.grid import CovView
    from ...ops.pallas_psi import segment_schedule

    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    names = list(grid.cov_names)
    cov_t = np.asarray(grid.rows.cov_t, dtype=np.float64)
    cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)
    fixed = np.asarray(grid.rows.cov_fixed)
    if fixed.ndim == 1 and cov_t.ndim == 3:
        fixed = np.broadcast_to(fixed[None, :], cov_t.shape[:2])

    if names:
        anchor_view = CovView(
            jnp.zeros((len(names), 1), dtype=fd),
            jnp.asarray(cov_v[0, :, :1], dtype=fd),
            jnp.zeros((len(names),), dtype=bool),
            names,
        )
    else:
        anchor_view = CovView(
            jnp.zeros((0, 1), dtype=fd), jnp.zeros((0, 1), dtype=fd),
            jnp.zeros((0,), dtype=bool), [],
        )

    def kp_at_anchor(p_rows, t=0.0):
        def one(p):
            vals = kernel_inputs(jnp.asarray(p, dtype=fd),
                                 jnp.asarray(t, dtype=fd), anchor_view)
            return jnp.stack([jnp.asarray(v, dtype=fd) for v in vals])
        return np.asarray(
            jax.vmap(one)(jnp.asarray(p_rows, dtype=fd)), dtype=np.float64
        )

    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
    p_alt = p_ref * 1.37 + 0.011
    if np.any(np.abs(p_ref - p_alt) < 1e-9):
        p_alt = p_ref * 1.61 + 0.173
    p_val = p_ref * 0.73 + 0.311
    try:
        with _host_cpu_device():
            sp_kernel = kp_at_anchor(sp)
            kp_ref = kp_at_anchor(p_ref[None, :])[0]  # [P]
            kp_ref_t = kp_at_anchor(p_ref[None, :], t=123.456)[0]
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the declarative kernel-input "
            f"mapping: {e}"
        ) from e
    if not (np.all(np.isfinite(sp_kernel)) and np.all(np.isfinite(kp_ref))):
        raise PharmsolError(
            "engine='pallas' declarative kernel inputs are non-finite at "
            "the probe points — use the default XLA engine"
        )

    time_dependent = not np.allclose(kp_ref, kp_ref_t, rtol=tol, atol=tol)
    cov_varying = bool(names) and cov_t.ndim == 3
    if cov_varying:
        same_everywhere = np.all(cov_v == cov_v[0:1, :, 0:1])
        cov_varying = not bool(same_everywhere)
    if not time_dependent and not cov_varying:
        # pure reindex/derive over parameters
        return sp_kernel, None, None, None, None

    if not allow_mult:
        raise PharmsolError(
            "engine='pallas' does not support covariate/time-dependent "
            "derive with 3-compartment structures (eigen prep is "
            "per-support) — use the default XLA engine"
        )

    order, t_sorted, seg_dt, _ = segment_schedule(grid.rows)
    R, M = t_sorted.shape
    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(t_sorted + seg_dt, t_real_max[:, None])

    ct_j = jnp.asarray(cov_t, dtype=fd)
    cv_j = jnp.asarray(cov_v, dtype=fd)
    cf_j = jnp.asarray(np.asarray(fixed, dtype=bool))

    def kp_rows(p, m):
        t_j = jnp.asarray(te[:, m], dtype=fd)
        p_j = jnp.asarray(p, dtype=fd)

        def one(ct, cv, cf, t_r):
            view = CovView(ct, cv, cf, names)
            vals = kernel_inputs(p_j, t_r, view)
            return jnp.stack([jnp.asarray(v, dtype=fd) for v in vals])

        return np.asarray(jax.vmap(one)(ct_j, cv_j, cf_j, t_j),
                          dtype=np.float64)

    sample = {0, M // 2, M - 1}
    try:
        with _host_cpu_device():
            kp_alt = kp_at_anchor(p_alt[None, :])[0]
            kp_val = kp_at_anchor(p_val[None, :])[0]
            f_ref = np.stack([kp_rows(p_ref, m) for m in range(M)], axis=2)
            f_alt = np.stack([kp_rows(p_alt, m) for m in range(M)], axis=2)
            f_vals = {m: kp_rows(p_val, m) for m in sample}
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the declarative kernel-input "
            f"mapping: {e}"
        ) from e
    denom = (kp_ref - kp_alt)[None, :, None]
    if np.any(np.abs(denom) < 1e-30):
        raise PharmsolError(
            "engine='pallas' declarative derive is parameter-degenerate at "
            "the probe points — use the default XLA engine"
        )
    g = (f_ref - f_alt) / denom  # [R, P, M]
    h = f_ref - kp_ref[None, :, None] * g
    for m in sample:
        pred = kp_val[None, :] * g[:, :, m] + h[:, :, m]
        scale = np.maximum(np.abs(f_vals[m]), 1.0)
        if not (np.all(np.isfinite(pred))
                and np.all(np.abs(pred - f_vals[m]) <= tol * 100 * scale)):
            raise PharmsolError(
                "engine='pallas' requires affinely separable derive "
                "closures (kp_i = b_i(p) * g_i(t, cov) + h_i(t, cov)); "
                "this one mixes anchored parameter structure with the "
                "covariate effect — use the default XLA engine"
            )
    if not (np.all(np.isfinite(g)) and np.all(np.isfinite(h))):
        raise PharmsolError(
            "engine='pallas' declarative derive produced non-finite "
            "factors — use the default XLA engine"
        )
    off_zero = np.allclose(h, 0.0, atol=tol * 10)
    if (np.allclose(g, g[:, :, :1], rtol=1e-12, atol=1e-12)
            and np.allclose(h, h[:, :, :1], rtol=1e-12, atol=1e-12)):
        g_row = np.ascontiguousarray(g[:, :, 0])
        h_row = None if off_zero else np.ascontiguousarray(h[:, :, 0])
        return sp_kernel, g_row, h_row, None, None
    return (sp_kernel, None, None, np.ascontiguousarray(g),
            None if off_zero else np.ascontiguousarray(h))


class _InputPlaneDynamic(PharmsolError):
    """A lag/fa closure is time-dependent or reads a time-varying
    covariate: its value is not one per-(row, support) constant. The ODE
    plan reroutes these to exact per-dose-segment planes
    (_decompose_input_seg_planes); the analytical plan falls back."""


def _decompose_input_plane(fn, sp, grid, ninput: int, fill: float,
                           what: str) -> np.ndarray:
    """Input-0 view of :func:`_decompose_input_planes` ([R, S] float64).

    The analytical pallas tier supports one bolus route (into the
    kernel's destination state), so its plans only need input 0's plane.
    """
    return _decompose_input_planes(fn, sp, grid, ninput, fill, what)[0]


def _decompose_input_planes(fn, sp, grid, ninput: int, fill: float,
                            what: str) -> np.ndarray:
    """Evaluate a lag/fa closure into per-(input, row, support) planes.

    Probes (host CPU): time-independence at two t values (the engine
    evaluates lag at each bolus's own time, structs.rs:629 — a
    time-dependent closure would need per-bolus planes). Covariate reads
    must resolve to one value per occasion row: time-constant covariates
    may influence the plane (evaluated per row); closures that READ a
    time-varying covariate fall back (their value at the bolus time is not
    a per-row constant). Time-varying covariates the closure does not read
    are fine — a perturbation probe distinguishes the two. cov-independent
    closures collapse to one support row broadcast over rows.
    Returns [ninput, R, S] float64.
    """
    from ...engine.grid import _as_input_vector

    cov_values, varying_covs = (_classify_covariates(grid)
                                if grid.cov_names else ({}, set()))
    names = list(cov_values.keys())
    R = grid.n_rows
    S = sp.shape[0]

    def at(p, t, covd):
        return _as_input_vector(
            fn(jnp.asarray(p, jnp.float64), jnp.asarray(t, jnp.float64),
               _RowCov(covd)),
            ninput, fill=fill,
        )

    cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
    cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}
    cov_var = {n: (v * 1.31 + 0.17 if n in varying_covs else v)
               for n, v in cov0.items()}
    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)
            v_ref = np.asarray(jax.vmap(lambda p: at(p, 0.0, cov0))(sp_j),
                               np.float64)
            v_t = np.asarray(jax.vmap(lambda p: at(p, 123.456, cov0))(sp_j),
                             np.float64)
            v_cov = np.asarray(jax.vmap(lambda p: at(p, 0.0, cov1))(sp_j),
                               np.float64)
            v_var = (np.asarray(jax.vmap(
                lambda p: at(p, 0.0, cov_var))(sp_j), np.float64)
                if varying_covs else v_ref)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the {what} equation: {e}"
        ) from e
    scale = np.maximum(np.abs(v_ref).max(), 1e-12)
    if np.abs(v_t - v_ref).max() > 1e-9 * scale:
        raise _InputPlaneDynamic(
            f"engine='pallas' requires a time-independent {what} equation "
            "(the engine evaluates it at each bolus's own time) — use the "
            "default XLA engine"
        )
    if varying_covs and np.abs(v_var - v_ref).max() > 1e-9 * scale:
        raise _InputPlaneDynamic(
            f"engine='pallas' requires the {what} equation not to read a "
            "time-varying covariate (its value at each bolus time is not a "
            "per-row constant) — use the default XLA engine"
        )
    if not np.all(np.isfinite(v_ref)):
        raise PharmsolError(
            f"engine='pallas' {what} probe produced non-finite values"
        )
    if names and np.abs(v_cov - v_ref).max() > 1e-9 * scale:
        # covariate-dependent: evaluate per (row, support)
        stacked = np.stack([np.asarray(cov_values[n]) for n in names],
                           axis=1)  # [R, C]
        try:
            with _host_cpu_device():
                def one_row(row):
                    covd = {n: row[i] for i, n in enumerate(names)}
                    return jax.vmap(lambda p: at(p, 0.0, covd))(sp_j)

                plane = np.asarray(
                    jax.vmap(one_row)(jnp.asarray(stacked, jnp.float64)),
                    np.float64,
                )  # [R, S, ninput]
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' could not probe the {what} equation "
                f"per row: {e}"
            ) from e
        if not np.all(np.isfinite(plane)):
            raise PharmsolError(
                f"engine='pallas' {what} probe produced non-finite values"
            )
        return np.ascontiguousarray(np.transpose(plane, (2, 0, 1)))
    # cov-independent: one support row per input, broadcast over rows
    return np.broadcast_to(
        np.asarray(v_ref).T[:, None, :], (ninput, R, S)
    ).copy()


def _validate_lag_no_overlap(lag_plane: np.ndarray, grid,
                             input_j: int = None) -> None:
    """Reject lag plans where two doses of one row could pend at once.

    The kernel holds ONE pending dose per (lane, input) slot; dose k of an
    input must fire (its lag elapse) strictly before dose k+1 of the SAME
    input arrives: max_support lag(row) must not exceed the row's minimum
    inter-bolus gap for that input (``input_j``; None = all boluses, the
    single-input tiers). Negative lags (doses shifted before their record
    time) have no reference semantics worth chasing — rejected too.
    """
    from ...config import BIG_TIME

    if np.any(lag_plane < 0.0):
        raise PharmsolError(
            "engine='pallas' does not support negative lag times — use the "
            "default XLA engine"
        )
    bolus_t = np.asarray(grid.rows.bolus_t, dtype=np.float64)
    real = bolus_t < BIG_TIME / 2
    if input_j is not None:
        real = real & (np.asarray(grid.rows.bolus_input) == input_j)
    lag_max = lag_plane.max(axis=1)  # [R]
    for r in range(bolus_t.shape[0]):
        ts = np.sort(bolus_t[r][real[r]])
        if ts.shape[0] >= 2:
            min_gap = np.min(np.diff(ts))
            # STRICT: at lag == gap the kernel's single pending slot is
            # overwritten by the arriving dose in the very column the old
            # one would fire — reject the boundary rather than drop a dose
            if lag_max[r] >= min_gap:
                raise PharmsolError(
                    f"engine='pallas' lag support requires each dose's lag "
                    f"to elapse strictly before the next dose (row {r}: "
                    f"max lag {lag_max[r]:.4g} >= min inter-dose gap "
                    f"{min_gap:.4g}) — use the default XLA engine"
                )


def _check_out_covariate_free(equation, sp, cov_values, n_states, CovView):
    """Reject out() closures whose value depends on a covariate."""
    from ...config import float_dtype
    from ...ops.pallas_psi import extract_linear_out

    fd = float_dtype()
    n_out = int(equation.nouteqs())
    out_fn = equation._out

    def cov_view(scale, shift):
        names = list(cov_values.keys())
        vals = np.stack([np.asarray(cov_values[n])[:1] for n in names])  # [C,1]
        return CovView(
            jnp.zeros((len(names), 1), dtype=fd),
            jnp.asarray(vals * scale + shift, dtype=fd),
            jnp.zeros((len(names),), dtype=bool),
            names,
        )

    try:
        C1, b1 = extract_linear_out(out_fn, sp, n_states, n_out, cov_view(1.0, 0.0), fd)
        C2, b2 = extract_linear_out(out_fn, sp, n_states, n_out, cov_view(1.31, 0.17), fd)
    except Exception:
        return  # extraction problems are diagnosed later by the plan itself
    if not (np.allclose(C1, C2, rtol=1e-9, atol=1e-12)
            and np.allclose(b1, b2, rtol=1e-9, atol=1e-12)):
        raise PharmsolError(
            "engine='pallas' requires covariate effects to act through the "
            "seq equation; this model's out() reads a covariate — use the "
            "default XLA engine"
        )
