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


def _decompose_seq(seq, sp, cov_values: dict, n_kernel_params: int,
                   n_rows_total: int = 1):
    """Validate + decompose a seq equation into per-row affine factors.

    Probes (all numeric, evaluated once on the host):
    - time-independence: seq(p, t, cov) must not depend on t;
    - diagonal-affine form: ``seq[i] = p[i] * g_i(cov) + h_i(cov)`` —
      solved from two parameter probes and validated at a third (covers
      the multiplicative covariate-scaling standard form AND additive
      effects; cross-parameter mixing fails the validation probe).

    Returns (mult [R, k], offset [R, k] | None — None when the offsets are
    identically zero, i.e. purely multiplicative); raises PharmsolError
    when the seq equation does not fit (fall back to engine='xla').
    """
    from ...config import float_dtype

    fd = float_dtype()
    # probe tolerance tracks the working precision (f32 on TPU)
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    n_rows = len(next(iter(cov_values.values()))) if cov_values else n_rows_total
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
    p_alt = p_ref * 1.37 + 0.011
    if np.any(np.abs(p_ref - p_alt) < 1e-9):
        p_alt = p_ref * 1.61 + 0.173
    p_val = p_ref * 0.73 + 0.311

    def eval_rows(p, t):
        p = jnp.asarray(p, dtype=fd)
        t = jnp.asarray(t, dtype=fd)
        if cov_values:
            stacked = jnp.stack(
                [jnp.asarray(v, dtype=fd) for v in cov_values.values()],
                axis=1,
            )  # [R, C]
            names = list(cov_values.keys())

            def one(row):
                shim = _RowCov({n: row[i] for i, n in enumerate(names)})
                return jnp.asarray(seq(p, t, shim), dtype=fd)

            return np.asarray(jax.vmap(one)(stacked), dtype=np.float64)
        out = np.asarray(seq(p, t, _RowCov({})), dtype=np.float64)
        return np.broadcast_to(out[None, :], (n_rows, out.shape[0])).copy()

    try:
        with _host_cpu_device():
            out_ref = eval_rows(p_ref, 0.0)
            out_t = eval_rows(p_ref, 123.456)
            out_alt = eval_rows(p_alt, 0.0)
            out_val = eval_rows(p_val, 0.0)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    if not np.allclose(out_ref, out_t, rtol=tol, atol=tol):
        raise PharmsolError(
            "engine='pallas' requires a time-independent seq equation "
            "(this one changes with t; use the default XLA engine)"
        )
    k = n_kernel_params
    solved = _affine_solve(
        out_ref[:, :k], out_alt[:, :k], out_val[:, :k],
        p_ref[None, :k], p_alt[None, :k], p_val[None, :k], tol,
    )
    if solved is None:
        raise PharmsolError(
            "engine='pallas' requires diagonal-affine covariate effects "
            "(seq[i] = p[i] * g_i(cov) + h_i(cov)); this seq equation "
            "mixes parameters or is nonlinear — use the default XLA engine"
        )
    g, h = solved
    if np.allclose(h, 0.0, atol=tol * 10):
        return np.ascontiguousarray(g), None
    return np.ascontiguousarray(g), np.ascontiguousarray(h)


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


def _decompose_seq_tv(seq, sp, grid, n_kernel_params: int):
    """Per-row, per-SEGMENT diagonal-affine seq decomposition.

    Generalizes :func:`_decompose_seq` two ways, both required for engine
    parity (sim.step, engine/sim.py):

    - the affine factors are evaluated at each segment's END time (the
      engine evaluates seq at ``t + dt``) with the row's covariates
      interpolated at that time — this carries time-VARYING covariates;
    - the engine's reset/carry chain is baked in: seq parameters reset to
      the raw support point at real events but compound across
      infusion-end sub-splits (grid.build_segments is_event semantics,
      analytical/mod.rs:331,360) — applying a single per-row multiplier to
      rows containing infusions was measurably wrong (0.17 in log-lik).

    Per segment m: ``seq[i] = p[i] * g_i(m) + h_i(m)`` solved from two
    parameter probes, validated at a third on sample segments; the chain
    composes affinely (``g_m*(g_prev p + h_prev) + h_m``). Returns
    (mult_seg [R, P, M], offset_seg [R, P, M] | None).
    """
    from ...config import float_dtype
    from ...ops.pallas_psi import segment_schedule

    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    order, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
    R, M = t_sorted.shape
    k = n_kernel_params
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
    p_alt = p_ref * 1.37 + 0.011
    if np.any(np.abs(p_ref - p_alt) < 1e-9):
        p_alt = p_ref * 1.61 + 0.173
    p_val = p_ref * 0.73 + 0.311

    # padded breakpoints sit at BIG_TIME; clamp their evaluation time to the
    # row's last real breakpoint so seq closures reading t stay finite
    from ...config import BIG_TIME

    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(t_sorted + seg_dt, t_real_max[:, None])  # [R, M]

    names = list(grid.cov_names)
    # evaluate through each row's REAL CovView (not a fixed-value shim) so
    # closures that read a covariate at a time OTHER than the t they are
    # handed — e.g. a baseline read cov("wt", 0.0) against a time-varying
    # wt — see exactly what the engine's view returns
    from ...engine.grid import CovView

    kt_r = np.asarray(grid.rows.cov_t, np.float64)
    kv_r = np.asarray(grid.rows.cov_v, np.float64)
    fx_r = np.asarray(grid.rows.cov_fixed)
    if fx_r.ndim == 1 and kt_r.ndim == 3:
        fx_r = np.broadcast_to(fx_r[None, :], kt_r.shape[:2])
    if not names:
        kt_r = np.zeros((R, 0, 1), np.float64)
        kv_r = np.zeros((R, 0, 1), np.float64)
        fx_r = np.zeros((R, 0), bool)
    kt_j = jnp.asarray(kt_r, dtype=fd)
    kv_j = jnp.asarray(kv_r, dtype=fd)
    fx_j = jnp.asarray(fx_r)

    def values_at(p, m):
        p_j = jnp.asarray(p, dtype=fd)
        t_j = jnp.asarray(te[:, m], dtype=fd)

        def one(ct, cv, cf, t_r):
            view = CovView(ct, cv, cf, names)
            return jnp.asarray(seq(p_j, t_r, view), dtype=fd)

        out = np.asarray(jax.vmap(one)(kt_j, kv_j, fx_j, t_j),
                         dtype=np.float64)
        if out.shape[1] != sp.shape[1]:
            # the engine scan carries the seq output as the next p_base
            # (engine/sim.py step), so exact support width is the contract
            raise PharmsolError(
                "engine='pallas' seq must return exactly the support "
                "width — use the default XLA engine"
            )
        return out[:, :k]

    sample = {0, M // 2, M - 1}
    try:
        with _host_cpu_device():
            f_ref = np.stack([values_at(p_ref, m) for m in range(M)], axis=2)
            f_alt = np.stack([values_at(p_alt, m) for m in range(M)], axis=2)
            f_vals = {m: values_at(p_val, m) for m in sample}
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e

    denom = (p_ref - p_alt)[None, :k, None]
    g = (f_ref - f_alt) / denom  # [R, k, M]
    h = f_ref - g * p_ref[None, :k, None]
    for m in sample:
        pred = g[:, :, m] * p_val[None, :k] + h[:, :, m]
        scale = np.maximum(np.abs(f_vals[m]), 1.0)
        if not (np.all(np.isfinite(pred))
                and np.all(np.abs(pred - f_vals[m]) <= tol * 100 * scale)):
            raise PharmsolError(
                "engine='pallas' requires diagonal-affine covariate "
                "effects (seq[i] = p[i] * g_i(t, cov) + h_i(t, cov)); "
                "this seq equation mixes parameters or is nonlinear — "
                "use the default XLA engine"
            )
    if not (np.all(np.isfinite(g)) and np.all(np.isfinite(h))):
        raise PharmsolError(
            "engine='pallas' seq decomposition produced non-finite "
            "factors — use the default XLA engine"
        )

    # engine reset/carry chain: p_base = raw at events else carried;
    # p_seg = affine_m(p_base) on spanned segments, p_base otherwise
    mult = np.empty_like(g)
    off = np.empty_like(h)
    prev_g = np.ones((R, k))
    prev_h = np.zeros((R, k))
    for m in range(M):
        ev = is_event[:, m][:, None]
        base_g = np.where(ev, 1.0, prev_g)
        base_h = np.where(ev, 0.0, prev_h)
        span = seg_dt[:, m][:, None] > 0
        cur_g = np.where(span, g[:, :, m] * base_g, base_g)
        cur_h = np.where(span, g[:, :, m] * base_h + h[:, :, m], base_h)
        mult[:, :, m] = cur_g
        off[:, :, m] = cur_h
        prev_g, prev_h = cur_g, cur_h
    tol_h = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    if np.allclose(off, 0.0, atol=tol_h * 10):
        return np.ascontiguousarray(mult), None
    return np.ascontiguousarray(mult), np.ascontiguousarray(off)


_MAX_SEQ_LEVELS = 8
# param-plane mode materializes [L, n_base, R, S] float64 host-side; cap it
# so a pathological population can't swallow host memory (fall back to XLA)
_MAX_PLANE_FLOATS = 1 << 27  # 128M doubles = 1 GiB host / 512 MiB device f32


def _seq_depth_stream(grid, lag_mode: bool = False):
    """Chain depth per (row, segment) from the engine's reset/carry rule.

    ``p_base`` resets to the raw support point at real events and carries
    across infusion-end sub-splits; spanned segments apply seq once more
    (engine/sim.py step, analytical/mod.rs:331,360). Returns
    (depth [R, M] 1-based / 0 on dead segments, L = max depth >= 1).

    ``lag_mode=True`` (lag + seq chain depth > 1): a lag-shifted bolus
    moves its seq-reset breakpoint to the per-(row, support) fire time, so
    a host-side depth stream cannot exist. Instead return
    (evcode [R, M], L): per-column event codes 1 = reset boundary
    (observation / infusion-start — these never move), 2 = infusion-end
    sub-split (compound), 0 = bolus column (a PHANTOM split under lag: the
    engine's segment continues through it with unchanged parameters) or
    dead/padding. The kernel replays the engine's reset/carry recurrence
    on these codes with an in-kernel depth counter and resets at each
    per-lane dose fire. L is the no-fire upper bound on the counter —
    exact when no dose fires, and fires only ever RESET the chain (to
    depth 1), so no lane can exceed it.
    """
    from ...config import BIG_TIME
    from ...ops.pallas_psi import segment_schedule

    if not lag_mode:
        _, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
        R, M = t_sorted.shape
        depth = np.zeros((R, M), dtype=np.float64)
        d_cur = np.zeros(R, dtype=np.int64)
        for m in range(M):
            base = np.where(is_event[:, m], 0, d_cur)
            span = seg_dt[:, m] > 0
            d_seg = np.where(span, base + 1, base)
            depth[:, m] = np.where(span, d_seg, 0)
            d_cur = d_seg
        L = int(depth.max())
        if L == 0:
            L = 1  # no spanned segments: one trivial level keeps shapes valid
        if L > _MAX_SEQ_LEVELS:
            raise PharmsolError(
                f"engine='pallas' seq chain depth {L} exceeds "
                f"{_MAX_SEQ_LEVELS} — use the default XLA engine"
            )
        return depth, L

    _, t_sorted, seg_dt, _, rank = segment_schedule(grid.rows,
                                                    with_ranks=True)
    R, M = t_sorted.shape
    real = t_sorted < BIG_TIME / 2
    evcode = np.zeros((R, M), dtype=np.float64)
    evcode[real & ((rank == 1.0) | (rank == 3.0))] = 1.0  # obs / inf-start
    evcode[real & (rank == 0.0)] = 2.0  # infusion-end sub-split
    # a real zero-amount bolus is still a seq-reset event in the engine but
    # carries no dose the kernel's pending mechanism could fire (and reset)
    # on — reject rather than silently diverge
    b_t = np.asarray(grid.rows.bolus_t, np.float64)
    b_a = np.asarray(grid.rows.bolus_amt, np.float64)
    if np.any((b_t < BIG_TIME / 2) & (b_a == 0.0)):
        raise PharmsolError(
            "engine='pallas' lag with seq chain depth > 1 does not support "
            "zero-amount bolus records (their seq-reset breakpoint moves "
            "with the lag but no dose ever fires) — use the default XLA "
            "engine"
        )
    # no-fire upper-bound simulation of the in-kernel counter: fires only
    # reset the chain (depth 1 <= any applied depth), so never-firing doses
    # maximize every column's depth
    dc = np.zeros(R, dtype=np.int64)
    app = np.zeros(R, dtype=bool)
    max_d = 1
    for m in range(M):
        span = seg_dt[:, m] > 0
        code = evcode[:, m]
        dc = np.where(
            code == 1.0, np.where(span, 1, 0),
            np.where(code == 2.0, dc + span,
                     dc + (span & ~app)),
        )
        app = np.where(code == 1.0, span,
                       np.where(code == 2.0, span, app | span))
        max_d = max(max_d, int(np.where(span, dc, 0).max(initial=0)))
    if max_d > _MAX_SEQ_LEVELS:
        raise PharmsolError(
            f"engine='pallas' seq chain depth {max_d} (lag no-fire bound) "
            f"exceeds {_MAX_SEQ_LEVELS} — use the default XLA engine"
        )
    return evcode, max_d


def _decompose_seq_levels(seq, sp, grid, sdef, n_kernel_params: int,
                          lag_mode: bool = False):
    """Chain-depth level tables for covariate-free, time-independent seq.

    The engine evaluates ``p_seg = seq(p_base, t+dt, cov)`` per spanned
    segment with p_base resetting to the raw support point at real events
    and carrying across infusion-end sub-splits (analytical/mod.rs:331,360).
    When seq reads neither t nor covariates, ``p_seg = seq^d(p)`` where the
    chain depth d is a pure function of the ROW's event structure —
    computable host-side. This covers seq equations of ANY form (including
    non-separable parameter mixing) and every structure (3-cmt included:
    eigen prep runs per level).

    Returns (param_levels [L, n_base, S] in the structure's micro-constant
    parameterization, seg_depth [R, M] with 1-based level indices, 0 on
    dead segments). With ``lag_mode=True`` the second element is instead
    the evcode stream and L the no-fire depth bound (see
    :func:`_seq_depth_stream`) — the kernel then tracks depth in-kernel.
    """
    from ...config import float_dtype
    from ...ops.pallas_psi import segment_schedule

    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)

    cov_values = _constant_covariate_values(grid) if grid.cov_names else {}
    cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
    cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}

    def seq_once(p_rows, t, covd):
        def one(p):
            return jnp.asarray(seq(jnp.asarray(p, jnp.float64),
                                   jnp.asarray(t, jnp.float64),
                                   _RowCov(covd)), jnp.float64)
        return np.asarray(jax.vmap(one)(jnp.asarray(p_rows, jnp.float64)),
                          np.float64)

    try:
        with _host_cpu_device():
            f0 = seq_once(p_ref[None, :], 0.0, cov0)
            ft = seq_once(p_ref[None, :], 123.456, cov0)
            fc = seq_once(p_ref[None, :], 0.0, cov1)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    scale = np.maximum(np.abs(f0).max(), 1.0)
    if np.abs(ft - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq levels require a time-independent seq "
            "equation — use the default XLA engine"
        )
    if cov0 and np.abs(fc - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq levels require a covariate-free seq "
            "equation — use the default XLA engine"
        )

    # chain depth per (row, segment) from the engine's reset/carry rule
    depth, L = _seq_depth_stream(grid, lag_mode)

    # iterated level tables on the full declared support width
    k = n_kernel_params
    remap = sdef["remap"]
    levels = []
    cur = np.asarray(sp, np.float64)
    try:
        with _host_cpu_device():
            for _ in range(L):
                cur = seq_once(cur, 0.0, cov0)
                if cur.shape[1] < sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq returned fewer columns than "
                        "the support width — use the default XLA engine"
                    )
                rows = [cur[:, i] for i in range(k)]
                rows = remap(rows) if remap else rows
                levels.append(np.stack(rows, axis=0))  # [n_base, S]
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not iterate the seq equation: {e}"
        ) from e
    param_levels = np.stack(levels, axis=0)  # [L, n_base, S]
    if not np.all(np.isfinite(param_levels)):
        raise PharmsolError(
            "engine='pallas' seq level tables are non-finite — use the "
            "default XLA engine"
        )
    return np.ascontiguousarray(param_levels), np.ascontiguousarray(depth)


def _decompose_seq_planes(seq, sp, grid, sdef, n_kernel_params: int,
                          lag_mode: bool = False):
    """Per-(row, support) parameter planes for covariate-dependent seq.

    The exact generalization of :func:`_decompose_seq_levels` to seq
    equations that READ covariates in ANY form — true parameter x covariate
    mixing (``ke * wt**gamma``, ``cl / (1 + km * crcl)``, ...) included —
    provided the seq equation is time-independent and every covariate it
    reads is time-constant within each occasion row. The iterated chain
    ``seq^d(p, cov_r)`` is then a pure function of (row, support, depth),
    evaluated host-side into full parameter planes.

    Returns (param_planes [L, n_base, R, S] in the structure's
    micro-constant parameterization, seg_depth [R, M] 1-based, 0 on dead
    segments). Raises PharmsolError (-> XLA fallback) for time-dependent
    seq, seq reading a time-varying covariate, or a plane volume past the
    host-memory cap. ``lag_mode=True``: second element is the evcode
    stream, L the no-fire bound (see :func:`_seq_depth_stream`).
    """
    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)

    cov_values, varying_covs = (_classify_covariates(grid)
                                if grid.cov_names else ({}, set()))
    names = list(cov_values.keys())
    cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
    cov_var = {n: (v * 1.31 + 0.17 if n in varying_covs else v)
               for n, v in cov0.items()}

    def seq_once(p_rows, t, covd):
        def one(p):
            return jnp.asarray(seq(jnp.asarray(p, jnp.float64),
                                   jnp.asarray(t, jnp.float64),
                                   _RowCov(covd)), jnp.float64)
        return np.asarray(jax.vmap(one)(jnp.asarray(p_rows, jnp.float64)),
                          np.float64)

    try:
        with _host_cpu_device():
            f0 = seq_once(p_ref[None, :], 0.0, cov0)
            ft = seq_once(p_ref[None, :], 123.456, cov0)
            fv = (seq_once(p_ref[None, :], 0.0, cov_var)
                  if varying_covs else f0)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    scale = np.maximum(np.abs(f0).max(), 1.0)
    if np.abs(ft - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq planes require a time-independent seq "
            "equation — use the default XLA engine"
        )
    if varying_covs and np.abs(fv - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq planes require the seq equation not to "
            "read a time-varying covariate — use the default XLA engine"
        )

    depth, L = _seq_depth_stream(grid, lag_mode)
    R = grid.n_rows
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' covariate-dependent seq planes would exceed "
            f"the memory cap ({L}x{n_base}x{R}x{S} cells) — use the "
            "default XLA engine"
        )

    cov_mat = np.stack([np.asarray(cov_values[n], np.float64)
                        for n in names], axis=1) if names else \
        np.zeros((R, 0), np.float64)

    levels = []
    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)
            cur = jnp.broadcast_to(sp_j[None, :, :],
                                   (R,) + sp_j.shape)  # [R, S, ncols]

            def step_row(cur_row, cov_row):
                covd = {n: cov_row[i] for i, n in enumerate(names)}

                def one(p):
                    return jnp.asarray(
                        seq(p, jnp.asarray(0.0, jnp.float64),
                            _RowCov(covd)), jnp.float64)

                return jax.vmap(one)(cur_row)

            cov_j = jnp.asarray(cov_mat, jnp.float64)
            for _ in range(L):
                cur = jax.vmap(step_row)(cur, cov_j)  # [R, S, ncols']
                arr = np.asarray(cur, np.float64)
                if arr.shape[2] < sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq returned fewer columns than "
                        "the support width — use the default XLA engine"
                    )
                rows = [arr[:, :, i] for i in range(k)]  # [R, S] each
                rows = remap(rows) if remap else rows
                levels.append(np.stack(rows, axis=0))  # [n_base, R, S]
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not iterate the seq equation per "
            f"row: {e}"
        ) from e
    param_planes = np.stack(levels, axis=0)  # [L, n_base, R, S]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' seq parameter planes are non-finite — use "
            "the default XLA engine"
        )
    return np.ascontiguousarray(param_planes), np.ascontiguousarray(depth)


# segment-indexed planes unroll the kernel's masked level select per slot;
# past this many distinct chain values per row the select cost and plane
# volume stop paying for themselves — fall back to XLA
_MAX_SEQ_SEGPLANES = 16


def _decompose_seq_segplanes(seq, sp, grid, sdef, n_kernel_params: int):
    """Exact per-(row, support) SEGMENT-indexed parameter planes.

    The fully general no-lag seq tier: seq equations that read ``t``
    and/or a TIME-VARYING covariate in ANY form — non-affine parameter
    mixing included, i.e. everything :func:`_decompose_seq_tv` (affine
    only) and :func:`_decompose_seq_planes` (time-constant covariates
    only) reject. Without an active lag the reset/carry chain's reset
    points are the static grid breakpoints (they never move per
    support), so the engine recurrence (engine/sim.py step;
    analytical/mod.rs:331,360)

        p_base(m) = raw support at real events, carried otherwise
        p_seg(m)  = seq(p_base(m), t_start(m)+dt(m), cov)  when spanned

    is a pure function of (row, segment, support) — host-computable by
    walking the schedule once, calling the TRUE closure with the row's
    REAL CovView so the closure's own covariate time requests are
    honored exactly (``cov("wt", 0.0)`` baseline reads included).
    Distinct chain values per row are deduplicated into level slots
    (chains repeat between covariate knots), producing
    (param_planes [L, n_base, R, S], slot stream [R, M] 1-based, 0 on
    dead segments) for the kernel's existing planes mechanism.
    """
    from ...config import BIG_TIME
    from ...engine.grid import CovView
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
    R, M = t_sorted.shape
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k
    if M * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes would exceed the "
            f"memory cap ({M}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )

    # padded breakpoints sit at BIG_TIME; clamp their evaluation time to
    # the row's last real breakpoint so closures reading t stay finite
    real = np.asarray(t_sorted) < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(np.asarray(t_sorted) + np.asarray(seg_dt),
                    t_real_max[:, None])  # [R, M]

    names = list(grid.cov_names)
    kt = np.asarray(grid.rows.cov_t, np.float64)  # [R, C, K]
    kv = np.asarray(grid.rows.cov_v, np.float64)
    fx = np.asarray(grid.rows.cov_fixed)
    if fx.ndim == 1 and kt.ndim == 3:
        fx = np.broadcast_to(fx[None, :], kt.shape[:2])
    if not names:
        kt = np.zeros((R, 0, 1), np.float64)
        kv = np.zeros((R, 0, 1), np.float64)
        fx = np.zeros((R, 0), bool)

    span_np = np.asarray(seg_dt) > 0.0
    ev_np = np.asarray(is_event, bool)

    def eval_col(cur_col, te_col, kt_j, kv_j, fx_j):
        # cur_col [R, S, ncols] f64, te_col [R] -> [R, S, ncols]
        def per_row(p_rows, t_r, kt_r, kv_r, fx_r):
            cv = CovView(kt_r, kv_r, fx_r, names)
            return jax.vmap(
                lambda p: jnp.asarray(seq(p, t_r, cv), jnp.float64)
            )(p_rows)

        return jax.vmap(per_row)(cur_col, te_col, kt_j, kv_j, fx_j)

    col_planes = [None] * M  # spanned columns -> [n_base, R, S] f64
    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)
            cur = jnp.broadcast_to(sp_j[None], (R,) + sp_j.shape)
            kt_j = jnp.asarray(kt, jnp.float64)
            kv_j = jnp.asarray(kv, jnp.float64)
            fx_j = jnp.asarray(fx)
            eval_jit = jax.jit(eval_col)
            for m in range(M):
                base = jnp.where(
                    jnp.asarray(ev_np[:, m])[:, None, None], sp_j[None],
                    cur,
                )
                if not span_np[:, m].any():
                    cur = base
                    continue
                new = eval_jit(base, jnp.asarray(te[:, m], jnp.float64),
                               kt_j, kv_j, fx_j)
                arr = np.asarray(new, np.float64)
                if arr.shape[2] != sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq must return exactly the "
                        "support width for segment-indexed planes — use "
                        "the default XLA engine"
                    )
                rows = [arr[:, :, i] for i in range(k)]  # [R, S] each
                rows = remap(rows) if remap else rows
                col_planes[m] = np.stack(rows, axis=0)  # [n_base, R, S]
                cur = jnp.where(
                    jnp.asarray(span_np[:, m])[:, None, None], new, base
                )
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not walk the seq chain per segment: "
            f"{e}"
        ) from e

    # per-row dedup of spanned-column chain values into level slots
    depth = np.zeros((R, M), np.float64)
    slot_maps = [{} for _ in range(R)]
    planes_rows = [[] for _ in range(R)]  # r -> list of [n_base, S]
    for m in range(M):
        pm = col_planes[m]
        if pm is None:
            continue
        for r in np.nonzero(span_np[:, m])[0]:
            key = pm[:, r, :].tobytes()
            sm = slot_maps[r]
            sl = sm.get(key)
            if sl is None:
                sl = len(sm)
                sm[key] = sl
                planes_rows[r].append(pm[:, r, :])
            depth[r, m] = sl + 1
    L = max([len(x) for x in planes_rows] + [1])
    if L > _MAX_SEQ_SEGPLANES:
        raise PharmsolError(
            f"engine='pallas' segment-indexed seq planes need {L} slots "
            f"(> {_MAX_SEQ_SEGPLANES}) — use the default XLA engine"
        )
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes would exceed the "
            f"memory cap ({L}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )
    # rows with no spanned segments never select a slot; fill with the
    # remapped raw support so every plane cell stays finite
    fill_rows = [np.asarray(sp[:, i], np.float64) for i in range(k)]
    fill_rows = remap(fill_rows) if remap else fill_rows
    fill = np.stack(fill_rows, axis=0)  # [n_base, S]
    param_planes = np.empty((L, n_base, R, S), np.float64)
    for r in range(R):
        lst = planes_rows[r] or [fill]
        for l in range(L):
            param_planes[l, :, r, :] = lst[min(l, len(lst) - 1)]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes are non-finite — "
            "use the default XLA engine"
        )
    return np.ascontiguousarray(param_planes), np.ascontiguousarray(depth)


# lag+tv-seq column planes: main+post chain values share one slot space
# per row; past this many slots the select cost stops paying
_MAX_SEQ_COLPLANES = 24


def _colplanes_dynamic_lag(equation, sp, grid, ninput: int):
    """Per-dose-COLUMN [R, S] lag planes for a DYNAMIC lag closure.

    Evaluated host-side at each bolus's original breakpoint time with
    the engine's CovView (structs.rs:629 semantics) via the seg-planes
    evaluator; returns ``{column m: [R, S]}`` for the colplanes walk
    (the analytical kernel doses one input — input 0's plane applies).
    """
    from ...config import BIG_TIME
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, _, _, rank = segment_schedule(grid.rows, with_ranks=True)
    t_sorted = np.asarray(t_sorted, np.float64)
    rank = np.asarray(rank, np.float64)
    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    t0_np = np.minimum(t_sorted, t_real_max[:, None])
    dose_mask = real & (rank == 2.0)
    dose_cols = sorted(int(m) for m in np.nonzero(dose_mask.any(axis=0))[0])
    if not dose_cols:
        raise PharmsolError(
            "engine='pallas' dynamic lag with tv-seq found no dose "
            "columns — use the default XLA engine"
        )
    seg_pl = _decompose_input_seg_planes(
        equation, sp, grid, ninput, dose_cols, t0_np
    )
    return {m: np.asarray(seg_pl[m][0][0], np.float64) for m in dose_cols}


def _decompose_seq_colplanes(seq, sp, grid, sdef, n_kernel_params: int,
                             lag_probe):
    """Per-COLUMN exact planes for lag combined with tv/time-dep seq.

    The last analytical residue: a lag moves each dose's seq-reset
    breakpoint to the per-(row, support) fire time, so no row-indexed
    stream can say which chain state a LANE is in. But with a STATIC lag
    plane the fire times ``t_dose + lag[r, s]`` are host-known scalars —
    the engine's full event walk (static resets/compounds PLUS per-lane
    fires) is computable per (row, support, kernel column):

    - walk each lane's merged event schedule (static obs/inf events +
      its own fire times, engine sort-rank tie order) applying the TRUE
      closure through the row's real CovView at each spanned segment's
      end time (the fire-ending segment applies seq AT the fire time);
    - ``main[m]`` = the chain value governing column m's span start
      (pre-fire on the fire column); ``post[m]`` = the value governing
      the remainder after a fire inside column m (used by the kernel's
      split march; filled with main where no fire can land).

    Main and post contents dedup per row into ONE slot space, returning
    (param_planes [L, n_base, R, S], seg_depth [R, M] 1-based main
    slots, seg_postdepth [R, M] post slots). The kernel selects twice
    from the same plane tensor and runs the true split march
    (_make_kernel ``lag_post``). Raises PharmsolError (-> XLA fallback)
    past the slot/memory caps.
    """
    from ...config import BIG_TIME
    from ...engine.grid import CovView
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, seg_dt, is_event, rank = segment_schedule(
        grid.rows, with_ranks=True
    )
    R, M = t_sorted.shape
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k

    t_sorted = np.asarray(t_sorted, np.float64)
    seg_dt = np.asarray(seg_dt, np.float64)
    rank = np.asarray(rank, np.float64)
    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)

    # a real zero-amount bolus is a seq-reset event the pending mechanism
    # can never fire on (same restriction as the lag_depth path)
    b_t = np.asarray(grid.rows.bolus_t, np.float64)
    b_a = np.asarray(grid.rows.bolus_amt, np.float64)
    if np.any((b_t < BIG_TIME / 2) & (b_a == 0.0)):
        raise PharmsolError(
            "engine='pallas' lag with a time-varying seq does not support "
            "zero-amount bolus records — use the default XLA engine"
        )

    # static chain events: obs(1)/inf-start(3) reset, inf-end(0) compounds;
    # bolus columns (2) are phantom (their event moved with the lag).
    # Prepend the grid start as a reset so pre-fire spans chain from raw.
    stat_mask = real & (rank != 2.0)
    E1 = int(stat_mask.sum(axis=1).max()) + 1
    stat_t = np.full((R, E1), BIG_TIME, np.float64)
    stat_code = np.ones((R, E1), np.float64)
    for r in range(R):
        idx = np.nonzero(stat_mask[r])[0]
        stat_t[r, 0] = t_sorted[r, 0] if real[r].any() else 0.0
        stat_t[r, 1:1 + len(idx)] = t_sorted[r, idx]
        stat_code[r, 1:1 + len(idx)] = np.where(rank[r, idx] == 0.0, 0.0, 1.0)

    # doses: per-row bolus columns; fire = t + lag[r, s]
    dose_mask = real & (rank == 2.0)
    ND = max(int(dose_mask.sum(axis=1).max()), 1)
    dose_t = np.full((R, ND), BIG_TIME, np.float64)
    dose_col = np.zeros((R, ND), np.int64)
    has_dose = np.zeros((R, ND), bool)
    for r in range(R):
        idx = np.nonzero(dose_mask[r])[0]
        dose_t[r, : len(idx)] = t_sorted[r, idx]
        dose_col[r, : len(idx)] = idx
        has_dose[r, : len(idx)] = True

    E = E1 + ND
    if M * n_base * R * S > _MAX_PLANE_FLOATS \
            or E * R * S * sp.shape[1] > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes would exceed the "
            f"memory cap ({M}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )

    names = list(grid.cov_names)
    kt = np.asarray(grid.rows.cov_t, np.float64)
    kv = np.asarray(grid.rows.cov_v, np.float64)
    fx = np.asarray(grid.rows.cov_fixed)
    if fx.ndim == 1 and kt.ndim == 3:
        fx = np.broadcast_to(fx[None, :], kt.shape[:2])
    if not names:
        kt = np.zeros((R, 0, 1), np.float64)
        kv = np.zeros((R, 0, 1), np.float64)
        fx = np.zeros((R, 0), bool)

    # lag per (row, support, dose): static closures broadcast one [R, S]
    # plane over every dose; DYNAMIC closures (time-dependent / reading a
    # time-varying covariate) pass a dict {column m: [R, S]} of exact
    # per-dose-column planes — each dose's fire time is still a
    # host-known scalar, so the walk is unchanged
    if isinstance(lag_probe, dict):
        lag_nd = np.zeros((R, S, ND), np.float64)
        for r in range(R):
            for jd in range(ND):
                if has_dose[r, jd]:
                    lag_nd[r, :, jd] = lag_probe[int(dose_col[r, jd])][r, :]
    else:
        lag_np2 = np.asarray(lag_probe, np.float64)  # [R, S]
        lag_nd = np.broadcast_to(
            lag_np2[:, :, None], (R, S, ND)).copy()

    def lane_walk(raw, lag_rs, st_t, st_c, d_t, trm, kt_r, kv_r, fx_r):
        # one lane: merged schedule walk -> seg values [E, ncols];
        # lag_rs [ND] = this lane's per-dose lag
        cv = CovView(kt_r, kv_r, fx_r, names)
        fire_t = d_t + lag_rs  # [ND] (pads stay ~BIG_TIME)
        times = jnp.concatenate([st_t, fire_t])
        codes = jnp.concatenate([st_c, jnp.ones_like(fire_t)])
        order = jnp.argsort(times, stable=True)  # static-first tie order
        times = times[order]
        codes = codes[order]
        ends = jnp.concatenate([times[1:], times[-1:]])
        t_eval = jnp.minimum(ends, trm)

        def step(p_cur, xs_i):
            t0, t1, te_i, code = xs_i
            base = jnp.where(code == 1.0, raw, p_cur)
            p_new = jnp.asarray(seq(base, te_i, cv), jnp.float64)
            span = t1 > t0
            p_seg = jnp.where(span, p_new, base)
            return p_seg, p_seg

        _, seg_vals = jax.lax.scan(
            step, raw, (times, ends, t_eval, codes)
        )
        return times, seg_vals  # [E], [E, ncols]

    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)

            def per_row(st_t, st_c, d_t, trm, kt_r, kv_r, fx_r, lag_row):
                return jax.vmap(
                    lambda p, lg: lane_walk(p, lg, st_t, st_c, d_t, trm,
                                            kt_r, kv_r, fx_r)
                )(sp_j, lag_row)

            times_all, seg_vals = jax.vmap(per_row)(
                jnp.asarray(stat_t), jnp.asarray(stat_code),
                jnp.asarray(dose_t), jnp.asarray(t_real_max),
                jnp.asarray(kt), jnp.asarray(kv), jnp.asarray(fx),
                jnp.asarray(lag_nd),
            )  # [R, S, E], [R, S, E, ncols]
            times_all = np.asarray(times_all, np.float64)
            seg_vals = np.asarray(seg_vals, np.float64)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not walk the lag+seq chain: {e}"
        ) from e
    if seg_vals.shape[3] != sp.shape[1]:
        # the engine scan carries the seq output as the next p_base
        # (engine/sim.py step), so exact support width is the contract —
        # enforced identically across all seq tiers
        raise PharmsolError(
            "engine='pallas' seq must return exactly the support width "
            "for lag+tv-seq column planes — use the default XLA engine"
        )

    # main[m]: segment containing column m's start (post-all-ties)
    t_cols = t_sorted  # [R, M]
    idx_main = (times_all[:, :, None, :] <= t_cols[:, None, :, None]) \
        .sum(axis=3) - 1  # [R, S, M]
    idx_main = np.clip(idx_main, 0, times_all.shape[2] - 1)
    main_vals = np.take_along_axis(
        seg_vals, idx_main[..., None], axis=2
    )  # [R, S, M, ncols]

    # post[m]: the segment STARTING at the fire, scattered to fire columns
    post_vals = main_vals.copy()
    for j in range(ND):
        fire = dose_t[:, j][:, None] + lag_nd[:, :, j]  # [R, S]
        live = has_dose[:, j][:, None] & (fire < BIG_TIME / 2)
        if not live.any():
            continue
        col_j = (t_cols[:, None, :] <= fire[:, :, None]).sum(axis=2) - 1
        col_j = np.clip(col_j, 0, M - 1)  # [R, S]
        idx_af = (times_all <= fire[:, :, None]).sum(axis=2) - 1
        idx_af = np.clip(idx_af, 0, times_all.shape[2] - 1)
        val_j = np.take_along_axis(
            seg_vals, idx_af[:, :, None, None], axis=2
        )[:, :, 0, :]  # [R, S, ncols]
        r_ix, s_ix = np.nonzero(live)
        post_vals[r_ix, s_ix, col_j[r_ix, s_ix], :] = val_j[r_ix, s_ix, :]

    def to_base(vals_rsm):  # [R, S, ncols] -> [n_base, R, S]
        rows = [vals_rsm[:, :, i] for i in range(k)]
        rows = remap(rows) if remap else rows
        return np.stack(rows, axis=0)

    span_np = seg_dt > 0.0
    depth = np.zeros((R, M), np.float64)
    postdepth = np.zeros((R, M), np.float64)
    slot_maps = [{} for _ in range(R)]
    planes_rows = [[] for _ in range(R)]

    def slot_of(r, content):
        key = content.tobytes()
        sm = slot_maps[r]
        sl = sm.get(key)
        if sl is None:
            sl = len(sm)
            sm[key] = sl
            planes_rows[r].append(content)
        return sl + 1

    for m in range(M):
        main_m = to_base(main_vals[:, :, m, :])  # [n_base, R, S]
        post_m = to_base(post_vals[:, :, m, :])
        for r in np.nonzero(span_np[:, m])[0]:
            depth[r, m] = slot_of(r, main_m[:, r, :])
            postdepth[r, m] = slot_of(r, post_m[:, r, :])
    L = max([len(x) for x in planes_rows] + [1])
    if L > _MAX_SEQ_COLPLANES:
        raise PharmsolError(
            f"engine='pallas' lag+tv-seq column planes need {L} slots "
            f"(> {_MAX_SEQ_COLPLANES}) — use the default XLA engine"
        )
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes would exceed the "
            f"memory cap ({L}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )
    fill_rows = [np.asarray(sp[:, i], np.float64) for i in range(k)]
    fill_rows = remap(fill_rows) if remap else fill_rows
    fill = np.stack(fill_rows, axis=0)
    param_planes = np.empty((L, n_base, R, S), np.float64)
    for r in range(R):
        lst = planes_rows[r] or [fill]
        for l in range(L):
            param_planes[l, :, r, :] = lst[min(l, len(lst) - 1)]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes are non-finite — "
            "use the default XLA engine"
        )
    return (np.ascontiguousarray(param_planes),
            np.ascontiguousarray(depth), np.ascontiguousarray(postdepth))


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
