"""Population likelihood: psi matrix, per-subject batch LL, progress.

Parity with /root/reference/src/simulator/likelihood/{matrix.rs,mod.rs}:

- ``log_likelihood_matrix(eq, data, support_points, error_models)`` ->
  (n_subjects, n_support_points) log-lik array (observation-based sigma),
- ``log_likelihood_batch(eq, data, parameters, residual_models)`` -> one
  log-lik per subject with that subject's own parameter row
  (prediction-based sigma; -inf on failure/missing model),
- ``log_likelihood_subject`` single-subject variant.

TPU-native execution: where the reference runs a rayon thread per subject row
with a host-side memoization cache, this evaluates the whole matrix as one
jitted ``vmap(support) x vmap(occasion-row)`` program followed by a
``segment_sum`` over occasion rows -> subjects. On a device mesh the rows and
support-point axes shard via NamedSharding (see pharmsol_tpu.parallel.mesh);
XLA inserts the collectives.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import float_dtype
from ..data.error_model import AssayErrorModels
from ..data.residual_error import ResidualErrorModels, residual_sigma_array
from ..data.structs import Data
from ..errors import PharmsolError
from .distributions import LOG_2PI
from .loglik import occasion_log_likelihood


def _as_data(subjects) -> Data:
    if isinstance(subjects, Data):
        return subjects
    return Data(list(subjects))


def check_error_model_coverage(grid, lowered) -> None:
    """Raise when a valued observation's outeq has error model None.

    Parity: the reference fails likelihood computation with
    ErrorModelError::NoneErrorModel (error_model.rs:683); the jitted path
    would otherwise silently contribute zero.
    """
    kind = np.asarray(lowered.kind)
    outeq = np.asarray(grid.rows.obs_outeq)
    active = np.asarray(grid.rows.obs_valid) & np.asarray(grid.rows.obs_has_value)
    used = np.unique(outeq[active]) if active.any() else np.array([], dtype=int)
    missing = [int(o) for o in used if kind[int(o)] == 0]
    if missing:
        raise PharmsolError(
            f"output equation(s) {missing} have observations but error model "
            f"None (define an assay error model for every observed output)"
        )


def _psi_fn(equation, cov_names, n_subjects: int):
    ll_rows = equation._ll_rows_fn(tuple(cov_names))

    def psi(rows, row_subject, support, em_kind, em_factor, em_poly):
        # [nspp, R]: vmap over support points of vmap over occasion rows
        ll = jax.vmap(lambda p: ll_rows(rows, p, em_kind, em_factor, em_poly))(
            support
        )  # [nspp, R]
        # occasion rows -> subjects
        psi_t = jax.ops.segment_sum(
            ll.T, row_subject, num_segments=n_subjects
        )  # [n_subjects, nspp]
        return psi_t

    return psi


def _pallas_structure_name(equation) -> str:
    """Map an Analytical equation's kernel fn to a pallas psi structure."""
    from ..engine.analytical import KERNELS
    from ..ops.pallas_psi import STRUCTURES

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
    from ..engine.grid import CovView, _as_input_vector

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
    from ..config import float_dtype

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
    from ..config import float_dtype
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import BIG_TIME

    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(t_sorted + seg_dt, t_real_max[:, None])  # [R, M]

    names = list(grid.cov_names)
    # evaluate through each row's REAL CovView (not a fixed-value shim) so
    # closures that read a covariate at a time OTHER than the t they are
    # handed — e.g. a baseline read cov("wt", 0.0) against a time-varying
    # wt — see exactly what the engine's view returns
    from ..engine.grid import CovView

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
    from ..config import BIG_TIME
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import float_dtype
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import BIG_TIME
    from ..engine.grid import CovView
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import BIG_TIME
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import BIG_TIME
    from ..engine.grid import CovView
    from ..ops.pallas_psi import segment_schedule

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
    from ..config import BIG_TIME, float_dtype
    from ..engine.grid import CovView
    from ..ops.pallas_psi import segment_schedule

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
    from ..engine.grid import _as_input_vector

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
    from ..config import BIG_TIME

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
    from ..config import float_dtype
    from ..ops.pallas_psi import extract_linear_out

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


class _PallasPsiPlan:
    """Validated, padded inputs for a fused pallas psi evaluation.

    Shared by the unsharded driver here and the shard_map driver in
    parallel/mesh.py so validation and stream layout cannot diverge.

    Covers every structure in engine.analytical.KERNELS (CL variants via the
    XLA-side support remap) and any output equations linear in the state —
    the coefficients are extracted from the model's ``out`` closure by basis
    evaluation per support point (see pallas_psi.extract_linear_out), so
    multi-output models stream per-observation outeq indices into the kernel.

    Covariates & seq tiers (cheapest first, see __init__): per-row
    affine factors (_decompose_seq), per-segment affine streams for
    time-varying covariates / infusion compounding (_decompose_seq_tv),
    chain-depth level tables for covariate-free seq of any form
    (_decompose_seq_levels), per-(row, support) parameter planes for
    time-constant-covariate seq of any form (_decompose_seq_planes),
    exact SEGMENT-indexed planes for seq reading t and/or a
    time-varying covariate in any form (_decompose_seq_segplanes), and
    exact per-COLUMN main/post planes for lag combined with a tv /
    time-dependent seq — the lag plane (static, or exact per-dose-COLUMN
    planes for DYNAMIC closures) makes the per-(row, support, dose)
    fire times host-known, so the full engine chain including the
    moving reset is walked host-side and the kernel runs a true split
    march selecting main and post slots per column
    (_decompose_seq_colplanes). Remaining fallbacks to the general XLA
    engine (clear errors): colplane slot-cap / memory-cap overflow,
    zero-amount bolus records under lag+seq, and exact-zero fa support
    cells in the split-march tiers.
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ..engine.grid import CovView
        from ..ops.pallas_psi import (
            SP_TILE, STRUCTURES, extract_linear_out, streams_from_grid,
        )

        self.structure = _pallas_structure_name(equation)
        sdef = STRUCTURES[self.structure]
        n_kernel_params = sdef["n_params"]
        kernel_inputs = getattr(equation, "_kernel_inputs", None)
        if kernel_inputs is None and sp.shape[1] < n_kernel_params:
            # declarative models map declared columns onto kernel params, so
            # the width constraint applies only to raw kernel-order supports
            raise PharmsolError(
                f"engine='pallas' with `{self.structure}` needs support columns "
                f"[{n_kernel_params} kernel params..., out params...], got "
                f"{sp.shape[1]} columns"
            )
        if kernel_inputs is not None:
            dest = getattr(equation, "_bolus_dest", None)
            if dest and int(dest[0]) != int(sdef["dose_state"]):
                raise PharmsolError(
                    f"engine='pallas' with `{self.structure}` expects the "
                    f"bolus route to target state {sdef['dose_state']}, "
                    f"this model doses state {dest[0]} — use the default "
                    "XLA engine"
                )
        # init equation: covariate-independent init evaluates to per-support
        # initial-state rows, applied by the kernel on occasion-0 rows via
        # the init-mask stream (same scheme as the ODE tier);
        # covariate-dependent init rides per-(row, support) planes
        self.init_rows = None
        self.init_planes = None
        if equation._init is not None:
            init_fn = equation._init
            cov_vals0, _ = (_classify_covariates(grid)
                            if grid.cov_names else ({}, set()))
            icov0 = {n: float(np.asarray(v)[0])
                     for n, v in cov_vals0.items()}
            icov1 = {n: v * 1.31 + 0.17 for n, v in icov0.items()}

            def init_at(p, covd):
                return jnp.asarray(
                    init_fn(p, jnp.asarray(0.0, jnp.float64),
                            _RowCov(covd)),
                    jnp.float64,
                )

            try:
                with _host_cpu_device():
                    i_ref = np.asarray(jax.vmap(
                        lambda p: init_at(p, icov0))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    i_cov = (np.asarray(jax.vmap(
                        lambda p: init_at(p, icov1))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                        if icov0 else i_ref)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the init equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if not np.all(np.isfinite(i_ref)):
                raise PharmsolError(
                    "engine='pallas' init probe produced non-finite values"
                )
            if i_ref.shape[1] != sdef["n_states"]:
                raise PharmsolError(
                    f"engine='pallas' with `{self.structure}` expects init "
                    f"to return {sdef['n_states']} states, got "
                    f"{i_ref.shape[1]}"
                )
            if icov0 and np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
                # covariate-dependent init: evaluate exactly per (row,
                # support) at t=0 and ride per-state [R, S] planes
                # (engine/sim.py:147-152 applies init at t=0.0)
                cov_at0 = _covariate_values_at(grid, 0.0)
                names = tuple(grid.cov_names)
                cov_mat = np.stack(
                    [np.asarray(cov_at0[n], np.float64) for n in names],
                    axis=1,
                )  # [R, ncov]

                def init_row(p, cv):
                    covd = {n: cv[i] for i, n in enumerate(names)}
                    return init_at(p, covd)

                try:
                    with _host_cpu_device():
                        pl_ = np.asarray(
                            jax.vmap(lambda cv: jax.vmap(
                                lambda p: init_row(p, cv))(
                                    jnp.asarray(sp, jnp.float64)))(
                                jnp.asarray(cov_mat, jnp.float64)),
                            np.float64,
                        )  # [R, S, n_states]
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' could not evaluate the "
                        f"covariate-dependent init per row: {e}"
                    ) from e
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent init "
                        "evaluation produced non-finite values"
                    )
                if np.any(pl_ != 0.0):
                    self.init_planes = np.transpose(pl_, (2, 0, 1))
            elif np.any(i_ref != 0.0):
                self.init_rows = i_ref.T  # [n_states, S]
        self.mult = None
        self.mult_off = None
        self.mult_seg = None
        self.mult_seg_off = None
        self.param_levels = None
        self.param_planes = None
        self.seg_depth = None
        self.seg_evcode = None
        self.seg_postdepth = None
        self.sp_kernel = None
        cov_values = {}
        # probe the lag closure FIRST: an active lag moves the seq-reset
        # breakpoints to per-(row, support) fire times, which changes how
        # the seq chain depth must be decomposed below (lag_mode)
        ninput = int(equation.ndrugs())
        lag_probe = None
        lag_fa_dynamic = False
        lag_active = False
        if equation._lag is not None:
            try:
                lag_probe = _decompose_input_plane(
                    equation._lag, sp, grid, ninput, 0.0, "lag"
                )
            except _InputPlaneDynamic:
                lag_fa_dynamic = True
                lag_active = True
            else:
                lag_active = bool(np.any(lag_probe != 0.0))
        if kernel_inputs is not None:
            (self.sp_kernel, self.mult, self.mult_off, self.mult_seg,
             self.mult_seg_off) = _decompose_kernel_inputs(
                kernel_inputs, sp, grid, n_kernel_params,
                allow_mult=sdef["prep_xla"] is None,
            )
        elif equation._seq is not None:
            from ..config import BIG_TIME

            affine_err = None
            if sdef["prep_xla"] is None:
                has_real_inf = bool(
                    np.any(np.asarray(grid.rows.inf_t) < BIG_TIME / 2)
                )
                cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)
                time_varying = bool(
                    grid.cov_names and cov_v.ndim == 3
                    and not np.all(cov_v == cov_v[..., :1])
                )
                try:
                    if time_varying or has_real_inf:
                        # per-segment factors: time-varying covariates,
                        # and/or the engine's seq compounding across
                        # infusion-end sub-splits (a single per-row
                        # multiplier is wrong there). With an active lag
                        # the baked chain cannot express the moving reset
                        # — fall through to the levels/planes tier, whose
                        # in-kernel depth counter can (lag_mode).
                        if not lag_active:
                            self.mult_seg, self.mult_seg_off = \
                                _decompose_seq_tv(
                                    equation._seq, sp, grid, n_kernel_params
                                )
                    else:
                        cov_values = (
                            _constant_covariate_values(grid)
                            if grid.cov_names else {}
                        )
                        try:
                            self.mult, self.mult_off = _decompose_seq(
                                equation._seq, sp, cov_values,
                                n_kernel_params, n_rows_total=grid.n_rows,
                            )
                        except PharmsolError as e:
                            if "time-independent" not in str(e) or lag_active:
                                raise
                            # time-dependent but (potentially) affine:
                            # per-segment factors at each segment end
                            self.mult_seg, self.mult_seg_off = \
                                _decompose_seq_tv(
                                    equation._seq, sp, grid, n_kernel_params
                                )
                except PharmsolError as e:
                    affine_err = e
            if self.mult is None and self.mult_seg is None:
                # covariate-free time-independent seq of ANY form (incl.
                # parameter mixing and 3-cmt structures): chain-depth levels
                try:
                    self.param_levels, seq_stream = _decompose_seq_levels(
                        equation._seq, sp, grid, sdef, n_kernel_params,
                        lag_mode=lag_active,
                    )
                except PharmsolError as level_err:
                    # covariate-DEPENDENT time-independent seq of any form
                    # over time-constant covariates: exact per-(row, support)
                    # parameter planes, one set per chain depth
                    try:
                        self.param_planes, seq_stream = \
                            _decompose_seq_planes(
                                equation._seq, sp, grid, sdef,
                                n_kernel_params, lag_mode=lag_active,
                            )
                    except PharmsolError as plane_err:
                        if lag_active:
                            # lag + tv/time-dependent seq: per-COLUMN
                            # exact planes + the split march — the fire
                            # times must be host-known. Static closures
                            # give one [R, S] lag plane; DYNAMIC closures
                            # (time-dependent / reading a tv covariate)
                            # give exact per-dose-COLUMN planes via the
                            # seg-planes evaluator — every fire time is
                            # still a host-known scalar per (row,
                            # support, dose)
                            lag_arg = lag_probe
                            if lag_fa_dynamic:
                                try:
                                    lag_arg = _colplanes_dynamic_lag(
                                        equation, sp, grid, ninput
                                    )
                                except PharmsolError:
                                    raise (affine_err or plane_err
                                           or level_err)
                            if lag_arg is None:
                                raise affine_err or plane_err or level_err
                            try:
                                (self.param_planes, self.seg_depth,
                                 self.seg_postdepth) = \
                                    _decompose_seq_colplanes(
                                        equation._seq, sp, grid, sdef,
                                        n_kernel_params, lag_arg,
                                    )
                            except PharmsolError:
                                raise affine_err or plane_err or level_err
                            seq_stream = None
                        else:
                            # time-dependent and/or time-varying-covariate
                            # seq of ANY form: exact segment-indexed planes
                            try:
                                self.param_planes, seq_stream = \
                                    _decompose_seq_segplanes(
                                        equation._seq, sp, grid, sdef,
                                        n_kernel_params,
                                    )
                            except PharmsolError:
                                raise affine_err or plane_err or level_err
                n_lv = (self.param_levels if self.param_levels is not None
                        else self.param_planes).shape[0]
                if self.seg_postdepth is not None:
                    pass  # colplanes: both slot streams already set
                elif lag_active and n_lv > 1:
                    # lag + depth > 1: in-kernel depth counter on evcodes
                    self.seg_evcode = seq_stream
                elif lag_active:
                    # depth never exceeds 1 even without fires: every
                    # spanned segment uses seq^1 regardless of where the
                    # dose lands — the plain (cheaper, superposition-fire)
                    # lag path is exact; rebuild the ordinary depth stream
                    self.seg_depth, _ = _seq_depth_stream(grid)
                else:
                    self.seg_depth = seq_stream
        # lag/fa: per-(row, support) planes via the kernel's pending-dose /
        # amount-scale mechanism (structs.rs:611-666). Time-dependent
        # closures and closures that READ a time-varying covariate switch
        # to exact per-DOSE-SEGMENT planes (built after the streams below,
        # same mechanism as the ODE tier's slot tables).
        self.lag_plane = None
        self.fa_plane = None
        self.lag_slots = None
        self.fa_slots = None
        if lag_active:
            # a lag-shifted dose inserts a real-event seq-reset breakpoint.
            # Per-segment affine streams cannot express it (the baked
            # compounding chain would need per-reset-position stream sets);
            # depth-selected levels/planes ride the in-kernel depth counter
            # (seg_evcode above) — and when the chain depth is 1 everywhere
            # the reset is a no-op and the plain superposition path holds.
            if self.mult_seg is not None:
                raise PharmsolError(
                    "engine='pallas' does not support lag together with "
                    "per-segment seq streams (a lag-shifted dose adds a "
                    "seq-reset breakpoint the host-side affine chain "
                    "cannot express) — use the default XLA engine"
                )
            if lag_probe is not None and np.any(lag_probe != 0.0):
                _validate_lag_no_overlap(lag_probe, grid)
                self.lag_plane = lag_probe
        if equation._fa is not None and not lag_fa_dynamic:
            try:
                fp = _decompose_input_plane(
                    equation._fa, sp, grid, ninput, 1.0, "fa"
                )
            except _InputPlaneDynamic:
                # the seg-plane path re-evaluates BOTH closures per dose
                # segment (fa is defined at the lag-shifted time, so the
                # two are coupled)
                lag_fa_dynamic = True
                self.lag_plane = None
            else:
                if np.any(fp != 1.0):
                    self.fa_plane = fp
        if grid.cov_names and equation._out is not None:
            # covariates may only act through seq; the out() closure must be
            # support-only for the per-support linear extraction to hold.
            # For time-varying covariates probe with first-knot values.
            if not cov_values:
                cov_v3 = np.asarray(grid.rows.cov_v, dtype=np.float64)
                if cov_v3.ndim == 3:
                    cov_values = {
                        n: cov_v3[:, c, 0]
                        for c, n in enumerate(grid.cov_names)
                    }
            _check_out_covariate_free(
                equation, sp, cov_values, sdef["n_states"], CovView
            )
        self.n_out = int(equation.nouteqs())
        n_states = sdef["n_states"]
        if int(equation.nstates()) != n_states:
            raise PharmsolError(
                f"engine='pallas' with `{self.structure}` expects nstates="
                f"{n_states}, got {equation.nstates()}"
            )

        streams = streams_from_grid(grid.rows, lowered)
        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        lag_seg_planes = None
        fa_seg_planes = None
        if lag_fa_dynamic:
            # exact per-dose-segment planes: evaluate the closures host-side
            # with the engine's CovView at each bolus's breakpoint time
            # (lag at the ORIGINAL time, fa at the lag-shifted time —
            # structs.rs:629 / engine/grid.py:502-512), selected statically
            # in the kernel by (segment) -> plane-slot tables
            from ..config import BIG_TIME
            from ..ops.pallas_psi import segment_schedule

            _, t_sorted, _, _ = segment_schedule(grid.rows)
            real = t_sorted < BIG_TIME / 2
            t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
            t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
            seg_t0_np = np.minimum(t_sorted, t_real_max[:, None])
            bol_np = np.asarray(streams[1], np.float64)
            dose_cols = [m for m in range(self.M)
                         if np.any(bol_np[:, m] != 0.0)]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0_np
            )
            has_lag_dyn = equation._lag is not None and any(
                np.any(seg_pl[m][0][0] != 0.0) for m in dose_cols
            )
            has_fa_dyn = equation._fa is not None and any(
                np.any(seg_pl[m][1][0] != 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                # pairwise no-overlap per row: each dose's lag (max over
                # supports) must elapse before the row's NEXT dose arrives
                # — the kernel holds ONE pending slot
                for r in range(self.R):
                    cols = [m for m in dose_cols if bol_np[r, m] != 0.0]
                    cols.sort(key=lambda m: seg_t0_np[r, m])
                    for m1, m2 in zip(cols, cols[1:]):
                        gap = seg_t0_np[r, m2] - seg_t0_np[r, m1]
                        lag_max = seg_pl[m1][0][0, r, :].max()
                        # strict: lag == gap clobbers the pending slot
                        if lag_max >= gap:
                            raise PharmsolError(
                                f"engine='pallas' lag support requires "
                                f"each dose's lag to elapse strictly "
                                f"before the next dose (row {r}: max lag "
                                f"{lag_max:.4g} >= gap {gap:.4g}) — use "
                                f"the default XLA engine"
                            )
                slots = [-1] * self.M
                lag_seg_planes = []
                for m in dose_cols:
                    slots[m] = len(lag_seg_planes)
                    lag_seg_planes.append(seg_pl[m][0][0])
                self.lag_slots = tuple(slots)
            if has_fa_dyn:
                slots = [-1] * self.M
                fa_seg_planes = []
                for m in dose_cols:
                    slots[m] = len(fa_seg_planes)
                    fa_seg_planes.append(seg_pl[m][1][0])
                self.fa_slots = tuple(slots)
        if (self.seg_evcode is not None and self.lag_plane is None
                and self.lag_slots is None):
            # the lag probe was dynamic but every per-dose lag came back
            # zero: no dose ever fires in-kernel, so boluses DO reset the
            # chain at their original breakpoints — use the ordinary
            # host-side depth stream (levels beyond the engine's max are
            # simply never selected)
            self.seg_evcode = None
            self.seg_depth, _ = _seq_depth_stream(grid)
        if self.seg_evcode is not None or self.seg_postdepth is not None:
            # split-march tiers fire on pend_amt != 0 (ops/pallas_psi.py
            # lag_depth/lag_post): a support cell whose fa evaluates to
            # EXACTLY 0.0 would never fire, silently skipping the seq
            # reset the engine still applies at the lag-shifted dose —
            # reject to XLA like zero-amount bolus records
            fa_all = list(fa_seg_planes or [])
            if self.fa_plane is not None:
                fa_all.append(self.fa_plane)
            for fp in fa_all:
                if np.any(np.asarray(fp, np.float64) == 0.0):
                    raise PharmsolError(
                        "engine='pallas' lag combined with seq does not "
                        "support bioavailability cells that are exactly "
                        "zero (the pending dose would never fire its "
                        "seq reset) — use the default XLA engine"
                    )
        self.Rp = ((self.R + row_multiple - 1) // row_multiple) * row_multiple
        self.Sp = ((self.S + SP_TILE - 1) // SP_TILE) * SP_TILE
        # compiled Mosaic kernels are float32-only; the CPU interpret path
        # keeps the configured float dtype (f64 under the test config)
        fd = float_dtype()
        if jax.devices()[0].platform == "tpu":
            fd = jnp.float32
        self.fd = fd

        def pad_rows(a):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return a
            return np.concatenate(
                [a, np.zeros((self.Rp - self.R, a.shape[1]), dtype=a.dtype)],
                axis=0,
            )

        self.padded = [jnp.asarray(pad_rows(a), dtype=fd) for a in streams]

        def pad_rows_fill(a, fill):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return jnp.asarray(a, dtype=fd)
            pad = np.full((self.Rp - self.R,) + a.shape[1:], fill)
            return jnp.asarray(np.concatenate([a, pad], axis=0), dtype=fd)

        # padded rows get identity factors: multiplier 1, offset 0
        self.mult_dev = (
            pad_rows_fill(self.mult, 1.0) if self.mult is not None else None
        )
        self.mult_off_dev = (
            pad_rows_fill(self.mult_off, 0.0)
            if self.mult_off is not None else None
        )
        self.mult_seg_dev = (
            pad_rows_fill(self.mult_seg, 1.0)
            if self.mult_seg is not None else None
        )
        self.mult_seg_off_dev = (
            pad_rows_fill(self.mult_seg_off, 0.0)
            if self.mult_seg_off is not None else None
        )
        self.seg_depth_dev = (
            pad_rows_fill(self.seg_depth, 0.0)
            if self.seg_depth is not None else None
        )
        self.seg_evcode_dev = (
            pad_rows_fill(self.seg_evcode, 0.0)
            if self.seg_evcode is not None else None
        )
        self.seg_postdepth_dev = (
            pad_rows_fill(self.seg_postdepth, 0.0)
            if self.seg_postdepth is not None else None
        )

        def pad_plane(a, fill):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp != self.R:
                a = np.concatenate(
                    [a, np.full((self.Rp - self.R, a.shape[1]), fill)], axis=0
                )
            if self.Sp != self.S:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], self.Sp - self.S, axis=1)], axis=1
                )
            return jnp.asarray(a, dtype=fd)

        # lag/fa ride as tuples of [Rp, Sp] planes: one plane (constant
        # closures, slots None) or one per dose segment (slot tables)
        if lag_seg_planes is not None:
            self.lag_plane_dev = tuple(
                pad_plane(p, 0.0) for p in lag_seg_planes)
        elif self.lag_plane is not None:
            self.lag_plane_dev = (pad_plane(self.lag_plane, 0.0),)
        else:
            self.lag_plane_dev = None
        if fa_seg_planes is not None:
            self.fa_plane_dev = tuple(
                pad_plane(p, 1.0) for p in fa_seg_planes)
        elif self.fa_plane is not None:
            self.fa_plane_dev = (pad_plane(self.fa_plane, 1.0),)
        else:
            self.fa_plane_dev = None

        def pad_support(a):
            if self.Sp == self.S:
                return a
            return np.concatenate(
                [a, np.repeat(a[-1:], self.Sp - self.S, axis=0)], axis=0
            )

        sp_padded = pad_support(sp)
        # declarative models: the kernel consumes the anchored kernel-order
        # support; the out-coefficient extraction below keeps the DECLARED
        # support (out closures index declared parameters)
        self.sp_dev = jnp.asarray(
            pad_support(self.sp_kernel) if self.sp_kernel is not None
            else sp_padded,
            dtype=fd,
        )
        self.param_levels_dev = None
        if self.param_levels is not None:
            lv = np.asarray(self.param_levels, np.float64)  # [L, n_base, S]
            if self.Sp != self.S:
                lv = np.concatenate(
                    [lv, np.repeat(lv[..., -1:], self.Sp - self.S, axis=-1)],
                    axis=-1,
                )
            self.param_levels_dev = jnp.asarray(lv, dtype=fd)
        self.param_planes_dev = None
        if self.param_planes is not None:
            pp = np.asarray(self.param_planes, np.float64)  # [L, nb, R, S]
            if self.Rp != self.R:
                # padded rows are dead (depth 0) but ride prepare(): fill
                # with 1.0 so eigen/ratio math stays finite
                pp = np.concatenate(
                    [pp, np.ones(pp.shape[:2] + (self.Rp - self.R,
                                                 pp.shape[3]))],
                    axis=2,
                )
            if self.Sp != self.S:
                pp = np.concatenate(
                    [pp, np.repeat(pp[..., -1:], self.Sp - self.S, axis=-1)],
                    axis=-1,
                )
            self.param_planes_dev = jnp.asarray(pp, dtype=fd)
        self.init_mask_dev = None
        self.init_rows_dev = None
        self.init_planes_dev = None
        if self.init_rows is not None or self.init_planes is not None:
            im = np.asarray(grid.rows.init_mask, np.float64).reshape(-1)
            init_mask_rm = np.zeros((self.R, self.M))
            init_mask_rm[:, 0] = im
            self.init_mask_dev = jnp.asarray(
                pad_rows(init_mask_rm), dtype=fd
            )
        if self.init_rows is not None:
            ir = np.asarray(self.init_rows, np.float64)  # [n_states, S]
            if self.Sp != self.S:
                ir = np.concatenate(
                    [ir, np.repeat(ir[:, -1:], self.Sp - self.S, axis=1)],
                    axis=1,
                )
            self.init_rows_dev = jnp.asarray(ir, dtype=fd)
        if self.init_planes is not None:
            self.init_planes_dev = jnp.stack([
                pad_plane(self.init_planes[s], 0.0)
                for s in range(n_states)
            ])
        # output coefficients: y_k = C_k(p) . x + b_k(p), per support point
        out_fn = equation._out or (lambda x, p, t, cov: x[: self.n_out])
        occ0 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[0]), grid.rows
        )
        cov = CovView(
            occ0.cov_t.astype(fd), occ0.cov_v.astype(fd), occ0.cov_fixed,
            tuple(grid.cov_names),
        )
        try:
            C, b = extract_linear_out(
                out_fn, sp_padded, n_states, self.n_out, cov, fd
            )
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' could not extract linear output "
                f"coefficients for `{self.structure}` (support columns "
                f"mismatch or non-linear output): {e}"
            ) from e
        # [n_out, n_states, Sp] rows for the kernel
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        # all-zero optional streams are passed as None so psi_oral's static
        # has_inf/has_cens flags survive jit tracing and the lean kernel
        # variants compile
        self.pass_inf = bool(np.any(streams[2]))
        self.pass_cens = bool(np.any(streams[6]))
        self.pass_outeq = self.n_out > 1

    def cache_key(self, *extra):
        lv = self.param_levels_dev
        pp = self.param_planes_dev
        return ("pallas", self.structure, self.Rp, self.Sp, self.M,
                self.pass_inf, self.pass_cens, self.pass_outeq, self.n_out,
                self.out_bias is not None, self.mult_dev is not None,
                self.mult_off_dev is not None,
                self.mult_seg_dev is not None,
                self.mult_seg_off_dev is not None,
                None if lv is None else int(lv.shape[0]),
                None if pp is None else tuple(int(d) for d in pp.shape[:2]),
                self.init_rows_dev is not None,
                self.init_planes_dev is not None,
                None if self.lag_plane_dev is None
                else len(self.lag_plane_dev),
                None if self.fa_plane_dev is None
                else len(self.fa_plane_dev),
                self.seg_evcode_dev is not None,
                self.seg_postdepth_dev is not None,
                self.lag_slots, self.fa_slots, str(self.fd)) + extra

    def stream_args(self):
        """The row-axis streams ([Rp, M] segments + [Rp, ...] seq factors
        and [Rp, Sp] lag/fa planes)."""
        p = self.padded
        include = [True, True, self.pass_inf, True, True, True,
                   self.pass_cens, self.pass_outeq]
        out = tuple(a for a, inc in zip(p, include) if inc)
        for a in (self.mult_dev, self.mult_off_dev, self.mult_seg_dev,
                  self.mult_seg_off_dev, self.seg_depth_dev,
                  self.seg_evcode_dev, self.seg_postdepth_dev,
                  self.init_mask_dev):
            if a is not None:
                out = out + (a,)
        for planes in (self.lag_plane_dev, self.fa_plane_dev):
            if planes is not None:
                out = out + tuple(planes)
        if self.init_planes_dev is not None:
            # one [Rp, Sp] plane per state (rows leading, so the sharded
            # driver's subjects-axis specs apply uniformly)
            out = out + tuple(
                self.init_planes_dev[s]
                for s in range(self.init_planes_dev.shape[0])
            )
        if self.param_planes_dev is not None:
            # flattened [Rp, Sp] parameter planes, level-major then
            # base-row (rows leading for the sharded driver)
            pp = self.param_planes_dev
            out = out + tuple(
                pp[l, i]
                for l in range(pp.shape[0]) for i in range(pp.shape[1])
            )
        return out

    def rep_args(self):
        """Support-axis arrays (replicated under sharding): support,
        coef[, bias][, seq level tables]."""
        out = [self.sp_dev, self.out_coef]
        if self.out_bias is not None:
            out.append(self.out_bias)
        if self.param_levels_dev is not None:
            out.append(self.param_levels_dev)
        if self.init_rows_dev is not None:
            out.append(self.init_rows_dev)
        return tuple(out)

    def runner(self):
        """A (streams..., rep...) -> psi rows function around psi_oral."""
        from ..ops.pallas_psi import psi_oral

        structure = self.structure
        pass_inf, pass_cens = self.pass_inf, self.pass_cens
        pass_outeq = self.pass_outeq
        pass_mult = self.mult_dev is not None
        pass_mult_off = self.mult_off_dev is not None
        pass_mult_seg = self.mult_seg_dev is not None
        pass_mult_seg_off = self.mult_seg_off_dev is not None
        pass_depth = self.seg_depth_dev is not None
        pass_evcode = self.seg_evcode_dev is not None
        pass_postdepth = self.seg_postdepth_dev is not None
        pass_levels = self.param_levels_dev is not None
        plane_dims = (tuple(int(d) for d in self.param_planes_dev.shape[:2])
                      if self.param_planes_dev is not None else None)
        n_param_planes = plane_dims[0] * plane_dims[1] if plane_dims else 0
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        pass_init_rows = self.init_rows_dev is not None
        pass_init = pass_init_rows or n_init_planes > 0
        pass_lag = self.lag_plane_dev is not None
        pass_fa = self.fa_plane_dev is not None
        n_lag_pl = len(self.lag_plane_dev) if pass_lag else 0
        n_fa_pl = len(self.fa_plane_dev) if pass_fa else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        has_bias = self.out_bias is not None
        n_streams = (5 + int(pass_inf) + int(pass_cens) + int(pass_outeq)
                     + int(pass_mult) + int(pass_mult_off)
                     + int(pass_mult_seg) + int(pass_mult_seg_off)
                     + int(pass_depth) + int(pass_evcode)
                     + int(pass_postdepth) + int(pass_init)
                     + n_lag_pl + n_fa_pl + n_init_planes
                     + n_param_planes)

        def run(*args):
            it = iter(args[:n_streams])
            dt, bol = next(it), next(it)
            inf = next(it) if pass_inf else None
            mask, val, sig = next(it), next(it), next(it)
            cens = next(it) if pass_cens else None
            outeq = next(it) if pass_outeq else None
            mult = next(it) if pass_mult else None
            mult_off = next(it) if pass_mult_off else None
            mult_seg = next(it) if pass_mult_seg else None
            mult_seg_off = next(it) if pass_mult_seg_off else None
            depth = next(it) if pass_depth else None
            evc = next(it) if pass_evcode else None
            postd = next(it) if pass_postdepth else None
            initm = next(it) if pass_init else None
            lagp = (tuple(next(it) for _ in range(n_lag_pl))
                    if pass_lag else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if pass_fa else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            ppl = None
            if plane_dims:
                flat = [next(it) for _ in range(n_param_planes)]
                ppl = jnp.stack(flat).reshape(
                    plane_dims + flat[0].shape
                )
            rep = iter(args[n_streams:])
            sp_dev, coef = next(rep), next(rep)
            bias = next(rep) if has_bias else None
            levels = next(rep) if pass_levels else None
            init_r = next(rep) if pass_init_rows else None
            return psi_oral(dt, bol, inf, mask, val, sig, cens, sp_dev,
                            structure=structure, obs_outeq=outeq,
                            out_coef=coef, out_bias=bias, param_mult=mult,
                            param_mult_seg=mult_seg, param_offset=mult_off,
                            param_offset_seg=mult_seg_off,
                            param_levels=levels, param_planes=ppl,
                            seg_depth=depth, seg_evcode=evc,
                            seg_postdepth=postd,
                            lag_plane=lagp, fa_plane=fap,
                            lag_slots=lag_slots, fa_slots=fa_slots,
                            init_rows=init_r, init_planes=ipl,
                            init_mask=initm)

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        """Unpad and aggregate occasion rows -> subjects."""
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi


# a merged span holds one extra [rows, sp] carry lane per interior obs in
# the kernel's while carry — cap the span length to bound VMEM growth
_ODE_MERGE_MAX_SPAN = 16


def _ode_merge_runs(streams, seg_t0, solver, *, n_bolus_in, n_rate_in,
                    affine_streams, has_lag):
    """Static (m0, m1) spans whose interior breakpoints the fused ODE
    kernel may cross with dense output (see ops/pallas_ode.psi_ode).

    A breakpoint m (the start of column m) is crossable iff on EVERY row:
    no bolus lands there (any input), the infusion rates and time-varying
    covariate affine (a, b) streams are identical across it, and the
    segment times are contiguous (t0[m] == t0[m-1] + dt[m-1] — dead
    trailing columns satisfy this with dt 0). Returns None when no span
    would merge (the kernel then runs the classic per-segment march).
    """
    import os

    from ..ops.pallas_ode import _SDIRK_TABLEAUS, dense_P_for

    if (dense_P_for(solver) is None and solver not in _SDIRK_TABLEAUS) \
            or has_lag:
        return None
    if (solver in _SDIRK_TABLEAUS
            and _SDIRK_TABLEAUS[solver]["order"] > 3.0):
        # the cubic-Hermite interior capture is order-matched only for
        # the 2nd/3rd-order stiffly-accurate tableaus; kvaerno5 marches
        # segment by segment
        return None
    if os.environ.get("PHARMSOL_ODE_NO_MERGE") == "1":
        # perf-experiment kill switch; lives HERE (not in psi_ode) so the
        # choice is part of the plan and its cache_key
        return None
    dt_np = np.asarray(streams[0], np.float64)
    M = dt_np.shape[1]
    if M < 2:
        return None
    mergeable = np.ones(M, dtype=bool)
    mergeable[0] = False
    for b in range(n_bolus_in):
        bol = np.asarray(streams[1 + b], np.float64)
        mergeable &= np.all(bol == 0.0, axis=0)
    for r in range(n_rate_in):
        rate = np.asarray(streams[1 + n_bolus_in + r], np.float64)
        mergeable[1:] &= np.all(rate[:, 1:] == rate[:, :-1], axis=0)
    for a, bb in affine_streams.values():
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        mergeable[1:] &= np.all(a[:, 1:] == a[:, :-1], axis=0)
        mergeable[1:] &= np.all(bb[:, 1:] == bb[:, :-1], axis=0)
    t0_np = np.asarray(seg_t0, np.float64)
    cont = np.abs(t0_np[:, 1:] - (t0_np[:, :-1] + dt_np[:, :-1])) \
        <= 1e-9 * np.maximum(1.0, np.abs(t0_np[:, 1:]))
    mergeable[1:] &= np.all(cont, axis=0)
    runs = []
    start = 0
    for m in range(1, M + 1):
        if m == M or not mergeable[m] or (m - start) >= _ODE_MERGE_MAX_SPAN:
            runs.append((start, m))
            start = m
    if all(b - a == 1 for a, b in runs):
        return None
    return tuple(runs)


class _PallasOdePsiPlan:
    """Validated, padded inputs for a fused pallas ODE psi evaluation.

    The ODE companion of :class:`_PallasPsiPlan` (same contract: cache_key /
    stream_args / rep_args / runner / finalize, so the driver below and any
    sharded driver treat both uniformly). Everything the kernel cannot probe
    per-step is extracted here by host-side numeric probes on the CPU
    backend (support-only work):

    - bolus map: the engine applies boluses by RHS difference
      (ode/mod.rs:644-687); the probe verifies the difference is
      state-independent, amount-linear, time- and covariate-independent,
      and extracts the per-support per-unit-dose state increment;
    - init rows: ``init(p, 0, cov)`` per support (occasion-0 rows only,
      via the init-mask stream); covariate-dependent init falls back;
    - linear output coefficients: pallas_psi.extract_linear_out;
    - lane-RHS compatibility: the user RHS is traced once with 2-D lane
      shims; styles the shim cannot carry (dynamic indexing, ``.at`` on a
      dense state vector) fall back to the XLA engine;
    - covariates: time-constant ones ride per-row lanes; time-varying
      ones ride per-segment affine ``(a, b)`` streams (exact vs the
      reference interpolation when every knot falls on a segment
      boundary — _affine_covariate_streams validates, else fallback).
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ..config import BIG_TIME
        from ..engine.grid import CovView
        from ..ops.pallas_ode import (
            _SDIRK_TABLEAUS, _TABLEAUS, make_lane_rhs,
        )
        from ..ops.pallas_psi import (
            SP_TILE, extract_linear_out, segment_schedule, streams_from_grid,
        )

        opts = equation._opts
        if (opts.solver not in _TABLEAUS
                and opts.solver not in _SDIRK_TABLEAUS
                and opts.solver not in ("bdf", "expm")):
            raise PharmsolError(
                f"engine='pallas' ODE psi supports solvers "
                f"{sorted(_TABLEAUS) + sorted(_SDIRK_TABLEAUS)
                   + ['bdf', 'expm']} "
                f"(model uses `{opts.solver}`; use the default XLA engine)"
            )
        self.opts = opts
        self.diffeq = equation._diffeq
        self.n_states = int(equation.nstates())
        self.n_out = int(equation.nouteqs())
        n_states = self.n_states
        ninput = int(equation.ndrugs())
        self.ninput = ninput
        n_params = sp.shape[1]
        self.n_params = n_params
        fd_probe = np.float64
        cov_values, varying_covs = _classify_covariates(grid)
        self.cov_names = tuple(grid.cov_names)
        self.cov_modes = tuple(
            "affine" if n in varying_covs else "const"
            for n in self.cov_names
        )

        # --- active dose inputs ------------------------------------------
        # multi-drug models dose into several RHS inputs; each active input
        # gets its own bolus stream + probed bolus map (and rate stream)
        from ..config import BIG_TIME as _BT

        bt_ = np.asarray(grid.rows.bolus_t, np.float64)
        ba_ = np.asarray(grid.rows.bolus_amt, np.float64)
        bi_ = np.asarray(grid.rows.bolus_input)
        real_b = (bt_ < _BT / 2) & (ba_ != 0.0)
        bolus_inputs = tuple(sorted(
            {int(j) for j in bi_[real_b]})) or (0,)
        it_ = np.asarray(grid.rows.inf_t, np.float64)
        rate_inputs = (0,)
        if it_.size:
            ia_ = np.asarray(grid.rows.inf_amt, np.float64)
            ii_ = np.asarray(grid.rows.inf_input)
            real_i = (it_ < _BT / 2) & (ia_ != 0.0)
            rate_inputs = tuple(sorted(
                {int(j) for j in ii_[real_i]})) or (0,)
        if max(bolus_inputs + rate_inputs) >= ninput:
            raise PharmsolError(
                f"engine='pallas' ODE psi: a dose targets input "
                f">= ndrugs ({ninput})"
            )
        self.bolus_inputs = bolus_inputs
        self.rate_inputs = rate_inputs

        # lag/fa plane construction is deferred until the segment streams
        # exist (the dynamic path needs the dose-carrying columns); see
        # the block after seg_t0 below.

        # --- host probes (CPU backend, tiny shapes) -----------------------
        p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
        x_a = np.linspace(0.7, 1.9, n_states)
        x_b = np.flip(x_a) * 1.31 + 0.23
        cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
        cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}
        diffeq = self.diffeq

        def delta(p, x, amt, t, covd, j):
            b = jnp.zeros((ninput,), jnp.float64).at[j].set(amt)
            z = jnp.zeros((ninput,), jnp.float64)
            shim = _RowCov(covd)
            xj = jnp.asarray(x, jnp.float64)
            tj = jnp.asarray(t, jnp.float64)
            with_b = jnp.asarray(diffeq(xj, p, tj, b, z, shim), jnp.float64)
            no_b = jnp.asarray(diffeq(xj, p, tj, z, z, shim), jnp.float64)
            return with_b - no_b

        bmaps = []
        bolus_rhs_diff = False
        for j in bolus_inputs:
            try:
                with _host_cpu_device():
                    d_ref = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_x = np.asarray(jax.vmap(
                        lambda p: delta(p, x_b, 1.0, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_amt = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 2.37, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_t = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 17.31, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_cov = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 0.0, cov1, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the ODE bolus "
                    f"mapping: {e}"
                ) from e
            scale = np.maximum(np.abs(d_ref).max(), 1e-12)
            tol = 1e-6 * scale
            if (np.abs(d_x - d_ref).max() > tol
                    or np.abs(d_amt / 2.37 - d_ref).max() > tol
                    or np.abs(d_t - d_ref).max() > tol
                    or np.abs(d_cov - d_ref).max() > tol):
                # nonlinear / state-dependent / time- or cov-dependent
                # bolus mapping: the kernel computes the reference's
                # RHS-difference (ode/mod.rs:644-687) IN-KERNEL at each
                # dose boundary (two traced RHS calls) instead of riding
                # precomputed per-unit increment rows — exact for any
                # mapping the lane shims can trace
                bolus_rhs_diff = True
            if not np.all(np.isfinite(d_ref)):
                raise PharmsolError(
                    "engine='pallas' ODE bolus probe produced non-finite "
                    "values"
                )
            bmaps.append(d_ref.T)  # [n_states, S]
        bolus_map = (np.stack(bmaps, axis=0)
                     if not bolus_rhs_diff else None)  # [nb, n_states, S]
        self.bolus_rhs_diff = bolus_rhs_diff

        if opts.solver == "expm":
            # The in-kernel expm march trusts the RHS to be affine in the
            # state and autonomous within segments (the XLA expm path
            # verifies this AT RUNTIME with in-jit probes + NaN poisoning,
            # engine/ode.py:725-776; here the same contracts are verified
            # once, host-side in f64, and violation falls back to the XLA
            # engine — which then poisons per its own semantics).
            def rhs_at(p, x, t, covd, rate_vec):
                z = jnp.zeros((ninput,), jnp.float64)
                shim = _RowCov(covd)
                return jnp.asarray(
                    diffeq(jnp.asarray(x, jnp.float64), p,
                           jnp.asarray(t, jnp.float64), z,
                           jnp.asarray(rate_vec, jnp.float64), shim),
                    jnp.float64,
                )

            x_zero = np.zeros(n_states)
            x_sum = x_a + x_b
            rate_probes = [np.zeros(ninput)]
            for j in rate_inputs:
                rv = np.zeros(ninput)
                rv[j] = 1.73
                rate_probes.append(rv)
            try:
                with _host_cpu_device():
                    for covd in (cov0, cov1):
                        for rv in rate_probes:
                            def ev(x, t, _c=covd, _r=rv):
                                return np.asarray(jax.vmap(
                                    lambda p: rhs_at(p, x, t, _c, _r))(
                                        jnp.asarray(sp, jnp.float64)),
                                    np.float64)

                            f0 = ev(x_zero, 0.11)
                            fa_p = ev(x_a, 0.11)
                            fb_p = ev(x_b, 0.11)
                            fab = ev(x_sum, 0.11)
                            pscale = 1.0 + np.abs(fa_p).max() \
                                + np.abs(fb_p).max()
                            if (np.abs(fab + f0 - fa_p - fb_p).max()
                                    > 1e-6 * pscale):
                                raise PharmsolError(
                                    "engine='pallas' expm psi requires an "
                                    "RHS AFFINE in the state (dx = A(p, "
                                    "cov) x + u); the superposition probe "
                                    "failed — use an adaptive solver or "
                                    "the default XLA engine"
                                )
                            fa_t = ev(x_a, 17.31)
                            if np.abs(fa_t - fa_p).max() > 1e-6 * pscale:
                                raise PharmsolError(
                                    "engine='pallas' expm psi requires an "
                                    "RHS autonomous within segments (no "
                                    "direct t reads) — use the default "
                                    "XLA engine"
                                )
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe RHS affinity for "
                    f"expm: {e}"
                ) from e

        init_rows = None
        init_planes = None
        if equation._init is not None:
            init_fn = equation._init

            def init_at(p, covd):
                return jnp.asarray(
                    init_fn(p, jnp.asarray(0.0, jnp.float64), _RowCov(covd)),
                    jnp.float64,
                )

            try:
                with _host_cpu_device():
                    i_ref = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov0))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    i_cov = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov1))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the ODE init "
                    f"equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
                # covariate-dependent init: evaluate it exactly once per
                # (row, support) pair on the host probe backend and ride
                # per-state [R, S] planes into the kernel (the init is
                # applied at t=0 with the covariate's t=0 value —
                # engine/sim.py:147-152 semantics)
                cov_at0 = _covariate_values_at(grid, 0.0)
                names = tuple(grid.cov_names)
                cov_mat = np.stack(
                    [np.asarray(cov_at0[n], np.float64) for n in names],
                    axis=1,
                )  # [R, ncov]

                def init_row(p, cv):
                    covd = {n: cv[i] for i, n in enumerate(names)}
                    return init_at(p, covd)

                try:
                    with _host_cpu_device():
                        pl_ = np.asarray(
                            jax.vmap(lambda cv: jax.vmap(
                                lambda p: init_row(p, cv))(
                                    jnp.asarray(sp, jnp.float64)))(
                                jnp.asarray(cov_mat, jnp.float64)),
                            np.float64,
                        )  # [R, S, n_states]
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' could not evaluate the "
                        f"covariate-dependent ODE init per row: {e}"
                    ) from e
                if pl_.shape != (cov_mat.shape[0], sp.shape[0], n_states):
                    raise PharmsolError(
                        f"engine='pallas' init equation must return "
                        f"[{n_states}] states"
                    )
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent init "
                        "evaluation produced non-finite values"
                    )
                init_planes = np.transpose(pl_, (2, 0, 1))  # [n, R, S]
            else:
                init_rows = i_ref.T  # [n_states, S]

        # lane-RHS compatibility: trace once with 2-D lane shapes; RHS
        # styles the LaneVec shim cannot carry (``jnp.zeros_like(x)``,
        # ``.at`` updates, whole-vector arithmetic) retry with the
        # stacked-ARRAY representation (make_stacked_rhs) before any
        # fallback — closing the last ODE-tier model-class exclusion
        from ..ops.pallas_ode import make_stacked_rhs

        self.rhs_style = "lanes"
        rhs = make_lane_rhs(diffeq, n_states, n_params, ninput)

        def lane_probe():
            shape = (2, 2)
            z = jnp.zeros((2, 1), jnp.float64)
            xs = [jnp.zeros(shape, jnp.float64) for _ in range(n_states)]
            p_lanes = [jnp.zeros((1, 2), jnp.float64) for _ in range(n_params)]
            covd = {
                n: ((z, z) if m == "affine" else z)
                for n, m in zip(self.cov_names, self.cov_modes)
            }
            b_lanes = ({j: z for j in bolus_inputs}
                       if bolus_rhs_diff else None)
            return rhs(xs, p_lanes, jnp.zeros(shape, jnp.float64),
                       z, covd, shape, jnp.float64, b_lanes)

        try:
            jax.eval_shape(lane_probe)
        except PharmsolError:
            raise
        except Exception:
            # retry with real stacked arrays (vector-style RHS code)
            self.rhs_style = "stacked"
            rhs = make_stacked_rhs(diffeq, n_states, n_params, ninput)
            try:
                jax.eval_shape(lane_probe)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' ODE psi could not trace the RHS "
                    f"with lane shims or stacked arrays (avoid "
                    f"data-dependent indexing of the state): {e}"
                ) from e
            if jax.devices()[0].platform == "tpu":
                # a style can TRACE through stacked arrays yet use a
                # primitive Mosaic cannot lower (e.g. `.at[i].set` ->
                # scatter). Probe-lower the RHS in a trivial kernel
                # client-side so unsupported styles fall back at PLAN
                # time instead of crashing the compiled psi at runtime.
                from jax.experimental import pallas as pl

                shape32 = (8, 128)

                def _probe_kernel(o_ref):
                    xs32 = [jnp.full(shape32, 0.5, jnp.float32)
                            for _ in range(n_states)]
                    p32 = [jnp.full((1, 128), 0.3, jnp.float32)
                           for _ in range(n_params)]
                    z32 = jnp.zeros((1, 128), jnp.float32)
                    covd32 = {
                        n: ((z32, z32) if m == "affine" else z32)
                        for n, m in zip(self.cov_names, self.cov_modes)
                    }
                    b32 = ({j: z32 for j in bolus_inputs}
                           if bolus_rhs_diff else None)
                    out32 = rhs(xs32, p32,
                                jnp.full(shape32, 0.1, jnp.float32),
                                z32, covd32, shape32, jnp.float32, b32)
                    acc = out32[0]
                    for c in out32[1:]:
                        acc = acc + c
                    o_ref[:, :] = acc

                try:
                    jax.jit(lambda: pl.pallas_call(
                        _probe_kernel,
                        out_shape=jax.ShapeDtypeStruct(
                            shape32, jnp.float32),
                    )()).lower()
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' ODE psi: this RHS style uses "
                        f"a primitive the TPU kernel compiler cannot "
                        f"lower (e.g. `.at` scatter updates on the "
                        f"state) — build dx via jnp.stack or "
                        f"whole-vector arithmetic, or use the default "
                        f"XLA engine: {e}"
                    ) from e

        if grid.cov_names and equation._out is not None:
            _check_out_covariate_free(
                equation, sp, cov_values, n_states, CovView
            )

        # --- streams ------------------------------------------------------
        try:
            streams = streams_from_grid(grid.rows, lowered, inputs=ninput)
        except ValueError as e:
            raise PharmsolError(f"engine='pallas' ODE psi: {e}") from e
        # split the per-input stacks onto one stream per ACTIVE input
        seg_bolus3 = np.asarray(streams[1], np.float64)  # [R, M, ninput]
        seg_rate3 = np.asarray(streams[2], np.float64)
        streams = (
            [streams[0]]
            + [seg_bolus3[..., j] for j in bolus_inputs]
            + [seg_rate3[..., j] for j in rate_inputs]
            + list(streams[3:])
        )
        self.n_bolus_in = len(bolus_inputs)
        self.n_rate_in = len(rate_inputs)
        _, t_sorted, _, _ = segment_schedule(grid.rows)
        real = t_sorted < BIG_TIME / 2
        t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
        t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
        seg_t0 = np.minimum(t_sorted, t_real_max[:, None])

        # --- lag/fa planes ------------------------------------------------
        # one pending-dose slot per (lane, bolus input); multi-drug
        # regimens with lag compose (no-overlap validated per input
        # against that input's own inter-dose gaps). Constant path: one
        # [R, S] plane per input (closure time-independent, no tv-cov
        # reads). Dynamic path (time-dependent closures or closures that
        # READ a time-varying covariate): exact per-DOSE-SEGMENT planes,
        # evaluated host-side with the engine's CovView at each bolus's
        # original breakpoint time (lag, structs.rs:629) / lag-shifted
        # time (fa, engine/grid.py:502-512), selected statically by the
        # kernel via (input, segment) -> plane-slot tables.
        lag_planes = None
        fa_planes = None
        lag_slots = None
        fa_slots = None
        sel = list(bolus_inputs)
        nb_ = len(bolus_inputs)
        M_ = streams[0].shape[1]
        dynamic = False
        if equation._lag is not None or equation._fa is not None:
            try:
                if equation._lag is not None:
                    lp = _decompose_input_planes(
                        equation._lag, sp, grid, ninput, 0.0, "lag")[sel]
                    if np.any(lp != 0.0):
                        for k, j in enumerate(bolus_inputs):
                            if np.any(lp[k] != 0.0):
                                _validate_lag_no_overlap(
                                    lp[k], grid, input_j=j)
                        lag_planes = lp
                if equation._fa is not None:
                    fp = _decompose_input_planes(
                        equation._fa, sp, grid, ninput, 1.0, "fa")[sel]
                    if not np.all(fp == 1.0):
                        fa_planes = fp
            except _InputPlaneDynamic:
                dynamic = True
        if dynamic:
            lag_planes = fa_planes = None
            dose_cols = [
                m for m in range(M_)
                if any(np.any(np.asarray(streams[1 + k],
                                         np.float64)[:, m] != 0.0)
                       for k in range(nb_))
            ]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0
            )
            has_lag_dyn = equation._lag is not None and any(
                np.any(seg_pl[m][0][sel] != 0.0) for m in dose_cols
            )
            has_fa_dyn = equation._fa is not None and any(
                not np.all(seg_pl[m][1][sel] == 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                # pairwise no-overlap per input: each dose's lag (max over
                # supports) must elapse before the SAME input's next dose
                for k, j in enumerate(bolus_inputs):
                    bstream = np.asarray(streams[1 + k], np.float64)
                    for r in range(bstream.shape[0]):
                        cols = [m for m in dose_cols
                                if bstream[r, m] != 0.0]
                        cols.sort(key=lambda m: seg_t0[r, m])
                        for m1, m2 in zip(cols, cols[1:]):
                            gap = seg_t0[r, m2] - seg_t0[r, m1]
                            lag_max = seg_pl[m1][0][j, r, :].max()
                            # strict: lag == gap clobbers the pend slot
                            if lag_max >= gap:
                                raise PharmsolError(
                                    f"engine='pallas' lag support "
                                    f"requires each dose's lag to elapse "
                                    f"strictly before the input's next "
                                    f"dose (row {r}, input {j}: max lag "
                                    f"{lag_max:.4g} >= gap {gap:.4g}) — "
                                    "use the default XLA engine"
                                )
            lag_seg_list = []
            fa_seg_list = []
            if has_lag_dyn:
                lag_slot_rows = [[-1] * M_ for _ in range(nb_)]
                for m in dose_cols:
                    for k in range(nb_):
                        lag_slot_rows[k][m] = len(lag_seg_list)
                        lag_seg_list.append(seg_pl[m][0][sel][k])
                lag_slots = tuple(tuple(rw) for rw in lag_slot_rows)
                lag_planes = np.stack(lag_seg_list)
            if has_fa_dyn:
                fa_slot_rows = [[-1] * M_ for _ in range(nb_)]
                for m in dose_cols:
                    for k in range(nb_):
                        fa_slot_rows[k][m] = len(fa_seg_list)
                        fa_seg_list.append(seg_pl[m][1][sel][k])
                fa_slots = tuple(tuple(rw) for rw in fa_slot_rows)
                fa_planes = np.stack(fa_seg_list)
        self.lag_slots = lag_slots
        self.fa_slots = fa_slots

        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        self.Rp = ((self.R + row_multiple - 1) // row_multiple) * row_multiple
        self.Sp = ((self.S + SP_TILE - 1) // SP_TILE) * SP_TILE
        fd = float_dtype()
        if jax.devices()[0].platform == "tpu":
            fd = jnp.float32
        self.fd = fd

        def pad_rows(a):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return a
            return np.concatenate(
                [a, np.zeros((self.Rp - self.R, a.shape[1]), dtype=a.dtype)],
                axis=0,
            )

        self.padded = [jnp.asarray(pad_rows(a), dtype=fd) for a in streams]
        self.seg_t0 = jnp.asarray(pad_rows(seg_t0), dtype=fd)
        im = np.asarray(grid.rows.init_mask, np.float64).reshape(-1)
        init_mask_rm = np.zeros((self.R, self.M))
        init_mask_rm[:, 0] = im
        self.init_mask = (
            jnp.asarray(pad_rows(init_mask_rm), dtype=fd)
            if (init_rows is not None or init_planes is not None) else None
        )
        affine_streams = (
            _affine_covariate_streams(
                grid, sorted(varying_covs), seg_t0, np.asarray(streams[0])
            ) if varying_covs else {}
        )
        if opts.solver == "expm":
            # expm is exact only for an autonomous in-segment RHS; a
            # covariate that interpolates LINEARLY with a nonzero slope
            # makes it time-dependent (carry-forward / piecewise-constant
            # covariates ride affine streams with b == 0 and stay exact)
            for name, (_a_s, b_s) in affine_streams.items():
                if np.any(np.asarray(b_s, np.float64) != 0.0):
                    raise PharmsolError(
                        f"engine='pallas' expm psi requires covariates "
                        f"constant within segments; `{name}` interpolates "
                        f"linearly with a nonzero slope — use an adaptive "
                        f"solver or the default XLA engine"
                    )
        self.cov_streams = {}
        for name in self.cov_names:
            if name in affine_streams:
                a, b = affine_streams[name]
                self.cov_streams[name] = (
                    jnp.asarray(pad_rows(a), dtype=fd),
                    jnp.asarray(pad_rows(b), dtype=fd),
                )
            else:
                vs = np.zeros((self.R, self.M))
                vs[:, 0] = np.asarray(cov_values[name], np.float64)
                self.cov_streams[name] = jnp.asarray(pad_rows(vs), dtype=fd)

        def pad_support(a):
            if self.Sp == self.S:
                return a
            return np.concatenate(
                [a, np.repeat(a[..., -1:], self.Sp - self.S, axis=-1)],
                axis=-1,
            )

        sp_padded = (
            np.concatenate(
                [sp, np.repeat(sp[-1:], self.Sp - self.S, axis=0)], axis=0
            ) if self.Sp != self.S else sp
        )
        self.sp_dev = jnp.asarray(sp_padded, dtype=fd)
        self.bolus_map = (
            jnp.asarray(pad_support(bolus_map), dtype=fd)
            if bolus_map is not None else None
        )
        self.init_rows = (
            jnp.asarray(pad_support(init_rows), dtype=fd)
            if init_rows is not None else None
        )

        def pad_plane(a, fill):
            a = np.asarray(a, np.float64)
            if self.Rp != self.R:
                a = np.concatenate(
                    [a, np.full((self.Rp - self.R, a.shape[1]), fill)],
                    axis=0,
                )
            if self.Sp != self.S:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], self.Sp - self.S, axis=1)],
                    axis=1,
                )
            return jnp.asarray(a, dtype=fd)

        self.lag_planes_dev = (
            tuple(pad_plane(lag_planes[k], 0.0)
                  for k in range(len(lag_planes)))
            if lag_planes is not None else None
        )
        self.fa_planes_dev = (
            tuple(pad_plane(fa_planes[k], 1.0)
                  for k in range(len(fa_planes)))
            if fa_planes is not None else None
        )
        self.init_planes_dev = (
            jnp.stack([pad_plane(init_planes[s], 0.0)
                       for s in range(n_states)])
            if init_planes is not None else None
        )
        out_fn = equation._out or (lambda x, p, t, cov: x[: self.n_out])
        occ0 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[0]), grid.rows
        )
        cov = CovView(
            occ0.cov_t.astype(fd), occ0.cov_v.astype(fd), occ0.cov_fixed,
            tuple(grid.cov_names),
        )
        try:
            C, b = extract_linear_out(
                out_fn, sp_padded, n_states, self.n_out, cov, fd
            )
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' ODE psi could not extract linear output "
                f"coefficients (non-linear output?): {e}"
            ) from e
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        self.pass_inf = bool(np.any(seg_rate3))
        i_cens = 1 + self.n_bolus_in + self.n_rate_in + 3
        self.pass_cens = bool(np.any(streams[i_cens]))
        self.pass_outeq = self.n_out > 1

        # --- merged-march spans --------------------------------------------
        # breakpoints that are observation-only on EVERY row (no dose, rate
        # and covariate streams unchanged, contiguous segment times) need
        # not stop the adaptive march: the kernel crosses them and captures
        # the observation from the solver's dense-output interpolant
        # (ops/pallas_ode.py). Proven here on the host-side numpy streams;
        # each extra interior obs costs one carry lane, so spans are capped.
        self.merge_runs = _ode_merge_runs(
            streams, seg_t0, opts.solver,
            n_bolus_in=self.n_bolus_in, n_rate_in=self.n_rate_in,
            affine_streams=affine_streams, has_lag=lag_planes is not None,
        )

    def cache_key(self, *extra):
        o = self.opts
        return ("pallas_ode", self.n_states, self.n_params, self.ninput,
                self.bolus_inputs, self.rate_inputs, self.bolus_rhs_diff,
                self.rhs_style,
                self.Rp,
                self.Sp, self.M, self.pass_inf, self.pass_cens,
                self.pass_outeq, self.n_out, self.out_bias is not None,
                self.init_rows is not None,
                self.init_planes_dev is not None,
                self.cov_names, self.cov_modes,
                self.lag_planes_dev is not None,
                self.fa_planes_dev is not None,
                self.lag_slots, self.fa_slots,
                o.solver, self.merge_runs,
                o.rtol, o.atol, o.h0, o.max_steps, str(self.fd)) + extra

    def stream_args(self):
        p = self.padded
        include = ([True] + [True] * self.n_bolus_in
                   + [self.pass_inf] * self.n_rate_in
                   + [True, True, True, self.pass_cens, self.pass_outeq])
        out = tuple(a for a, inc in zip(p, include) if inc)
        out = out + (self.seg_t0,)
        if self.init_mask is not None:
            out = out + (self.init_mask,)
        for n in self.cov_names:
            e = self.cov_streams[n]
            out = out + (e if isinstance(e, tuple) else (e,))
        for planes in (self.lag_planes_dev, self.fa_planes_dev):
            if planes is not None:
                out = out + tuple(planes)
        if self.init_planes_dev is not None:
            # one [Rp, Sp] plane per state (rows leading for sharding)
            out = out + tuple(
                self.init_planes_dev[s]
                for s in range(self.init_planes_dev.shape[0])
            )
        return out

    def rep_args(self):
        out = [self.sp_dev]
        if self.bolus_map is not None:
            out.append(self.bolus_map)
        if self.init_rows is not None:
            out.append(self.init_rows)
        out.append(self.out_coef)
        if self.out_bias is not None:
            out.append(self.out_bias)
        return tuple(out)

    def runner(self):
        from ..ops.pallas_ode import psi_ode

        o = self.opts
        n_states = self.n_states
        ninput = self.ninput
        diffeq = self.diffeq
        pass_inf, pass_cens = self.pass_inf, self.pass_cens
        pass_outeq = self.pass_outeq
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        has_init_rows = self.init_rows is not None
        has_init = has_init_rows or n_init_planes > 0
        has_bias = self.out_bias is not None
        cov_names = self.cov_names
        cov_modes = self.cov_modes
        pass_lag = self.lag_planes_dev is not None
        pass_fa = self.fa_planes_dev is not None
        n_lag_pl = len(self.lag_planes_dev) if pass_lag else 0
        n_fa_pl = len(self.fa_planes_dev) if pass_fa else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        merge_runs = self.merge_runs
        nb, nr = self.n_bolus_in, self.n_rate_in
        bolus_inputs, rate_inputs = self.bolus_inputs, self.rate_inputs
        bolus_rhs_diff = self.bolus_rhs_diff
        rhs_style = self.rhs_style
        n_streams = (5 + nb + (nr if pass_inf else 0)
                     + int(pass_cens) + int(pass_outeq)
                     + int(has_init) + n_lag_pl + n_fa_pl
                     + n_init_planes
                     + sum(2 if m == "affine" else 1 for m in cov_modes))
        # ODEOptions.unroll amortizes XLA's per-while-iteration dispatch;
        # inside the pallas kernel there is no dispatch to amortize and
        # every extra unrolled trial is wasted work on lanes that just
        # finished — 1 is measurably best (same-session A/B)
        unroll = 1

        def run(*args):
            it = iter(args[:n_streams])
            dt = next(it)
            bols = [next(it) for _ in range(nb)]
            infs = [next(it) for _ in range(nr)] if pass_inf else None
            mask, val, sig = next(it), next(it), next(it)
            cens = next(it) if pass_cens else None
            outeq = next(it) if pass_outeq else None
            t0 = next(it)
            imask = next(it) if has_init else None
            covs = {
                n: ((next(it), next(it)) if m == "affine" else next(it))
                for n, m in zip(cov_names, cov_modes)
            }
            lagp = (tuple(next(it) for _ in range(n_lag_pl))
                    if pass_lag else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if pass_fa else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            rep = iter(args[n_streams:])
            sp_dev = next(rep)
            bmap = None if bolus_rhs_diff else next(rep)
            irows = next(rep) if has_init_rows else None
            coef = next(rep)
            bias = next(rep) if has_bias else None
            bol = bols[0] if nb == 1 else jnp.stack(bols, axis=-1)
            inf = (None if infs is None
                   else infs[0] if nr == 1 else jnp.stack(infs, axis=-1))
            return psi_ode(
                dt, bol, inf, mask, val, sig, cens, t0, sp_dev, diffeq,
                n_states=n_states, ninput=ninput, solver=o.solver,
                rtol=o.rtol, atol=o.atol,
                h0=o.h0, max_iters=o.max_steps, unroll=unroll,
                newton_iters=o.newton_iters,
                obs_outeq=outeq, out_coef=coef, out_bias=bias,
                bolus_map=bmap, bolus_rhs_diff=bolus_rhs_diff,
                init_rows=irows, init_planes=ipl,
                init_mask=imask,
                cov_streams=covs, cov_names=cov_names,
                lag_plane=lagp, fa_plane=fap,
                lag_slots=lag_slots, fa_slots=fa_slots,
                bolus_inputs=bolus_inputs, rate_inputs=rate_inputs,
                merge_runs=merge_runs, rhs_style=rhs_style,
            )

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi


class _PallasSdePsiPlan:
    """Validated, padded inputs for a fused pallas SDE particle-filter psi.

    Same contract as _PallasPsiPlan/_PallasOdePsiPlan. Scope: multi-input
    boluses (each active input doses its mapped destination state —
    inject-to-destination, sde/mod.rs:46-79) and infusions (per-input rate
    streams), time-constant covariates plus time-varying ones via
    per-segment affine (a, b) streams (knot-free spans, like the ODE
    tier), lag/fa via per-(row, support) planes + the in-kernel
    pending-dose split march — dynamic (time-dependent /
    tv-cov-reading) closures ride exact per-dose-segment planes with
    static (input, segment) -> slot tables like the ODE tier — linear
    outputs, stratified resampling, BLOQ/ALOQ censoring (normcdf/ccdf
    particle weights, reference parity). Noise draws are
    per-(row, support, trial) — statistically
    equivalent to ``independent`` mode; XLA-vs-pallas parity is therefore
    statistical (exact only at zero diffusion).
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ..config import BIG_TIME
        from ..engine.grid import CovView
        from ..ops.pallas_ode import make_lane_rhs
        from ..ops.pallas_psi import (
            SP_TILE, extract_linear_out, segment_schedule, streams_from_grid,
        )

        spec = equation.spec
        if getattr(equation, "_resampling", "stratified") != "stratified":
            raise PharmsolError(
                "engine='pallas' SDE psi implements stratified resampling "
                "(the reference scheme) — use the default XLA engine for "
                "systematic resampling"
            )
        self.n_states = int(spec.nstates)
        self.n_out = int(spec.nout)
        self.n_particles = int(spec.nparticles)
        self.seed = int(getattr(equation, "_seed", 0))
        self.em_control = str(getattr(spec, "em_control", "independent"))
        self.ninput = int(spec.ninput)
        ninput = self.ninput
        n_states = self.n_states
        self.n_params = sp.shape[1]
        self.drift = spec.drift
        self.diffusion = spec.diffusion
        self.cov_names = tuple(grid.cov_names)
        cov_values, varying_covs = _classify_covariates(grid)
        self.cov_modes = tuple(
            "affine" if n in varying_covs else "const"
            for n in self.cov_names
        )
        cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
        cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}

        # --- active dose inputs (same discovery as the ODE plan) ---------
        bt_ = np.asarray(grid.rows.bolus_t, np.float64)
        ba_ = np.asarray(grid.rows.bolus_amt, np.float64)
        bi_ = np.asarray(grid.rows.bolus_input)
        real_b = (bt_ < BIG_TIME / 2) & (ba_ != 0.0)
        bolus_inputs = tuple(sorted(
            {int(j) for j in bi_[real_b]})) or (0,)
        it_ = np.asarray(grid.rows.inf_t, np.float64)
        rate_inputs = (0,)
        if it_.size:
            ia_ = np.asarray(grid.rows.inf_amt, np.float64)
            ii_ = np.asarray(grid.rows.inf_input)
            real_i = (it_ < BIG_TIME / 2) & (ia_ != 0.0)
            rate_inputs = tuple(sorted(
                {int(j) for j in ii_[real_i]})) or (0,)
        if max(bolus_inputs + rate_inputs) >= ninput:
            raise PharmsolError(
                f"engine='pallas' SDE psi: a dose targets input "
                f">= ndrugs ({ninput})"
            )
        self.bolus_inputs = bolus_inputs
        self.rate_inputs = rate_inputs
        # inject-to-destination mapping (identity unless metadata declares
        # a destination — engine/sde.py:216-218, sde/mod.rs:46-79)
        dest = spec.bolus_dest
        self.dose_states = tuple(
            int(dest[j]) if dest is not None else int(j)
            for j in bolus_inputs
        )
        if max(self.dose_states) >= n_states:
            raise PharmsolError(
                "engine='pallas' SDE psi: a bolus destination state is out "
                f"of range (nstates={n_states})"
            )

        # --- lag/fa planes -------------------------------------------------
        # static closures: one [R, S] plane per input. Dynamic closures
        # (time-dependent / reading a time-varying covariate): exact
        # per-DOSE-SEGMENT planes with static (input, segment) -> slot
        # tables, built after the streams below (same mechanism as the
        # ODE tier)
        lag_planes = None
        fa_planes = None
        lag_slots = None
        fa_slots = None
        sel = list(bolus_inputs)
        lag_fa_dynamic = False
        if spec.lag is not None or spec.fa is not None:
            try:
                if spec.lag is not None:
                    lp = _decompose_input_planes(
                        spec.lag, sp, grid, ninput, 0.0, "lag")[sel]
                    if np.any(lp != 0.0):
                        for k, j in enumerate(bolus_inputs):
                            if np.any(lp[k] != 0.0):
                                _validate_lag_no_overlap(
                                    lp[k], grid, input_j=j)
                        lag_planes = lp
                if spec.fa is not None:
                    fp = _decompose_input_planes(
                        spec.fa, sp, grid, ninput, 1.0, "fa")[sel]
                    if not np.all(fp == 1.0):
                        fa_planes = fp
            except _InputPlaneDynamic:
                lag_fa_dynamic = True
                lag_planes = fa_planes = None

        # init rows per support (cov-independence probed); covariate-
        # dependent init rides per-(row, support) planes evaluated at the
        # covariate's t=0 value (engine/sim.py:147-152 semantics)
        init_rows = None
        init_planes = None
        if spec.init is not None:
            init_fn = spec.init

            def init_at(p, covd):
                return jnp.asarray(
                    init_fn(p, jnp.asarray(0.0, jnp.float64), _RowCov(covd)),
                    jnp.float64,
                )

            try:
                with _host_cpu_device():
                    i_ref = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov0))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    i_cov = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov1))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the SDE init "
                    f"equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
                cov_at0 = _covariate_values_at(grid, 0.0)
                names = tuple(grid.cov_names)
                cov_mat = np.stack(
                    [np.asarray(cov_at0[n], np.float64) for n in names],
                    axis=1,
                )  # [R, ncov]

                def init_row(p, cv):
                    covd = {n: cv[i] for i, n in enumerate(names)}
                    return init_at(p, covd)

                try:
                    with _host_cpu_device():
                        pl_ = np.asarray(
                            jax.vmap(lambda cv: jax.vmap(
                                lambda p: init_row(p, cv))(
                                    jnp.asarray(sp, jnp.float64)))(
                                jnp.asarray(cov_mat, jnp.float64)),
                            np.float64,
                        )  # [R, S, n_states]
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' could not evaluate the "
                        f"covariate-dependent SDE init per row: {e}"
                    ) from e
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent SDE init "
                        "evaluation produced non-finite values"
                    )
                init_planes = np.transpose(pl_, (2, 0, 1))  # [n, R, S]
            else:
                init_rows = i_ref.T

        # drift/diffusion must trace through the lane shims (the SDE drift
        # signature has no bolus argument — adapt to the diffeq shim shape)
        drift_fn = spec.drift
        rhs = make_lane_rhs(
            lambda x, p, t, b, rateiv, cov: drift_fn(x, p, t, rateiv, cov),
            n_states, self.n_params, self.ninput,
            rate_inputs=rate_inputs,
        )

        def lane_probe():
            shape = (2, 2)
            z = jnp.zeros((2, 1), jnp.float64)
            xs = [jnp.zeros(shape, jnp.float64) for _ in range(n_states)]
            p_lanes = [jnp.zeros((1, 2), jnp.float64)
                       for _ in range(self.n_params)]
            covd = {
                n: ((z, z) if m == "affine" else z)
                for n, m in zip(self.cov_names, self.cov_modes)
            }
            d = rhs(xs, p_lanes, jnp.zeros(shape, jnp.float64),
                    [z] * len(rate_inputs), covd, shape, jnp.float64)
            from ..ops.pallas_ode import LaneCov, LaneVec

            g = spec.diffusion(LaneVec(p_lanes),
                               jnp.zeros((), jnp.float64), LaneCov(covd))
            comps = (list(g) if isinstance(g, (list, tuple, LaneVec))
                     else [g[i] for i in range(n_states)])
            if len(comps) != n_states:
                raise PharmsolError(
                    f"SDE diffusion returned {len(comps)} components, "
                    f"expected {n_states}"
                )
            return d

        try:
            jax.eval_shape(lane_probe)
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' SDE psi could not trace drift/diffusion "
                f"with lane shims: {e}"
            ) from e

        try:
            streams = streams_from_grid(grid.rows, lowered, inputs=ninput)
        except ValueError as e:
            raise PharmsolError(f"engine='pallas' SDE psi: {e}") from e
        # split the per-input stacks onto one stream per ACTIVE input
        seg_bolus3 = np.asarray(streams[1], np.float64)  # [R, M, ninput]
        seg_rate3 = np.asarray(streams[2], np.float64)
        streams = (
            [streams[0]]
            + [seg_bolus3[..., j] for j in bolus_inputs]
            + [seg_rate3[..., j] for j in rate_inputs]
            + list(streams[3:])
        )
        self.n_bolus_in = len(bolus_inputs)
        self.n_rate_in = len(rate_inputs)
        _, t_sorted, _, _ = segment_schedule(grid.rows)
        real = t_sorted < BIG_TIME / 2
        t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
        t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
        seg_t0 = np.minimum(t_sorted, t_real_max[:, None])

        if lag_fa_dynamic:
            # exact per-dose-segment planes (engine CovView evaluation at
            # each bolus's original / lag-shifted time), selected by
            # static (input, segment) -> slot tables — ODE-tier mechanism
            nb_ = len(bolus_inputs)
            M_ = streams[0].shape[1]
            dose_cols = [
                m for m in range(M_)
                if any(np.any(np.asarray(streams[1 + k],
                                         np.float64)[:, m] != 0.0)
                       for k in range(nb_))
            ]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0
            )
            has_lag_dyn = spec.lag is not None and any(
                np.any(seg_pl[m][0][sel] != 0.0) for m in dose_cols
            )
            has_fa_dyn = spec.fa is not None and any(
                not np.all(seg_pl[m][1][sel] == 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                for k, j in enumerate(bolus_inputs):
                    bstream = np.asarray(streams[1 + k], np.float64)
                    for r in range(bstream.shape[0]):
                        cols = [m for m in dose_cols
                                if bstream[r, m] != 0.0]
                        cols.sort(key=lambda m: seg_t0[r, m])
                        for m1, m2 in zip(cols, cols[1:]):
                            gap = seg_t0[r, m2] - seg_t0[r, m1]
                            lag_max = seg_pl[m1][0][j, r, :].max()
                            if lag_max >= gap:
                                raise PharmsolError(
                                    f"engine='pallas' SDE lag support "
                                    f"requires each dose's lag to elapse "
                                    f"strictly before the input's next "
                                    f"dose (row {r}, input {j}: max lag "
                                    f"{lag_max:.4g} >= gap {gap:.4g}) — "
                                    "use the default XLA engine"
                                )
                lag_slot_rows = [[-1] * M_ for _ in range(nb_)]
                lag_list = []
                for m in dose_cols:
                    for k in range(nb_):
                        lag_slot_rows[k][m] = len(lag_list)
                        lag_list.append(seg_pl[m][0][sel][k])
                lag_slots = tuple(tuple(rw) for rw in lag_slot_rows)
                lag_planes = np.stack(lag_list)
            if has_fa_dyn:
                fa_slot_rows = [[-1] * M_ for _ in range(nb_)]
                fa_list = []
                for m in dose_cols:
                    for k in range(nb_):
                        fa_slot_rows[k][m] = len(fa_list)
                        fa_list.append(seg_pl[m][1][sel][k])
                fa_slots = tuple(tuple(rw) for rw in fa_slot_rows)
                fa_planes = np.stack(fa_list)
        self.lag_slots = lag_slots
        self.fa_slots = fa_slots

        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        # the kernel processes 8 rows per grid step (Mosaic sublane blocks)
        rm = max(8, row_multiple)
        self.Rp = ((self.R + rm - 1) // rm) * rm
        self.Sp = ((self.S + SP_TILE - 1) // SP_TILE) * SP_TILE
        fd = float_dtype()
        if jax.devices()[0].platform == "tpu":
            fd = jnp.float32
        self.fd = fd

        def pad_rows(a):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return a
            return np.concatenate(
                [a, np.zeros((self.Rp - self.R, a.shape[1]), dtype=a.dtype)],
                axis=0,
            )

        self.padded = [jnp.asarray(pad_rows(a), dtype=fd) for a in streams]
        self.seg_t0 = jnp.asarray(pad_rows(seg_t0), dtype=fd)
        im = np.asarray(grid.rows.init_mask, np.float64).reshape(-1)
        init_mask_rm = np.zeros((self.R, self.M))
        init_mask_rm[:, 0] = im
        self.init_mask = (
            jnp.asarray(pad_rows(init_mask_rm), dtype=fd)
            if (init_rows is not None or init_planes is not None) else None
        )
        affine_streams = (
            _affine_covariate_streams(
                grid, sorted(varying_covs), seg_t0, np.asarray(streams[0])
            ) if varying_covs else {}
        )
        self.cov_streams = {}
        for name in self.cov_names:
            if name in affine_streams:
                a, b = affine_streams[name]
                self.cov_streams[name] = (
                    jnp.asarray(pad_rows(a), dtype=fd),
                    jnp.asarray(pad_rows(b), dtype=fd),
                )
            else:
                vs = np.zeros((self.R, self.M))
                vs[:, 0] = np.asarray(cov_values[name], np.float64)
                self.cov_streams[name] = jnp.asarray(pad_rows(vs), dtype=fd)

        def pad_plane(a, fill):
            a = np.asarray(a, np.float64)
            if self.Rp != self.R:
                a = np.concatenate(
                    [a, np.full((self.Rp - self.R, a.shape[1]), fill)],
                    axis=0,
                )
            if self.Sp != self.S:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], self.Sp - self.S, axis=1)],
                    axis=1,
                )
            return jnp.asarray(a, dtype=fd)

        self.lag_planes_dev = (
            tuple(pad_plane(lag_planes[k], 0.0)
                  for k in range(len(lag_planes)))
            if lag_planes is not None else None
        )
        self.fa_planes_dev = (
            tuple(pad_plane(fa_planes[k], 1.0)
                  for k in range(len(fa_planes)))
            if fa_planes is not None else None
        )
        # the kernel's fa planes are only consulted together with a lag or
        # standalone; a model with fa but no lag still scales arrivals —
        # but a lagged model WITHOUT fa planes needs none (scale 1)

        def pad_support_cols(a):
            if self.Sp == self.S:
                return a
            return np.concatenate(
                [a, np.repeat(a[..., -1:], self.Sp - self.S, axis=-1)],
                axis=-1,
            )

        sp_padded = (
            np.concatenate(
                [sp, np.repeat(sp[-1:], self.Sp - self.S, axis=0)], axis=0
            ) if self.Sp != self.S else sp
        )
        self.sp_dev = jnp.asarray(sp_padded, dtype=fd)
        self.init_rows = (
            jnp.asarray(pad_support_cols(init_rows), dtype=fd)
            if init_rows is not None else None
        )
        self.init_planes_dev = None
        if init_planes is not None:
            ipl = np.stack(
                [pad_rows(init_planes[s]) for s in range(n_states)]
            )  # [n, Rp, S]
            self.init_planes_dev = jnp.asarray(
                pad_support_cols(ipl), dtype=fd
            )
        out_fn = spec.out
        occ0 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[0]), grid.rows
        )
        cov = CovView(
            occ0.cov_t.astype(fd), occ0.cov_v.astype(fd), occ0.cov_fixed,
            tuple(grid.cov_names),
        )
        try:
            C, b = extract_linear_out(
                out_fn, sp_padded, n_states, self.n_out, cov, fd
            )
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' SDE psi could not extract linear output "
                f"coefficients (non-linear output?): {e}"
            ) from e
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        self.pass_inf = bool(np.any(seg_rate3))
        i_cens = 1 + self.n_bolus_in + self.n_rate_in + 3
        self.pass_cens = bool(np.any(np.asarray(streams[i_cens])))
        self.pass_outeq = self.n_out > 1

    def cache_key(self, *extra):
        return ("pallas_sde", self.n_states, self.n_params, self.ninput,
                self.n_particles, self.seed, self.Rp, self.Sp, self.M,
                self.bolus_inputs, self.rate_inputs, self.dose_states,
                self.pass_inf, self.pass_cens, self.pass_outeq, self.n_out,
                self.out_bias is not None, self.init_rows is not None,
                self.init_planes_dev is not None,
                self.cov_names, self.cov_modes,
                self.lag_planes_dev is not None,
                self.fa_planes_dev is not None,
                self.lag_slots, self.fa_slots,
                str(self.fd),
                self.em_control) + extra

    def stream_args(self):
        p = self.padded
        include = ([True] + [True] * self.n_bolus_in
                   + [self.pass_inf] * self.n_rate_in
                   + [True, True, True, self.pass_cens, self.pass_outeq])
        out = tuple(a for a, inc in zip(p, include) if inc)
        out = out + (self.seg_t0,)
        if self.init_mask is not None:
            out = out + (self.init_mask,)
        for n in self.cov_names:
            e = self.cov_streams[n]
            out = out + (e if isinstance(e, tuple) else (e,))
        for planes in (self.lag_planes_dev, self.fa_planes_dev):
            if planes is not None:
                out = out + tuple(planes)
        if self.init_planes_dev is not None:
            # one [Rp, Sp] plane per state (rows leading for sharding)
            out = out + tuple(
                self.init_planes_dev[s]
                for s in range(self.init_planes_dev.shape[0])
            )
        return out

    def rep_args(self):
        out = [self.sp_dev]
        if self.init_rows is not None:
            out.append(self.init_rows)
        out.append(self.out_coef)
        if self.out_bias is not None:
            out.append(self.out_bias)
        return tuple(out)

    def runner(self):
        from ..ops.pallas_sde import psi_sde

        n_states = self.n_states
        n_particles = self.n_particles
        ninput = self.ninput
        dose_states = self.dose_states
        rate_inputs = self.rate_inputs
        seed = self.seed
        em_control = self.em_control
        drift, diffusion = self.drift, self.diffusion
        pass_inf = self.pass_inf
        pass_cens = self.pass_cens
        pass_outeq = self.pass_outeq
        nb, nr = self.n_bolus_in, self.n_rate_in
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        has_init_rows = self.init_rows is not None
        has_init = has_init_rows or n_init_planes > 0
        has_bias = self.out_bias is not None
        cov_names = self.cov_names
        cov_modes = self.cov_modes
        n_lag_pl = len(self.lag_planes_dev) if self.lag_planes_dev else 0
        n_fa_pl = len(self.fa_planes_dev) if self.fa_planes_dev else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        # dt + mask + val + sig + t0 = 5 fixed streams
        n_streams = (5 + nb + (nr if pass_inf else 0) + int(pass_cens)
                     + int(pass_outeq)
                     + int(has_init) + n_lag_pl + n_fa_pl + n_init_planes
                     + sum(2 if m == "affine" else 1 for m in cov_modes))

        def run(*args):
            it = iter(args[:n_streams])
            dt = next(it)
            bols = [next(it) for _ in range(nb)]
            infs = [next(it) for _ in range(nr)] if pass_inf else None
            mask, val, sig = next(it), next(it), next(it)
            cens = next(it) if pass_cens else None
            outeq = next(it) if pass_outeq else None
            t0 = next(it)
            imask = next(it) if has_init else None
            covs = {
                n: ((next(it), next(it)) if m == "affine" else next(it))
                for n, m in zip(cov_names, cov_modes)
            }
            lagp = (tuple(next(it) for _ in range(n_lag_pl))
                    if n_lag_pl else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if n_fa_pl else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            rep = iter(args[n_streams:])
            sp_dev = next(rep)
            irows = next(rep) if has_init_rows else None
            coef = next(rep)
            bias = next(rep) if has_bias else None
            return psi_sde(
                dt, bols, infs, mask, val, sig, t0, sp_dev, drift, diffusion,
                obs_cens=cens,
                n_states=n_states, n_particles=n_particles, ninput=ninput,
                dose_states=dose_states, rate_inputs=rate_inputs,
                seed=seed, obs_outeq=outeq,
                out_coef=coef, out_bias=bias, init_rows=irows,
                init_planes=ipl,
                init_mask=imask, cov_streams=covs, cov_names=cov_names,
                cov_modes=dict(zip(cov_names, cov_modes)),
                lag_planes=lagp, fa_planes=fap,
                lag_slots=lag_slots, fa_slots=fa_slots,
                em_control=em_control,
            )

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi


# engine='auto' crossover: the pallas tier pays a fixed plan/padding +
# dispatch overhead (~30 ms measured round-2: a 128-cell psi was 0.0359 s
# via pallas vs 0.00106 s via XLA) but wins ~10x at scale (16384x512).
# Below this many psi cells the XLA engine is used; at or above it the
# pallas plan is attempted and any validation failure falls back to XLA
# with the reason retrievable via last_engine_decision(). The threshold is
# per model kind because the fixed overhead amortizes against wildly
# different per-cell costs: an analytical cell is ~ns-scale, an SDE cell
# carries a full particle cloud (~us-scale) — and the XLA SDE psi program
# has crashed the tunneled TPU worker at population scale, so the fused
# kernel takes over much earlier there.
AUTO_PALLAS_MIN_CELLS = 262_144  # analytical: 2048 subjects x 128 supports
AUTO_PALLAS_MIN_CELLS_BY_KIND = {
    "analytical": AUTO_PALLAS_MIN_CELLS,
    "ode": AUTO_PALLAS_MIN_CELLS,
    "sde": 4_096,
}


def last_engine_decision(equation) -> Optional[dict]:
    """The engine choice made by the last ``engine='auto'`` psi call.

    Returns ``{"engine": "pallas"|"xla", "reason": str}`` or None when the
    equation has not been through an auto-engined
    :func:`log_likelihood_matrix` yet.
    """
    return getattr(equation, "_last_engine_decision", None)


def _auto_engine(equation, grid, sp) -> tuple:
    """Pick the psi engine for ``engine='auto'``: (engine, reason)."""
    cells = grid.n_rows * sp.shape[0]
    if jax.devices()[0].platform != "tpu":
        return "xla", "pallas kernels compile on TPU only (interpret mode is for parity tests)"
    kind = getattr(equation, "kind", "analytical")
    min_cells = AUTO_PALLAS_MIN_CELLS_BY_KIND.get(kind, AUTO_PALLAS_MIN_CELLS)
    if cells < min_cells:
        return "xla", (
            f"matrix too small for the pallas tier ({cells} cells < "
            f"{min_cells} crossover for kind={kind})"
        )
    return "pallas", f"{cells} cells >= {min_cells} crossover for kind={kind}"


def _pallas_psi_matrix(equation, grid, sp, lowered) -> np.ndarray:
    """Fused pallas psi path: single-output central/v analytical structures.

    Covers multi-dose bolus and constant-rate infusion regimens, BLOQ/ALOQ
    censoring, and per-observation errorpoly overrides. The support matrix
    layout is the kernel parameter order with the volume of distribution
    appended as the LAST column (the fused kernels predict central/v).
    seq/lag/fa/init equations and covariates are not supported — the
    general engine handles those.
    """
    from ..ops.pallas_psi import SUB_TILE

    kind = getattr(equation, "kind", None)
    if kind == "ode":
        plan = _PallasOdePsiPlan(
            equation, grid, sp, lowered, row_multiple=SUB_TILE
        )
    elif kind == "sde":
        plan = _PallasSdePsiPlan(
            equation, grid, sp, lowered, row_multiple=SUB_TILE
        )
    else:
        plan = _PallasPsiPlan(
            equation, grid, sp, lowered, row_multiple=SUB_TILE
        )
    cache = equation.__dict__.setdefault("_jit_psi", {})
    key = plan.cache_key()
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = jax.jit(plan.runner())
    return plan.finalize(fn(*plan.stream_args(), *plan.rep_args()), grid)


def log_likelihood_matrix(
    equation,
    subjects,
    support_points,
    error_models: AssayErrorModels,
    progress: bool = False,
    on_error: str = "neg_inf",
    engine: str = "auto",
) -> np.ndarray:
    """Log-likelihood of every subject at every support point.

    ``support_points``: [n_support, n_params] dense in model order (use
    ParameterOrder.matrix to reorder external columns first).

    ``engine='auto'`` (the default) picks the fused pallas tier on TPU when
    the matrix is large enough to amortize its fixed plan/dispatch overhead
    (AUTO_PALLAS_MIN_CELLS) and the model validates for it, silently
    falling back to the XLA engine otherwise — the choice and its reason
    are retrievable via :func:`last_engine_decision`. Single entry parity:
    matrix.rs:52.

    ``engine='pallas'`` opts into the fused TPU psi kernels for supported
    analytical structures (single output central/v, support columns =
    kernel params + v last; bolus/infusion regimens, censoring, errorpoly
    overrides); results match the default XLA engine at float-dtype
    precision (censored cells at ~6e-5 absolute, the in-kernel log-CDF
    approximation).

    Divergence note: the reference aborts the whole matrix on a simulation
    error; here non-finite cells are mapped to -inf (``on_error='neg_inf'``,
    matching the reference's own per-subject degradation policy in
    likelihood/mod.rs:137-150) or left as NaN (``on_error='nan'``).
    """
    data = _as_data(subjects)
    sp = np.asarray(support_points, dtype=np.float64)
    if sp.ndim != 2:
        raise PharmsolError("support_points must be 2D [n_support, n_params]")
    grid = equation.lower(data.subjects())
    lowered = error_models.lower(equation.resolve_output_label, equation.nouteqs())
    check_error_model_coverage(grid, lowered)

    if engine == "auto":
        engine, reason = _auto_engine(equation, grid, sp)
        if engine == "pallas":
            try:
                psi = _pallas_psi_matrix(equation, grid, sp, lowered)
                equation._last_engine_decision = {
                    "engine": "pallas", "reason": reason,
                }
                if on_error == "neg_inf":
                    psi = np.where(np.isfinite(psi), psi, -np.inf)
                return psi
            except PharmsolError as e:
                engine, reason = "xla", f"pallas plan rejected the model: {e}"
        equation._last_engine_decision = {"engine": "xla", "reason": reason}
        # falling back to the XLA engine with an IMPLICIT solver on the
        # tunneled TPU means an ~8-12 minute remote compile per process
        # (CLAUDE.md) — tell the user how to reach the in-kernel stiff
        # tier instead of letting them discover the cliff by waiting
        solver = getattr(getattr(equation, "_opts", None), "solver", None)
        if (solver in ("bdf", "kvaerno5")
                and jax.devices()[0].platform == "tpu"):
            import warnings

            warnings.warn(
                f"engine='auto' fell back to the XLA engine for solver "
                f"'{solver}' ({reason}); implicit-solver psi programs "
                f"compile for ~8-12 min per process on the tunneled TPU. "
                f"For stiff psi on TPU consider "
                f".with_solver('kvaerno3') or 'trbdf2' (fused in-kernel "
                f"SDIRK tier, compiles in seconds).",
                stacklevel=2,
            )
    elif engine == "pallas":
        psi = _pallas_psi_matrix(equation, grid, sp, lowered)
        if on_error == "neg_inf":
            psi = np.where(np.isfinite(psi), psi, -np.inf)
        return psi
    elif engine != "xla":
        raise PharmsolError(
            f"unknown psi engine `{engine}` (auto, xla or pallas)"
        )

    t0 = time.perf_counter()
    if progress:
        print(
            f"Computing log-likelihood matrix: {grid.n_subjects} subjects × "
            f"{sp.shape[0]} support points..."
        )

    key = (tuple(grid.cov_names), grid.n_subjects)
    cache = equation.__dict__.setdefault("_jit_psi", {})
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(_psi_fn(equation, grid.cov_names, grid.n_subjects))
        cache[key] = fn

    fd = float_dtype()
    psi = fn(
        grid.rows,
        jnp.asarray(grid.row_subject),
        jnp.asarray(sp, dtype=fd),
        jnp.asarray(lowered.kind),
        jnp.asarray(lowered.factor, dtype=fd),
        jnp.asarray(lowered.poly, dtype=fd),
    )
    psi = np.asarray(psi, dtype=np.float64)
    if on_error == "neg_inf":
        psi = np.where(np.isfinite(psi), psi, -np.inf)
    if progress:
        dt = time.perf_counter() - t0
        n = grid.n_subjects * sp.shape[0]
        print(f"  done: {n} cells in {dt:.3f}s ({n / max(dt, 1e-9):.0f} cells/s)")
    return psi


def _batch_fn(equation, cov_names, n_subjects: int):
    pred_one = equation._pred_one_fn(tuple(cov_names))

    def ll_residual_one(occ, p, re_kind, re_a, re_b, idx):
        pred = pred_one(occ, p, idx)
        fd = pred.dtype
        outeq = occ.obs_outeq.astype(jnp.int32)
        kind = re_kind[outeq]
        a = re_a[outeq].astype(fd)
        b = re_b[outeq].astype(fd)
        sigma = residual_sigma_array(kind, a, b, pred)
        obs = occ.obs_value.astype(fd)
        z = (obs - pred) / sigma
        ll = -0.5 * (LOG_2PI + 2.0 * jnp.log(sigma) + z * z)
        active = occ.obs_valid & occ.obs_has_value
        total = jnp.sum(jnp.where(active, ll, 0.0))
        # an active observation with no model (kind 0) poisons the subject
        missing = jnp.any(active & (kind == 0))
        return jnp.where(missing, -jnp.inf, total)

    def batch(rows, row_subject, p_rows, re_kind, re_a, re_b):
        # p_rows: [n_subjects, n_params]; each occasion row uses its subject's row
        p_per_row = p_rows[row_subject]  # [R, n_params]
        n = p_per_row.shape[0]
        ll = jax.vmap(ll_residual_one, in_axes=(0, 0, None, None, None, 0))(
            rows, p_per_row, re_kind, re_a, re_b, jnp.arange(n)
        )
        return jax.ops.segment_sum(ll, row_subject, num_segments=n_subjects)

    return batch


def log_likelihood_batch(
    equation,
    subjects,
    parameters,
    residual_error_models: ResidualErrorModels,
) -> np.ndarray:
    """Per-subject log-likelihood with per-subject parameter rows.

    The SAEM/FOCE surface: prediction-based sigma via ResidualErrorModels.
    Returns -inf for subjects that fail or hit an unmodeled output.
    """
    data = _as_data(subjects)
    p = np.asarray(parameters, dtype=np.float64)
    if p.ndim != 2 or p.shape[0] != len(data):
        raise PharmsolError(
            f"parameters has {p.shape[0] if p.ndim == 2 else '?'} rows but there "
            f"are {len(data)} subjects"
        )
    grid = equation.lower(data.subjects())
    lowered = residual_error_models.lower(
        equation.resolve_output_label, equation.nouteqs()
    )

    key = (tuple(grid.cov_names), grid.n_subjects)
    cache = equation.__dict__.setdefault("_jit_batch", {})
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(_batch_fn(equation, grid.cov_names, grid.n_subjects))
        cache[key] = fn

    fd = float_dtype()
    out = fn(
        grid.rows,
        jnp.asarray(grid.row_subject),
        jnp.asarray(p, dtype=fd),
        jnp.asarray(lowered.kind),
        jnp.asarray(lowered.a, dtype=fd),
        jnp.asarray(lowered.b, dtype=fd),
    )
    out = np.asarray(out, dtype=np.float64)
    return np.where(np.isfinite(out) | np.isneginf(out), out, -np.inf)


def log_likelihood_subject(
    equation, subject, parameters, residual_error_models: ResidualErrorModels
) -> float:
    """Single-subject prediction-based log-likelihood (mod.rs:205)."""
    res = log_likelihood_batch(
        equation,
        Data([subject]),
        np.asarray(parameters, dtype=np.float64).reshape(1, -1),
        residual_error_models,
    )
    return float(res[0])
