"""Shared conditional-likelihood machinery for parametric estimators.

SAEM (optimize/saem.py) and Laplace/FOCE (optimize/laplace.py) both need
the same device function: per-subject conditional log-likelihood at
per-subject parameter rows, under prediction-based residual error models
(reference surface: residual_error.rs:69-220), built on the vmapped
per-occasion-row prediction kernel that the batch-LL entry point uses
(likelihood/matrix.py `_batch_fn` pattern).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import float_dtype
from ..data.residual_error import (
    ResidualErrorModels,
    residual_sigma_array,
)
from ..data.structs import Data
from ..errors import PharmsolError

_LOG_2PI = float(np.log(2.0 * np.pi))
_REVERSE_DIFF_SOLVERS = (None, "expm", "expm_rolled")  # None = analytical


class CondLL(NamedTuple):
    """Device conditional-LL function plus the host context around it."""

    # (theta_rows [n_sub, p] natural scale, sig_a [nout], sig_b [nout])
    #   -> (ll_i [n_sub], r2 [R, O], f2 [R, O]); pass per_row=True to hand
    #   it [R, p] per-occasion-row parameters instead (the IOV hook)
    ll_parts: Callable
    # theta_rows [n_sub, p] natural scale -> predictions [R, O]
    pred_rows: Callable
    subjects: list
    n_sub: int
    nout: int
    kinds_np: np.ndarray          # [nout] residual kind codes (0 = none)
    lowered_a: np.ndarray         # [nout] initial sigma a
    lowered_b: np.ndarray         # [nout] initial sigma b
    n_obs_per_outeq: np.ndarray   # [nout]
    obs_outeq: jnp.ndarray        # [R, O]
    obs_value: jnp.ndarray        # [R, O]
    obs_time: jnp.ndarray         # [R, O]
    active: jnp.ndarray           # [R, O] bool
    row_subject: jnp.ndarray      # [R]
    row_occasion: jnp.ndarray = None   # [R] within-subject occasion index
    n_occ: np.ndarray = None           # [n_sub] occasion counts
    n_occ_max: int = 1                 # max occasions over subjects
    # per-occasion-row params [R, p] natural scale -> predictions [R, O]
    pred_rows_at: Callable = None


def build_cond_ll(
    equation,
    data,
    residual_error_models: ResidualErrorModels,
    *,
    require_reverse_diff: bool = False,
) -> CondLL:
    """Lower the data once and build the jittable conditional-LL parts.

    ``require_reverse_diff=True`` gates the engine the way
    ``Equation.log_likelihood_fn`` does: SDE likelihoods (discrete
    resampling) and adaptive ODE solvers (``lax.while_loop`` integration,
    forward-mode only) are rejected, and the exact ``expm`` solver is
    substituted with its compile-friendly rolled variant on a copy.
    """
    import copy

    eq = equation
    if require_reverse_diff:
        if getattr(eq, "kind", None) == "sde":
            raise PharmsolError(
                "cannot reverse-differentiate SDE likelihoods (discrete "
                "particle resampling); use fit_saem"
            )
        opts = getattr(eq, "_opts", None)
        solver = getattr(opts, "solver", None)
        if solver == "expm":
            # reverse-mode through the fully-unrolled expm chain explodes
            # XLA's compile; the rolled variant is mathematically identical
            eq = copy.copy(equation)
            eq._opts = opts._replace(solver="expm_rolled")
            eq._lower_cache = {}
            eq._spec_cache = None
            for k in ("_jit_sim_rows", "_jit_ll_rows", "_jit_psi",
                      "_jit_batch"):
                eq.__dict__.pop(k, None)
        elif solver not in _REVERSE_DIFF_SOLVERS:
            raise PharmsolError(
                f"solver '{solver}' integrates under lax.while_loop "
                f"(forward-mode only) and cannot back the exact-Hessian "
                f"Laplace path; use the analytical engine, "
                f"with_solver('expm') for linear models, or fit_saem"
            )

    data = data if isinstance(data, Data) else Data(list(data))
    subjects = list(data.subjects())
    n_sub = len(subjects)
    grid = eq.lower(subjects)
    lowered = residual_error_models.lower(
        eq.resolve_output_label, eq.nouteqs()
    )
    kinds_np = np.asarray(lowered.kind)

    fd = float_dtype()
    rows = grid.rows
    row_subject = jnp.asarray(np.asarray(grid.row_subject))
    solver = getattr(getattr(eq, "_opts", None), "solver", None)
    if (getattr(eq, "kind", None) == "ode"
            and solver not in _REVERSE_DIFF_SOLVERS):
        from ..engine.sens import make_sens_pred_one, supports_forward_sens

        if supports_forward_sens(eq):
            # adaptive solvers: forward derivatives integrate the
            # augmented sensitivity system (engine/sens.py) instead of
            # jvp-ing through the while_loop stepper — same values,
            # ordinary compile cost instead of the jvp-tower blowup
            pred_one = make_sens_pred_one(eq, tuple(grid.cov_names))
        else:
            pred_one = eq._pred_one_fn(tuple(grid.cov_names))
    else:
        pred_one = eq._pred_one_fn(tuple(grid.cov_names))
    n_rows = int(np.asarray(grid.row_subject).shape[0])

    obs_outeq = rows.obs_outeq
    obs_value = rows.obs_value.astype(fd)
    active = rows.obs_valid & rows.obs_has_value
    act_np = np.asarray(active)
    oe_np = np.asarray(obs_outeq)
    used = np.unique(oe_np[act_np]) if act_np.any() else np.asarray([], int)
    unmodeled = [int(o) for o in used if kinds_np[o] == 0]
    if unmodeled:
        raise PharmsolError(
            f"outeq(s) {unmodeled} have observations but no residual error "
            f"model"
        )
    nout = int(kinds_np.shape[0])
    n_obs_per_outeq = np.zeros(nout, dtype=np.float64)
    for o in range(nout):
        n_obs_per_outeq[o] = float(np.sum(act_np & (oe_np == o)))

    kind_per_obs = jnp.asarray(kinds_np)[obs_outeq]

    def _pred_at(p_per_row):
        """Raw predictions [R, O] at per-occasion-row parameters [R, p]."""
        return jax.vmap(pred_one, in_axes=(0, 0, 0))(
            rows, p_per_row, jnp.arange(n_rows)
        )

    def pred_rows(theta_rows):
        """Raw predictions [R, O] at per-subject parameter rows."""
        return _pred_at(theta_rows[row_subject])

    def ll_parts(theta_rows, sig_a, sig_b, y=None, per_row=False):
        """Conditional LL per subject + per-observation (r2, f2) arrays.

        ``y [R, O]`` overrides the baked observation values — the hook
        that lets simulation–re-estimation refit every simulated
        replicate through ONE compiled program (y rides as a vmapped
        operand instead of being re-lowered into a new Data).
        ``per_row=True`` reads ``theta_rows`` as per-occasion-row
        parameters ``[R, p]`` (already gathered) — the hook that lets
        inter-occasion variability (kappa per occasion) flow through the
        same kernel.
        """
        obs = obs_value if y is None else y
        preds = _pred_at(theta_rows if per_row else theta_rows[row_subject])
        a = sig_a[obs_outeq].astype(fd)
        b = sig_b[obs_outeq].astype(fd)
        sigma = residual_sigma_array(kind_per_obs, a, b, preds)
        z = (obs - preds) / sigma
        ll = -0.5 * (_LOG_2PI + 2.0 * jnp.log(sigma) + z * z)
        ll_i = jax.ops.segment_sum(
            jnp.sum(jnp.where(active, ll, 0.0), axis=-1),
            row_subject,
            num_segments=n_sub,
        )
        r2 = jnp.where(active, (obs - preds) ** 2, 0.0)
        f2 = jnp.where(active, preds * preds, 0.0)
        return ll_i, r2, f2

    occ_np = np.asarray(rows.occasion_index).reshape(-1).astype(np.int64)
    sub_np = np.asarray(grid.row_subject).astype(np.int64)
    n_occ = np.zeros(n_sub, dtype=np.int64)
    np.maximum.at(n_occ, sub_np, occ_np + 1)

    return CondLL(
        ll_parts=ll_parts,
        pred_rows=pred_rows,
        subjects=subjects,
        n_sub=n_sub,
        nout=nout,
        kinds_np=kinds_np,
        lowered_a=np.asarray(lowered.a, dtype=np.float64),
        lowered_b=np.asarray(lowered.b, dtype=np.float64),
        n_obs_per_outeq=n_obs_per_outeq,
        obs_outeq=obs_outeq,
        obs_value=obs_value,
        obs_time=rows.obs_t.astype(fd),
        active=active,
        row_subject=row_subject,
        row_occasion=jnp.asarray(occ_np.astype(np.int32)),
        n_occ=n_occ,
        n_occ_max=int(n_occ.max()) if n_sub else 1,
        pred_rows_at=_pred_at,
    )


def resolve_transform(transform, p: int) -> tuple:
    if isinstance(transform, str):
        transform = (transform,) * p
    transform = tuple(transform)
    if len(transform) != p or any(t not in ("log", "identity") for t in transform):
        raise PharmsolError(
            "transform must be 'log', 'identity', or a per-parameter "
            "sequence of those"
        )
    return transform
