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



# Round 5: the fused-psi plan machinery (3 plan classes + the shared
# decomposition tiers) moved to likelihood/plans/ as pure code movement;
# these re-exports keep the long-standing import surface stable.
from .plans.analytical import _PallasPsiPlan  # noqa: F401,E402
from .plans.decompose import (  # noqa: F401,E402
    _pallas_structure_name,
    _constant_covariate_values,
    _classify_covariates,
    _covariate_values_at,
    _affine_covariate_streams,
    _RowCov,
    _decompose_input_seg_planes,
    _affine_solve,
    _host_cpu_device,
    _host_cov_values,
    _decompose_kernel_inputs,
    _InputPlaneDynamic,
    _decompose_input_plane,
    _decompose_input_planes,
    _validate_lag_no_overlap,
    _check_out_covariate_free,
)
from .plans.seq import (  # noqa: F401,E402
    _MAX_PLANE_FLOATS,
    _MAX_SEQ_COLPLANES,
    _MAX_SEQ_LEVELS,
    _MAX_SEQ_SEGPLANES,
    _colplanes_dynamic_lag,
    _decompose_seq,
    _decompose_seq_colplanes,
    _decompose_seq_levels,
    _decompose_seq_planes,
    _decompose_seq_segplanes,
    _decompose_seq_tv,
    _seq_depth_stream,
)
from .plans.ode import (  # noqa: F401,E402
    _ODE_MERGE_MAX_SPAN,
    _PallasOdePsiPlan,
    _ode_merge_runs,
)
from .plans.sde import _PallasSdePsiPlan  # noqa: F401,E402

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
