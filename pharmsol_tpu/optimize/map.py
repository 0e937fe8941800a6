"""Gradient-based MAP / maximum-likelihood fitting (beyond the reference).

The reference's optimize module is derivative-free (Nelder-Mead support-
point refinement, optimize/parameters.rs:19-120) because the Rust engine
cannot autodiff. This rebuild's engines are differentiable
(Equation.log_likelihood_fn), so individual-level fitting gets the
standard gradient machinery: L-BFGS with zoom linesearch on the exact
gradient, and a Laplace covariance (inverse Hessian of the negative log
posterior) for standard errors — all jit-compiled, engine-shared with the
population psi path.

Engine support follows log_likelihood_fn: analytical kernels and the
exact ``expm`` solver are reverse-mode differentiable; adaptive ODE
solvers integrate under ``lax.while_loop`` (forward-mode only), so for
them fit_map computes gradients with ``jax.jacfwd`` behind a
``custom_vjp`` shim — exact discrete sensitivities of the adaptive
march, n-parameter tangent cost, L-BFGS machinery unchanged. SDE
likelihoods (discrete resampling) are rejected.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import numpy as np

from ..data.error_model import AssayErrorModels
from ..errors import PharmsolError

_REVERSE_DIFF_SOLVERS = (None, "expm", "expm_rolled")  # None = analytical


class MapResult(NamedTuple):
    """MAP fit result with Laplace (inverse-Hessian) uncertainty."""

    parameters: np.ndarray       # [n_params] at the optimum (natural scale)
    log_likelihood: float        # data log-likelihood at the optimum
    log_posterior: float         # + prior_logpdf when a prior was given
    converged: bool
    iterations: int
    gradient_norm: float         # inf-norm of the (transformed) gradient
    covariance: Optional[np.ndarray]  # Laplace covariance, natural scale
    standard_errors: Optional[np.ndarray]

    def summary(self) -> str:
        lines = [
            f"MAP fit: logpost={self.log_posterior:.6g} "
            f"(loglik={self.log_likelihood:.6g}), "
            f"{'converged' if self.converged else 'NOT converged'} in "
            f"{self.iterations} iters, |grad|={self.gradient_norm:.3g}"
        ]
        for i, v in enumerate(self.parameters):
            se = (f" +- {self.standard_errors[i]:.4g}"
                  if self.standard_errors is not None else "")
            lines.append(f"  p[{i}] = {v:.6g}{se}")
        return "\n".join(lines)


def fit_map(
    equation,
    data,
    error_models: AssayErrorModels,
    x0: Sequence[float],
    *,
    prior_logpdf: Optional[Callable] = None,
    log_space: bool = True,
    max_iters: int = 200,
    grad_tol: float = 1e-6,
) -> MapResult:
    """Fit one parameter vector to a subject or Data by MAP / ML.

    ``prior_logpdf``: optional jax-traceable ``params -> scalar`` log
    prior on the NATURAL scale (omit for maximum likelihood).
    ``log_space=True`` (default) optimizes ``z = log(p)`` — PK parameters
    are positive and usually log-normal-ish, and the reparameterization
    keeps L-BFGS off the boundary; set False for sign-free parameters.
    Returns a :class:`MapResult` whose covariance is the Laplace
    approximation on the NATURAL scale (delta method through exp when
    ``log_space``).
    """
    import jax
    import jax.numpy as jnp
    import optax

    if getattr(equation, "kind", None) == "sde":
        raise PharmsolError(
            "fit_map cannot differentiate SDE likelihoods (discrete "
            "particle resampling); use the derivative-free "
            "ParameterOptimizer"
        )
    opts = getattr(equation, "_opts", None)
    solver = getattr(opts, "solver", None)
    # adaptive steppers integrate under lax.while_loop: forward-mode only
    forward_mode = solver not in _REVERSE_DIFF_SOLVERS

    # lowered data rides as jit OPERANDS: refitting a different Data of
    # the same padded shapes (bootstrap replicates, cross-validation
    # folds) reuses the compiled optimizer instead of re-paying the full
    # trace+compile — the jitted programs are cached on the model, keyed
    # by program structure; jax.jit handles shape-level retraces
    ll_rows, operands, _, _, pkey = equation._ll_fn_parts(
        data, error_models
    )
    x0 = np.asarray(x0, dtype=np.float64)
    if log_space and np.any(x0 <= 0.0):
        raise PharmsolError(
            "fit_map(log_space=True) needs a strictly positive x0 "
            "(pass log_space=False for sign-free parameters)"
        )

    cache = equation.__dict__.setdefault("_fit_map_jit", {})
    # key on the prior OBJECT (hashable by identity; held alive by the
    # cache so its id cannot be recycled onto a different prior)
    key = (pkey, log_space, forward_mode, prior_logpdf)
    progs = cache.get(key)
    if progs is None:
        def unpack(z):
            return jnp.exp(z) if log_space else z

        def _neg_log_post(z, rows, kind, factor, poly):
            p = unpack(z)
            val = jnp.sum(ll_rows(rows, p, kind, factor, poly))
            if prior_logpdf is not None:
                val = val + prior_logpdf(p)
            return -val

        if forward_mode:
            # optax's zoom linesearch calls jax.value_and_grad on the
            # objective; route that reverse-mode request through jacfwd
            # so while_loop-based solvers differentiate (scalar output,
            # so the cotangent is just a scale on the forward gradient)
            _fwd_grad = jax.jacfwd(_neg_log_post)

            @jax.custom_vjp
            def neg_log_post(z, rows, kind, factor, poly):
                return _neg_log_post(z, rows, kind, factor, poly)

            def _nlp_fwd(z, rows, kind, factor, poly):
                return (_neg_log_post(z, rows, kind, factor, poly),
                        _fwd_grad(z, rows, kind, factor, poly))

            def _nlp_bwd(saved_grad, ct):
                return (ct * saved_grad, None, None, None, None)

            neg_log_post.defvjp(_nlp_fwd, _nlp_bwd)
        else:
            neg_log_post = _neg_log_post

        opt = optax.lbfgs()

        @jax.jit
        def value_fn(z, rows, kind, factor, poly):
            return neg_log_post(z, rows, kind, factor, poly)

        @jax.jit
        def step(z, state, rows, kind, factor, poly):
            def f(zz):
                return neg_log_post(zz, rows, kind, factor, poly)

            value, grad = optax.value_and_grad_from_state(f)(z, state=state)
            updates, state = opt.update(
                grad, state, z, value=value, grad=grad, value_fn=f
            )
            z = optax.apply_updates(z, updates)
            return z, state, value, grad

        @jax.jit
        def hess_fn(z, rows, kind, factor, poly):
            # differentiate the RAW objective: jvp cannot pass through
            # the custom_vjp wrapper, and forward-over-forward is the
            # only mode while_loop solvers support
            def f(zz):
                return _neg_log_post(zz, rows, kind, factor, poly)

            return (jax.jacfwd(jax.jacfwd(f)) if forward_mode
                    else jax.hessian(f))(z)

        progs = (unpack, value_fn, step, hess_fn, opt)
        cache[key] = progs
    unpack, value_fn, step, hess_fn, opt = progs

    z0 = jnp.asarray(np.log(x0) if log_space else x0)
    f0 = float(value_fn(z0, *operands))
    if not np.isfinite(f0):
        raise PharmsolError(
            f"fit_map objective is non-finite at x0={list(map(float, x0))} "
            f"(neg log posterior = {f0}); pick a starting point off the "
            f"model's singular set (e.g. ka == ke in absorption kernels)"
        )

    z = z0
    state = opt.init(z0)
    gnorm = np.inf
    converged = False
    it = 0
    for it in range(1, max_iters + 1):
        z, state, value, grad = step(z, state, *operands)
        gnorm = float(jnp.max(jnp.abs(grad)))
        if not np.isfinite(gnorm):
            break
        if gnorm < grad_tol:
            converged = True
            break

    p_hat = np.asarray(unpack(z), dtype=np.float64)
    logpost = -float(value_fn(z, *operands))
    loglik = logpost - (
        float(prior_logpdf(jnp.asarray(p_hat))) if prior_logpdf else 0.0
    )

    covariance = None
    ses = None
    try:
        H = np.asarray(hess_fn(z, *operands), dtype=np.float64)
        cov_z = np.linalg.inv(H)
        if log_space:
            # delta method: p = exp(z) -> cov_p = diag(p) cov_z diag(p)
            J = np.diag(p_hat)
            covariance = J @ cov_z @ J
        else:
            covariance = cov_z
        diag = np.diag(covariance)
        ses = np.where(diag > 0, np.sqrt(np.maximum(diag, 0.0)), np.nan)
        if not np.all(np.isfinite(covariance)):
            covariance, ses = None, None
    except np.linalg.LinAlgError:
        pass

    return MapResult(
        parameters=p_hat,
        log_likelihood=loglik,
        log_posterior=logpost,
        converged=converged,
        iterations=it,
        gradient_norm=gnorm,
        covariance=covariance,
        standard_errors=ses,
    )
