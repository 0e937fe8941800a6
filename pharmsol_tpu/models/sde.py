"""SDE equation family: particle-filtered stochastic models.

Parity with /root/reference/src/simulator/equation/sde/mod.rs:

- ``SDE(drift, diffusion, lag, fa, init, out, nparticles)``;
- ``estimate_predictions``: particles advance with no reweighting
  (error_models=None path); predictions are the particle mean;
- ``estimate_log_likelihood``: bootstrap particle filter; per-observation
  contribution = mean particle weight; total = sum of logs (-inf when a
  contribution underflows to 0);
- metadata routes with InjectToDestination map boluses into their declared
  destination state for every particle.

Determinism: the reference uses thread-local RNG (non-reproducible runs) and
a likelihood cache to freeze values per (subject, params). Here every run is
keyed: ``with_seed(seed)`` fixes the PRNG; rows fold in their index. By
default the same key is shared across support points (common random numbers,
lower psi variance); ``with_noise('independent')`` additionally keys on the
parameter vector, matching the reference's per-call RNG semantics
(sde/mod.rs:175 fresh rng per simulation).

Step control: ``with_em_control('coupled')`` shares the Brownian
increments between the full step and the two half steps of the adaptive
EM error estimate (dW_full = dW_1 + dW_2), so the controller measures
truncation error instead of fresh-noise difference and takes the steps
the scheme earns — often far larger, same EM law per accepted step. The
default ``'independent'`` is reference-exact (em.rs:144-152 draws fresh
normals inside every euler_maruyama_step call).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import float_dtype
from ..engine.sde import SDESim, SDESpec, simulate_occasion_sde
from ..metadata import ModelKind, RouteInputPolicy
from .equation import EquationBase


class SDE(EquationBase):
    kind = "sde"

    def __init__(
        self,
        drift: Callable,
        diffusion: Callable,
        lag: Optional[Callable] = None,
        fa: Optional[Callable] = None,
        init: Optional[Callable] = None,
        out: Optional[Callable] = None,
        nparticles: int = 1000,
        nstates: int = 5,
        ndrugs: int = 5,
        nout: int = 5,
        seed: int = 0,
        noise: str = "common",
        resampling: str = "stratified",
        em_control: str = "independent",
    ):
        super().__init__(nstates, ndrugs, nout)
        self._drift = drift
        self._diffusion = diffusion
        self._lag = lag
        self._fa = fa
        self._init = init
        self._out = out
        self._nparticles = int(nparticles)
        self._seed = int(seed)
        if noise not in ("common", "independent"):
            raise ValueError("noise must be 'common' or 'independent'")
        self._noise = noise
        if resampling not in ("stratified", "systematic"):
            raise ValueError("resampling must be 'stratified' or 'systematic'")
        self._resampling = resampling
        if em_control not in ("independent", "coupled"):
            raise ValueError("em_control must be 'independent' or 'coupled'")
        self._em_control = em_control

    def _model_kind(self) -> ModelKind:
        return ModelKind.SDE

    def with_nparticles(self, n: int):
        self._nparticles = int(n)
        self._invalidate()
        return self

    def with_seed(self, seed: int):
        self._seed = int(seed)
        self._invalidate()
        return self

    def with_noise(self, noise: str):
        """Noise coupling across parameter sets in population likelihoods.

        ``'common'`` (default): the same draws are reused for every support
        point (common random numbers) — lower psi-matrix variance, smooth in
        the parameters. ``'independent'``: draws additionally key on the
        parameter vector, matching the reference's per-call RNG
        (sde/mod.rs uses a fresh rng per simulate call), so every
        (subject, support) cell is an independent particle-filter estimate.
        """
        if noise not in ("common", "independent"):
            raise ValueError("noise must be 'common' or 'independent'")
        self._noise = noise
        self._invalidate()
        return self

    def with_resampling(self, resampling: str):
        """Particle resampling scheme at weighted observations.

        ``'stratified'`` (default) matches the reference's ``sysresample``
        exactly — despite its name it draws an independent uniform per
        stratum, ``u_j = (j + U_j)/M`` (sde/mod.rs:747-768).
        ``'systematic'`` uses the textbook single shared offset
        ``u_j = (j + U)/M`` (lower resampling variance, Kitagawa 1996).
        """
        if resampling not in ("stratified", "systematic"):
            raise ValueError("resampling must be 'stratified' or 'systematic'")
        self._resampling = resampling
        self._invalidate()
        return self

    def with_em_control(self, em_control: str):
        """Step-doubling noise coupling inside the adaptive EM stepper.

        ``'independent'`` (default) is reference-exact (em.rs: the full
        step and the two half steps each draw fresh noise) — the error
        estimate then carries a pure-noise term ~``g*sqrt(2h)`` and the
        controller pins ``h ~ (tol/g)^2`` regardless of the drift.
        ``'coupled'`` shares the Brownian increments (``dW_full = dW_1 +
        dW_2``), so the estimate measures the scheme's actual truncation
        error and steps grow to what Euler–Maruyama earns — typically far
        fewer trials for the same tolerance. The accepted path follows
        the same EM law either way; only the step-size sequence differs.
        """
        if em_control not in ("independent", "coupled"):
            raise ValueError("em_control must be 'independent' or 'coupled'")
        self._em_control = em_control
        self._invalidate()
        return self

    def nparticles(self) -> int:
        return self._nparticles

    def with_metadata(self, metadata):
        from ..metadata import ModelMetadata, ValidatedModelMetadata

        validated = (
            metadata
            if isinstance(metadata, ValidatedModelMetadata)
            else metadata.validate_for_with_particles(ModelKind.SDE, self._nparticles)
        )
        self._validate_metadata_dimensions(validated)
        self._metadata = validated
        if validated.particle_count:
            self._nparticles = validated.particle_count
        self._invalidate()
        return self

    # -- spec ---------------------------------------------------------------
    def _sde_spec(self) -> SDESpec:
        bolus_dest = None
        if self._metadata is not None:
            dest = list(range(self._ndrugs))
            for route in self._metadata.validated_routes:
                if route.input_policy is RouteInputPolicy.INJECT_TO_DESTINATION:
                    if route.input_index < self._ndrugs:
                        dest[route.input_index] = route.destination_index
            bolus_dest = tuple(dest)
        out = self._out or (lambda x, p, t, cov: x[: self._nout])
        return SDESpec(
            nstates=self._nstates,
            ninput=self._ndrugs,
            nout=self._nout,
            nparticles=self._nparticles,
            drift=self._drift,
            diffusion=self._diffusion,
            out=out,
            init=self._init,
            lag=self._lag,
            fa=self._fa,
            bolus_dest=bolus_dest,
            resampling=self._resampling,
            em_control=self._em_control,
        )

    @property
    def spec(self):
        if self._spec_cache is None:
            self._spec_cache = self._sde_spec()
        return self._spec_cache

    def _build_spec(self):
        return self._sde_spec()

    # -- jitted row programs ---------------------------------------------------
    def _sim_rows_fn(self, cov_names: tuple):
        spec = self.spec
        nout = self._nout
        fd = float_dtype()
        seed = self._seed

        def sim_rows(rows, p):
            key = jax.random.PRNGKey(seed)
            zero_em = (
                jnp.zeros((nout,), jnp.int32),
                jnp.zeros((nout,), fd),
                jnp.zeros((nout, 4), fd),
            )

            def one(occ, idx):
                return simulate_occasion_sde(
                    spec,
                    occ,
                    p,
                    list(cov_names),
                    jax.random.fold_in(key, idx),
                    *zero_em,
                    filter_on=False,
                )

            n = rows.obs_t.shape[0]
            return jax.vmap(one)(rows, jnp.arange(n))

        return sim_rows

    def _ll_rows_fn(self, cov_names: tuple):
        spec = self.spec
        seed = self._seed
        independent = self._noise == "independent"

        def ll_rows(rows, p, em_kind, em_factor, em_poly):
            key = jax.random.PRNGKey(seed)
            if independent:
                # per-call RNG semantics: key on the parameter vector so every
                # (subject, support) cell draws independent noise. Bitcast at
                # the vector's own width (f64 -> 2 uint32 words per element)
                # so supports that differ below f32 resolution still get
                # distinct keys.
                pb = jax.lax.bitcast_convert_type(
                    jnp.asarray(p), jnp.uint32
                ).reshape(-1)
                for i in range(pb.shape[0]):
                    key = jax.random.fold_in(key, pb[i])

            def one(occ, idx):
                sim = simulate_occasion_sde(
                    spec,
                    occ,
                    p,
                    list(cov_names),
                    jax.random.fold_in(key, idx),
                    em_kind,
                    em_factor,
                    em_poly,
                    filter_on=True,
                )
                return sim.log_likelihood

            n = rows.obs_t.shape[0]
            return jax.vmap(one)(rows, jnp.arange(n))

        return ll_rows

    def _pred_one_fn(self, cov_names: tuple):
        spec = self.spec
        nout = self._nout
        fd = float_dtype()
        seed = self._seed

        def pred_one(occ, p, idx):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), idx)
            zero_em = (
                jnp.zeros((nout,), jnp.int32),
                jnp.zeros((nout,), fd),
                jnp.zeros((nout, 4), fd),
            )
            sim = simulate_occasion_sde(
                spec, occ, p, list(cov_names), key, *zero_em, filter_on=False
            )
            return sim.pred_mean

        return pred_one

    def _assemble_subject_predictions(self, subject, grid, sim: SDESim):
        from ..likelihood.prediction import Prediction, SubjectPredictions

        pred = np.asarray(sim.pred_mean)
        state = np.asarray(sim.state_mean)
        out = SubjectPredictions()
        for row, occ in enumerate(subject.occasions()):
            for i, obs in enumerate(occ.observations()):
                out.add_prediction(
                    Prediction(
                        time=obs.time,
                        observation=obs.value,
                        prediction=float(pred[row, i]),
                        outeq=self.resolve_output_label(obs.outeq),
                        errorpoly=obs.errorpoly,
                        state=list(state[row, i]),
                        occasion=occ.index,
                        censoring=obs.censoring,
                    )
                )
        return out
