"""SDE particle filter tests.

Strategy mirrors the reference (tests/test_pf.rs): statistical bounds on the
particle-filter likelihood plus exact checks in the zero-diffusion limit,
where the SDE collapses to the ODE and every particle is identical.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.models.sde import SDE

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'


def decay_sde(nparticles=16, sigma_diff=0.0, seed=0):
    return SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0] + rateiv[0]]),
        diffusion=lambda p, t, cov: jnp.stack([p[2]]),
        out=lambda x, p, t, cov: x[:1] / p[1],
        nparticles=nparticles,
        nstates=1,
        ndrugs=1,
        nout=1,
        seed=seed,
    )


def subject():
    return (
        Subject.builder("s")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, 8.0, 0)
        .observation(2.0, 6.5, 0)
        .observation(4.0, 4.5, 0)
        .build()
    )


def test_zero_diffusion_matches_analytical():
    sde = decay_sde(nparticles=8, seed=1)
    analytical = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    s = subject()
    ke, v = 0.2, 10.0
    got = sde.estimate_predictions(s, [ke, v, 0.0]).flat_predictions()
    want = analytical.estimate_predictions(s, [ke, v]).flat_predictions()
    # zero diffusion -> deterministic EM integration of the drift; the
    # stepper's own tolerance class is 1e-2 (em.rs rtol=atol=1e-2, max dt 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-2)


def test_zero_diffusion_loglik_matches_analytical():
    sde = decay_sde(nparticles=8, seed=2)
    analytical = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    s = subject()
    ll_sde = sde.estimate_log_likelihood(s, [0.2, 10.0, 0.0], ems)
    ll_ana = analytical.estimate_log_likelihood(s, [0.2, 10.0], ems)
    # identical particles -> mean weight = the deterministic likelihood;
    # only EM integration error (rtol 1e-2 stepper) separates them
    assert abs(ll_sde - ll_ana) < 0.05 * abs(ll_ana) + 0.05


def test_same_seed_reproducible_different_seed_varies():
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    s = subject()
    p = [0.2, 10.0, 0.5]
    ll_a = decay_sde(64, seed=7).estimate_log_likelihood(s, p, ems)
    ll_b = decay_sde(64, seed=7).estimate_log_likelihood(s, p, ems)
    ll_c = decay_sde(64, seed=8).estimate_log_likelihood(s, p, ems)
    assert ll_a == ll_b
    assert ll_a != ll_c
    assert np.isfinite(ll_a)


def test_particle_filter_variance_bounded():
    """Reference-style statistical test: repeated PF runs cluster around the
    deterministic log-likelihood for small diffusion (test_pf.rs:4-50)."""
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    s = subject()
    analytical = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    ll_det = analytical.estimate_log_likelihood(s, [0.2, 10.0], ems)
    lls = [
        decay_sde(512, seed=seed).estimate_log_likelihood(s, [0.2, 10.0, 0.3], ems)
        for seed in range(5)
    ]
    spread = max(lls) - min(lls)
    assert spread < 1.0, f"PF spread too large: {lls}"
    assert abs(np.mean(lls) - ll_det) < 1.0, f"PF biased: {np.mean(lls)} vs {ll_det}"


def test_inject_to_destination_route():
    from pharmsol_tpu import Route, metadata

    md = (
        metadata.new("inject")
        .parameters(["ke", "v", "g"])
        .states(["depot", "central"])
        .outputs(["cp"])
        .route(Route.bolus("oral").to_state("central").inject_input_to_destination())
        .particles(4)
    )
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([0.0 * x[0], -p[0] * x[1]]),
        diffusion=lambda p, t, cov: jnp.zeros(2),
        out=lambda x, p, t, cov: x[1:2] / p[1],
        nparticles=4,
        nstates=2,
        ndrugs=1,
        nout=1,
    ).with_metadata(md)
    s = (
        Subject.builder("s")
        .bolus(0.0, 100.0, "oral")
        .observation(1.0, 0.0, "cp")
        .build()
    )
    got = sde.estimate_predictions(s, [0.2, 1.0, 0.0]).flat_predictions()
    # bolus landed in `central` (state 1), not state 0 (EM tolerance class 1e-2)
    np.testing.assert_allclose(got, [100.0 * math.exp(-0.2)], rtol=1e-2)
    assert got[0] > 50.0  # would be ~0 if the bolus hit the inert depot


def test_sde_in_psi_matrix():
    from pharmsol_tpu import Data
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    sde = decay_sde(32, seed=3)
    support = np.array([[0.15, 10.0, 0.2], [0.25, 9.0, 0.2]])
    psi = log_likelihood_matrix(sde, Data([subject()]), support, ems)
    assert psi.shape == (1, 2)
    assert np.all(np.isfinite(psi))


def test_sde_noise_modes():
    """with_noise('independent') keys draws on the parameter vector.

    Common mode reuses draws across support points; independent mode matches
    the reference's per-call RNG (fresh draws per (subject, params) cell).
    Zero-diffusion models must be mode-invariant.
    """
    import numpy as np
    from pharmsol_tpu import Data
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    subject = (
        Subject.builder("n1").bolus(0.0, 100.0, 0)
        .observation(1.0, 4.2, 0).observation(3.0, 2.1, 0).build()
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.array([[0.2, 20.0], [0.200001, 20.0], [0.4, 25.0]])

    def make(noise, dcoef):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: -p[0] * x[:1],
            diffusion=lambda p, t, cov: jnp.full((1,), dcoef),
            out=lambda x, p, t, cov: x[:1] / p[1],
            nparticles=300,
            nstates=1, ndrugs=1, nout=1,
            seed=7,
        ).with_noise(noise)

    # zero diffusion: modes identical (noise multiplied by zero)
    psi_c0 = log_likelihood_matrix(make("common", 0.0), Data([subject]), support, ems)
    psi_i0 = log_likelihood_matrix(make("independent", 0.0), Data([subject]), support, ems)
    np.testing.assert_allclose(psi_c0, psi_i0, rtol=1e-12)

    # with diffusion: common mode gives nearly-identical LL for nearly-equal
    # params (same draws); independent mode decorrelates them
    psi_c = log_likelihood_matrix(make("common", 0.05), Data([subject]), support, ems)
    psi_i = log_likelihood_matrix(make("independent", 0.05), Data([subject]), support, ems)
    d_common = abs(psi_c[0, 0] - psi_c[0, 1])
    d_indep = abs(psi_i[0, 0] - psi_i[0, 1])
    assert d_common < 1e-3, f"common random numbers should be smooth ({d_common})"
    assert d_indep > d_common, "independent draws should decorrelate cells"
    # both are consistent estimates of the same likelihood
    np.testing.assert_allclose(psi_c, psi_i, atol=0.5)


def test_independent_noise_distinguishes_sub_f32_params():
    """Keys bitcast at f64 width: supports differing below f32 resolution
    still draw independently (review fix)."""
    import numpy as np
    from pharmsol_tpu import Data
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    subject = (
        Subject.builder("k1").bolus(0.0, 100.0, 0)
        .observation(1.0, 4.2, 0).build()
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.array([[0.2, 20.0], [0.2 * (1 + 1e-12), 20.0]])
    model = SDE(
        drift=lambda x, p, t, rateiv, cov: -p[0] * x[:1],
        diffusion=lambda p, t, cov: jnp.full((1,), 0.2),
        out=lambda x, p, t, cov: x[:1] / p[1],
        nparticles=100, nstates=1, ndrugs=1, nout=1, seed=3,
    ).with_noise("independent")
    psi = log_likelihood_matrix(model, Data([subject]), support, ems)
    # with f32-keying these two cells were bit-identical; f64 keying makes
    # them independent draws (values still close: same likelihood estimated)
    assert psi[0, 0] != psi[0, 1]
    assert abs(psi[0, 0] - psi[0, 1]) < 0.5


def test_em_runaway_lane_poisons_fast():
    """An exploding/stalling EM lane must poison, not spin 100k iterations.

    f32: the 1e-6 min step drops below ulp(t) once t > ~16; without the
    no-progress guard a rejected lane runs all EM_MAX_ITERS masked
    iterations (3 cloud evaluations each) — the batch-stalling runaway
    class fixed in the ODE steppers.
    """
    import time

    import jax

    from pharmsol_tpu.engine.sde import _em_segment

    def drift(x, t):
        return x * x  # finite-time blow-up

    def diffusion(t):
        return jnp.ones((1,), jnp.float32)

    X = jnp.full((16, 1), 1e18, jnp.float32)
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(
        lambda X: _em_segment(drift, diffusion, X, jnp.float32(0.0),
                              jnp.float32(10.0), jax.random.PRNGKey(0))
    )(X))
    took = time.perf_counter() - t0
    assert np.all(np.isnan(out))
    assert took < 60.0  # guard exit, not a 100k-iteration crawl


def test_resampler_distributions_match_weights():
    """Both resamplers draw counts proportional to the weights.

    The reference's `sysresample` (sde/mod.rs:747-768) draws an independent
    uniform per stratum — textbook STRATIFIED resampling, which is our
    default; 'systematic' is the single-shared-offset variant. Both are
    unbiased: E[count_i] = M * w_i.
    """
    import jax

    from pharmsol_tpu.engine.sde import (
        _stratified_resample,
        _systematic_resample,
    )

    M = 512
    rng = np.random.RandomState(0)
    w = rng.dirichlet(np.ones(M) * 0.3)
    w_j = jnp.asarray(w)
    for fn in (_stratified_resample, _systematic_resample):
        counts = np.zeros(M)
        reps = 200
        for r in range(reps):
            idx = np.asarray(fn(w_j, jax.random.PRNGKey(r)))
            assert idx.min() >= 0 and idx.max() < M
            counts += np.bincount(idx, minlength=M)
        freq = counts / (reps * M)
        # both schemes bound the count error to <1/M per stratum pass
        assert np.max(np.abs(freq - w)) < 2.0 / M, fn.__name__


def test_systematic_resampling_likelihood_consistent():
    """with_resampling('systematic') yields statistically equivalent LL."""
    from pharmsol_tpu import SDE, Subject

    def make(resampling, seed):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: jnp.stack(
                [-x[0] * x[1], -x[1] + p[0]]
            ),
            diffusion=lambda p, t, cov: jnp.stack([1.0, 0.01]),
            init=lambda p, t, cov: jnp.stack([0.0, 1.0]),
            out=lambda x, p, t, cov: x[0:1],
            nparticles=3000,
            nstates=2, ndrugs=1, nout=1, seed=seed,
            resampling=resampling,
        )

    subject = (
        Subject.builder("id1").bolus(0.0, 20.0, 0)
        .observation(0.2, 16.6434, 0).observation(0.4, 14.3233, 0)
        .observation(0.6, 9.8468, 0).observation(0.8, 9.4177, 0)
        .observation(1.0, 7.5170, 0).build()
    )
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.0, 0.0, 0.0), 0.0)
    )
    lls = {}
    for scheme in ("stratified", "systematic"):
        vals = [
            make(scheme, seed).estimate_log_likelihood(
                subject, np.array([1.0]), ems
            )
            for seed in range(5)
        ]
        assert all(np.isfinite(v) for v in vals), (scheme, vals)
        lls[scheme] = np.mean(vals)
    # same filter, same model: means agree within particle-filter noise
    assert abs(lls["stratified"] - lls["systematic"]) < 0.5, lls


def test_coupled_em_control_zero_diffusion_exact():
    # with g = 0 the Brownian increments never enter: coupled and
    # independent controllers walk identical deterministic marches
    s = subject()
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.0, 0.0, 0.0), 2.0)
    )
    p = [0.2, 10.0, 0.0]
    ll_ind = decay_sde(8, seed=1).estimate_log_likelihood(s, p, ems)
    ll_cpl = decay_sde(8, seed=1).with_em_control("coupled") \
        .estimate_log_likelihood(s, p, ems)
    assert ll_cpl == pytest.approx(ll_ind, abs=1e-10)
    with pytest.raises(ValueError, match="em_control"):
        decay_sde(8).with_em_control("bogus")


def test_coupled_em_control_statistical_parity():
    """dW_full = dW_1 + dW_2 changes only the step-size sequence: the
    accepted path follows the same EM law, so the PF likelihood agrees
    with the reference-exact independent controller within filter noise."""
    from pharmsol_tpu import SDE, Subject

    def make(em_control, seed):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: jnp.stack(
                [-x[0] * x[1], -x[1] + p[0]]
            ),
            diffusion=lambda p, t, cov: jnp.stack([1.0, 0.01]),
            init=lambda p, t, cov: jnp.stack([0.0, 1.0]),
            out=lambda x, p, t, cov: x[0:1],
            nparticles=3000,
            nstates=2, ndrugs=1, nout=1, seed=seed,
            em_control=em_control,
        )

    s = (
        Subject.builder("id1").bolus(0.0, 20.0, 0)
        .observation(0.2, 16.6434, 0).observation(0.4, 14.3233, 0)
        .observation(0.6, 9.8468, 0).observation(0.8, 9.4177, 0)
        .observation(1.0, 7.5170, 0).build()
    )
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.0, 0.0, 0.0), 0.0)
    )
    lls = {}
    for mode in ("independent", "coupled"):
        vals = [
            make(mode, seed).estimate_log_likelihood(s, np.array([1.0]), ems)
            for seed in range(5)
        ]
        assert all(np.isfinite(v) for v in vals), (mode, vals)
        lls[mode] = np.mean(vals)
    assert abs(lls["independent"] - lls["coupled"]) < 0.8, lls
