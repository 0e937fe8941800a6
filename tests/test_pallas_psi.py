"""Pallas fused psi kernel vs the general engine (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, AssayErrorModel, AssayErrorModels, Censor, Data, ErrorPoly, Subject
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix
from pharmsol_tpu.ops.pallas_psi import (
    SP_TILE,
    SUB_TILE,
    psi_2cmt_oral,
    segment_stream_from_schedule,
)

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'


def test_pallas_psi_matches_engine():
    rng = np.random.RandomState(0)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0]
    dose = 100.0
    R, S = SUB_TILE, SP_TILE

    subjects = []
    streams = []
    sigma_of = lambda v: np.sqrt((0.5 + 0.1 * v) ** 2 + 1.0)
    for i in range(R):
        values = np.abs(5 + rng.randn(len(obs_times)))
        b = Subject.builder(f"s{i}").bolus(0.0, dose, 0)
        for t, v in zip(obs_times, values):
            b = b.observation(float(t), float(v), 0)
        subjects.append(b.build())
        streams.append(
            segment_stream_from_schedule(obs_times, values, sigma_of(values), dose)
        )

    center = np.array([0.15, 1.2, 0.3, 0.2, 10.0])
    support = np.abs(center[None, :] * (1.0 + 0.2 * rng.randn(S, 5)))

    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems)

    args = [jnp.asarray(np.stack(a)) for a in zip(*streams)]
    # engine kernel takes p=[ke, ka, kcp, kpc]; pallas support layout matches
    got = np.asarray(psi_2cmt_oral(*args, jnp.asarray(support), interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_psi_1cmt_matches_engine():
    from pharmsol_tpu.ops.pallas_psi import psi_oral

    rng = np.random.RandomState(3)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0]
    dose = 100.0
    R, S = SUB_TILE, SP_TILE

    subjects, streams = [], []
    sigma_of = lambda v: np.sqrt((0.5 + 0.1 * v) ** 2 + 1.0)
    for i in range(R):
        values = np.abs(5 + rng.randn(len(obs_times)))
        b = Subject.builder(f"s{i}").bolus(0.0, dose, 0)
        for t, v in zip(obs_times, values):
            b = b.observation(float(t), float(v), 0)
        subjects.append(b.build())
        streams.append(
            segment_stream_from_schedule(obs_times, values, sigma_of(values), dose)
        )

    # support in kernel order [ka, ke, v]
    support = np.abs(
        np.array([1.2, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(S, 3))
    )
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems)

    args = [jnp.asarray(np.stack(a)) for a in zip(*streams)]
    got = np.asarray(
        psi_oral(*args, jnp.asarray(support),
                 structure="one_compartment_with_absorption", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_psi_3cmt_matches_engine():
    from pharmsol_tpu.ops.pallas_psi import psi_oral

    rng = np.random.RandomState(7)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0]
    dose = 100.0
    R, S = SUB_TILE, SP_TILE

    subjects, streams = [], []
    sigma_of = lambda v: np.sqrt((0.5 + 0.1 * v) ** 2 + 1.0)
    for i in range(R):
        values = np.abs(3 + rng.randn(len(obs_times)))
        b = Subject.builder(f"s{i}").bolus(0.0, dose, 0)
        for t, v in zip(obs_times, values):
            b = b.observation(float(t), float(v), 0)
        subjects.append(b.build())
        streams.append(
            segment_stream_from_schedule(obs_times, values, sigma_of(values), dose)
        )

    # support in kernel order [ka, k10, k12, k13, k21, k31, v]
    center = np.array([1.2, 0.15, 0.3, 0.08, 0.2, 0.05, 10.0])
    support = np.abs(center[None, :] * (1.0 + 0.2 * rng.randn(S, 7)))

    model = Analytical(
        pst.three_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[6],
        nstates=4, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems)

    args = [jnp.asarray(np.stack(a)) for a in zip(*streams)]
    got = np.asarray(
        psi_oral(*args, jnp.asarray(support),
                 structure="three_compartments_with_absorption", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-8, atol=1e-8)


def _repeat_subjects(rng, R, iv=True, n_dose=10, tau=12.0):
    """The reference's "Repeat" shape: q12h x 10 doses, 14 obs over 120 h."""
    obs_times = np.linspace(1.0, 120.0, 14)
    subjects = []
    for i in range(R):
        b = Subject.builder(f"r{i}")
        for d in range(n_dose):
            b = b.bolus(d * tau, 100.0, 0)
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        subjects.append(b.build())
    return subjects


def test_pallas_engine_repeat_dose_2cmt_iv():
    """Multi-bolus IV through log_likelihood_matrix(engine='pallas')."""
    rng = np.random.RandomState(11)
    subjects = _repeat_subjects(rng, SUB_TILE)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(40, 4))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_1cmt_iv_multi_occasion():
    """1-cmt IV with occasion splits: row->subject aggregation must match."""
    rng = np.random.RandomState(13)
    subjects = []
    for i in range(4):
        b = Subject.builder(f"m{i}").bolus(0.0, 100.0, 0)
        b = b.observation(2.0, float(np.abs(4 + rng.randn())), 0)
        b = b.reset().bolus(0.0, 50.0, 0)
        b = b.observation(3.0, float(np.abs(2 + rng.randn())), 0)
        subjects.append(b.build())
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.proportional(ErrorPoly(0.1, 0.1), 1.0))
    support = np.abs(np.array([0.2, 12.0])[None, :] * (1.0 + 0.3 * rng.randn(17, 2)))
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    assert got.shape == (4, 17)
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_rejections():
    import pytest
    from pharmsol_tpu.errors import PharmsolError

    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    s = Subject.builder("s").bolus(0.0, 100.0, 0).observation(1.0, 5.0, 0).build()
    support_bad = np.ones((4, 3))

    # wrong support width for the structure
    model = Analytical(
        pst.two_compartments, out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="support columns"):
        log_likelihood_matrix(model, Data([s]), support_bad, ems, engine="pallas")

    # non-linear output equation
    model_nl = Analytical(
        pst.two_compartments, out=lambda x, p, t, cov: (x[0:1] / p[3]) ** 2,
        nstates=2, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="linear output"):
        log_likelihood_matrix(model_nl, Data([s]), np.ones((4, 4)), ems, engine="pallas")

    # time-dependent output equation
    model_t = Analytical(
        pst.two_compartments, out=lambda x, p, t, cov: x[0:1] / p[3] * (1.0 + t),
        nstates=2, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="linear output"):
        log_likelihood_matrix(model_t, Data([s]), np.ones((4, 4)), ems, engine="pallas")

    model1 = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )

    # unknown engine name
    with pytest.raises(PharmsolError, match="unknown psi engine"):
        log_likelihood_matrix(model1, Data([s]), np.ones((4, 2)), ems, engine="cuda")


def test_pallas_engine_infusion_2cmt_iv():
    """IV infusion regimen (1h infusions q12h) through engine='pallas'."""
    rng = np.random.RandomState(17)
    obs_times = np.linspace(1.5, 60.0, 9)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"i{i}")
        for d in range(5):
            b = b.infusion(d * 12.0, 100.0, 0, 1.0)  # 100 mg over 1 h
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(33, 4))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_mixed_bolus_infusion_oral():
    """Loading bolus into depot + maintenance infusion into central, 2-cmt oral."""
    rng = np.random.RandomState(19)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 18.0, 24.0]
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"x{i}").bolus(0.0, 100.0, 0)
        b = b.infusion(2.0, 50.0, 0, 4.0)  # 50 mg over 4 h starting at t=2
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        subjects.append(b.build())
    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.proportional(ErrorPoly(0.1, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(50, 5))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_infusion_3cmt_and_1cmt():
    """Infusion parity across the remaining structures."""
    rng = np.random.RandomState(23)
    obs_times = [1.0, 2.0, 4.0, 8.0, 16.0, 30.0]
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"z{i}").infusion(0.0, 200.0, 0, 2.0)
        b = b.bolus(12.0, 100.0, 0)
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))

    m1 = Analytical(pst.one_compartment, out=lambda x, p, t, cov: x[0:1] / p[1],
                    nstates=1, ndrugs=1, nout=1)
    sp1 = np.abs(np.array([0.2, 12.0])[None, :] * (1.0 + 0.3 * rng.randn(20, 2)))
    np.testing.assert_allclose(
        log_likelihood_matrix(m1, Data(subjects), sp1, ems, engine="pallas"),
        log_likelihood_matrix(m1, Data(subjects), sp1, ems),
        rtol=5e-9, atol=1e-9,
    )

    m3 = Analytical(pst.three_compartments_with_absorption,
                    out=lambda x, p, t, cov: x[1:2] / p[6],
                    nstates=4, ndrugs=1, nout=1)
    sp3 = np.abs(
        np.array([1.2, 0.15, 0.3, 0.08, 0.2, 0.05, 10.0])[None, :]
        * (1.0 + 0.2 * rng.randn(20, 7))
    )
    np.testing.assert_allclose(
        log_likelihood_matrix(m3, Data(subjects), sp3, ems, engine="pallas"),
        log_likelihood_matrix(m3, Data(subjects), sp3, ems),
        rtol=5e-8, atol=1e-8,
    )


def test_pallas_psi_sharded_matches_unsharded():
    """shard_map(pallas) over the 8-device virtual mesh == unsharded psi."""
    from pharmsol_tpu.parallel.mesh import log_likelihood_matrix_sharded, population_mesh

    rng = np.random.RandomState(29)
    subjects = _repeat_subjects(rng, 20)  # not a SUB_TILE*8 multiple: pad path
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(37, 4))
    )
    mesh = population_mesh()  # all 8 virtual devices on the subjects axis
    want = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    got = log_likelihood_matrix_sharded(
        model, Data(subjects), support, ems, mesh=mesh, engine="pallas"
    )
    assert got.shape == (20, 37)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pallas_engine_censored_observations():
    """BLOQ/ALOQ cells use the in-kernel log CDF approximation.

    The kernel's log_ndtr (A-S erf + Laplace continued fraction; Mosaic has
    no erf lowering) is accurate to ~6e-5 absolute, so parity vs the engine's
    exact log_ndtr is checked at atol 1e-3.
    """
    from pharmsol_tpu import Censor

    rng = np.random.RandomState(31)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0, 48.0]
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"c{i}").bolus(0.0, 100.0, 0)
        for k, t in enumerate(obs_times):
            v = float(np.abs(4 + rng.randn()))
            if k >= 6:
                b = b.censored_observation(t, 0.5, 0, Censor.BLOQ)  # LOQ tail
            elif k == 0:
                b = b.censored_observation(t, 20.0, 0, Censor.ALOQ)
            else:
                b = b.observation(t, v, 0)
        subjects.append(b.build())
    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.3 * rng.randn(64, 5))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-6)


def test_pallas_engine_errorpoly_overrides():
    """Per-observation errorpoly overrides resolve in the host-side sigma."""
    rng = np.random.RandomState(37)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"e{i}").bolus(0.0, 100.0, 0)
        b = b.observation(1.0, float(np.abs(5 + rng.randn())), 0)
        b = b.observation_with_error(
            4.0, float(np.abs(3 + rng.randn())), 0, (1.0, 0.25, 0.0, 0.0)
        )
        b = b.observation(12.0, float(np.abs(1 + rng.randn())), 0)
        subjects.append(b.build())
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([1.2, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(25, 3))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_sharded_validates_like_unsharded():
    """The sharded driver shares _PallasPsiPlan validation (review fix)."""
    import pytest
    from pharmsol_tpu.errors import PharmsolError
    from pharmsol_tpu.parallel.mesh import log_likelihood_matrix_sharded

    s = (Subject.builder("s").bolus(0.0, 100.0, 0)
         .covariate("wt", 0.0, 70.0)
         .observation(1.0, 5.0, 0).build())
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: (x[0:1] ** 2) / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="linear output"):
        log_likelihood_matrix_sharded(
            model, Data([s]), np.ones((4, 4)), ems, engine="pallas"
        )


def test_pallas_rejects_bolus_into_other_input():
    """Boluses must target input 0 (review fix: guard was infusion-only)."""
    import pytest

    s = Subject.builder("b").bolus(0.0, 100.0, 1).observation(1.0, 5.0, 0).build()
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=2, nout=1,
    )
    with pytest.raises(ValueError, match="boluses into input 0"):
        log_likelihood_matrix(model, Data([s]), np.ones((4, 4)), ems, engine="pallas")


def test_pallas_segment_capacity_limits():
    """M == SEG_PAD works; M > SEG_PAD raises the capacity error."""
    import pytest
    from pharmsol_tpu.ops.pallas_psi import SEG_PAD, psi_oral

    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    model = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    rng = np.random.RandomState(43)
    support = np.abs(np.array([0.2, 12.0])[None, :] * (1.0 + 0.2 * rng.randn(9, 2)))

    def subject_with_obs(n_obs):
        b = Subject.builder("cap").bolus(0.0, 100.0, 0)
        for k in range(n_obs):
            b = b.observation(0.5 + k * 0.5, float(np.abs(3 + rng.randn())), 0)
        return b.build()

    # exactly at capacity: 1 bolus + (SEG_PAD - 1) observations
    at_cap = subject_with_obs(SEG_PAD - 1)
    want = log_likelihood_matrix(model, Data([at_cap]), support, ems)
    got = log_likelihood_matrix(model, Data([at_cap]), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)

    over = subject_with_obs(SEG_PAD)
    with pytest.raises(ValueError, match="segment stream too long"):
        log_likelihood_matrix(model, Data([over]), support, ems, engine="pallas")


def test_pallas_pure_infusion_no_bolus():
    """NB == 0 regimens (infusions only) work through the engine path."""
    rng = np.random.RandomState(47)
    subjects = []
    for i in range(3):
        b = Subject.builder(f"p{i}").infusion(0.0, 120.0, 0, 3.0)
        for t in (1.0, 2.0, 4.0, 8.0):
            b = b.observation(t, float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    model = Analytical(
        pst.two_compartments, out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2, ndrugs=1, nout=1,
    )
    support = np.abs(
        np.array([0.15, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(13, 4))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_all_structures_parity():
    """engine='pallas' matches the XLA engine for ALL 12 analytical
    structures (micro-constant + CL parameterizations), mixed
    bolus+infusion regimen."""
    from pharmsol_tpu.engine.analytical import KERNELS

    rng = np.random.RandomState(31)
    obs_times = [1.0, 2.5, 6.0, 12.0, 24.0, 47.0]
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"a{i}").bolus(0.0, 100.0, 0)
        b = b.infusion(10.0, 150.0, 0, 1.5)
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(3 + rng.randn())), 0)
        subjects.append(b.build())
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.4, 0.1), 1.0)
    )

    # per structure: nominal support row (kernel params + v for the output)
    nominal = {
        "one_compartment": [0.2],
        "one_compartment_with_absorption": [1.1, 0.2],
        "one_compartment_cl": [2.0, 10.0],
        "one_compartment_cl_with_absorption": [1.1, 2.0, 10.0],
        "two_compartments": [0.2, 0.3, 0.25],
        "two_compartments_with_absorption": [0.2, 1.1, 0.3, 0.25],
        "two_compartments_cl": [2.0, 3.0, 10.0, 14.0],
        "two_compartments_cl_with_absorption": [1.1, 2.0, 3.0, 10.0, 14.0],
        "three_compartments": [0.2, 0.3, 0.05, 0.25, 0.07],
        "three_compartments_with_absorption": [1.1, 0.2, 0.3, 0.05, 0.25, 0.07],
        "three_compartments_cl": [2.0, 3.0, 0.6, 10.0, 14.0, 9.0],
        "three_compartments_cl_with_absorption": [1.1, 2.0, 3.0, 0.6, 10.0, 14.0, 9.0],
    }
    central = {name: (1 if name.endswith("_with_absorption") else 0)
               for name in nominal}

    for name, row in nominal.items():
        fn, nstates, nparams = KERNELS[name]
        assert len(row) == nparams
        c = central[name]
        vcol = nparams  # v appended after the kernel params
        model = Analytical(
            fn,
            out=lambda x, p, t, cov, c=c, vcol=vcol: x[c:c + 1] / p[vcol],
            nstates=nstates, ndrugs=1, nout=1,
        )
        sp = np.abs(
            np.array(row + [11.0])[None, :]
            * (1.0 + 0.15 * rng.randn(12, nparams + 1))
        )
        want = log_likelihood_matrix(model, Data(subjects), sp, ems)
        got = log_likelihood_matrix(model, Data(subjects), sp, ems, engine="pallas")
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8, err_msg=name)


def test_pallas_engine_multi_output():
    """Two output equations (central/v and peripheral amount) with distinct
    error models match the XLA engine."""
    rng = np.random.RandomState(7)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"m{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
            b = b.observation(float(t) + 0.1, float(np.abs(9 + rng.randn())), 1)
        subjects.append(b.build())
    ems = (
        AssayErrorModels()
        .add(0, AssayErrorModel.additive(ErrorPoly(0.4, 0.1), 1.0))
        .add(1, AssayErrorModel.proportional(ErrorPoly(0.2, 0.15), 1.5))
    )
    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: jnp.stack([x[1] / p[4], x[2] * 0.5]),
        nstates=3, ndrugs=1, nout=2,
    )
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
        * (1.0 + 0.2 * rng.randn(24, 5))
    )
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_affine_output_bias():
    """Outputs with a support-dependent constant term (baseline endogenous
    level) use the kernel bias rows."""
    rng = np.random.RandomState(13)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"b{i}").bolus(0.0, 100.0, 0)
        for t in (1.0, 3.0, 9.0, 24.0):
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        subjects.append(b.build())
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.4, 0.1), 1.0)
    )
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1] + p[2],
        nstates=1, ndrugs=1, nout=1,
    )
    sp = np.abs(
        np.array([0.2, 10.0, 1.5])[None, :] * (1.0 + 0.2 * rng.randn(10, 3))
    )
    want = log_likelihood_matrix(model, Data(subjects), sp, ems)
    got = log_likelihood_matrix(model, Data(subjects), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-9, atol=1e-9)


def test_pallas_engine_covariate_seq_multiplicative():
    """Time-constant covariates through a multiplicative seq equation ride
    the fused kernel (VERDICT item 2): pallas == XLA engine."""
    rng = np.random.RandomState(7)
    obs_times = [0.5, 1.0, 2.0, 4.0, 8.0, 12.0]
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        b = b.covariate("wt", 0.0, 55.0 + 5.0 * i)
        for t in obs_times:
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        subjects.append(b.build())

    def seq(p, t, cov):
        scale = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * scale, p[1], p[2] * scale, p[3] * scale, p[4]])

    model = Analytical(
        pst.two_compartments_with_absorption,
        seq_eq=seq,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    center = np.array([0.15, 1.2, 0.3, 0.2, 10.0])
    support = np.abs(center[None, :] * (1.0 + 0.2 * rng.randn(SP_TILE, 5)))

    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-8, atol=1e-8)


def test_pallas_engine_covariate_seq_cl_structure():
    """Covariate multipliers compose with the in-kernel CL remap."""
    rng = np.random.RandomState(8)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        b = b.covariate("wt", 0.0, 60.0 + 4.0 * i)
        for t in (1.0, 4.0, 12.0):
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())

    def seq(p, t, cov):
        w = cov("wt", t) / 70.0
        return jnp.stack([p[0] * w ** 0.75, p[1] * w ** 0.75, p[2] * w, p[3] * w, p[4]])

    model = Analytical(
        pst.two_compartments_cl,
        seq_eq=seq,
        out=lambda x, p, t, cov: x[0:1] / p[4],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    center = np.array([5.0, 2.0, 30.0, 40.0, 30.0])  # cl q vc vp v
    support = np.abs(center[None, :] * (1.0 + 0.15 * rng.randn(SP_TILE, 5)))

    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-8, atol=1e-8)


def test_pallas_engine_covariate_rejections():
    import pytest
    from pharmsol_tpu.errors import PharmsolError

    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))

    def subj(tv=False):
        b = Subject.builder("s").bolus(0.0, 100.0, 0).covariate("wt", 0.0, 70.0)
        if tv:
            b = b.covariate("wt", 6.0, 80.0)  # time-varying
        return b.observation(1.0, 5.0, 0).observation(12.0, 2.0, 0).build()

    def seq_mult(p, t, cov):
        return jnp.stack([p[0] * cov("wt", t) / 70.0, p[1]])

    model = Analytical(
        pst.one_compartment, seq_eq=seq_mult,
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    sp = np.abs(np.random.RandomState(0).randn(4, 2)) + 0.1

    # time-varying covariate: rides the per-segment multiplier streams
    got_tv = log_likelihood_matrix(
        model, Data([subj(tv=True)]), sp, ems, engine="pallas"
    )
    want_tv = log_likelihood_matrix(model, Data([subj(tv=True)]), sp, ems)
    np.testing.assert_allclose(got_tv, want_tv, rtol=1e-6, atol=1e-6)

    # additive covariate seq: round-3 affine streams carry it exactly
    model_add = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: jnp.stack([p[0] + cov("wt", t) / 700.0, p[1]]),
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    got_add = log_likelihood_matrix(
        model_add, Data([subj()]), sp, ems, engine="pallas"
    )
    want_add = log_likelihood_matrix(model_add, Data([subj()]), sp, ems)
    np.testing.assert_allclose(got_add, want_add, rtol=1e-6, atol=1e-6)

    # covariate-dependent parameter MIXING over a time-CONSTANT covariate:
    # not diagonal-affine and not covariate-free — the round-3 per-(row,
    # support) parameter planes carry it exactly
    model_mix = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * p[1] * cov("wt", t) / 700.0, p[1]]
        ),
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    got_mix = log_likelihood_matrix(
        model_mix, Data([subj()]), sp, ems, engine="pallas"
    )
    want_mix = log_likelihood_matrix(model_mix, Data([subj()]), sp, ems)
    np.testing.assert_allclose(got_mix, want_mix, rtol=1e-6, atol=1e-6)

    # the same mixing over a time-VARYING covariate: the segment-indexed
    # exact planes (_decompose_seq_segplanes) carry it now
    got_mix_tv = log_likelihood_matrix(
        model_mix, Data([subj(tv=True)]), sp, ems, engine="pallas"
    )
    want_mix_tv = log_likelihood_matrix(
        model_mix, Data([subj(tv=True)]), sp, ems
    )
    np.testing.assert_allclose(got_mix_tv, want_mix_tv, rtol=1e-6, atol=1e-6)

    # time-dependent multiplicative seq: per-segment streams carry it too
    model_t = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: jnp.stack([p[0] * (1.0 + 0.01 * t), p[1]]),
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    got_t = log_likelihood_matrix(model_t, Data([subj()]), sp, ems, engine="pallas")
    want_t = log_likelihood_matrix(model_t, Data([subj()]), sp, ems)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-6, atol=1e-6)

    # time-dependent ADDITIVE seq: round-3 affine tv streams carry it
    model_t_add = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: jnp.stack([p[0] + 0.001 * t, p[1]]),
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    got_ta = log_likelihood_matrix(
        model_t_add, Data([subj()]), sp, ems, engine="pallas"
    )
    want_ta = log_likelihood_matrix(model_t_add, Data([subj()]), sp, ems)
    np.testing.assert_allclose(got_ta, want_ta, rtol=1e-6, atol=1e-6)

    # time-dependent parameter MIXING: segment-indexed exact planes
    model_t_mix = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * (p[1] + 0.001 * t), p[1]]
        ),
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    got_tmix = log_likelihood_matrix(
        model_t_mix, Data([subj()]), sp, ems, engine="pallas"
    )
    want_tmix = log_likelihood_matrix(model_t_mix, Data([subj()]), sp, ems)
    np.testing.assert_allclose(got_tmix, want_tmix, rtol=1e-6, atol=1e-6)

    # covariate read in out() -> rejection
    model_out = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / (p[1] * cov("wt", t) / 70.0),
        nstates=1, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="out\\(\\) reads a covariate"):
        log_likelihood_matrix(model_out, Data([subj()]), sp, ems, engine="pallas")

    # 3-cmt + covariate-free seq: round-3 chain-depth levels carry it
    model_3 = Analytical(
        pst.three_compartments,
        seq_eq=lambda p, t, cov: p,
        out=lambda x, p, t, cov: x[0:1] / p[5],
        nstates=3, ndrugs=1, nout=1,
    )
    sp6 = np.abs(np.random.RandomState(1).randn(4, 6)) + 0.1
    got_3 = log_likelihood_matrix(
        model_3, Data([subj()]), sp6, ems, engine="pallas"
    )
    want_3 = log_likelihood_matrix(model_3, Data([subj()]), sp6, ems)
    np.testing.assert_allclose(got_3, want_3, rtol=1e-6, atol=1e-6)

    # 3-cmt + covariate-READING seq over a constant covariate: per-(row,
    # support) parameter planes with per-level XLA eigen prep carry it
    model_3c = Analytical(
        pst.three_compartments,
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * cov("wt", t) / 70.0, p[1], p[2], p[3], p[4], p[5]]
        ),
        out=lambda x, p, t, cov: x[0:1] / p[5],
        nstates=3, ndrugs=1, nout=1,
    )
    got_3c = log_likelihood_matrix(
        model_3c, Data([subj()]), sp6, ems, engine="pallas"
    )
    want_3c = log_likelihood_matrix(model_3c, Data([subj()]), sp6, ems)
    np.testing.assert_allclose(got_3c, want_3c, rtol=1e-6, atol=1e-6)

    # ... and over a time-VARYING covariate the segment-indexed planes
    # (per-slot eigen prep) carry it exactly too
    got_3c_tv = log_likelihood_matrix(
        model_3c, Data([subj(tv=True)]), sp6, ems, engine="pallas"
    )
    want_3c_tv = log_likelihood_matrix(
        model_3c, Data([subj(tv=True)]), sp6, ems
    )
    np.testing.assert_allclose(got_3c_tv, want_3c_tv, rtol=1e-6, atol=1e-6)


def test_pallas_engine_seq_without_covariates():
    """A parameter-only multiplicative seq also rides the kernel."""
    rng = np.random.RandomState(9)
    subjects = []
    for i in range(SUB_TILE):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (1.0, 4.0, 12.0):
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())

    model = Analytical(
        pst.one_compartment_with_absorption,
        seq_eq=lambda p, t, cov: jnp.stack([p[0] * 1.5, p[1], p[2]]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(np.array([[1.2, 0.15, 10.0]]) * (1.0 + 0.2 * rng.randn(SP_TILE, 3)))
    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    got = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=5e-8, atol=1e-8)


def test_pallas_sharded_covariate_mult_stream():
    """The per-row multiplier stream shards over the subjects axis."""
    import jax

    from pharmsol_tpu.parallel.mesh import (
        log_likelihood_matrix_sharded, population_mesh,
    )

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    rng = np.random.RandomState(11)
    subjects = []
    for i in range(8):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        b = b.covariate("wt", 0.0, 55.0 + 3.0 * i)
        for t in (1.0, 4.0, 12.0):
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())

    def seq(p, t, cov):
        scale = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * scale, p[1]])

    model = Analytical(
        pst.one_compartment, seq_eq=seq,
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(np.array([[0.15, 10.0]]) * (1.0 + 0.2 * rng.randn(SP_TILE, 2)))

    want = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    mesh = population_mesh(shape=(4, 2))
    got = log_likelihood_matrix_sharded(
        model, Data(subjects), support, ems, mesh=mesh, engine="pallas"
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_pallas_engine_seq_infusion_compounding_parity():
    """Seq carry across infusion-end sub-splits must match the engine.

    Regression: the per-row multiplier path applied g once per occasion,
    but the engine (reference parity: analytical/mod.rs:331,360) compounds
    the seq across infusion-end sub-splits — a 0.17 log-lik discrepancy on
    infusion regimens. Per-segment multiplier streams bake the reset/carry
    chain in host-side.
    """
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    rng = np.random.RandomState(3)
    subs = []
    for i in range(4):
        b = (Subject.builder(f"s{i}")
             .infusion(0.0, 100.0, 0, 2.0)
             .covariate("wt", 0.0, 60.0 + 5 * i))
        for t in (1.0, 3.0, 8.0):
            b = b.observation(float(t), float(abs(4 + rng.randn())), 0)
        subs.append(b.build())

    def seq(p, t, cov):
        sc = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * sc, p[1]])

    m = Analytical(pst.one_compartment, seq_eq=seq,
                   out=lambda x, p, t, cov: x[:1] / p[1],
                   nstates=1, ndrugs=1, nout=1)
    sp = np.abs(np.array([[0.15, 10.0], [0.2, 12.0]]))
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(m, Data(subs), sp, ems)
    got = log_likelihood_matrix(m, Data(subs), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pallas_engine_time_varying_covariates_parity():
    """Time-varying covariates ride per-segment multiplier streams."""
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    rng = np.random.RandomState(4)
    subs = []
    for i in range(6):
        b = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
             .infusion(2.0, 50.0, 0, 1.5)
             .covariate("wt", 0.0, 80.0 - 2 * i)
             .covariate("wt", 12.0, 60.0 + i)
             .covariate("crcl", 0.0, 90.0 + 3 * i))
        for t in (0.5, 1.0, 3.0, 6.0, 12.0):
            b = b.observation(float(t), float(abs(5 + rng.randn())), 0)
        b = b.censored_observation(24.0, 0.5, 0, Censor.BLOQ)
        subs.append(b.build())

    def seq(p, t, cov):
        sc = (cov("wt", t) / 70.0) ** 0.75
        rc = cov("crcl", t) / 100.0
        return jnp.stack([p[0] * sc * rc, p[1], p[2] * sc, p[3] * sc, p[4]])

    m = Analytical(pst.two_compartments_with_absorption, seq_eq=seq,
                   out=lambda x, p, t, cov: x[1:2] / p[4],
                   nstates=3, ndrugs=1, nout=1)
    sp = np.abs(np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
                * (1.0 + 0.2 * rng.randn(8, 5)))
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(m, Data(subs), sp, ems)
    got = log_likelihood_matrix(m, Data(subs), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # CL-variant: the in-kernel remap must act on per-segment effective params
    def seq_cl(p, t, cov):
        sc = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * sc, p[1] * sc, p[2]])

    mcl = Analytical(pst.one_compartment_cl, seq_eq=seq_cl,
                     out=lambda x, p, t, cov: x[:1] / p[2],
                     nstates=1, ndrugs=1, nout=1)
    sp3 = np.abs(np.array([3.0, 25.0, 25.0])[None, :]
                 * (1.0 + 0.2 * rng.randn(8, 3)))
    want = log_likelihood_matrix(mcl, Data(subs), sp3, ems)
    got = log_likelihood_matrix(mcl, Data(subs), sp3, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pallas_engine_declarative_model():
    """Declarative analytical models ride the kernel via anchored kernel
    support + multiplier streams (derive reorders/scales declared params)."""
    from pharmsol_tpu import Route, analytical_model
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    am = analytical_model(
        structure="one_compartment_with_absorption",
        parameters=["ka", "ke0", "v"], covariates=["wt"],
        states=["gut", "central"], outputs=["cp"],
        routes=[Route.bolus("oral").to_state("gut")],
        derive=lambda p, t, cov: {"ke": p.ke0 * (cov.wt / 70.0) ** 0.75},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )
    rng = np.random.RandomState(5)
    subs = []
    for i in range(4):
        b = (Subject.builder(f"q{i}").bolus(0.0, 500.0, "oral")
             .covariate("wt", 0.0, 70.0 + 2 * i)
             .covariate("wt", 12.0, 60.0 + i))  # time-varying
        for t in (1.0, 2.0, 6.0, 12.0):
            b = b.observation(float(t), float(abs(2 + rng.randn())), "cp")
        subs.append(b.build())
    sp = np.abs(np.array([1.2, 0.08, 190.0])[None, :] * (1 + 0.2 * rng.randn(6, 3)))
    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(am, Data(subs), sp, ems)
    got = log_likelihood_matrix(am, Data(subs), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pallas_engine_dsl_model():
    """DSL-compiled analytical models ride the kernel the same way, and a
    covariate-reading out() is still rejected."""
    import pytest
    from pharmsol_tpu.dsl import compile_model
    from pharmsol_tpu.errors import PharmsolError
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    rt = compile_model("""
name = m
kind = analytical
params = ka, ke0, v
covariates = wt
states = gut, central
derived = ke
outputs = cp
bolus(oral) -> gut
ke = ke0 * (wt / 70.0) ^ 0.75
structure = one_compartment_with_absorption
out(cp) = central / v
""")
    m = rt.model if hasattr(rt, "model") else rt
    rng = np.random.RandomState(6)
    subs = []
    for i in range(4):
        b = (Subject.builder(f"q{i}").bolus(0.0, 500.0, "oral")
             .covariate("wt", 0.0, 70.0 + 2 * i)
             .covariate("wt", 12.0, 60.0 + i))
        for t in (1.0, 2.0, 6.0, 12.0):
            b = b.observation(float(t), float(abs(2 + rng.randn())), "cp")
        subs.append(b.build())
    sp = np.abs(np.array([1.2, 0.08, 190.0])[None, :] * (1 + 0.2 * rng.randn(6, 3)))
    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(m, Data(subs), sp, ems)
    got = log_likelihood_matrix(m, Data(subs), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    rt_bad = compile_model("""
name = m2
kind = analytical
params = ka, ke0, v
covariates = wt
states = gut, central
derived = ke
outputs = cp
bolus(oral) -> gut
ke = ke0
structure = one_compartment_with_absorption
out(cp) = central / (v * wt / 70.0)
""")
    m_bad = rt_bad.model if hasattr(rt_bad, "model") else rt_bad
    with pytest.raises(PharmsolError, match="out\\(\\) reads a covariate"):
        log_likelihood_matrix(m_bad, Data(subs), sp, ems, engine="pallas")


def test_pallas_sharded_covariate_mult_seg_stream():
    """The 3D per-SEGMENT multiplier stream shards over subjects too."""
    import jax

    from pharmsol_tpu.parallel.mesh import (
        log_likelihood_matrix_sharded, population_mesh,
    )

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    rng = np.random.RandomState(12)
    subjects = []
    for i in range(8):
        b = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
             .infusion(2.0, 40.0, 0, 1.0)
             .covariate("wt", 0.0, 55.0 + 3.0 * i)
             .covariate("wt", 12.0, 60.0 + i))
        for t in (1.0, 4.0, 12.0):
            b = b.observation(float(t), float(np.abs(4 + rng.randn())), 0)
        subjects.append(b.build())

    def seq(p, t, cov):
        scale = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * scale, p[1]])

    model = Analytical(
        pst.one_compartment, seq_eq=seq,
        out=lambda x, p, t, cov: x[0:1] / p[1], nstates=1, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(np.array([[0.15, 10.0]]) * (1.0 + 0.2 * rng.randn(SP_TILE, 2)))

    want = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    mesh = population_mesh(shape=(4, 2))
    got = log_likelihood_matrix_sharded(
        model, Data(subjects), support, ems, mesh=mesh, engine="pallas"
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def _seq_subjects(n=8, with_cov=False, with_inf=True):
    out = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        if with_inf and i % 3 == 0:
            sb = sb.infusion(2.0, 50.0, 0, 1.0)
        if with_cov:
            sb = sb.covariate("wt", 0.0, 55.0 + 4.0 * i)
        for t in (0.5, 1.5, 3.0, 6.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        out.append(sb.build())
    return Data(out)


def _seq_check(model, data, sp, tol=1e-9):
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    x = log_likelihood_matrix(model, data, sp, ems, engine="xla")
    p = log_likelihood_matrix(model, data, sp, ems, engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    assert err < tol, err


def test_pallas_engine_additive_cov_seq_segment_mode():
    # additive covariate effect -> affine per-segment streams (offsets ride
    # along the multiplier streams; infusion sub-splits compound the chain)
    rng = np.random.RandomState(21)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] + 0.001 * cov("wt", t), p[2]]
        ),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True), sp)


def test_pallas_engine_additive_cov_seq_row_mode():
    # no infusions + time-constant covariates -> the cheaper per-row
    # affine decomposition
    rng = np.random.RandomState(22)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] + 0.001 * cov("wt", t), p[2]]
        ),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True, with_inf=False), sp)


def test_pallas_engine_parameter_mixing_seq_levels():
    # non-separable seq (reads other parameters): the chain-depth level
    # scheme is exact for any covariate-free time-independent form
    rng = np.random.RandomState(23)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (1.0 + 0.1 * p[2]), p[1] + 0.02 * p[0], p[2], p[3],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(), sp)


def test_pallas_engine_three_cmt_seq_levels():
    # 3-cmt + seq: level tables with per-level XLA eigen preparation
    rng = np.random.RandomState(24)
    model = Analytical(
        pst.three_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[5],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * 1.1, p[1], p[2] * 0.95, p[3], p[4], p[5],
        ]),
        nstates=3, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.15, 0.35, 12),
        rng.uniform(0.05, 0.2, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(0.05, 0.15, 12), rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(), sp)


def test_pallas_engine_covariate_mixing_seq_planes():
    # true parameter x covariate mixing (allometric scaling with an
    # ESTIMATED exponent): exact per-(row, support) parameter planes;
    # infusion sub-splits compound the chain -> multi-level planes
    rng = np.random.RandomState(26)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[4],
            p[1] / (1.0 + p[2] * cov("wt", t) / 700.0),
            p[2], p[3], p[4],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True), sp)


def test_pallas_engine_covariate_mixing_seq_planes_row_only():
    # no infusions: single-level planes (depth 1 everywhere)
    rng = np.random.RandomState(27)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * jnp.exp(-p[1] * cov("wt", t) / 200.0),
            p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True, with_inf=False), sp)


def test_pallas_engine_three_cmt_covariate_seq_planes():
    # 3-cmt + covariate-dependent non-affine seq: planes with per-level
    # eigen preparation on [R, S] tensors
    rng = np.random.RandomState(28)
    model = Analytical(
        pst.three_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[5],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[2],
            p[1], p[2] * 0.95, p[3], p[4], p[5],
        ]),
        nstates=3, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.15, 0.35, 12),
        rng.uniform(0.05, 0.2, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(0.05, 0.15, 12), rng.uniform(8, 15, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True), sp)


def test_pallas_engine_cl_covariate_seq_planes():
    # CL-parameterized structure: the micro-constant remap applies to the
    # planes host-side, per level
    rng = np.random.RandomState(29)
    model = Analytical(
        pst.two_compartments_cl,
        out=lambda x, p, t, cov: x[0:1] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * p[1] * (cov("wt", t) / 700.0),
            p[1], p[2], p[3],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(1.0, 3.0, 12), rng.uniform(2.0, 5.0, 12),
        rng.uniform(8, 15, 12), rng.uniform(20, 40, 12),
    ])
    _seq_check(model, _seq_subjects(with_cov=True), sp)


def test_pallas_engine_lag_with_depth1_seq():
    # lag + depth-1 seq (levels or planes): the seq reset a lag-shifted
    # dose inserts is a no-op at chain depth 1, so the fast path holds
    rng = np.random.RandomState(30)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * p[1] * cov("wt", t) / 700.0, p[1], p[2]]
        ),
        lag=lambda p, t, cov: {0: p[2]},
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = (Subject.builder(f"s{i}")
              .bolus(0.0, 100.0, 0).bolus(12.0, 80.0, 0)
              .covariate("wt", 0.0, 55.0 + 4.0 * i))
        for t in (0.5, 1.5, 3.0, 6.0, 10.0, 13.0, 16.0):
            sb = sb.observation(t, float(4 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.0, 1.5, 12),
    ])
    _seq_check(model, Data(subjects), sp)


def _lag_depth_subjects(n=8, lag_crosses_infusion=True):
    """Bolus + infusion regimens where inf-end sub-splits compound the seq
    chain to depth > 1 and the (support-dependent) lag pushes dose fires
    across observations and — for some subjects — across the infusion-end
    boundary itself."""
    out = []
    for i in range(n):
        sb = (Subject.builder(f"s{i}")
              .bolus(0.0, 100.0, 0)
              .infusion(1.0, 50.0, 0, 1.5)
              .covariate("wt", 0.0, 55.0 + 4.0 * i))
        if lag_crosses_infusion and i % 2 == 0:
            # second bolus whose lag can fire inside the post-infusion
            # compounded region
            sb = sb.bolus(2.0, 60.0, 0)
        for t in (0.5, 1.2, 2.1, 3.0, 4.5, 6.0, 10.0):
            sb = sb.observation(t, float(5 * np.exp(-0.2 * t) + 0.05 * i), 0)
        out.append(sb.build())
    return Data(out)


def test_pallas_engine_lag_with_seq_depth_gt1_levels():
    # lag + covariate-free seq with infusion-end compounding (chain depth
    # > 1): the in-kernel depth counter + split-march fire must replay the
    # engine's per-lane reset exactly (the fire moves the seq-reset
    # breakpoint to the support-dependent shifted dose time)
    rng = np.random.RandomState(31)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * (1.0 + 0.15 * p[2]), p[1], p[2]]
        ),
        lag=lambda p, t, cov: {0: p[2]},
        nstates=1, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.0, 1.8, 12),
    ])
    _seq_check(model, _lag_depth_subjects(), sp)


def test_pallas_engine_lag_with_seq_depth_gt1_planes():
    # lag + covariate-DEPENDENT seq (per-(row, support) planes) at chain
    # depth > 1: fires select depth-1 planes per lane
    rng = np.random.RandomState(32)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[2], p[1], p[2],
        ]),
        lag=lambda p, t, cov: {0: 1.2 * p[2]},
        nstates=1, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.2, 1.2, 12),
    ])
    _seq_check(model, _lag_depth_subjects(), sp)


def test_pallas_engine_lag_fa_with_seq_depth_gt1():
    # lag + fa + depth>1 seq on a 2-cmt absorption structure: fa scales the
    # pending amount at park time; the split march handles the reset
    rng = np.random.RandomState(33)
    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0], p[1] * (1.0 + 0.1 * p[5]), p[2], p[3], p[4], p[5],
        ]),
        lag=lambda p, t, cov: {0: p[5]},
        fa=lambda p, t, cov: {0: 1.0 / (1.0 + 0.3 * p[5])},
        nstates=3, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.05, 0.2, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.0, 1.5, 12),
    ])
    _seq_check(model, _lag_depth_subjects(lag_crosses_infusion=False), sp)


def test_pallas_engine_lag_depth_zero_lag_lanes_match_plain():
    # a lag closure that is zero on some support lanes and positive on
    # others: zero-lag lanes fire at offset 0 of their bolus column (the
    # bolus IS the reset there), positive lanes fire later — both must
    # match the engine within one psi call
    rng = np.random.RandomState(34)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * (1.0 + 0.2 * p[2]), p[1], p[2]]
        ),
        lag=lambda p, t, cov: {0: jnp.maximum(p[2] - 0.5, 0.0)},
        nstates=1, ndrugs=1, nout=1,
    )
    lag_col = np.concatenate([
        np.zeros(4), rng.uniform(0.6, 1.9, 8),  # mix of zero/positive lag
    ])
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12), lag_col,
    ])
    _seq_check(model, _lag_depth_subjects(), sp)


def test_pallas_engine_lag_fa_planes():
    # lag shifts doses across observations (pending-dose mechanism); fa
    # scales amounts; both per (row, support)
    rng = np.random.RandomState(25)
    model = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        lag=lambda p, t, cov: {0: p[5]},
        fa=lambda p, t, cov: {0: p[6]},
        nstates=3, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0).bolus(12.0, 80.0, 0)
        if i % 4 == 0:
            sb = sb.infusion(3.0, 50.0, 0, 1.5)
        for t in (0.3, 0.7, 1.5, 2.5, 5.0, 9.0, 12.5, 14.0, 20.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.8, 2.0, 12),
        rng.uniform(0.2, 0.4, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.0, 1.2, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _seq_check(model, Data(subjects), sp)


def test_pallas_engine_time_dependent_lag_fa():
    # time-dependent closures ride exact per-DOSE-SEGMENT planes selected
    # by static slot tables (lag evaluated at each dose's ORIGINAL time,
    # fa at the lag-shifted time — structs.rs:629 semantics)
    rng = np.random.RandomState(33)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        lag=lambda p, t, cov: {0: p[3] * (1.0 + 0.04 * t)},
        fa=lambda p, t, cov: {0: p[4] / (1.0 + 0.02 * t)},
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0).bolus(12.0, 80.0, 0)
        for t in (0.5, 1.5, 3.0, 6.0, 10.0, 13.0, 16.0):
            sb = sb.observation(t, float(4 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.0, 1.0, 12),
        rng.uniform(0.4, 0.9, 12),
    ])
    _seq_check(model, Data(subjects), sp)


def test_pallas_engine_lag_reading_varying_covariate():
    # a lag/fa closure that READS a time-varying covariate: each dose's
    # plane is evaluated host-side with the engine's CovView at that
    # dose's time — exact, not approximated
    rng = np.random.RandomState(35)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        lag=lambda p, t, cov: {0: p[3] * cov("meal", t)},
        fa=lambda p, t, cov: {0: p[4] * (2.0 - cov("meal", t)) / 2.0},
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = (Subject.builder(f"s{i}")
              .bolus(0.0, 100.0, 0).bolus(12.0, 80.0, 0)
              .covariate("meal!", 0.0, 1.0)
              .covariate("meal!", 6.0, 0.4 + 0.05 * i))
        for t in (0.5, 1.5, 3.0, 6.0, 10.0, 13.0, 16.0):
            sb = sb.observation(t, float(4 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.0, 1.2, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _seq_check(model, Data(subjects), sp)


def test_pallas_engine_dynamic_fa_only():
    # fa-only dynamic closure (no lag): doses apply immediately with the
    # per-dose-segment scale
    rng = np.random.RandomState(37)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        fa=lambda p, t, cov: {0: p[2] / (1.0 + 0.1 * t)},
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0).bolus(8.0, 60.0, 0)
        for t in (1.0, 3.0, 6.0, 9.0, 14.0):
            sb = sb.observation(t, float(4 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.4, 1.0, 12),
    ])
    _seq_check(model, Data(subjects), sp)


def test_pallas_engine_dynamic_lag_overlap_rejected():
    import pytest

    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        lag=lambda p, t, cov: {0: p[2] * (1.0 + t)},
        nstates=1, ndrugs=1, nout=1,
    )
    s = (Subject.builder("s0").bolus(0.0, 50.0, 0).bolus(1.0, 50.0, 0)
         .observation(6.0, 1.0, 0).build())
    sp = np.array([[0.2, 10.0, 3.0], [0.3, 12.0, 0.2]])
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    with pytest.raises(Exception, match="lag"):
        log_likelihood_matrix(model, Data([s]), sp, ems, engine="pallas")


def test_pallas_engine_lag_overlap_rejected():
    import pytest

    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        lag=lambda p, t, cov: {0: p[2]},
        nstates=1, ndrugs=1, nout=1,
    )
    # doses 1.0 apart but lag up to 3.0 -> two doses pending at once
    s = (Subject.builder("s0").bolus(0.0, 50.0, 0).bolus(1.0, 50.0, 0)
         .observation(6.0, 1.0, 0).build())
    sp = np.array([[0.2, 10.0, 3.0], [0.3, 12.0, 0.2]])
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    with pytest.raises(Exception, match="lag"):
        log_likelihood_matrix(model, Data([s]), sp, ems, engine="pallas")


def test_pallas_engine_declarative_additive_derive():
    """Declarative derive with an ADDITIVE covariate term rides the
    anchored AFFINE decomposition (round 3)."""
    from pharmsol_tpu import Route, analytical_model
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    am = analytical_model(
        structure="one_compartment_with_absorption",
        parameters=["ka", "ke0", "v"], covariates=["crcl"],
        states=["gut", "central"], outputs=["cp"],
        routes=[Route.bolus("oral").to_state("gut")],
        # renal + non-renal elimination: ke = ke0 + slope * CrCl (additive)
        derive=lambda p, t, cov: {"ke": p.ke0 + 0.0008 * cov.crcl},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )
    rng = np.random.RandomState(11)
    subs = []
    for i in range(4):
        b = (Subject.builder(f"r{i}").bolus(0.0, 500.0, "oral")
             .covariate("crcl", 0.0, 60.0 + 10.0 * i))
        for t in (1.0, 2.0, 6.0, 12.0):
            b = b.observation(float(t), float(abs(2 + rng.randn())), "cp")
        subs.append(b.build())
    sp = np.abs(np.array([1.2, 0.05, 190.0])[None, :] * (1 + 0.2 * rng.randn(6, 3)))
    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(am, Data(subs), sp, ems)
    got = log_likelihood_matrix(am, Data(subs), sp, ems, engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pallas_psi_init_equation_parity():
    # covariate-independent init -> per-support initial-state rows applied
    # on occasion-0 rows; parity vs the XLA engine
    model = Analytical(
        pst.one_compartment_with_absorption,
        init=lambda p, t, cov: jnp.stack([0.5 * p[2], 2.0 + 0.1 * p[2]]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0):
            b = b.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subjects.append(b.build())
    rng = np.random.RandomState(7)
    support = np.abs(np.array([1.0, 0.2, 30.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(12, 3)))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems,
                                 engine="xla")
    got = log_likelihood_matrix(model, Data(subjects), support, ems,
                                engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_pallas_psi_init_occasion0_only():
    # init applies only to occasion index 0; a reset occasion starts at
    # zero state (engine/sim.py:147, analytical/mod.rs:408-426)
    model = Analytical(
        pst.one_compartment,
        init=lambda p, t, cov: jnp.stack([3.0 / p[1] + 0.0 * p[0]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(4):
        b = Subject.builder(f"s{i}").bolus(0.0, 50.0, 0)
        for t in (1.0, 3.0):
            b = b.observation(t, 2.0 + 0.1 * i, 0)
        b = b.reset().bolus(0.0, 40.0, 0)
        for t in (1.0, 4.0):
            b = b.observation(t, 1.5, 0)
        subjects.append(b.build())
    rng = np.random.RandomState(11)
    support = np.abs(np.array([0.3, 20.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(8, 2)))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems,
                                 engine="xla")
    got = log_likelihood_matrix(model, Data(subjects), support, ems,
                                engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_pallas_psi_covariate_dependent_init_parity():
    # init reads a covariate: rides per-(row, support) init planes
    model = Analytical(
        pst.one_compartment,
        init=lambda p, t, cov: jnp.stack([cov("wt", 0.0) / p[1]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        b = (Subject.builder(f"s{i}").bolus(0.0, 50.0, 0)
             .covariate("wt", 0.0, 55.0 + 6.0 * i)
             .observation(1.0, 2.0 + 0.1 * i, 0).observation(3.0, 1.0, 0))
        subjects.append(b.build())
    rng = np.random.RandomState(13)
    support = np.abs(np.array([0.3, 20.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(12, 2)))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    want = log_likelihood_matrix(model, Data(subjects), support, ems,
                                 engine="xla")
    got = log_likelihood_matrix(model, Data(subjects), support, ems,
                                engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_pallas_psi_init_composes_with_seq_multiplier():
    # init rows (support-axis) + per-row covariate multiplier streams must
    # coexist: exercises the full stream ordering (mult -> init-mask ->
    # params -> coef -> init rows)
    rng = np.random.RandomState(9)
    subjects = []
    for i in range(SUB_TILE):
        b = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
             .covariate("wt", 0.0, 55.0 + 5.0 * i))
        for t in (0.5, 1.0, 2.0, 4.0, 8.0):
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        subjects.append(b.build())

    def seq(p, t, cov):
        scale = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * scale, p[1] * scale, p[2]])

    model = Analytical(
        pst.one_compartment_with_absorption,
        seq_eq=seq,
        init=lambda p, t, cov: jnp.stack([0.0 * p[2], 1.5 + 0.05 * p[2]]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(np.array([1.0, 0.2, 30.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(SP_TILE, 3)))
    want = log_likelihood_matrix(model, Data(subjects), support, ems,
                                 engine="xla")
    got = log_likelihood_matrix(model, Data(subjects), support, ems,
                                engine="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
