"""Data layer: row ingestion, Pmetrics CSV, AUC primitives, expand."""

import io
import math

import numpy as np
import pytest

from pharmsol_tpu import Censor, Data, Subject
from pharmsol_tpu.data.auc import auc, auc_interval, aumc, interpolate_linear
from pharmsol_tpu.data.event import AUCMethod, Bolus, Infusion, Observation
from pharmsol_tpu.data.pmetrics import read_pmetrics, write_pmetrics
from pharmsol_tpu.data.row import DataRow, build_data


def test_datarow_addl_forward():
    row = DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input("iv").addl(2).ii(24.0).build()
    events = row.into_events()
    assert len(events) == 3
    assert [e.time for e in events] == [24.0, 48.0, 0.0]


def test_datarow_addl_backward():
    row = DataRow.builder("pt1", 0.0).evid(1).dose(600.0).input("1").addl(-10).ii(12.0).build()
    events = row.into_events()
    assert len(events) == 11
    assert min(e.time for e in events) == -120.0


def test_datarow_infusion_when_dur_positive():
    row = DataRow.builder("p", 1.0).evid(1).dose(50.0).dur(2.0).input("iv").build()
    (ev,) = row.into_events()
    assert isinstance(ev, Infusion)
    assert ev.duration == 2.0


def test_datarow_missing_fields_raise():
    with pytest.raises(Exception):
        DataRow.builder("p", 0.0).evid(0).build().into_events()  # missing outeq
    with pytest.raises(Exception):
        DataRow.builder("p", 0.0).evid(1).dose(1.0).build().into_events()  # missing input
    with pytest.raises(Exception):
        DataRow.builder("p", 0.0).evid(7).build().into_events()  # unknown evid


def test_build_data_occasion_split():
    rows = [
        DataRow.builder("s", 0.0).evid(1).dose(100.0).input("0").build(),
        DataRow.builder("s", 1.0).evid(0).out(5.0).outeq("0").build(),
        DataRow.builder("s", 24.0).evid(4).dose(50.0).input("0").build(),
        DataRow.builder("s", 25.0).evid(0).out(3.0).outeq("0").build(),
    ]
    data = build_data(rows)
    subject = data.get_subject("s")
    assert len(subject.occasions()) == 2
    assert subject.occasions()[0].index == 0
    assert subject.occasions()[1].index == 1
    assert len(subject.occasions()[1].boluses()) == 1


PMETRICS_CSV = """ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3,WT,AGE!
1,1,0,0,600,.,.,1,.,.,.,.,.,.,70.0,35
1,0,9,.,.,.,.,.,100,1,0.1,0.05,0,0,70.0,35
1,0,24,.,.,.,.,.,-99,1,.,.,.,.,72.0,35
2,1,0,2.0,600,.,.,1,.,.,.,.,.,.,65.0,40
2,0,12,.,.,.,.,.,95,1,.,.,.,.,65.0,40
"""


def test_read_pmetrics():
    data = read_pmetrics(io.StringIO(PMETRICS_CSV))
    assert len(data) == 2
    s1 = data.get_subject("1")
    occ = s1.occasions()[0]
    assert len(occ.boluses()) == 1
    obs = occ.observations()
    assert obs[0].value == 100.0
    assert obs[0].errorpoly == (0.1, 0.05, 0.0, 0.0)
    assert obs[1].value is None  # OUT=-99 -> missing
    # covariates: WT linear, AGE! fixed (carry-forward)
    wt = occ.covariates.get("wt")
    assert wt is not None and not wt.fixed
    assert abs(wt.interpolate(16.5) - 71.0) < 1e-12
    age = occ.covariates.get("age")
    assert age is not None and age.fixed
    # subject 2: DUR=2 -> infusion
    s2 = data.get_subject("2")
    assert len(s2.occasions()[0].infusions()) == 1


def test_pmetrics_roundtrip():
    data = read_pmetrics(io.StringIO(PMETRICS_CSV))
    buf = io.StringIO()
    write_pmetrics(data, buf)
    buf.seek(0)
    data2 = read_pmetrics(buf)
    assert len(data2) == len(data)
    s1a = data.get_subject("1").occasions()[0]
    s1b = data2.get_subject("1").occasions()[0]
    assert len(s1a.events) == len(s1b.events)
    assert [e.time for e in s1a.events] == [e.time for e in s1b.events]


def test_auc_linear_doc_example():
    # auc.rs doc: times [0,1,2,4], concs [0,10,8,4] -> 26.0
    assert abs(auc([0.0, 1.0, 2.0, 4.0], [0.0, 10.0, 8.0, 4.0], AUCMethod.LINEAR) - 26.0) < 1e-10


def test_auc_interval_doc_example():
    # auc.rs doc: partial over [1, 4] of [0,1,2,4,8]/[0,10,8,4,2] -> 21.0
    t = [0.0, 1.0, 2.0, 4.0, 8.0]
    c = [0.0, 10.0, 8.0, 4.0, 2.0]
    assert abs(auc_interval(t, c, 1.0, 4.0, AUCMethod.LINEAR) - 21.0) < 1e-10


def test_interpolate_linear_doc_example():
    t = [0.0, 2.0, 4.0]
    v = [0.0, 10.0, 6.0]
    assert abs(interpolate_linear(t, v, 1.0) - 5.0) < 1e-10
    assert abs(interpolate_linear(t, v, 3.0) - 8.0) < 1e-10
    assert interpolate_linear(t, v, -1.0) == 0.0  # clamp below
    assert interpolate_linear(t, v, 9.0) == 6.0  # clamp above


def test_auc_lin_up_log_down_exact():
    # descending exponential segment: exact log-trapezoid
    c1, c2, dt = 10.0, 5.0, 2.0
    want = (c1 - c2) * dt / math.log(c1 / c2)
    got = auc([0.0, 2.0], [c1, c2], AUCMethod.LIN_UP_LOG_DOWN)
    assert abs(got - want) < 1e-12
    # ascending segment falls back to linear
    got_up = auc([0.0, 2.0], [5.0, 10.0], AUCMethod.LIN_UP_LOG_DOWN)
    assert abs(got_up - 15.0) < 1e-12


def test_aumc_log_pknca_formula():
    t1, c1, t2, c2 = 1.0, 10.0, 3.0, 4.0
    dt = t2 - t1
    k = math.log(c1 / c2) / dt
    want = (t1 * c1 - t2 * c2) / k + (c1 - c2) / (k * k)
    got = aumc([t1, t2], [c1, c2], AUCMethod.LIN_UP_LOG_DOWN)
    assert abs(got - want) < 1e-12


def test_lin_log_uses_linear_before_tmax():
    # peak at t=2; ascending segments linear, descending log
    t = [0.0, 2.0, 4.0]
    c = [2.0, 10.0, 5.0]
    got = auc(t, c, AUCMethod.LIN_LOG)
    want = (2.0 + 10.0) / 2.0 * 2.0 + (10.0 - 5.0) * 2.0 / math.log(2.0)
    assert abs(got - want) < 1e-12


def test_expand_dense_grid():
    subject = (
        Subject.builder("s")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, 5.0, 0)
        .build()
    )
    data = Data([subject]).expand(0.5, 1.0)
    occ = data.get_subject("s").occasions()[0]
    times = [o.time for o in occ.observations()]
    # grid at 0, 0.5, 1.0 (existing kept, not duplicated) up to last dose + tad
    assert times == [0.0, 0.5, 1.0]
    values = [o.value for o in occ.observations()]
    assert values == [None, None, 5.0]


def test_pmetrics_hash_header():
    """Standard Pmetrics files start the header with `#ID` (review fix)."""
    csv_text = "#ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3\n" \
               "1,1,0,0,600,.,.,1,.,.,.,.,.,.\n" \
               "# a comment line\n" \
               "1,0,9,.,.,.,.,.,100,1,.,.,.,.\n"
    data = read_pmetrics(io.StringIO(csv_text))
    s = data.get_subject("1")
    assert len(s.occasions()[0].boluses()) == 1
    assert len(s.occasions()[0].observations()) == 1


def test_subject_hash_distinguishes_censoring_and_errorpoly():
    base = Subject.builder("h").bolus(0, 100, 0).observation(1.0, 5.0, 0).build()
    bloq = (
        Subject.builder("h").bolus(0, 100, 0)
        .censored_observation(1.0, 5.0, 0, Censor.BLOQ).build()
    )
    poly = (
        Subject.builder("h").bolus(0, 100, 0)
        .observation_with_error(1.0, 5.0, 0, (0.1, 0, 0, 0)).build()
    )
    assert base.hash() != bloq.hash()
    assert base.hash() != poly.hash()
    assert bloq.hash() != poly.hash()


def test_batch_lowering_matches_per_occasion_oracle():
    """lower_population's vectorized batch path == lower_occasion per row."""
    import jax
    from pharmsol_tpu.data.covariate import Covariate, CovariateSegment
    from pharmsol_tpu.engine.grid import lower_occasion, lower_population

    b1 = (
        Subject.builder("g1")
        .bolus(0.0, 100.0, 0)
        .infusion(2.0, 50.0, 1, 4.0)
        .observation(1.0, 5.0, 0)
        .observation_with_error(3.0, 4.0, 1, (0.1, 0.2, 0.0, 0.0))
        .censored_observation(6.0, 0.5, 0, Censor.BLOQ)
        .missing_observation(8.0, 0)
        .covariate("wt", 0.0, 70.0)
        .covariate("wt", 12.0, 72.0)
        .reset()
        .bolus(0.0, 60.0, 1)
        .observation(2.0, 3.0, 1)
        .build()
    )
    b2 = (
        Subject.builder("g2")
        .infusion(0.0, 200.0, 0, 1.0)
        .observation(0.5, 9.0, 0)
        .build()
    )
    subjects = [b1, b2]
    rin = lambda label, kind: int(label)
    rout = lambda label: int(label)
    cov_names = ["wt"]

    grid = lower_population(subjects, rin, rout, cov_names)
    occs = [(si, s.id, occ) for si, s in enumerate(subjects) for occ in s.occasions()]
    NB = grid.rows.bolus_t.shape[1]
    NI = grid.rows.inf_t.shape[1]
    NO = grid.rows.obs_t.shape[1]
    K = grid.rows.cov_t.shape[2]
    oracle = [
        lower_occasion(occ, sid, rin, rout, cov_names, NB, NI, NO, K)
        for _, sid, occ in occs
    ]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *[l.arrays for l in oracle]
    )
    for name, got, want in zip(stacked._fields, grid.rows, stacked):
        np.testing.assert_array_equal(got, want, err_msg=name)
    assert list(grid.n_obs_per_row) == [l.n_obs for l in oracle]
    assert list(grid.row_subject) == [si for si, _, _ in occs]


def test_subject_hash_invalidates_on_occasion_mutation():
    """Memoized hash must track mutations through the Occasion API."""
    s = Subject.builder("h2").bolus(0, 100, 0).observation(1.0, 5.0, 0).build()
    h1 = s.hash()
    assert s.hash() == h1  # memoized
    s.get_occasion(0).add_observation(5.0, 2.0, 0)
    assert s.hash() != h1
