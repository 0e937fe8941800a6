"""Optimize layer: Nelder-Mead, support-point refinement, get_e2."""

import math

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, AssayErrorModel, AssayErrorModels, Data, ErrorPoly, Subject
from pharmsol_tpu.optimize import ParameterOptimizer, get_e2, initial_simplex, nelder_mead


def test_nelder_mead_rosenbrock():
    def rosen(p):
        x, y = p
        return (1 - x) ** 2 + 100 * (y - x * x) ** 2

    res = nelder_mead(rosen, initial_simplex([-1.2, 1.0], 0.1), sd_tolerance=1e-14, max_iters=2000)
    np.testing.assert_allclose(res.best_param, [1.0, 1.0], atol=1e-3)


def test_get_e2_single_site():
    # reference doc example: a=1, b=0 -> xm=1 -> E2=0.5
    assert abs(get_e2(1.0, 0.0, 0.0, 1.0, 1.0, 0.5) - 0.5) < 1e-6
    # b-only: xm = b^(1/h2)
    e2 = get_e2(0.0, 4.0, 0.0, 1.0, 2.0, 0.5)
    assert abs(e2 - 2.0 / 3.0) < 1e-9


def test_get_e2_dual_site():
    e2 = get_e2(1.0, 1.0, 0.0, 1.0, 2.0, 0.5)
    assert 0.0 < e2 < 1.0
    # verify the root property: a/xm^h1 + b/xm^h2 == 1 at the solution
    xm = e2 / (1.0 - e2)
    assert abs(1.0 / xm + 1.0 / xm**2 - 1.0) < 1e-4


def test_get_e2_trivial():
    assert get_e2(0.0, 0.0, 0.0, 1.0, 1.0, 0.5) == 0.0


def test_parameter_optimizer_improves_point():
    ke_true, v_true = 0.2, 10.0
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(4):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0):
            b = b.observation(t, 100.0 / v_true * math.exp(-ke_true * t), 0)
        subjects.append(b.build())
    data = Data(subjects)
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.3, 0.05), 0.5))
    pyl = np.full(4, 1e-3)

    opt = ParameterOptimizer(model, data, ems, pyl)
    start = np.array([0.25, 11.0])
    refined = opt.optimize_point(start)
    assert opt.cost(refined) <= opt.cost(start) + 1e-12
