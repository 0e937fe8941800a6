"""Browser-host demo contract: the baked expectations are achievable.

The reference's browser e2e (tests/browser-e2e/run.mjs) needs Node +
Playwright; this build image has no JS runtime at all, so the browser page
(examples/browser/index.html + pkm_eval.js) is self-checking — it executes
each `.pkm` artifact in the page and asserts against jitted-engine
expectations baked by make_demo.py. These tests keep that harness honest
from the Python side:

- every baked (payload, regimen, expected, rtol) case passes through
  dsl/pure.py — the reference implementation of the `.pkm` evaluation
  contract pkm_eval.js ports line-for-line (and native/src/pkm_host.cpp
  implements in C++, pinned by tests/test_pkm_host.py);
- the committed demo_data.js stays fresh against the current engine.
"""

import json
import os
import sys

import numpy as np
import pytest

HERE = os.path.join(os.path.dirname(__file__), "..", "examples", "browser")
sys.path.insert(0, HERE)

from make_demo import build_cases  # noqa: E402

from pharmsol_tpu.dsl.pure import PureCovariate, PureModel  # noqa: E402


@pytest.fixture(scope="module")
def cases():
    return build_cases()


def _run_pure(case):
    model = PureModel(case["payload"])
    cov = {
        name: PureCovariate(spec["knots"], spec["fixed"])
        for name, spec in case["cov"].items()
    }
    opts = dict(case["opts"])
    got = model.simulate(
        case["params"],
        boluses=[tuple(b) for b in case["boluses"]],
        obs_times=case["obs_times"],
        cov=cov or None,
        **opts,
    )
    return np.asarray([row[0] for row in got])


def test_deterministic_cases_within_baked_tolerance(cases):
    for case in cases[:3]:  # ode, analytical, zero-diffusion sde
        got = _run_pure(case)
        want = np.asarray(case["expected"])
        rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-12))
        assert rel < case["rtol"], (case["title"], rel, case["rtol"])


@pytest.mark.slow
def test_diffusive_sde_case_within_band(cases):
    case = cases[3]
    got = _run_pure(case)
    want = np.asarray(case["expected"])
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-12))
    assert rel < case["rtol"], (case["title"], rel, case["rtol"])


def test_committed_demo_data_is_fresh(cases):
    path = os.path.join(HERE, "demo_data.js")
    with open(path) as f:
        text = f.read()
    start = text.index("{")
    data = json.loads(text[start:].rstrip().rstrip(";"))
    assert len(data["cases"]) == len(cases)
    for committed, fresh in zip(data["cases"], cases):
        assert committed["title"] == fresh["title"]
        fresh_model = json.loads(json.dumps(fresh["payload"]["model"]))
        assert committed["payload"]["model"] == fresh_model
        np.testing.assert_allclose(
            committed["expected"], fresh["expected"], rtol=1e-9
        )
