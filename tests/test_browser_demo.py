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


# -- structural cross-checks of the JS host itself (round 5, VERDICT 10) --
#
# With no JS runtime in the image, drift in pkm_eval.js ITSELF (not just
# demo_data.js) must still fail a test: these parse the JS source and
# assert its evaluation vocabulary covers everything the Python IR can
# emit, and that index.html's wiring points at symbols pkm_eval.js
# actually defines.

import re


def _js_source():
    with open(os.path.join(HERE, "pkm_eval.js")) as f:
        return f.read()


def test_js_host_covers_python_intrinsics():
    from pharmsol_tpu.dsl.pure import _INTRINSICS

    js = _js_source()
    block = js[js.index("const INTRINSICS"):js.index("};", js.index("const INTRINSICS"))]
    js_names = set(re.findall(r"(\w+)\s*:", block))
    missing = set(_INTRINSICS) - js_names
    assert not missing, f"pkm_eval.js INTRINSICS missing {sorted(missing)}"


def test_js_host_covers_python_binops():
    from pharmsol_tpu.dsl.pure import _BINOPS

    js = _js_source()
    block = js[js.index("const BINOPS"):js.index("};", js.index("const BINOPS"))]
    js_ops = set(re.findall(r'"([^"]+)"\s*:', block))
    missing = set(_BINOPS) - js_ops
    assert not missing, f"pkm_eval.js BINOPS missing {sorted(missing)}"


def test_js_host_handles_every_ir_kind():
    js = _js_source()
    for kind in ("number", "bool", "name", "unary", "binary", "call", "index"):
        assert f'kind === "{kind}"' in js, f"expr kind {kind} unhandled in JS"
    for kind in ("assign", "let", "if", "for"):
        assert f'kind === "{kind}"' in js, f"stmt kind {kind} unhandled in JS"


def test_index_html_wiring_matches_js_exports():
    js = _js_source()
    with open(os.path.join(HERE, "index.html")) as f:
        html = f.read()
    # symbols the page destructures from window.PharmsolPkm must be
    # assigned in pkm_eval.js
    m = re.search(r"const\s*{\s*([^}]*)\s*}\s*=\s*window\.PharmsolPkm", html)
    assert m, "index.html no longer destructures window.PharmsolPkm"
    for sym in (s.strip() for s in m.group(1).split(",") if s.strip()):
        assert re.search(rf"\b{sym}\b", js.split("window.PharmsolPkm")[-1]) or \
            f"class {sym}" in js or f"{sym}:" in js, \
            f"index.html uses {sym} but pkm_eval.js does not define/export it"
    assert "window.PharmsolPkm" in js
    # the page consumes window.PHARMSOL_DEMO.cases; demo_data.js defines it
    with open(os.path.join(HERE, "demo_data.js")) as f:
        demo = f.read()
    assert "window.PHARMSOL_DEMO" in demo
    assert "window.PHARMSOL_DEMO" in html


def test_js_host_case_fields_match_make_demo(cases):
    """Every field the JS page reads from a case is a field make_demo
    bakes — drift in either direction fails."""
    with open(os.path.join(HERE, "index.html")) as f:
        html = f.read()
    used = set(re.findall(r"\bc\.(\w+)", html))
    baked = set(cases[0].keys())
    missing = used - baked
    assert not missing, f"index.html reads case fields not baked: {missing}"
