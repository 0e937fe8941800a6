"""Native C++ components: CSV parser parity + availability."""

import io
import time

import numpy as np
import pytest

from pharmsol_tpu.data.pmetrics import read_pmetrics, write_pmetrics
from pharmsol_tpu.native import native_available, read_pmetrics_native

CSV = """ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3,WT,AGE!
1,1,0,0,600,2,12,or1,.,.,.,.,.,.,70.0,35
1,0,9,.,.,.,.,.,100,cp,0.1,0.05,0,0,70.0,35
1,0,24,.,.,.,.,.,-99,cp,.,.,.,.,72.0,35
2,1,0,2.0,600,.,.,iv,.,.,.,.,.,.,65.0,40
2,0,12,.,.,.,.,.,95,cp,.,.,.,.,65.0,40
2,0,14,.,.,.,.,.,80,cp,.,.,.,.,66.0,40
"""


def test_native_library_builds():
    assert native_available(), "native toolchain expected in this image"


def test_native_parser_matches_python():
    py = read_pmetrics(io.StringIO(CSV))
    nat = read_pmetrics_native(CSV)
    assert len(nat) == len(py)
    for sid in ("1", "2"):
        a = py.get_subject(sid)
        b = nat.get_subject(sid)
        assert len(a.occasions()) == len(b.occasions())
        for occ_a, occ_b in zip(a.occasions(), b.occasions()):
            assert len(occ_a.events) == len(occ_b.events)
            for ea, eb in zip(occ_a.events, occ_b.events):
                assert type(ea) is type(eb)
                assert ea.time == eb.time
            assert occ_a.covariates.names() == occ_b.covariates.names()
            for name in occ_a.covariates.names():
                ca = occ_a.covariates.get(name)
                cb = occ_b.covariates.get(name)
                assert ca.observations() == cb.observations()
                assert ca.fixed == cb.fixed
    # ADDL expanded: subject 1 occasion 0 has 3 boluses
    assert len(nat.get_subject("1").occasions()[0].boluses()) == 3
    # missing OUT=-99 preserved
    obs = nat.get_subject("1").occasions()[0].observations()
    assert obs[1].value is None
    assert obs[0].errorpoly == (0.1, 0.05, 0.0, 0.0)


def test_native_parser_error_messages():
    with pytest.raises(Exception) as exc:
        read_pmetrics_native("FOO,BAR\n1,2\n")
    assert "ID, TIME, EVID" in str(exc.value)


def test_native_parser_speed_on_large_file():
    rows = ["ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3,WT"]
    for sid in range(500):
        rows.append(f"s{sid},1,0,0,100,.,.,0,.,.,.,.,.,.,70")
        for t in range(10):
            rows.append(f"s{sid},0,{t + 1},.,.,.,.,.,{50 - t},0,.,.,.,.,70")
    text = "\n".join(rows) + "\n"

    t0 = time.perf_counter()
    nat = read_pmetrics_native(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = read_pmetrics(io.StringIO(text))
    t_python = time.perf_counter() - t0
    assert len(nat) == len(py) == 500
    # informational: native tokenization should not be slower overall
    print(f"native={t_native:.3f}s python={t_python:.3f}s")
