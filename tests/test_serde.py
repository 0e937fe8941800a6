"""JSON round-trip (serde parity) for data types and NCA results.

Parity: reference data types derive Serialize/Deserialize
(src/data/structs.rs:37,351; covariate.rs:322). Round-trip property:
build -> dump -> load -> identical content hash.
"""

import json

import numpy as np
import pytest

from pharmsol_tpu import (
    AssayErrorModel,
    AssayErrorModels,
    Covariate,
    Data,
    ErrorPoly,
    ResidualErrorModel,
    ResidualErrorModels,
    Subject,
    from_json,
    to_json,
)
from pharmsol_tpu.data import serde
from pharmsol_tpu.data.event import Censor
from pharmsol_tpu.errors import PharmsolError


def _rich_subject(sid="s1"):
    return (
        Subject.builder(sid)
        .bolus(0.0, 100.0, 0)
        .infusion(1.0, 50.0, 0, 0.5)
        .observation(2.0, 1.5, 0)
        .observation_with_error(3.0, 1.2, 0, (0.1, 0.05, 0.0, 0.0))
        .censored_observation(4.0, 0.05, 0, Censor.BLOQ)
        .missing_observation(5.0, 0)
        .covariate("wt", 0.0, 70.0)
        .covariate("wt", 24.0, 72.0)
        .covariate("sex!", 0.0, 1.0)
        .reset()
        .bolus(0.0, 200.0, 0)
        .observation(1.0, 2.5, 0)
        .build()
    )


class TestDataRoundTrip:
    def test_subject_hash_preserved(self):
        s = _rich_subject()
        d = serde.subject_to_dict(s)
        s2 = serde.subject_from_dict(d)
        assert s2.hash() == s.hash()
        assert s2.id == s.id
        assert len(s2) == len(s)

    def test_data_round_trip_json_string(self):
        data = Data([_rich_subject("a"), _rich_subject("b")])
        text = to_json(data)
        data2 = from_json(text)
        assert isinstance(data2, Data)
        assert [s.id for s in data2] == ["a", "b"]
        for s, s2 in zip(data, data2):
            assert s.hash() == s2.hash()

    def test_covariates_preserved(self):
        s = _rich_subject()
        s2 = serde.subject_from_dict(serde.subject_to_dict(s))
        occ = s2.occasions()[0]
        cov = occ.covariates.get("wt")
        assert cov is not None and not cov.fixed
        assert cov.interpolate(12.0) == pytest.approx(71.0)
        fixed = occ.covariates.get("sex")  # builder strips the `!` marker
        assert fixed is not None and fixed.fixed

    def test_event_fields_preserved(self):
        s = _rich_subject()
        s2 = serde.subject_from_dict(serde.subject_to_dict(s))
        obs = s2.occasions()[0].observations()
        assert obs[1].errorpoly == (0.1, 0.05, 0.0, 0.0)
        assert obs[2].censoring is Censor.BLOQ
        assert obs[3].value is None
        inf = s2.occasions()[0].infusions()[0]
        assert inf.duration == 0.5

    def test_occasion_index_split(self):
        s = _rich_subject()
        s2 = serde.subject_from_dict(serde.subject_to_dict(s))
        assert [o.index for o in s2.occasions()] == [0, 1]

    def test_schema_mismatch_raises(self):
        with pytest.raises(PharmsolError, match="schema"):
            from_json(json.dumps({"schema": "bogus-v9"}))

    def test_file_round_trip(self, tmp_path):
        data = Data([_rich_subject()])
        p = tmp_path / "pop.json"
        serde.save_json(data, str(p))
        data2 = serde.load_json(str(p))
        assert data2.subjects()[0].hash() == data.subjects()[0].hash()


class TestErrorModelRoundTrip:
    def test_assay_error_models(self):
        ems = AssayErrorModels()
        ems.add("y0", AssayErrorModel.additive(ErrorPoly(0.1, 0.05, 0.0, 0.0), 1.2))
        ems.add("y1", AssayErrorModel.proportional_fixed(ErrorPoly(0.0, 0.1), 2.0))
        ems.add("y2", AssayErrorModel.none())
        ems2 = from_json(to_json(ems))
        assert ems2.content_hash() == ems.content_hash()
        assert ems2.get("y1").factor_param.fixed
        assert ems2.get("y2").is_none()

    def test_residual_error_models(self):
        rems = ResidualErrorModels()
        rems.add("y0", ResidualErrorModel.combined(0.1, 0.2))
        rems.add("y1", ResidualErrorModel.exponential(0.3))
        rems2 = from_json(to_json(rems))
        m = rems2.get("y0")
        assert m.kind.value == "combined" and m.a == 0.1 and m.b == 0.2
        assert rems2.get("y1").kind.value == "exponential"


class TestNCAResultRoundTrip:
    def test_nca_result(self):
        from pharmsol_tpu.nca import NCAOptions, nca

        s = (
            Subject.builder("n1")
            .bolus(0.0, 100.0, 0)
            .observation(0.5, 8.0, 0)
            .observation(1.0, 6.5, 0)
            .observation(2.0, 4.3, 0)
            .observation(4.0, 1.9, 0)
            .observation(8.0, 0.4, 0)
            .build()
        )
        res = nca(s, NCAOptions())
        text = to_json(res, indent=2)
        res2 = from_json(text)
        assert res2.subject_id == res.subject_id
        assert res2.exposure.cmax == pytest.approx(res.exposure.cmax)
        assert res2.exposure.auc_last == pytest.approx(res.exposure.auc_last)
        if res.terminal is not None:
            assert res2.terminal.lambda_z == pytest.approx(res.terminal.lambda_z)
            assert res2.terminal.regression.r_squared == pytest.approx(
                res.terminal.regression.r_squared
            )
        if res.clearance is not None:
            assert res2.clearance.cl_f == pytest.approx(res.clearance.cl_f)
        # second round trip is a fixed point
        assert to_json(res2, indent=2) == text

    def test_route_params_variants(self):
        from pharmsol_tpu.nca.types import (
            C0Method, IVBolusParams, RouteParams,
        )

        rp = RouteParams.iv_bolus(IVBolusParams(c0=5.0, vd=20.0,
                                                c0_method=C0Method.LOG_SLOPE))
        d = {"kind": rp.kind, "params": serde._dataclass_to_dict(rp.params)}
        text = json.dumps(d)
        back = json.loads(text)
        assert back["params"]["c0"] == 5.0
        assert back["params"]["c0_method"] == "log_slope"
