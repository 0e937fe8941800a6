"""The fused-kernel psi engine: regimens, censoring, and sharding.

`log_likelihood_matrix(..., engine="pallas")` opts population likelihoods
into hand-scheduled TPU kernels for the built-in analytical structures
(1/2/3-cmt oral, 1/2-cmt IV). Supported data shapes: multi-dose bolus and
constant-rate infusion regimens, BLOQ/ALOQ censoring, per-observation
errorpoly overrides. The support matrix is laid out in kernel parameter
order with V as the last column.

Run: python examples/pallas_engine.py   (CPU runs in interpret mode)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Censor,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix


def main():
    rng = np.random.RandomState(0)

    # the reference's "Repeat" benchmark shape: 100 mg IV q12h x 10, but as a
    # 1 h infusion, with a BLOQ tail sample
    subjects = []
    for i in range(24):
        b = Subject.builder(f"pt{i:02d}")
        for d in range(10):
            b = b.infusion(d * 12.0, 100.0, 0, 1.0)
        for t in np.linspace(1.5, 118.0, 12):
            b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
        b = b.censored_observation(140.0, 0.25, 0, Censor.BLOQ)
        subjects.append(b.build())

    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        nstates=2,
        ndrugs=1,
        nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))

    # support columns in kernel order [ke, kcp, kpc] + v last
    center = np.array([0.15, 0.3, 0.2, 10.0])
    support = np.abs(center[None, :] * (1.0 + 0.25 * rng.randn(200, 4)))

    psi_xla = log_likelihood_matrix(model, Data(subjects), support, ems)
    psi_pl = log_likelihood_matrix(model, Data(subjects), support, ems, engine="pallas")
    rel = np.max(np.abs(psi_pl - psi_xla) / np.maximum(np.abs(psi_xla), 1.0))
    print(f"psi {psi_pl.shape}: engines agree to {rel:.2e} (relative)")

    # the same fused kernels shard over a device mesh
    import jax

    if len(jax.devices()) > 1:
        from pharmsol_tpu.parallel.mesh import (
            log_likelihood_matrix_sharded,
            population_mesh,
        )

        mesh = population_mesh()
        psi_sh = log_likelihood_matrix_sharded(
            model, Data(subjects), support, ems, mesh=mesh, engine="pallas"
        )
        assert np.allclose(psi_sh, psi_pl, rtol=1e-12)
        print(f"sharded over {mesh.devices.size} devices: identical psi")

    best = support[np.argmax(psi_pl.sum(axis=0))]
    print("best shared support point [ke, kcp, kpc, v]:", np.round(best, 4))


if __name__ == "__main__":
    main()
