"""On-device smoke sweep: every subsystem executed on the real accelerator.

The test suite runs on CPU (f64 parity oracles); this script exercises each
subsystem on whatever device JAX sees — the way the ESDIRK float64
``linalg.solve`` TPU-compile failure was caught. Run it after changes that
could alter lowering (new ops, dtype policy, solver internals):

    python scripts/tpu_smoke.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Censor,
    Data,
    ErrorPoly,
    ODE,
    Parameters,
    ResidualErrorModel,
    ResidualErrorModels,
    Route,
    Subject,
    analytical_model,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_batch, log_likelihood_matrix
from pharmsol_tpu.models.sde import SDE


def main():
    print("platform:", jax.devices()[0].platform)
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    checks = []

    # 1. analytical predictions + every ODE solver (f64 Newton dense-solve)
    s = Subject.builder("a").bolus(0.0, 100.0, 0)
    for t in (0.5, 2.0, 8.0):
        s = s.missing_observation(t, 0)
    s = s.build()
    ana = Analytical(pst.two_compartments_with_absorption,
                     out=lambda x, p, t, cov: x[1:2] / p[4],
                     nstates=3, ndrugs=1, nout=1)
    ref = np.asarray(ana.estimate_predictions(s, [0.15, 1.2, 0.3, 0.2, 10.0]).flat_predictions())
    checks.append(("analytical", np.all(np.isfinite(ref))))
    print("  ...analytical compiled")

    def eq(x, p, t, b, rateiv, cov):
        ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
        return jnp.stack([-ka * x[0] + b[0],
                          ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
                          kcp * x[1] - kpc * x[2]])

    for name in ("dopri5", "kvaerno3"):  # kvaerno3 covers the ESDIRK dense-solve path
        m = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
                nstates=3, ndrugs=1, nout=1).with_solver(name)
        got = np.asarray(m.estimate_predictions(s, [0.15, 1.2, 0.3, 0.2, 10.0]).flat_predictions())
        rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12))
        checks.append((f"ode/{name}", rel < 1e-3))
        print(f"  ...{name} compiled")

    # 2. SDE particle filter + psi
    sub = (Subject.builder("s").bolus(0.0, 100.0, 0)
           .observation(1.0, 4.2, 0).observation(3.0, 2.1, 0).build())
    sde = SDE(drift=lambda x, p, t, rateiv, cov: -p[0] * x[:1],
              diffusion=lambda p, t, cov: jnp.full((1,), 0.1),
              out=lambda x, p, t, cov: x[:1] / p[1],
              nparticles=200, nstates=1, ndrugs=1, nout=1, seed=1)
    ll = float(sde.estimate_log_likelihood(sub, [0.2, 20.0], ems))
    checks.append(("sde/pf", np.isfinite(ll)))

    # 3. pallas psi engine (bolus, censoring) vs XLA engine
    rng = np.random.RandomState(0)
    subs = []
    for i in range(16):
        b = Subject.builder(f"p{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            b = b.observation(float(t), float(abs(5 + rng.randn())), 0)
        b = b.censored_observation(24.0, 0.5, 0, Censor.BLOQ)
        subs.append(b.build())
    support = np.abs(np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(40, 5)))
    want = log_likelihood_matrix(ana, Data(subs), support, ems)
    got = log_likelihood_matrix(ana, Data(subs), support, ems, engine="pallas")
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    checks.append(("pallas/psi+censoring", rel < 1e-3))

    # 4. batch NCA + residual batch LL + Nelder-Mead
    from pharmsol_tpu.nca.batch import batch_nca
    t = np.array([0.5, 1, 2, 4, 8, 12, 24], dtype=float)
    prof = np.abs(10 * np.exp(-0.2 * t)[None, :] * (1 + 0.05 * rng.randn(64, 7))) + 1e-12
    res = batch_nca(t, prof, dose=100.0)
    checks.append(("nca/batch", np.isfinite(np.nanmedian(res["half_life"]))))
    m1 = Analytical(pst.one_compartment, out=lambda x, p, t, cov: x[:1] / p[1],
                    nstates=1, ndrugs=1, nout=1)
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.2))
    bl = log_likelihood_batch(m1, Data(subs[:4]), np.abs(np.array([[0.2, 10.0]] * 4)), rems)
    checks.append(("likelihood/batch", np.all(np.isfinite(bl))))
    from pharmsol_tpu.optimize import ParameterOptimizer
    psi0 = log_likelihood_matrix(m1, Data(subs[:4]), np.array([[0.2, 10.0]]), ems)
    opt = ParameterOptimizer(m1, Data(subs[:4]), ems, np.exp(psi0[:, 0]))
    checks.append(("optimize/nm", np.all(np.isfinite(opt.optimize_point(np.array([0.25, 12.0]))))))

    # 5. DSL runtime + declarative with covariate-derived structure input
    from pharmsol_tpu.dsl import compile_model
    rt = compile_model("""
name = m
kind = ode
params = ka, ke, v
states = depot, central
outputs = cp
bolus(oral) -> depot
dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central
out(cp) = central / v
""")
    sd = (Subject.builder("d").bolus(0.0, 100.0, "oral")
          .observation(1.0, -1.0, "cp").build())
    checks.append(("dsl/ode", np.isfinite(rt.estimate_predictions(sd, [1.2, 0.2, 10.0]).flat_predictions()[0])))
    am = analytical_model(
        structure="one_compartment_with_absorption",
        parameters=["ka", "ke0", "v"], covariates=["wt"],
        states=["gut", "central"], outputs=["cp"],
        routes=[Route.bolus("oral").to_state("gut")],
        derive=lambda p, t, cov: {"ke": p.ke0 * (cov.wt / 70.0) ** 0.75},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )
    sq = (Subject.builder("q").bolus(0.0, 500.0, "oral").missing_observation(2.0, "cp")
          .covariate("wt", 0.0, 75.0).build())
    pv = am.estimate_predictions(sq, Parameters.with_model(am, [("ka", 1.2), ("ke0", 0.08), ("v", 194.0)]))
    checks.append(("declarative/covariates", np.isfinite(pv.flat_predictions()[0])))

    # 6. pallas covariate-multiplier path + genuine BDF + device NCA
    csubs = []
    for i in range(16):
        b = Subject.builder(f"c{i}").bolus(0.0, 100.0, 0)
        b = b.covariate("wt", 0.0, 55.0 + 2.0 * i)
        for tt in (0.5, 2.0, 8.0):  # NOT `t`: section 4's time grid is reused below
            b = b.observation(float(tt), float(abs(4 + rng.randn())), 0)
        csubs.append(b.build())

    def seq(p, t, cov):
        sc = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * sc, p[1], p[2] * sc, p[3] * sc, p[4]])

    anac = Analytical(pst.two_compartments_with_absorption, seq_eq=seq,
                      out=lambda x, p, t, cov: x[1:2] / p[4],
                      nstates=3, ndrugs=1, nout=1)
    wantc = log_likelihood_matrix(anac, Data(csubs), support, ems)
    gotc = log_likelihood_matrix(anac, Data(csubs), support, ems, engine="pallas")
    relc = np.max(np.abs(gotc - wantc) / np.maximum(np.abs(wantc), 1.0))
    checks.append(("pallas/covariate-mult", relc < 1e-3))

    # time-varying covariates + infusion: per-segment multiplier streams
    # (seq compounding across infusion-end sub-splits baked in host-side)
    tsubs = []
    for i in range(16):
        b = (Subject.builder(f"t{i}").bolus(0.0, 100.0, 0)
             .infusion(2.0, 50.0, 0, 1.5)
             .covariate("wt", 0.0, 80.0 - 0.5 * i)
             .covariate("wt", 12.0, 60.0 + 0.5 * i))
        for tt in (0.5, 1.0, 3.0, 6.0, 12.0):
            b = b.observation(float(tt), float(abs(5 + rng.randn())), 0)
        tsubs.append(b.build())
    wantt = log_likelihood_matrix(anac, Data(tsubs), support, ems)
    gott = log_likelihood_matrix(anac, Data(tsubs), support, ems, engine="pallas")
    relt = np.max(np.abs(gott - wantt) / np.maximum(np.abs(wantt), 1.0))
    checks.append(("pallas/covariate-tv-seg", relt < 1e-3))

    mb = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
             nstates=3, ndrugs=1, nout=1).with_solver("bdf")
    gotb = np.asarray(mb.estimate_predictions(s, [0.15, 1.2, 0.3, 0.2, 10.0]).flat_predictions())
    relb = np.max(np.abs(gotb - ref) / np.maximum(np.abs(ref), 1e-12))
    checks.append(("ode/bdf", relb < 1e-3))

    mx = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
             nstates=3, ndrugs=1, nout=1).with_solver("expm")
    gotx = np.asarray(mx.estimate_predictions(s, [0.15, 1.2, 0.3, 0.2, 10.0]).flat_predictions())
    relx = np.max(np.abs(gotx - ref) / np.maximum(np.abs(ref), 1e-12))
    checks.append(("ode/expm-exact", relx < 1e-4))  # f32 roundoff only

    from pharmsol_tpu.nca.batch_device import batch_nca_device
    resd = batch_nca_device(t, prof, dose=100.0)
    dev_host = np.abs(np.nanmedian(resd["half_life"]) - np.nanmedian(res["half_life"]))
    checks.append(("nca/batch-device", np.isfinite(np.nanmedian(resd["half_life"]))
                   and dev_host < 0.05))

    # 7. emulated-f64 stepper sanity. The default TPU dtype is f32, but users
    # can opt into f64 (emulated two-float arithmetic), whose non-IEEE corner
    # cases have bitten before: inf ** -n -> nan poisoned the BDF order
    # adaptation. Keep one explicit f64 integration per stepper family.
    from pharmsol_tpu.engine.ode import ODEOptions, _SEGMENT_SOLVERS
    p64 = jnp.asarray([0.15, 1.2, 0.3, 0.2], jnp.float64)

    def f64rhs(x, t):
        return jnp.stack([
            -p64[1] * x[0],
            p64[1] * x[0] - (p64[0] + p64[2]) * x[1] + p64[3] * x[2],
            p64[2] * x[1] - p64[3] * x[2],
        ])

    x64 = jnp.asarray([100.0, 0.0, 0.0], jnp.float64)
    for name in ("dopri5", "bdf", "kvaerno3"):
        seg = _SEGMENT_SOLVERS[name]
        out64 = np.asarray(seg(f64rhs, x64, jnp.float64(0.0), jnp.float64(2.0),
                               ODEOptions(solver=name)))
        checks.append((f"f64-emulated/{name}", bool(np.all(np.isfinite(out64)))))

    # 8. the committed f32 error-budget table, ON-CHIP: compiled Mosaic
    # kernels + f32 XLA vs f64 goldens — the same table the CPU suite
    # gates in interpret mode (tests/test_f32_budget.py)
    from pharmsol_tpu.utils.f32_budget import budget_cases, run_case

    for case in budget_cases():
        for engine in ("pallas", "xla"):
            if case.name == "ode_bdf" and engine == "xla":
                # the XLA implicit psi program costs 8-12 min PER COMPILE
                # through the tunnel (CLAUDE.md); the CPU suite gates the
                # xla cell in interpret/f64 — on-chip only the fused
                # kernel is asserted
                continue
            res = run_case(case, engine=engine)
            checks.append((
                f"f32-budget/{case.name}/{engine} "
                f"({res['rel']:.1e}<={case.budget:.0e})",
                res["ok"],
            ))

    # 9. SDE fused kernel, round-4 scope (compiled Mosaic): multi-input
    # dosing x dynamic lag/fa (per-dose-segment slot tables) x tv
    # covariate x BLOQ/ALOQ censoring, zero diffusion -> parity vs the
    # XLA SDE engine is deterministic (same EM controller law; the only
    # approximation is the kernel's log_ndtr on censored cells)
    from pharmsol_tpu import SubjectBuilder

    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + rateiv[1],
            p[0] * x[0] - p[1] * x[1] + rateiv[0],
        ]),
        diffusion=lambda p, t, cov: jnp.stack([0.0, 0.0]),
        lag=lambda p, t, cov: {0: p[3] * (1.0 + 0.05 * t)},
        fa=lambda p, t, cov: {0: 1.0 / (1.0 + 0.02 * t)},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nparticles=16, nstates=2, ndrugs=2, nout=1, seed=3,
    )
    rng4 = np.random.default_rng(4)
    subs4 = []
    for i in range(8):
        sb = (SubjectBuilder(f"sde{i}").bolus(0.0, 100.0, 0)
              .bolus(2.5, 60.0, 1).infusion(0.8, 40.0, 1, 0.5)
              .covariate("wt", 0.0, 55.0 + 4 * i)
              .covariate("wt", 1.2, 70.0 - 3 * i))
        for t in (0.4, 1.2, 2.0):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        sb = (sb.censored_observation(3.0, 0.5, 0, Censor.BLOQ)
              .censored_observation(0.1, 9.0, 0, Censor.ALOQ))
        subs4.append(sb.build())
    sp4 = np.column_stack([
        rng4.uniform(0.8, 1.6, 6), rng4.uniform(0.2, 0.5, 6),
        rng4.uniform(8, 14, 6), rng4.uniform(0.1, 0.35, 6),
    ])
    ems4 = ems
    pp4 = log_likelihood_matrix(sde, Data(subs4), sp4, ems4,
                                engine="pallas")
    px4 = log_likelihood_matrix(sde, Data(subs4), sp4, ems4, engine="xla")
    rel4 = float(np.max(np.abs(pp4 - px4) / np.maximum(np.abs(px4), 1.0)))
    checks.append((
        f"sde/multiinput+dynlagfa+tvcov+censoring ({rel4:.1e}<=1e-4)",
        rel4 < 1e-4,
    ))

    # round 5: the NPML weight-solve device burn-in (optimize/weights.py)
    # compiles and lands in the same basin as the host path
    from pharmsol_tpu.optimize.weights import (
        _burnin_device, _newton_active, solve_weights_plain,
    )

    rng5 = np.random.RandomState(9)
    nw, kw = 400, 96
    centers = rng5.rand(4)
    true_w = centers[rng5.randint(4, size=nw)]
    theta_w = np.sort(rng5.rand(kw))
    lpsi = -0.5 * ((true_w[:, None] - theta_w[None, :]) / 0.1) ** 2
    psi_w = np.exp(lpsi - lpsi.max(axis=1, keepdims=True))
    pad_w = np.concatenate(
        [psi_w, np.zeros((nw, 32))], axis=1).astype(np.float32)
    lam_dev = _burnin_device(pad_w, kw)
    lam_ref, pyl_ref, ll_ref = solve_weights_plain(psi_w)
    lam_n = _newton_active(psi_w, lam_dev, nw)
    ll_n = float(np.sum(np.log(np.maximum(psi_w @ lam_n, 1e-300))))
    rel_w = abs(ll_n - ll_ref) / max(1.0, abs(ll_ref))
    checks.append((f"weights/device-burnin ({rel_w:.1e}<=1e-6)",
                   ll_n >= ll_ref - 1e-6 * max(1.0, abs(ll_ref))))
    print("  ...weights device burn-in compiled")

    failed = [name for name, ok in checks if not ok]
    for name, ok in checks:
        print(f"  {'OK  ' if ok else 'FAIL'} {name}")
    if failed:
        raise SystemExit(f"TPU smoke failures: {failed}")
    print(f"all {len(checks)} on-device checks passed.")


if __name__ == "__main__":
    main()
