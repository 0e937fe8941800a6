"""Non-compartmental analysis of a simulated profile (examples/nca.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

from pharmsol_tpu import Subject
from pharmsol_tpu.nca import NCAOptions, nca


def main():
    subject = (
        Subject.builder("pt1")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0)
        .observation(0.5, 2.5, 0)
        .observation(1.0, 8.0, 0)
        .observation(2.0, 12.0, 0)
        .observation(3.0, 10.0, 0)
        .observation(4.0, 7.5, 0)
        .observation(6.0, 4.2, 0)
        .observation(8.0, 2.3, 0)
        .observation(12.0, 0.7, 0)
        .observation(24.0, 0.05, 0)
        .build()
    )
    result = nca(subject, NCAOptions())
    for name, value in sorted(result.to_params().items()):
        print(f"{name:>22}: {value:.6g}")
    for w in result.quality.warnings:
        print(f"  [{w.severity.value}] {w.message}")


if __name__ == "__main__":
    main()
