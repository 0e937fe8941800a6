"""Runtime model DSL: parse -> analyze -> jax-traced runtime.

Rebuild of pharmsol-dsl (frontend) + src/dsl (backends): canonical
``model { ... }`` and flat authoring shorthand both compile to an analyzed
IR executed by the shared segment-scan engine under ``jax.jit``. Artifacts
(.pkm JSON) replace the reference's cdylib/WASM bundles.
"""

from .analyze import AnalyzedModel, analyze_model, analyze_module  # noqa: F401
from .ast import DslModel, DslModelKind, DslModule, DslRouteKind, Expr, Stmt  # noqa: F401
from .diagnostic import Diagnostic, DiagnosticReport, DslError, Span  # noqa: F401
from .parser import parse_model, parse_module  # noqa: F401
from .runtime import (  # noqa: F401
    ARTIFACT_FORMAT,
    ARTIFACT_VERSION,
    CompiledRuntimeModel,
    build_runtime_model,
    compile_model,
    compile_module,
    compile_module_source_to_runtime,
    artifact_schema,
    load_runtime_artifact,
    save_artifact,
    validate_artifact,
)
