"""Global numeric/runtime configuration.

The reference implementation accumulates Gauss-Newton systems in f32 and
Cholesky-solves the 6x6 system in f64 (`src/optim/gaussnewton.rs:84-93`).
TPUs have no fast f64, so instead of enabling global x64 (which would risk
silent f64 leakage into hot paths) we keep everything f32 and solve the tiny
6x6 system with Jacobi preconditioning + one step of iterative refinement
(:func:`align3d_tpu.optim.gauss_newton.solve_spd`), which recovers the
accuracy the reference gets from f64 for these well-scaled systems.

Environment knobs:

* ``ALIGN3D_REF_DATA`` — override path to the test-fixture tree. Used only
  by tests/benchmarks; defaults to the fixtures vendored in-repo under
  ``tests/data`` (MIT, see ``tests/data/README.md``).
"""

import os

# Default location of the test fixtures (SlamTb sample1/2, bloei.jpg,
# teapot.off/ply): the in-repo vendored copy. Tests skip gracefully when
# absent (e.g. an installed package without the source checkout).
_IN_REPO = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data"
)
REF_DATA_DIR = os.environ.get("ALIGN3D_REF_DATA", _IN_REPO)


def ref_data_path(*parts: str) -> str:
    return os.path.join(REF_DATA_DIR, *parts)


def has_ref_data() -> bool:
    return os.path.isdir(REF_DATA_DIR)
