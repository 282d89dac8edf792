"""Global numeric/runtime configuration.

The reference implementation accumulates Gauss-Newton systems in f32 and
Cholesky-solves the 6x6 system in f64 (`src/optim/gaussnewton.rs:84-93`).
TPUs have no fast f64, so instead of enabling global x64 (which would risk
silent f64 leakage into hot paths) we keep everything f32 and solve the tiny
6x6 system with Jacobi preconditioning + one step of iterative refinement
(:func:`align3d_tpu.optim.gauss_newton.solve_spd`), which recovers the
accuracy the reference gets from f64 for these well-scaled systems.

Environment knobs:

* ``ALIGN3D_REF_DATA`` — path to the reference test-fixture tree
  (``tests/data`` of the reference repo). Used only by tests/benchmarks.
"""

import os

# Default location of the read-only reference fixtures (SlamTb sample1/2,
# bloei.jpg, teapot.off/ply). Tests skip gracefully when absent.
REF_DATA_DIR = os.environ.get("ALIGN3D_REF_DATA", "/root/reference/tests/data")


def ref_data_path(*parts: str) -> str:
    return os.path.join(REF_DATA_DIR, *parts)


def has_ref_data() -> bool:
    return os.path.isdir(REF_DATA_DIR)
