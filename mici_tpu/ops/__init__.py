"""TPU Pallas kernels for the hot batched linear-algebra paths.

SURVEY.md §2.2 / BASELINE.json name batched Cholesky factorization and
triangular solves at 1024-chain batch sizes as the TPU-critical metric
algebra kernels.  The kernels here use a *batch-in-lanes* layout: the
recurrences of the factorizations are scalar per matrix but element-wise
across the chain batch, so each step of the ``O(n^2)`` recurrence is one
VPU op over (a block of) the batch dimension mapped onto the 128-wide lane
axis — exactly the shape TPU vector hardware wants for thousands of tiny
per-chain metrics.

``batched_cholesky`` / ``batched_tril_solve`` fall back to ``jnp.linalg``
when Pallas is unavailable (e.g. CPU tests run the kernels in interpreter
mode via the ``interpret`` flag).
"""

from mici_tpu.ops.batched_linalg import (  # noqa: F401
    batched_cholesky,
    batched_cholesky_solve,
    batched_tril_solve,
    batched_tril_transpose_solve,
    batched_eigh,
    batched_tril_inverse,
    blocked_cholesky,
    blocked_eigh,
    parallel_jacobi_eigh,
    blocked_tril_inverse,
    blocked_tril_solve,
    blocked_tril_transpose_solve,
)
from mici_tpu.ops.dispatch import (  # noqa: F401
    cholesky,
    eigh,
    force_dispatch,
    solve_triangular_mat,
    solve_triangular_vec,
    tri_inverse,
)
