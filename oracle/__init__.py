"""Independent numpy/scipy float64 oracle.

Replicates the reference's serial pruning semantics (SURVEY.md §3.2) with a
deliberately different implementation from the JAX engine: direct recursion
over the tree (no level schedule), ``scipy.linalg.expm`` for P(t) (no
eigendecomposition), plain per-site scaling. Serves two purposes:

1. golden values for the 1e-6 parity requirement while the reference mount
   is empty (SURVEY.md §0), and
2. the single-core CPU throughput denominator for the 10x/chip target
   (BASELINE.md).
"""
from oracle.core import (  # noqa: F401
    OracleModel,
    jc69,
    k80,
    f81,
    f84,
    hky85,
    tn93,
    gtr,
    lg,
    wag,
    matrix,
    unrest,
    discrete_gamma,
    pmat,
    loglikelihood,
    seq_to_partials,
)
