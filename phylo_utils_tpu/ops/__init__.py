"""Compute ops: transition matrices, pruning passes, rate mixtures."""
from phylo_utils_tpu.ops.pmatrix import (  # noqa: F401
    transition_matrices,
    dp_matrices,
    d2p_matrices,
)
from phylo_utils_tpu.ops.gamma import discrete_gamma, gamma_quantile  # noqa: F401
from phylo_utils_tpu.ops.pruning import make_prune_fn, mixture_loglik  # noqa: F401
