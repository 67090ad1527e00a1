"""Substitution models (functional, differentiable).

Reference parity: phylo_utils/models.py model classes (SURVEY.md §2).
Here a model is a frozen spec + pure functions of a parameter PyTree, so all
model parameters are first-class differentiable inputs to the jitted
likelihood.
"""
from phylo_utils_tpu.models.base import (  # noqa: F401
    Eigen,
    Model,
    build_rate_matrix,
    eigen_reversible,
    normalize_q,
    stationary_from_q,
)
from phylo_utils_tpu.models.dna import (  # noqa: F401
    JC69,
    K80,
    F81,
    F84,
    HKY85,
    TN93,
    GTR,
    UNREST,
)
from phylo_utils_tpu.models.protein import (  # noqa: F401
    LG,
    WAG,
    empirical_model_from_dat,
)
from phylo_utils_tpu.models.codon import (  # noqa: F401
    GY94,
    MG94,
    CODONS,
    f3x4_frequencies,
)

_REGISTRY = {
    "jc69": JC69,
    "k80": K80,
    "f81": F81,
    "f84": F84,
    "hky85": HKY85,
    "tn93": TN93,
    "gtr": GTR,
    "unrest": UNREST,
    "lg": LG,
    "wag": WAG,
    "gy94": GY94,
    "mg94": MG94,
}


def get_model(name: str) -> Model:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; expected one of {sorted(_REGISTRY)}"
        ) from None
