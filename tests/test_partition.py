"""Partitioned (multi-locus) engine: shared tree, per-partition models."""
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.partition import Partition, PartitionedEngine
from phylo_utils_tpu.trees import random_tree


def _aln(tree, sites, seed=0, chars="ACGT"):
    rng = np.random.default_rng(seed)
    return {n: "".join(rng.choice(list(chars), size=sites))
            for n in tree.leaf_names}


@pytest.fixture(scope="module")
def setup():
    tree = random_tree(6, seed=1)
    parts = [
        Partition("gene1", _aln(tree, 90, seed=2), models.HKY85, ncat=4),
        Partition("gene2", _aln(tree, 60, seed=3), models.GTR),
        Partition("gene3", _aln(tree, 120, seed=4), models.K80, ncat=2),
    ]
    return tree, parts


def test_partitioned_equals_sum_of_engines(setup):
    tree, parts = setup
    pe = PartitionedEngine(tree, parts, link_rates=False)
    total = pe.loglikelihood()
    singles = sum(
        LikelihoodEngine(tree, p.alignment, p.model, ncat=p.ncat).loglikelihood()
        for p in parts
    )
    assert total == pytest.approx(singles, abs=1e-9)
    per = pe.partition_loglikelihoods()
    assert set(per) == {"gene1", "gene2", "gene3"}
    assert sum(per.values()) == pytest.approx(total, abs=1e-9)


def test_partition_rates_normalized(setup):
    tree, parts = setup
    pe = PartitionedEngine(tree, parts)  # link_rates=True
    base = pe.loglikelihood()
    # scaling all partition rates by a constant changes nothing (mean-1 norm)
    scaled = pe.loglikelihood({"partition_rates": np.array([3.0, 3.0, 3.0])})
    assert scaled == pytest.approx(base, abs=1e-9)
    # unequal rates DO change the likelihood
    uneq = pe.loglikelihood({"partition_rates": np.array([0.3, 1.0, 2.0])})
    assert abs(uneq - base) > 1e-6


def test_partitioned_fit_improves_and_fits_per_partition_params(setup):
    tree, parts = setup
    pe = PartitionedEngine(tree, parts)
    ll0 = pe.loglikelihood()
    res = fit(pe, max_steps=120, patience=20)
    assert res.loglik > ll0 + 1.0
    fitted = res.params
    # per-partition model params moved independently
    k1 = float(fitted["partitions"]["gene1"]["model"]["kappa"])
    k3 = float(fitted["partitions"]["gene3"]["model"]["kappa"])
    assert k1 != pytest.approx(k3, abs=1e-3)
    # the raw multiplier is scale-invariant (normalized in-graph); the
    # *relative* rates between partitions must have been learned
    r = np.asarray(fitted["partition_rates"])
    assert r.max() / r.min() > 1.0 + 1e-4


def test_mixed_alphabet_partitions(setup):
    tree, _ = setup
    parts = [
        Partition("dna", _aln(tree, 60, seed=5), models.GTR, ncat=2),
        Partition("prot", _aln(tree, 40, seed=6, chars="ACDEFGHIKLMNPQRSTVWY"),
                  models.LG),
    ]
    pe = PartitionedEngine(tree, parts)
    assert np.isfinite(pe.loglikelihood())
    g = pe.gradient()
    assert np.isfinite(np.asarray(g["branch_lengths"])).all()


def test_duplicate_partition_names_rejected(setup):
    tree, parts = setup
    with pytest.raises(ValueError, match="unique"):
        PartitionedEngine(tree, [parts[0], parts[0]])
