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


# ---------------------------------------------------------------------------
# Partition files (RAxML/IQ-TREE lines and NEXUS charsets)
# ---------------------------------------------------------------------------

def test_parse_partition_file_raxml_and_nexus():
    from phylo_utils_tpu.io import parse_partition_file

    specs = parse_partition_file(
        "# comment\n"
        "DNA, gene1 = 1-500\n"
        "GTR+G4, gene2 = 501-900\\3, 1000-1100\n"
        "LG, prot = 1-100\n"
    )
    assert [s["name"] for s in specs] == ["gene1", "gene2", "prot"]
    assert specs[0]["model"] == "DNA"
    assert specs[1]["ranges"] == [(501, 900, 3), (1000, 1100, 1)]

    nex = parse_partition_file(
        "#NEXUS\nbegin sets;\n  charset g1 = 1-30;\n"
        "  charset g2 = 31-60;\nend;\n"
    )
    assert [s["name"] for s in nex] == ["g1", "g2"]
    assert all(s["model"] is None for s in nex)

    with pytest.raises(ValueError, match="missing '='"):
        parse_partition_file("DNA, gene1 1-500")
    with pytest.raises(ValueError, match="1-based"):
        parse_partition_file("DNA, g = 0-10")


def test_partitions_from_file_logl_matches_manual_split(setup):
    """File-driven partitions == manually sliced sub-alignments."""
    from phylo_utils_tpu.partition import partitions_from_file

    tree, _ = setup
    aln = _aln(tree, 60, seed=9)
    parts, init = partitions_from_file(
        "HKY85+G2, left = 1-30\nGTR, right = 31-60", aln
    )
    assert init == {}
    pe = PartitionedEngine(tree, parts, link_rates=False)
    ll = pe.loglikelihood()

    manual = [
        Partition("left", {n: s[:30] for n, s in aln.items()},
                  models.HKY85, ncat=2),
        Partition("right", {n: s[30:] for n, s in aln.items()}, models.GTR),
    ]
    ll_manual = PartitionedEngine(tree, manual, link_rates=False).loglikelihood()
    assert abs(ll - ll_manual) < 1e-9


def test_partitions_from_file_stride_and_plus_f(setup):
    """Codon-position strides pick every 3rd column; '+F' entries return
    observed-frequency init params; out-of-range sites are rejected."""
    from phylo_utils_tpu.partition import partitions_from_file

    tree, _ = setup
    aln = _aln(tree, 30, seed=11)
    parts, init = partitions_from_file(
        "DNA+F, p12 = 1-30\\3, 2-30\\3\nDNA, p3 = 3-30\\3", aln
    )
    assert len(parts[0].alignment[tree.leaf_names[0]]) == 20
    assert len(parts[1].alignment[tree.leaf_names[0]]) == 10
    f = np.asarray(init["partitions"]["p12"]["model"]["freqs"])
    assert f.shape == (4,) and abs(f.sum() - 1.0) < 1e-9

    with pytest.raises(ValueError, match="exceeds alignment length"):
        partitions_from_file("DNA, g = 1-31", aln)


def test_simulate_partitions_rates_and_models():
    """Partitioned simulation: correct taxa/lengths per partition, and
    the partition-rate multiplier visibly changes the substitution
    density (fast partition more variable columns than slow)."""
    import jax

    from phylo_utils_tpu.models import HKY85, JC69
    from phylo_utils_tpu.partition import (
        Partition,
        PartitionedEngine,
        simulate_partitions,
    )

    tree = "((a:0.05,b:0.05):0.02,(c:0.05,d:0.05):0.02);"
    rng = np.random.default_rng(1)
    chars = "ACGT"

    def rand_aln(n):
        m = rng.integers(0, 4, size=(4, n))
        return {t: "".join(chars[s] for s in m[i])
                for i, t in enumerate("abcd")}

    parts = [
        Partition("fast", rand_aln(400), JC69),
        Partition("slow", rand_aln(300), HKY85, ncat=4),
    ]
    eng = PartitionedEngine(tree, parts)
    sim = simulate_partitions(
        jax.random.key(0), eng,
        {"partition_rates": [6.0, 0.2],
         "partitions": {"slow": {"alpha": 0.9}}},
    )
    assert set(sim) == {"fast", "slow"}
    assert set(sim["fast"]) == set("abcd")
    assert {len(s) for s in sim["fast"].values()} == {400}
    assert {len(s) for s in sim["slow"].values()} == {300}

    def var_frac(aln):
        cols = list(zip(*aln.values()))
        return np.mean([len(set(c)) > 1 for c in cols])

    assert var_frac(sim["fast"]) > var_frac(sim["slow"]) + 0.1


def test_simulate_partitions_rejects_freerate():
    import jax

    from phylo_utils_tpu.models import JC69
    from phylo_utils_tpu.partition import (
        Partition,
        PartitionedEngine,
        simulate_partitions,
    )

    tree = "((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1);"
    aln = {t: "ACGTACGT" for t in "abcd"}
    parts = [
        Partition("x", aln, JC69, ncat=2, rate_model="free"),
        Partition("y", aln, JC69),
    ]
    eng = PartitionedEngine(tree, parts)
    with pytest.raises(ValueError, match="FreeRate"):
        simulate_partitions(jax.random.key(0), eng)


def test_partitioned_standard_errors():
    """standard_errors works through PartitionedEngine: finite positive
    SEs for shared branch lengths, partition rates, and nested
    per-partition model parameters."""
    import jax

    from phylo_utils_tpu.models import JC69, K80
    from phylo_utils_tpu.optimize import fit, standard_errors
    from phylo_utils_tpu.partition import (
        Partition,
        PartitionedEngine,
        simulate_partitions,
    )

    # Tree-like data (simulated under the tree) so the MLE is interior:
    # uniform-random alignments put the branch-length MLE on the t->inf
    # saturation plateau, where the observed information is ~0 and SEs
    # are legitimately infinite.
    tree = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);"
    sim_eng = PartitionedEngine(tree, [
        Partition("g1", {t: "A" * 400 for t in "abcd"}, JC69),
        Partition("g2", {t: "A" * 300 for t in "abcd"}, K80),
    ])
    sim = simulate_partitions(
        jax.random.key(7), sim_eng,
        {"partitions": {"g2": {"kappa": 4.0}}},
    )
    eng = PartitionedEngine(tree, [
        Partition("g1", sim["g1"], JC69),
        Partition("g2", sim["g2"], K80),
    ])
    res = fit(eng, max_steps=40)
    se = standard_errors(eng, res.params)
    bl = np.asarray(se["branch_lengths"])
    assert bl.shape == np.asarray(res.params["branch_lengths"]).shape
    assert np.isfinite(bl[:-1]).all()  # root pseudo-edge may be pinned
    assert np.isfinite(np.asarray(se["partition_rates"])).all()
    kappa_se = float(np.asarray(se["partitions"]["g2"]["model"]["kappa"]))
    assert np.isfinite(kappa_se) and kappa_se > 0
