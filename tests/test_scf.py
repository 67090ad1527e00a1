"""Site concordance factors (Minh-Hahn-Lanfear 2020)."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.supports import site_concordance
from phylo_utils_tpu.trees import random_tree


def test_scf_high_on_clean_data_low_on_noise():
    # moderate branch lengths: long branches induce genuine homoplasy
    # (the parsimony-style counting is LBA-prone — a documented property
    # of sCF, Minh et al. 2020), so expectations are per-edge >= ~1/3
    # and high on average, not uniformly near 100
    tree = random_tree(10, seed=5, mean_brlen=0.05)
    aln = simulate_alignment(jax.random.key(3), tree, models.JC69, 3000)
    out = site_concordance(tree, aln, n_quartets=60, seed=1)
    assert len(out["edges"]) >= 4
    assert (out["scf"] >= 30).all()
    assert out["scf"].mean() > 60               # generating tree: strong
    # concordant + the two discordant fractions partition decisive sites
    np.testing.assert_allclose(
        out["scf"] + out["sdf1"] + out["sdf2"], 100.0, atol=1e-9
    )

    # random (structureless) data: sCF hovers near the 1/3 baseline
    rng = np.random.default_rng(0)
    noise = {n: "".join(rng.choice(list("ACGT"), size=3000))
             for n in tree.leaf_names}
    out2 = site_concordance(tree, noise, n_quartets=60, seed=1)
    assert (np.abs(out2["scf"] - 100.0 / 3.0) < 12).all()
    # clean data clearly beats noise on every edge
    assert out["scf"].mean() > out2["scf"].mean() + 20


def test_scf_handles_gaps_and_protein():
    tree = random_tree(8, seed=2, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(5), tree, models.LG, 800)
    # inject gaps/missing
    aln = {k: ("-" + v[1:-1] + "X") for k, v in aln.items()}
    out = site_concordance(tree, aln, n_quartets=40, seed=0)
    assert len(out["edges"]) >= 2
    assert (out["scf"] >= 0).all() and (out["scf"] <= 100).all()
    assert (out["n_decisive"] > 0).all()


def test_gene_concordance_and_abayes():
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.supports import alrt_supports, gene_concordance
    from phylo_utils_tpu.trees import nni_neighbors

    ref = parse_newick(
        "(((a:1,b:1):1,(c:1,d:1):1):1,((e:1,f:1):1,g:1):1);"
    )
    # unanimous gene trees -> gCF 100 everywhere
    out = gene_concordance(ref, [ref, ref, ref])
    assert len(out["edges"]) >= 3
    np.testing.assert_allclose(out["gcf"], 100.0)
    # one conflicting gene lowers at least one edge; counts stay coherent
    out2 = gene_concordance(ref, [ref, ref, nni_neighbors(ref)[0]])
    assert (out2["gcf"] <= 100.0).all()
    assert (out2["gcf"] < 100.0).any()
    assert (out2["n_informative"] == 3).all()
    # gene missing taxa: edges it cannot inform keep their counts
    sub = parse_newick("(((a:1,b:1):1,(c:1,d:1):1):1,e:1);")
    out3 = gene_concordance(ref, [ref, sub])
    assert (out3["n_informative"] >= 1).all()
    assert (out3["n_informative"] <= 2).all()

    # aBayes rides alrt_supports: high for well-supported edges
    tree = random_tree(6, seed=2, mean_brlen=0.3)
    aln = simulate_alignment(jax.random.key(7), tree, models.JC69, 800)
    sup = alrt_supports(tree, aln, models.JC69)
    assert sup["abayes"].shape == (len(sup["edges"]),)
    assert ((sup["abayes"] >= 0) & (sup["abayes"] <= 1)).all()
    assert sup["abayes"].mean() > 0.6


def test_scf_covers_all_internal_edges_both_rootings():
    """Regression (code review r3b): trifurcating-root trees lost every
    root-adjacent branch; bifurcating roots double-reported one branch."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.supports import nni_alternatives_by_edge

    aln = {n: "ACGTACGTACGTACGT" for n in "abcdefgh"}
    tri = parse_newick(
        "((a:1,b:1):1,(c:1,d:1):1,((e:1,f:1):1,(g:1,h:1):1):1);"
    )
    out = site_concordance(tri, aln, n_quartets=5)
    assert set(out["edges"]) >= set(nni_alternatives_by_edge(tri))
    bi = parse_newick(
        "(((a:1,b:1):1,(c:1,d:1):1):1,((e:1,f:1):1,(g:1,h:1):1):1);"
    )
    out2 = site_concordance(bi, aln, n_quartets=5)
    rk = bi.children[bi.root]
    assert max(rk) not in out2["edges"]
    assert len(out2["edges"]) == len(set(out2["edges"]))
