"""Molecular clock engine: height reparameterization, LRT, local clocks."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.branch_models import mark_clade
from phylo_utils_tpu.clock import ClockEngine, clock_test
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.simulate import simulate_alignment


def _depth(tree, i):
    d = 0.0
    while tree.parent[i] != -1:
        d += tree.lengths[i]
        i = int(tree.parent[i])
    return d


@pytest.fixture
def small():
    tree = parse_newick("((a:0.1,b:0.1):0.05,(c:0.15,d:0.15):0.0);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    return tree, aln


def test_clock_equals_plain_engine_at_same_lengths(small):
    """ClockEngine logL == LikelihoodEngine at the implied branch lengths
    (the height map is a pure reparameterization)."""
    tree, aln = small
    ce = ClockEngine(tree, aln, models.HKY85, ncat=2)
    full = ce._full_params(None)
    bl = np.asarray(ce._branch_lengths(full, np.float64))
    pe = LikelihoodEngine(tree, aln, models.HKY85, ncat=2)
    ll_c = ce.loglikelihood(full)
    ll_p = pe.loglikelihood({"branch_lengths": bl, "alpha": full["alpha"]})
    assert ll_c == pytest.approx(ll_p, abs=1e-9)
    # heights monotone root->leaf, leaves at 0
    h = ce.node_heights(full)
    for i in range(tree.n_nodes):
        p = int(tree.parent[i])
        if p != -1:
            assert h[p] >= h[i] - 1e-12
    assert all(h[i] == 0.0 for i in range(tree.n_leaves))


def test_clock_fit_is_ultrametric_and_nested(small):
    tree, aln = small
    ce = ClockEngine(tree, aln, models.HKY85)
    res = fit(ce, max_steps=60, patience=10)
    chron = ce.chronogram(res.params)
    depths = [_depth(chron, i) for i in range(tree.n_leaves)]
    assert max(depths) - min(depths) < 1e-9
    # clock is nested in unconstrained: logL must not exceed it
    pe = LikelihoodEngine(tree, aln, models.HKY85)
    res_u = fit(pe, max_steps=60, patience=10)
    assert res.loglik <= res_u.loglik + 1e-6
    # branch_lengths is not a settable parameter on a clock engine
    with pytest.raises(ValueError, match="heights"):
        ce.loglikelihood({"branch_lengths": np.ones(tree.n_nodes)})


def test_clock_lrt_power_and_size():
    """Clock-simulated data: LRT must NOT reject; data with one clade's
    rate tripled: LRT must reject."""
    tree = parse_newick(
        "(((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1):0.05,"
        "(e:0.2,f:0.2):0.05);"
    )  # ultrametric
    aln = simulate_alignment(jax.random.key(0), tree, models.HKY85, 400,
                             params={"kappa": 3.0})
    out = clock_test(tree, aln, models.HKY85, max_steps=80, patience=12)
    assert out["df"] == 4  # 6 taxa -> n-2
    assert out["lrt"]["pvalue"] > 0.01

    stretched = np.array(tree.lengths)
    clade = mark_clade(tree, ["a", "b"]).astype(bool)
    stretched[clade] *= 3.0
    tree_fast = tree.with_lengths(stretched)
    aln2 = simulate_alignment(jax.random.key(1), tree_fast, models.HKY85,
                              400, params={"kappa": 3.0})
    out2 = clock_test(tree, aln2, models.HKY85, max_steps=80, patience=12)
    assert out2["lrt"]["pvalue"] < 0.01


def test_local_clock_recovers_rate_multiplier():
    """Local clock on data whose marked clade evolves 3x faster: the
    fitted multiplier lands above 2, and local-clock logL beats strict."""
    base = parse_newick(
        "(((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1):0.05,(e:0.2,f:0.2):0.05);"
    )
    cls = mark_clade(base, ["e", "f"])
    stretched = np.array(base.lengths)
    stretched[cls.astype(bool)] *= 3.0
    aln = simulate_alignment(jax.random.key(2), base.with_lengths(stretched),
                             models.HKY85, 500, params={"kappa": 3.0})
    strict = ClockEngine(base, aln, models.HKY85)
    res_s = fit(strict, max_steps=80, patience=12)
    local = ClockEngine(base, aln, models.HKY85, branch_classes=cls)
    res_l = fit(local, max_steps=80, patience=12)
    assert res_l.loglik >= res_s.loglik - 1e-6
    mult = float(np.asarray(res_l.params["rate_multipliers"])[0])
    assert mult > 2.0
    # chronogram stays ultrametric even with the local clock
    chron = local.chronogram(res_l.params)
    depths = [_depth(chron, i) for i in range(base.n_leaves)]
    assert max(depths) - min(depths) < 1e-9


def test_clock_gradients_flow(small):
    tree, aln = small
    ce = ClockEngine(tree, aln, models.JC69)
    g = ce.gradient()
    assert np.isfinite(float(np.asarray(g["root_height"])))
    assert np.all(np.isfinite(np.asarray(g["height_fractions"])))
    assert np.asarray(g["height_fractions"]).shape == (ce.n_internal - 1,)


def test_clock_edge_cases():
    """2-leaf trees (no fractions), multifurcations, trifurcating-root
    clock_test df."""
    t2 = parse_newick("(a:0.1,b:0.2);")
    ce = ClockEngine(t2, {"a": "ACGTACGT", "b": "ACCTACGA"}, models.JC69)
    r = fit(ce, max_steps=30, patience=8)
    assert np.isfinite(r.loglik)
    assert float(r.params["root_height"]) > 0

    tm = parse_newick("((a:0.1,b:0.1,c:0.1):0.05,(d:0.15,e:0.15):0.0);")
    alnm = {n: "ACGTACGTGG" for n in "abcde"}
    cem = ClockEngine(tm, alnm, models.JC69)
    assert np.isfinite(cem.loglikelihood())

    t3 = parse_newick("(a:0.1,b:0.2,(c:0.3,d:0.1):0.2);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    out = clock_test(t3, aln, models.JC69, max_steps=25, patience=6)
    assert out["df"] >= 1 and np.isfinite(out["lrt"]["pvalue"])


def test_node_height_errors():
    """Delta-method node-age SEs: finite and positive on all internal
    nodes, and the root-height SE tracks a parametric bootstrap."""
    from phylo_utils_tpu.clock import node_height_errors

    truth = parse_newick(
        "(((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1):0.05,(e:0.2,f:0.2):0.05);"
    )
    aln = simulate_alignment(jax.random.key(0), truth, models.HKY85, 600,
                             params={"kappa": 3.0})
    ce = ClockEngine(truth, aln, models.HKY85)
    res = fit(ce, max_steps=150, patience=20)
    se = node_height_errors(ce, res.params)
    assert set(se) == {6, 7, 8, 9, 10}
    assert all(np.isfinite(v) and v > 0 for v in se.values())
    boots = []
    for r in range(8):
        a2 = simulate_alignment(jax.random.key(50 + r), truth,
                                models.HKY85, 600, params={"kappa": 3.0})
        e2 = ClockEngine(truth, a2, models.HKY85)
        r2 = fit(e2, max_steps=100, patience=12)
        boots.append(e2.node_heights(r2.params)[truth.root])
    ratio = se[truth.root] / np.std(boots)
    assert 0.3 < ratio < 3.0, (se[truth.root], np.std(boots))


def test_penalized_likelihood_dating_recovers_ages():
    """Sanderson-2002 PL dating: exact age recovery on a strict-clock
    phylogram; high age correlation when per-edge rates vary
    (lognormal) and the autocorrelation penalty must disentangle
    rate from time."""
    from phylo_utils_tpu.clock import (
        _initial_heights,
        penalized_likelihood_dating,
    )
    from phylo_utils_tpu.trees import random_tree

    base = random_tree(10, seed=7, mean_brlen=0.1)
    h = _initial_heights(base)
    true_dur = np.zeros(base.n_nodes)
    for i in range(base.n_nodes):
        p = int(base.parent[i])
        if p != -1:
            true_dur[i] = h[p] - h[i]
    root_age = h[base.root]
    internal = range(base.n_leaves, base.n_nodes)
    tru = np.array([h[n] for n in internal])

    out = penalized_likelihood_dating(
        base.with_lengths(true_dur), n_sites=2000, root_age=root_age,
        lam=1.0,
    )
    est = np.array([out["ages"][int(n)] for n in internal])
    assert (np.abs(est - tru) / root_age).max() < 0.05
    r = out["rates"][out["rates"] > 0]
    assert abs(r.mean() - 1.0) < 0.1              # strict clock: rate 1
    # chronogram edge lengths are the durations; root age preserved
    assert out["ages"][base.root] == pytest.approx(root_age)

    rng = np.random.default_rng(1)
    rates_true = np.exp(rng.normal(0, 0.3, base.n_nodes))
    out2 = penalized_likelihood_dating(
        base.with_lengths(true_dur * rates_true), n_sites=2000,
        root_age=root_age, lam=0.5,
    )
    est2 = np.array([out2["ages"][int(n)] for n in internal])
    assert np.corrcoef(est2, tru)[0, 1] > 0.9


def test_calibrated_dating_recovers_absolute_ages():
    """r4: one MRCA calibration turns relative PL dating into absolute
    dating — simulated relaxed-clock phylogram, true ages in My units,
    a single exact calibration on an internal clade; all other node ages
    must come back in absolute units within tolerance."""
    from phylo_utils_tpu.clock import (
        _initial_heights,
        mrca,
        penalized_likelihood_dating,
    )
    from phylo_utils_tpu.trees import random_tree

    base = random_tree(10, seed=7, mean_brlen=0.1)
    h = _initial_heights(base)
    scale = 50.0 / h[base.root]          # true root age: 50 My
    ages_true = h * scale
    true_dur = np.zeros(base.n_nodes)
    for i in range(base.n_nodes):
        p = int(base.parent[i])
        if p != -1:
            true_dur[i] = ages_true[p] - ages_true[i]
    # relaxed clock: per-edge rates lognormal around 0.01 subs/site/My
    rng = np.random.default_rng(3)
    rates_true = 0.01 * np.exp(rng.normal(0, 0.2, base.n_nodes))
    phylogram = base.with_lengths(true_dur * rates_true)

    # calibrate ONE internal node (not the root) at its true age, by MRCA
    cal_node = int(base.children[base.root][0])
    if not base.children[cal_node]:          # ensure internal
        cal_node = int(base.children[base.root][1])
    clade = [base.names[i] for i in range(base.n_leaves)
             if _is_descendant(base, i, cal_node)]
    assert mrca(base, clade) == cal_node
    out = penalized_likelihood_dating(
        phylogram, n_sites=5000, lam=1.0,
        calibrations={tuple(clade): float(ages_true[cal_node])},
    )
    assert out["max_calibration_violation"] < 0.5
    internal = range(base.n_leaves, base.n_nodes)
    est = np.array([out["ages"][int(n)] for n in internal])
    tru = np.array([ages_true[int(n)] for n in internal])
    # absolute ages within 15% of the root age
    assert (np.abs(est - tru) / ages_true[base.root]).max() < 0.15
    # interval calibration + violation reporting
    out2 = penalized_likelihood_dating(
        phylogram, n_sites=5000, lam=1.0,
        calibrations={cal_node: (0.8 * ages_true[cal_node],
                                 1.2 * ages_true[cal_node])},
    )
    a2 = out2["ages"][cal_node]
    assert 0.75 * ages_true[cal_node] < a2 < 1.25 * ages_true[cal_node]


def _is_descendant(tree, node, anc):
    while node != -1:
        if node == anc:
            return True
        node = int(tree.parent[node])
    return False


def test_cross_validate_lambda_prefers_smoothing_on_clocklike_data():
    """Sanderson CV: on strict-clock data heavy smoothing predicts held-out
    terminals at least as well as (nearly) no smoothing; returns the grid
    scores and a best lambda from the grid."""
    from phylo_utils_tpu.clock import _initial_heights, cross_validate_lambda
    from phylo_utils_tpu.trees import random_tree

    base = random_tree(8, seed=11, mean_brlen=0.12)
    h = _initial_heights(base)
    dur = np.zeros(base.n_nodes)
    for i in range(base.n_nodes):
        p = int(base.parent[i])
        if p != -1:
            dur[i] = h[p] - h[i]
    out = cross_validate_lambda(
        base.with_lengths(dur), n_sites=2000,
        lambdas=(0.01, 1.0, 100.0), root_age=float(h[base.root]),
        steps=800,
    )
    assert set(out["scores"]) == {0.01, 1.0, 100.0}
    assert out["lambda"] in out["scores"]
    # strict-clock truth: every lambda predicts held-out terminals well
    # (chi-square score summed over all 8 terminals stays tiny relative
    # to the ~hundreds-of-substitutions counts being predicted)
    assert max(out["scores"].values()) < 1.0


def test_calibration_validation_errors():
    from phylo_utils_tpu.clock import mrca, penalized_likelihood_dating
    from phylo_utils_tpu.trees import random_tree

    base = random_tree(6, seed=1)
    with pytest.raises(ValueError, match="min .* > max|min"):
        penalized_likelihood_dating(
            base, n_sites=100, calibrations={base.root: (5.0, 1.0)})
    with pytest.raises(ValueError, match="not an internal node"):
        penalized_likelihood_dating(
            base, n_sites=100, calibrations={0: 1.0})
    with pytest.raises(ValueError, match="unknown leaf"):
        mrca(base, ["nope"])
