"""Optimization layer: reparameterization, joint fit, Newton branch lengths,
1-D safeguarded minimizers (reference optimisation.py parity, SURVEY.md §2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import (
    brent_minimize,
    fit,
    golden_section,
    newton_branch_length,
    transform_params,
    untransform_params,
)
from phylo_utils_tpu.trees import random_tree


def _aln(tree, sites, seed=0):
    rng = np.random.default_rng(seed)
    return {
        n: "".join(rng.choice(list("ACGT"), size=sites))
        for n in tree.leaf_names
    }


def test_transform_roundtrip():
    params = {
        "branch_lengths": jnp.asarray([0.1, 2.0, 1e-4]),
        "model": {"kappa": jnp.asarray(3.5), "freqs": jnp.asarray([0.1, 0.2, 0.3, 0.4])},
        "alpha": jnp.asarray(0.47),
        "pinv": jnp.asarray(0.23),
    }
    back = untransform_params(transform_params(params))
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fit_improves_and_reaches_optimum_neighborhood():
    tree = random_tree(6, seed=1)
    aln = _aln(tree, 200, seed=2)
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=4)
    start = engine.default_params()
    ll0 = engine.loglikelihood(start)
    res = fit(engine, start, max_steps=200, patience=30)
    assert res.loglik > ll0 + 1.0
    # gradient at optimum ~ 0 for free parameters
    g = engine.gradient(res.params)
    gnorm = max(
        float(jnp.max(jnp.abs(x)))
        for x in [g["branch_lengths"], g["model"]["kappa"], g["alpha"]]
    )
    assert gnorm < 0.5


def test_fit_respects_free_subset():
    tree = random_tree(5, seed=3)
    aln = _aln(tree, 100, seed=4)
    engine = LikelihoodEngine(tree, aln, models.K80)
    start = engine.default_params()
    res = fit(engine, start, free=("branch_lengths",), max_steps=60)
    np.testing.assert_allclose(
        np.asarray(res.params["model"]["kappa"]),
        np.asarray(start["model"]["kappa"]),
    )
    assert not np.allclose(
        np.asarray(res.params["branch_lengths"]),
        np.asarray(start["branch_lengths"]),
    )


def test_newton_branch_length_matches_scan_optimum():
    """Two-leaf 'tree': Newton's t* must maximize the pairwise logL, checked
    against a dense scan of the 1-D likelihood surface."""
    eig = models.HKY85.eigen({"kappa": 2.0}, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    a = np.maximum((rng.random((60, 4)) > 0.5).astype(float), 1e-6)
    b = np.maximum((rng.random((60, 4)) > 0.5).astype(float), 1e-6)
    w = np.ones(60)
    t_star, lnl_star = newton_branch_length(
        eig, jnp.asarray(a), jnp.asarray(b), jnp.asarray(w), t0=0.5
    )
    from phylo_utils_tpu.optimize import _branch_lnl_derivs

    ts = np.linspace(1e-4, 5.0, 2000)
    lnls = [
        float(_branch_lnl_derivs(eig, jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(w), jnp.asarray(t))[0])
        for t in ts
    ]
    t_grid = ts[int(np.argmax(lnls))]
    assert float(lnl_star) >= max(lnls) - 1e-6
    assert abs(float(t_star) - t_grid) < 5e-3 or float(lnl_star) >= max(lnls)


@pytest.mark.parametrize("minimizer", [golden_section, brent_minimize])
def test_1d_minimizers(minimizer):
    fn = lambda x: (x - 1.234) ** 2 + 0.5
    x, fx = minimizer(fn, 0.0, 10.0)
    assert abs(float(x) - 1.234) < 1e-4
    assert abs(float(fx) - 0.5) < 1e-7


def test_fit_recovers_simulation_parameters_roughly():
    """Fit GTR+G branch lengths on oracle-defined data: logL after fit must
    beat logL at the true generating parameters' neighborhood start."""
    tree = random_tree(8, seed=11)
    aln = _aln(tree, 300, seed=12)
    engine = LikelihoodEngine(tree, aln, models.GTR, ncat=2)
    res = fit(engine, max_steps=120, patience=20)
    # cross-check the fitted optimum against the float64 oracle
    rates = oracle.discrete_gamma(float(res.params["alpha"]), 2)
    om = oracle.gtr(
        np.asarray(res.params["model"]["rates"]),
        np.asarray(res.params["model"]["freqs"]),
    )
    tree_fit = tree.with_lengths(np.asarray(res.params["branch_lengths"]))
    ll_oracle = oracle.loglikelihood(tree_fit, aln, om, rates=rates)
    assert res.loglik == pytest.approx(ll_oracle, abs=1e-5)


def test_ml_distance_matrix_two_taxa_matches_newton():
    from phylo_utils_tpu.optimize import ml_distance_matrix

    rng = np.random.default_rng(3)
    base = rng.choice(list("ACGT"), size=2000)

    def mutate(seq, p):
        out = seq.copy()
        hit = rng.random(seq.size) < p
        out[hit] = rng.choice(list("ACGT"), size=int(hit.sum()))
        return out

    aln = {
        "x": "".join(base),
        "y": "".join(mutate(base, 0.15)),
        "z": "".join(mutate(base, 0.35)),
    }
    d = ml_distance_matrix(aln, models.JC69)
    assert d.shape == (3, 3)
    assert np.allclose(d, d.T) and np.allclose(np.diag(d), 0)
    # JC69 ML distance has a closed form: d = -3/4 ln(1 - 4p/3), p = mismatch
    names = list(aln)
    for a in range(3):
        for b in range(a + 1, 3):
            p = np.mean([c1 != c2 for c1, c2 in zip(aln[names[a]], aln[names[b]])])
            closed = -0.75 * np.log(1 - 4 * p / 3)
            assert d[a, b] == pytest.approx(closed, rel=1e-3, abs=1e-4)


def test_fit_chunked_steps_matches_unchunked():
    tree = random_tree(5, seed=21)
    aln = _aln(tree, 150, seed=22)
    import optax

    engine = LikelihoodEngine(tree, aln, models.K80)
    # deterministic optimizer so chunking is bit-compatible step-for-step
    r1 = fit(engine, optimizer=optax.adam(0.02), max_steps=40,
             patience=1000, steps_per_call=1)
    r8 = fit(engine, optimizer=optax.adam(0.02), max_steps=40,
             patience=1000, steps_per_call=8)
    np.testing.assert_allclose(r1.trace, r8.trace, rtol=1e-6)
    assert r1.n_steps == r8.n_steps == 40


def test_fit_returned_loglik_matches_returned_params():
    """Regression (code-review finding): FitResult.loglik must be the logL
    OF FitResult.params even when the last optimizer step overshoots."""
    import optax

    tree = random_tree(5, seed=31)
    aln = _aln(tree, 120, seed=32)
    engine = LikelihoodEngine(tree, aln, models.K80)
    # absurd lr so steps overshoot wildly
    res = fit(engine, optimizer=optax.sgd(5.0), max_steps=8, patience=100)
    assert res.loglik == pytest.approx(
        engine.loglikelihood(res.params), abs=1e-9
    )
    # chunked path keeps the same invariant
    res2 = fit(engine, optimizer=optax.sgd(5.0), max_steps=8, patience=100,
               steps_per_call=4)
    assert res2.loglik == pytest.approx(
        engine.loglikelihood(res2.params), abs=1e-9
    )


def test_fit_checkpoint_resume_bitexact(tmp_path):
    """A killed-and-restarted fit must replay the remaining steps exactly.

    Compare the step-20 full-state checkpoint from (a) an uninterrupted
    20-step run and (b) a run killed at step 10 and resumed from its
    checkpoint: every leaf (params in raw space + adam state) must be
    bit-identical (VERDICT r1 item 9 / SURVEY.md §5 checkpoint row).
    """
    import optax

    tree = random_tree(6, seed=4)
    engine = LikelihoodEngine(tree, _aln(tree, 40, seed=5), models.HKY85)
    pa = str(tmp_path / "a.npz")
    pb = str(tmp_path / "b.npz")
    kw = dict(
        optimizer=optax.adam(1e-2), patience=10_000, steps_per_call=5,
        checkpoint_every=10,
    )
    fit(engine, max_steps=20, checkpoint_path=pa, **kw)

    fit(engine, max_steps=10, checkpoint_path=pb, **kw)   # "crash" at 10
    res = fit(engine, max_steps=20, checkpoint_path=pb, resume_from=pb, **kw)
    assert res.n_steps == 20  # total count includes the restored 10

    with np.load(pa) as za, np.load(pb) as zb:
        assert set(za.files) == set(zb.files)
        for key in za.files:
            assert np.array_equal(za[key], zb[key]), key


def test_fit_dotted_free_keys():
    """'shared.kappa' frees kappa while freezing sibling freqs (codeml's
    fixed-empirical-frequency convention)."""
    import jax

    from phylo_utils_tpu.io import encode_codon_alignment
    from phylo_utils_tpu.mixtures import M1aEngine
    from phylo_utils_tpu.models.codon import empirical_codon_frequencies
    from phylo_utils_tpu.simulate import simulate_alignment

    tree = random_tree(5, seed=11, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(9), tree, models.GY94, 30,
                             params={"omega": 0.4, "kappa": 3.0})
    ca = encode_codon_alignment(aln)
    f3 = empirical_codon_frequencies(aln, "f3x4")
    eng = M1aEngine(tree, ca)
    res = fit(eng, params0={"shared": {"freqs": f3}},
              free=("branch_lengths", "shared.kappa", "proportions",
                    "omega0"),
              max_steps=25)
    np.testing.assert_allclose(
        np.asarray(res.params["shared"]["freqs"]), f3, atol=1e-12
    )
    assert float(res.params["shared"]["kappa"]) != pytest.approx(2.0)
    with pytest.raises(ValueError, match="unknown free"):
        fit(eng, free=("kapa",), max_steps=1)
    with pytest.raises(ValueError, match="both whole"):
        fit(eng, free=("shared", "shared.kappa"), max_steps=1)


def test_standard_errors_with_free_alpha_fd_fallback():
    """jax.hessian cannot differentiate twice through the gamma-quantile
    inversion (no rule for igamma_grad_a); with alpha free the Fisher
    information must fall back to central differences of the EXACT
    gradient and still produce finite, consistent SEs."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.optimize import standard_errors
    from phylo_utils_tpu.simulate import simulate_alignment

    truth = parse_newick("((a:0.12,b:0.18):0.1,(c:0.25,d:0.08):0.15);")
    aln = simulate_alignment(jax.random.key(7), truth, models.K80, 400,
                             params={"kappa": 3.0, "alpha": 0.6}, ncat=4)
    eng = LikelihoodEngine(truth, aln, models.K80, ncat=4)
    res = fit(eng, max_steps=250)
    se = standard_errors(eng, res.params)      # alpha free -> FD path
    assert np.isfinite(float(se["alpha"])) and float(se["alpha"]) > 0
    assert np.isfinite(float(se["model"]["kappa"]))
    # the FD Hessian must agree with the exact one on the alpha-free
    # sub-problem (same engine/params, alpha frozen)
    se_exact = standard_errors(eng, res.params,
                               free=("branch_lengths", "model"))
    se_fd_k = float(se["model"]["kappa"])
    se_ex_k = float(se_exact["model"]["kappa"])
    # covariance with/without alpha differs slightly; same scale
    assert 0.5 * se_ex_k < se_fd_k < 2.0 * se_ex_k


def test_standard_errors_match_parametric_bootstrap():
    """Fisher-information SEs (exact Hessian) track parametric-bootstrap
    SEs for kappa and pendant branch lengths; the unused root entry is
    nan."""
    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.optimize import standard_errors
    from phylo_utils_tpu.simulate import simulate_alignment

    truth = parse_newick("((a:0.12,b:0.18):0.1,(c:0.25,d:0.08):0.15);")
    aln = simulate_alignment(jax.random.key(0), truth, models.K80, 500,
                             params={"kappa": 3.0})
    eng = LikelihoodEngine(truth, aln, models.K80)
    res = fit(eng, max_steps=250, patience=25)
    se = standard_errors(eng, res.params, free=("branch_lengths", "model"))
    se_k = float(np.asarray(se["model"]["kappa"]))
    se_bl = np.asarray(se["branch_lengths"])
    assert np.isnan(se_bl[-1])          # root entry: no curvature
    assert np.all(se_bl[:4] > 0)

    ks, bls = [], []
    for r in range(12):
        a2 = simulate_alignment(jax.random.key(100 + r), truth,
                                models.K80, 500, params={"kappa": 3.0})
        r2 = fit(LikelihoodEngine(truth, a2, models.K80),
                 max_steps=150, patience=15)
        ks.append(float(np.asarray(r2.params["model"]["kappa"])))
        bls.append(np.asarray(r2.params["branch_lengths"]))
    boot_k = np.std(ks)
    boot_bl = np.std(np.stack(bls), axis=0)
    assert 0.4 < se_k / boot_k < 2.5
    for i in range(4):                  # pendant branches: identifiable
        assert 0.4 < se_bl[i] / boot_bl[i] < 2.5, (i, se_bl[i], boot_bl[i])


def test_chunked_fit_returns_optimized_params_f32():
    """Regression: chunked fits (steps_per_call>1) on an f32 engine used
    to return the STARTING params — intra-chunk loss values (with no
    retained raw) ratcheted `best` past every retained candidate."""
    import jax

    from phylo_utils_tpu.io import parse_newick
    from phylo_utils_tpu.simulate import simulate_alignment

    tree = parse_newick("((a:0.12,b:0.18):0.1,(c:0.25,d:0.08):0.15);")
    aln = simulate_alignment(jax.random.key(1), tree, models.K80, 400,
                             params={"kappa": 3.0})
    eng = LikelihoodEngine(tree, aln, models.K80, dtype="float32")
    res1 = fit(eng, max_steps=150)
    res10 = fit(eng, max_steps=150, steps_per_call=10)
    assert res10.loglik == pytest.approx(res1.loglik, abs=0.5)
    # and decisively better than the start
    start_ll = eng.loglikelihood()
    assert res10.loglik > start_ll + 1.0


def test_fit_multistart_at_least_single_start():
    from phylo_utils_tpu.optimize import fit_multistart
    from phylo_utils_tpu.simulate import simulate_alignment

    tree = random_tree(6, seed=2)
    aln = simulate_alignment(jax.random.key(3), tree, models.HKY85, 200,
                             params={"kappa": 3.0})
    eng = LikelihoodEngine(tree, aln, models.HKY85)
    single = fit(eng, max_steps=120)
    multi = fit_multistart(eng, n_starts=3, max_steps=120, seed=1)
    assert multi.loglik >= single.loglik - 1e-6
    # perturbed starts stay in the constrained domain (kappa > 0)
    assert float(multi.params["model"]["kappa"]) > 0
