"""Profile mixtures (C-series / LG4X family): engine, loader, estimation.

The published C10-C60/LG4X numeric tables are not vendored (offline build;
see profile_mixtures.py docstring) — these tests exercise the machinery
with declared synthetic profiles: oracle parity of the mixture logL, AIC
superiority over LG+G4 on profile-heterogeneous data (the VERDICT r3
item-7 'done' gate), ML profile estimation, per-class rates, and the
models.nex loader the published definitions plug into.
"""
import numpy as np
import pytest

import oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.profile_mixtures import (
    ProfileMixtureEngine,
    parse_nexus_models,
    profile_mixture_from_nexus,
)

AA = "ARNDCQEGHILKMFPSTWYV"


def _profiles():
    """Three sharply distinct synthetic profiles (hydrophobic-ish,
    charged-ish, small-residue-ish) — declared test data, not published
    constants."""
    base = np.full(20, 0.02)
    prof = np.tile(base, (3, 1))
    for k, boost in enumerate([
        ("A", "V", "I", "L", "F", "M"),
        ("D", "E", "K", "R", "H"),
        ("G", "S", "T", "N", "P"),
    ]):
        for ch in boost:
            prof[k, AA.index(ch)] = 0.12
    return prof / prof.sum(axis=1, keepdims=True)


@pytest.fixture(scope="module")
def het_data():
    """Alignment simulated under a 3-profile LG mixture (heterogeneous
    across sites), plus the tree."""
    import jax

    from phylo_utils_tpu.simulate import simulate_mixture_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(12, seed=4, mean_brlen=0.25)
    prof = _profiles()
    aln, classes = simulate_mixture_alignment(
        jax.random.key(1), tree, models.LG, 600,
        mixture=[{"freqs": tuple(p.tolist())} for p in prof],
        weights=[0.5, 0.3, 0.2],
    )
    return tree, aln, prof, classes


def test_profile_mixture_matches_oracle(het_data):
    """Mixture logL == log of the weight-averaged per-class ORACLE site
    likelihoods (linear-space mixing with class-specific frequencies)."""
    tree, aln, prof, _ = het_data
    weights = np.array([0.5, 0.3, 0.2])
    eng = ProfileMixtureEngine(tree, aln, models.LG, profiles=prof,
                               weights=weights, dtype="float64")
    got = eng.loglikelihood()

    per_class = []
    for p in prof:
        m = oracle.lg(freqs=p)
        _, sw = oracle.loglikelihood(tree, aln, m, alphabet="protein",
                                     return_sitewise=True)
        per_class.append(sw)
    per_class = np.asarray(per_class)                  # (K, sites) logL
    m0 = per_class.max(axis=0)
    gold = float(np.sum(
        np.log(np.sum(weights[:, None] * np.exp(per_class - m0), axis=0))
        + m0
    ))
    assert got == pytest.approx(gold, rel=1e-9)


def test_profile_mixture_beats_lg_gamma_by_aic(het_data):
    """On profile-heterogeneous data the profile mixture must beat LG+G4
    by AIC (the r3 VERDICT item-7 'done' criterion)."""
    tree, aln, prof, _ = het_data
    gamma = LikelihoodEngine(tree, aln, models.LG, ncat=4, dtype="float64")
    r_gamma = fit(gamma, free=("branch_lengths", "alpha"),
                  max_steps=200, patience=15)
    k_gamma = tree.n_nodes - 1 + 1                     # brlens + alpha

    mix = ProfileMixtureEngine(tree, aln, models.LG, profiles=prof,
                               dtype="float64")
    r_mix = fit(mix, free=("branch_lengths", "cat_weights"),
                max_steps=200, patience=15)
    k_mix = tree.n_nodes - 1 + (3 - 1)                 # brlens + weights

    aic_gamma = 2 * k_gamma - 2 * r_gamma.loglik
    aic_mix = 2 * k_mix - 2 * r_mix.loglik
    assert aic_mix < aic_gamma - 10.0, (aic_mix, aic_gamma)


def test_profile_estimation_improves_wrong_profiles(het_data):
    """ML profile estimation (free 'mixture'): starting from perturbed
    LG frequencies, fitting the profiles must beat fitting weights alone
    from the same start — the CAT-with-fixed-K capability."""
    tree, aln, _, _ = het_data
    eng = ProfileMixtureEngine(tree, aln, models.LG, profiles=3,
                               seed=2, dtype="float64")
    fixed = fit(eng, free=("branch_lengths", "cat_weights"),
                max_steps=150, patience=15)
    est = fit(eng, free=("branch_lengths", "cat_weights", "mixture"),
              max_steps=300, patience=20)
    assert est.loglik > fixed.loglik + 5.0
    # estimated profiles are valid simplexes
    p = np.asarray(est.params["mixture"]["freqs"])
    assert p.shape == (3, 20)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-6)
    assert np.all(p > 0)


def test_class_rates_lg4x_style(het_data):
    """Free per-class rates (LG4X coupling): engine accepts and
    normalizes them; fitting rates must not lose likelihood."""
    tree, aln, prof, _ = het_data
    eng = ProfileMixtureEngine(tree, aln, models.LG, profiles=prof,
                               class_rates="free", dtype="float64")
    p = eng.default_params()
    assert p["class_rates"].shape == (3,)
    base = eng.loglikelihood()
    r = fit(eng, free=("branch_lengths", "cat_weights", "class_rates"),
            max_steps=150, patience=15)
    assert r.loglik >= base - 1e-6
    # explicit-rate starting values are validated
    with pytest.raises(ValueError, match="positive"):
        ProfileMixtureEngine(tree, aln, models.LG, profiles=prof,
                             class_rates=[1.0, -1.0, 1.0])
    with pytest.raises(ValueError, match="shape"):
        ProfileMixtureEngine(tree, aln, models.LG, profiles=prof,
                             class_rates=[1.0, 2.0])


NEX = """#nexus
begin models;
    [ synthetic 2-class test mixture ]
    frequency TESTpi1 = {f1};
    frequency TESTpi2 = {f2};
    model TEST = LG+FMIX{{TESTpi1:1.0:0.6,TESTpi2:1.0:0.4}};
    model TESTR = LG+FMIX{{TESTpi1:0.5:0.6,TESTpi2:2.0:0.4}};
end;
"""


def test_nexus_loader_roundtrip(tmp_path, het_data):
    tree, aln, prof, _ = het_data
    f1 = " ".join(f"{x:.6f}" for x in prof[0])
    f2 = " ".join(f"{x:.6f}" for x in prof[1])
    path = tmp_path / "models.nex"
    path.write_text(NEX.format(f1=f1, f2=f2))

    defs = parse_nexus_models(str(path))
    assert set(defs["frequencies"]) == {"TESTpi1", "TESTpi2"}
    np.testing.assert_allclose(defs["frequencies"]["TESTpi1"], prof[0],
                               atol=1e-6)
    assert defs["models"]["TEST"]["base"] == "LG"
    assert defs["models"]["TEST"]["classes"][0] == ("TESTpi1", 1.0, 0.6)

    eng = profile_mixture_from_nexus(str(path), "TEST", tree, aln,
                                     models.LG, dtype="float64")
    assert eng.ncat == 2
    w = np.asarray(eng.default_params()["cat_weights"])
    np.testing.assert_allclose(w, [0.6, 0.4], atol=1e-7)
    assert np.isfinite(eng.loglikelihood())
    # per-class rates from the file engage the class_rates parameter
    eng_r = profile_mixture_from_nexus(str(path), "TESTR", tree, aln,
                                       models.LG, dtype="float64")
    pr = eng_r.default_params()
    np.testing.assert_allclose(np.asarray(pr["class_rates"]), [0.5, 2.0])
    with pytest.raises(ValueError, match="not in file"):
        profile_mixture_from_nexus(str(path), "C60", tree, aln, models.LG)


def test_profile_validation():
    tree = parse_newick("((a:0.1,b:0.1):0.05,(c:0.1,d:0.1):0.05);")
    aln = {n: "ARND" for n in "abcd"}
    with pytest.raises(ValueError, match="positive"):
        ProfileMixtureEngine(tree, aln, models.LG,
                             profiles=np.zeros((2, 20)))
    with pytest.raises(ValueError, match="states"):
        ProfileMixtureEngine(tree, aln, models.LG,
                             profiles=np.full((2, 4), 0.25))
