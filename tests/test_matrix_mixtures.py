"""Per-class MATRIX mixtures (LG4M/LG4X family) — VERDICT r4 item 7.

Each mixture class carries its OWN exchangeability matrix (not just its
own frequency profile): ``ModelMixtureEngine(class_models=...)`` /
``ProfileMixtureEngine(class_models=...)``, plus the ``models.nex``
matrix-mixture syntax (``model NAME = MIX{mat1,mat2,...};`` with
GTR20-style matrix definitions).

The published LG4X numeric tables are not vendored (offline build — see
profile_mixtures.py); the machinery is exercised with LG/WAG and
deterministic in-test variants.
"""
import jax
import numpy as np
import pytest

import oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.data import LG_FREQS, LG_RATES, WAG_FREQS, WAG_RATES
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.models.base import Model
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.profile_mixtures import (
    ProfileMixtureEngine,
    parse_nexus_models,
    profile_mixture_from_nexus,
)
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import random_tree


def _variant(rates, power):
    """Deterministic exchangeability variant: elementwise power then
    re-symmetrized (stays symmetric, positive, distinct spectrum)."""
    v = np.asarray(rates, np.float64) ** power
    np.fill_diagonal(v, 0.0)
    return v


def _class_defs():
    """Four (sym, freqs) classes: LG, WAG, and two declared variants."""
    syms = [
        np.asarray(LG_RATES, np.float64),
        np.asarray(WAG_RATES, np.float64),
        _variant(LG_RATES, 0.6),
        _variant(WAG_RATES, 1.4),
    ]
    freqs = [
        np.asarray(LG_FREQS, np.float64),
        np.asarray(WAG_FREQS, np.float64),
        np.asarray(WAG_FREQS, np.float64),
        np.asarray(LG_FREQS, np.float64),
    ]
    return syms, [f / f.sum() for f in freqs]


def _make_models(syms, freqs):
    out = []
    for i, (s, f) in enumerate(zip(syms, freqs)):
        def _mk(s_const):
            def _build(freqs):
                import jax.numpy as jnp

                freqs = jnp.asarray(freqs)
                return jnp.asarray(s_const, freqs.dtype), freqs
            return _build
        out.append(Model(f"mat{i}", 20, "protein",
                         {"freqs": tuple(f.tolist())}, _mk(s)))
    return out


@pytest.fixture(scope="module")
def het_data():
    """Alignment whose column blocks evolved under DIFFERENT matrices."""
    tree = random_tree(10, seed=7, mean_brlen=0.3)
    syms, freqs = _class_defs()
    blocks = []
    for i, (s, f) in enumerate(zip(syms, freqs)):
        cm = _make_models([s], [f])[0]
        blocks.append(simulate_alignment(
            jax.random.PRNGKey(10 + i), tree, cm, n_sites=150,
        ))
    aln = {n: "".join(b[n] for b in blocks) for n in blocks[0]}
    return tree, aln


def test_matrix_mixture_matches_oracle(het_data):
    tree, aln = het_data
    syms, freqs = _class_defs()
    cms = _make_models(syms, freqs)
    w = np.array([0.4, 0.3, 0.2, 0.1])
    r = np.array([0.5, 1.0, 1.5, 2.0])
    eng = ProfileMixtureEngine(
        tree, aln, models.LG, profiles=np.stack(freqs), weights=w,
        class_rates=r, class_models=cms, dtype="float64",
    )
    got = eng.loglikelihood()

    r_norm = r / np.sum(w * r)        # engine's weighted-mean-1 coupling
    per_class = []
    for s, f, rk in zip(syms, freqs, r_norm):
        m = oracle.matrix(s, f)
        scaled = tree.with_lengths(np.asarray(tree.lengths) * rk)
        _, sw = oracle.loglikelihood(scaled, aln, m, alphabet="protein",
                                     return_sitewise=True)
        per_class.append(sw)
    per_class = np.asarray(per_class)
    m0 = per_class.max(axis=0)
    gold = float(np.sum(
        np.log(np.sum(w[:, None] * np.exp(per_class - m0), axis=0)) + m0
    ))
    assert got == pytest.approx(gold, rel=1e-9)


def test_matrix_mixture_fits_and_beats_lg_gamma_by_aic(het_data):
    """The r4 VERDICT item-7 'done' gate: a 4-matrix LG4X-style mixture
    fits and beats LG+G4 by AIC on matrix-heterogeneous data."""
    tree, aln = het_data
    syms, freqs = _class_defs()
    cms = _make_models(syms, freqs)

    gamma = LikelihoodEngine(tree, aln, models.LG, ncat=4,
                             dtype="float64")
    r_gamma = fit(gamma, free=("branch_lengths", "alpha"),
                  max_steps=200, patience=15)
    k_gamma = tree.n_nodes - 1 + 1

    mix = ProfileMixtureEngine(
        tree, aln, models.LG, profiles=np.stack(freqs),
        class_rates="free", class_models=cms, dtype="float64",
    )
    r_mix = fit(mix, free=("branch_lengths", "cat_weights",
                           "class_rates"),
                max_steps=250, patience=20)
    k_mix = tree.n_nodes - 1 + (4 - 1) + 4   # brlens + weights + rates

    aic_gamma = 2 * k_gamma - 2 * r_gamma.loglik
    aic_mix = 2 * k_mix - 2 * r_mix.loglik
    assert aic_mix < aic_gamma - 10.0, (aic_mix, aic_gamma)


def test_class_models_validation(het_data):
    tree, aln = het_data
    syms, freqs = _class_defs()
    cms = _make_models(syms, freqs)
    with pytest.raises(ValueError, match="entries for"):
        ProfileMixtureEngine(tree, aln, models.LG,
                             profiles=np.stack(freqs),
                             class_models=cms[:2])


def _nexus_text():
    """LG4X-style models.nex with one GTR20 matrix definition, one
    frequency vector, and a MIX model over (custom matrix, LG, WAG)."""
    syms, freqs = _class_defs()
    tri = []
    s = syms[2]
    for i in range(1, 20):
        tri.extend(f"{s[i, j]:.6f}" for j in range(i))
    fv = " ".join(f"{x:.6f}" for x in freqs[2])
    f1 = " ".join(f"{x:.6f}" for x in freqs[3])
    return (
        "#nexus\nbegin models;\n"
        f"model VARMAT = {' '.join(tri)} {fv};\n"
        f"frequency FALT = {f1};\n"
        "model TESTMIX = MIX{VARMAT:1.0:0.5,LG+FU{FALT}:1.0:0.3,"
        "WAG:1.0:0.2};\n"
        "end;\n"
    )


def test_nexus_matrix_mixture_parses_and_matches_direct(het_data):
    tree, aln = het_data
    defs = parse_nexus_models(_nexus_text())
    assert "VARMAT" in defs["matrices"]
    assert defs["matrices"]["VARMAT"]["sym"].shape == (20, 20)
    spec = defs["models"]["TESTMIX"]
    assert [c[0] for c in spec["matrix_classes"]] == ["VARMAT", "LG",
                                                      "WAG"]
    eng = profile_mixture_from_nexus(
        _nexus_text(), "TESTMIX", tree, aln, models.LG, dtype="float64",
    )
    got = eng.loglikelihood()

    # direct engine from the SAME parsed numbers — proves the loader
    # plumbing, not float formatting
    direct_syms = [defs["matrices"]["VARMAT"]["sym"],
                   np.asarray(LG_RATES, np.float64),
                   np.asarray(WAG_RATES, np.float64)]
    wagf = np.asarray(WAG_FREQS, np.float64)
    direct_freqs = [defs["matrices"]["VARMAT"]["freqs"],
                    defs["frequencies"]["FALT"], wagf / wagf.sum()]
    cms = _make_models(direct_syms, direct_freqs)
    direct = ProfileMixtureEngine(
        tree, aln, models.LG, profiles=np.stack(direct_freqs),
        weights=np.array([0.5, 0.3, 0.2]), class_rates="free",
        class_models=cms, dtype="float64",
    )
    assert got == pytest.approx(direct.loglikelihood(), rel=1e-12)


def test_nexus_undefined_matrix_errors(het_data):
    tree, aln = het_data
    text = "model BAD = MIX{NOSUCH,LG};\n"
    with pytest.raises(ValueError, match="undefined matrix"):
        profile_mixture_from_nexus(text, "BAD", tree, aln, models.LG)
