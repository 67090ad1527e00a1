"""Mk morphological models + ascertainment-bias corrections.

The reference has neither (SURVEY.md §2 — DNA/protein alphabets only);
validation is against exact identities instead: MK4 == JC69 on recoded
data, and the Lewis correction's defining property that corrected
pattern likelihoods sum to exactly 1 over the variable patterns.
"""
import itertools

import numpy as np
import pytest

from phylo_utils_tpu.ascertainment import AscertainmentEngine
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.models import JC69, get_model
from phylo_utils_tpu.models.morphology import mk_model, multistate_alphabet

TREE4 = "((a:0.12,b:0.23):0.05,(c:0.31,d:0.17):0.08);"
TREE3 = "(a:0.2,b:0.35,c:0.15);"


def test_mk4_equals_jc69_on_recoded_dna():
    dna = {"a": "ACGTACGTGGAC", "b": "ACGTTGCAGGAA",
           "c": "AGGTACGAGTAC", "d": "ACGAACGTATCC"}
    recode = str.maketrans("ACGT", "0123")
    morph = {k: v.translate(recode) for k, v in dna.items()}
    ll_dna = LikelihoodEngine(TREE4, dna, JC69, ncat=4).loglikelihood(
        {"alpha": 0.7}
    )
    ll_mk = LikelihoodEngine(TREE4, morph, mk_model(4),
                             ncat=4).loglikelihood({"alpha": 0.7})
    assert ll_mk == pytest.approx(ll_dna, abs=1e-9)


def test_registry_resolves_mk_and_ordered():
    assert get_model("MK5").n_states == 5
    assert get_model("mk2").name == "MK2"
    m = get_model("ORDERED4")
    assert m.n_states == 4 and m.name == "ORDERED4"
    with pytest.raises(ValueError):
        get_model("MKx")


def test_ordered_model_disallows_jumps():
    m = get_model("ORDERED5")
    sym, freqs = m.build_parts()
    sym = np.asarray(sym)
    assert sym[0, 1] > 0 and sym[0, 2] == 0 and sym[0, 4] == 0
    assert np.allclose(sym, sym.T)
    assert np.allclose(np.asarray(freqs), 0.2)


def test_multistate_alphabet_ambiguity():
    a = multistate_alphabet(12)
    assert a.n_states == 12
    assert a.state_index("B") == (11,)
    assert a.state_index("?") == tuple(range(12))
    with pytest.raises(ValueError):
        multistate_alphabet(40)


def _all_variable_patterns(k, taxa):
    pats = [
        p for p in itertools.product(range(k), repeat=taxa)
        if len(set(p)) > 1
    ]
    chars = "0123456789ABCDEF"
    cols = ["".join(chars[s] for s in p) for p in pats]
    names = "abcdefgh"[:taxa]
    return {names[i]: "".join(c[i] for c in cols) for i in range(taxa)}


@pytest.mark.parametrize("ncat", [1, 4])
def test_lewis_corrected_likelihoods_sum_to_one(ncat):
    """The defining identity: sum over ALL variable patterns of the
    corrected pattern likelihood is exactly 1 (it is a conditional
    distribution over variable patterns). Exercises the mixture path
    too: the correction must mix categories BEFORE conditioning."""
    aln = _all_variable_patterns(2, 3)
    eng = AscertainmentEngine(TREE3, aln, mk_model(2), ncat=ncat)
    params = {"alpha": 0.5} if ncat > 1 else None
    sw = eng.sitewise_loglikelihoods(params, per_pattern=True)
    assert np.exp(sw).sum() == pytest.approx(1.0, abs=1e-10)


def test_lewis_correction_hand_computed_binary():
    """3-taxon star, Mk2: corrected logL against a from-scratch numpy
    computation (P(t) for the normalized 2-state symmetric chain is
    closed-form: P_same = (1 + e^{-2t}) / 2)."""
    aln = {"a": "010", "b": "001", "c": "100"}
    eng = AscertainmentEngine(TREE3, aln, mk_model(2))
    got = eng.loglikelihood()

    ts = {"a": 0.2, "b": 0.35, "c": 0.15}

    def p(t):
        e = np.exp(-2.0 * t)
        return np.array([[(1 + e) / 2, (1 - e) / 2],
                         [(1 - e) / 2, (1 + e) / 2]])

    def site_lik(states):
        l = 0.0
        for root in (0, 1):
            term = 0.5
            for name, s in states.items():
                term *= p(ts[name])[root, s]
            l += term
        return l

    v = site_lik({"a": 0, "b": 0, "c": 0}) + site_lik(
        {"a": 1, "b": 1, "c": 1}
    )
    cols = [{"a": 0, "b": 0, "c": 1}, {"a": 1, "b": 0, "c": 0},
            {"a": 0, "b": 1, "c": 0}]
    want = sum(np.log(site_lik(c) / (1.0 - v)) for c in cols)
    assert got == pytest.approx(want, abs=1e-9)


def test_lewis_rejects_constant_patterns_and_pinv():
    aln = _all_variable_patterns(2, 3)
    bad = {k: v + ("1" if k == "a" else "1")
           for k, v in aln.items()}  # appended column is constant
    AscertainmentEngine(TREE3, aln, mk_model(2))  # fine
    with pytest.raises(ValueError, match="constant"):
        AscertainmentEngine(TREE3, bad, mk_model(2))
    with pytest.raises(ValueError, match=r"\+I"):
        AscertainmentEngine(TREE3, aln, mk_model(2), invariant_sites=True)
    with pytest.raises(ValueError, match="correction"):
        AscertainmentEngine(TREE3, aln, mk_model(2), correction="nope")


def test_felsenstein_and_stamatakis_counts():
    aln = _all_variable_patterns(2, 3)
    base = LikelihoodEngine(TREE3, aln, mk_model(2))
    ll0 = base.loglikelihood()

    # zero counts == uncorrected
    fe0 = AscertainmentEngine(TREE3, aln, mk_model(2),
                              correction="felsenstein", const_counts=0)
    assert fe0.loglikelihood() == pytest.approx(ll0, abs=1e-9)

    # stamatakis == manually adding c_s * log L(constant_s)
    st = AscertainmentEngine(TREE3, aln, mk_model(2),
                             correction="stamatakis", const_counts=[3, 5])
    const0 = LikelihoodEngine(TREE3, {"a": "0", "b": "0", "c": "0"},
                              mk_model(2), compress=False)
    const1 = LikelihoodEngine(TREE3, {"a": "1", "b": "1", "c": "1"},
                              mk_model(2), compress=False)
    want = (ll0 + 3 * const0.loglikelihood() + 5 * const1.loglikelihood())
    assert st.loglikelihood() == pytest.approx(want, abs=1e-8)

    # felsenstein: c * log(sum_s L_const_s)
    fe = AscertainmentEngine(TREE3, aln, mk_model(2),
                             correction="felsenstein", const_counts=4)
    v = np.exp(const0.loglikelihood()) + np.exp(const1.loglikelihood())
    assert fe.loglikelihood() == pytest.approx(ll0 + 4 * np.log(v),
                                               abs=1e-8)

    with pytest.raises(ValueError, match="const_counts"):
        AscertainmentEngine(TREE3, aln, mk_model(2), const_counts=3)
    with pytest.raises(ValueError, match="non-negative"):
        AscertainmentEngine(TREE3, aln, mk_model(2),
                            correction="stamatakis", const_counts=[-1, 2])


def test_asc_fit_shrinks_branch_lengths():
    """Lewis 2001's headline effect: ignoring the ascertainment bias
    inflates branch-length estimates, so the corrected fit must give a
    shorter total tree length on variable-only data."""
    from phylo_utils_tpu.optimize import fit

    rng = np.random.default_rng(0)
    taxa = "abcd"
    cols = []
    while len(cols) < 120:
        c = rng.integers(0, 2, size=4)
        if len(set(c.tolist())) > 1:
            cols.append(c)
    aln = {t: "".join(str(c[i]) for c in cols)
           for i, t in enumerate(taxa)}
    plain = LikelihoodEngine(TREE4, aln, mk_model(2))
    asc = AscertainmentEngine(TREE4, aln, mk_model(2))
    bl_plain = np.asarray(
        fit(plain, max_steps=300).params["branch_lengths"]
    ).sum()
    bl_asc = np.asarray(
        fit(asc, max_steps=300).params["branch_lengths"]
    ).sum()
    assert bl_asc < bl_plain


def test_asc_gradient_matches_finite_difference():
    import jax

    aln = _all_variable_patterns(2, 3)
    eng = AscertainmentEngine(TREE3, aln, mk_model(2), ncat=4)
    full = eng._full_params({"alpha": 0.8})
    g = eng.gradient(full)["branch_lengths"]
    eps = 1e-6
    bl = np.asarray(full["branch_lengths"], np.float64)
    for i in range(min(3, bl.shape[0])):
        up, dn = bl.copy(), bl.copy()
        up[i] += eps
        dn[i] -= eps
        fd = (
            eng.loglikelihood({**full, "branch_lengths": up})
            - eng.loglikelihood({**full, "branch_lengths": dn})
        ) / (2 * eps)
        assert np.asarray(g)[i] == pytest.approx(fd, rel=1e-4, abs=1e-6)


def test_recoding_schemes_partition_their_alphabet():
    from phylo_utils_tpu.alphabets import RECODING_SCHEMES, get_alphabet

    for name, (src, groups) in RECODING_SCHEMES.items():
        alpha = get_alphabet(src)
        flat = "".join(groups)
        assert sorted(flat) == sorted(alpha.states), name
        assert len(set(flat)) == len(flat), name


def test_ry_recoding_and_mk2_engine():
    from phylo_utils_tpu.alphabets import recode_alignment

    aln = {"a": "ACGRT-SN", "b": "GGTYAACC"}
    ry = recode_alignment(aln, "RY")
    assert ry["a"] == "01001???"
    assert ry["b"] == "00110011"
    with pytest.raises(ValueError, match="scheme"):
        recode_alignment(aln, "nope")

    dna = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    eng = LikelihoodEngine(TREE4, recode_alignment(dna, "ry"), mk_model(2))
    assert np.isfinite(eng.loglikelihood())


def test_dayhoff6_recoding_ambiguity():
    from phylo_utils_tpu.alphabets import recode_alignment

    got = recode_alignment({"a": "ARNDCBZXW*"}, "dayhoff6")
    # B = N/D both in DENQ -> 2; Z = Q/E both in DENQ -> 2; X/* -> ?
    assert got["a"] == "042212 2?3?".replace(" ", "")
