"""Serial float64 phylogenetic likelihood oracle (numpy + scipy only).

Mirrors the reference algorithm (SURVEY.md §3.2): per rate category, compute
P(t*r_c) per edge, post-order combine child partials with per-site scaling,
root reduction against equilibrium frequencies, then mix categories in linear
space with scale re-alignment. Everything is float64 and intentionally naive.

Shares only *data constants* (LG/WAG matrices) and the Tree container with
the JAX package; all numerics here are independent (expm instead of eigh,
recursion instead of level schedules).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np
import scipy.linalg
from scipy.special import gammainc, gammaincinv

from phylo_utils_tpu.trees import Tree

_DNA_STATES = "ACGT"
_AA_STATES = "ARNDCQEGHILKMFPSTWYV"

_DNA_AMBIG = {
    "A": "A", "C": "C", "G": "G", "T": "T", "U": "T",
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG",
    "N": "ACGT", "X": "ACGT", "-": "ACGT", "?": "ACGT", ".": "ACGT",
}
_AA_AMBIG = {"B": "ND", "Z": "QE", "J": "IL"}


def seq_to_partials(seq: str, alphabet: str = "dna") -> np.ndarray:
    if alphabet == "dna":
        states = _DNA_STATES
        def expand(ch):
            return _DNA_AMBIG.get(ch, states)
    else:
        states = _AA_STATES
        def expand(ch):
            if ch in states:
                return ch
            return _AA_AMBIG.get(ch, states)
    out = np.zeros((len(seq), len(states)))
    for i, ch in enumerate(seq.upper()):
        for s in expand(ch):
            out[i, states.index(s)] = 1.0
    return out


@dataclasses.dataclass
class OracleModel:
    name: str
    q: np.ndarray       # normalized rate matrix (mean rate 1)
    freqs: np.ndarray


def _normalize_q(q: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    q = q.copy()
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    scale = -(freqs * np.diag(q)).sum()
    return q / scale


def _reversible(name, sym_rates: np.ndarray, freqs: np.ndarray) -> OracleModel:
    freqs = np.asarray(freqs, dtype=np.float64)
    q = sym_rates * freqs[None, :]
    return OracleModel(name, _normalize_q(q, freqs), freqs)


def jc69() -> OracleModel:
    return _reversible("JC69", np.ones((4, 4)), np.full(4, 0.25))


def k80(kappa: float) -> OracleModel:
    s = np.ones((4, 4))
    s[0, 2] = s[2, 0] = kappa  # A<->G
    s[1, 3] = s[3, 1] = kappa  # C<->T
    return _reversible("K80", s, np.full(4, 0.25))


def f81(freqs) -> OracleModel:
    return _reversible("F81", np.ones((4, 4)), freqs)


def hky85(kappa: float, freqs) -> OracleModel:
    s = np.ones((4, 4))
    s[0, 2] = s[2, 0] = kappa
    s[1, 3] = s[3, 1] = kappa
    return _reversible("HKY85", s, freqs)


def f84(kappa: float, freqs) -> OracleModel:
    freqs = np.asarray(freqs, dtype=np.float64)
    pur = freqs[0] + freqs[2]
    pyr = freqs[1] + freqs[3]
    s = np.ones((4, 4))
    s[0, 2] = s[2, 0] = 1.0 + kappa / pur
    s[1, 3] = s[3, 1] = 1.0 + kappa / pyr
    return _reversible("F84", s, freqs)


def tn93(alpha1: float, alpha2: float, beta: float, freqs) -> OracleModel:
    s = np.full((4, 4), beta)
    s[0, 2] = s[2, 0] = alpha1  # purine transition A<->G
    s[1, 3] = s[3, 1] = alpha2  # pyrimidine transition C<->T
    return _reversible("TN93", s, freqs)


def gtr(rates: Sequence[float], freqs) -> OracleModel:
    """rates = (AC, AG, AT, CG, CT, GT)."""
    ac, ag, at, cg, ct, gt_ = rates
    s = np.zeros((4, 4))
    s[0, 1] = s[1, 0] = ac
    s[0, 2] = s[2, 0] = ag
    s[0, 3] = s[3, 0] = at
    s[1, 2] = s[2, 1] = cg
    s[1, 3] = s[3, 1] = ct
    s[2, 3] = s[3, 2] = gt_
    return _reversible("GTR", s, freqs)


def lg(freqs=None) -> OracleModel:
    from phylo_utils_tpu.data import LG_RATES, LG_FREQS
    return _reversible("LG", LG_RATES, LG_FREQS if freqs is None else freqs)


def wag(freqs=None) -> OracleModel:
    from phylo_utils_tpu.data import WAG_RATES, WAG_FREQS
    return _reversible("WAG", WAG_RATES, WAG_FREQS if freqs is None else freqs)


def matrix(sym, freqs) -> OracleModel:
    """Reversible model from an explicit symmetric exchangeability matrix
    (golden source for per-class matrix mixtures, LG4M/LG4X family)."""
    return _reversible("matrix", np.asarray(sym, np.float64),
                       np.asarray(freqs, np.float64))


def unrest(rates12: Sequence[float]) -> OracleModel:
    """Unrestricted 12-parameter DNA model. Row-major off-diagonal order
    (q01,q02,q03, q10,q12,q13, q20,q21,q23, q30,q31,q32)."""
    q = np.zeros((4, 4))
    k = 0
    for i in range(4):
        for j in range(4):
            if i != j:
                q[i, j] = rates12[k]
                k += 1
    np.fill_diagonal(q, -q.sum(axis=1))
    # stationary distribution: left null vector of Q
    w, vl = scipy.linalg.eig(q, left=True, right=False)
    idx = np.argmin(np.abs(w))
    pi = np.real(vl[:, idx])
    pi = pi / pi.sum()
    return OracleModel("UNREST", _normalize_q(q, pi), pi)


def pmat(model: OracleModel, t: float) -> np.ndarray:
    return scipy.linalg.expm(model.q * t)


def discrete_gamma(alpha: float, ncat: int, median: bool = False) -> np.ndarray:
    """PAML-style discrete gamma category rates (mean 1), Yang (1994)."""
    if median:
        quantiles = (2 * np.arange(ncat) + 1) / (2.0 * ncat)
        rates = gammaincinv(alpha, quantiles) / alpha
        return rates * ncat / rates.sum()
    cuts = gammaincinv(alpha, np.arange(1, ncat) / ncat) / alpha
    upper = np.concatenate([cuts, [np.inf]])
    lower = np.concatenate([[0.0], cuts])
    # E[X | a<X<b] * P(a<X<b) for X~Gamma(alpha, rate alpha) equals
    # I(alpha+1, b*alpha) - I(alpha+1, a*alpha) (regularized incomplete gamma).
    upper_i = np.where(np.isinf(upper), 1.0, gammainc(alpha + 1.0, upper * alpha))
    lower_i = gammainc(alpha + 1.0, lower * alpha)
    return ncat * (upper_i - lower_i)


def loglikelihood(
    tree: Tree,
    alignment: Dict[str, str],
    model: OracleModel,
    alphabet: str = "dna",
    rates: Optional[np.ndarray] = None,
    rate_weights: Optional[np.ndarray] = None,
    pinv: float = 0.0,
    pattern_weights: Optional[np.ndarray] = None,
    leaf_partials: Optional[np.ndarray] = None,
    return_sitewise: bool = False,
):
    """Serial Felsenstein pruning with per-site scaling; gamma/+I mixing.

    ``rates`` — per-category rate multipliers (defaults to [1.0]);
    ``rate_weights`` — category weights (default equal). ``pinv`` adds an invariant-sites component:
    L_s = pinv * I_s + (1-pinv) * mean_c L_{s,c}.
    """
    n_states = model.q.shape[0]
    if rates is None:
        rates = np.array([1.0])
    rates = np.asarray(rates, dtype=np.float64)
    leaf_idx = tree.leaf_index()
    if leaf_partials is None:
        leaves = {
            name: seq_to_partials(seq, alphabet) for name, seq in alignment.items()
        }
        n_sites = next(iter(leaves.values())).shape[0]
        leaf_arr = np.zeros((tree.n_leaves, n_sites, n_states))
        for name, arr in leaves.items():
            leaf_arr[leaf_idx[name]] = arr
    else:
        leaf_arr = np.asarray(leaf_partials, dtype=np.float64)
        n_sites = leaf_arr.shape[1]
    if pattern_weights is None:
        pattern_weights = np.ones(n_sites)

    def prune_category(rate: float):
        partials = {}
        logscale = {}
        for node in tree.postorder():
            kids = tree.children[node]
            if not kids:
                partials[node] = leaf_arr[node]
                logscale[node] = np.zeros(n_sites)
                continue
            acc = np.ones((n_sites, n_states))
            sc = np.zeros(n_sites)
            for c in kids:
                p = pmat(model, tree.lengths[c] * rate)
                acc = acc * (partials[c] @ p.T)
                sc = sc + logscale[c]
            m = np.maximum(acc.max(axis=1), np.finfo(np.float64).tiny)
            partials[node] = acc / m[:, None]
            logscale[node] = sc + np.log(m)
        root = tree.root
        site_lik = partials[root] @ model.freqs  # (sites,)
        return site_lik, logscale[root]

    liks = []
    scales = []
    for r in rates:
        sl, sc = prune_category(float(r))
        liks.append(sl)
        scales.append(sc)
    liks = np.stack(liks)     # (ncat, sites)
    scales = np.stack(scales)

    m = scales.max(axis=0)
    if pinv > 0:
        m = np.maximum(m, 0.0)
    if rate_weights is None:
        rate_weights = np.full(len(rates), 1.0 / len(rates))
    rate_weights = np.asarray(rate_weights, dtype=np.float64)
    mixed = np.sum(
        rate_weights[:, None] * liks * np.exp(scales - m[None, :]), axis=0
    )
    if pinv > 0:
        # invariant-site likelihood: zero-length-tree likelihood of the site
        inv = np.ones((n_sites, n_states))
        for leaf in range(tree.n_leaves):
            inv = inv * leaf_arr[leaf]
        inv_lik = inv @ model.freqs
        mixed = pinv * inv_lik * np.exp(-m) + (1.0 - pinv) * mixed
    sitewise = np.log(mixed) + m
    total = float((pattern_weights * sitewise).sum())
    if return_sitewise:
        return total, sitewise
    return total


def gy94(kappa: float, omega: float, freqs=None) -> OracleModel:
    """Goldman-Yang codon model (61 sense codons, standard code),
    independently re-derived from the genetic code for cross-validation."""
    import itertools

    bases = "TCAG"
    code = ("FFLLSSSSYY**CC*W" "LLLLPPPPHHQQRRRR"
            "IIIMTTTTNNKKSSRR" "VVVVAAAADDEEGGGG")
    all_codons = ["".join(c) for c in itertools.product(bases, repeat=3)]
    codons = [c for c, aa in zip(all_codons, code) if aa != "*"]
    aa = {c: a for c, a in zip(all_codons, code) if a != "*"}
    n = len(codons)
    if freqs is None:
        freqs = np.full(n, 1.0 / n)
    freqs = np.asarray(freqs, dtype=np.float64)
    transitions = {frozenset("AG"), frozenset("CT")}
    q = np.zeros((n, n))
    for i, ci in enumerate(codons):
        for j, cj in enumerate(codons):
            if i == j:
                continue
            diffs = [(a, b) for a, b in zip(ci, cj) if a != b]
            if len(diffs) != 1:
                continue
            rate = 1.0
            if frozenset(diffs[0]) in transitions:
                rate *= kappa
            if aa[ci] != aa[cj]:
                rate *= omega
            q[i, j] = rate * freqs[j]
    np.fill_diagonal(q, -q.sum(axis=1))
    return OracleModel("GY94", _normalize_q(q, freqs), freqs)


def loglikelihood_branch_models(
    tree: Tree,
    alignment: Dict[str, str],
    node_models: Sequence[OracleModel],
    alphabet: str = "dna",
    rates: Optional[np.ndarray] = None,
    rate_weights: Optional[np.ndarray] = None,
    pattern_weights: Optional[np.ndarray] = None,
    root_freqs: Optional[np.ndarray] = None,
    leaf_partials: Optional[np.ndarray] = None,
    return_sitewise: bool = False,
):
    """Serial pruning with a DIFFERENT model on each edge (branch models).

    ``node_models[i]`` governs the edge above node ``i`` (the root entry is
    unused except as the default source of ``root_freqs``). Same serial
    float64 numerics as ``loglikelihood`` — the independent golden source
    for BranchModelEngine / branch-site engines.
    """
    n_states = node_models[0].q.shape[0]
    if rates is None:
        rates = np.array([1.0])
    rates = np.asarray(rates, dtype=np.float64)
    if leaf_partials is None:
        leaf_idx = tree.leaf_index()
        leaves = {
            name: seq_to_partials(seq, alphabet)
            for name, seq in alignment.items()
        }
        n_sites = next(iter(leaves.values())).shape[0]
        leaf_arr = np.zeros((tree.n_leaves, n_sites, n_states))
        for name, arr in leaves.items():
            leaf_arr[leaf_idx[name]] = arr
    else:
        leaf_arr = np.asarray(leaf_partials, dtype=np.float64)
        n_sites = leaf_arr.shape[1]
    if pattern_weights is None:
        pattern_weights = np.ones(n_sites)
    if root_freqs is None:
        root_freqs = node_models[tree.root].freqs

    def prune_category(rate: float):
        partials = {}
        logscale = {}
        for node in tree.postorder():
            kids = tree.children[node]
            if not kids:
                partials[node] = leaf_arr[node]
                logscale[node] = np.zeros(n_sites)
                continue
            acc = np.ones((n_sites, n_states))
            sc = np.zeros(n_sites)
            for c in kids:
                p = pmat(node_models[c], tree.lengths[c] * rate)
                acc = acc * (partials[c] @ p.T)
                sc = sc + logscale[c]
            m = np.maximum(acc.max(axis=1), np.finfo(np.float64).tiny)
            partials[node] = acc / m[:, None]
            logscale[node] = sc + np.log(m)
        root = tree.root
        site_lik = partials[root] @ root_freqs
        return site_lik, logscale[root]

    liks, scales = [], []
    for r in rates:
        sl, sc = prune_category(float(r))
        liks.append(sl)
        scales.append(sc)
    liks = np.stack(liks)
    scales = np.stack(scales)
    m = scales.max(axis=0)
    if rate_weights is None:
        rate_weights = np.full(len(rates), 1.0 / len(rates))
    rate_weights = np.asarray(rate_weights, dtype=np.float64)
    mixed = np.sum(
        rate_weights[:, None] * liks * np.exp(scales - m[None, :]), axis=0
    )
    sitewise = np.log(mixed) + m
    total = float((pattern_weights * sitewise).sum())
    if return_sitewise:
        return total, sitewise
    return total


def mg94(kappa: float, omega: float, nuc_freqs=None) -> OracleModel:
    """Muse-Gaut (1994) codon model: q_ij = kappa^ts * omega^ns * pi_b^(p)
    for single-nucleotide changes; stationary = F3x4 product over sense
    codons. Independent golden for models.codon.MG94."""
    import itertools

    bases = "TCAG"
    code = ("FFLLSSSSYY**CC*W" "LLLLPPPPHHQQRRRR"
            "IIIMTTTTNNKKSSRR" "VVVVAAAADDEEGGGG")
    all_codons = ["".join(c) for c in itertools.product(bases, repeat=3)]
    CODONS = [c for c, aa in zip(all_codons, code) if aa != "*"]
    CODON_TO_AA = {c: a for c, a in zip(all_codons, code) if a != "*"}
    order = {"A": 0, "C": 1, "G": 2, "T": 3}
    ts_pairs = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}
    if nuc_freqs is None:
        nuc_freqs = np.full((3, 4), 0.25)
    f = np.asarray(nuc_freqs, np.float64)
    f = f / f.sum(axis=1, keepdims=True)
    n = len(CODONS)
    prod = np.array([
        f[0][order[c[0]]] * f[1][order[c[1]]] * f[2][order[c[2]]]
        for c in CODONS
    ])
    freqs = prod / prod.sum()
    q = np.zeros((n, n))
    for i, ci in enumerate(CODONS):
        for j, cj in enumerate(CODONS):
            if i == j:
                continue
            diffs = [p for p in range(3) if ci[p] != cj[p]]
            if len(diffs) != 1:
                continue
            p = diffs[0]
            rate = f[p][order[cj[p]]]
            if (ci[p], cj[p]) in ts_pairs:
                rate *= kappa
            if CODON_TO_AA[ci] != CODON_TO_AA[cj]:
                rate *= omega
            q[i, j] = rate
    np.fill_diagonal(q, -q.sum(axis=1))
    return OracleModel("MG94", _normalize_q(q, freqs), freqs)
