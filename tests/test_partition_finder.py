"""PartitionFinder-style greedy scheme selection.

No reference counterpart (SURVEY.md §2 — the reference has no partition
support); validated against construction-guaranteed merge decisions.
"""
import numpy as np
import pytest

from phylo_utils_tpu.model_selection import partition_finder

TREE4 = "((a:0.12,b:0.23):0.05,(c:0.31,d:0.17):0.08);"


def _sim(seed, n, model="jc"):
    """Tiny DNA columns: iid uniform (jc-ish) or AT-rich biased."""
    rng = np.random.default_rng(seed)
    chars = "ACGT"
    if model == "jc":
        m = rng.integers(0, 4, size=(4, n))
    else:
        m = rng.choice([0, 3, 3, 0, 1, 2], size=(4, n))
    return {t: "".join(chars[s] for s in m[i])
            for i, t in enumerate("abcd")}


def _concat(*alns):
    return {k: "".join(a[k] for a in alns) for k in alns[0]}


def test_no_merge_ranks_each_subset():
    aln = _concat(_sim(0, 30), _sim(1, 30))
    res = partition_finder(
        TREE4, aln,
        {"p1": range(0, 30), "p2": range(30, 60)},
        candidates=["JC69", "K80"], merge=False, max_steps=60,
    )
    assert len(res["scheme"]) == 2
    assert {r["name"] for r in res["scheme"]} == {"p1", "p2"}
    for r in res["scheme"]:
        assert r["model"] in ("JC69", "K80")
        assert r["k"] > 0 and np.isfinite(r["loglik"])
    assert res["n_rounds"] == 0


def test_identical_subsets_always_merge():
    """Two subsets with literally identical columns: the merged subset
    has the same MLE (logL exactly additive) but HALF the branch-length
    parameters, so any penalized criterion must merge them."""
    a = _sim(2, 40)
    aln = _concat(a, a)
    res = partition_finder(
        TREE4, aln,
        {"x": range(0, 40), "y": range(40, 80)},
        candidates=["JC69"], criterion="bic", max_steps=80,
    )
    assert len(res["scheme"]) == 1
    (row,) = res["scheme"]
    assert sorted(res["merged_from"][row["name"]]) == ["x", "y"]
    assert row["name"] == "x+y"
    assert len(row["columns"]) == 80


def test_validation_errors():
    aln = _sim(3, 20)
    with pytest.raises(ValueError, match="out-of-range"):
        partition_finder(TREE4, aln, {"p": [0, 25]},
                         candidates=["JC69"])
    with pytest.raises(ValueError, match="no subsets"):
        partition_finder(TREE4, aln, {})
    bad = dict(aln)
    bad["a"] = bad["a"][:-1]
    with pytest.raises(ValueError, match="unequal"):
        partition_finder(TREE4, bad, {"p": [0, 1]},
                         candidates=["JC69"])


def test_scheme_score_matches_rows():
    aln = _concat(_sim(4, 25), _sim(5, 25, model="biased"))
    res = partition_finder(
        TREE4, aln,
        {"p1": range(0, 25), "p2": range(25, 50)},
        candidates=["JC69", "HKY85"], criterion="aic",
        merge=False, max_steps=60,
    )
    k = sum(r["k"] for r in res["scheme"])
    ll = sum(r["loglik"] for r in res["scheme"])
    assert res["score"] == pytest.approx(2 * k - 2 * ll, rel=1e-12)
