"""PAML ``.dat`` empirical-model loader (``empirical_model_from_dat``).

The round-trip golden: LG serialized into the PAML file layout loads back
to a model whose eigen system and engine logL are identical to the
bundled ``models.LG``. Parser robustness is exercised with the footer
comments / label rows real PAML files carry.
"""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.data import LG_FREQS, LG_RATES
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.models.protein import empirical_model_from_dat
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import random_tree


def random_alignment(tree, n_sites, seed=0):
    return simulate_alignment(jax.random.key(seed), tree, models.LG, n_sites)


def _lg_as_dat_text(footer: str = "") -> str:
    rows = []
    for i in range(1, 20):
        rows.append(" ".join(f"{LG_RATES[i, j]:.6f}" for j in range(i)))
    freq_line = " ".join(f"{f:.6f}" for f in LG_FREQS)
    return "\n".join(rows) + "\n\n" + freq_line + "\n" + footer


def test_dat_round_trips_lg(tmp_path):
    path = tmp_path / "lg_copy.dat"
    path.write_text(_lg_as_dat_text())
    m = empirical_model_from_dat(str(path))
    assert m.name == "lg_copy"
    assert m.n_states == 20 and m.alphabet == "protein"
    np.testing.assert_allclose(
        np.asarray(m.defaults()["freqs"]),
        np.asarray(models.LG.defaults()["freqs"]), rtol=1e-5)
    e_new, e_lg = m.eigen(), models.LG.eigen()
    np.testing.assert_allclose(
        np.asarray(e_new.evals), np.asarray(e_lg.evals), rtol=1e-5,
        atol=1e-8)

    tree = random_tree(8, seed=3, mean_brlen=0.15)
    aln = random_alignment(tree, 40, seed=7)
    ll_new = float(LikelihoodEngine(tree, aln, m, ncat=1).loglikelihood())
    ll_lg = float(
        LikelihoodEngine(tree, aln, models.LG, ncat=1).loglikelihood())
    assert ll_new == pytest.approx(ll_lg, rel=1e-9)


def test_dat_skips_labels_and_footer_comments():
    footer = (
        "\nAla Arg Asn Asp Cys Gln Glu Gly His Ile Leu Lys Met Phe Pro "
        "Ser Thr Trp Tyr Val\nS_ij = S_ji and PI_i are from Le & Gascuel "
        "(2008) MBE 25:1307-1320.\n"
    )
    m = empirical_model_from_dat(_lg_as_dat_text(footer), name="LG2")
    np.testing.assert_allclose(
        np.asarray(m.defaults()["freqs"]),
        np.asarray(models.LG.defaults()["freqs"]), rtol=1e-5)


def test_dat_truncated_raises():
    text = _lg_as_dat_text()
    truncated = " ".join(text.split()[:150])
    with pytest.raises(ValueError, match="need 210"):
        empirical_model_from_dat(truncated)


def test_dat_negative_exchangeability_raises():
    text = _lg_as_dat_text().replace("0.425093", "-0.425093", 1)
    with pytest.raises(ValueError, match="negative"):
        empirical_model_from_dat(text)


def test_cli_accepts_dat_model(tmp_path, capsys):
    from phylo_utils_tpu.cli import main as cli_main

    from phylo_utils_tpu.io import write_fasta, write_newick

    dat = tmp_path / "mylg.dat"
    dat.write_text(_lg_as_dat_text())
    tree = random_tree(5, seed=1, mean_brlen=0.1)
    aln = random_alignment(tree, 30, seed=2)
    fasta = tmp_path / "aln.fasta"
    write_fasta(aln, path=str(fasta))
    rc = cli_main([
        "loglik", "--tree", write_newick(tree), "--alignment", str(fasta),
        "--model", f"{dat}+G4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    import json

    ll_cli = json.loads(out.strip().splitlines()[-1])["loglik"]
    m = empirical_model_from_dat(str(dat))
    ll = float(LikelihoodEngine(
        tree, aln, m, ncat=4).loglikelihood({"alpha": 0.5}))
    assert ll_cli == pytest.approx(ll, rel=1e-8)
