"""CLI subcommands, checkpoint round-trip, metrics logging."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_utils_tpu.cli import main
from phylo_utils_tpu.utils import (
    MetricsLogger,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture
def small_inputs(tmp_path):
    tree = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);"
    fasta = tmp_path / "aln.fa"
    fasta.write_text(
        ">a\nACGTACGTGG\n>b\nACGTTGCAGG\n>c\nAGGTACGAGT\n>d\nACGAACGTAT\n"
    )
    return tree, str(fasta)


def test_cli_loglik(small_inputs, capsys):
    tree, fasta = small_inputs
    rc = main([
        "loglik", "--tree", tree, "--alignment", fasta,
        "--model", "HKY85", "--ncat", "4", "--sitewise",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["loglik"] < 0
    assert len(out["sitewise"]) == 10


def test_cli_loglik_matches_oracle(small_inputs, capsys):
    import oracle

    tree, fasta = small_inputs
    main(["loglik", "--tree", tree, "--alignment", fasta, "--model", "JC69"])
    ll = json.loads(capsys.readouterr().out)["loglik"]
    from phylo_utils_tpu.io import parse_newick, read_fasta

    gold = oracle.loglikelihood(
        parse_newick(tree), read_fasta(fasta), oracle.jc69()
    )
    assert ll == pytest.approx(gold, abs=1e-8)


def test_cli_fit_with_checkpoint(small_inputs, tmp_path, capsys):
    tree, fasta = small_inputs
    ckpt = str(tmp_path / "fit.npz")
    metrics = str(tmp_path / "metrics.jsonl")
    rc = main([
        "fit", "--tree", tree, "--alignment", fasta, "--model", "K80",
        "--max-steps", "30", "--checkpoint", ckpt, "--metrics", metrics,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["loglik"] < 0 and out["n_steps"] <= 30
    assert os.path.exists(ckpt)
    lines = [json.loads(l) for l in open(metrics)]
    assert lines and "loglik" in lines[0]
    # resume path: restart from checkpoint, logL must not regress
    rc = main([
        "fit", "--tree", tree, "--alignment", fasta, "--model", "K80",
        "--max-steps", "5", "--resume", ckpt,
    ])
    out2 = json.loads(capsys.readouterr().out)
    assert out2["loglik"] >= out["loglik"] - 1e-6


def test_cli_simulate_roundtrip(tmp_path, capsys):
    out_fa = str(tmp_path / "sim.fa")
    rc = main([
        "simulate", "--tree", "((a:0.2,b:0.1):0.1,(c:0.3,d:0.1):0.2);",
        "--model", "GTR", "--sites", "120", "--ncat", "4", "--out", out_fa,
    ])
    assert rc == 0
    from phylo_utils_tpu.io import read_fasta

    aln = read_fasta(out_fa)
    assert set(aln) == {"a", "b", "c", "d"}
    # simulated data must be scorable
    rc = main([
        "loglik", "--tree", "((a:0.2,b:0.1):0.1,(c:0.3,d:0.1):0.2);",
        "--alignment", out_fa, "--model", "GTR",
    ])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["loglik"] < 0


def test_cli_benchmark_runs(small_inputs, capsys):
    tree, fasta = small_inputs
    rc = main([
        "benchmark", "--tree", tree, "--alignment", fasta, "--iters", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["patterns_per_s"] > 0


def test_checkpoint_roundtrip_nested_pytree(tmp_path):
    import optax

    params = {
        "branch_lengths": jnp.arange(5.0),
        "model": {"kappa": jnp.asarray(2.5)},
    }
    opt = optax.adam(1e-2)
    state = {"params": params, "opt": opt.init(params)}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, step=17, extra={"note": "x"})
    restored, step, extra = load_checkpoint(path, state)
    assert step == 17 and extra["note"] == "x"
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as ml:
        ml.log(1, loglik=-12.5, grad_norm=0.3)
        ml.log(2, loglik=-11.0)
    recs = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["loglik"] == -12.5


def test_cli_distances(small_inputs, capsys):
    _, fasta = small_inputs
    rc = main(["distances", "--alignment", fasta, "--model", "JC69"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    d = np.asarray(out["distances"])
    assert d.shape == (4, 4)
    assert (d >= 0).all() and np.allclose(d, d.T)
    rc = main(["distances", "--alignment", fasta, "--format", "phylip"])
    assert rc == 0
    assert capsys.readouterr().out.startswith("4\n")


def test_cli_topologies(small_inputs, tmp_path, capsys):
    _, fasta = small_inputs
    trees = tmp_path / "trees.nwk"
    trees.write_text(
        "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);\n"
        "((a:0.1,c:0.2):0.05,(b:0.3,d:0.15):0.07);\n"
    )
    rc = main([
        "topologies", "--trees", str(trees), "--alignment", fasta,
        "--model", "HKY85", "--ncat", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_trees"] == 2 and len(out["logliks"]) == 2
    assert out["best_index"] in (0, 1)


def test_cli_search_and_compare(small_inputs, tmp_path, capsys):
    tree, fasta = small_inputs
    out_tree = str(tmp_path / "best.nwk")
    rc = main([
        "search", "--tree", tree, "--alignment", fasta, "--model", "JC69",
        "--moves", "both", "--max-rounds", "3", "--out", out_tree,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["loglik"] < 0 and out["tree"].endswith(";")
    from phylo_utils_tpu.io import parse_newick

    assert sorted(parse_newick(out["tree"]).leaf_names) == ["a", "b", "c", "d"]

    rc = main([
        "compare", "--tree", tree, "--alignment", fasta,
        "--models", "JC69,K80", "--max-steps", "25",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["best"] in ("JC69", "K80")
    assert len(out["ranked"]) == 2


def test_alignment_writers_roundtrip(tmp_path):
    from phylo_utils_tpu.io import (
        read_fasta,
        read_phylip,
        write_fasta,
        write_phylip,
    )

    aln = {"taxon_one": "ACGT" * 25, "t2": "TTTT" * 25}
    fa = str(tmp_path / "w.fa")
    write_fasta(aln, fa, width=30)
    assert read_fasta(fa) == aln
    ph = str(tmp_path / "w.phy")
    write_phylip(aln, ph)
    assert read_phylip(ph) == aln


def test_cli_ancestral_and_bootstrap(small_inputs, capsys):
    tree, fasta = small_inputs
    rc = main([
        "ancestral", "--tree", tree, "--alignment", fasta,
        "--model", "HKY85", "--ncat", "4",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_internal_nodes"] == 3 and out["n_sites"] == 10
    assert all(0 <= s <= 3 for row in out["map_states"] for s in row)
    assert len(out["site_rate_posteriors"]) == 10

    rc = main([
        "bootstrap", "--tree", tree, "--alignment", fasta,
        "--model", "JC69", "--replicates", "50",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_replicates"] == 50
    assert out["quantiles"]["q025"] <= out["quantiles"]["q975"]


def test_enable_debug_checks_catches_nan():
    import jax
    import jax.numpy as jnp

    from phylo_utils_tpu.utils import enable_debug_checks

    enable_debug_checks(nans=True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x - 2.0))(
                jnp.asarray(1.0)
            ).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_write_newick_quotes_special_labels():
    from phylo_utils_tpu.io import parse_newick, write_newick

    t = parse_newick("('taxon A':0.1,('B(x)':0.2,\"c\":0.3)'in:ner':0.4);")
    t2 = parse_newick(write_newick(t))  # must round-trip
    assert set(t2.leaf_names) == set(t.leaf_names)


def test_read_phylip_wrapped_sequential():
    from phylo_utils_tpu.io import read_phylip

    text = "2 12\nalpha ACGTAC\nGTACGT\nbeta  TTTTTT\nCCCCCC\n"
    out = read_phylip(text)
    assert out == {"alpha": "ACGTACGTACGT", "beta": "TTTTTTCCCCCC"}
    # classic interleaved still works
    inter = "2 12\nalpha ACGTAC\nbeta  TTTTTT\nGTACGT\nCCCCCC\n"
    out2 = read_phylip(inter)
    assert out2 == {"alpha": "ACGTACGTACGT", "beta": "TTTTTTCCCCCC"}


@pytest.fixture
def codon_inputs(tmp_path):
    from phylo_utils_tpu import models
    from phylo_utils_tpu.io import write_fasta
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(5, seed=7, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(3), tree, models.GY94, 40,
                             params={"omega": 0.5, "kappa": 2.0})
    fasta = tmp_path / "codon.fa"
    write_fasta(aln, path=str(fasta))
    from phylo_utils_tpu.io import write_newick

    return write_newick(tree), str(fasta)


def test_cli_site_test(codon_inputs, capsys):
    tree, fasta = codon_inputs
    rc = main([
        "site-test", "--tree", tree, "--alignment", fasta,
        "--test", "m1a-m2a", "--max-steps", "15", "--sites",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    # 15 steps is a smoke test, not convergence: allow slack on nesting
    assert out["loglik_alt"] >= out["loglik_null"] - 0.5
    assert 0.0 <= out["lrt"]["pvalue"] <= 1.0
    assert len(out["site_positive_posterior"]) == 40  # one per codon site


def test_cli_branch_site_test(codon_inputs, capsys):
    tree, fasta = codon_inputs
    from phylo_utils_tpu.io import parse_newick

    fg = parse_newick(tree).leaf_names[0]
    rc = main([
        "branch-site-test", "--tree", tree, "--alignment", fasta,
        "--foreground", fg, "--max-steps", "15",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["loglik_alt"] >= out["loglik_null"] - 0.5
    assert 0.0 <= out["lrt"]["pvalue"] <= 1.0


def test_cli_empirical_freqs(small_inputs, tmp_path, capsys):
    """--empirical-freqs (+F) fits skewed-composition data better than
    uniform frequencies."""
    tree = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);"
    fa = tmp_path / "gc.fa"
    fa.write_text(
        ">a\nGGCCGGCCGC\n>b\nGGCCGGCGGC\n>c\nGCCCGGCCGC\n>d\nGGCCGCCCGC\n"
    )
    lls = {}
    for flag in ([], ["--empirical-freqs"]):
        rc = main(["loglik", "--tree", tree, "--alignment", str(fa),
                   "--model", "HKY85"] + flag)
        assert rc == 0
        lls[bool(flag)] = json.loads(capsys.readouterr().out)["loglik"]
    assert lls[True] > lls[False] + 1.0
    # models without a freqs parameter reject the flag cleanly
    with pytest.raises(SystemExit, match="freqs"):
        main(["loglik", "--tree", tree, "--alignment", str(fa),
              "--model", "K80", "--empirical-freqs"])


def test_read_nexus():
    """NEXUS: interleaved matrix with matchchar + quoted names, TRANSLATE
    trees; read_alignment sniffs the format; engine-ready output."""
    from phylo_utils_tpu import models
    from phylo_utils_tpu.io import read_alignment, read_nexus
    from phylo_utils_tpu.likelihood import LikelihoodEngine

    nx = (
        "#NEXUS\n[ comment ]\nBEGIN DATA;\n"
        "  DIMENSIONS NTAX=4 NCHAR=12;\n"
        "  FORMAT DATATYPE=DNA MISSING=? GAP=- MATCHCHAR=. INTERLEAVE;\n"
        "  MATRIX\n"
        "    taxon_A ACGTAC\n    taxon_B ..T...\n"
        "    'taxon C' A..GT.\n    taxon_D ...-..\n"
        "    taxon_A GTGTAC\n    taxon_B ......\n"
        "    'taxon C' .A....\n    taxon_D ..C..T\n  ;\nEND;\n"
        "BEGIN TREES;\n"
        "  TRANSLATE\n    1 taxon_A,\n    2 taxon_B,\n"
        "    3 'taxon C',\n    4 taxon_D;\n"
        "  TREE best = ((1:0.1,2:0.2):0.05,(3:0.3,4:0.15):0.07);\n"
        "  TREE alt = ((1:0.1,3:0.2):0.05,(2:0.3,4:0.15):0.07);\nEND;\n"
    )
    out = read_nexus(nx)
    aln = out["alignment"]
    assert aln["taxon_A"] == "ACGTACGTGTAC"
    assert aln["taxon_B"] == "ACTTACGTGTAC"      # matchchar expansion
    assert aln["taxon_D"] == "ACG-ACGTCTAT"
    assert set(out["trees"]) == {"best", "alt"}
    tree = out["trees"]["best"]
    assert sorted(tree.leaf_names) == sorted(aln)
    assert read_alignment(nx) == aln
    ll = LikelihoodEngine(tree, aln, models.HKY85).loglikelihood()
    assert np.isfinite(ll)
    # sequential layout + wrapped chunks
    nx2 = ("#NEXUS\nBEGIN CHARACTERS;\n  DIMENSIONS NCHAR=8;\n"
           "  FORMAT DATATYPE=DNA;\n  MATRIX\n"
           "    a ACGT ACGT\n    b ACCTACGA\n  ;\nEND;\n")
    assert read_nexus(nx2)["alignment"] == {"a": "ACGTACGT",
                                            "b": "ACCTACGA"}
    with pytest.raises(ValueError, match="NEXUS"):
        read_nexus(">a\nACGT\n")


def test_write_nexus_roundtrip(tmp_path):
    from phylo_utils_tpu.io import parse_newick, read_nexus, write_nexus

    aln = {"taxon A": "ACGT-CGT", "b": "ACCTAC?A"}
    t = parse_newick("(('taxon A':0.1,b:0.2):0.0);")
    path = str(tmp_path / "x.nex")
    write_nexus(aln, {"best": t}, path=path)
    out = read_nexus(path)
    assert out["alignment"] == aln
    assert sorted(out["trees"]["best"].leaf_names) == sorted(t.leaf_names)


def test_cli_model_strings(small_inputs, capsys):
    """'GTR+G4+I+F'-style model strings equal the explicit flags."""
    tree, fasta = small_inputs

    def ll(args):
        assert main(["loglik", "--tree", tree, "--alignment", fasta]
                    + args) == 0
        return json.loads(capsys.readouterr().out)["loglik"]

    assert ll(["--model", "HKY85+G4+I"]) == ll(
        ["--model", "HKY85", "--ncat", "4", "--invariant-sites"])
    assert ll(["--model", "HKY85+F"]) == ll(
        ["--model", "HKY85", "--empirical-freqs"])
    with pytest.raises(SystemExit, match=r"\+X"):
        ll(["--model", "HKY85+X"])


def test_cli_ancestral_fasta(small_inputs, tmp_path, capsys):
    """ancestral --out-fasta writes MAP sequences for internal nodes."""
    from phylo_utils_tpu.io import read_fasta

    tree, fasta = small_inputs
    anc = str(tmp_path / "anc.fa")
    rc = main(["ancestral", "--tree", tree, "--alignment", fasta,
               "--model", "HKY85+G4", "--out-fasta", anc])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["map_sequences"]) == 3
    seqs = read_fasta(anc)
    assert all(len(s) == 10 and set(s) <= set("ACGT")
               for s in seqs.values())


def test_cli_topologies_test_flag(small_inputs, tmp_path, capsys):
    tree, fasta = small_inputs
    trees = tmp_path / "cands.nwk"
    trees.write_text(
        "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);\n"
        "((a:0.1,c:0.2):0.05,(b:0.3,d:0.15):0.07);\n"
    )
    rc = main(["topologies", "--trees", str(trees), "--alignment", fasta,
               "--model", "K80", "--test", "all", "--n-boot", "200"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for name in ("kh", "sh", "au"):
        assert len(out[name]["pvalue"]) == 2
    assert out["best_index"] in (0, 1)


def test_cli_consense(tmp_path, capsys):
    trees = tmp_path / "sample.nwk"
    trees.write_text(
        "((a:1,b:1):1,(c:1,d:1):1,e:1);\n"
        "((a:1,b:1):1,(c:1,e:1):1,d:1);\n"
        "((a:1,b:1):1,(c:1,d:1):1,e:1);\n"
    )
    out_path = tmp_path / "cons.nwk"
    rc = main(["consense", "--trees", str(trees), "--out", str(out_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_trees"] == 3
    assert out_path.read_text().strip() == out["consensus"]
    # the 2/3-majority cd split survives with its support label
    assert "67" in out["consensus"]


def test_cli_build_tree_bootstrap(small_inputs, tmp_path, capsys):
    _, fasta = small_inputs
    out_path = tmp_path / "t.nwk"
    rc = main(["build-tree", "--alignment", fasta, "--model", "JC69",
               "--bootstrap", "10", "--out", str(out_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["bootstrap_support"]) == set(out["tbe_support"])
    assert (tmp_path / "t.nwk.consensus").exists()
    for v in out["tbe_support"].values():
        assert 0.0 <= v <= 1.0


def test_cli_ancestral_joint(small_inputs, tmp_path, capsys):
    tree, fasta = small_inputs
    out_fa = tmp_path / "anc.fa"
    rc = main(["ancestral", "--tree", tree, "--alignment", fasta,
               "--model", "HKY85", "--ncat", "2", "--joint",
               "--out-fasta", str(out_fa)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "joint_sequences" in out and "map_sequences" in out
    assert out_fa.exists() and (tmp_path / "anc.fa.joint").exists()
    # marginal and joint FASTAs are DISTINCT files with same taxa set
    import re

    marg = set(re.findall(r">(\S+)", out_fa.read_text()))
    joint = set(re.findall(r">(\S+)", (tmp_path / "anc.fa.joint").read_text()))
    assert marg == joint and len(marg) == 3


def test_cli_freerate_model_string(small_inputs, capsys):
    """'+R[n]' routes rate_model='free' into the engine; fit optimizes
    the free category rates and weights; +G/+R are mutually exclusive."""
    tree, fasta = small_inputs
    rc = main(["loglik", "--tree", tree, "--alignment", fasta,
               "--model", "HKY85+R3"])
    assert rc == 0
    ll_r3 = json.loads(capsys.readouterr().out)["loglik"]
    assert ll_r3 < 0

    rc = main(["fit", "--tree", tree, "--alignment", fasta,
               "--model", "HKY85+R3", "--max-steps", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["params"]["rates"]) == 3
    w = np.asarray(out["params"]["cat_weights"], np.float64)
    assert w.shape == (3,) and abs(w.sum() - 1.0) < 1e-5
    assert out["loglik"] >= ll_r3 - 1e-6   # fit never loses likelihood

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["loglik", "--tree", tree, "--alignment", fasta,
              "--model", "HKY85+G4+R2"])


def test_cli_partitions(small_inputs, tmp_path, capsys):
    """--partitions FILE drives a PartitionedEngine: total == sum of
    per-partition logLs; fit improves; incompatible flags rejected."""
    tree, fasta = small_inputs
    pfile = tmp_path / "parts.txt"
    pfile.write_text("HKY85+G2, g1 = 1-5\nGTR, g2 = 6-10\n")

    rc = main(["loglik", "--tree", tree, "--alignment", fasta,
               "--partitions", str(pfile)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    per = out["partition_logliks"]
    assert set(per) == {"g1", "g2"}
    assert abs(out["loglik"] - sum(per.values())) < 1e-4

    rc = main(["fit", "--tree", tree, "--alignment", fasta,
               "--partitions", str(pfile), "--max-steps", "6"])
    assert rc == 0
    fitted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fitted["loglik"] >= out["loglik"] - 1e-6
    assert set(fitted["params"]["partitions"]) == {"g1", "g2"}

    with pytest.raises(SystemExit, match="sitewise"):
        main(["loglik", "--tree", tree, "--alignment", fasta,
              "--partitions", str(pfile), "--sitewise"])
    with pytest.raises(SystemExit, match="per-partition"):
        main(["loglik", "--tree", tree, "--alignment", fasta,
              "--partitions", str(pfile), "--empirical-freqs"])
