"""HTTP serving layer: endpoints, concurrency, error handling."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.server import EngineServer
from phylo_utils_tpu.trees import random_tree


@pytest.fixture(scope="module")
def server():
    tree = random_tree(6, seed=0)
    rng = np.random.default_rng(1)
    aln = {n: "".join(rng.choice(list("ACGT"), size=60))
           for n in tree.leaf_names}
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=2)
    srv = EngineServer(engine, port=0)  # ephemeral port
    srv.start()
    yield srv, engine
    srv.stop()


def _post(srv, route, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{route}",
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_health_and_loglik(server):
    srv, engine = server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/health", timeout=30
    ) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["model"] == "HKY85"
    out = _post(srv, "/loglik")
    assert out["loglik"] == pytest.approx(engine.loglikelihood())
    out2 = _post(srv, "/loglik", {"params": {"model": {"kappa": 5.0}}})
    assert out2["loglik"] != pytest.approx(out["loglik"])


def test_gradient_sitewise_bootstrap(server):
    srv, engine = server
    g = _post(srv, "/gradient")["gradient"]
    assert len(g["branch_lengths"]) == engine.tree.n_nodes
    sw = _post(srv, "/sitewise")["sitewise"]
    assert len(sw) == 60
    total = float(np.sum(sw))
    assert total == pytest.approx(engine.loglikelihood(), abs=1e-4)
    boots = _post(srv, "/bootstrap", {"n": 16, "seed": 3})["logliks"]
    assert len(boots) == 16


def test_fit_endpoint_and_errors(server):
    srv, engine = server
    out = _post(srv, "/fit", {"max_steps": 20, "free": ["branch_lengths"]})
    assert out["loglik"] >= engine.loglikelihood() - 1e-6
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/nonsense")
    assert e.value.code == 404


def test_partitioned_engine_health_and_501(server):
    """ADVICE.md r1 (medium): /health must not 500 on a PartitionedEngine,
    and endpoints its engine type lacks must return clean 501s."""
    from phylo_utils_tpu.partition import Partition, PartitionedEngine

    tree = random_tree(5, seed=2)
    rng = np.random.default_rng(7)
    alns = [
        {n: "".join(rng.choice(list("ACGT"), size=30))
         for n in tree.leaf_names}
        for _ in range(2)
    ]
    eng = PartitionedEngine(tree, [
        Partition("locus1", alns[0], models.JC69),
        Partition("locus2", alns[1], models.HKY85, ncat=2),
    ])
    srv = EngineServer(eng, port=0)
    srv.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=60
        ) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["model"] == {"locus1": "JC69", "locus2": "HKY85"}
        assert h["n_patterns"] > 0
        out = _post(srv, "/loglik")
        assert out["loglik"] == pytest.approx(eng.loglikelihood())
        parts = _post(srv, "/partitions")["partitions"]
        assert set(parts) == {"locus1", "locus2"}
        assert sum(parts.values()) == pytest.approx(out["loglik"], abs=1e-6)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/sitewise")
        assert e.value.code == 501
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/bootstrap", {"n": 4})
        assert e.value.code == 501
    finally:
        srv.stop()


def test_concurrent_requests(server):
    srv, engine = server
    results = []

    def hit():
        results.append(_post(srv, "/loglik")["loglik"])

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    assert len({round(r, 6) for r in results}) == 1


def test_ancestral_and_site_rates_endpoints(server):
    srv, engine = server
    anc = _post(srv, "/ancestral")
    n_internal = engine.tree.n_nodes - engine.tree.n_leaves
    assert len(anc["map_states"]) == n_internal
    assert len(anc["map_states"][0]) == 60
    joint = _post(srv, "/ancestral", {"joint": True})
    assert len(joint["states"]) == n_internal
    assert len(joint["log_prob"]) == 60
    rates = _post(srv, "/site_rates")["site_rates"]
    assert len(rates) == 60 and all(r > 0 for r in rates)
