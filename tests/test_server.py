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
