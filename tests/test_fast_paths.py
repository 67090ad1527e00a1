"""Round-3 latency fast paths: cached gamma rates + f32 P reconstruct.

VERDICT r2 item 3: the per-eval P(t)/glue (eigh reconstruct in emulated
f64, on-device gamma quantile inversion) dominated single-stream latency.
The cures: (a) `Eigen.recon` spectral modes — P(t) is ONE small matmul
exp(lambda t) @ recon, reconstructed directly in the engine's compute
dtype (exp stays f64: it is the coherent-error source); (b)
`LikelihoodEngine.model_rates` host-caches the discrete-gamma rates by
alpha value, like `model_eigen` caches the eigendecomposition.
"""
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.trees import random_tree


def _aln(tree, n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        name: "".join(rng.choice(list("ACGT"), size=n))
        for name in tree.leaf_names
    }


@pytest.fixture(scope="module")
def engine32():
    tree = random_tree(16, seed=3)
    return LikelihoodEngine(
        tree, _aln(tree, 200, seed=4), models.GTR, ncat=4, dtype="float32"
    )


def test_fast_eval_path_matches_plain_jit(engine32):
    """_eval (cached eigen + cached rates + f32 reconstruct) vs the plain
    in-graph path: same logL within the f32-reconstruct budget."""
    full = engine32._full_params(None)
    ll_fast = float(engine32._eval(full)[0])
    ll_plain = float(
        engine32._jit_fn(full, engine32._leaf_partials, engine32._weights)[0]
    )
    assert ll_fast == pytest.approx(ll_plain, rel=1e-6)


def test_model_rates_cached_and_invalidated(engine32):
    full = engine32._full_params(None)
    r1 = engine32.model_rates(full)
    assert r1 is not None and r1.shape == (4,)
    # cache hit: same backing host array
    r2 = engine32.model_rates(full)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # alpha change invalidates
    full2 = engine32._full_params({"alpha": 1.7})
    r3 = engine32.model_rates(full2)
    assert not np.allclose(np.asarray(r1), np.asarray(r3))
    # rates match the in-graph discretization
    from phylo_utils_tpu.ops.gamma import discrete_gamma

    # the f32 engine stores alpha as f32; compare against the
    # discretization of that exact value
    np.testing.assert_allclose(
        np.asarray(r3),
        np.asarray(discrete_gamma(np.float64(np.float32(1.7)), 4)),
        rtol=1e-12,
    )


def test_model_rates_none_for_non_gamma_engines():
    tree = random_tree(6, seed=5)
    aln = _aln(tree, 60, seed=6)
    e1 = LikelihoodEngine(tree, aln, models.JC69, ncat=1)
    assert e1.model_rates(e1._full_params(None)) is None
    ef = LikelihoodEngine(tree, aln, models.HKY85, ncat=3,
                          rate_model="free")
    assert ef.model_rates(ef._full_params(None)) is None


def test_transition_matrices_out_dtype():
    import jax.numpy as jnp

    from phylo_utils_tpu.models.base import eigen_reversible
    from phylo_utils_tpu.ops.pmatrix import transition_matrices

    sym = jnp.asarray(np.array([
        [0.0, 1.0, 2.0, 1.0],
        [1.0, 0.0, 1.0, 2.0],
        [2.0, 1.0, 0.0, 1.0],
        [1.0, 2.0, 1.0, 0.0],
    ]), jnp.float64)
    freqs = jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float64)
    eig = eigen_reversible(sym, freqs)
    assert eig.recon is not None and eig.recon.shape == (4, 4, 4)
    t = jnp.asarray([0.05, 0.4, 1.3], jnp.float64)
    p64 = transition_matrices(eig, t)
    p32 = transition_matrices(eig, t, out_dtype=jnp.float32)
    assert p64.dtype == jnp.float64 and p32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p32), np.asarray(p64),
                               rtol=0, atol=5e-7)
    # rows still sum to 1 and entries are nonnegative in both dtypes
    np.testing.assert_allclose(np.asarray(p32).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(p32) >= 0).all()


def test_recon_equals_explicit_eigen_reconstruct():
    """recon-modes matmul == V diag(e^{lambda t}) V^-1 to f64 roundoff."""
    import jax.numpy as jnp

    from phylo_utils_tpu.models.base import eigen_reversible
    from phylo_utils_tpu.ops.pmatrix import transition_matrices

    rng = np.random.default_rng(0)
    sym = np.zeros((4, 4))
    iu = np.triu_indices(4, 1)
    sym[iu] = rng.uniform(0.5, 2.0, size=6)
    sym = sym + sym.T
    freqs = rng.dirichlet(np.ones(4))
    eig = eigen_reversible(jnp.asarray(sym, jnp.float64),
                           jnp.asarray(freqs, jnp.float64))
    t = jnp.asarray(0.37, jnp.float64)
    p = transition_matrices(eig, t)
    ew = np.exp(np.asarray(eig.evals) * 0.37)
    explicit = (np.asarray(eig.evecs) * ew) @ np.asarray(eig.ivecs)
    np.testing.assert_allclose(np.asarray(p), np.maximum(explicit, 0.0),
                               rtol=0, atol=1e-14)


def test_loglikelihood_many_uses_fast_path(engine32):
    full = engine32._full_params(None)
    bl0 = np.asarray(full["branch_lengths"])
    sets = np.stack([bl0, bl0 * 1.1, bl0 * 0.9])
    out = engine32.loglikelihood_many(sets)
    assert out.shape == (3,)
    ll0 = float(engine32._eval(full)[0])
    assert out[0] == pytest.approx(ll0, rel=1e-9)
    assert out[1] != out[0] and out[2] != out[0]
