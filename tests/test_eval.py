"""Evaluators: InceptionV3 shapes, IS formula, FID properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aclgan_tpu.eval.fid import feature_stats, frechet_distance
from aclgan_tpu.eval.inception import InceptionV3


@pytest.fixture(scope="module")
def small_inception():
    """Random-init inception on tiny inputs (weights path parity is covered by
    the torch-import structure; here we exercise the graph)."""
    model = InceptionV3(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    return model, variables


def test_inception_output_shapes(small_inception):
    model, variables = small_inception
    x = jnp.asarray(np.random.RandomState(0).rand(2, 299, 299, 3).astype(np.float32))
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)
    feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_inception_param_count():
    """Standard InceptionV3 (no aux): ~21.8M backbone params + fc."""
    model = InceptionV3(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    # torchvision inception_v3 (aux_logits=False): 23,834,568 params
    assert abs(n - 23_834_568) < 10_000, n


def test_is_formula():
    """IS = exp(mean entropy(p(y|x), p(y))) with unnormalized prior sum
    (test_batch.py:196-204 uses scipy entropy which normalizes)."""
    from scipy.stats import entropy

    preds = np.asarray([[0.9, 0.1], [0.1, 0.9]])
    py = preds.sum(axis=0)
    scores = [entropy(preds[j], py) for j in range(2)]
    is_score = np.exp(np.mean(scores))
    assert is_score > 1.0  # diverse confident predictions => IS > 1


def test_fid_zero_for_identical_sets():
    rng = np.random.RandomState(0)
    feats = rng.randn(64, 16).astype(np.float64)
    mu, sigma = feature_stats(feats)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_fid_increases_with_shift():
    rng = np.random.RandomState(1)
    a = rng.randn(128, 8)
    b_close = a + 0.1 * rng.randn(128, 8)
    b_far = a + 3.0 + rng.randn(128, 8)
    d_close = frechet_distance(*feature_stats(a), *feature_stats(b_close))
    d_far = frechet_distance(*feature_stats(a), *feature_stats(b_far))
    assert 0 <= d_close < d_far


def test_slerp_properties():
    from aclgan_tpu.utils.latent import get_slerp_interp, slerp

    rng = np.random.RandomState(0)
    low, high = rng.randn(8), rng.randn(8)
    np.testing.assert_allclose(slerp(0.0, low, high), low, rtol=1e-5)
    np.testing.assert_allclose(slerp(1.0, low, high), high, rtol=1e-5)
    mid = slerp(0.5, low, high)
    assert np.isfinite(mid).all()
    chain = get_slerp_interp(2, 5, 8)
    assert chain.shape == (10, 8)


def test_get_parameter_number():
    from aclgan_tpu.utils.latent import get_parameter_number

    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    assert get_parameter_number(params) == {"Total": 10, "Trainable": 10}


def test_scorer_loads_flax_msgpack(small_inception, tmp_path):
    """InceptionScorer accepts flax-native fine-tuned weights
    (tools/train_inception.py protocol) and marks itself pretrained."""
    import flax.serialization

    from aclgan_tpu.eval.inception import InceptionScorer

    _, variables = small_inception
    path = tmp_path / "finetuned.msgpack"
    path.write_bytes(flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, dict(variables))))

    scorer = InceptionScorer(str(path))
    assert scorer.pretrained
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    preds = scorer.predict(x)
    assert preds.shape == (2, 10)  # num_classes inferred from fc kernel
    np.testing.assert_allclose(preds.sum(-1), 1.0, rtol=1e-5)
    feats = scorer.features(x)
    assert feats.shape == (2, 2048)
