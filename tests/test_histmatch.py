"""Device histogram matching vs the reference's np.unique CDF mapping."""
import numpy as np

import jax.numpy as jnp

from gan_danet_tpu.ops.histmatch import (
    batched_histogram_match,
    histogram_match,
    mild_histogram_match,
)


def _reference_match(source, reference):
    """np.unique-based mapping (test.ipynb simple_histogram_matching)."""
    oldshape = source.shape
    source = source.ravel()
    reference = reference.ravel()
    s_values, bin_idx, s_counts = np.unique(source, return_inverse=True,
                                            return_counts=True)
    t_values, t_counts = np.unique(reference, return_counts=True)
    s_q = np.cumsum(s_counts).astype(np.float64)
    s_q /= s_q[-1]
    t_q = np.cumsum(t_counts).astype(np.float64)
    t_q /= t_q[-1]
    interp = np.interp(s_q, t_q, t_values)
    return interp[bin_idx].reshape(oldshape)


def test_matches_reference_with_distinct_values(rng):
    src = rng.standard_normal((40, 50)).astype(np.float32)
    ref = (2.0 * rng.standard_normal((40, 50)) + 1.0).astype(np.float32)
    got = np.asarray(histogram_match(jnp.asarray(src), jnp.asarray(ref)))
    want = _reference_match(src, ref)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matched_distribution(rng):
    src = rng.standard_normal(5000).astype(np.float32)
    ref = (3.0 * rng.standard_normal(5000) - 2.0).astype(np.float32)
    got = np.asarray(histogram_match(jnp.asarray(src), jnp.asarray(ref)))
    assert abs(got.mean() - ref.mean()) < 0.1
    assert abs(got.std() - ref.std()) < 0.1


def test_mild_weight_zero_is_identity(rng):
    src = jnp.asarray(rng.standard_normal((8, 9)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((8, 9)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(mild_histogram_match(src, ref, 0.0)),
                                  np.asarray(src))


def test_mild_blend(rng):
    src = jnp.asarray(rng.standard_normal((8, 9)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((8, 9)).astype(np.float32))
    full = histogram_match(src, ref)
    blend = mild_histogram_match(src, ref, 0.2)
    np.testing.assert_allclose(np.asarray(blend),
                               0.8 * np.asarray(src) + 0.2 * np.asarray(full),
                               rtol=1e-5)


def test_batched(rng):
    src = jnp.asarray(rng.standard_normal((4, 8, 9)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((4, 8, 9)).astype(np.float32))
    out = batched_histogram_match(src, ref, 0.2)
    assert out.shape == src.shape
