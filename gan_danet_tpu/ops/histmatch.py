"""Device-resident histogram (quantile) matching.

The reference's `simple_histogram_matching` / `mild_histogram_matching`
(test.ipynb cells 1 & 3) are np.unique-based and force a GPU->CPU->GPU
round-trip per batch inside the inference loop (SURVEY.md §3.2). Here the
mapping is sort-based and jittable, so the whole post-processing chain stays
on device: element quantiles come from rank order (argsort of argsort) and
are interpolated into the reference's sorted values.

For distinct values this is identical to the unique-based CDF mapping; under
ties the unique variant assigns the tie-group's cumulative quantile to every
member while this one spreads ranks across the group — immaterial for
continuous model outputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram_match(source: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Map `source` values onto the empirical distribution of `reference`.

    Shapes are arbitrary; matching is done over flattened values (as the
    reference does per time step).
    """
    shape = source.shape
    s = source.ravel().astype(jnp.float32)
    r = reference.ravel().astype(jnp.float32)
    n = s.size
    m = r.size

    ranks = jnp.argsort(jnp.argsort(s))
    s_q = (ranks.astype(jnp.float32) + 1.0) / n
    r_sorted = jnp.sort(r)
    t_q = (jnp.arange(1, m + 1, dtype=jnp.float32)) / m
    matched = jnp.interp(s_q, t_q, r_sorted)
    return matched.reshape(shape).astype(source.dtype)


def mild_histogram_match(
    source: jnp.ndarray, reference: jnp.ndarray, weight: float = 0.2
) -> jnp.ndarray:
    """(1-w)*source + w*matched — the blended variant used at 0.25deg
    (weight 0.2) and 0.05deg (weight 0.0) in the reference pipelines."""
    if weight == 0.0:
        return source
    return (1.0 - weight) * source + weight * histogram_match(source, reference)


def batched_histogram_match(
    source: jnp.ndarray, reference: jnp.ndarray, weight: float = 0.2
) -> jnp.ndarray:
    """vmap over the leading (batch/time) axis: each sample matched against
    its own reference frame, faithful to `apply_mild_histogram_matching`."""
    return jax.vmap(lambda s, r: mild_histogram_match(s, r, weight))(source, reference)
