"""Profiling/tracing subsystem (SURVEY.md §5): model summary, HLO dump,
XLA cost analysis, debug_nans scoping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_danet_tpu.core.profiling import (
    cost_analysis,
    debug_nans,
    dump_hlo,
    model_summary,
)
from gan_danet_tpu.models.ae import Autoencoder


def test_model_summary_tabulates():
    s = model_summary(Autoencoder(input_channels=3),
                      jnp.zeros((1, 8, 10, 3)))
    assert "Autoencoder" in s and "Conv" in s


def test_dump_hlo_contains_convolution():
    def f(x):
        return jnp.tanh(x @ x.T)

    txt = dump_hlo(f, jnp.zeros((8, 8)), optimized=False)
    assert "dot" in txt or "convolution" in txt


def test_cost_analysis_reports_flops():
    def f(x):
        return x @ x

    costs = cost_analysis(f, jnp.zeros((64, 64)))
    assert costs is None or costs.get("flops", 0) >= 0


def test_debug_nans_raises_inside_scope():
    # a jitted fn with a runtime argument: jax_debug_nans is part of the
    # trace context, so entering the scope forces a freshly instrumented
    # compile (bare eager ops were order-flaky in the full suite — a
    # cached uninstrumented executable could serve the result)
    def f(x):
        return jnp.log(x) - jnp.log(x)        # inf - inf at x=0

    with pytest.raises(FloatingPointError):
        with debug_nans():
            np.asarray(jax.jit(f)(jnp.zeros(())))
    # outside the scope: silent again
    bad = jax.jit(f)(jnp.zeros(()))
    assert np.isnan(np.asarray(bad))
