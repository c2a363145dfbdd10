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
    with pytest.raises(FloatingPointError):
        with debug_nans():
            jnp.log(jnp.zeros(())) - jnp.log(jnp.zeros(()))  # inf - inf
    # outside the scope: silent again
    bad = jnp.log(jnp.zeros(())) - jnp.log(jnp.zeros(()))
    assert np.isnan(np.asarray(bad))
