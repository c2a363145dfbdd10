"""Reference-scale wall-time measurements for VALIDATION.md (run on the
real TPU chip; CPU-mesh test envs will be slow but still correct).

Measures:
  1. preprocess wall (host path vs DataConfig.device_preprocess=True)
  2. stage-2 0.25->0.05deg pipeline wall at T=181 (device spline zooms)
Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def main():
    from gan_danet_tpu.core.config import DataConfig
    from gan_danet_tpu.data.pipeline import load_data_with_augmentation
    from gan_danet_tpu.data.synthetic import make_synthetic_raw

    dc = DataConfig(synthetic=True)
    t0 = time.perf_counter()
    raw = make_synthetic_raw(dc, seed=0)
    t_raw = time.perf_counter() - t0
    print(json.dumps({"stage": "synthesize_raw", "s": round(t_raw, 1)}))

    for dev in (False, True):
        cfg = dataclasses.replace(dc, device_preprocess=dev)
        t0 = time.perf_counter()
        data = load_data_with_augmentation(cfg, raw=raw)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": "preprocess",
                          "device_preprocess": dev, "s": round(dt, 1)}))
        sys.stdout.flush()
        if dev:
            # warm pass: the jitted stage program is compile-cached, so
            # this is the steady-state rebuild cost (REBUILD_CACHE runs)
            t0 = time.perf_counter()
            load_data_with_augmentation(cfg, raw=raw)
            dt = time.perf_counter() - t0
            print(json.dumps({"stage": "preprocess_warm",
                              "device_preprocess": True,
                              "s": round(dt, 1)}))
            sys.stdout.flush()

    # stage-2 at T=181: the chronological unaugmented tuple
    from gan_danet_tpu.data.pipeline import load_data

    data = load_data(dc, raw=raw)

    # stage-2 wall at reference scale with a random-init generator
    import jax
    import jax.numpy as jnp

    from gan_danet_tpu.core.config import GeneratorConfig
    from gan_danet_tpu.infer.downscale import make_apply_fn, predict_005
    from gan_danet_tpu.models.generator import FlexibleUpsamplingModule

    gen = FlexibleUpsamplingModule(
        GeneratorConfig(input_channels=46, dtype="bfloat16"))
    x = jnp.zeros((4, 88, 180, 46), jnp.float32)
    variables = jax.jit(lambda k, v: gen.init(k, v, train=False))(
        jax.random.PRNGKey(0), x)
    fn = make_apply_fn(gen, variables["params"],
                       variables.get("batch_stats"))
    mask = raw.mask_high
    bias = np.zeros((181, 352, 720), np.float32)
    unc = np.abs(np.random.default_rng(0)
                 .standard_normal((181, 88, 180))).astype(np.float32)
    out = "/tmp/val_stage2_out"
    t0 = time.perf_counter()
    s2 = predict_005(fn, data, mask, bias_high=bias, uncertainty=unc,
                     export_dir=out)
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": "stage2_005", "s": round(dt, 1),
                      "pearson": round(float(s2.pearson_r), 4)}))
    sys.stdout.flush()
    # warm pass: generator + post-chain programs compile-cached — the
    # steady-state production wall (exports included)
    t0 = time.perf_counter()
    predict_005(fn, data, mask, bias_high=bias, uncertainty=unc,
                export_dir=out)
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": "stage2_005_warm", "s": round(dt, 1)}))


if __name__ == "__main__":
    main()
