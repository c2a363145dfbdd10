"""Command-line entry points.

The reference's entry points are notebooks (readme.txt:70-100); this CLI
covers the same workflows headlessly:

  python -m gan_danet_tpu data      # build/refresh the preprocessing cache
  python -m gan_danet_tpu train     # GAN-DANet adversarial training
  python -m gan_danet_tpu ensemble  # deep-ensemble + uncertainty artifacts
  python -m gan_danet_tpu infer     # two-stage 0.25deg + 0.05deg inference
  python -m gan_danet_tpu ae        # autoencoder baseline
  python -m gan_danet_tpu bench     # train-step throughput benchmark

Every command accepts --config (ExperimentConfig JSON) and --synthetic
(use the built-in synthetic dataset — no data files required).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path


def _load_config(args) -> "ExperimentConfig":
    from gan_danet_tpu.core.config import DataConfig, ExperimentConfig

    if args.config:
        cfg = ExperimentConfig.from_json(Path(args.config).read_text())
    else:
        cfg = ExperimentConfig(data=DataConfig.from_env())
    if args.synthetic:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))
    if getattr(args, "device_preprocess", False):
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, device_preprocess=True))
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))
    if getattr(args, "vgg_weights", None):
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss,
                                          vgg_weights_path=args.vgg_weights))
    if cfg.loss.use_perceptual and not cfg.loss.vgg_weights_path:
        print("warning: perceptual loss will use RANDOMLY INITIALISED "
              "VGG19 features (the reference trains on pretrained VGG19); "
              "pass --vgg-weights or set loss.vgg_weights_path",
              file=sys.stderr)
    return cfg


def _logger(args):
    from gan_danet_tpu.core.logger import MetricsLogger

    return MetricsLogger(path=args.log, echo=True)


def cmd_data(args) -> int:
    from gan_danet_tpu.data.pipeline import load_or_build_cache

    cfg = _load_config(args)
    data = load_or_build_cache(cfg.data, augmented=not args.no_augment)
    print(json.dumps({
        "cache_dir": str(cfg.data.cache_path),
        "samples": int(data[0][0].shape[0]),
        "aux_channels": int(data[2].shape[-1]),
    }))
    return 0


def _make_generator(args, cfg):
    if getattr(args, "model", "danet") == "hat":
        from gan_danet_tpu.models.hat import HAT

        return HAT(in_channels=cfg.data.n_aux + 1, dtype=cfg.train.dtype)
    return None  # ModelTrainer builds the DANet generator


def _make_mesh(args, cfg, default_ensemble: int = 1):
    """--mesh plumbing: 'auto' sizes the ('ensemble','data') mesh from
    cfg.mesh over all visible devices; 'ExD' (e.g. '2x4') sets both axes;
    a bare integer is a data-parallel width. None/absent -> single device
    (the reference's posture; SURVEY.md §2.10)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    import jax

    from gan_danet_tpu.core.meshes import make_mesh

    spec = spec.strip().lower()
    try:
        if spec == "auto":
            ens, dat = cfg.mesh.axis_sizes(jax.device_count())
        elif "x" in spec:
            parts = spec.split("x")
            if len(parts) != 2 or not all(p.strip().isdigit() for p in parts):
                raise ValueError
            ens, dat = (int(p) for p in parts)
        else:
            if not spec.isdigit():
                raise ValueError
            ens, dat = default_ensemble, int(spec)
        # '0x4' passes isdigit() but builds an empty mesh, and a bare '0'
        # would fall into make_mesh's n_data<=0 use-all-devices branch
        # instead of erroring — both axes must be positive
        if ens < 1 or dat < 1:
            raise ValueError
    except ValueError:
        raise SystemExit(
            f"error: --mesh {spec!r} is not 'auto', 'ExD' (e.g. '2x4'), "
            "or a data-parallel width (e.g. '8'); axes must be >= 1")
    return make_mesh(n_ensemble=ens, n_data=dat)


def cmd_train(args) -> int:
    from gan_danet_tpu.train.trainer import ModelTrainer

    cfg = _load_config(args)
    trainer = ModelTrainer(cfg, logger=_logger(args),
                           generator=_make_generator(args, cfg),
                           mesh=_make_mesh(args, cfg))
    if getattr(args, "resume", None):
        path = args.resume if args.resume != "auto" else None
        trainer.restore_checkpoint(path)   # None -> latest in checkpoint_dir
        print(f"resumed at step {int(trainer.state.step)}", file=sys.stderr)
    losses_g, losses_d = trainer.train(
        checkpoint_dir=cfg.train.checkpoint_dir,
        checkpoint_every=getattr(args, "checkpoint_every", 0) or 0)
    metrics = trainer.evaluate()
    path = trainer.save_checkpoint()
    print(json.dumps({"checkpoint": path, "epochs_run": len(losses_g),
                      **metrics}))
    return 0


def cmd_ensemble(args) -> int:
    import numpy as np

    from gan_danet_tpu.train.ensemble import EnsembleTrainer

    cfg = _load_config(args)
    ens = EnsembleTrainer(cfg, num_ensemble=args.members, logger=_logger(args),
                          mesh=_make_mesh(args, cfg,
                                          default_ensemble=args.members))
    out = Path(args.out or "ensemble_out")
    ckpt_dir = out / "checkpoints"
    if getattr(args, "resume", None):
        from gan_danet_tpu.core.checkpoint import latest_checkpoint

        path = (args.resume if args.resume != "auto"
                else latest_checkpoint(ckpt_dir))
        if path is None:
            raise SystemExit(f"--resume: no checkpoints under {ckpt_dir}")
        ens.restore_checkpoint(path)
        print(f"resumed from {path}", file=sys.stderr)
    # periodic full-state checkpoints: a preempted reference-scale
    # ensemble run loses at most --checkpoint-every epochs (default 1;
    # raise it on tunneled backends where the full-state pull costs more
    # than an epoch)
    ens.train_ensemble(checkpoint_dir=ckpt_dir,
                       checkpoint_every=args.checkpoint_every)
    preds = ens.predict_ensemble()
    trues = ens.collect_trues()
    mask = _load_mask(cfg, args)
    results = ens.compute_uncertainty(preds, trues=trues, mask=mask)
    ens.save_artifacts(out, results)
    ens.save_members(out / "ensemble_models")
    print(json.dumps({"out_dir": str(out), "members": args.members,
                      "uncertainty_mean": float(np.nanmean(results["uncertainty"]))}))
    return 0


def _load_mask(cfg, args):
    import numpy as np

    if args.synthetic or cfg.data.synthetic:
        from gan_danet_tpu.data.synthetic import make_synthetic_raw

        return make_synthetic_raw(cfg.data, cfg.data.synthetic_seed).mask_high
    p = Path(cfg.data.project_dir) / cfg.data.mask_high
    if p.exists():
        m = np.load(p).astype(np.float32)
        return m.T if m.shape == tuple(cfg.data.grid_025[::-1]) else m
    return np.ones(cfg.data.grid_025, np.float32)


def _load_uncertainty(args, out, n_time: int, grid_025=None):
    """Resolve the deep-ensemble per-pixel uncertainty for the 0.05deg
    NetCDF (reference test.ipynb:613: np.load('ensemble_uncertainty.npy')
    .squeeze() -> zoom x5 -> `uncertainty` variable). Order of preference:
    --uncertainty PATH, then auto-detection next to --out
    (<out>/ensemble_uncertainty.npy, <out>/../ensemble_out/..., ./ensemble_out/...).
    Returns a (T, H25, W25) array or None."""
    import numpy as np

    explicit = getattr(args, "uncertainty", None)
    candidates = ([Path(explicit)] if explicit else
                  [Path(out) / "ensemble_uncertainty.npy",
                   Path(out).parent / "ensemble_out" / "ensemble_uncertainty.npy",
                   Path("ensemble_out") / "ensemble_uncertainty.npy"])
    for p in candidates:
        if not p.exists():
            continue
        unc = np.load(p).squeeze()          # (T,1,H,W) -> (T,H,W)
        expect = ((n_time, *grid_025) if grid_025 is not None
                  else (n_time, "H", "W"))
        # validate the SPATIAL grid too: a wrong-resolution file (e.g. a
        # 0.5deg (181,44,90) artifact) would otherwise be silently zoomed
        # by the wrong factor into the flagship NetCDF
        bad_grid = grid_025 is not None and unc.shape[1:] != tuple(grid_025)
        if unc.ndim != 3 or unc.shape[0] != n_time or bad_grid:
            msg = (f"{p} has shape {unc.shape}, expected {expect} "
                   "[chronological unaugmented series on the 0.25deg grid]")
            if explicit:
                # the user asked for THIS file — failing loud beats
                # silently shipping the flagship NetCDF without its
                # uncertainty variable
                raise ValueError(f"--uncertainty {msg}")
            print(f"warning: {msg} — skipping the uncertainty variable",
                  file=sys.stderr)
            return None
        print(f"uncertainty: {p}", file=sys.stderr)
        return unc
    if explicit:
        raise FileNotFoundError(f"--uncertainty {explicit} not found")
    return None


def cmd_infer(args) -> int:
    from gan_danet_tpu.data.pipeline import load_or_build_cache
    from gan_danet_tpu.infer.downscale import predict_005, predict_025
    from gan_danet_tpu.train.trainer import ModelTrainer

    cfg = _load_config(args)
    data = load_or_build_cache(cfg.data, augmented=False)
    # The cache may hold the AUGMENTED series (the train command builds it
    # augmented); inference products are chronological originals — the
    # reference's exports carry T=181 time axes (test.ipynb cell 3,
    # res_t=181 NetCDF) and the ensemble uncertainty chain assumes the
    # same length. load_data_with_augmentation concatenates the original
    # series first; the original length is detected from the tiled trend
    # cube (NOT config.n_time — real ingest takes T from the files).
    from gan_danet_tpu.data.pipeline import infer_original_length

    ([d05, t05], [d25, t25], aux, s05, s025, sa) = data
    n = infer_original_length(t05, cfg.data.augmentation_factor)
    data = ([d05[:n], t05[:n]], [d25[:n], t25[:n]], aux[:n], s05, s025, sa)
    trainer = ModelTrainer(cfg, data=data, logger=_logger(args),
                           generator=_make_generator(args, cfg))
    trainer.restore_checkpoint(args.checkpoint or None)

    mask = _load_mask(cfg, args)
    out = args.out or "inference_out"
    fn = trainer.apply_fn()
    mesh = _make_mesh(args, cfg)
    s1 = predict_025(fn, data, mask, export_dir=out, mesh=mesh)
    fn2 = fn
    if getattr(args, "tile", None):
        # beyond-0.05deg memory headroom: run stage 2 tile-wise with halo
        # blending instead of one whole-raster forward
        from gan_danet_tpu.infer.tiling import tiled_apply_fn

        th, tw = (int(x) for x in args.tile.split("x"))
        print("note: --tile makes PAM/CAM attention TILE-LOCAL (their "
              "receptive field shrinks to the tile); use the largest tile "
              "that fits HBM and ~25% overlap — see infer/tiling.py for "
              "the measured error band", file=sys.stderr)
        fn2 = tiled_apply_fn(fn, (th, tw), overlap=args.tile_overlap)
    unc = _load_uncertainty(args, out, data[1][0].shape[0],
                            grid_025=tuple(cfg.data.grid_025))
    s2 = predict_005(fn2, data, mask,
                     bias_high=s1.bias_high, stage1_series=s1.series_pred,
                     uncertainty=unc, export_dir=out, mesh=mesh)
    print(json.dumps({"out_dir": out, "pearson_025": s1.pearson_r,
                      "pearson_005": s2.pearson_r}))
    return 0


def cmd_ae(args) -> int:
    from gan_danet_tpu.data.pipeline import load_or_build_cache
    from gan_danet_tpu.models.ae import AETrainer

    cfg = _load_config(args)
    ([_, _], [lr025, _], hr_aux, _, s025, _) = load_or_build_cache(
        cfg.data, augmented=False)
    mask = _load_mask(cfg, args)
    trainer = AETrainer(hr_aux, lr025, s025, mask=mask,
                        epochs=args.epochs or 10,
                        batch_size=args.batch_size or 8,
                        mesh=_make_mesh(args, cfg))
    trainer.train()
    metrics = trainer.evaluate(export_path=args.out or "ae_results.h5")
    print(json.dumps(metrics))
    return 0


def cmd_diffusion(args) -> int:
    """Latent-diffusion SR variant (the intent of the reference's
    LFS-stripped Diffusion+Model.ipynb): raster-conditioned DDPM over the
    0.25deg TWSA field, conditioned on the aux stack. Training follows
    the reference recipe (4.train.ipynb cell 5): shuffled batches,
    gradient accumulation x4 with global-norm clip 1.0, AdamW(1e-5) —
    run as scanned device-resident epochs; sampling is the jitted
    lax.scan CFG loop. Full-state checkpoint per run; --resume continues
    a previous run's optimizer/accumulation/PRNG state."""
    import jax.numpy as jnp
    import numpy as np

    from gan_danet_tpu.data.pipeline import load_or_build_cache
    from gan_danet_tpu.models.diffusion import DiffusionConfig, LatentDiffusion

    cfg = _load_config(args)
    ([_, _], [lr025, _], hr_aux, *_rest) = load_or_build_cache(
        cfg.data, augmented=False)
    h, w = lr025.shape[1:3]
    dcfg = DiffusionConfig(cond_channels=hr_aux.shape[-1],
                           grad_accum=args.grad_accum,
                           num_inference_steps=args.steps)
    # the VAE downsamples 2^(stages-1); the SD-topology UNet downsamples at
    # EVERY level (reference 3.unet.ipynb) — crop the raster so the latent
    # divides cleanly through the whole ladder
    div = 2 ** (len(dcfg.vae_channels) - 1) * 2 ** len(dcfg.unet_channels)
    h -= h % div
    w -= w % div
    img = lr025[..., None].astype(np.float32)[:, :h, :w]
    cond = hr_aux.astype(np.float32)[:, :h, :w]
    ld = LatentDiffusion(dcfg, sample_image_hw=(h, w),
                         sample_cond_shape=(1, h, w, cond.shape[-1]),
                         mesh=_make_mesh(args, cfg))
    out = Path(args.out or "diffusion_out")
    if getattr(args, "resume", None):
        from gan_danet_tpu.core.checkpoint import latest_checkpoint

        path = (args.resume if args.resume != "auto"
                else latest_checkpoint(out / "checkpoints"))
        if path is None:
            raise SystemExit(f"--resume: no checkpoints under "
                             f"{out / 'checkpoints'}")
        ld.restore_checkpoint(path)
        print(f"resumed from {path} at step {ld.step}", file=sys.stderr)
    bs = min(args.batch_size or 4, img.shape[0])
    losses = ld.train_epochs(img, cond, epochs=args.epochs or 1,
                             batch_size=bs, shuffle=True)
    ckpt = ld.save_checkpoint(out / "checkpoints")
    sample = ld.generate(jnp.asarray(cond[:1]), image_hw=(h, w),
                         num_inference_steps=args.steps)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "diffusion_sample.npy", np.asarray(sample))
    print(json.dumps({"out_dir": str(out), "final_loss": losses[-1],
                      "steps_trained": len(losses), "step": ld.step,
                      "checkpoint": ckpt}))
    return 0


def cmd_bench(args) -> int:
    detail = bool(getattr(args, "detail", False))
    try:
        import bench
    except ImportError:
        # bench.py lives at the repo root, outside the package; locate it
        # relative to the installed package for out-of-tree invocations
        import importlib.util

        path = Path(__file__).resolve().parent.parent / "bench.py"
        if not path.exists():
            print(json.dumps({"error": f"bench.py not found at {path}"}))
            return 1
        spec = importlib.util.spec_from_file_location("bench", path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

    bench.main(detail=detail)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gan_danet_tpu",
                                     description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", help="ExperimentConfig JSON file")
        p.add_argument("--synthetic", action="store_true",
                       help="use the built-in synthetic dataset")
        p.add_argument("--epochs", type=int)
        p.add_argument("--batch-size", type=int, dest="batch_size")
        p.add_argument("--log", help="metrics JSONL path")
        p.add_argument("--out", help="output directory/file")
        p.add_argument("--device-preprocess", action="store_true",
                       dest="device_preprocess",
                       help="run standardise/smooth/STL/FFT-augment as "
                            "jit-compiled device programs "
                            "(DataConfig.device_preprocess)")
        p.add_argument("--mesh",
                       help="device mesh: 'auto' (size from config), "
                            "'ExD' (ensemble x data, e.g. 2x4), or a "
                            "data-parallel width (e.g. 8)")

    for name, fn in [("data", cmd_data), ("train", cmd_train),
                     ("ensemble", cmd_ensemble), ("infer", cmd_infer),
                     ("ae", cmd_ae), ("diffusion", cmd_diffusion),
                     ("bench", cmd_bench)]:
        p = sub.add_parser(name)
        common(p)
        p.set_defaults(fn=fn)
        if name == "data":
            p.add_argument("--no-augment", action="store_true")
        if name == "ensemble":
            p.add_argument("--members", type=int, default=5)
            p.add_argument("--resume", nargs="?", const="auto",
                           help="resume from a checkpoint path, or from "
                                "the latest under <out>/checkpoints when "
                                "given without a value")
            p.add_argument("--checkpoint-every", dest="checkpoint_every",
                           type=int, default=1,
                           help="full-state checkpoint every N epochs "
                                "(0 disables; raise on tunneled backends "
                                "where the state pull costs more than an "
                                "epoch)")
        if name == "train":
            p.add_argument("--resume", nargs="?", const="auto",
                           help="resume from a checkpoint path, or from "
                                "the latest under train.checkpoint_dir "
                                "when given without a value")
            p.add_argument("--checkpoint-every", dest="checkpoint_every",
                           type=int, default=0,
                           help="full-state checkpoint every N epochs "
                                "(default: only at the end)")
        if name in ("train", "ensemble"):
            p.add_argument("--vgg-weights", dest="vgg_weights",
                           help="torch VGG19 .pth for the perceptual loss "
                                "(random init + warning otherwise — the "
                                "reference trains on pretrained VGG19)")
        if name == "infer":
            p.add_argument("--checkpoint")
            p.add_argument("--uncertainty",
                           help="ensemble_uncertainty.npy from the "
                                "`ensemble` command; auto-detected next to "
                                "--out when omitted — becomes the NetCDF "
                                "`uncertainty` variable (test.ipynb:613)")
            p.add_argument("--tile",
                           help="run stage 2 tile-wise, e.g. '44x90' "
                                "(HxW input tile); default whole-raster")
            p.add_argument("--tile-overlap", dest="tile_overlap", type=int,
                           default=8)
        if name in ("train", "infer"):
            p.add_argument("--model", choices=["danet", "hat"],
                           default="danet")
        if name == "diffusion":
            p.add_argument("--steps", type=int, default=50,
                           help="DDPM inference steps")
            p.add_argument("--grad-accum", dest="grad_accum", type=int,
                           default=4,
                           help="gradient accumulation window (reference "
                                "4.train.ipynb: x4)")
            p.add_argument("--resume", nargs="?", const="auto",
                           help="resume from a checkpoint path, or from "
                                "the latest under <out>/checkpoints when "
                                "given without a value")
        if name == "bench":
            p.add_argument("--detail", action="store_true",
                           help="also measure the non-headline "
                                "BASELINE.json configs -> BENCH_DETAILS.json")

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
