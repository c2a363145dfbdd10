"""Full-scale dress rehearsal through the FILE ingest path (VERDICT r4
task 5).

Synthesizes a reference-layout raw file tree at the full 181 x (88x180)
scale — GRACE NetCDF *directories* (win.py readdata parity; ingest falls
back to them when the precomputed npys are absent), an ERA5 NetCDF
directory at 0.1 deg with the [15:T+15] month padding (datasets.py
read_era parity: reorientation + cubic 0.4 zoom happen in the reader),
gldas25.npy with the [19:] slice margin, dem.npy, and (lon, lat)-
transposed masks (exercising the reorientation branch). Then drives

    data -> train --epochs 2 -> ensemble --members 2 -> infer

headlessly through the env-var contract ONLY (PROJECT_DIR / DATA_DIR /
ERA5_SUBDIR / CACHE_DIR — no --synthetic, no --config), recording wall
time per stage. Usage:

    python scripts/dress_rehearsal.py [--root DIR] [--keep]

Prints one JSON line with the stage walls; see VALIDATION.md for the
recorded run.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _write_series_nc(directory: Path, var: str, cube: np.ndarray,
                     months_per_file: int = 48) -> None:
    """Write a (T, y, x) cube as a directory of NetCDF files chunked
    along time (the reference's GRACE/ERA5 products are per-period
    files; the readers concatenate along time)."""
    from gan_danet_tpu.data.ncio import NCWriter

    directory.mkdir(parents=True, exist_ok=True)
    t = cube.shape[0]
    for i, start in enumerate(range(0, t, months_per_file)):
        chunk = cube[start : start + months_per_file]
        with NCWriter(directory / f"{var}_{i:02d}.nc") as nc:
            nc.create_dimension("time", chunk.shape[0])
            nc.create_dimension("lat", chunk.shape[1])
            nc.create_dimension("lon", chunk.shape[2])
            nc.create_variable("time", ("time",),
                               np.arange(start, start + chunk.shape[0],
                                         dtype=np.float32))
            nc.create_variable(var, ("time", "lat", "lon"), chunk)


def _era5_raw_from_target(target: np.ndarray, pad: int = 15) -> np.ndarray:
    """Invert the read_era reorientation: given the wanted post-ingest
    channel (T, 88, 180) at 0.25 deg, produce the 0.1 deg raw cube
    (T + 2*pad, 450, 220) such that read_era_channels' pipeline
    ([15:T+15] slice -> transpose -> rot90 k=3 -> transpose -> zoom 0.4)
    recovers a statistically equivalent field."""
    from scipy.ndimage import zoom

    t = target.shape[0]
    hi = zoom(target, (1, 2.5, 2.5), order=1, mode="nearest")  # (T,220,450)
    # pad the time axis so the reader's [15:T+15] window lands on `target`
    hi = np.concatenate([np.repeat(hi[:1], pad, axis=0), hi,
                         np.repeat(hi[-1:], pad, axis=0)])
    # invert: reoriented (T',b,a) -> (b,a,T') -> rot90 k=1 -> (a,b,T')
    # -> raw (T',a,b) with (a,b) = (450,220)
    x = np.transpose(hi, (1, 2, 0))            # (220, 450, T')
    x = np.rot90(x, k=1, axes=(0, 1))          # (450, 220, T')
    return np.ascontiguousarray(
        np.transpose(x, (2, 0, 1)).astype(np.float32))


def build_tree(root: Path, seed: int = 0, config=None) -> None:
    """Write the reference-layout raw file tree for `config` (default:
    full reference scale). Tiny configs work too — the CI test
    (tests/test_readers.py) locks the ERA5 inversion + GRACE nc-dir
    round-trip at small grids."""
    from gan_danet_tpu.core.config import DataConfig
    from gan_danet_tpu.data.synthetic import make_synthetic_raw

    cfg = config if config is not None else DataConfig()
    raw = make_synthetic_raw(cfg, seed)
    proj = root / "project"
    data_dir = root / "data"
    proj.mkdir(parents=True, exist_ok=True)

    # GRACE as NetCDF DIRECTORIES (no npys -> ingest takes the win.py
    # readdata branch)
    _write_series_nc(proj / "qz_rlwe-05", "twsan", raw.grace_05)
    _write_series_nc(proj / "qz_rlwe-25", "twsan", raw.grace_025)

    # GLDAS with the reference's 19-frame leading margin (datasets.py:376
    # slices [19:])
    rng = np.random.default_rng(seed + 1)
    margin = rng.standard_normal(
        (19,) + raw.gldas.shape[1:]).astype(np.float32)
    np.save(proj / "gldas25.npy", np.concatenate([margin, raw.gldas]))
    np.save(proj / "dem.npy", raw.dem)
    # masks stored (lon, lat) — the readers transpose them back
    np.save(proj / "tpb_l.npy", raw.mask_low.T)
    np.save(proj / "tpb_h.npy", raw.mask_high.T)

    # ERA5 at raw 0.1 deg, per-variable file series, with the
    # [15:T+15] month padding
    era_dir = data_dir / "ERA5" / "11"
    for var, ch in (("t2m", 0), ("e", 1), ("ro", 3), ("sde", 4), ("tp", 5)):
        _write_series_nc(era_dir, var,
                         _era5_raw_from_target(raw.era5[..., ch]),
                         months_per_file=64)


def run_stages(root: Path, out: Path) -> dict:
    env = dict(os.environ)
    # run from an isolated cwd (so ./checkpoints lands under root, not in
    # the repo) with the repo PREPENDED to the import path — never
    # overwrite PYTHONPATH wholesale: platform plugins (e.g. the TPU
    # backend's site dir) ride on it
    prev_pp = os.environ.get("PYTHONPATH")
    env.update({
        "PROJECT_DIR": str(root / "project"),
        "DATA_DIR": str(root / "data"),
        "ERA5_SUBDIR": "ERA5/11",
        "CACHE_DIR": str(root / "cache"),
        "REBUILD_CACHE": "0",
        "PYTHONPATH": (f"{REPO}{os.pathsep}{prev_pp}" if prev_pp
                       else str(REPO)),
    })
    cwd = root / "run_cwd"
    cwd.mkdir(parents=True, exist_ok=True)
    walls = {}

    def run(tag, args):
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, "-m", "gan_danet_tpu", *args],
                              cwd=cwd, env=env, capture_output=True,
                              text=True)
        walls[tag] = round(time.perf_counter() - t0, 1)
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            raise RuntimeError(f"{tag} failed rc={proc.returncode}:\n"
                               f"{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}")
        lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
        walls[f"{tag}_result"] = lines[-1] if lines else ""
        return walls[f"{tag}_result"]

    run("data", ["data"])
    run("train", ["train", "--epochs", "2"])
    run("ensemble", ["ensemble", "--members", "2", "--epochs", "2",
                     "--out", str(out / "ensemble_out")])
    run("infer", ["infer", "--out", str(out / "inference_out"),
                  "--uncertainty",
                  str(out / "ensemble_out" / "ensemble_uncertainty.npy")])
    return walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gan_danet_rehearsal")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthetic tree afterwards")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    root = Path(args.root)
    t0 = time.perf_counter()
    if not args.skip_build:
        if root.exists():
            shutil.rmtree(root)
        build_tree(root)
    build_wall = round(time.perf_counter() - t0, 1)

    walls = run_stages(root, root / "runs")
    walls["tree_build"] = build_wall
    print(json.dumps(walls))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
