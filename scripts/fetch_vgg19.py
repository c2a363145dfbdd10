#!/usr/bin/env python
"""Download torchvision's pretrained VGG19 weights and convert them to the
`features`-only state_dict this framework's perceptual loss consumes
(LossConfig.vgg_weights_path / --vgg-weights).

The reference downloads the full 548 MB torchvision checkpoint at
PerceptualLoss init (/root/reference/models/losses.py:13-73 — the stored
notebook output shows the download). Build/CI environments here have zero
egress, so this is an OFFLINE, one-time step: run it on any
internet-connected machine, then ship the resulting .pth next to your
configs.

Usage:
    python scripts/fetch_vgg19.py [--out vgg19_features.pth]

The output contains only the convolutional `features` stack (~80 MB of
the 548 MB full model — the classifier head is never used by the
perceptual loss) with keys '0.weight', '0.bias', ... in torchvision's
Sequential numbering, exactly what
gan_danet_tpu.models.vgg.load_torch_vgg_features expects.
"""
from __future__ import annotations

import argparse
import sys

VGG19_URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="vgg19_features.pth",
                    help="output path for the features-only state_dict")
    ap.add_argument("--url", default=VGG19_URL,
                    help="torchvision VGG19 checkpoint URL")
    args = ap.parse_args(argv)

    import torch

    try:
        state = torch.hub.load_state_dict_from_url(
            args.url, map_location="cpu", progress=True)
    except Exception as e:  # no egress / proxy issues
        print(f"download failed: {e}\n"
              f"Fetch {args.url} manually, then run\n"
              f"  python scripts/fetch_vgg19.py --url file:///path/to/"
              f"vgg19-dcbb9e9d.pth", file=sys.stderr)
        return 1

    features = {k.removeprefix("features."): v for k, v in state.items()
                if k.startswith("features.")}
    if not features:
        print("checkpoint has no 'features.' keys — is this a torchvision "
              "VGG19 state_dict?", file=sys.stderr)
        return 1
    torch.save(features, args.out)
    n_params = sum(v.numel() for v in features.values())
    print(f"wrote {args.out}: {len(features)} tensors, "
          f"{n_params * 4 / 1e6:.0f} MB of conv weights")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
