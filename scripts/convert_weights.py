#!/usr/bin/env python3
"""Convert reference PyTorch checkpoints to lightglue_tpu native .npz.

Usage:
  python scripts/convert_weights.py lightglue superpoint_lightglue.pth out.npz
  python scripts/convert_weights.py superpoint superpoint_v1.pth out.npz
  python scripts/convert_weights.py aliked aliked-n16.pth out.npz
  python scripts/convert_weights.py hardnet hardnet.pth out.npz
  python scripts/convert_weights.py disk depth.pth out.npz

The reference downloads these from versioned release URLs
(lightglue/lightglue.py:348-349, superpoint.py:144, aliked.py:620); point
this script at the cached .pth files (e.g. ~/.cache/torch/hub/checkpoints).
Requires torch only to deserialize; the output is a flat npz of this
framework's param pytree (weights.save_params format).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=[
        "lightglue", "superpoint", "aliked", "hardnet", "disk"
    ])
    ap.add_argument("checkpoint", help=".pth state dict path")
    ap.add_argument("output", help="output .npz path")
    ap.add_argument("--features", default="superpoint",
                    help="lightglue preset (sets input_dim/add_scale_ori)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from lightglue_tpu import weights as w
    from lightglue_tpu.configs import lightglue_config

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    if args.model == "lightglue":
        params = w.convert_lightglue(sd, lightglue_config(args.features))
    elif args.model == "superpoint":
        params = w.convert_superpoint(sd)
    elif args.model == "aliked":
        params = w.convert_aliked(sd)
    elif args.model == "hardnet":
        params = w.convert_hardnet(sd)
    elif args.model == "disk":
        params = w.convert_disk(sd)
    w.save_params(args.output, params)
    n = len(w.flatten_tree(params))
    print(f"wrote {args.output}: {n} arrays")


if __name__ == "__main__":
    main()
