#!/usr/bin/env python3
"""End-to-end demo: extract, match, visualize (reference demo.ipynb flow).

  python demo.py --extractor superpoint --image0 a.jpg --image1 b.jpg \
      --weights-extractor sp.npz --weights-matcher lg.npz --out matches.png

Without weights, random init is used (pipeline demo only — matches will be
meaningless until converted checkpoints are supplied; see
scripts/convert_weights.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extractor", default="superpoint",
                    choices=["superpoint", "disk", "aliked", "sift",
                             "doghardnet", "sift-device",
                             "doghardnet-device"])
    ap.add_argument("--image0",
                    default="/root/reference/assets/sacre_coeur1.jpg")
    ap.add_argument("--image1",
                    default="/root/reference/assets/sacre_coeur2.jpg")
    ap.add_argument("--max-keypoints", type=int, default=1024)
    ap.add_argument("--weights-extractor", default=None)
    ap.add_argument("--weights-matcher", default=None)
    ap.add_argument("--out", default="matches.png")
    ap.add_argument("--sequence", action="store_true",
                    help="use pipeline.match_sequence (extract-once fused "
                         "program) on the two images instead of match_pair")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")

    from lightglue_tpu import (
        ALIKED, DISK, DoGHardNet, DoGHardNetDevice, LightGlue, SIFT,
        SIFTDevice, SuperPoint, load_image, match_pair,
    )
    from lightglue_tpu.utils import viz2d

    extractors = {
        "superpoint": SuperPoint, "disk": DISK, "aliked": ALIKED,
        "sift": SIFT, "doghardnet": DoGHardNet,
        "sift-device": SIFTDevice, "doghardnet-device": DoGHardNetDevice,
    }
    kw = {"max_num_keypoints": args.max_keypoints}
    if args.weights_extractor:
        kw["params"] = args.weights_extractor
    extractor = extractors[args.extractor](**kw)
    mkw = {}
    if args.weights_matcher:
        mkw["params"] = args.weights_matcher
    matcher = LightGlue(args.extractor.replace("-device", ""), **mkw)

    image0 = load_image(args.image0)
    image1 = load_image(args.image1)
    if args.sequence:
        if not hasattr(extractor, "_forward_fn"):
            ap.error("--sequence needs a device extractor "
                     "(superpoint/disk/aliked)")
        import numpy as np

        from lightglue_tpu import match_sequence
        from lightglue_tpu.utils.image import resize_image

        # same-size frames for the fused sequence program
        h = min(image0.shape[0], image1.shape[0])
        w = min(image0.shape[1], image1.shape[1])
        frames = np.stack([
            resize_image(np.asarray(image0), (h, w))[0],
            resize_image(np.asarray(image1), (h, w))[0],
        ])
        feats, pairs = match_sequence(extractor, matcher, frames, window=1)
        feats0 = {k: v[0] for k, v in feats.items()}
        feats1 = {k: v[1] for k, v in feats.items()}
        matches01 = {"matches": pairs["matches"][0], "stop": pairs["stop"]}
        image0, image1 = frames[0], frames[1]
    else:
        feats0, feats1, matches01 = match_pair(
            extractor, matcher, image0, image1
        )

    kpts0, kpts1 = feats0["keypoints"], feats1["keypoints"]
    matches = matches01["matches"]
    m_kpts0 = kpts0[matches[:, 0]] if len(matches) else kpts0[:0]
    m_kpts1 = kpts1[matches[:, 1]] if len(matches) else kpts1[:0]

    viz2d.plot_images([image0, image1])
    viz2d.plot_matches(m_kpts0, m_kpts1, color="lime", lw=0.2)
    viz2d.add_text(0, f"stop after {matches01['stop']} layers")
    viz2d.save_plot(args.out)
    print(
        f"{args.extractor}: {int(feats0['valid'].sum())} x "
        f"{int(feats1['valid'].sum())} keypoints, "
        f"{len(matches)} matches, stopped at layer {matches01['stop']}; "
        f"saved {args.out}"
    )


if __name__ == "__main__":
    main()
