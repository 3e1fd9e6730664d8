"""One-shot real-released-checkpoint verifier (VERDICT r4 item 7).

The registry/converter machinery (lightglue_tpu/weights.py) mirrors the
reference's versioned checkpoint downloads (reference lightglue.py:416-421,
superpoint.py:144-145, aliked.py:692-695), but this environment is
network-blocked, so no released ``.pth`` has ever passed through the
converters. The moment network exists, run this script: it

1. iterates ``weights.REGISTRY``, fetching + converting + caching every
   entry (per-entry graceful offline/error skip, status recorded);
2. runs the extractor+matcher quality protocol (scripts/quality_eval.py:
   LightGlue matches -> RANSAC fundamental-matrix inliers @2px) with REAL
   weights on the reference's bundled benchmark pairs
   (reference benchmark.py:104-114);
3. writes ``benchmarks/quality_real.json``.

Usage: python scripts/fetch_and_verify.py [--cache-dir DIR] [--no-write]
       [--only name ...]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

# (extractor checkpoint, matcher checkpoint, pipeline wrapper factory key)
# — every real-weights combination the registry supports. The sift row
# needs no extractor checkpoint (OpenCV SIFT is handcrafted).
COMBOS = (
    ("superpoint_v1", "superpoint_lightglue", "superpoint"),
    ("aliked-n16", "aliked_lightglue", "aliked"),
    ("disk_depth", "disk_lightglue", "disk"),
    ("hardnet_liberty_aug", "doghardnet_lightglue", "doghardnet"),
    (None, "sift_lightglue", "sift"),
)

SCHEMA_VERSION = 1


def fetch_all(names=None, cache_dir=None):
    """Fetch+convert+cache every registry entry.

    Returns (entries, params): ``entries[name]`` is a status record
    ({"status": "ok" | "offline" | "error", "seconds", ["error"]});
    ``params[name]`` holds the converted pytree for "ok" entries.
    """
    from lightglue_tpu import weights as W

    entries, params = {}, {}
    for name in names or sorted(W.REGISTRY):
        t0 = time.time()
        try:
            params[name] = W.fetch(name, cache_dir=cache_dir)
            n_arrays = len(W.flatten_tree(params[name]))
            entries[name] = {"status": "ok", "arrays": n_arrays}
        except W.WeightsUnavailableError as e:
            entries[name] = {"status": "offline", "error": f"{e}"[:200]}
        except Exception as e:  # conversion bug: record loudly, keep going
            entries[name] = {"status": "error", "error": f"{e}"[:200]}
        entries[name]["seconds"] = round(time.time() - t0, 1)
        print(f"[fetch] {name}: {entries[name]['status']}", flush=True)
    return entries, params


def _make_extractor(kind, params, max_kpts):
    from lightglue_tpu import pipeline as pl

    if kind == "superpoint":
        return pl.SuperPoint(max_num_keypoints=max_kpts, params=params,
                             pretrained=False)
    if kind == "aliked":
        return pl.ALIKED(max_num_keypoints=max_kpts, params=params,
                         pretrained=False)
    if kind == "disk":
        return pl.DISK(max_num_keypoints=max_kpts, params=params,
                       pretrained=False)
    if kind == "doghardnet":
        return pl.DoGHardNetDevice(max_num_keypoints=max_kpts, params=params,
                                   pretrained=False)
    if kind == "sift":
        return pl.SIFT(max_num_keypoints=max_kpts, backend="opencv")
    raise ValueError(kind)


def run_quality(entries, params, max_kpts=2048):
    """Real-weights extractor+matcher quality on the bundled pairs.

    Runs every COMBOS row whose checkpoints all fetched OK; returns
    ``{method/pair: record}`` rows in the quality_eval.py schema.
    """
    from quality_eval import PAIRS, eval_matcher  # scripts/quality_eval.py

    from lightglue_tpu import pipeline as pl
    from lightglue_tpu.utils.image import load_image

    results = {}
    for ext_ckpt, match_ckpt, kind in COMBOS:
        needed = [c for c in (ext_ckpt, match_ckpt) if c is not None]
        missing = [c for c in needed
                   if entries.get(c, {}).get("status") != "ok"]
        if missing:
            results[f"{kind}_real+real_matcher"] = {
                "skipped": f"checkpoints unavailable: {missing}"
            }
            continue
        extractor = _make_extractor(kind, params.get(ext_ckpt), max_kpts)
        matcher = pl.LightGlue(kind, params=params[match_ckpt])
        for pname, p0, p1 in PAIRS:
            t0 = time.time()
            try:
                rec = eval_matcher(
                    extractor, matcher, load_image(p0), load_image(p1)
                )
            except Exception as e:
                rec = {"error": f"{e}"[:200]}
            rec["eval_s"] = round(time.time() - t0, 1)
            key = f"{kind}_real+real_matcher/{pname}"
            results[key] = rec
            print(f"[quality] {key}: {rec}", flush=True)
    return results


def build_report(entries, results, max_kpts=2048):
    return {
        "schema_version": SCHEMA_VERSION,
        "protocol": (
            "REAL released checkpoints (weights.REGISTRY) -> convert -> "
            "LightGlue matches -> RANSAC F-matrix inliers @2px on the "
            "reference benchmark pairs (benchmark.py:104-114)"
        ),
        "max_kpts": max_kpts,
        "entries": entries,
        "results": results,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--max-kpts", type=int, default=2048)
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="registry names to fetch (default: all)")
    args = ap.parse_args(argv)

    entries, params = fetch_all(names=args.only, cache_dir=args.cache_dir)
    n_ok = sum(1 for e in entries.values() if e["status"] == "ok")
    results = run_quality(entries, params, max_kpts=args.max_kpts) \
        if n_ok else {}
    report = build_report(entries, results, max_kpts=args.max_kpts)
    if not args.no_write:
        out = REPO / "benchmarks" / "quality_real.json"
        out.parent.mkdir(exist_ok=True)
        out.write_text(json.dumps(report, indent=1))
        print(f"wrote {out} ({n_ok}/{len(entries)} checkpoints fetched)")
    return report


if __name__ == "__main__":
    main()
