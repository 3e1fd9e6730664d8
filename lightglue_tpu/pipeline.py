"""User-facing pipeline API mirroring the reference's ergonomics.

``SuperPoint(...).extract(image)`` -> feats dict; ``LightGlue(...)`` callable
on ``{"image0": feats0, "image1": feats1}``; ``match_pair`` end-to-end
(reference: lightglue/utils.py:131-165). Under the hood everything is the
pure-functional, static-shape JAX core; these wrappers only manage params,
jit caches, preprocessing and host-side match compaction.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import weights as weights_lib
from .configs import (
    FEATURES,
    ALIKEDConfig,
    LightGlueConfig,
    PreprocessConfig,
    SuperPointConfig,
    lightglue_config,
)
from .configs import DISKConfig, SIFTConfig
from .models import aliked as aliked_model
from .models import disk as disk_model
from .models import lightglue as lg
from .models import sift as sift_model
from .models import superpoint as sp
from .utils import diagnostics
from .utils.image import ImagePreprocessor, numpy_image_to_array, pad_to_multiple


def map_tensor(input_, func):
    """Recursively apply ``func`` to arrays in nested containers
    (reference: utils.py:41-52)."""
    if isinstance(input_, (str, bytes)):
        return input_
    if isinstance(input_, dict):
        return {k: map_tensor(v, func) for k, v in input_.items()}
    if isinstance(input_, (list, tuple)):
        return type(input_)(map_tensor(v, func) for v in input_)
    if isinstance(input_, (np.ndarray, jnp.ndarray)):
        return func(input_)
    return input_


def batch_to_device(batch: dict, device=None) -> dict:
    """Move a (nested) batch onto a device (reference: utils.py:55-61;
    JAX arrays are device-resident, so this is jax.device_put)."""
    if device is None:
        device = jax.devices()[0]
    return map_tensor(batch, lambda t: jax.device_put(jnp.asarray(t), device))


def rbd(data: dict) -> dict:
    """Remove batch dimension (reference: utils.py:64-69)."""
    return {
        k: v[0] if isinstance(v, (np.ndarray, jnp.ndarray, list)) else v
        for k, v in data.items()
    }


def compact_matches(
    matches0: np.ndarray, mscores0: np.ndarray
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Host-side ragged match lists from static-shape outputs (reference
    builds these on device with dynamic shapes, lightglue.py:593-602).
    Uses the C++ host runtime when available (native.py)."""
    from . import native

    return native.compact_matches(matches0, mscores0)


_AUTO_KPTS_CAP = 16384


def _auto_kpts_bucket(conf, h: int, w: int) -> int:
    """Static capacity for ``max_num_keypoints=None`` (reference default:
    keep ALL points above the detection threshold, superpoint.py:108-117,
    189-207; benchmark.py:142 constructs with max=None).

    Radius-r NMS survivors are local maxima of (2r+1)^2 windows, so two
    survivors are at least r+1 apart per axis -> at most one per
    (r+1)x(r+1) tile. That area-derived bound, rounded up to a 2048
    ladder step (bounds recompiles across image sizes), makes the
    validity mask EXACTLY the reference's threshold selection whenever
    the bound fits the 16384 cap; beyond the cap we warn once about the
    (pathological: >16k surviving maxima) truncation."""
    r = getattr(conf, "nms_radius", None)
    if r is None:
        r = getattr(conf, "nms_window_size", 1) // 2
    r = max(int(r), 0)
    bound = -(-h // (r + 1)) * (-(-w // (r + 1)))
    k = min(-(-bound // 2048) * 2048, _AUTO_KPTS_CAP, h * w)
    if bound > _AUTO_KPTS_CAP:
        diagnostics.warn_once(
            f"auto-kpts-cap-{type(conf).__name__}",
            f"max_num_keypoints=None: NMS capacity bound {bound} at "
            f"{w}x{h} exceeds the {_AUTO_KPTS_CAP} static cap; keypoints "
            "beyond the cap (weakest first) would be dropped. Pass an "
            "explicit max_num_keypoints to silence.",
        )
    return k


class Extractor:
    """Base wrapper: preprocessing + jitted forward + coordinate rescale
    (reference Extractor.extract, utils.py:136-147)."""

    stride = 8  # pad input H/W to this multiple

    def __init__(self):
        self._jit_forward = jax.jit(
            self._forward_fn, static_argnames=("conf",)
        )

    def _effective_conf(self, h: int, w: int):
        """Resolve max_num_keypoints=None to an area-derived bucket (the
        jit cache keys on the resolved conf, so each ladder step compiles
        once)."""
        if self.conf.max_num_keypoints is not None:
            return self.conf
        return self.conf.replace(
            max_num_keypoints=_auto_kpts_bucket(self.conf, h, w)
        )

    def extract(self, image, **preprocess_overrides) -> Dict[str, np.ndarray]:
        """image: (H, W, C) or (H, W) numpy/JAX array, float [0,1] or uint8.
        Returns feats dict with a leading batch dim: keypoints (1, K, 2) in
        ORIGINAL image pixel coords, keypoint_scores, descriptors, valid,
        image_size (1, 2) = original (w, h)."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = numpy_image_to_array(img)
        if img.ndim == 2:
            img = img[..., None]
        if img.ndim == 4:
            if img.shape[0] != 1:
                raise ValueError("extract() takes a single unbatched image")
            img = img[0]
        orig_h, orig_w = img.shape[:2]
        pp = ImagePreprocessor(self.preprocess_conf, **preprocess_overrides)
        img, scales = pp(img)
        img, (vh, vw) = pad_to_multiple(img, self.stride)
        feats = self._jit_forward(
            self.params,
            self._effective_conf(img.shape[0], img.shape[1]),
            jnp.asarray(img)[None],
            jnp.asarray([[vw, vh]], jnp.float32),
        )
        kpts = np.asarray(feats.keypoints)
        kpts = (kpts + 0.5) / scales[None, None] - 0.5
        out = {
            "keypoints": kpts.astype(np.float32),
            "keypoint_scores": np.asarray(feats.keypoint_scores),
            "descriptors": np.asarray(feats.descriptors),
            "valid": np.asarray(feats.valid),
            "image_size": np.array([[orig_w, orig_h]], np.float32),
        }
        if feats.scales is not None:
            out["scales"] = np.asarray(feats.scales)
        if feats.oris is not None:
            out["oris"] = np.asarray(feats.oris)
        return out

    def extract_batch(self, images) -> Dict[str, np.ndarray]:
        """Batched extraction for same-size images: (B, H, W, C) float [0,1]
        (throughput/serving path; single compile, one device program).
        No resizing — images must be pre-sized; H/W padded to the stride."""
        imgs = np.asarray(images, np.float32)
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        b, h, w = imgs.shape[:3]
        ph, pw = (-h) % self.stride, (-w) % self.stride
        if ph or pw:
            imgs = np.pad(imgs, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="edge")
        sizes = np.tile([[w, h]], (b, 1)).astype(np.float32)
        feats = self._jit_forward(
            self.params,
            self._effective_conf(imgs.shape[1], imgs.shape[2]),
            jnp.asarray(imgs), jnp.asarray(sizes),
        )
        out = {
            "keypoints": np.asarray(feats.keypoints),
            "keypoint_scores": np.asarray(feats.keypoint_scores),
            "descriptors": np.asarray(feats.descriptors),
            "valid": np.asarray(feats.valid),
            "image_size": sizes,
        }
        return out


class SuperPoint(Extractor):
    """SuperPoint wrapper (reference superpoint.py:98-148)."""

    def __init__(
        self,
        params=None,
        conf: Optional[SuperPointConfig] = None,
        seed: int = 0,
        pretrained: bool = False,
        **conf_overrides,
    ):
        self.conf = (conf or SuperPointConfig()).replace(**conf_overrides)
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        if params is None and pretrained:
            params = weights_lib.fetch("superpoint_v1")
        if params is None:
            params = sp.init_params(jax.random.key(seed), self.conf)
        elif isinstance(params, (str,)):
            params = weights_lib.load_params(params)
        self.params = params
        self._forward_fn = sp.forward
        super().__init__()


class ALIKED(Extractor):
    """ALIKED wrapper (reference aliked.py:612-695)."""

    stride = 32

    def __init__(
        self,
        params=None,
        conf: Optional[ALIKEDConfig] = None,
        seed: int = 0,
        pretrained: bool = False,
        **conf_overrides,
    ):
        self.conf = (conf or ALIKEDConfig()).replace(**conf_overrides)
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        if params is None and pretrained:
            params = weights_lib.fetch(self.conf.model_name)
        if params is None:
            params = aliked_model.init_params(jax.random.key(seed), self.conf)
        elif isinstance(params, str):
            params = weights_lib.load_params(params)
        self.params = params
        self._forward_fn = aliked_model.forward
        super().__init__()


class DISK(Extractor):
    """DISK wrapper (reference disk.py:7-55)."""

    stride = 16

    def __init__(
        self,
        params=None,
        conf: Optional[DISKConfig] = None,
        seed: int = 0,
        pretrained: bool = False,
        **conf_overrides,
    ):
        self.conf = (conf or DISKConfig()).replace(**conf_overrides)
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        if params is None and pretrained:
            params = weights_lib.fetch("disk_depth")
        if params is None:
            params = disk_model.init_params(jax.random.key(seed), self.conf)
        elif isinstance(params, str):
            params = weights_lib.load_params(params)
        self.params = params
        self._forward_fn = disk_model.forward
        super().__init__()


class SIFT:
    """SIFT wrapper (reference sift.py:79-216). Host-side detection
    (opencv backend) or TPU DoG (jax backend), static-k padded outputs."""

    _apply_rootsift = True

    def __init__(self, conf: Optional[SIFTConfig] = None, **conf_overrides):
        self.conf = (conf or SIFTConfig()).replace(**conf_overrides)
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        self._jit_sift = None

    def _detect(self, img_gray: np.ndarray) -> dict:
        if self.conf.backend == "opencv":
            return sift_model.extract_single_image_opencv(img_gray, self.conf)
        if self.conf.backend.startswith("pycolmap"):
            pred = sift_model.extract_single_image_pycolmap(
                img_gray, self.conf
            )
            if self.conf.nms_radius is not None:
                keep = sift_model.filter_dog_point(
                    pred["keypoints"], pred["scales"], pred["oris"],
                    img_gray.shape, self.conf.nms_radius,
                    scores=pred["keypoint_scores"],
                )
                pred = {k: v[keep] for k, v in pred.items()}
            k = self.conf.max_num_keypoints
            if k is not None and len(pred["keypoints"]) > k:
                idx = np.argsort(-pred["keypoint_scores"])[:k]
                pred = {k_: v[idx] for k_, v in pred.items()}
            return pred
        if self.conf.backend == "jax":
            from .models import sift_jax

            if self._jit_sift is None:
                self._jit_sift = jax.jit(
                    sift_jax.extract_single, static_argnames=("conf",)
                )
            out = self._jit_sift(jnp.asarray(img_gray), self.conf)
            out = {k: np.asarray(v) for k, v in out.items()}
            valid = out.pop("valid")
            return {k: v[valid] for k, v in out.items()}
        raise ValueError(
            f"Unknown SIFT backend: {self.conf.backend!r} not in "
            "{'opencv', 'pycolmap', 'pycolmap_cpu', 'pycolmap_cuda', 'jax'}"
        )

    def extract(self, image, **preprocess_overrides) -> Dict[str, np.ndarray]:
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = numpy_image_to_array(img)
        if img.ndim == 4:
            img = img[0]
        if img.ndim == 3 and img.shape[-1] == 3:
            gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
        elif img.ndim == 3:
            gray = img[..., 0]
        else:
            gray = img
        orig_h, orig_w = gray.shape
        pp = ImagePreprocessor(self.preprocess_conf, **preprocess_overrides)
        gray_r, scales_xy = pp(gray[..., None])
        gray_r = gray_r[..., 0] if gray_r.ndim == 3 else gray_r
        pred = self._describe(gray_r, self._detect(gray_r))
        if self.conf.rootsift and self._apply_rootsift:
            pred["descriptors"] = sift_model.sift_to_rootsift(
                pred["descriptors"]
            )
        pred = sift_model.pad_features(pred, self.conf.max_num_keypoints)
        kpts = (pred["keypoints"] + 0.5) / scales_xy[None] - 0.5
        return {
            "keypoints": kpts[None].astype(np.float32),
            "keypoint_scores": pred["keypoint_scores"][None],
            "descriptors": pred["descriptors"][None],
            "scales": pred["scales"][None],
            "oris": pred["oris"][None],
            "valid": pred["valid"][None],
            "image_size": np.array([[orig_w, orig_h]], np.float32),
        }

    def _describe(self, gray: np.ndarray, pred: dict) -> dict:
        return pred  # opencv already described


class DoGHardNet(SIFT):
    """SIFT keypoints + HardNet descriptors on 32x32 LAF patches
    (reference dog_hardnet.py:8-41; HardNet replaces the SIFT descriptor, no
    RootSIFT)."""

    _apply_rootsift = False

    def __init__(self, params=None, seed: int = 0, conf=None,
                 pretrained: bool = False, **conf_overrides):
        super().__init__(conf=conf, **conf_overrides)
        from .models import hardnet

        if params is None and pretrained:
            params = weights_lib.fetch("hardnet_liberty_aug")
        if params is None:
            params = hardnet.init_params(jax.random.key(seed))
        elif isinstance(params, str):
            params = weights_lib.load_params(params)
        self.hardnet_params = params
        self._jit_describe = jax.jit(hardnet.describe_patches)
        self._jit_patches = jax.jit(hardnet.extract_laf_patches)

    def _describe(self, gray: np.ndarray, pred: dict) -> dict:
        k = len(pred["keypoints"])
        if k == 0:
            pred["descriptors"] = np.zeros((0, 128), np.float32)
            return pred
        patches = self._jit_patches(
            jnp.asarray(gray),
            jnp.asarray(pred["keypoints"]),
            jnp.asarray(6.0 * pred["scales"]),  # reference dog_hardnet.py:35
            jnp.asarray(pred["oris"]),
        )
        pred["descriptors"] = np.asarray(
            self._jit_describe(self.hardnet_params, patches)
        )
        return pred


class SIFTDevice(Extractor):
    """Fully on-device SIFT (models/sift_jax.py TPU DoG scale space) behind
    the standard Extractor surface — unlike the host-orchestrated ``SIFT``
    wrapper, this one works with ``match_sequence`` / ``extract_batch``
    fused programs."""

    stride = 1

    def __init__(self, conf: Optional[SIFTConfig] = None, **conf_overrides):
        from .models import sift_jax

        self.conf = (conf or SIFTConfig(backend="jax")).replace(
            **conf_overrides
        )
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        self.params = None  # handcrafted: no learned parameters
        self._forward_fn = sift_jax.forward
        super().__init__()


class DoGHardNetDevice(Extractor):
    """Fully on-device DoGHardNet (TPU SIFT detection + HardNet descriptors
    on LAF patches, models/hardnet.py) behind the standard Extractor
    surface; works with ``match_sequence`` / ``extract_batch``."""

    stride = 1

    def __init__(self, params=None, seed: int = 0,
                 conf: Optional[SIFTConfig] = None,
                 pretrained: bool = False, **conf_overrides):
        from .models import hardnet

        self.conf = (conf or SIFTConfig(backend="jax")).replace(
            **conf_overrides
        )
        self.preprocess_conf = PreprocessConfig(resize=self.conf.resize)
        if params is None and pretrained:
            params = weights_lib.fetch("hardnet_liberty_aug")
        if params is None:
            params = hardnet.init_params(jax.random.key(seed))
        elif isinstance(params, str):
            params = weights_lib.load_params(params)
        self.params = params
        self._forward_fn = hardnet.forward
        super().__init__()


class LightGlue:
    """Matcher wrapper (reference LightGlue.forward dict API,
    lightglue.py:456-479)."""

    def __init__(
        self,
        features: Optional[str] = "superpoint",
        params=None,
        conf: Optional[LightGlueConfig] = None,
        seed: int = 0,
        pretrained: bool = False,
        **conf_overrides,
    ):
        self.conf = conf or lightglue_config(features, **conf_overrides)
        if params is None and pretrained:
            # released checkpoint via the registry (reference auto-downloads
            # at construction, lightglue.py:415-421); raises
            # WeightsUnavailableError offline
            params = weights_lib.fetch(self.conf.weights)
        if params is None:
            params = lg.init_params(jax.random.key(seed), self.conf)
        elif isinstance(params, str):
            params = weights_lib.load_params(params)
        self.params = params
        self._jit_forward = jax.jit(lg.forward, static_argnames=("conf",))
        self.static_lengths: Optional[Tuple[int, ...]] = None

    def compile(self, static_lengths=(256, 512, 768, 1024, 1280, 1536)):
        """Register static padding buckets (reference LightGlue.compile,
        lightglue.py:439-454): each request's keypoint buffers are padded to
        the next bucket with validity masks, so every length in a bucket
        hits one cached XLA program instead of recompiling per count.

        Unlike the reference — which compiles per-layer torch graphs and
        warns that width pruning is partially disabled under torch.compile
        (lightglue.py:442-446) — every forward here is already a single
        static-shape jit program, so adaptivity is unaffected; this only
        controls the padding policy. For eager ahead-of-time compilation
        of a bucket x batch grid plus a persistent cache, use
        parallel.batching.BatchMatcher.warmup."""
        self.static_lengths = tuple(sorted(static_lengths))
        return self

    def _bucket(self, n: int) -> Optional[int]:
        if self.static_lengths is None:
            return None
        for b in self.static_lengths:
            if n <= b:
                return b
        return None  # beyond the largest bucket: run unpadded

    def __call__(self, data: dict) -> dict:
        for key in ("image0", "image1"):
            assert key in data, f"Missing key {key} in data"
        d0, d1 = data["image0"], data["image1"]

        def get(d, k):
            v = d.get(k)
            return None if v is None else jnp.asarray(v)

        kw = dict(
            kpts0=jnp.asarray(d0["keypoints"]),
            kpts1=jnp.asarray(d1["keypoints"]),
            desc0=jnp.asarray(d0["descriptors"]),
            desc1=jnp.asarray(d1["descriptors"]),
            size0=get(d0, "image_size"),
            size1=get(d1, "image_size"),
            mask0=get(d0, "valid"),
            mask1=get(d1, "valid"),
        )
        if self.conf.add_scale_ori:
            kw.update(
                scales0=get(d0, "scales"),
                oris0=get(d0, "oris"),
                scales1=get(d1, "scales"),
                oris1=get(d1, "oris"),
            )
        m_orig = kw["kpts0"].shape[1]
        n_orig = kw["kpts1"].shape[1]
        for side, n_in in (("0", m_orig), ("1", n_orig)):
            bucket = self._bucket(n_in)
            if bucket is None or bucket == n_in:
                continue
            pad = bucket - n_in

            def padded(x, value):
                widths = [(0, 0)] * x.ndim
                widths[1] = (0, pad)
                return jnp.pad(x, widths, constant_values=value)

            kw[f"kpts{side}"] = padded(kw[f"kpts{side}"], 1.0)
            kw[f"desc{side}"] = padded(kw[f"desc{side}"], 0.0)
            mask = kw[f"mask{side}"]
            if mask is None:
                b = kw[f"kpts{side}"].shape[0]
                mask = jnp.ones((b, n_in), bool)
            kw[f"mask{side}"] = padded(mask, False)
            for extra in (f"scales{side}", f"oris{side}"):
                if kw.get(extra) is not None:
                    kw[extra] = padded(kw[extra], 0.0)
        out = self._jit_forward(self.params, self.conf, **kw)
        if out.matches0.shape[1] != m_orig or out.matches1.shape[1] != n_orig:
            # strip bucket padding back off (reference strips at
            # lightglue.py:590-591); padded slots are masked, so no match
            # index ever points into the pad band
            out = out._replace(
                matches0=out.matches0[:, :m_orig],
                matches1=out.matches1[:, :n_orig],
                matching_scores0=out.matching_scores0[:, :m_orig],
                matching_scores1=out.matching_scores1[:, :n_orig],
                prune0=out.prune0[:, :m_orig],
                prune1=out.prune1[:, :n_orig],
            )
        matches0 = np.asarray(out.matches0)
        mscores0 = np.asarray(out.matching_scores0)
        matches, scores = compact_matches(matches0, mscores0)
        return {
            "matches0": matches0,
            "matches1": np.asarray(out.matches1),
            "matching_scores0": mscores0,
            "matching_scores1": np.asarray(out.matching_scores1),
            "stop": int(out.stop),
            "matches": matches,
            "scores": scores,
            "prune0": np.asarray(out.prune0),
            "prune1": np.asarray(out.prune1),
        }


def match_pair(
    extractor: Extractor,
    matcher: LightGlue,
    image0,
    image1,
    **preprocess,
) -> Tuple[dict, dict, dict]:
    """Extract and match a pair of images (reference: utils.py:150-165).
    Returns (feats0, feats1, matches01) with batch dims removed."""
    feats0 = extractor.extract(image0, **preprocess)
    feats1 = extractor.extract(image1, **preprocess)
    matches01 = matcher({"image0": feats0, "image1": feats1})
    return rbd(feats0), rbd(feats1), rbd(matches01)


def match_sequence(
    extractor: Extractor,
    matcher: LightGlue,
    images,
    window: int = 1,
) -> Tuple[dict, dict]:
    """Extract-once windowed sequential matching in ONE device program.

    The fastest way to match an image sequence (video / SLAM / hloc-style
    sequential mapping): each image is extracted exactly once and matched
    against its ``window`` successors — per-pair cost is ~1/window of an
    extraction plus one matcher pass, vs 2 extractions + 1 match for
    repeated ``match_pair`` calls (the reference's only API,
    utils.py:150-165).

    images: (B, H, W[, C]) float [0, 1] or uint8, same size (no resizing —
    pre-size the sequence; H/W are padded to the extractor stride).
    extractor: any device extractor wrapper exposing ``params`` /
    ``conf`` / ``_forward_fn`` (SuperPoint, ALIKED, DISK).

    Returns (feats, pairs):
      feats: per-image arrays — keypoints (B, K, 2), keypoint_scores,
        descriptors, valid (keypoints in input pixel coords).
      pairs: i0/i1 (P,) pair indices for every (i, i+w), w <= window, plus
        matches0 / matching_scores0 (P, K) and ragged ``matches`` /
        ``scores`` lists as in LightGlue.__call__.
    """
    from .end_to_end import make_windowed_sequence_end_to_end, \
        sequence_window_pairs

    imgs = np.asarray(images)
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    imgs = imgs.astype(np.float32)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    b, h, w = imgs.shape[:3]
    if b < 2:
        raise ValueError("match_sequence needs at least 2 images")
    stride = getattr(extractor, "stride", 1)
    ph, pw = (-h) % stride, (-w) % stride
    if ph or pw:
        imgs = np.pad(imgs, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="edge")
    sizes = np.tile([[w, h]], (b, 1)).astype(np.float32)

    cache = getattr(matcher, "_seq_programs", None)
    if cache is None:
        cache = matcher._seq_programs = {}
    key = (id(extractor), min(window, b - 1))
    entry = cache.get(key)
    # the cache entry pins the extractor so its id cannot be recycled to a
    # different object while the compiled program (closing over the OLD
    # params) is still served
    if entry is None or entry[0] is not extractor:
        prog = make_windowed_sequence_end_to_end(
            extractor._forward_fn, extractor.params, extractor.conf,
            matcher.params, matcher.conf, window=min(window, b - 1),
        )
        cache[key] = entry = (extractor, prog)
    out = entry[1](jnp.asarray(imgs), jnp.asarray(sizes))

    i0, i1 = sequence_window_pairs(b, min(window, b - 1))
    # per-image features: every image appears as the 0-side of some pair
    # except the last, which is the 1-side of the final w=1 pair
    f0, f1 = out.feats0, out.feats1

    def per_image(field):
        a = getattr(f0, field)
        if a is None:
            return None
        return np.concatenate(
            [np.asarray(a[: b - 1]),
             np.asarray(getattr(f1, field)[b - 2 : b - 1])]
        )

    feats = {
        "keypoints": per_image("keypoints"),
        "keypoint_scores": per_image("keypoint_scores"),
        "descriptors": per_image("descriptors"),
        "valid": per_image("valid"),
        "image_size": sizes,
    }
    for extra in ("scales", "oris"):  # SIFT-family
        v = per_image(extra)
        if v is not None:
            feats[extra] = v
    matches0 = np.asarray(out.matches.matches0)
    mscores0 = np.asarray(out.matches.matching_scores0)
    ragged_m, ragged_s = compact_matches(matches0, mscores0)
    pairs = {
        "i0": i0,
        "i1": i1,
        "matches0": matches0,
        "matching_scores0": mscores0,
        "matches": ragged_m,
        "scores": ragged_s,
        "stop": int(out.matches.stop),
    }
    return feats, pairs
