"""Typed configuration dataclasses.

The reference uses class-level ``default_conf`` dicts merged into a
``SimpleNamespace`` (reference: lightglue/lightglue.py:322-335, utils.py:132-134).
Here every config is a frozen dataclass so it can be a static argument to
``jax.jit`` — hashability is what lets XLA specialize compiled programs per
configuration without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class LightGlueConfig:
    """Matcher configuration (reference: lightglue/lightglue.py:322-335).

    ``depth_confidence``/``width_confidence`` < 0 disable adaptive depth /
    width, as in the reference.
    """

    name: str = "lightglue"
    input_dim: int = 256
    descriptor_dim: int = 256
    add_scale_ori: bool = False
    n_layers: int = 9
    num_heads: int = 4
    flash: bool = True  # use the Pallas fused-attention path when beneficial
    mp: bool = False  # bfloat16 compute for the transformer stack
    depth_confidence: float = 0.95
    width_confidence: float = 0.99
    filter_threshold: float = 0.1
    weights: Optional[str] = None
    # TPU-specific: number of keypoints below which width pruning is skipped.
    # Mirrors reference pruning_keypoint_thresholds (lightglue.py:339-344) but
    # with a single TPU entry — pruning on TPU is mask-based, so its overhead
    # is one extra matchability matmul per layer; 512 (vs the reference's
    # cuda=1024) keeps pruning live at the common 1024-kpt operating point
    # (the reference's strict `>` means 1024 kpts never prune there), which
    # is what lets two-stage compaction shrink its bucket honestly.
    pruning_min_kpts: int = 512
    # On-device two-stage compaction (forward_adaptive_twostage): after
    # `compaction_prefix` layers, gather pruning survivors into a bucket of
    # `compaction_bucket` points and run the remaining layers at that size.
    # 0 disables (default; the masked path is exactly reference-equivalent).
    compaction_bucket: int = 0
    compaction_prefix: int = 3
    # Constant softmax shift (nats) for the CROSS attention kernel: enables
    # the true single-pass bidirectional kernel (one exp for both softmax
    # directions, sums on the MXU — ops/flash_cross.py). Exact for scores
    # within ~(shift-85, shift+70) nats of 0; trained matcher scores are
    # |s| <~ 30. None = per-row max (bitwise reference semantics).
    cross_softmax_shift: Optional[float] = None
    # Same constant-shift trick for SELF attention: removes the per-row max
    # reduction over the (BQ, N) score strip (ops/flash.py::
    # _attn_kernel_shift). Same exactness envelope as cross_softmax_shift.
    self_softmax_shift: Optional[float] = None
    # Fused FFN Pallas kernel on TPU (ops/ffn.py). Its polynomial erf GELU
    # (~1.5e-7 abs err) and unrounded bf16 hidden drift from the XLA
    # composition within the documented ~1e-4 envelope (docs/PARITY.md);
    # set False to force the XLA composition for bitwise debugging.
    fused_ffn: bool = True
    # Whole-SelfBlock fusion (ops/flash_self.py): Wqkv + rotary + attention
    # + out_proj + FFN in ONE Pallas program — eliminates every intermediate
    # HBM round-trip of the self block. Shares the fused-FFN numeric
    # envelope (it embeds the same FFN math), so it only engages when
    # fused_ffn is also True; set False to fall back to the composed
    # Wqkv/rotary/flash_sdpa/FFN pipeline.
    fused_self: bool = True
    # Whole-CrossBlock fusion (ops/flash_cross_block.py): to_qk/to_v
    # projections + single-exp bidirectional attention + to_out + FFN in ONE
    # Pallas program; engages under the same fused_ffn gate as fused_self.
    # With cross_softmax_shift=None the row softmax is exact and the column
    # direction uses a per-(batch, head) global shift (the same numerics as
    # ops/flash_cross.py's exact kernel).
    fused_cross: bool = True

    def __post_init__(self):
        if self.descriptor_dim % self.num_heads != 0:
            raise ValueError(
                f"descriptor_dim {self.descriptor_dim} must be divisible by "
                f"num_heads {self.num_heads}"
            )
        if self.n_layers < 1:
            raise ValueError("n_layers must be >= 1")

    @property
    def head_dim(self) -> int:
        return self.descriptor_dim // self.num_heads

    def replace(self, **kw) -> "LightGlueConfig":
        return dataclasses.replace(self, **kw)


# Per-feature presets (reference: lightglue/lightglue.py:351-374).
FEATURES = {
    "superpoint": dict(weights="superpoint_lightglue", input_dim=256),
    "disk": dict(weights="disk_lightglue", input_dim=128),
    "aliked": dict(weights="aliked_lightglue", input_dim=128),
    "sift": dict(weights="sift_lightglue", input_dim=128, add_scale_ori=True),
    "doghardnet": dict(
        weights="doghardnet_lightglue", input_dim=128, add_scale_ori=True
    ),
}


def lightglue_config(features: Optional[str] = "superpoint", **conf) -> LightGlueConfig:
    """Build a LightGlueConfig with a feature preset overlaid (lightglue.py:376-386)."""
    if features is not None:
        if features not in FEATURES:
            raise ValueError(
                f"Unsupported features: {features} not in {{{','.join(FEATURES)}}}"
            )
        conf = {**FEATURES[features], **conf}
    return LightGlueConfig(**conf)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Image preprocessing (reference: lightglue/utils.py:12-24)."""

    resize: Optional[int] = None  # target edge length; None = no resize
    side: str = "long"  # which edge `resize` refers to
    interpolation: str = "bilinear"
    antialias: bool = True
    grayscale: bool = False

    def replace(self, **kw) -> "PreprocessConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    """Reference: lightglue/superpoint.py:107-117."""

    descriptor_dim: int = 256
    nms_radius: int = 4
    # None = reference default (keep ALL points above threshold,
    # superpoint.py:108-117): the pipeline derives a static capacity
    # bucket from image area / NMS spacing (pipeline._auto_kpts_bucket)
    max_num_keypoints: Optional[int] = 2048
    detection_threshold: float = 0.0005
    remove_borders: int = 4
    resize: int = 1024
    mp: bool = False  # bfloat16 convs (fp32 score softmax / descriptor norm)
    # >0: use lax.approx_max_k for detection (TPU-fast, ~0.998 observed
    # recall at 0.95 target); 0 = exact top-k (reference parity)
    approx_topk: float = 0.0
    # EXACT two-level row-capped top-k (ops/topk.py): its lax.cond costs
    # ~+2.5 ms graph pessimization per program, amortized away in batched
    # extraction (penalty per program, ~6x top-k saving per image)
    twolevel_topk: bool = False
    # Fused conv1a+conv1b+pool1 Pallas kernel on TPU (ops/stem.py). Not
    # bitwise vs the XLA conv chain (~4e-3 bf16 max-abs on the pooled
    # activations), which can flip NMS ties near the detection threshold;
    # set False to force the XLA conv path for reference-exact selection.
    fused_stem: bool = True

    def replace(self, **kw) -> "SuperPointConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DISKConfig:
    """Reference: lightglue/disk.py:8-20."""

    weights: str = "depth"
    max_num_keypoints: Optional[int] = 2048  # None: see SuperPointConfig
    desc_dim: int = 128
    nms_window_size: int = 5
    detection_threshold: float = 0.0
    pad_if_not_divisible: bool = True
    resize: int = 1024
    approx_topk: float = 0.0  # see SuperPointConfig.approx_topk
    twolevel_topk: bool = False  # see SuperPointConfig.twolevel_topk
    mp: bool = False  # bfloat16 U-Net (fp32 heatmap/top-k/descriptor norm)

    def replace(self, **kw) -> "DISKConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ALIKEDConfig:
    """Reference: lightglue/aliked.py:631-644."""

    model_name: str = "aliked-n16"
    max_num_keypoints: Optional[int] = 2048  # None: see SuperPointConfig
    detection_threshold: float = 0.2
    nms_radius: int = 2
    resize: int = 1024
    approx_topk: float = 0.0  # see SuperPointConfig.approx_topk
    twolevel_topk: bool = False  # see SuperPointConfig.twolevel_topk
    mp: bool = False  # bfloat16 encoder/aggregation (fp32 score/desc norm)
    # Fused Pallas score-head tail (ops/score_head.py; engages on TPU in
    # the lazy_fm path only): OFF by default — measured neutral-to-slightly
    # -worse in the per-image lazy composition (10.14 vs 10.24 ms full
    # forward), and under mp its scores differ from the XLA tapmat tail by
    # ~1e-2, which can flip NMS ties near the detection threshold
    fused_score_head: bool = False
    # lazy feature map: SDDH evaluates the rows it needs from the branch
    # maps instead of materializing the full-res 128-ch concat (exact at
    # fp32; bf16 deltas are lerp rounding order only). Off switch restores
    # the dense reference dataflow (aliked.py:735)
    lazy_fm: bool = True
    # off switch for the fused block-1 Pallas kernel (ops/aliked_stem.py;
    # TPU + lazy_fm path only): bf16 deltas vs the XLA ConvBlock are the
    # same dx-split-partials envelope as the SuperPoint stem kernel
    fused_stem: bool = True

    def replace(self, **kw) -> "ALIKEDConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SIFTConfig:
    """Reference: lightglue/sift.py:80-93."""

    rootsift: bool = True
    nms_radius: int = 0
    max_num_keypoints: int = 4096
    # {"opencv", "pycolmap", "pycolmap_cpu", "pycolmap_cuda", "jax"} —
    # opencv matches the reference exactly (sift.py:84); pycolmap* mirror
    # the reference's COLMAP backends (sift.py:96-126, optional dep);
    # "jax" is the TPU-native DoG pipeline.
    backend: str = "opencv"
    detection_threshold: float = 0.0066667  # COLMAP peak threshold
    edge_threshold: float = 10.0
    first_octave: int = -1
    num_octaves: int = 4
    # the reference passes its num_octaves conf as OpenCV's nOctaveLayers
    # (sift.py:132), so its EFFECTIVE scale space has 4 layers per octave —
    # the jax backend defaults to the same value so both backends build the
    # same pyramid (Lowe/OpenCV default would be 3)
    num_scales_per_octave: int = 4
    resize: int = 1024

    def replace(self, **kw) -> "SIFTConfig":
        return dataclasses.replace(self, **kw)
