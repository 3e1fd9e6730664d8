"""lightglue_tpu — TPU-native feature matching (JAX/XLA/Pallas).

A from-scratch re-design of cvg/LightGlue for TPU: five local-feature
extractors and the LightGlue attention matcher, built on static shapes,
functional param pytrees, Pallas kernels for the hot paths, and
``jax.sharding`` for multi-chip scaling.
"""

from . import configs, nn, ops, weights  # noqa: F401
from .pipeline import (  # noqa: F401
    ALIKED,
    DISK,
    DoGHardNet,
    DoGHardNetDevice,
    LightGlue,
    SIFT,
    SIFTDevice,
    SuperPoint,
    batch_to_device,
    map_tensor,
    match_pair,
    match_sequence,
    rbd,
)
from .utils.image import load_image, read_image  # noqa: F401
from .utils.compile_cache import enable_persistent_cache  # noqa: F401
from .parallel.batching import BatchMatcher  # noqa: F401
from .configs import (  # noqa: F401
    ALIKEDConfig,
    DISKConfig,
    LightGlueConfig,
    PreprocessConfig,
    SIFTConfig,
    SuperPointConfig,
    lightglue_config,
)

__version__ = "0.1.0"
