"""Checkpoint conversion and native persistence.

The reference downloads versioned torch ``.pth`` state dicts
(lightglue/lightglue.py:348-349, 415-434; superpoint.py:144-145). Here we
convert those state dicts (as ``{key: np.ndarray}``, no torch dependency in
the library) into this framework's param pytrees:

* Linear weights transpose from torch ``(out, in)`` to MXU-friendly
  ``(in, out)``; conv kernels permute OIHW -> HWIO.
* The per-layer module lists (``transformers.{i}...``) stack into a single
  leading layer axis (see models/lightglue.py) so the layer loop can be a
  ``lax.scan``.

Native save/load uses a flat ``.npz`` with ``/``-joined keys — dependency-free
and mmap-friendly.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp
import jax.tree_util as jtu

from .configs import LightGlueConfig, lightglue_config


def _lin(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    p = {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    # torch OIHW -> HWIO
    p = {"w": jnp.asarray(np.transpose(np.asarray(sd[prefix + ".weight"]), (2, 3, 1, 0)))}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
        "mean": jnp.asarray(sd[prefix + ".running_mean"]),
        "var": jnp.asarray(sd[prefix + ".running_var"]),
    }


def _ffn(sd, prefix: str) -> dict:
    return {
        "lin1": _lin(sd, prefix + ".0"),
        "ln": _ln(sd, prefix + ".1"),
        "lin2": _lin(sd, prefix + ".3"),
    }


def _stack(trees):
    return jtu.tree_map(lambda *xs: jnp.stack(xs, 0), *trees)


def upgrade_legacy_keys(sd: Dict[str, np.ndarray], n_layers: int) -> Dict[str, np.ndarray]:
    """Old checkpoints use ``self_attn.{i}`` / ``cross_attn.{i}`` naming
    (reference migration: lightglue.py:427-434)."""
    out = dict(sd)
    for i in range(n_layers):
        for old, new in (
            (f"self_attn.{i}", f"transformers.{i}.self_attn"),
            (f"cross_attn.{i}", f"transformers.{i}.cross_attn"),
        ):
            out = {k.replace(old, new): v for k, v in out.items()}
    return out


def convert_lightglue(
    sd: Dict[str, np.ndarray], conf: Optional[LightGlueConfig] = None
) -> dict:
    """Convert a reference LightGlue state dict to this framework's pytree."""
    conf = conf or LightGlueConfig()
    sd = upgrade_legacy_keys(sd, conf.n_layers)
    params = {}
    if "input_proj.weight" in sd:
        params["input_proj"] = _lin(sd, "input_proj")
    params["posenc"] = {"Wr": _lin(sd, "posenc.Wr")}
    params["transformers"] = _stack(
        [
            {
                "self_attn": {
                    "Wqkv": _lin(sd, f"transformers.{i}.self_attn.Wqkv"),
                    "out_proj": _lin(sd, f"transformers.{i}.self_attn.out_proj"),
                    "ffn": _ffn(sd, f"transformers.{i}.self_attn.ffn"),
                },
                "cross_attn": {
                    "to_qk": _lin(sd, f"transformers.{i}.cross_attn.to_qk"),
                    "to_v": _lin(sd, f"transformers.{i}.cross_attn.to_v"),
                    "to_out": _lin(sd, f"transformers.{i}.cross_attn.to_out"),
                    "ffn": _ffn(sd, f"transformers.{i}.cross_attn.ffn"),
                },
            }
            for i in range(conf.n_layers)
        ]
    )
    params["log_assignment"] = _stack(
        [
            {
                "matchability": _lin(sd, f"log_assignment.{i}.matchability"),
                "final_proj": _lin(sd, f"log_assignment.{i}.final_proj"),
            }
            for i in range(conf.n_layers)
        ]
    )
    params["token_confidence"] = _stack(
        [
            {"token": _lin(sd, f"token_confidence.{i}.token.0")}
            for i in range(conf.n_layers - 1)
        ]
    )
    return params


def convert_superpoint(sd: Dict[str, np.ndarray]) -> dict:
    """Convert the reference SuperPoint state dict (superpoint.py:121-145)."""
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b",
        "conv3a", "conv3b", "conv4a", "conv4b",
        "convPa", "convPb", "convDa", "convDb",
    ]
    return {n: _conv(sd, n) for n in names}


# ---------------------------------------------------------------------------
# Native persistence: flat npz of the pytree
# ---------------------------------------------------------------------------


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path: str, params: dict) -> None:
    np.savez(path, **flatten_tree(params))


def load_params(path: str, dtype=None) -> dict:
    """Load a flat-npz checkpoint. ``dtype`` (e.g. np.float32) upcasts
    storage dtypes — used for f16-compressed checkpoints like the
    synthetic-trained matcher (scripts/train_synthetic.py)."""
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    return unflatten_tree(flat)


def _deform_conv(sd, prefix: str) -> dict:
    return {
        "offset_conv": _conv(sd, prefix + ".offset_conv"),
        "regular_conv": _conv(sd, prefix + ".regular_conv"),
    }


def _aliked_conv_block(sd, prefix: str) -> dict:
    return {
        "conv1": _conv(sd, prefix + ".conv1"),
        "bn1": _bn(sd, prefix + ".bn1"),
        "conv2": _conv(sd, prefix + ".conv2"),
        "bn2": _bn(sd, prefix + ".bn2"),
    }


def _aliked_res_block(sd, prefix: str, deform: bool) -> dict:
    cv = _deform_conv if deform else _conv
    return {
        "conv1": cv(sd, prefix + ".conv1"),
        "bn1": _bn(sd, prefix + ".bn1"),
        "conv2": cv(sd, prefix + ".conv2"),
        "bn2": _bn(sd, prefix + ".bn2"),
        "downsample": _conv(sd, prefix + ".downsample"),
    }


def convert_aliked(sd: Dict[str, np.ndarray]) -> dict:
    """Convert the reference ALIKED state dict (lightglue/aliked.py:637-695)."""
    return {
        "block1": _aliked_conv_block(sd, "block1"),
        "block2": _aliked_res_block(sd, "block2", False),
        "block3": _aliked_res_block(sd, "block3", True),
        "block4": _aliked_res_block(sd, "block4", True),
        "conv1": _conv(sd, "conv1"),
        "conv2": _conv(sd, "conv2"),
        "conv3": _conv(sd, "conv3"),
        "conv4": _conv(sd, "conv4"),
        "score_head": {
            "0": _conv(sd, "score_head.0"),
            "2": _conv(sd, "score_head.2"),
            "4": _conv(sd, "score_head.4"),
            "6": _conv(sd, "score_head.6"),
        },
        "desc_head": {
            "offset_conv1": _conv(sd, "desc_head.offset_conv.0"),
            "offset_conv2": _conv(sd, "desc_head.offset_conv.2"),
            "sf_conv": _conv(sd, "desc_head.sf_conv"),
            "agg_weights": jnp.asarray(sd["desc_head.agg_weights"]),
        },
    }


def convert_hardnet(sd: Dict[str, np.ndarray], strict: bool = True) -> dict:
    """Convert a kornia/original HardNet state dict (``features.{i}.*``
    Sequential indexing; reference dog_hardnet.py:13 loads kornia HardNet).

    Conv/BN slots are DISCOVERED from the keys (a conv has a 4-d
    ``.weight``, a BN has ``.running_mean``) instead of hardcoding
    Sequential indices, so layout shifts (e.g. around the Dropout slot)
    cannot silently misalign the mapping. ``strict`` requires exactly the
    7 conv + 7 BN stages of the published architecture, validates every
    shape against models/hardnet._STAGES, and refuses leftover tensors.
    """
    from .models.hardnet import _STAGES

    feat_keys = [k for k in sd if k.startswith("features.")]
    idxs = sorted({int(k.split(".")[1]) for k in feat_keys})
    convs = [i for i in idxs if sd.get(f"features.{i}.weight") is not None
             and np.asarray(sd[f"features.{i}.weight"]).ndim == 4]
    bns = [i for i in idxs if f"features.{i}.running_mean" in sd]
    if strict and (len(convs) != 7 or len(bns) != 7):
        raise ValueError(
            f"HardNet layout mismatch: found {len(convs)} convs / "
            f"{len(bns)} BNs at features.{convs}/{bns}, expected 7+7"
        )
    expected = [(ci, co, ks) for (ci, co, ks, _) in _STAGES] + [(128, 128, 8)]
    consumed = set()
    p = {}
    for n, (ci, bi) in enumerate(zip(convs, bns)):
        if strict and bi <= ci:
            raise ValueError(f"BN features.{bi} precedes conv features.{ci}")
        name = f"conv{n}" if n < 6 else "conv6"
        bname = f"bn{n}" if n < 6 else "bn6"
        p[name] = _conv(sd, f"features.{ci}")
        w = np.asarray(sd[f"features.{ci}.weight"])  # OIHW
        if strict:
            eci, eco, eks = expected[n]
            got = (w.shape[1], w.shape[0], w.shape[2])
            if got != (eci, eco, eks):
                raise ValueError(
                    f"conv features.{ci} shape {got} != expected "
                    f"(in,out,k)={(eci, eco, eks)}"
                )
        consumed.add(f"features.{ci}.weight")
        dim = np.asarray(sd[f"features.{bi}.running_mean"]).shape[0]
        # affine BN params if present (kornia uses affine=False -> absent)
        scale = sd.get(f"features.{bi}.weight")
        bias = sd.get(f"features.{bi}.bias")
        p[bname] = {
            "scale": jnp.asarray(scale) if scale is not None
            else jnp.ones((dim,), jnp.float32),
            "bias": jnp.asarray(bias) if bias is not None
            else jnp.zeros((dim,), jnp.float32),
            "mean": jnp.asarray(sd[f"features.{bi}.running_mean"]),
            "var": jnp.asarray(sd[f"features.{bi}.running_var"]),
        }
        consumed |= {
            f"features.{bi}.running_mean", f"features.{bi}.running_var",
        }
        if scale is not None:
            consumed.add(f"features.{bi}.weight")
        if bias is not None:
            consumed.add(f"features.{bi}.bias")
    if strict:
        leftover = [
            k for k in sd
            if k not in consumed and not k.endswith("num_batches_tracked")
        ]
        if leftover:
            raise ValueError(f"unconsumed HardNet tensors: {leftover[:8]}")
    return p


def convert_disk(
    sd: Dict[str, np.ndarray], desc_dim: int = 128, strict: bool = True
) -> dict:
    """Converter for kornia DISK checkpoints (``unet.path_down.{i}`` /
    ``unet.path_up.{i}`` thin-U-Net naming from the upstream DISK repo's
    ``unets`` package; reference disk.py:26 loads kornia's port).

    Layout-shift-robust: within each block prefix the conv is the unique
    4-d ``.weight`` and the PReLU gate the unique 1-d tensor whose size
    equals the conv's input channels — Sequential indices are never
    assumed. ``strict`` validates the channel plan (down [16,32,64,64,64],
    up [64,64,64,desc_dim+1] with skip concatenation), requires an
    unambiguous gate candidate, and refuses leftover tensors, so a real
    checkpoint whose layout differs from this reconstruction fails loudly
    instead of converting wrong.
    """
    from .models.disk import DOWN, UP

    consumed = set()

    def blk(prefix, cin, cout, gate_ch):
        p = {}
        conv_keys = sorted(
            k for k in sd
            if k.startswith(prefix) and k.endswith(".weight")
            and np.asarray(sd[k]).ndim == 4
        )
        if strict and len(conv_keys) != 1:
            raise ValueError(
                f"{prefix}: expected exactly 1 conv weight, got {conv_keys}"
            )
        ck = conv_keys[-1][: -len(".weight")]
        w = np.asarray(sd[ck + ".weight"])  # OIHW
        if strict and (w.shape[1], w.shape[0]) != (cin, cout):
            raise ValueError(
                f"{ck}: conv (in,out)=({w.shape[1]},{w.shape[0]}) != "
                f"expected ({cin},{cout})"
            )
        p["conv"] = _conv(sd, ck)
        consumed.add(ck + ".weight")
        if ck + ".bias" in sd:
            consumed.add(ck + ".bias")
        gate_keys = sorted(
            k for k in sd
            if k.startswith(prefix) and np.asarray(sd[k]).ndim == 1
            and np.asarray(sd[k]).shape[0] == gate_ch
            and k not in consumed
        )
        if gate_keys:
            if strict and len(gate_keys) > 1:
                raise ValueError(
                    f"{prefix}: ambiguous 1-d tensors {gate_keys} — "
                    "cannot identify the PReLU gate"
                )
            p["gate"] = {"alpha": jnp.asarray(sd[gate_keys[0]])}
            consumed.add(gate_keys[0])
        return p

    down = {}
    cin = 3
    for i, cout in enumerate(DOWN):
        down[str(i)] = blk(f"unet.path_down.{i}.", cin, cout, gate_ch=cin)
        cin = cout
    up = {}
    ups = UP + [desc_dim + 1]
    for i, cout in enumerate(ups):
        full_cin = cin + DOWN[len(DOWN) - 2 - i]  # upsampled + skip concat
        up[str(i)] = blk(f"unet.path_up.{i}.", full_cin, cout, gate_ch=full_cin)
        cin = cout
    if strict:
        leftover = [
            k for k in sd
            if k not in consumed and not k.endswith("num_batches_tracked")
        ]
        if leftover:
            raise ValueError(f"unconsumed DISK tensors: {leftover[:8]}")
    return {"down": down, "up": up}


# ---------------------------------------------------------------------------
# Released-checkpoint registry + fetch
# ---------------------------------------------------------------------------
#
# Mirrors the reference's versioned-URL weight loading
# (lightglue.py:348-349,415-434 for the matcher; superpoint.py:144-145;
# aliked.py:620,692-695; DISK/HardNet weights are kornia-managed in the
# reference, disk.py:26 / dog_hardnet.py:13 — the URLs below are the
# upstream checkpoints those kornia models load). Downloads fail
# gracefully offline: fetch() raises WeightsUnavailableError with the
# cache path to drop a manually-obtained file into.

_LIGHTGLUE_VERSION = "v0.1_arxiv"  # reference lightglue.py:348
_LIGHTGLUE_URL = (
    "https://github.com/cvg/LightGlue/releases/download/{}/{}.pth"
)


class WeightsUnavailableError(RuntimeError):
    """A released checkpoint is neither cached nor downloadable."""


@dataclasses.dataclass(frozen=True)
class WeightSpec:
    """One released checkpoint: where it lives and how to convert it."""

    url: str
    converter: str  # converter registry key (see _CONVERTERS)
    # keys to try unwrapping a nested torch checkpoint with (first match
    # that yields a flat tensor dict wins); () = the file IS the state dict
    unwrap: tuple = ()
    # feature-preset name for matcher checkpoints (selects the
    # LightGlueConfig the converter stacks layers for)
    features: Optional[str] = None


REGISTRY: Dict[str, WeightSpec] = {
    # matcher checkpoints (reference lightglue.py:351-374 presets)
    **{
        f"{feats}_lightglue": WeightSpec(
            url=_LIGHTGLUE_URL.format(_LIGHTGLUE_VERSION, f"{feats}_lightglue"),
            converter="lightglue",
            features=feats,
        )
        for feats in ("superpoint", "disk", "aliked", "sift", "doghardnet")
    },
    # extractor checkpoints
    "superpoint_v1": WeightSpec(
        # reference superpoint.py:144
        url=("https://github.com/cvg/LightGlue/releases/download/"
             "v0.1_arxiv/superpoint_v1.pth"),
        converter="superpoint",
    ),
    **{
        name: WeightSpec(
            # reference aliked.py:620
            url=f"https://github.com/Shiaoming/ALIKED/raw/main/models/{name}.pth",
            converter="aliked",
        )
        for name in ("aliked-t16", "aliked-n16", "aliked-n16rot", "aliked-n32")
    },
    "disk_depth": WeightSpec(
        # upstream cvg/DISK checkpoint that kornia's DISK.from_pretrained
        # ("depth") loads (reference disk.py:26)
        url="https://github.com/cvg/DISK/raw/master/depth-save.pth",
        converter="disk",
        unwrap=("extractor", "state_dict", "model"),
    ),
    "hardnet_liberty_aug": WeightSpec(
        # upstream HardNet checkpoint kornia's HardNet.from_pretrained
        # loads (reference dog_hardnet.py:13)
        url=("https://github.com/DagnyT/hardnet/raw/master/pretrained/"
             "train_liberty_with_aug/checkpoint_liberty_with_aug.pth"),
        converter="hardnet",
        unwrap=("state_dict",),
    ),
}


def _convert_lightglue_entry(sd, spec: WeightSpec):
    return convert_lightglue(sd, lightglue_config(spec.features))


_CONVERTERS = {
    "lightglue": _convert_lightglue_entry,
    "superpoint": lambda sd, spec: convert_superpoint(sd),
    "aliked": lambda sd, spec: convert_aliked(sd),
    "disk": lambda sd, spec: convert_disk(sd),
    "hardnet": lambda sd, spec: convert_hardnet(sd),
}


def default_cache_dir() -> Path:
    """Repo-local ``weights/`` (next to the package) — the same place the
    reference's local fallback looks (lightglue.py:422-425)."""
    return Path(__file__).parent.parent / "weights"


def _unwrap_state_dict(obj, unwrap: tuple) -> Dict[str, np.ndarray]:
    """Peel wrapper dicts / DataParallel prefixes down to {key: ndarray}."""

    def is_tensor_dict(d):
        return isinstance(d, dict) and d and all(
            hasattr(v, "shape") for v in d.values()
        )

    for key in unwrap:
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    if hasattr(obj, "state_dict"):  # a whole pickled module
        obj = obj.state_dict()
    if not is_tensor_dict(obj):
        raise WeightsUnavailableError(
            f"checkpoint structure not understood: "
            f"{list(obj)[:6] if isinstance(obj, dict) else type(obj)}"
        )
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")
        out[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


def fetch(name: str, cache_dir=None, retries: int = 2) -> dict:
    """Return the converted param pytree for a released checkpoint.

    Resolution order: converted ``{cache}/{name}.npz`` -> cached torch
    ``{cache}/{name}.pth`` -> download from the registry URL (converted
    result is cached as npz). Raises WeightsUnavailableError offline with
    instructions rather than a bare socket error.
    """
    if name not in REGISTRY:
        raise KeyError(
            f"unknown weights {name!r}; known: {sorted(REGISTRY)}"
        )
    spec = REGISTRY[name]
    cache = Path(cache_dir) if cache_dir is not None else default_cache_dir()
    cache.mkdir(parents=True, exist_ok=True)
    npz = cache / f"{name}.npz"
    if npz.exists():
        return load_params(npz)
    pth = cache / f"{name}.pth"
    if not pth.exists():
        _download(spec.url, pth, retries=retries)
    import torch  # local import: library core stays torch-free

    obj = torch.load(str(pth), map_location="cpu", weights_only=False)
    sd = _unwrap_state_dict(obj, spec.unwrap)
    params = _CONVERTERS[spec.converter](sd, spec)
    save_params(npz, params)
    return params


def _download(url: str, dest: Path, retries: int = 2, timeout: float = 30.0):
    import urllib.error
    import urllib.request

    last = None
    for _ in range(max(1, retries)):
        try:
            tmp = dest.with_suffix(dest.suffix + ".part")
            with urllib.request.urlopen(url, timeout=timeout) as r, \
                    open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            tmp.rename(dest)
            return
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last = e
    raise WeightsUnavailableError(
        f"could not download {url}: {last!r}. If this environment is "
        f"offline, place the file manually at {dest} and re-run."
    )


def save_params_orbax(path: str, params: dict) -> None:
    """Checkpoint via orbax (for ecosystems standardized on it); the flat
    npz format (save_params) remains the default."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
