"""Capture golden key-name/shape fixtures for the released checkpoints.

The published checkpoints load into the reference torch modules with
strict state_dict matching, so an EXECUTED reference module's state_dict
has exactly the released key names and shapes (lightglue.py:415-434,
superpoint.py:144-145, aliked.py:692-695). Capturing {key: shape} from
those modules pins the expected layouts as offline fixtures: converter
drift then fails tests/test_weights_registry.py without network access.
DISK/HardNet have no in-tree reference module (kornia-managed,
disk.py:26, dog_hardnet.py:13); their layouts come from the executed
torch reconstructions in tests/test_converters.py, which are themselves
roundtrip-parity-tested against our JAX forwards.

Run: python scripts/capture_weight_fixtures.py  (writes tests/fixtures/)
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

OUT = REPO / "tests" / "fixtures"


def dump(name: str, source: str, sd: dict) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    keys = {k: list(v.shape) for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}
    (OUT / f"{name}.json").write_text(
        json.dumps({"source": source, "keys": keys}, indent=0)
    )
    print(f"{name}: {len(keys)} tensors")


def main():
    import torch

    from ref_loader import load_ref_module, torch_state_dict_to_numpy

    ref_lg = load_ref_module("lightglue")
    for feats in ("superpoint", "disk", "aliked", "sift", "doghardnet"):
        torch.manual_seed(0)
        m = ref_lg.LightGlue(features=feats)
        dump(
            f"{feats}_lightglue",
            f"executed reference LightGlue(features={feats!r}) "
            "(lightglue.py:376-434)",
            torch_state_dict_to_numpy(m),
        )

    ref_sp = load_ref_module("superpoint")
    dump(
        "superpoint_v1",
        "executed reference SuperPoint() (superpoint.py:121-148)",
        torch_state_dict_to_numpy(ref_sp.SuperPoint()),
    )

    import torchvision_stub

    torchvision_stub.install()
    ref_al = load_ref_module("aliked")
    for model_name in ("aliked-t16", "aliked-n16", "aliked-n16rot",
                       "aliked-n32"):
        m = ref_al.ALIKED(model_name=model_name)
        dump(
            model_name,
            f"executed reference ALIKED(model_name={model_name!r}) "
            "(aliked.py:636-695)",
            torch_state_dict_to_numpy(m),
        )

    import torch.nn as tnn

    from test_converters import _TorchThinUnet, _torch_hardnet

    tm = tnn.Module()
    tm.unet = _TorchThinUnet()
    dump(
        "disk_depth",
        "executed kornia-layout DISK U-Net reconstruction "
        "(tests/test_converters.py::_TorchThinUnet, roundtrip-parity-"
        "tested vs models/disk.py)",
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
    )
    dump(
        "hardnet_liberty_aug",
        "executed kornia-layout HardNet reconstruction "
        "(tests/test_converters.py::_torch_hardnet, roundtrip-parity-"
        "tested vs models/hardnet.py)",
        {k: v.detach().numpy()
         for k, v in _torch_hardnet().state_dict().items()},
    )


if __name__ == "__main__":
    main()
