"""Verify-skill driver: run the library surface on the REAL TPU and
cross-check match indices against the CPU backend.

Covers: fixed-path matcher (fused FFN kernel engages at n%128==0 on TPU),
adaptive matcher, bf16 two-stage compaction, and the ALIKED extractor
forward (quad-gather deform conv, matmul upsample, fold-in SDDH
normalization). Prints agreement stats; exits nonzero on NaNs or gross
disagreement.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import lightglue_tpu as lt
from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked
from lightglue_tpu.models import lightglue as lg


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    M = 512
    inputs = dict(
        kpts0=rng.uniform(0, 1024, (1, M, 2)).astype(np.float32),
        kpts1=rng.uniform(0, 768, (1, M, 2)).astype(np.float32),
        desc0=rng.standard_normal((1, M, 256)).astype(np.float32),
        desc1=rng.standard_normal((1, M, 256)).astype(np.float32),
        size0=np.asarray([[1024.0, 768.0]], np.float32),
        size1=np.asarray([[800.0, 600.0]], np.float32),
    )
    conf = lt.lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(0), conf)

    fwd = jax.jit(lg.forward, static_argnames=("conf",))
    out = fwd(params, conf, **{k: jnp.asarray(v) for k, v in inputs.items()})
    m_tpu = np.asarray(out.matches0)
    s_tpu = np.asarray(out.matching_scores0)
    assert np.isfinite(s_tpu).all(), "NaN/inf in TPU scores"
    print("fixed TPU matched:", int((m_tpu >= 0).sum()), "stop:", int(out.stop))

    # CPU reference: flash=False selects the XLA path (Pallas only lowers on
    # TPU; dispatch keys off the default backend, so disable it explicitly)
    conf_c = conf.replace(flash=False)
    with jax.default_device(cpu):
        params_c = jax.device_put(params, cpu)
        in_c = {k: jax.device_put(jnp.asarray(v), cpu) for k, v in inputs.items()}
        out_c = jax.jit(lg.forward, static_argnames=("conf",))(
            params_c, conf_c, **in_c
        )
    m_cpu = np.asarray(out_c.matches0)
    agree = (m_tpu == m_cpu).mean()
    print(f"fixed match agreement TPU vs CPU: {agree:.4f}")
    assert agree > 0.98, f"match agreement too low: {agree}"

    # constant-shift softmax kernels (self + cross): same matches as the
    # exact-max kernels within the documented score envelope
    conf_s = conf.replace(cross_softmax_shift=12.0, self_softmax_shift=12.0)
    out_s = fwd(params, conf_s, **{k: jnp.asarray(v) for k, v in inputs.items()})
    agree_s = (np.asarray(out_s.matches0) == m_tpu).mean()
    print(f"shift-kernel match agreement: {agree_s:.4f}")
    assert agree_s > 0.98, f"shift-kernel agreement too low: {agree_s}"

    # adaptive + two-stage compaction bf16
    conf2 = lt.lightglue_config(
        "superpoint", mp=True, compaction_bucket=128, compaction_prefix=1
    )
    out2 = jax.jit(lg.forward, static_argnames=("conf",))(
        params, conf2, **{k: jnp.asarray(v) for k, v in inputs.items()}
    )
    s2 = np.asarray(out2.matching_scores0)
    assert np.isfinite(s2).all(), "NaN in adaptive scores"
    print(
        "twostage bf16 matched:", int((np.asarray(out2.matches0) >= 0).sum()),
        "stop:", int(out2.stop),
    )

    # ALIKED forward on TPU (bf16) vs CPU (fp32)
    conf_a = ALIKEDConfig(model_name="aliked-t16", max_num_keypoints=256,
                          detection_threshold=0.005, mp=True)
    pa = aliked.init_params(jax.random.key(1), conf_a)
    img = rng.uniform(0, 1, (1, 256, 320, 3)).astype(np.float32)
    fa = jax.jit(aliked.forward, static_argnames=("conf",))(
        pa, conf_a, jnp.asarray(img)
    )
    k_tpu = np.asarray(fa.keypoints)
    d_tpu = np.asarray(fa.descriptors)
    assert np.isfinite(k_tpu).all() and np.isfinite(d_tpu).all(), "ALIKED NaN"
    conf_a32 = conf_a.replace(mp=False)
    with jax.default_device(cpu):
        fc = jax.jit(aliked.forward, static_argnames=("conf",))(
            jax.device_put(pa, cpu), conf_a32,
            jax.device_put(jnp.asarray(img), cpu),
        )
    k_cpu = np.asarray(fc.keypoints)
    v = np.asarray(fc.valid)[0] & np.asarray(fa.valid)[0]
    if v.sum():
        err = np.abs(k_tpu[0][v] - k_cpu[0][v]).max()
        print(f"ALIKED kpts (bf16 TPU vs fp32 CPU) n={int(v.sum())} max|dxy|={err:.3f}")
    print("ALIKED valid:", int(np.asarray(fa.valid).sum()))

    # JAX SIFT end-to-end on TPU (scale-space pipeline, refine, descriptors)
    from lightglue_tpu.configs import SIFTConfig
    from lightglue_tpu.models import sift_jax

    gray = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
    sconf = SIFTConfig(max_num_keypoints=128)
    sout = jax.jit(sift_jax.extract_single, static_argnames=("conf",))(
        gray, sconf
    )
    sd = np.asarray(sout["descriptors"])
    assert np.isfinite(sd).all() and np.isfinite(np.asarray(sout["keypoints"])).all()
    print("JAX SIFT valid:", int(np.asarray(sout["valid"]).sum()))

    # match_sequence pipeline surface (extract-once windowed program)
    ex = lt.SuperPoint(max_num_keypoints=256)
    ma = lt.LightGlue("superpoint", depth_confidence=-1.0,
                      width_confidence=-1.0)
    seq_imgs = rng.uniform(0, 1, (3, 128, 160, 1)).astype(np.float32)
    feats_s, pairs_s = lt.match_sequence(ex, ma, seq_imgs, window=2)
    assert pairs_s["matches0"].shape[0] == 3  # (0,1) (1,2) (0,2)
    assert np.isfinite(pairs_s["matching_scores0"]).all()
    print("match_sequence pairs:", pairs_s["matches0"].shape[0],
          "matched:", int((pairs_s["matches0"] >= 0).sum()))
    print("VERIFY OK")


if __name__ == "__main__":
    main()
