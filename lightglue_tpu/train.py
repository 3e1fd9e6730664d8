"""Synthetic-supervision training for the LightGlue matcher.

The reference repo ships inference only (training lives in glue-factory,
reference README.md:31) and its released checkpoints are unreachable
offline. But the matcher's *adaptive* machinery — depth early-exit on token
confidence and width pruning on matchability (reference
lightglue.py:547-566, 631-656) — is only meaningful with weights whose
confidence/matchability heads discriminate: with random weights nothing
exits and nothing prunes, so adaptive throughput/accuracy cannot be
evaluated honestly.

This module closes that gap the TPU way: a jit-compiled optax training loop
on procedurally generated correspondence problems. Each sample plants
``p_match`` true correspondences (descriptors of matched points are noisy
copies; keypoints related by a random similarity transform + jitter) among
distractors, and supervises

* the per-layer log-assignment with the LightGlue NLL (positives pulled to
  their correspondence, unmatched points pushed to the dustbin — deep
  supervision at EVERY layer, which is exactly what makes early layers
  usable for early exit), and
* the token-confidence heads with the LightGlue self-distillation target:
  "does this layer's row argmax already agree with the final layer's?"
  (binary cross-entropy on detached descriptors).

The result is a checkpoint whose confidence/matchability distributions are
trained-realistic: easy planted pairs exit early, distractors prune away.
Used by scripts/train_synthetic.py, benchmarks/compaction_accuracy.json and
the adaptive lines of bench.py.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from .configs import LightGlueConfig
from .models import lightglue as lg
from .ops import assignment as asg


# ---------------------------------------------------------------------------
# Synthetic correspondence problems
# ---------------------------------------------------------------------------


class SyntheticBatch(NamedTuple):
    kpts0: jnp.ndarray  # (B, M, 2)
    kpts1: jnp.ndarray  # (B, N, 2)
    desc0: jnp.ndarray  # (B, M, D)
    desc1: jnp.ndarray  # (B, N, D)
    size0: jnp.ndarray  # (B, 2)
    size1: jnp.ndarray  # (B, 2)
    gt_matches0: jnp.ndarray  # (B, M) int32: index into image1 or -1
    # SIFT-family extras (add_scale_ori presets); None otherwise
    scales0: Optional[jnp.ndarray] = None  # (B, M)
    oris0: Optional[jnp.ndarray] = None  # (B, M)
    scales1: Optional[jnp.ndarray] = None  # (B, N)
    oris1: Optional[jnp.ndarray] = None  # (B, N)


def synthetic_batch(
    key: jax.Array,
    batch: int,
    m: int,
    desc_dim: int = 256,
    image_size: Tuple[int, int] = (1024, 768),
    p_match: float = 0.5,
    desc_noise: float = 0.35,
    kpt_noise: float = 1.0,
    p_confuse: float = 0.6,
    difficulty_jitter: bool = True,
    with_scale_ori: bool = False,
) -> SyntheticBatch:
    """Generate a batch of planted correspondence problems.

    Matched point i of image0 maps to slot ``perm[i]`` of image1 with
    descriptor ``normalize(d0 + noise)`` and keypoint ``T(k0) + jitter``
    for a random per-pair similarity transform T. Unmatched slots carry
    distractors; a ``p_confuse`` fraction of distractors are CONFUSERS —
    noisy copies of a random *other* image-0 descriptor placed at a random
    location (repeated-texture lookalikes). Appearance alone cannot reject
    a confuser; only geometric consensus built up through attention layers
    can, which is what makes network depth (and hence the confidence
    heads' early-exit signal) meaningful, as on real imagery.
    ``difficulty_jitter`` varies p_match and desc_noise per pair so easy
    pairs exit early and hard pairs run deep.
    """
    w, h = float(image_size[0]), float(image_size[1])
    ks = jax.random.split(key, 15)

    kpts0 = jax.random.uniform(ks[0], (batch, m, 2)) * jnp.array([w, h])
    # per-pair similarity transform: rotation [-45, 45]deg, scale [0.75,1.3]
    theta = jax.random.uniform(ks[1], (batch, 1), minval=-0.8, maxval=0.8)
    scale = jnp.exp(jax.random.uniform(ks[2], (batch, 1), minval=-0.3, maxval=0.26))
    t = (jax.random.uniform(ks[3], (batch, 1, 2)) - 0.5) * jnp.array([w, h]) * 0.2
    c, s = jnp.cos(theta) * scale, jnp.sin(theta) * scale  # (B, 1)
    center = jnp.array([w / 2, h / 2])
    x = kpts0 - center  # (B, M, 2)
    rx = c * x[..., 0] - s * x[..., 1]  # (B, M)
    ry = s * x[..., 0] + c * x[..., 1]
    kpts1_geo = jnp.stack([rx, ry], axis=-1) + center + t
    kpts1_geo = kpts1_geo + kpt_noise * jax.random.normal(ks[4], (batch, m, 2))

    if difficulty_jitter:
        p = jax.random.uniform(
            ks[5], (batch, 1), minval=p_match * 0.4, maxval=min(0.95, p_match * 1.6)
        )
        dn = desc_noise * jnp.exp(
            jax.random.uniform(ks[6], (batch, 1, 1), minval=-0.8, maxval=0.7)
        )
    else:
        p = jnp.full((batch, 1), p_match)
        dn = jnp.full((batch, 1, 1), desc_noise)

    # a point is a true correspondence if sampled AND its transform lands
    # inside image1 (points leaving the frame are unmatchable, like real
    # co-visibility)
    inside = (
        (kpts1_geo[..., 0] >= 0) & (kpts1_geo[..., 0] < w)
        & (kpts1_geo[..., 1] >= 0) & (kpts1_geo[..., 1] < h)
    )
    matched = (jax.random.uniform(ks[7], (batch, m)) < p) & inside

    # slot assignment in image1: a random permutation per pair
    perm = jax.vmap(lambda k: jax.random.permutation(k, m))(
        jax.random.split(ks[8], batch)
    ).astype(jnp.int32)

    d0 = jax.random.normal(ks[9], (batch, m, desc_dim))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    # noise DIRECTION is unit-norm so ``dn`` is the relative perturbation
    # magnitude: matched cosine ~ 1/sqrt(1+dn^2) (~0.94 at dn=0.35),
    # independent of desc_dim
    eps = jax.random.normal(ks[10], (batch, m, desc_dim))
    eps = eps / jnp.linalg.norm(eps, axis=-1, keepdims=True)
    d1_matched = d0 + dn * eps
    d1_matched = d1_matched / jnp.linalg.norm(d1_matched, axis=-1, keepdims=True)
    d1_distract = jax.random.normal(ks[11], (batch, m, desc_dim))
    d1_distract = d1_distract / jnp.linalg.norm(
        d1_distract, axis=-1, keepdims=True
    )
    # confusers: lookalikes of a random other image-0 point, wrong place
    src = jax.random.randint(ks[12], (batch, m), 0, m)
    eps2 = jax.random.normal(ks[13], (batch, m, desc_dim))
    eps2 = eps2 / jnp.linalg.norm(eps2, axis=-1, keepdims=True)
    rows = jnp.arange(batch)[:, None]
    d_conf = d0[rows, src] + dn * eps2
    d_conf = d_conf / jnp.linalg.norm(d_conf, axis=-1, keepdims=True)
    confuse = jax.random.uniform(ks[14], (batch, m)) < p_confuse
    d1_distract = jnp.where(confuse[..., None], d_conf, d1_distract)
    # distractor keypoints: fresh uniform positions
    kpts1_distract = (
        jax.random.uniform(jax.random.fold_in(ks[11], 1), (batch, m, 2))
        * jnp.array([w, h])
    )

    # scatter into image1 slot order
    src1 = jnp.where(matched[..., None], d1_matched, d1_distract)
    k1 = jnp.where(
        matched[..., None], jnp.clip(kpts1_geo, 0, jnp.array([w - 1, h - 1])),
        kpts1_distract,
    )
    desc1 = jnp.zeros_like(d0).at[rows, perm].set(src1)
    kpts1 = jnp.zeros_like(kpts0).at[rows, perm].set(k1)
    gt = jnp.where(matched, perm, -1).astype(jnp.int32)

    size = jnp.tile(jnp.array([[w, h]], jnp.float32), (batch, 1))
    extras = {}
    if with_scale_ori:
        # SIFT-family channels (reference lightglue.py:495-501 consumes raw
        # scales/oris through the learnable Fourier posenc). Matched points
        # carry geometrically consistent values: scale multiplied by the
        # pair's similarity scale, orientation shifted by its rotation
        # (plus jitter); distractor slots draw independent values.
        kso = jax.random.split(jax.random.fold_in(key, 101), 6)
        s0 = jnp.exp(jax.random.uniform(
            kso[0], (batch, m), minval=jnp.log(1.6), maxval=jnp.log(32.0)
        ))
        o0 = jax.random.uniform(
            kso[1], (batch, m), minval=-jnp.pi, maxval=jnp.pi
        )
        s1_m = s0 * scale * jnp.exp(
            0.05 * jax.random.normal(kso[2], (batch, m))
        )
        o1_m = o0 + theta + 0.05 * jax.random.normal(kso[3], (batch, m))
        o1_m = jnp.mod(o1_m + jnp.pi, 2 * jnp.pi) - jnp.pi
        s1_d = jnp.exp(jax.random.uniform(
            kso[4], (batch, m), minval=jnp.log(1.6), maxval=jnp.log(32.0)
        ))
        o1_d = jax.random.uniform(
            kso[5], (batch, m), minval=-jnp.pi, maxval=jnp.pi
        )
        s1 = jnp.where(matched, s1_m, s1_d)
        o1 = jnp.where(matched, o1_m, o1_d)
        extras = dict(
            scales0=s0.astype(jnp.float32), oris0=o0.astype(jnp.float32),
            scales1=jnp.zeros_like(s1).at[rows, perm].set(s1).astype(jnp.float32),
            oris1=jnp.zeros_like(o1).at[rows, perm].set(o1).astype(jnp.float32),
        )
    return SyntheticBatch(
        kpts0.astype(jnp.float32), kpts1.astype(jnp.float32),
        d0.astype(jnp.float32), desc1.astype(jnp.float32),
        size, size, gt, **extras,
    )


# ---------------------------------------------------------------------------
# Deep-supervised forward
# ---------------------------------------------------------------------------


def forward_all_layers(
    params: nn.Params,
    conf: LightGlueConfig,
    batch: SyntheticBatch,
):
    """Run every layer and return per-layer descriptor stacks
    ((L, B, M, D), (L, B, N, D)).

    Training always uses the XLA attention path (Pallas kernels have no
    VJP); pass a conf with flash=False.
    """
    desc0, desc1, enc0, enc1, _, _ = lg._prepare(
        params, conf, batch.kpts0, batch.kpts1, batch.desc0, batch.desc1,
        batch.size0, batch.size1, None, None,
        batch.scales0, batch.oris0, batch.scales1, batch.oris1,
    )

    def body(carry, layer_params):
        d0, d1 = carry
        d0, d1 = lg.transformer_layer(
            layer_params, d0, d1, enc0, enc1, conf, None, None
        )
        return (d0, d1), (d0, d1)

    _, (all0, all1) = jax.lax.scan(
        body, (desc0, desc1), params["transformers"]
    )
    return all0, all1


def assignment_nll(
    scores: jnp.ndarray, gt_matches0: jnp.ndarray
) -> jnp.ndarray:
    """LightGlue assignment loss for one layer.

    scores: (B, M+1, N+1) log-assignment; gt_matches0: (B, M) with -1 for
    unmatched. Positive terms pull matched pairs together; unmatched rows
    are pulled to the dustbin column, and the columns never referenced by a
    match to the dustbin row (the matched/unmatched halves are averaged
    separately then combined, as in the LightGlue paper's loss).
    """
    b, mp1, np1 = scores.shape
    m, n = mp1 - 1, np1 - 1
    matched = gt_matches0 >= 0
    safe = jnp.clip(gt_matches0, 0, n - 1)
    pos = jnp.take_along_axis(scores[:, :m, :n], safe[..., None], axis=2)[..., 0]
    pos_loss = -jnp.sum(jnp.where(matched, pos, 0.0)) / jnp.maximum(
        jnp.sum(matched), 1
    )

    un0 = ~matched
    dust0 = scores[:, :m, -1]
    neg0 = -jnp.sum(jnp.where(un0, dust0, 0.0)) / jnp.maximum(jnp.sum(un0), 1)
    # image1 side: a column is unmatched iff no row maps to it (scatter-add
    # of the matched indicator: duplicate-safe, unlike .set)
    hit = (
        jnp.zeros((b, n), jnp.int32)
        .at[jnp.arange(b)[:, None], safe]
        .add(matched.astype(jnp.int32), mode="drop")
    ) > 0
    un1 = ~hit
    dust1 = scores[:, -1, :n]
    neg1 = -jnp.sum(jnp.where(un1, dust1, 0.0)) / jnp.maximum(jnp.sum(un1), 1)
    return pos_loss + 0.5 * (neg0 + neg1)


def matcher_loss(
    params: nn.Params,
    conf: LightGlueConfig,
    batch: SyntheticBatch,
    confidence_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Deep-supervised loss: mean per-layer assignment NLL + confidence BCE.

    The confidence target for layer i is agreement of layer i's row argmax
    with the FINAL layer's row argmax (LightGlue's self-distillation;
    reference TokenConfidence semantics, lightglue.py:84-94). Confidence
    heads read detached descriptors, as in the reference (lightglue.py:547).
    """
    all0, all1 = forward_all_layers(params, conf, batch)
    L = conf.n_layers

    def layer_scores(i):
        la = nn.index_params(params["log_assignment"], i)
        scores, _ = asg.match_assignment(la, all0[i], all1[i])
        return scores

    scores_list = [layer_scores(i) for i in range(L)]
    nll = jnp.mean(
        jnp.stack([assignment_nll(s, batch.gt_matches0) for s in scores_list])
    )

    # confidence supervision (layers 0..L-2). The target asks "is this
    # point's PREDICTED ASSIGNMENT (best match OR dustbin) already the
    # final one?" — the dustbin column/row must be included, else
    # unmatchable points get noise targets (their inner-row argmax is
    # arbitrary) and the heads can never reach exit-grade confidence.
    final0 = jnp.argmax(scores_list[-1][:, :-1, :], axis=2)
    final1 = jnp.argmax(scores_list[-1][:, :, :-1], axis=1)
    bce_terms = []
    for i in range(L - 1):
        tok = nn.index_params(params["token_confidence"], i)
        c0, c1 = lg.token_confidence(
            tok, jax.lax.stop_gradient(all0[i]), jax.lax.stop_gradient(all1[i])
        )
        t0 = (jnp.argmax(scores_list[i][:, :-1, :], axis=2) == final0)
        t1 = (jnp.argmax(scores_list[i][:, :, :-1], axis=1) == final1)
        eps = 1e-6
        bce0 = -(t0 * jnp.log(c0 + eps) + (~t0) * jnp.log(1 - c0 + eps))
        bce1 = -(t1 * jnp.log(c1 + eps) + (~t1) * jnp.log(1 - c1 + eps))
        bce_terms.append(jnp.mean(bce0) + jnp.mean(bce1))
    conf_loss = jnp.mean(jnp.stack(bce_terms)) if bce_terms else jnp.float32(0)

    total = nll + confidence_weight * conf_loss
    aux = {"nll": nll, "confidence_bce": conf_loss}
    return total, aux


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


def make_train_step(conf: LightGlueConfig, optimizer):
    """Build a jitted (params, opt_state, key) -> (params, opt_state, aux)
    step: sample a synthetic batch on device, compute grads, update."""

    @functools.partial(jax.jit, static_argnames=("batch", "m"))
    def step(params, opt_state, key, batch: int = 16, m: int = 512):
        data = synthetic_batch(
            key, batch, m, desc_dim=conf.input_dim,
            with_scale_ori=conf.add_scale_ori,
        )
        (loss, aux), grads = jax.value_and_grad(matcher_loss, has_aux=True)(
            params, conf, data
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), params, updates
        )
        aux = {"loss": loss, **aux}
        return params, opt_state, aux

    return step


def make_feed_train_step(conf: LightGlueConfig, optimizer):
    """Build a jitted (params, opt_state, data) -> (params, opt_state, aux)
    step on a CALLER-PROVIDED batch (same deep-supervised loss as the
    synthetic step). Used for real-image self-supervision
    (scripts/train_real.py): batches come from homography-warped crops of
    real images with host-extracted features, so the sampling cannot live
    inside the jit."""

    @jax.jit
    def step(params, opt_state, data: SyntheticBatch):
        (loss, aux), grads = jax.value_and_grad(matcher_loss, has_aux=True)(
            params, conf, data
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), params, updates
        )
        return params, opt_state, {"loss": loss, **aux}

    return step


def train_synthetic(
    conf: Optional[LightGlueConfig] = None,
    steps: int = 1500,
    batch: int = 16,
    m: int = 512,
    lr: float = 2e-4,
    seed: int = 0,
    log_every: int = 100,
    params: Optional[nn.Params] = None,
    verbose: bool = True,
):
    """Train matcher params on synthetic correspondences. Returns
    (params, conf_used, history list of aux dicts).

    ``conf`` is normalized to the differentiable configuration
    (flash=False, fp32, no adaptivity during training).
    """
    import optax

    from .configs import lightglue_config

    if conf is None:
        conf = lightglue_config("superpoint")
    train_conf = conf.replace(
        flash=False, mp=False, depth_confidence=-1.0, width_confidence=-1.0,
        compaction_bucket=0,
    )
    key = jax.random.key(seed)
    if params is None:
        key, pk = jax.random.split(key)
        params = lg.init_params(pk, train_conf)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, lr, min(100, steps // 10 + 1), steps
            )
        ),
    )
    opt_state = optimizer.init(params)
    step = make_train_step(train_conf, optimizer)

    history = []
    for i in range(steps):
        key, sk = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, sk, batch, m)
        if i % log_every == 0 or i == steps - 1:
            aux = {k: float(v) for k, v in aux.items()}
            history.append({"step": i, **aux})
            if verbose:
                print(
                    f"step {i:5d}  loss {aux['loss']:.4f}  "
                    f"nll {aux['nll']:.4f}  conf {aux['confidence_bce']:.4f}",
                    flush=True,
                )
    return params, train_conf, history
