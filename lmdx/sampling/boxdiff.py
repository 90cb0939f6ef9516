"""BoxDiff constraint losses (inner-box / outer-box / corner) and the
single-iteration guidance update.

Parity: reference utils/boxdiff.py (itself adapted from showlab/BoxDiff):
- attention maps from all guidance keys are concatenated across layers/heads
  and averaged into one (H, W, 77) map (compute_ca_loss_boxdiff:136-147);
- text-token columns 1..75 are sharpened (x100) and softmaxed over tokens
  (_compute_max_attention_per_index:35-37);
- per (object, token): inner-box top-k mean pulled to 1, outer-box top-k mean
  pushed to 0, and corner constraints matching the x/y max-projections of the
  attention to the box's projection profile within +-L of each box edge
  (_compute_max_attention_per_index:62-101);
- one gradient update per step while index < max_index_step with step size
  latent_scale * sqrt(lerp(scale_range, index/(T-1)))
  (latent_backward_guidance_boxdiff:190-246; the amp loss scale multiplies
  the loss then divides the update, a float16 artifact that cancels in fp32).

All per-prompt structure is precomputed on the host into padded arrays so the
loss is a pure jittable function of the tap pytree.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as boxlib
from ..nn.attention import AttnKey, TapSpec

# BoxDiff's own attention key set (reference generation/boxdiff.py:32-38).
BOXDIFF_GUIDANCE_ATTN_KEYS: tuple[AttnKey, ...] = (
    ("down", 2, 0, 0), ("down", 2, 1, 0),
    ("up", 1, 0, 0), ("up", 1, 1, 0), ("up", 1, 2, 0),
)


def default_boxdiff_keys(ucfg) -> tuple[AttnKey, ...]:
    """Topology-generic BOXDIFF_GUIDANCE_ATTN_KEYS: every attention of the
    last cross-attn down block + every attention of the first cross-attn up
    block (matches the reference set on SD1.x, where both sit at 16x16)."""
    keys: list[AttnKey] = []
    for i in reversed(range(len(ucfg.down_block_types))):
        if ucfg.down_block_types[i] == "CrossAttnDownBlock2D":
            keys.extend(("down", i, j, 0) for j in range(ucfg.layers_per_block))
            break
    for i, block_type in enumerate(ucfg.up_block_types):
        if block_type == "CrossAttnUpBlock2D":
            keys.extend(("up", i, j, 0) for j in range(ucfg.layers_per_block + 1))
            break
    return tuple(keys)


@dataclass(frozen=True)
class BoxDiffSpec:
    """Static BoxDiff hyperparameters (reference utils/boxdiff.py:165,190)."""

    keys: tuple[AttnKey, ...] = BOXDIFF_GUIDANCE_ATTN_KEYS
    top_p: float = 0.2           # P
    corner_halfwidth: int = 1    # L
    smooth_attentions: bool = True
    sigma: float = 0.5
    kernel_size: int = 3
    latent_scale: float = 20.0
    scale_range: tuple[float, float] = (1.0, 0.5)
    max_index_step: int = 25

    @property
    def tap_spec(self) -> TapSpec:
        return TapSpec(keys=self.keys, fused=False)


def make_boxdiff_data(bboxes, object_positions, spec: BoxDiffSpec,
                      latent_hw, num_levels,
                      max_rows: int = 16) -> dict:
    """Precompute padded (object, token-position) row data.

    All guidance keys must share one attention resolution (the reference
    concatenates them, which only makes sense at equal H*W).
    """
    from .guidance import key_resolution

    resolutions = {key_resolution(k, latent_hw, num_levels) for k in spec.keys}
    if len(resolutions) != 1:
        raise ValueError(f"BoxDiff keys span several resolutions: {resolutions}")
    H, W = next(iter(resolutions))

    rows = []
    for obj_idx, positions in enumerate(object_positions):
        obj_boxes = bboxes[obj_idx]
        if obj_boxes and not isinstance(obj_boxes[0], (list, tuple)):
            obj_boxes = [obj_boxes]
        obj_mask = np.zeros((H, W), np.float32)
        corner_x = np.zeros((W,), np.float32)
        corner_y = np.zeros((H,), np.float32)
        L = spec.corner_halfwidth
        for box in obj_boxes:
            x_min, y_min, x_max, y_max = boxlib.scale_proportion(box, H=H, W=W)
            obj_mask[y_min:y_max, x_min:x_max] = 1.0
            corner_x[max(x_min - L, 0): min(x_min + L + 1, W)] = 1.0
            corner_x[max(x_max - L, 0): min(x_max + L + 1, W)] = 1.0
            corner_y[max(y_min - L, 0): min(y_min + L + 1, H)] = 1.0
            corner_y[max(y_max - L, 0): min(y_max + L + 1, H)] = 1.0
        for pos in positions:
            rows.append((pos, obj_mask, corner_x, corner_y))

    R = max_rows
    if len(rows) > R:
        raise ValueError(f"{len(rows)} (object, token) rows > max_rows={R}")

    token_idx = np.zeros((R,), np.int32)
    masks = np.zeros((R, H, W), np.float32)
    corner_xs = np.zeros((R, W), np.float32)
    corner_ys = np.zeros((R, H), np.float32)
    kfg = np.ones((R,), np.int32)
    kbg = np.ones((R,), np.int32)
    valid = np.zeros((R,), np.float32)
    for r, (pos, m, cx, cy) in enumerate(rows):
        token_idx[r] = pos
        masks[r] = m
        corner_xs[r] = cx
        corner_ys[r] = cy
        kfg[r] = max(int(m.sum() * spec.top_p), 1)
        kbg[r] = max(int((1 - m).sum() * spec.top_p), 1)
        valid[r] = 1.0

    return {
        "token_idx": jnp.asarray(token_idx),
        "masks": jnp.asarray(masks),
        "corner_x": jnp.asarray(corner_xs),
        "corner_y": jnp.asarray(corner_ys),
        "gt_proj_x": jnp.asarray(masks.max(axis=1)),   # (R, W)
        "gt_proj_y": jnp.asarray(masks.max(axis=2)),   # (R, H)
        "kfg": jnp.asarray(kfg),
        "kbg": jnp.asarray(kbg),
        "valid": jnp.asarray(valid),
    }


def _gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2
    # NOT the textbook exp(-x^2 / (2 sigma^2)): the reference's
    # GaussianSmoothing (utils/attn.py:105-108, inherited from the
    # attend-and-excite lineage) computes exp(-(x / (2 sigma))^2), i.e. an
    # effective std of sigma*sqrt(2). Reproduced exactly for loss parity
    # (verified numerically in tests/test_pipeline_parity.py).
    g = np.exp(-((ax / (2.0 * sigma)) ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def _smooth(images: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """(R, H, W) reflect-padded depthwise gaussian blur (GaussianSmoothing
    parity, utils/attn.py:73-140)."""
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    pad = (kernel_size - 1) // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x[:, None], k[None, None], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]


def boxdiff_loss(taps: dict, data: dict, spec: BoxDiffSpec) -> jnp.ndarray:
    """Total BoxDiff energy for one cond-only forward's taps."""
    from .guidance import _topk_mean

    H, W = data["masks"].shape[1:]  # static shapes carry the resolution
    # Average across layers and heads -> (n, 77).
    attn = jnp.concatenate(
        [taps[k][0].astype(jnp.float32) for k in spec.keys], axis=0
    ).mean(axis=0)

    text = attn[:, 1:-1] * 100.0
    text = jax.nn.softmax(text, axis=-1)  # over token dim (reference :35-37)
    text = text.reshape(H, W, -1)

    # Columns for each row's token (shifted by the removed bos).
    images = jnp.take(text, data["token_idx"] - 1, axis=-1)  # (H, W, R)
    images = images.transpose(2, 0, 1)                        # (R, H, W)
    if spec.smooth_attentions:
        images = _smooth(images, spec.kernel_size, spec.sigma)

    flat = images.reshape(images.shape[0], -1)
    m = data["masks"].reshape(data["masks"].shape[0], -1)

    fg = jax.nn.relu(1.0 - _topk_mean(flat * m, data["kfg"]))
    bg = jax.nn.relu(_topk_mean(flat * (1.0 - m), data["kbg"]))

    proj_x = images.max(axis=1)  # (R, W)
    proj_y = images.max(axis=2)  # (R, H)
    dist_x = (jnp.abs(proj_x - data["gt_proj_x"]) * data["corner_x"]).mean(axis=-1)
    dist_y = (jnp.abs(proj_y - data["gt_proj_y"]) * data["corner_y"]).mean(axis=-1)

    per_row = (fg + bg + dist_x + dist_y) * data["valid"]
    return per_row.sum()


def boxdiff_update(unet_taps, latents: jnp.ndarray, step_index: jnp.ndarray,
                   num_steps: int, data: dict, spec: BoxDiffSpec):
    """One BoxDiff gradient step on the latents (single iteration per
    timestep; reference latent_backward_guidance_boxdiff:190-246)."""

    def loss_fn(lat):
        return boxdiff_loss(unet_taps(lat), data, spec)

    loss, grad = jax.value_and_grad(loss_fn)(latents)
    s0, s1 = spec.scale_range
    frac = step_index.astype(jnp.float32) / max(num_steps - 1, 1)
    scale = jnp.sqrt(s0 + (s1 - s0) * frac)
    return latents - spec.latent_scale * scale * grad, loss
