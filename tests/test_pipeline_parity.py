"""Pipeline-LEVEL numeric parity vs the reference's own sampler code.

`tests/test_torch_parity.py` proves the *modules* (UNet, taps, CLIP, SAM,
OWL-ViT) compute the same function. These tests go one level up: they run
the reference's actual `models/pipelines.py` denoising loops — imported
from /root/reference over the structural diffusers shim, on torch CPU —
against lmdx's segmented-`lax.scan` sampler (`lmdx/sampling/loop.py`) with
identical tiny-UNet weights, embeddings, and initial latents, and assert
the latent trajectories match numerically.

That pins, end to end against the reference implementation itself:
  - DDIM schedule + step math (shim scheduler transcribes diffusers 0.18;
    lmdx core/schedule.py was written independently),
  - CFG combination order (uncond first, pipelines.py:214-215),
  - the guidance while-loop semantics: de-scaled loss threshold, per-index
    max_iter list extension, update latents -= grad * sqrt(1 - alpha_bar_t)
    (pipelines.py:16-82),
  - `compute_ca_lossv3` (topk fg/bg energies, per-position normalization,
    object x key averaging; utils/guidance.py:91-148,244-286),
  - the ref-CA attention-transfer loss (utils/guidance.py:150-242),
  - GLIGEN scheduled sampling, the CFG-masked grounding condition, the
    null-grounding guidance forward (pipelines.py:285-321,378-427),
  - frozen-mask latent splicing (pipelines.py:445-446), and
  - DDIM inversion (pipelines.py:489-539) over the 0.18 inverse-scheduler
    conventions.

All tests are slow (tiny-UNet jit compiles per segment).
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity import _load_vendored_unet_module, _to_np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

_memo: dict = {}


class _CpuTorchProxy:
    """Stands in for the `torch` module attribute of reference modules whose
    tensor constructors hard-code device="cuda" (utils/guidance.py:104,204,
    253): strips the device kwarg so the math runs on CPU."""

    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def zeros(*args, **kwargs):
        kwargs.pop("device", None)
        return torch.zeros(*args, **kwargs)

    @staticmethod
    def tensor(*args, **kwargs):
        kwargs.pop("device", None)
        return torch.tensor(*args, **kwargs)


def _load_reference_pipelines():
    """Import /root/reference's models/pipelines.py + utils/* on torch CPU.

    Reference modules land in sys.modules under "utils"/"refmodels"; the
    diffusers/easydict shims under scripts/_diffusers_shim satisfy the
    reference's third-party imports (models/models.py:3-5)."""
    if "pipelines" in _memo:
        return _memo["pipelines"]

    shim = os.path.join(REPO, "scripts", "_diffusers_shim")
    for p in (shim, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)

    # .cuda() no-ops (utils/guidance.py:186,191,253,262,273; the boxdiff
    # GaussianSmoothing module, utils/boxdiff.py:77).
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    _load_vendored_unet_module()  # registers the "refmodels" package
    refmodels = sys.modules["refmodels"]
    if not hasattr(refmodels, "__package__"):
        refmodels.__package__ = "refmodels"

    utils_mod = importlib.import_module("utils")
    for name in ("guidance", "schedule", "boxdiff", "latents"):
        importlib.import_module(f"utils.{name}")
    # Route every torch_device consumer to CPU.
    utils_mod.torch_device = "cpu"
    sys.modules["utils.utils"].torch_device = "cpu"
    sys.modules["utils.latents"].torch_device = "cpu"
    for name in ("guidance", "boxdiff"):
        sys.modules[f"utils.{name}"].torch = _CpuTorchProxy()

    models_mod = importlib.import_module("refmodels.models")
    models_mod.torch_device = "cpu"
    pipelines = importlib.import_module("refmodels.pipelines")
    pipelines.torch_device = "cpu"

    _memo["pipelines"] = pipelines
    return pipelines


class _StubVAE:
    """decode() consumer only (pipelines.decode discards precision anyway;
    the parity comparison is on latents, not pixels)."""

    class _Out:
        def __init__(self, sample):
            self.sample = sample

    class config:  # noqa: N801
        scaling_factor = 0.18215

    def decode(self, z):
        return self._Out(z[:, :3])


def _tiny_pair(use_gligen: bool):
    """(torch vendored-fork UNet, lmdx flax UNet + converted params, cfg)."""
    import dataclasses

    from lmdx import config as cfglib
    from lmdx.nn import unet as unet_lib
    from lmdx.runtime.convert import convert_position_net, convert_unet

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = cfg.unet
    if not use_gligen:
        ucfg = dataclasses.replace(ucfg, use_gligen=False)
        cfg = dataclasses.replace(cfg, unet=ucfg)

    torch.manual_seed(0)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=use_gligen,
    ).eval()
    if use_gligen:
        with torch.no_grad():
            for name, p in tm.named_parameters():
                if "alpha_attn" in name:
                    p.fill_(0.6)
                elif "alpha_dense" in name:
                    p.fill_(-0.3)
                elif "null_positive_feature" in name or \
                        "null_position_feature" in name:
                    p.normal_(0.0, 0.5)
    sd = _to_np(tm.state_dict())
    params = convert_unet(sd, cfg)
    pn_params = convert_position_net(sd) if use_gligen else None
    fm = unet_lib.UNet2DCondition(ucfg)
    return tm, fm, params, pn_params, cfg


def _embeddings(rng, L=8, D=32):
    uncond = rng.standard_normal((1, L, D)).astype(np.float32)
    cond = rng.standard_normal((1, L, D)).astype(np.float32)
    text = np.concatenate([uncond, cond], axis=0)
    return text, uncond, cond


def _model_dict(tm, scheduler, tokenizer=None, text_encoder=None):
    from easydict import EasyDict

    return EasyDict(
        vae=_StubVAE(), tokenizer=tokenizer, text_encoder=text_encoder,
        unet=tm, scheduler=scheduler, dtype=torch.float32)


def _nhwc(x_torch):
    return np.asarray(x_torch.detach()).transpose(0, 2, 3, 1)


STEPS = 6
KEYS = (("mid", 0, 0, 0), ("up", 1, 0, 0), ("up", 1, 1, 0))
BBOXES = [[0.1, 0.1, 0.6, 0.6], [0.5, 0.55, 0.9, 0.95]]
POSITIONS = [[2], [4, 5]]


def _guidance_kwargs(**overrides):
    kw = dict(
        loss_scale=3.0, loss_threshold=0.0, max_iter=[2, 2, 1],
        max_index_step=4, guidance_attn_keys=KEYS,
        use_ratio_based_loss=False, fg_top_p=0.2, bg_top_p=0.2,
        fg_weight=1.0, bg_weight=4.0, verbose=False)
    kw.update(overrides)
    return kw


def _lmdx_spec_data(use_ref_ca=False, word_token_indices=None):
    from lmdx.sampling import guidance as g

    spec = g.GuidanceSpec(
        keys=KEYS, loss_scale=3.0, loss_threshold=0.0, max_index_step=4,
        fg_top_p=0.2, bg_top_p=0.2, fg_weight=1.0, bg_weight=4.0,
        use_ref_ca=use_ref_ca, ref_ca_loss_weight=2.0)
    data = g.make_guidance_data(
        BBOXES, POSITIONS, spec, latent_hw=(16, 16), num_levels=2,
        word_token_indices=word_token_indices,
        ref_box_to_obj=[0, 1] if use_ref_ca else None)
    return spec, data


@pytest.mark.slow
def test_plain_cfg_matches_reference_generate():
    """pipelines.generate (plain CFG DDIM, pipelines.py:249-278) vs
    loop.sample with no guidance."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(11)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    t_latents, _ = pipelines.generate(
        _model_dict(tm, DDIMScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS)

    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text))
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


@pytest.mark.slow
def test_semantic_guidance_matches_reference():
    """generate_semantic_guidance with CA-energy guidance active
    (pipelines.py:129-247 + 16-82, utils/guidance.py:91-148,244-286):
    the full guided trajectory must match, proving the loss, the gradient
    update scale, and the iteration accounting agree."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(12)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    ret = pipelines.generate_semantic_guidance(
        _model_dict(tm, DDIMScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, BBOXES, ["a", "b"], POSITIONS,
        semantic_guidance_kwargs=_guidance_kwargs(),
        show_progress=False, save_all_latents=True,
        offload_latents_to_cpu=False)
    t_latents, t_traj = ret[0], ret[-1]

    spec, data = _lmdx_spec_data()
    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, max_iter=[2, 2, 1],
        save_all_latents=True)

    assert out.all_latents.shape[0] == t_traj.shape[0] == STEPS + 1
    for i in range(STEPS + 1):
        np.testing.assert_allclose(
            np.asarray(out.all_latents[i]), _nhwc(t_traj[i]), atol=2e-3,
            err_msg=f"trajectory diverged at step {i}")
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


@pytest.mark.slow
def test_ref_ca_guidance_matches_reference():
    """Attention-transfer (ref-CA) loss parity (utils/guidance.py:150-242,
    ref_ca_word_token_only path): per-box reference maps enter the loss at
    the word-token column with L1 on mask-normalized attention."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(13)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    word_idx = [2, 5]
    heads = 2

    # Shared per-step reference maps: {key: (T, Bx=2, heads, n)}
    sizes = {("mid", 0, 0, 0): 64, ("up", 1, 0, 0): 256, ("up", 1, 1, 0): 256}
    ref_np = {
        k: rng.uniform(0.0, 0.2, (STEPS, 2, heads, n)).astype(np.float32)
        for k, n in sizes.items()}

    # Reference nesting: [obj][t][key] -> (1, heads, n, 1)
    # (one box per object, so the per-box level collapses; guidance.py:168-171)
    ref_nested = [
        [
            {k: torch.from_numpy(ref_np[k][t, obj][None, :, :, None])
             for k in ref_np}
            for t in range(STEPS)
        ]
        for obj in range(2)
    ]

    ret = pipelines.generate_semantic_guidance(
        _model_dict(tm, DDIMScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, BBOXES, ["a", "b"], POSITIONS,
        semantic_guidance_kwargs=_guidance_kwargs(
            ref_ca_saved_attns=ref_nested,
            ref_ca_word_token_only=True,
            word_token_indices=word_idx,
            ref_ca_loss_weight=2.0),
        show_progress=False, save_all_latents=True,
        offload_latents_to_cpu=False)
    t_latents = ret[0]

    spec, data = _lmdx_spec_data(use_ref_ca=True, word_token_indices=word_idx)
    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, max_iter=[2, 2, 1],
        ref_taps={k: jnp.asarray(v) for k, v in ref_np.items()})
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


@pytest.mark.slow
def test_boxdiff_guidance_matches_reference():
    """BoxDiff inner/outer-box + corner constraints and the one-iteration
    sqrt-interpolated update (utils/boxdiff.py:20-246): guided trajectory
    parity through generate_semantic_guidance(use_boxdiff=True)."""
    tm, fm, params, _, cfg = _tiny_pair(use_gligen=False)
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling import boxdiff as boxdiff_lib
    from lmdx.sampling.loop import sample

    rng = np.random.default_rng(15)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    # Every BoxDiff key must share one attention resolution: the tiny
    # topology's 16x16 layers (down block 0 + up block 1).
    bd_keys = (("down", 0, 0, 0), ("up", 1, 0, 0), ("up", 1, 1, 0))

    ret = pipelines.generate_semantic_guidance(
        _model_dict(tm, DDIMScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, BBOXES, ["a", "b"], POSITIONS,
        use_boxdiff=True,
        semantic_guidance_kwargs=dict(
            amp_loss_scale=10, latent_scale=2.0, scale_range=(1.0, 0.5),
            max_index_step=4, guidance_attn_keys=bd_keys,
            P=0.2, L=1, smooth_attentions=True, sigma=0.5, kernel_size=3,
            verbose=False),
        show_progress=False, save_all_latents=True,
        offload_latents_to_cpu=False)
    t_latents, t_traj = ret[0], ret[-1]

    spec = boxdiff_lib.BoxDiffSpec(
        keys=bd_keys, top_p=0.2, corner_halfwidth=1, smooth_attentions=True,
        sigma=0.5, kernel_size=3, latent_scale=2.0, scale_range=(1.0, 0.5),
        max_index_step=4)
    data = boxdiff_lib.make_boxdiff_data(
        BBOXES, POSITIONS, spec, latent_hw=(16, 16), num_levels=2)
    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, save_all_latents=True)

    for i in range(STEPS + 1):
        np.testing.assert_allclose(
            np.asarray(out.all_latents[i]), _nhwc(t_traj[i]), atol=2e-3,
            err_msg=f"trajectory diverged at step {i}")
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


class _TokInputs(dict):
    def to(self, device):
        return self


class _StubTokenizer:
    def __init__(self, ids):
        self.ids = ids

    def __call__(self, phrases, padding=True, return_tensors="pt"):
        return _TokInputs(
            input_ids=torch.tensor([self.ids[p] for p in phrases]))


class _StubTextEncoder:
    """pooler_output lookup table — the CLIP pooled phrase embeddings both
    sides must agree on (pipelines.py:303-305)."""

    def __init__(self, table):
        self.table = table

    def __call__(self, input_ids):
        return types.SimpleNamespace(pooler_output=self.table[input_ids])


@pytest.mark.slow
def test_gligen_frozen_scheduled_matches_reference():
    """generate_gligen end to end (pipelines.py:323-473): PositionNet
    grounding with the CFG-masked condition (max_objs=30, uncond half
    nulled), scheduled-sampling fuser cutoff, semantic guidance with the
    reference's NULL-grounding guidance forward (pipelines.py:378-388), and
    frozen-mask latent splicing from an input trajectory."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.nn import unet as unet_lib
    from lmdx.sampling import gligen as gligen_lib
    from lmdx.sampling.loop import sample

    tm, fm, params, pn_params, cfg = _tiny_pair(use_gligen=True)
    rng = np.random.default_rng(14)
    text, uncond, cond = _embeddings(rng)
    traj0 = rng.standard_normal((STEPS + 1, 1, 4, 16, 16)).astype(np.float32)
    frozen_mask = (rng.random((16, 16)) > 0.5).astype(np.float32)
    phrases = ["a red cube", "a blue ball"]
    table = torch.from_numpy(
        rng.standard_normal((2, 768)).astype(np.float32))
    frozen_steps = 3
    beta = 0.5  # fuser on for the first 3 of 6 steps

    ret = pipelines.generate_gligen(
        _model_dict(tm, DDIMScheduler(),
                    tokenizer=_StubTokenizer({p: i for i, p in enumerate(phrases)}),
                    text_encoder=_StubTextEncoder(table)),
        torch.from_numpy(traj0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, BBOXES, phrases,
        gligen_scheduled_sampling_beta=beta,
        frozen_steps=frozen_steps,
        frozen_mask=torch.from_numpy(frozen_mask),
        semantic_guidance=True,
        semantic_guidance_bboxes=BBOXES,
        semantic_guidance_object_positions=POSITIONS,
        semantic_guidance_kwargs=_guidance_kwargs(),
        show_progress=False)
    t_latents = ret[0]

    # lmdx grounding condition at the reference's max_objs=30 slot count
    # (pipelines.py:289 hard-codes 30; slot count changes fuser softmax).
    boxes2, embs2, masks2 = gligen_lib.prepare_gligen_condition(
        BBOXES, np.asarray(table), max_objs=30)
    pn = unet_lib.PositionNet(
        positive_len=768, out_dim=cfg.unet.cross_attention_dim,
        fourier_freqs=cfg.unet.gligen_fourier_freqs)
    objs_full = pn.apply({"params": pn_params}, boxes2, masks2, embs2)
    objs_null = objs_full[:1]

    spec, data = _lmdx_spec_data()
    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(traj0[0].transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, max_iter=[2, 2, 1],
        gligen=(objs_full, objs_null),
        num_fuser_steps=int(beta * STEPS),
        frozen_mask=jnp.asarray(frozen_mask),
        frozen_latents=jnp.asarray(traj0.transpose(0, 1, 3, 4, 2)),
        num_frozen_steps=frozen_steps)
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


# ---- host-side composition / attention utilities ---------------------------


@pytest.mark.slow
def test_compose_latents_with_alignment_matches_reference():
    """Latent-trajectory composition with mass-center alignment
    (utils/latents.py:38-118): box-to-bg initial copy, largest-mask-first
    paste order, foreground indices, and the 8x8-snapped shift offsets."""
    _load_reference_pipelines()
    latents_ref = sys.modules["utils.latents"]
    from easydict import EasyDict

    from lmdx.core import boxes as boxlib
    from lmdx.sampling import compose as compose_lib

    rng = np.random.default_rng(21)
    S = 4
    trajs = [rng.standard_normal((S + 1, 1, 4, 16, 16)).astype(np.float32)
             for _ in range(2)]
    # Masks whose mass centers differ from the target box centers, so
    # alignment produces nonzero snapped offsets; make mask 0 the bigger one
    # to exercise the largest-first paste order deterministically.
    m0 = np.zeros((16, 16), bool)
    m0[2:9, 1:10] = True
    m1 = np.zeros((16, 16), bool)
    m1[10:14, 11:15] = True
    masks = [m0, m1]
    overall_bboxes = [[[0.55, 0.5, 0.95, 0.9]], [[0.05, 0.1, 0.45, 0.5]]]
    bg = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    t_composed, t_fg, t_offsets = latents_ref.compose_latents_with_alignment(
        EasyDict(unet=None, scheduler=None, dtype=torch.float32),
        [torch.from_numpy(t.copy()) for t in trajs],
        [torch.from_numpy(m) for m in masks],
        S, 1, 128, 128,
        latents_bg=torch.from_numpy(bg.copy()),
        align_with_overall_bboxes=True, overall_bboxes=overall_bboxes,
        horizontal_shift_only=False)

    out = compose_lib.compose_latents_with_alignment(
        [t.transpose(0, 1, 3, 4, 2) for t in trajs],
        [m.astype(np.float32) for m in masks],
        bg.transpose(0, 2, 3, 1), S,
        align_with_overall_bboxes=True, overall_bboxes=overall_bboxes,
        horizontal_shift_only=False)

    assert [tuple(np.round(o, 6)) for o in out.offsets] == \
        [tuple(np.round(o, 6)) for o in t_offsets]
    np.testing.assert_array_equal(
        out.foreground_indices, np.asarray(t_fg))
    np.testing.assert_allclose(
        out.latents, np.asarray(t_composed).transpose(0, 1, 3, 4, 2),
        atol=1e-6)

    # Unaligned path too (align_with_overall_bboxes=False in LMD+ defaults).
    t_c2, t_f2, t_o2 = latents_ref.compose_latents_with_alignment(
        EasyDict(unet=None, scheduler=None, dtype=torch.float32),
        [torch.from_numpy(t.copy()) for t in trajs],
        [torch.from_numpy(m) for m in masks],
        S, 1, 128, 128,
        latents_bg=torch.from_numpy(bg.copy()),
        align_with_overall_bboxes=False)
    out2 = compose_lib.compose_latents_with_alignment(
        [t.transpose(0, 1, 3, 4, 2) for t in trajs],
        [m.astype(np.float32) for m in masks],
        bg.transpose(0, 2, 3, 1), S, align_with_overall_bboxes=False)
    assert list(t_o2) == out2.offsets == [(0.0, 0.0)] * 2
    np.testing.assert_allclose(
        out2.latents, np.asarray(t_c2).transpose(0, 1, 3, 4, 2), atol=1e-6)
    np.testing.assert_array_equal(out2.foreground_indices, np.asarray(t_f2))

    # blend_latents (utils/latents.py:25-35): fg/bg noise blending math.
    fg = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    fg_mask = (rng.random((16, 16)) > 0.5).astype(np.float32)
    t_blend = latents_ref.blend_latents(
        torch.from_numpy(bg.copy()), torch.from_numpy(fg.copy()),
        torch.from_numpy(fg_mask), fg_blending_ratio=0.1)
    from lmdx.sampling import latents as latents_lib

    f_blend = latents_lib.blend_latents(
        jnp.asarray(bg.transpose(0, 2, 3, 1)),
        jnp.asarray(fg.transpose(0, 2, 3, 1)),
        jnp.asarray(fg_mask), fg_blending_ratio=0.1)
    np.testing.assert_allclose(
        np.asarray(f_blend), np.asarray(t_blend).transpose(0, 2, 3, 1),
        atol=1e-6)


@pytest.mark.slow
def test_attention_shift_and_aggregation_match_reference():
    """shift_saved_attns (utils/attn.py:40-70) and get_token_attnv2
    (utils/attn.py:9-38) vs compose.shift_ref_taps /
    aggregate_token_attention on identical map content."""
    _load_reference_pipelines()
    attn_ref = sys.modules["utils.attn"]

    from lmdx.sampling import compose as compose_lib

    rng = np.random.default_rng(22)
    T, heads, n = 5, 2, 256
    key = ("up", 1, 0, 0)
    maps = rng.uniform(0, 1, (T, heads, n)).astype(np.float32)
    offset = (0.37, -0.22)  # snaps to (3, -2) on the 8x8 base grid

    # Reference: per-step dicts of (batch=1, heads, n, tokens=1).
    saved = [{key: torch.from_numpy(maps[t][None, :, :, None])}
             for t in range(T)]
    t_shifted = attn_ref.shift_saved_attns(saved, offset, [key])
    t_stack = np.stack(
        [np.asarray(d[key])[0, :, :, 0] for d in t_shifted])  # (T, heads, n)

    f_shifted = compose_lib.shift_ref_taps([{key: maps}], [offset])
    np.testing.assert_allclose(
        np.asarray(f_shifted[key][:, 0]), t_stack, atol=1e-6)

    # Aggregation: cond-only maps, start step 2, single token column.
    L = 6
    token_id = 3
    full = rng.uniform(0, 1, (T, 1, heads, n, L)).astype(np.float32)
    saved_full = [{key: torch.from_numpy(full[t])} for t in range(T)]
    t_attn = attn_ref.get_token_attnv2(
        token_id, saved_full, key, attn_aggregation_step_start=2,
        input_ca_has_condition_only=True, return_np=True)
    f_attn = compose_lib.aggregate_token_attention(
        full[:, :, :, :, token_id : token_id + 1], start_step=2)
    np.testing.assert_allclose(f_attn, t_attn, atol=1e-6)


# ---- DPM-Solver++(2M) ------------------------------------------------------


@pytest.mark.slow
def test_dpm_solver_matches_reference_generate():
    """DPM-Solver++(2M) multistep parity: linspace grid, x0-history
    second-order midpoint updates, first-order on step 0 and on the final
    step of short runs (shim transcribes diffusers 0.18; lmdx
    core/schedule.py:dpmpp_2m_step was written independently)."""
    pipelines = _load_reference_pipelines()
    from diffusers import DPMSolverMultistepScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(31)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    t_latents, _ = pipelines.generate(
        _model_dict(tm, DPMSolverMultistepScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS)

    out = sample(
        fm, params, sched.make_schedule(STEPS, solver="dpmpp_2m"),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text),
        solver="dpmpp_2m")
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


@pytest.mark.slow
def test_dpm_guidance_step_size_matches_reference():
    """Guidance under the DPM scheduler uses sigmas[index]^2 as the update
    scale (models/pipelines.py:60-63), not the DDIM sqrt(1-alpha_bar):
    guided-trajectory parity pins lmdx's (1-a)/a step size."""
    pipelines = _load_reference_pipelines()
    from diffusers import DPMSolverMultistepScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(32)
    text, uncond, cond = _embeddings(rng)
    lat0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    ret = pipelines.generate_semantic_guidance(
        _model_dict(tm, DPMSolverMultistepScheduler()),
        torch.from_numpy(lat0.copy()),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, BBOXES, ["a", "b"], POSITIONS,
        semantic_guidance_kwargs=_guidance_kwargs(loss_scale=0.5),
        show_progress=False, save_all_latents=True,
        offload_latents_to_cpu=False)
    t_latents, t_traj = ret[0], ret[-1]

    spec, data = _lmdx_spec_data()
    import dataclasses

    spec = dataclasses.replace(spec, loss_scale=0.5)
    out = sample(
        fm, params, sched.make_schedule(STEPS, solver="dpmpp_2m"),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, max_iter=[2, 2, 1],
        solver="dpmpp_2m", save_all_latents=True)
    for i in range(STEPS + 1):
        np.testing.assert_allclose(
            np.asarray(out.all_latents[i]), _nhwc(t_traj[i]), atol=5e-3,
            err_msg=f"trajectory diverged at step {i}")
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=5e-3)


@pytest.mark.slow
def test_partial_frozen_matches_reference():
    """generate_partial_frozen (pipelines.py:541-599) — the training-free
    LMD final pass: guided regeneration with frozen-mask splicing from the
    composed trajectory, no GLIGEN."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import sample

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(33)
    text, uncond, cond = _embeddings(rng)
    traj0 = rng.standard_normal((STEPS + 1, 1, 4, 16, 16)).astype(np.float32)
    frozen_mask = (rng.random((16, 16)) > 0.4).astype(np.float32)
    frozen_steps = 3

    t_latents, _ = pipelines.generate_partial_frozen(
        _model_dict(tm, DDIMScheduler()),
        torch.from_numpy(traj0.copy()),
        torch.from_numpy(frozen_mask),
        tuple(map(torch.from_numpy, (text, uncond, cond))),
        STEPS, frozen_steps,
        bboxes=BBOXES, phrases=["a", "b"], object_positions=POSITIONS,
        semantic_guidance_kwargs=_guidance_kwargs())

    spec, data = _lmdx_spec_data()
    out = sample(
        fm, params, sched.make_schedule(STEPS),
        jnp.asarray(traj0[0].transpose(0, 2, 3, 1)), jnp.asarray(text),
        cond_embeddings=jnp.asarray(cond),
        spec=spec, guidance_data=data, max_iter=[2, 2, 1],
        frozen_mask=jnp.asarray(frozen_mask),
        frozen_latents=jnp.asarray(traj0.transpose(0, 1, 3, 4, 2)),
        num_frozen_steps=frozen_steps)
    np.testing.assert_allclose(
        np.asarray(out.latents), _nhwc(t_latents), atol=2e-3)


@pytest.mark.slow
def test_multidiffusion_matches_reference():
    """MultiDiffusion region sampling (generation/multidiffusion.py:161-287):
    sliding views, shared-uncond CFG (noise_pred[:] += uncond[:1]),
    mask-weighted view averaging with count normalization — final-latent
    parity against the reference's own nn.Module on a 512x576 panorama
    (two overlapping views)."""
    _load_reference_pipelines()
    # generation/multidiffusion.py pulls utils.parse (inflect/gradio) and
    # torchvision at import time; none are needed at run time here.
    for name, attrs in (
        ("inflect", {"engine": lambda: types.SimpleNamespace()}),
        ("gradio", {"Error": RuntimeError}),
        ("torchvision", {}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if "torchvision.transforms" not in sys.modules:
        tv_t = types.ModuleType("torchvision.transforms")
        tv_t.ToPILImage = lambda: (lambda x: x)
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision"].transforms = tv_t
    # The module instantiates MultiDiffusion (full model load) at module
    # level (multidiffusion.py:348, import-order DI) — exec the source up
    # to that point to get the class + helpers without the load.
    md_path = os.path.join(REFERENCE, "generation", "multidiffusion.py")
    src = open(md_path).read()
    src = src[: src.index('device = torch.device("cuda")')]
    md_mod = types.ModuleType("ref_multidiffusion")
    md_mod.__file__ = md_path
    exec(compile(src, md_path, "exec"), md_mod.__dict__)

    from diffusers import DDIMScheduler

    from lmdx.core import schedule as sched
    from lmdx.methods import multidiffusion as md_lib

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(41)
    R, L, D = 2, 8, 32
    steps = 5
    uncond = rng.standard_normal((R, L, D)).astype(np.float32)
    cond = rng.standard_normal((R, L, D)).astype(np.float32)
    text = np.concatenate([uncond, cond], axis=0)

    fg = np.zeros((64, 72), np.float32)
    fg[20:50, 30:60] = 1.0
    masks_np = np.stack([1.0 - fg, fg])  # (R, H, W), row 0 = background

    md = md_mod.MultiDiffusion.__new__(md_mod.MultiDiffusion)
    torch.nn.Module.__init__(md)
    md.device = "cpu"
    md.batch_size = 64  # no unet_batch splitting
    md.unet = tm
    md.scheduler = DDIMScheduler()
    md.vae = None
    md.get_text_embeds = lambda p, n: torch.from_numpy(text.copy())
    captured = {}

    def fake_decode(latents):
        captured["latents"] = latents.clone()
        return torch.zeros(1, 3, 8, 8)

    md.decode_latents = fake_decode
    md.generate(
        torch.from_numpy(masks_np[:, None]),  # (R, 1, H, W)
        ["bg", "obj"], height=512, width=576,
        num_inference_steps=steps, bootstrapping=0,
        indep_uncond=False, normalization=True, seed=5)
    t_latent = captured["latents"]

    g = torch.manual_seed(5)
    lat0 = torch.randn((1, 4, 64, 72), generator=g,
                       dtype=torch.float32).numpy()
    views = tuple(md_lib.get_views(512, 576))
    assert views == tuple(md_mod.get_views(512, 576)) and len(views) == 2

    schedule = sched.make_schedule(steps)
    out = md_lib._run_segment(
        fm, views, False, 7.5, False, True, params, schedule,
        jnp.asarray(lat0.transpose(0, 2, 3, 1)),
        {"t": schedule.timesteps, "prev_t": schedule.prev_timesteps},
        {"masks": jnp.asarray(masks_np[..., None]),
         "text_embeddings": jnp.asarray(text)})
    np.testing.assert_allclose(
        np.asarray(out), _nhwc(t_latent), atol=2e-3)


@pytest.mark.slow
def test_input_latents_match_reference_torch_noise():
    """get_input_latents_list under LMDX_NOISE_BACKEND=torch is BIT-equal
    to the reference (utils/latents.py:120-160): torch.manual_seed noise
    streams, the +12345 seed-collision bump, sqrt blending inside the box
    mask, and init_noise_sigma scaling."""
    _load_reference_pipelines()
    latents_ref = sys.modules["utils.latents"]
    utils_ref = sys.modules["utils"]
    from easydict import EasyDict

    from lmdx.sampling import latents as latents_lib

    class _UNetCfg:
        class config:  # noqa: N801
            in_channels = 4

    class _Sched:
        init_noise_sigma = 1.0

    boxes = [[0.1, 0.2, 0.5, 0.7], [0.4, 0.1, 0.9, 0.6]]
    bg_seed, fg_start = 100, 99  # second box collides: 99+1 == 100 -> +12345
    t_list, t_bg = latents_ref.get_input_latents_list(
        EasyDict(unet=_UNetCfg(), scheduler=_Sched(), dtype=torch.float32),
        bg_seed, fg_start, 0.1, 128, 128, so_boxes=boxes)

    masks = [np.asarray(utils_ref.proportion_to_mask(b, 16, 16))
             for b in boxes]
    os.environ["LMDX_NOISE_BACKEND"] = "torch"
    try:
        f_list, f_bg = latents_lib.get_input_latents_list(
            bg_seed, fg_start, masks, (1, 16, 16, 4), fg_blending_ratio=0.1)
    finally:
        del os.environ["LMDX_NOISE_BACKEND"]

    np.testing.assert_array_equal(np.asarray(f_bg), _nhwc(t_bg))
    assert len(f_list) == len(t_list) == 2
    for f, t in zip(f_list, t_list):
        np.testing.assert_array_equal(np.asarray(f), _nhwc(t))


@pytest.mark.slow
def test_invert_matches_reference():
    """pipelines.invert (DDIM inversion, pipelines.py:489-539) vs
    loop.invert: full inverted trajectory, CFG branch and the
    guidance_scale<=0 uncond-only branch (pipelines.py:519-528). Pins the
    0.18 inverse-scheduler conventions: target-t UNet embedding, the
    sub-zero first source mapped to the initial alpha, and stopping one
    short of the top grid point."""
    pipelines = _load_reference_pipelines()
    from diffusers import DDIMInverseScheduler, DDIMScheduler
    from easydict import EasyDict

    from lmdx.core import schedule as sched
    from lmdx.sampling.loop import invert

    tm, fm, params, _, _ = _tiny_pair(use_gligen=False)
    rng = np.random.default_rng(23)
    text, uncond, cond = _embeddings(rng)
    x0 = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    ddim = DDIMScheduler()
    model_dict = _model_dict(tm, ddim)
    model_dict = EasyDict(
        {**model_dict, "inverse_scheduler":
         DDIMInverseScheduler.from_config(ddim.config)})

    for gs in (7.5, 0.0):
        t_traj = pipelines.invert(
            model_dict, torch.from_numpy(x0.copy()),
            tuple(map(torch.from_numpy, (text, uncond, cond))),
            STEPS, guidance_scale=gs)

        final, traj = invert(
            fm, params, sched.make_schedule(STEPS),
            jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(text),
            guidance_scale=gs)

        assert traj.shape[0] == t_traj.shape[0] == STEPS
        # reference stacks most-noised-first (pipelines.py:537); lmdx
        # returns ascending-from-x0.
        for i in range(STEPS):
            np.testing.assert_allclose(
                np.asarray(traj[i]), _nhwc(t_traj[STEPS - 1 - i]), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(final), _nhwc(t_traj[0]), atol=2e-3)


def _tiny_xl_refiner_pair():
    """(torch fork UNet + diffusers-exact text_time augmentation, lmdx bundle
    at the matching text_time config, shared converted weights).

    The reference's SDXL refiner calls diffusers' XL img2img pipeline
    directly (generation/sdxl_refinement.py:14-30) — there is no reference
    loop to import, so the torch side is the vendored fork UNet with the
    text_time micro-conditioning grafted on exactly as diffusers'
    UNet2DConditionModel does it (Fourier-embed time ids -> concat pooled ->
    add_embedding MLP -> added to the time embedding), which is also what
    lmdx/nn/unet.py:128-144 implements."""
    import dataclasses

    from lmdx import config as cfglib
    from lmdx.runtime import models as runtime_models
    from lmdx.runtime.convert import convert_unet
    from lmdx.text import tokens as toklib

    unet_mod = _load_vendored_unet_module()
    cfg = cfglib.tiny_test()
    ucfg = dataclasses.replace(
        cfg.unet, use_gligen=False, addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=cfg.clip.hidden_size + 8 * 5)
    cfg = dataclasses.replace(cfg, unet=ucfg)

    torch.manual_seed(3)
    tm = unet_mod.UNet2DConditionModel(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=ucfg.down_block_types,
        up_block_types=ucfg.up_block_types,
        block_out_channels=ucfg.block_out_channels,
        layers_per_block=ucfg.layers_per_block,
        cross_attention_dim=ucfg.cross_attention_dim,
        attention_head_dim=ucfg.num_attention_heads[0],
        norm_num_groups=ucfg.norm_num_groups,
        use_gated_attention=False,
    ).eval()

    class _AddEmbedding(torch.nn.Module):
        # diffusers TimestepEmbedding naming (linear_1/linear_2) so the
        # state dict matches the checkpoint contract convert_unet expects.
        def __init__(self, in_dim, out_dim):
            super().__init__()
            self.linear_1 = torch.nn.Linear(in_dim, out_dim)
            self.act = torch.nn.SiLU()
            self.linear_2 = torch.nn.Linear(out_dim, out_dim)

        def forward(self, x):
            return self.linear_2(self.act(self.linear_1(x)))

    torch.manual_seed(4)
    tm.add_embedding = _AddEmbedding(
        ucfg.projection_class_embeddings_input_dim, ucfg.time_embed_dim)

    # Snapshot + convert BEFORE patching time_embedding (the patch would
    # rename its state-dict keys).
    sd = _to_np(tm.state_dict())
    params_unet = convert_unet(sd, cfg)

    from diffusers.models.embeddings import Timesteps

    add_time_proj = Timesteps(ucfg.addition_time_embed_dim,
                              ucfg.flip_sin_to_cos, ucfg.freq_shift)
    aug_state = {"emb": None}
    orig_te = tm.time_embedding

    class _AugTimeEmbedding(torch.nn.Module):
        def forward(self, t_feat, *args):   # fork passes timestep_cond too
            emb = orig_te(t_feat, *args)
            if aug_state["emb"] is not None:
                emb = emb + aug_state["emb"]
            return emb

    tm.time_embedding = _AugTimeEmbedding()

    def unet_fn(sample, t, encoder_hidden_states, added_cond_kwargs):
        ids = added_cond_kwargs["time_ids"]
        id_emb = add_time_proj(ids.reshape(-1)).reshape(ids.shape[0], -1)
        aug = torch.cat(
            [added_cond_kwargs["text_embeds"], id_emb], dim=-1)
        aug_state["emb"] = tm.add_embedding(aug)
        try:
            return tm(sample, t, encoder_hidden_states=encoder_hidden_states
                      ).sample
        finally:
            aug_state["emb"] = None

    unet_m, te, vae, pn = runtime_models.build_modules(cfg)
    params = runtime_models.init_random_params(cfg, seed=7)
    params["unet"] = params_unet
    bundle = runtime_models.ModelBundle(
        config=cfg, tokenizer=toklib.default_tokenizer(), unet=unet_m,
        text_encoder=te, vae=vae, position_net=pn, params=params,
        text_encoder_2=runtime_models.build_text_encoder_2(cfg))
    return unet_fn, bundle


@pytest.mark.slow
@pytest.mark.parametrize("integrator", ["euler", "ddim"])
def test_sdxl_refiner_img2img_matches_shim(integrator):
    """lmdx sdxl_refine.img2img vs the shim transcription of the diffusers
    XL img2img pipeline the reference calls (sdxl_refinement.py:22-30):
    strength->t_start mapping, add_noise at the sliced grid head,
    aesthetic-score text_time ids (6.0 cond / 2.5 uncond), CFG at the XL
    default guidance 5.0 — full final-latent parity on shared tiny weights,
    over BOTH integrators: EulerDiscrete (the refiner checkpoint's scheduler
    config, lmdx's default for that bundle — sigma-space samples, scaled
    model input, fractional linspace timesteps) and DDIM."""
    _load_reference_pipelines()  # installs the shim on sys.path
    from diffusers import (
        DDIMScheduler,
        EulerDiscreteScheduler,
        StableDiffusionXLImg2ImgPipeline,
    )

    from lmdx.methods import base as mbase
    from lmdx.methods import sdxl_refine
    from lmdx.runtime import models as runtime_models
    from lmdx.sampling import latents as latents_lib

    unet_fn, bundle = _tiny_xl_refiner_pair()
    rng = np.random.default_rng(19)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    prompt = "a red car on a beach"
    negative = ", drawing, sketch"
    seed, strength, steps = 5, 0.5, 8

    lat_lmdx = sdxl_refine.img2img(
        bundle, image, prompt, negative_prompt=negative, strength=strength,
        num_inference_steps=steps, seed=seed, return_latents=True,
        scheduler=integrator)

    # Identical inputs for the torch side, produced by the same encoders.
    lat_shape = (1, 32 // bundle.config.vae_scale,
                 32 // bundle.config.vae_scale, 4)
    latents0 = mbase.encode_image(
        bundle, image,
        noise=latents_lib.noise_from_seed(seed + 1, lat_shape))
    noise = latents_lib.noise_from_seed(seed, lat_shape)
    cond, cond_pooled = runtime_models.encode_text(bundle, [prompt])
    uncond, uncond_pooled = runtime_models.encode_text(bundle, [negative])

    def _t(x):  # NHWC numpy/jax -> NCHW torch
        return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())

    shim_scheduler = (EulerDiscreteScheduler() if integrator == "euler"
                      else DDIMScheduler())
    pipe = StableDiffusionXLImg2ImgPipeline(
        unet=unet_fn, scheduler=shim_scheduler,
        vae_encode=lambda img: _t(latents0),
        requires_aesthetics_score=True)
    lat_torch = pipe(
        image=torch.zeros((1, 3, 32, 32)),
        prompt_embeds=torch.from_numpy(np.asarray(cond)),
        negative_prompt_embeds=torch.from_numpy(np.asarray(uncond)),
        pooled_prompt_embeds=torch.from_numpy(np.asarray(cond_pooled)),
        negative_pooled_prompt_embeds=torch.from_numpy(
            np.asarray(uncond_pooled)),
        noise=_t(noise), strength=strength, num_inference_steps=steps)

    np.testing.assert_allclose(
        np.asarray(lat_lmdx), _nhwc(lat_torch), atol=2e-3)


def test_sdxl_refine_chain_matches_reference_semantics(monkeypatch, tmp_path):
    """refine()'s pre-pipeline chain vs the reference's literal code
    (generation/sdxl_refinement.py:22-30): the style negative prompt string,
    the always-prepended extra negative (including the empty-extra leading
    comma), the LANCZOS upscale, strength/seed passthrough, and the XL
    default guidance scale (5.0, inherited by not passing one)."""
    import importlib.util

    from PIL import Image as PILImage

    from lmdx.methods import sdxl_refine

    spec_mod = importlib.util.spec_from_file_location(
        "ref_sdxl_refinement", "/root/reference/generation/sdxl_refinement.py")
    shim = os.path.join(REPO, "scripts", "_diffusers_shim")
    if shim not in sys.path:
        sys.path.insert(0, shim)
    ref = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(ref)
    assert sdxl_refine.SDXL_NEGATIVE_PROMPT == ref.sdxl_negative_prompt

    import inspect

    assert inspect.signature(
        sdxl_refine.img2img).parameters["guidance_scale"].default == 5.0

    captured = {}

    def fake_img2img(bundle, image, prompt, **kwargs):
        captured.update(kwargs, image=image, prompt=prompt)
        return image

    monkeypatch.setattr(sdxl_refine, "img2img", fake_img2img)

    class _B:  # bundle stand-in: refine only reads config.height
        class config:  # noqa: N801
            height = 64

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    spec = {"prompt": "p", "extra_neg_prompt": ""}
    sdxl_refine.refine(img, spec, refine_seed=11,
                       refinement_step_ratio=0.42, bundle=_B)

    expect = np.asarray(
        PILImage.fromarray(img).resize((64, 64), PILImage.LANCZOS))
    np.testing.assert_array_equal(captured["image"], expect)
    # Reference line 28: extra + ", " + style negative, even when empty.
    assert captured["negative_prompt"] == ", " + ref.sdxl_negative_prompt
    assert captured["strength"] == 0.42
    assert captured["seed"] == 11
    # guidance_scale is NOT overridden -> img2img's XL default 5.0
    # applies (asserted on the real signature above, pre-monkeypatch).
    assert "guidance_scale" not in captured

    spec2 = {"prompt": "p", "extra_neg_prompt": "cartoon"}
    sdxl_refine.refine(img, spec2, refine_seed=1, bundle=_B)
    assert captured["negative_prompt"] == "cartoon, " + ref.sdxl_negative_prompt
