import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.config import tiny_test
from lmdx.nn.attention import TapSpec
from lmdx.nn.clip import CLIPTextEncoder
from lmdx.nn.unet import PositionNet, UNet2DCondition, apply_unet
from lmdx.nn.vae import AutoencoderKL, to_uint8

CFG = tiny_test()


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet2DCondition(CFG.unet)
    latents = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, CFG.unet.cross_attention_dim))
    objs = jnp.zeros((2, CFG.unet.gligen_max_objs, CFG.unet.cross_attention_dim))
    params = unet.init(jax.random.key(0), latents, jnp.array(1), ctx, objs=objs)["params"]
    return unet, params


def test_unet_forward_shape(unet_and_params):
    unet, params = unet_and_params
    latents = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 77, CFG.unet.cross_attention_dim))
    objs = jnp.zeros((2, CFG.unet.gligen_max_objs, CFG.unet.cross_attention_dim))
    eps, taps = apply_unet(unet, params, latents, jnp.array(10), ctx, objs=objs)
    assert eps.shape == (2, 8, 8, 4)
    assert taps == {}
    assert jnp.isfinite(eps).all()


def test_unet_taps_export(unet_and_params):
    unet, params = unet_and_params
    latents = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 77, CFG.unet.cross_attention_dim))
    objs = jnp.zeros((2, CFG.unet.gligen_max_objs, CFG.unet.cross_attention_dim))
    keys = (("down", 0, 0, 0), ("mid", 0, 0, 0), ("up", 1, 0, 0))
    eps, taps = apply_unet(
        unet, params, latents, jnp.array(10), ctx, objs=objs, taps=TapSpec(keys=keys)
    )
    assert set(taps.keys()) == set(keys)
    down = taps[("down", 0, 0, 0)]
    # tiny config: level 0 is 8x8 with 2 heads; probs over 77 text tokens
    assert down.shape == (2, 2, 64, 77)
    np.testing.assert_allclose(np.asarray(down.sum(-1)), 1.0, atol=1e-4)
    # mid block runs at 4x4
    assert taps[("mid", 0, 0, 0)].shape == (2, 2, 16, 77)


def test_unet_taps_cond_only_single_token(unet_and_params):
    unet, params = unet_and_params
    latents = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 77, CFG.unet.cross_attention_dim))
    keys = (("down", 0, 0, 0),)
    _, taps = apply_unet(
        unet, params, latents, jnp.array(10), ctx,
        taps=TapSpec(keys=keys, cond_only=True, single_token=True),
        tap_token_index=jnp.array(5),
    )
    assert taps[("down", 0, 0, 0)].shape == (1, 2, 64, 1)


@pytest.mark.slow
def test_unet_grad_through_taps(unet_and_params):
    """The guidance pattern: grad of a loss on tapped attention probs w.r.t.
    the input latents must be nonzero and finite."""
    unet, params = unet_and_params
    ctx = jax.random.normal(jax.random.key(2), (1, 77, CFG.unet.cross_attention_dim))
    keys = (("mid", 0, 0, 0),)

    def loss_fn(latents):
        _, taps = apply_unet(
            unet, params, latents, jnp.array(10), ctx,
            taps=TapSpec(keys=keys, fused=False),
        )
        probs = taps[keys[0]]
        return (probs[..., :8] ** 2).sum()

    latents = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    grad = jax.grad(loss_fn)(latents)
    assert jnp.isfinite(grad).all()
    assert jnp.abs(grad).max() > 0


@pytest.mark.slow
def test_unet_fuser_gate_toggles_gligen(unet_and_params):
    unet, params = unet_and_params
    latents = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 77, CFG.unet.cross_attention_dim))
    objs = jax.random.normal(
        jax.random.key(4), (1, CFG.unet.gligen_max_objs, CFG.unet.cross_attention_dim)
    )
    eps_on, _ = apply_unet(unet, params, latents, jnp.array(10), ctx, objs=objs,
                           fuser_gate=1.0)
    eps_off, _ = apply_unet(unet, params, latents, jnp.array(10), ctx, objs=objs,
                            fuser_gate=0.0)
    eps_none, _ = apply_unet(unet, params, latents, jnp.array(10), ctx, objs=None)
    # freshly initialized alphas are 0 -> tanh gate 0 -> all equal; perturb alpha
    np.testing.assert_allclose(np.asarray(eps_off), np.asarray(eps_none), atol=1e-5)

    bumped = jax.tree_util.tree_map(lambda x: x, params)
    # set every fuser alpha_attn to 1 to make the gate active
    def bump(d):
        for k, v in d.items():
            if isinstance(v, dict):
                bump(v)
            elif k == "alpha_attn":
                d[k] = jnp.ones_like(v)
    import flax

    bumped = flax.core.unfreeze(bumped)
    bump(bumped)
    eps_on2, _ = apply_unet(unet, bumped, latents, jnp.array(10), ctx, objs=objs,
                            fuser_gate=1.0)
    eps_off2, _ = apply_unet(unet, bumped, latents, jnp.array(10), ctx, objs=objs,
                             fuser_gate=0.0)
    assert np.abs(np.asarray(eps_on2) - np.asarray(eps_off2)).max() > 1e-6


def test_position_net_masks_select_null_embedding():
    net = PositionNet(positive_len=32, out_dim=32)
    boxes = jnp.zeros((1, 4, 4))
    masks = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    phrase = jax.random.normal(jax.random.key(0), (1, 4, 32))
    params = net.init(jax.random.key(1), boxes, masks, phrase)["params"]
    objs = net.apply({"params": params}, boxes, masks, phrase)
    assert objs.shape == (1, 4, 32)
    # masked-out entries all map to the same (null-feature) embedding
    np.testing.assert_allclose(np.asarray(objs[0, 1]), np.asarray(objs[0, 2]), atol=1e-6)


def test_clip_text_encoder_shapes():
    cfg = CFG.clip
    enc = CLIPTextEncoder(cfg)
    ids = jnp.array([[3, 7, 9, 2] + [0] * 73], dtype=jnp.int32)
    params = enc.init(jax.random.key(0), ids, eos_token_id=9)["params"]
    hidden, pooled = enc.apply({"params": params}, ids, eos_token_id=9)
    assert hidden.shape == (1, 77, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)
    # pooled output is the hidden state at the EOS position (index 2)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(hidden[0, 2]), atol=1e-6)


def test_clip_causal_mask():
    """Changing a later token must not affect earlier hidden states."""
    cfg = CFG.clip
    enc = CLIPTextEncoder(cfg)
    ids1 = jnp.array([[3, 7, 9, 2, 5]], dtype=jnp.int32)
    ids2 = jnp.array([[3, 7, 9, 2, 8]], dtype=jnp.int32)
    params = enc.init(jax.random.key(0), ids1, eos_token_id=9)["params"]
    h1, _ = enc.apply({"params": params}, ids1, eos_token_id=9)
    h2, _ = enc.apply({"params": params}, ids2, eos_token_id=9)
    np.testing.assert_allclose(np.asarray(h1[0, :4]), np.asarray(h2[0, :4]), atol=1e-5)
    assert np.abs(np.asarray(h1[0, 4]) - np.asarray(h2[0, 4])).max() > 1e-6


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(CFG.vae)
    images = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    params = vae.init(jax.random.key(1), images)["params"]
    z = vae.apply({"params": params}, images, method=vae.encode)
    # two downsampling stages in the tiny config -> 8x
    assert z.shape == (1, 16, 16, 4)
    out = vae.apply({"params": params}, z, method=vae.decode)
    assert out.shape == (1, 32, 32, 3)
    img8 = to_uint8(out)
    assert img8.dtype == jnp.uint8


def test_flash_attention_kernel_matches_xla():
    from lmdx.nn.pallas.flash_attention import _xla_attention, flash_attention_interpret

    q = jax.random.normal(jax.random.key(0), (1, 2, 128, 32))
    k = jax.random.normal(jax.random.key(1), (1, 2, 77, 32))
    v = jax.random.normal(jax.random.key(2), (1, 2, 77, 32))
    ref = _xla_attention(q, k, v)
    out = flash_attention_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # self-attention shape, multiple q blocks
    q2 = jax.random.normal(jax.random.key(3), (1, 2, 256, 32))
    ref2 = _xla_attention(q2, q2, q2)
    out2 = flash_attention_interpret(q2, q2, q2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-5)


@pytest.mark.slow
def test_stop_after_taps_matches_full_forward():
    """Early-exit guidance forwards must produce identical tap maps."""
    import numpy as np

    from lmdx import config as cfglib
    from lmdx.nn.attention import TapSpec
    from lmdx.nn.unet import UNet2DCondition, apply_unet

    cfg = cfglib.tiny_test()
    unet = UNet2DCondition(cfg.unet, dtype=jnp.float32)
    h = cfg.latent_height
    x = jax.random.normal(jax.random.key(0), (1, h, h, 4))
    t = jnp.asarray([500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (1, 77, cfg.unet.cross_attention_dim)) * 0.02
    params = unet.init(jax.random.key(2), x, t, ctx)["params"]

    taps = TapSpec(keys=(("down", 0, 0, 0), ("mid", 0, 0, 0)), fused=False)
    eps_full, taps_full = apply_unet(unet, params, x, t, ctx, taps=taps)
    eps_none, taps_fast = apply_unet(unet, params, x, t, ctx, taps=taps,
                                     stop_after_taps=True)
    assert eps_none is None
    assert eps_full is not None
    for k in taps_full:
        np.testing.assert_allclose(np.asarray(taps_full[k]),
                                   np.asarray(taps_fast[k]), atol=1e-6)


@pytest.mark.slow
def test_load_bundle_dtype_override():
    """--use_autocast 0 parity knob: load_bundle(dtype="float32") must build
    f32-compute modules (the reference's no-autocast training-free-LMD
    precision, lmd.py:254), while the default stays bf16 (the TPU
    equivalent of autocast fp16, lmd_plus.py:227)."""
    import jax.numpy as jnp

    from lmdx.runtime.models import load_bundle

    b32 = load_bundle("tiny-test", seed=0, dtype="float32")
    assert b32.config.dtype == "float32"
    assert b32.unet.dtype == jnp.float32
    # f32 mode must NOT bf16-cast the stored params.
    leaf = jax.tree_util.tree_leaves(b32.params["unet"])[0]
    assert leaf.dtype == jnp.float32

    # tiny-test defaults to f32 for CPU testing; the override must also
    # switch it the other way (the production configs default to bf16).
    b16 = load_bundle("tiny-test", seed=0, dtype="bfloat16")
    assert b16.config.dtype == "bfloat16"
    assert b16.unet.dtype == jnp.bfloat16
    from lmdx.config import SD_CONFIGS

    assert SD_CONFIGS["gligen/diffusers-generation-text-box"]().dtype == "bfloat16"
