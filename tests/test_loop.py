import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.config import tiny_test
from lmdx.core import schedule as sched
from lmdx.nn.unet import UNet2DCondition
from lmdx.sampling import guidance as G
from lmdx.sampling.loop import sample

CFG = tiny_test()
KEY = ("mid", 0, 0, 0)


@pytest.fixture(scope="module")
def setup():
    unet = UNet2DCondition(CFG.unet)
    latents = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, CFG.unet.cross_attention_dim))
    objs = jnp.zeros((1, CFG.unet.gligen_max_objs, CFG.unet.cross_attention_dim))
    params = unet.init(jax.random.key(0), latents, jnp.array(1), ctx, objs=objs)["params"]
    text_emb = jax.random.normal(jax.random.key(1), (2, 77, CFG.unet.cross_attention_dim))
    lat0 = jax.random.normal(jax.random.key(2), (1, 8, 8, 4))
    schedule = sched.make_schedule(4)
    return unet, params, schedule, lat0, text_emb


def test_plain_cfg_sampling(setup):
    unet, params, schedule, lat0, text_emb = setup
    out = sample(unet, params, schedule, lat0, text_emb, save_all_latents=True)
    assert out.latents.shape == (1, 8, 8, 4)
    assert out.all_latents.shape == (5, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(out.all_latents[0]), np.asarray(lat0))
    np.testing.assert_array_equal(np.asarray(out.all_latents[-1]), np.asarray(out.latents))
    # deterministic
    out2 = sample(unet, params, schedule, lat0, text_emb)
    np.testing.assert_array_equal(np.asarray(out.latents), np.asarray(out2.latents))


def test_frozen_mask_pins_latents(setup):
    unet, params, schedule, lat0, text_emb = setup
    traj = jax.random.normal(jax.random.key(3), (5, 1, 8, 8, 4))
    mask = np.zeros((8, 8), np.float32)
    mask[:, :4] = 1.0
    out = sample(
        unet, params, schedule, lat0, text_emb,
        frozen_mask=jnp.asarray(mask), frozen_latents=traj, num_frozen_steps=2,
        save_all_latents=True,
    )
    # during frozen steps the masked region follows the input trajectory
    got1 = np.asarray(out.all_latents[1])[:, :, :4]
    np.testing.assert_allclose(got1, np.asarray(traj[1])[:, :, :4], atol=1e-6)
    got2 = np.asarray(out.all_latents[2])[:, :, :4]
    np.testing.assert_allclose(got2, np.asarray(traj[2])[:, :, :4], atol=1e-6)
    # after frozen_steps the region evolves freely
    got3 = np.asarray(out.all_latents[3])[:, :, :4]
    assert np.abs(got3 - np.asarray(traj[3])[:, :, :4]).max() > 1e-6
    # unmasked region never follows the trajectory
    assert np.abs(np.asarray(out.all_latents[1])[:, :, 4:] - np.asarray(traj[1])[:, :, 4:]).max() > 1e-6


@pytest.mark.slow
def test_saved_taps_shapes(setup):
    unet, params, schedule, lat0, text_emb = setup
    out = sample(
        unet, params, schedule, lat0, text_emb,
        save_keys=(KEY,), save_cond_only=True, save_single_token=True,
        tap_token_index=3,
    )
    taps = out.saved_taps[KEY]
    # (T, cond batch 1, heads 2, mid 4x4=16 cells, 1 token)
    assert taps.shape == (4, 1, 2, 16, 1)


@pytest.mark.slow
def test_gligen_fuser_segments(setup):
    unet, params, schedule, lat0, text_emb = setup
    M = CFG.unet.gligen_max_objs
    D = CFG.unet.cross_attention_dim
    objs = jax.random.normal(jax.random.key(5), (2, M, D))
    objs_null = jnp.zeros((1, M, D))
    out_g = sample(unet, params, schedule, lat0, text_emb,
                   gligen=(objs, objs_null), num_fuser_steps=2)
    out_p = sample(unet, params, schedule, lat0, text_emb)
    assert out_g.latents.shape == (1, 8, 8, 4)
    # grounding tokens are freshly-initialized (alpha=0 gates) -> same output;
    # shapes & segmentation are what we exercise here
    assert jnp.isfinite(out_g.latents).all()
    np.testing.assert_allclose(np.asarray(out_g.latents), np.asarray(out_p.latents),
                               atol=1e-5)


@pytest.mark.slow
def test_guidance_in_loop(setup):
    unet, params, schedule, lat0, text_emb = setup
    cond_emb = text_emb[1:]
    spec = G.GuidanceSpec(
        keys=(KEY,), loss_scale=5.0, loss_threshold=0.0, max_index_step=2,
        fg_top_p=1.0, bg_top_p=1.0,
    )
    data = G.make_guidance_data(
        bboxes=[(0.0, 0.0, 0.5, 1.0)], object_positions=[[2, 3]], spec=spec,
        latent_hw=(8, 8), num_levels=2, max_objs=4, max_positions=4,
    )
    out = sample(
        unet, params, schedule, lat0, text_emb, cond_embeddings=cond_emb,
        spec=spec, guidance_data=data, max_iter=[2, 1],
    )
    assert jnp.isfinite(out.latents).all()
    # guidance ran: final loss was updated away from the 1e4 sentinel
    assert float(out.final_loss) < 1e4
    # and the result differs from the unguided run
    out_plain = sample(unet, params, schedule, lat0, text_emb)
    assert np.abs(np.asarray(out.latents) - np.asarray(out_plain.latents)).max() > 1e-7
