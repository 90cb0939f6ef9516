import jax
import jax.numpy as jnp
import numpy as np

from lmdx.sampling import guidance as G


def test_topk_mean_matches_numpy():
    x = jax.random.uniform(jax.random.key(0), (3, 50))
    for k in (1, 5, 50):
        got = G._topk_mean(x, jnp.full((3,), k, jnp.int32))
        want = np.sort(np.asarray(x), axis=-1)[:, ::-1][:, :k].mean(-1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_key_resolution():
    # SD1.5 geometry: 64x64 latent, 4 levels
    assert G.key_resolution(("down", 0, 0, 0), (64, 64), 4) == (64, 64)
    assert G.key_resolution(("down", 2, 1, 0), (64, 64), 4) == (16, 16)
    assert G.key_resolution(("mid", 0, 0, 0), (64, 64), 4) == (8, 8)
    assert G.key_resolution(("up", 1, 0, 0), (64, 64), 4) == (16, 16)
    assert G.key_resolution(("up", 3, 2, 0), (64, 64), 4) == (64, 64)


SPEC = G.GuidanceSpec(
    keys=(("mid", 0, 0, 0),),
    loss_scale=5.0,
    loss_threshold=0.0,
    max_index_step=10,
    fg_weight=1.0,
    bg_weight=1.0,
)


def _data_one_box():
    # one object in the left half of an 8x8 latent -> mid map is 4x4
    return G.make_guidance_data(
        bboxes=[(0.0, 0.0, 0.5, 1.0)],
        object_positions=[[2, 3]],
        spec=SPEC,
        latent_hw=(8, 8),
        num_levels=2,
        max_objs=4,
        max_positions=4,
    )


def test_make_guidance_data_shapes():
    data = _data_one_box()
    key = ("mid", 0, 0, 0)
    assert data["masks"][key].shape == (4, 16)
    assert float(data["masks"][key][0].sum()) == 8  # left half of 4x4
    assert int(data["kfg"][key][0]) == max(int(8 * 0.2), 1)
    assert int(data["kbg"][key][0]) == max(int(8 * 0.2), 1)
    assert float(data["num_objects"]) == 1.0
    np.testing.assert_array_equal(np.asarray(data["positions"][0]), [2, 3, 0, 0])
    np.testing.assert_array_equal(np.asarray(data["pos_valid"][0]), [1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(data["obj_valid"]), [1, 0, 0, 0])


def _taps_with_attention_at(cols_on, n=16, L=8, heads=2):
    """Attention probs concentrated on spatial cells `cols_on` for all tokens."""
    attn = np.full((1, heads, n, L), 1e-6, np.float32)
    attn[:, :, cols_on, :] = 1.0
    return {("mid", 0, 0, 0): jnp.asarray(attn)}


def test_ca_loss_prefers_attention_inside_box():
    data = _data_one_box()
    mask = np.asarray(data["masks"][("mid", 0, 0, 0)][0]).reshape(4, 4)
    inside = np.where(mask.reshape(-1) > 0)[0]
    outside = np.where(mask.reshape(-1) == 0)[0]
    loss_inside = G.ca_loss(_taps_with_attention_at(inside), data, SPEC)
    loss_outside = G.ca_loss(_taps_with_attention_at(outside), data, SPEC)
    assert float(loss_inside) < float(loss_outside)
    # fully-correct attention: fg term ~0, bg term ~0
    assert float(loss_inside) < 0.1


def test_ca_loss_ref_transfer():
    spec = G.GuidanceSpec(
        keys=(("mid", 0, 0, 0),), use_ref_ca=True, ref_ca_loss_weight=2.0,
        loss_scale=5.0,
    )
    data = G.make_guidance_data(
        bboxes=[(0.0, 0.0, 0.5, 1.0)],
        object_positions=[[2, 3]],
        spec=spec,
        latent_hw=(8, 8),
        num_levels=2,
        word_token_indices=[3],
        ref_box_to_obj=[0],
        max_objs=4,
        max_positions=4,
    )
    assert data["ref_masks"][("mid", 0, 0, 0)].shape == (1, 16)
    taps = _taps_with_attention_at([0, 1], heads=2)
    # reference taps identical to target's word-token column -> ref loss ~ 0
    ref_same = {("mid", 0, 0, 0): taps[("mid", 0, 0, 0)][:, :, :, 3].reshape(1, 2, 16)}
    l_same = G.ca_loss(taps, data, spec, ref_taps=ref_same)
    shifted = np.zeros((1, 2, 16), np.float32)
    shifted[:, :, 4:6] = 1.0
    l_diff = G.ca_loss(taps, data, spec, ref_taps={("mid", 0, 0, 0): jnp.asarray(shifted)})
    assert float(l_diff) > float(l_same)


def test_guidance_update_reduces_loss_and_respects_max_iter():
    # top_p=1.0 makes the top-k regions cover the whole box/background, so the
    # toy objective is smooth and plain descent must reduce it.
    spec = G.GuidanceSpec(keys=SPEC.keys, loss_scale=5.0, loss_threshold=0.0,
                          fg_top_p=1.0, bg_top_p=1.0)
    data = G.make_guidance_data(
        bboxes=[(0.0, 0.0, 0.5, 1.0)], object_positions=[[2, 3]], spec=spec,
        latent_hw=(8, 8), num_levels=2, max_objs=4, max_positions=4,
    )
    key = ("mid", 0, 0, 0)
    mask = data["masks"][key][0]

    def unet_taps(lat):
        # toy "unet": spatial attention logits are the latents themselves
        probs = jax.nn.softmax(lat.reshape(1, 1, 16, 1), axis=2)
        return {key: jnp.broadcast_to(probs, (1, 2, 16, 8))}

    lat0 = jnp.zeros((16,)) - mask * 1.0 + (1 - mask) * 1.0  # mass outside box

    def loss_of(lat):
        return float(G.ca_loss(unet_taps(lat), data, spec)) * spec.loss_scale

    lat1, loss1 = G.guidance_update(
        unet_taps, lat0, jnp.float32(1e4), step_size=jnp.float32(0.5),
        max_iter=jnp.int32(10), data=data, spec=spec,
    )
    assert loss_of(lat1) < loss_of(lat0)

    lat_none, _ = G.guidance_update(
        unet_taps, lat0, jnp.float32(1e4), step_size=jnp.float32(0.5),
        max_iter=jnp.int32(0), data=data, spec=spec,
    )
    np.testing.assert_array_equal(np.asarray(lat_none), np.asarray(lat0))

    # threshold stops the loop: with a huge threshold, one check suffices
    spec_hi = G.GuidanceSpec(keys=SPEC.keys, loss_scale=5.0, loss_threshold=1e9,
                             fg_top_p=1.0, bg_top_p=1.0)
    lat_stop, _ = G.guidance_update(
        unet_taps, lat0, jnp.float32(1.0), step_size=jnp.float32(1.0),
        max_iter=jnp.int32(5), data=data, spec=spec_hi,
    )
    np.testing.assert_array_equal(np.asarray(lat_stop), np.asarray(lat0))


def test_aggregate_token_attention_clamps_start_step():
    """start_step >= T must fall back to the final step instead of averaging
    zero steps into NaNs (short truncated/test schedules)."""
    from lmdx.sampling import compose as compose_lib

    taps = np.random.RandomState(0).rand(4, 1, 2, 16, 1)
    out = compose_lib.aggregate_token_attention(taps, start_step=10)
    assert not np.isnan(out).any()
    expected = taps[3, 0, :, :, 0].mean(axis=0).reshape(4, 4)
    np.testing.assert_allclose(out, expected, rtol=1e-6)
