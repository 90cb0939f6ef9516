import jax.numpy as jnp
import numpy as np
import pytest

from lmdx.core import schedule as sched


def test_ddim_timestep_grid():
    ts = sched.ddim_timestep_grid(50)
    assert len(ts) == 50
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)


def test_alphas_cumprod_sd_values():
    ac = sched.make_alphas_cumprod()
    assert ac.shape == (1000,)
    # endpoint values of the SD scaled-linear schedule
    assert ac[0] == pytest.approx(1 - 0.00085, abs=1e-5)
    assert 0.0 < ac[-1] < 0.01
    assert np.all(np.diff(ac) < 0)


def test_fast_schedule_truncation():
    ts = sched.ddim_timestep_grid(50)
    fast = sched.fast_schedule_timesteps(ts, fast_after_steps=25, fast_rate=2)
    np.testing.assert_array_equal(fast[:25], ts[:25])
    np.testing.assert_array_equal(fast[25:], ts[26::2])
    # no-op when fast_after_steps covers the whole grid
    np.testing.assert_array_equal(sched.fast_schedule_timesteps(ts, 49, 2), ts)


def test_schedule_prev_timesteps():
    s = sched.make_schedule(50)
    np.testing.assert_array_equal(np.asarray(s.timesteps[1:]), np.asarray(s.prev_timesteps[:-1]))
    assert int(s.prev_timesteps[-1]) == 1 - 20  # steps past zero -> final alpha

    s_fast = sched.make_schedule(50, fast_after_steps=25, fast_rate=2)
    # the fast tail has gap 40; prev always equals the actual next grid point
    gaps = np.asarray(s_fast.timesteps[:-1]) - np.asarray(s_fast.prev_timesteps[:-1])
    assert set(gaps[:24]) == {20}
    assert set(gaps[26:]) == {40}


def test_ddim_step_matches_closed_form():
    s = sched.make_schedule(50)
    x = jnp.ones((1, 4, 4, 4))
    eps = jnp.full((1, 4, 4, 4), 0.5)
    t, prev_t = s.timesteps[0], s.prev_timesteps[0]
    out = sched.ddim_step(s, eps, t, prev_t, x)

    a_t = float(s.alphas_cumprod[int(t)])
    a_p = float(s.alphas_cumprod[int(prev_t)])
    x0 = (1.0 - np.sqrt(1 - a_t) * 0.5) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * 0.5
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_ddim_final_step_uses_final_alpha():
    s = sched.make_schedule(50)
    x = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros((1, 2, 2, 4))
    out = sched.ddim_step(s, eps, s.timesteps[-1], s.prev_timesteps[-1], x)
    a_t = float(s.alphas_cumprod[1])
    expected = np.sqrt(float(s.final_alpha_cumprod)) / np.sqrt(a_t)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_add_noise_and_inverse_roundtrip():
    s = sched.make_schedule(50)
    x0 = jnp.ones((1, 2, 2, 4)) * 0.3
    noise = jnp.ones((1, 2, 2, 4))
    t = jnp.array(501)
    xt = sched.add_noise(s, x0, noise, t)
    a = float(s.alphas_cumprod[501])
    np.testing.assert_allclose(
        np.asarray(xt), np.sqrt(a) * 0.3 + np.sqrt(1 - a), rtol=1e-5
    )
    # inverse of ddim_step with the same eps recovers the sample
    prev = jnp.array(481)
    down = sched.ddim_step(s, noise, t, prev, xt)
    up = sched.ddim_inverse_step(s, noise, prev, t, down)
    np.testing.assert_allclose(np.asarray(up), np.asarray(xt), rtol=1e-4)


def test_guidance_step_size():
    s = sched.make_schedule(50)
    g = sched.guidance_step_size(s, jnp.array(981))
    assert float(g) == pytest.approx(np.sqrt(1 - float(s.alphas_cumprod[981])), rel=1e-6)


def test_dpmpp_2m_noise_free_invariant():
    """With eps=0 and sample = alpha_t * c, DPM-Solver++ must land exactly on
    alpha_s * c (the noise-free trajectory) in both first- and second-order
    modes."""
    import jax.numpy as jnp

    schedule = sched.make_schedule(10)
    c = jnp.full((1, 4, 4, 4), 1.7, jnp.float32)
    t = schedule.timesteps[2]
    next_t = schedule.prev_timesteps[2]
    prev_t = schedule.timesteps[1]

    def alpha(tt):
        return jnp.sqrt(schedule.alphas_cumprod[tt])

    sample = alpha(t) * c
    eps = jnp.zeros_like(sample)

    # First order (no history).
    out1, x0 = sched.dpmpp_2m_step(schedule, eps, t, next_t, sample,
                                   jnp.zeros_like(sample), jnp.int32(-1000))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(c), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(alpha(next_t) * c),
                               rtol=1e-4)

    # Second order with consistent history (prev x0 == c).
    out2, _ = sched.dpmpp_2m_step(schedule, eps, t, next_t, sample, c, prev_t)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(alpha(next_t) * c),
                               rtol=1e-4)


@pytest.mark.slow
def test_dpmpp_2m_end_to_end_sampling():
    """Sampling with the dpmpp_2m solver runs and differs from ddim."""
    import jax
    import jax.numpy as jnp

    from lmdx import config as cfglib
    from lmdx.nn.unet import UNet2DCondition
    from lmdx.sampling.loop import sample

    cfg = cfglib.tiny_test()
    unet = UNet2DCondition(cfg.unet, dtype=jnp.float32)
    h = cfg.latent_height
    lat = jax.random.normal(jax.random.key(0), (1, h, h, 4))
    te = jax.random.normal(jax.random.key(1), (2, 77, cfg.unet.cross_attention_dim)) * 0.02
    params = unet.init(jax.random.key(2), lat, jnp.zeros((1,), jnp.int32),
                       te[:1])["params"]

    out_ddim = sample(unet, params, sched.make_schedule(8), lat, te)
    out_dpm = sample(unet, params, sched.make_schedule(8), lat, te,
                     solver="dpmpp_2m")
    a, b = np.asarray(out_ddim.latents), np.asarray(out_dpm.latents)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_guidance_step_size_solver_dependence():
    """Reference parity: under DPMSolverMultistep the guidance latent update
    is scaled by scheduler.sigmas[i]**2 = (1-acp)/acp (reference
    models/pipelines.py:60-63); under DDIM by sqrt(1-acp) (:64-69)."""
    s = sched.make_schedule(50)
    for t in (s.timesteps[0], s.timesteps[25], s.timesteps[-1]):
        acp = float(s.alphas_cumprod[int(t)])
        ddim = float(sched.guidance_step_size(s, t))
        dpm = float(sched.guidance_step_size(s, t, solver="dpmpp_2m"))
        np.testing.assert_allclose(ddim, (1 - acp) ** 0.5, rtol=1e-6)
        np.testing.assert_allclose(dpm, (1 - acp) / acp, rtol=1e-6)
    # At high noise (t=981, acp≈0.0047) sigma^2 is ~200x the ddim factor —
    # the two conventions are materially different, not a cosmetic switch.
    t0 = s.timesteps[0]
    assert float(sched.guidance_step_size(s, t0, solver="dpmpp_2m")) > (
        50 * float(sched.guidance_step_size(s, t0)))
