"""The whole-batch device composition (methods/batch.py:_compose_batch_device)
must reproduce the per-image host composition (sampling/compose.py:
compose_latents, the reference latents.py:38-83 semantics) exactly:
largest-mask-first paste order, box-to-bg initial-noise copy, and 1-based
foreground indices with later (smaller) masks overwriting."""

import numpy as np

from lmdx.methods.batch import _compose_batch_device, _gather_ref_batched
from lmdx.sampling import compose as compose_lib


def _circle_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def test_compose_batch_matches_host_compose():
    rng = np.random.default_rng(0)
    h = w = 16
    c = 4
    s = 3  # num_compose_steps
    t_total = 6

    # image 0: two overlapping boxes (different sizes -> order matters);
    # image 1: one box; image 2: no boxes.
    masks = [
        _circle_mask(h, w, 5, 5, 4),
        _circle_mask(h, w, 7, 7, 2),
        _circle_mask(h, w, 9, 9, 5),
    ]
    image_box_idxs = [[0, 1], [2], []]
    n_flat = 3

    all_latents = rng.standard_normal(
        (t_total, n_flat, h, w, c)).astype(np.float32)
    bg = rng.standard_normal((3, h, w, c)).astype(np.float32)

    composed, fg = _compose_batch_device(
        all_latents, image_box_idxs, masks, bg, num_compose_steps=s)
    composed = np.asarray(composed)
    assert composed.shape == (s + 1, 3, h, w, c)
    assert fg.shape == (3, h, w)

    for gi, idxs in enumerate(image_box_idxs):
        traj_list = [all_latents[:, bi : bi + 1] for bi in idxs]
        want, want_fg = compose_lib.compose_latents(
            traj_list, [masks[bi] for bi in idxs], bg[gi : gi + 1],
            num_compose_steps=s)
        np.testing.assert_allclose(composed[:, gi], want[:, 0], atol=1e-6)
        np.testing.assert_array_equal(fg[gi], want_fg)


def test_gather_ref_batched_matches_per_image_slices():
    rng = np.random.default_rng(1)
    t, n_flat, heads, n = 4, 3, 2, 8
    keys = (("mid", 0, 0, 0), ("up", 1, 0, 0))
    taps = {k: rng.standard_normal((t, n_flat, heads, n, 1)).astype(np.float32)
            for k in keys}
    image_box_idxs = [[0, 1], [2], []]
    bx = 2

    out = _gather_ref_batched(taps, image_box_idxs, bx, keys)
    for k in keys:
        got = np.asarray(out[k])
        assert got.shape == (t, len(image_box_idxs), bx, heads, n)
        for gi, idxs in enumerate(image_box_idxs):
            want = np.zeros((t, bx, heads, n), np.float32)
            for j, bi in enumerate(idxs):
                want[:, j] = taps[k][:, bi, :, :, 0]
            np.testing.assert_allclose(got[:, gi], want, atol=0)
