import numpy as np
import pytest

from lmdx.core import boxes as boxlib


def test_convert_box_xywh_to_xyxy_norm():
    assert boxlib.convert_box_xywh_to_xyxy_norm((128, 64, 256, 128), 512, 512) == (
        0.25, 0.125, 0.75, 0.375,
    )


def test_scale_proportion_shift_invariant_size():
    # Rounding the size separately keeps the rasterized box size constant
    # when the box shifts by a subpixel amount.
    H = W = 64
    box_a = (0.1, 0.1, 0.3, 0.3)
    shift = 1.5 / 64
    box_b = (0.1 + shift, 0.1, 0.3 + shift, 0.3)
    xa0, ya0, xa1, ya1 = boxlib.scale_proportion(box_a, H, W)
    xb0, yb0, xb1, yb1 = boxlib.scale_proportion(box_b, H, W)
    assert (xa1 - xa0) == (xb1 - xb0)
    assert (ya1 - ya0) == (yb1 - yb0)


def test_box_to_mask_area():
    mask = boxlib.box_to_mask((0.25, 0.25, 0.75, 0.75), 64, 64)
    assert mask.shape == (64, 64)
    assert mask.sum() == 32 * 32
    assert mask[32, 32] == 1.0 and mask[0, 0] == 0.0


def test_get_centered_box_horizontal():
    out = boxlib.get_centered_box((0.0, 0.2, 0.4, 0.6))
    assert out == pytest.approx([0.3, 0.2, 0.7, 0.6])


def test_get_centered_box_floor_padding():
    out = boxlib.get_centered_box(
        (0.0, 0.0, 0.4, 0.3),
        horizontal_center_only=False,
        vertical_placement="floor_padding",
        floor_padding=0.2,
    )
    assert out == pytest.approx([0.3, 0.5, 0.7, 0.8])


def test_mask_to_box_and_box_mask():
    mask = np.zeros((16, 16))
    mask[4:8, 2:6] = 1
    assert boxlib.mask_to_box(mask) == [1, 3, 6, 8]  # enlarged by one
    box_mask = boxlib.mask_to_box_mask(mask)
    assert box_mask[3:9, 1:7].all()
    assert box_mask.sum() == 6 * 6


def test_mask_center():
    mask = np.zeros((10, 10))
    mask[2:4, 6:8] = 1
    x, y = boxlib.mask_center(mask)
    assert (x, y) == (6.5, 2.5)
    xn, yn = boxlib.mask_center(mask, normalize=True)
    assert (xn, yn) == (0.65, 0.25)


def test_mask_iou():
    a = np.zeros((8, 8))
    a[:4] = 1
    b = np.zeros((2, 8, 8))
    b[0, :4] = 1
    b[1, 2:6] = 1
    iou = boxlib.mask_iou(a, b)
    assert iou[0] == pytest.approx(1.0, abs=1e-4)
    assert iou[1] == pytest.approx(16 / 48, abs=1e-4)


def test_shift_tensor_pixels():
    t = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = boxlib.shift_tensor(t, 1, 0)
    assert out[0, 0] == 0
    np.testing.assert_array_equal(out[:, 1:], t[:, :-1])


def test_shift_tensor_normalized_alignment():
    # The same normalized offset must shift 64x64 and 16x16 tensors by the
    # same physical fraction (whole texels of the 8x8 base grid).
    t64 = np.zeros((64, 64))
    t64[:, 0] = 1
    t16 = np.zeros((16, 16))
    t16[:, 0] = 1
    off = 0.25  # 2 base texels
    out64 = boxlib.shift_tensor(t64, off, 0.0, offset_normalized=True)
    out16 = boxlib.shift_tensor(t16, off, 0.0, offset_normalized=True)
    assert out64[:, 16].all() and out64[:, :16].sum() == 0
    assert out16[:, 4].all() and out16[:, :4].sum() == 0


def test_shift_tensor_ignore_last_dim():
    t = np.zeros((2, 4, 4, 3))
    t[:, 0, 0, :] = 1
    out = boxlib.shift_tensor(t, 1, 1, ignore_last_dim=True)
    assert out[:, 1, 1, :].all()
    assert out[:, 0, 0, :].sum() == 0


def test_expand_overall_bboxes():
    assert boxlib.expand_overall_bboxes([[1, 2], [3]]) == [1, 2, 3]


def test_box_iou_xyxy():
    assert boxlib.box_iou_xyxy((0, 0, 2, 2), (1, 1, 3, 3)) == pytest.approx(1 / 7)
    assert boxlib.box_iou_xyxy((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0


def test_mask_center_empty_mask_no_nan():
    """Degenerate all-zero masks return the geometric center, not NaN
    (guards trajectory alignment against empty segmentations)."""
    x, y = boxlib.mask_center(np.zeros((8, 8)), normalize=True)
    assert (x, y) == (0.5, 0.5)
    x, y = boxlib.mask_center(np.zeros((8, 8)))
    assert (x, y) == (3.5, 3.5)
