"""Visualization artifacts: box layouts, masks, indexed image saving.

Parity with the reference's artifact-as-log behavior (utils/vis.py:223-243,
utils/parse.py:228-302): layout renderings (`boxes.png`), mask grids, and
`img_{i}.png` savers under the run directory — implemented with PIL (no
matplotlib dependency on the generation path).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw

_PALETTE = [(228, 26, 28), (55, 126, 184), (77, 175, 74), (152, 78, 163),
            (255, 127, 0), (255, 255, 51), (166, 86, 40), (247, 129, 191)]


def draw_boxes(gen_boxes, size: int = 512, bg_prompt: str = "",
               neg_prompt: str = "") -> Image.Image:
    """Render a layout: one colored rectangle + caption per box."""
    img = Image.new("RGB", (size, size), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    for i, box in enumerate(gen_boxes):
        if isinstance(box, dict):
            name, (x, y, w, h) = box["name"], box["bounding_box"]
        else:
            name, (x, y, w, h) = box
        color = _PALETTE[i % len(_PALETTE)]
        draw.rectangle([x, y, x + w, y + h], outline=color, width=3)
        draw.text((x + 4, y + 4), str(name), fill=color)
    footer = bg_prompt + (f" | neg: {neg_prompt}" if neg_prompt else "")
    if footer:
        draw.text((4, size - 14), footer[:100], fill=(0, 0, 0))
    return img


def annotate_image(image: np.ndarray, boxes_xyxy_norm, names=None) -> Image.Image:
    """Draw normalized xyxy boxes over a generated image (utils.py:8-17)."""
    img = Image.fromarray(np.asarray(image)).convert("RGB")
    w, h = img.size
    draw = ImageDraw.Draw(img)
    for i, box in enumerate(boxes_xyxy_norm):
        x0, y0, x1, y1 = box
        color = _PALETTE[i % len(_PALETTE)]
        draw.rectangle([x0 * w, y0 * h, x1 * w, y1 * h], outline=color, width=2)
        if names is not None:
            draw.text((x0 * w + 2, y0 * h + 2), str(names[i]), fill=color)
    return img


def mask_grid(masks, cell: int = 128) -> Image.Image:
    """Tile binary masks into one grid image for inspection."""
    masks = [np.asarray(m) for m in masks]
    n = max(len(masks), 1)
    img = Image.new("L", (cell * n, cell), 0)
    for i, m in enumerate(masks):
        tile = Image.fromarray((m * 255).astype(np.uint8)).resize(
            (cell, cell), Image.NEAREST)
        img.paste(tile, (i * cell, 0))
    return img


class RunSaver:
    """Indexed artifact writer for one prompt's output directory
    (vis.display parity, utils/vis.py:223-243)."""

    def __init__(self, img_dir: str):
        self.img_dir = img_dir
        os.makedirs(img_dir, exist_ok=True)
        self._save_ind = 0

    def save(self, image, name: str = "img", index: int | None = None,
             indexed: bool = True) -> str:
        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        if index is None and indexed:
            index = self._save_ind
            self._save_ind += 1
        suffix = f"_{index}" if index is not None else ""
        path = os.path.join(self.img_dir, f"{name}{suffix}.png")
        image.save(path)
        return path
