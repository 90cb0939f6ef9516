"""Stage-2 (image) evaluation with an open-vocabulary detector.

Protocol parity with the reference (scripts/owl_vit_eval.py, utils/eval/
eval.py:120-174): per benchmark prompt, detect the prompt-derived query texts
in the generated image, keep detections above the score threshold, apply
(class-aware) NMS, convert boxes to the layout format, and score with the
task predicate.

The detector is pluggable: `FlaxOwlViTDetector` (lmdx/nn/owlvit.py, converted
weights) or any callable with the same signature — so a torch/transformers
OwlViT can be swapped in for cross-checking.
"""

from __future__ import annotations

import os
import numpy as np

from ..text import tokens as toklib
from .predicates import class_aware_nms, get_eval_info_from_prompt, nms, to_gen_box_format
from .prompts import get_prompts
from .stage_one import EvalReport


class FlaxOwlViTDetector:
    """detect(image, texts) -> (boxes xyxy in [0,1], scores, labels)."""

    def __init__(self, params, config=None, tokenizer=None):
        import jax

        from ..nn import owlvit as owlvit_lib

        self.config = config or owlvit_lib.owlvit_base_patch32()
        self.model = owlvit_lib.OwlViT(self.config)
        # Pin params on device once — converted checkpoints arrive as host
        # numpy, and a 400-image eval would otherwise re-stream the full
        # model over the chip tunnel on every call.
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer or toklib.default_tokenizer()
        self._apply = jax.jit(
            lambda params, pixels, ids: self.model.apply(
                {"params": params}, pixels, ids))

    @classmethod
    def from_checkpoint(cls, path: str):
        from ..nn import owlvit as owlvit_lib
        from ..runtime.convert import _load_state_dict

        config = owlvit_lib.owlvit_base_patch32()
        sd = _load_state_dict(path)
        params = owlvit_lib.convert_owlvit(sd, config)
        tokenizer = toklib.default_tokenizer()
        tok_dir = os.path.join(path, "tokenizer")
        if os.path.exists(os.path.join(tok_dir, "vocab.json")):
            tokenizer = toklib.ClipBpeTokenizer.from_dir(tok_dir)
        return cls(params, config, tokenizer)

    def __call__(self, image: np.ndarray, texts: list[str]):
        from ..nn import owlvit as owlvit_lib

        pixels = owlvit_lib.preprocess_image(image, self.config.image_size)
        max_len = self.config.text.max_length
        ids = np.asarray(
            [self.tokenizer.encode(t, pad_to=max_len)[:max_len] for t in texts],
            np.int32,
        ) % self.config.text.vocab_size
        # Bucket the query axis (next power of two, padded with empty
        # queries) so the benchmark's varying per-prompt query counts share
        # compiled variants; padded columns are sliced off below.
        n_q = len(texts)
        b_q = 1
        while b_q < n_q:
            b_q *= 2
        if b_q > n_q:
            ids = np.pad(ids, ((0, b_q - n_q), (0, 0)))
        boxes, logits = self._apply(self.params, pixels, ids)
        boxes = np.asarray(boxes[0])            # (N, 4) cxcywh [0,1]
        logits = np.asarray(logits[0])[:, :n_q]
        probs = 1.0 / (1.0 + np.exp(-logits))   # (N, Q)
        scores = probs.max(axis=-1)
        labels = probs.argmax(axis=-1)
        cx, cy, w, h = boxes.T
        # NOT clipped to [0,1]: the reference's post_process keeps raw
        # corner coordinates (eval.py:136-144), and the predicates consume
        # them as-is — clipping here would shift mass centers vs the
        # published protocol.
        xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        return xyxy, scores, labels


def eval_prompt(
    prompt: str,
    image: np.ndarray,
    detector,
    score_threshold: float = 0.15,
    nms_threshold: float = 0.15,
    use_class_aware_nms: bool = True,
    verbose: bool = False,
) -> tuple[str, bool]:
    """Score one generated image against its benchmark prompt."""
    texts, eval_info = get_eval_info_from_prompt(prompt)
    text = texts[0]

    boxes, scores, labels = detector(image, text)
    keep = scores >= score_threshold
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

    if use_class_aware_nms:
        boxes, scores, labels = class_aware_nms(boxes, scores, labels,
                                                nms_threshold)
    else:
        kept = nms(np.asarray(boxes), np.asarray(scores), nms_threshold)
        boxes, scores, labels = boxes[kept], scores[kept], labels[kept]

    # Predicate box space: the image's own pixel size (reference
    # eval.py:130,168 — equals the 512 LLM canvas for production images).
    height, width = np.asarray(image).shape[:2]
    det_boxes = [
        {"name": text[int(label)],
         "bounding_box": to_gen_box_format(box, width, height),
         "score": float(score)}
        for box, score, label in zip(boxes, scores, labels)
    ]
    if verbose:
        print(f"prompt: {prompt}, detections: {det_boxes}")
    return eval_info["type"], bool(eval_info["predicate"](det_boxes))


def evaluate_run(
    run_base_path: str,
    detector,
    prompt_type: str = "lmd",
    model: str = "gpt-4",
    skip_first_prompts: int = 0,
    num_prompts: int | None = None,
    repeats: int = 1,
    run_start_ind: int = 0,
    verbose: bool = False,
    **eval_kwargs,
) -> EvalReport:
    """Walk a generation run directory ({ind}/img_{r}.png) and score every
    image (reference owl_vit_eval.py:61-102). run_start_ind offsets the
    directory index relative to the prompt index (owl_vit_eval.py:22,61),
    for scoring a run produced with --skip_first_prompts."""
    from PIL import Image

    prompts = get_prompts(prompt_type, model=model)
    report = EvalReport()
    for ind, prompt in enumerate(prompts):
        if isinstance(prompt, list):
            prompt = prompt[0]
        prompt = prompt.strip().rstrip(".")
        if ind < skip_first_prompts:
            continue
        if num_prompts is not None and ind >= skip_first_prompts + num_prompts:
            continue
        for repeat in range(repeats):
            path = os.path.join(run_base_path, str(ind + run_start_ind),
                                f"img_{repeat}.png")
            if not os.path.exists(path):
                if verbose:
                    print(f"missing image: {path}")
                continue
            image = np.asarray(Image.open(path).convert("RGB"))
            eval_type, success = eval_prompt(prompt, image, detector,
                                             verbose=verbose, **eval_kwargs)
            report.record(eval_type, success)
    return report
