"""Full-size SDXL on the chip: HBM fit + compile/steady timing, once.

VERDICT r04 #3: configs/manifests/converters and tiny-config e2e tests
existed, but no TPU run had ever instantiated SDXL-base or the refiner at
production shapes (1024^2 -> 128x128 latents, dual text towers). This
script proves/records, with random weights (no checkpoints in this
environment — numerics are irrelevant, shapes/HBM/compile/steady are the
product):

  phase A — the reference's --sdxl path end to end (README --sdxl;
      generation/sdxl_refinement.py:10-30): LMD+ on SD1.4-GLIGEN at 512^2
      (2-box spec), then refiner img2img at 1024^2 (128x128 latents,
      single bigG tower, text_time aesthetic ids, EulerDiscrete default);
  phase B — SDXL-base text2img at 1024^2: dual-tower encode (CLIP-L +
      bigG concat context, pooled from tower 2) + N-step CFG scan.

One process holds the chip; phases run sequentially and params are freed
between them. Results go to stdout (paste into BASELINE.md).

Usage: python scripts/sdxl_full_size.py [--steps-refine 50]
       [--strength 0.3] [--steps-base 20] [--skip-lmd]
"""

from __future__ import annotations

import argparse
import gc
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lmdx.runtime import jit_cache

jit_cache.enable()


def param_summary(tree) -> str:
    leaves = jax.tree_util.tree_leaves(tree)
    n = sum(int(np.prod(p.shape)) for p in leaves)
    by = {}
    for p in leaves:
        by[str(p.dtype)] = by.get(str(p.dtype), 0) + p.nbytes
    parts = ", ".join(f"{k} {v / 2**30:.2f} GiB" for k, v in sorted(by.items()))
    return f"UNet params {n / 1e9:.2f}B: {parts}"


def hbm(label: str) -> None:
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats is None:  # axon PJRT client reports no memory stats
            print(f"[hbm] {label}: memory_stats unavailable on this client",
                  flush=True)
            return
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"[hbm] {label}: in_use={used:.2f} GiB peak={peak:.2f} GiB "
              f"limit={limit:.2f} GiB", flush=True)
    except Exception as e:  # some PJRT clients lack memory_stats
        print(f"[hbm] {label}: unavailable ({e})", flush=True)


SPEC = {
    "prompt": "A realistic photo of a gray cat and an orange dog on the grass",
    "gen_boxes": [("a gray cat", (67, 243, 120, 126)),
                  ("an orange dog", (265, 193, 190, 210))],
    "bg_prompt": "A realistic photo of a grassy area",
    "extra_neg_prompt": "",
}


def phase_a(args) -> None:
    from lmdx.methods import sdxl_refine
    from lmdx.methods.batch import run_lmd_plus_batch
    from lmdx.runtime.models import load_bundle

    print("== phase A: --sdxl path (LMD+ 512^2 -> refiner 1024^2) ==",
          flush=True)
    image = None
    if not args.skip_lmd:
        t0 = time.monotonic()
        bundle = load_bundle("gligen/diffusers-generation-text-box", seed=0)
        jax.block_until_ready(bundle.params["unet"])
        print(f"SD1.4-GLIGEN bundle init: {time.monotonic() - t0:.1f}s",
              flush=True)
        hbm("after SD1.4 bundle")

        t0 = time.monotonic()
        res = run_lmd_plus_batch([SPEC], bundle, bg_seeds=[1],
                                 fg_seed_starts=[100])
        image = np.asarray(res[0].image)
        t_first = time.monotonic() - t0
        t0 = time.monotonic()
        res = run_lmd_plus_batch([SPEC], bundle, bg_seeds=[2],
                                 fg_seed_starts=[200])
        image = np.asarray(res[0].image)
        t_steady = time.monotonic() - t0
        print(f"LMD+ 512^2 2-box: first={t_first:.1f}s steady={t_steady:.1f}s",
              flush=True)
        hbm("after LMD+ pass")
        del bundle, res
        gc.collect()
    if image is None:
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)

    t0 = time.monotonic()
    refiner = load_bundle("stabilityai/stable-diffusion-xl-refiner-1.0",
                          seed=0)
    jax.block_until_ready(refiner.params["unet"])
    print(f"SDXL-refiner bundle init: {time.monotonic() - t0:.1f}s "
          f"({param_summary(refiner.params['unet'])})", flush=True)
    hbm("after refiner bundle")

    for label, seed in (("first", 11), ("steady", 12)):
        t0 = time.monotonic()
        out = sdxl_refine.refine(image, SPEC, refine_seed=seed,
                                 refinement_step_ratio=args.strength,
                                 bundle=refiner)
        out = np.asarray(out)
        print(f"refiner img2img 1024^2 ({args.steps_refine}-step grid, "
              f"strength {args.strength} -> "
              f"{int(args.steps_refine * args.strength)} denoise steps, "
              f"euler): {label}={time.monotonic() - t0:.1f}s "
              f"out={out.shape} {out.dtype}", flush=True)
    hbm("after refiner img2img")
    assert out.shape == (1024, 1024, 3)
    del refiner
    gc.collect()


def phase_b(args) -> None:
    from lmdx.core import schedule as sched
    from lmdx.runtime.models import load_bundle
    from lmdx.runtime import models as runtime_models
    from lmdx.sampling import latents as latents_lib
    from lmdx.sampling.loop import sample
    from lmdx.methods import base as mbase

    print("== phase B: SDXL-base text2img 1024^2 (dual towers) ==",
          flush=True)
    t0 = time.monotonic()
    bundle = load_bundle("stabilityai/stable-diffusion-xl-base-1.0", seed=0)
    jax.block_until_ready(bundle.params["unet"])
    print(f"SDXL-base bundle init: {time.monotonic() - t0:.1f}s "
          f"({param_summary(bundle.params['unet'])})", flush=True)
    hbm("after base bundle")

    cfg = bundle.config
    schedule = sched.make_schedule(args.steps_base)
    cond, cond_pooled = runtime_models.encode_text(bundle, [SPEC["prompt"]])
    uncond, uncond_pooled = runtime_models.encode_text(bundle, [""])
    text = jnp.concatenate([uncond, cond], axis=0)
    pooled = jnp.concatenate([uncond_pooled, cond_pooled], axis=0)
    h = w = cfg.height
    time_ids = jnp.asarray([[h, w, 0, 0, h, w]] * 2, jnp.float32)

    for label, seed in (("first", 3), ("steady", 4)):
        t0 = time.monotonic()
        lat = latents_lib.noise_from_seed(
            seed, (1, cfg.latent_height, cfg.latent_width, 4))
        lat = lat * schedule.init_noise_sigma
        out = sample(bundle.unet, bundle.params["unet"], schedule, lat, text,
                     guidance_scale=7.5, added_cond=(pooled, time_ids))
        img = mbase.decode_latents(bundle, out.latents)[0]
        dt = time.monotonic() - t0
        print(f"SDXL-base {args.steps_base}-step 1024^2 CFG: {label}={dt:.1f}s"
              f" ({args.steps_base / dt:.2f} steps/s incl. decode) "
              f"img={np.asarray(img).shape}", flush=True)
    hbm("after base sampling")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-refine", type=int, default=50)
    ap.add_argument("--strength", type=float, default=0.3)
    ap.add_argument("--steps-base", type=int, default=20)
    ap.add_argument("--skip-lmd", action="store_true")
    ap.add_argument("--skip-base", action="store_true")
    ap.add_argument("--only-base", action="store_true",
                    help="run phase B alone in a fresh process: at 16 GiB "
                         "HBM the base bundle + 1024^2 decode does not fit "
                         "alongside phase A's residue")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    if not args.only_base:
        phase_a(args)
    if not args.skip_base:
        phase_b(args)
    print("sdxl_full_size: done", flush=True)


if __name__ == "__main__":
    main()
