"""One-command real-weight verification path (VERDICT round-1 item 1b).

Given converted/HF checkpoint directories, this script:
  1. validates the SD checkpoint against the checked-in key/shape manifests
     (lmdx/runtime/manifests/) and prints a diff on mismatch,
  2. generates the demo prompts seed-fixed (reference cache layouts,
     reference seed scheme) with the requested method,
  3. if an OWL-ViT checkpoint is given, scores the generated images with
     the reference protocol (threshold 0.15, class-aware NMS 0.15).

Usage:
    export LMDX_CHECKPOINT_DIR=/path/to/checkpoints   # contains
    #   gligen--diffusers-generation-text-box/{unet,vae,text_encoder,tokenizer}
    #   facebook--sam-vit-base/   (auto-discovered; SAM is the default
    #                              segmenter whenever this dir exists,
    #                              matching reference generate.py:126)
    python scripts/run_real_weights.py \
        [--run-model lmd_plus] [--prompt-type demo] \
        [--sam-checkpoint /path/to/sam-vit-base] \
        [--owlvit-checkpoint /path/to/owlvit-base-patch32] \
        [--repeats 1] [--cpu]

For the full benchmark accuracy number vs the published LMD+ 86.3%
(reference README.md:202): --prompt-type lmd --model gpt-4 --num-prompts 400
and an --owlvit-checkpoint.

SD2.1 (reference generate.py:113, --sdv2 run_models) — needs subdir
stabilityai--stable-diffusion-2-1-base/{unet,vae,text_encoder,tokenizer}:
    python scripts/run_real_weights.py --run-model lmd --use-sdv2

SDXL refinement (reference generation/sdxl_refinement.py:10-20) — needs
subdir stabilityai--stable-diffusion-xl-refiner-1.0/{unet,vae,text_encoder_2,
tokenizer_2}; validates the refiner manifest, then refines each image:
    python scripts/run_real_weights.py --run-model lmd_plus --sdxl
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run-model", default="lmd_plus")
    parser.add_argument("--prompt-type", default="demo")
    parser.add_argument("--model", default="gpt-4")
    parser.add_argument("--cache-path", default=None)
    parser.add_argument("--num-prompts", default=None, type=int)
    parser.add_argument("--repeats", default=1, type=int)
    parser.add_argument("--save-suffix", default="realweights")
    parser.add_argument("--sam-checkpoint", default=None)
    parser.add_argument("--owlvit-checkpoint", default=None)
    parser.add_argument("--use-sdv2", action="store_true",
                        help="SD2.1-base model keys (reference "
                             "generate.py:113; lmd/sd runs only)")
    parser.add_argument("--sdxl", action="store_true",
                        help="also validate + wire the SDXL refiner "
                             "(reference generation/sdxl_refinement.py)")
    parser.add_argument("--skip-validate", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    from lmdx.cli import generate as gen_cli
    from lmdx.runtime import convert

    # -- 1. validate ---------------------------------------------------------
    model_key = gen_cli.select_model_key(
        argparse.Namespace(sd_model=None, use_sdv2=args.use_sdv2,
                           run_model=args.run_model))
    model_keys = [model_key]
    if args.sdxl:
        model_keys.append("stabilityai/stable-diffusion-xl-refiner-1.0")
    root = os.environ.get("LMDX_CHECKPOINT_DIR", "")
    for key in model_keys:
        ckpt = os.path.join(root, key.replace("/", "--")) if root else ""
        if not (ckpt and os.path.isdir(ckpt)):
            print(f"ERROR: no checkpoint dir for {key} "
                  f"(LMDX_CHECKPOINT_DIR={root!r}; expected subdir "
                  f"{key.replace('/', '--')!r})")
            return 2
        if args.skip_validate:
            continue
        report = convert.validate_checkpoint(key, ckpt)
        clean = True
        for component, diff in report.items():
            issues = {k: v for k, v in diff.items() if v}
            if issues:
                clean = False
                print(f"MANIFEST MISMATCH [{key} :: {component}]:")
                for kind, keys in issues.items():
                    print(f"  {kind} ({len(keys)}): {keys[:6]}")
        if not clean:
            print("Checkpoint does not match the manifest contract; aborting "
                  "(pass --skip-validate to force).")
            return 3
        print(f"manifest validation OK: {key} @ {ckpt}")

    # -- 2. generate ---------------------------------------------------------
    cache_path = args.cache_path or (
        f"/root/reference/cache/cache_{args.prompt_type.replace('lmd_', '')}"
        f"_v0.1_{args.model}.json")
    gen_argv = [
        "--prompt-type", args.prompt_type, "--model", args.model,
        "--template_version", "v0.1", "--run-model", args.run_model,
        "--cache-path", cache_path,
        "--repeats", str(args.repeats),
        "--save-suffix", args.save_suffix,
        "--force_run_ind", "0",
    ]
    if args.num_prompts is not None:
        gen_argv += ["--num_prompts", str(args.num_prompts)]
    if args.sam_checkpoint:
        gen_argv += ["--sam-checkpoint", args.sam_checkpoint]
    if args.use_sdv2:
        gen_argv += ["--use-sdv2"]
    if args.sdxl:
        gen_argv += ["--sdxl"]
    if args.cpu:
        gen_argv += ["--cpu"]
    print(f"generate: {' '.join(gen_argv)}")
    rc = gen_cli.main(gen_argv)
    if rc != 0:
        return rc

    run_dir = (f"img_generations/templatev0.1_{args.run_model}"
               f"_{args.prompt_type}_{args.save_suffix}/run0")

    # -- 3. eval -------------------------------------------------------------
    if args.owlvit_checkpoint and not args.prompt_type.startswith("lmd"):
        print(f"done; images in {run_dir}. OWL-ViT eval needs benchmark "
              "prompts (--prompt-type lmd) — predicates are re-derived from "
              "the prompt text; demo prompts have none.")
        return 0
    if args.owlvit_checkpoint:
        from lmdx.cli import owl_vit_eval

        eval_argv = [
            "--run_base_path", run_dir,
            "--prompt-type", args.prompt_type, "--model", args.model,
            "--owlvit-checkpoint", args.owlvit_checkpoint,
            "--repeats", str(args.repeats),
        ]
        if args.cpu:
            eval_argv += ["--cpu"]
        print(f"owl_vit_eval: {' '.join(eval_argv)}")
        return owl_vit_eval.main(eval_argv)

    print(f"done; images in {run_dir} (no --owlvit-checkpoint, eval skipped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
