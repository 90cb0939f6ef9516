"""CLI driver tests that need no accelerator: stage-1 batch driver against
the fake OpenAI server, template printout, and the generate dry-run path."""

import json
import os
import threading
from http.server import ThreadingHTTPServer

import pytest

from lmdx.cli import generate as gen_cli
from lmdx.cli import prompt_batch
from tests.test_llm_client import VALID_RESPONSE, _FakeOpenAI

DEMO_CACHE = "/root/reference/cache/cache_demo_v0.1_gpt-4.json"


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    srv.script = []
    srv.requests = []
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    thread.join(timeout=5)


def test_prompt_batch_auto_query_populates_cache(server, tmp_path, capsys,
                                                 monkeypatch):
    monkeypatch.chdir(tmp_path)  # layout renderings go under cwd
    argv = [
        "--prompt-type", "demo", "--model", "gpt-4", "--auto-query",
        "--cache-dir", str(tmp_path),
        "--api-base", f"http://127.0.0.1:{server.server_address[1]}/v1",
    ]
    assert prompt_batch.main(argv) == 0
    assert len(server.requests) == 3  # the three demo prompts

    cache_path = tmp_path / "cache_demo_v0.1_gpt-4.json"
    cache = json.load(open(cache_path))
    assert len(cache) == 3
    assert all(v == [VALID_RESPONSE] for v in cache.values())
    # Layout renderings saved per prompt (reference prompt_batch.py:92).
    vis_dir = tmp_path / "img_generations" / "imgs_demo_templatev0.1"
    assert sorted(os.listdir(vis_dir)) == [
        "boxes_0.png", "boxes_1.png", "boxes_2.png"]

    # Second run: everything served from cache, no new HTTP traffic, and no
    # re-rendering unless --visualize-cache-hit is passed.
    assert prompt_batch.main(argv) == 0
    assert len(server.requests) == 3
    assert "cached" in capsys.readouterr().out

    for f in vis_dir.iterdir():
        f.unlink()
    assert prompt_batch.main(argv + ["--visualize-cache-hit"]) == 0
    assert len(os.listdir(vis_dir)) == 3


def test_prompt_batch_retries_on_malformed(server, tmp_path, monkeypatch):
    monkeypatch.setattr(prompt_batch.time, "sleep", lambda s: None)
    server.script = [(200, "nonsense")] * 3 * 3  # all attempts fail
    argv = [
        "--prompt-type", "demo", "--model", "gpt-4", "--auto-query",
        "--cache-dir", str(tmp_path),
        "--api-base", f"http://127.0.0.1:{server.server_address[1]}/v1",
    ]
    assert prompt_batch.main(argv) == 0  # gives up but does not crash
    assert not (tmp_path / "cache_demo_v0.1_gpt-4.json").exists()


def test_prompt_batch_show_template(capsys):
    assert prompt_batch.main([
        "--show-template", "--prompt-type", "demo", "--model", "gpt-4",
    ]) == 0
    out = capsys.readouterr().out
    assert "<your caption here>" in out
    assert "Objects:" in out


def test_generate_dry_run(tmp_path, capsys):
    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not present")
    rc = gen_cli.main([
        "--prompt-type", "demo", "--model", "gpt-4",
        "--template_version", "v0.1", "--run-model", "lmd_plus",
        "--cache-path", DEMO_CACHE, "--dry-run",
        "--save-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("spec:") == 3
    assert "gen_boxes" in out


def test_generate_flag_parity():
    """Flags mirrored from the reference CLI surface parse and map into
    run_kwargs (generate.py:45,94,202-204)."""
    parser = gen_cli.build_parser()
    args = parser.parse_args([
        "--no-center-or-align", "--multidiffusion_bootstrapping", "7"])
    assert args.multidiffusion_bootstrapping == 7
    kwargs = gen_cli.collect_run_kwargs(args)
    assert kwargs["align_with_overall_bboxes"] is False
    assert kwargs["so_center_box"] is False
    assert "align_with_overall_bboxes" not in gen_cli.collect_run_kwargs(
        parser.parse_args([]))


def test_sam_checkpoint_autodiscovery(tmp_path, monkeypatch):
    """facebook--sam-vit-base under LMDX_CHECKPOINT_DIR is found without a
    flag (reference generate.py:126 loads SAM unconditionally)."""
    monkeypatch.delenv("LMDX_CHECKPOINT_DIR", raising=False)
    assert gen_cli.discover_sam_checkpoint() is None
    monkeypatch.setenv("LMDX_CHECKPOINT_DIR", str(tmp_path))
    assert gen_cli.discover_sam_checkpoint() is None
    sam_dir = tmp_path / "facebook--sam-vit-base"
    sam_dir.mkdir()
    assert gen_cli.discover_sam_checkpoint() == str(sam_dir)


def test_coarse_segmenter_warning_on_real_weights():
    """A real-weights run that falls back to the CoarseSegmenter must warn
    loudly (accuracy trap: every mask degrades to the coarse box)."""
    import warnings
    from types import SimpleNamespace

    real = SimpleNamespace(checkpoint_dir="/ckpt/gligen--x")
    weightless = SimpleNamespace(checkpoint_dir=None)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert gen_cli.warn_if_coarse_on_real_weights(real, None, "lmd_plus")
        assert len(caught) == 1
        assert "coarse" in str(caught[0].message)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # No warning: weightless bundle, real segmenter, or SAM-less method.
        assert not gen_cli.warn_if_coarse_on_real_weights(
            weightless, None, "lmd_plus")
        assert not gen_cli.warn_if_coarse_on_real_weights(
            real, object(), "lmd_plus")
        assert not gen_cli.warn_if_coarse_on_real_weights(real, None, "sd")
        assert not caught


def test_run_real_weights_validates_all_model_keys(tmp_path, monkeypatch):
    """--use-sdv2 and --sdxl route through manifest validation for the
    checkpoints the reference actually selects (generate.py:113,
    generation/sdxl_refinement.py:10-20); a missing subdir is a hard error
    before any generation."""
    import scripts.run_real_weights as rrw
    from lmdx.runtime import convert

    monkeypatch.setenv("LMDX_CHECKPOINT_DIR", str(tmp_path))

    # Missing checkpoint dir: exit 2 before touching the model.
    assert rrw.main(["--run-model", "lmd", "--use-sdv2"]) == 2

    validated = []

    def fake_validate(key, ckpt):
        validated.append(key)
        return {"unet": {"missing": [], "extra": [], "shape": []}}

    monkeypatch.setattr(convert, "validate_checkpoint", fake_validate)
    monkeypatch.setattr(gen_cli, "main", lambda argv: 0)
    for key in ("stabilityai--stable-diffusion-2-1-base",
                "gligen--diffusers-generation-text-box",
                "stabilityai--stable-diffusion-xl-refiner-1.0"):
        (tmp_path / key).mkdir()

    assert rrw.main(["--run-model", "lmd", "--use-sdv2"]) == 0
    assert validated == ["stabilityai/stable-diffusion-2-1-base"]

    validated.clear()
    assert rrw.main(["--run-model", "lmd_plus", "--sdxl"]) == 0
    assert validated == ["gligen/diffusers-generation-text-box",
                         "stabilityai/stable-diffusion-xl-refiner-1.0"]


def test_webui_page_and_generate():
    """The WebUI App renders the form page and serves a full generation
    (layout -> stage-2 -> HTML with embedded images) without HTTP."""
    import argparse

    from lmdx.webui import server as webui

    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not present")
    app = webui.App(argparse.Namespace(
        sd_model="tiny-test", llm_model="gpt-4", cache_path=DEMO_CACHE,
        steps=4))
    page = app.page()
    assert "<form" in page and "lmd_plus" in page

    pytest.importorskip("PIL")
    html_out = app.generate(
        "A realistic photo of a wooden table without bananas in an indoor scene",
        method="sd", seed=1, steps=4)
    assert "<h3>Layout</h3>" in html_out
    assert "<h3>Image</h3>" in html_out
    assert html_out.count("data:image/png;base64,") >= 2
    assert "wooden table" in html_out


test_webui_page_and_generate = pytest.mark.slow(test_webui_page_and_generate)


def test_prompt_batch_interactive_paste(tmp_path, monkeypatch, capsys):
    """--interactive: template printed, pasted response assembled from
    stdin lines, confirmed, and saved to the cache (reference
    prompt_batch.py:62-105)."""
    monkeypatch.chdir(tmp_path)
    answers = iter([
        "[('a blue cube', [100, 100, 120, 120])]",  # objects line
        "A grassy field",                            # background prompt
        "",                                          # negative prompt
        "y",                                         # Save (y/n)?
    ])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    argv = [
        "--prompt-type", "demo", "--model", "gpt-4", "--interactive",
        "--cache-dir", str(tmp_path), "--num_prompts", "1",
        "--no-visualize",
    ]
    assert prompt_batch.main(argv) == 0
    cache = json.load(open(tmp_path / "cache_demo_v0.1_gpt-4.json"))
    (resp,), = cache.values()
    assert "Background prompt: A grassy field" in resp
    assert "a blue cube" in resp
    out = capsys.readouterr().out
    assert "#########" in out  # the filled template was printed

    # --always-save skips the confirmation.
    answers2 = iter([
        "Objects: [('a red ball', [10, 10, 50, 50])]\n",
        "A beach", "",
    ])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers2))
    argv2 = argv + ["--always-save", "--skip_first_prompts", "1",
                    "--num_prompts", "1"]
    assert prompt_batch.main(argv2) == 0
    cache = json.load(open(tmp_path / "cache_demo_v0.1_gpt-4.json"))
    assert len(cache) == 2


def test_owl_vit_eval_cli_scores_run_dir(tmp_path, capsys, monkeypatch):
    """End-to-end stage-2 eval CLI over a synthesized run directory
    (reference scripts/owl_vit_eval.py:61-102 protocol): walks
    {ind + run_start_ind}/img_{repeat}.png, skips missing images, scores
    each present one with OWL-ViT + NMS + the task predicate, and prints a
    per-type report. The base-patch32 detector is swapped for the tiny
    config so the random-weights smoke path compiles in seconds."""
    import numpy as np
    from PIL import Image

    from lmdx.cli import owl_vit_eval as owl_cli
    from lmdx.nn import owlvit as owlvit_lib

    monkeypatch.setattr(owlvit_lib, "owlvit_base_patch32",
                        owlvit_lib.tiny_owlvit)

    # Benchmark prompts 2 and 3 (negation task), written at directory
    # offset 5 (run_start_ind) with one repeat each; prompt 3's image is
    # missing and must be skipped, not scored.
    rng = np.random.default_rng(0)
    d = tmp_path / "7"  # ind 2 + run_start_ind 5
    d.mkdir()
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                    "RGB").save(d / "img_0.png")

    rc = owl_cli.main([
        "--run_base_path", str(tmp_path),
        "--prompt-type", "lmd",
        "--detector-random", "--cpu",
        "--skip_first_prompts", "2", "--num_prompts", "2",
        "--run_start_ind", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # Exactly one image existed -> one prompt scored; random weights mean
    # the success value is arbitrary but the counting must be right.
    assert "1" in out and "overall" in out.lower()


def test_generate_batched_driver_resume(tmp_path, capsys):
    """The batched driver (--image-batch-size > 1) builds jobs only for
    prompts whose images are missing — the reference's skip-if-exists resume
    (generate.py:275-279) applied to throughput mode — writes img_{repeat}.png
    per job, and a rerun after completion schedules zero work. Mirrors the
    mid-run-kill resume exercised on TPU for BASELINE.md's production-workload
    table."""
    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not present")

    run_dir = tmp_path / "templatev0.1_lmd_plus_demo" / "run0"
    done = run_dir / "1"
    done.mkdir(parents=True)
    (done / "img_0.png").write_bytes(b"sentinel")

    argv = [
        "--prompt-type", "demo", "--model", "gpt-4",
        "--template_version", "v0.1", "--run-model", "lmd_plus",
        "--cache-path", DEMO_CACHE, "--save-dir", str(tmp_path),
        "--force_run_ind", "0", "--sd-model", "tiny-test",
        "--image-batch-size", "2", "--num_inference_steps", "4",
        "--max_index_step", "0", "--overall_max_index_step", "0",
    ]
    assert gen_cli.main(argv) == 0
    out = capsys.readouterr().out
    # Prompt 1 was already done mid-"run": only the other two become jobs.
    assert "[batched] 2 jobs, batch size 2" in out
    assert (run_dir / "0" / "img_0.png").exists()
    assert (run_dir / "2" / "img_0.png").exists()
    assert (done / "img_0.png").read_bytes() == b"sentinel"  # untouched

    assert gen_cli.main(argv) == 0
    assert "[batched] 0 jobs" in capsys.readouterr().out


test_generate_batched_driver_resume = pytest.mark.slow(
    test_generate_batched_driver_resume)


def test_generate_batched_tail_group_padding(tmp_path, capsys):
    """In compile-budget mode the partial tail group is padded to the full
    batch size with duplicate jobs (G is a compiled shape dimension) and
    the duplicates' results are discarded: the demo cache's 3 prompts at
    --image-batch-size 2 --max-compiled-variants 1 run as two G=2 groups
    sharing one compiled variant, and exactly 3 image dirs are written."""
    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not present")

    argv = [
        "--prompt-type", "demo", "--model", "gpt-4",
        "--template_version", "v0.1", "--run-model", "lmd_plus",
        "--cache-path", DEMO_CACHE, "--save-dir", str(tmp_path),
        "--force_run_ind", "0", "--sd-model", "tiny-test",
        "--image-batch-size", "2", "--num_inference_steps", "4",
        "--max_index_step", "0", "--overall_max_index_step", "0",
        "--max-compiled-variants", "1",
    ]
    assert gen_cli.main(argv) == 0
    out = capsys.readouterr().out
    assert "[batched] 3 jobs, batch size 2" in out
    assert "merged to 1 compiled variants" in out
    assert "[batched] 3/3 done" in out
    run_dir = tmp_path / "templatev0.1_lmd_plus_demo" / "run0"
    made = sorted(d.name for d in run_dir.iterdir() if d.is_dir())
    assert made == ["0", "1", "2"]
    for d in made:
        assert (run_dir / d / "img_0.png").exists()


test_generate_batched_tail_group_padding = pytest.mark.slow(
    test_generate_batched_tail_group_padding)


def test_plan_shape_classes():
    """--max-compiled-variants merges batch shape classes up to a compile
    budget: chosen classes dominate every group, empty-layout groups stay
    untouched, and a large-enough budget is a no-op."""
    plan = gen_cli.plan_shape_classes
    # The real gpt-4 benchmark distribution grouped by 8 after sorting:
    # 12x empty, mixed [0,0,0,0,1,1,1,1], 2x all-1s, 27x all-2s, 3x all-3s,
    # 2x (4-box sum 32), 2x all-5s and one tail [5,5,5,5].
    groups = ([[0] * 8] * 12 + [[0, 0, 0, 0, 1, 1, 1, 1]] + [[1] * 8] * 2
              + [[2] * 8] * 27 + [[3] * 8] * 3 + [[4] * 8] * 2
              + [[5] * 8] * 2 + [[5, 5, 5, 5]])

    assert plan(groups, 0) == [None] * len(groups)   # disabled
    assert plan(groups, 7) == [None] * len(groups)   # budget >= classes

    merged = plan(groups, 3)
    assert [p for p in merged[:12]] == [None] * 12   # empties untouched
    # The odd-sized tail group is excluded from merging: its G=4 compiles
    # its own scans anyway (the driver pads tail groups to full size with
    # duplicate jobs *before* planning, so this only triggers if not).
    assert merged[-1] is None
    chosen = {(p["pad_boxes_to"], p["pad_objs_to"])
              for p in merged if p is not None}
    assert len(chosen) <= 3
    assert all(p["pad_positions_to"] == 4 for p in merged if p is not None)
    # Every non-empty full-size group is dominated by its assigned class.
    for g, p in zip(groups, merged):
        if sum(g) == 0 or len(g) != 8:
            assert p is None
        else:
            assert p["pad_boxes_to"] >= sum(g)
            assert p["pad_objs_to"] >= max(g)
    # The dominant 2-box class (27 of 48 batches) must keep its exact
    # shape — merging it upward would be the worst possible waste.
    two_box = merged[15]
    assert two_box == {"pad_boxes_to": 16, "pad_objs_to": 2,
                       "pad_positions_to": 4}

    # Single class: every full group pads to the global max.
    one = plan(groups, 1)
    assert {(p["pad_boxes_to"], p["pad_objs_to"])
            for p in one if p is not None} == {(40, 8)}

    # The position floor is a pass-through into every merged class.
    floored = plan(groups, 3, position_floor=8)
    assert all(p["pad_positions_to"] == 8 for p in floored if p is not None)


def test_plan_shape_classes_greedy_matches_constraints():
    """Past the exhaustive-search combination cap the planner goes greedy;
    the greedy plan must still dominate every group and respect the
    budget (40 classes at budget 12 would be ~3.9e9 combos exhaustively)."""
    plan = gen_cli.plan_shape_classes
    groups = [[b] * 8 for b in range(1, 41)]
    merged = plan(groups, 12)
    chosen = {(p["pad_boxes_to"], p["pad_objs_to"]) for p in merged}
    assert 0 < len(chosen) <= 12
    # The global top class must survive the greedy drops.
    assert (320, 64) in chosen
    for g, p in zip(groups, merged):
        assert p["pad_boxes_to"] >= sum(g)
        assert p["pad_objs_to"] >= max(g)


@pytest.mark.slow
def test_generate_warm_ahead_outputs_identical(tmp_path, capsys):
    """--warm-ahead (compile the next shape class in a background thread
    while the current class runs) must be output-inert: the demo cache's 3
    prompts at --image-batch-size 2 split into a G=2 group and a G=1 tail
    group — distinct shape classes, so the warm thread claims and
    pre-compiles the second; every img_0.png must be byte-identical to the
    plain run's."""
    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not present")

    argv = [
        "--prompt-type", "demo", "--model", "gpt-4",
        "--template_version", "v0.1", "--run-model", "lmd_plus",
        "--cache-path", DEMO_CACHE, "--sd-model", "tiny-test",
        "--image-batch-size", "2", "--num_inference_steps", "4",
        "--max_index_step", "0", "--overall_max_index_step", "1",
    ]
    assert gen_cli.main(argv + ["--save-dir", str(tmp_path / "plain"),
                                "--force_run_ind", "0"]) == 0
    capsys.readouterr()
    assert gen_cli.main(argv + ["--save-dir", str(tmp_path / "warm"),
                                "--force_run_ind", "0",
                                "--warm-ahead"]) == 0
    out = capsys.readouterr().out
    assert "[warm-ahead]" in out  # the thread actually warmed something

    plain_root = tmp_path / "plain" / "templatev0.1_lmd_plus_demo" / "run0"
    warm_root = tmp_path / "warm" / "templatev0.1_lmd_plus_demo" / "run0"
    images = sorted(p.relative_to(plain_root)
                    for p in plain_root.rglob("img_*.png"))
    assert len(images) == 3
    for rel in images:
        assert (plain_root / rel).read_bytes() == (
            warm_root / rel).read_bytes(), rel
