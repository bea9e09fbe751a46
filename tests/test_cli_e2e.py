"""End-to-end CLI smoke: train → kill → resume must reproduce the uninterrupted
run exactly (params AND data order), and mid-training checkpoints must be
sampleable — the reference's resume/eval semantics
(train_text_to_image_control_lora.py:713-749, test_…py:706-731)."""

import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)


def _train(out, steps, ckpt_every=2, resume=False):
    import train as train_cli

    argv = [
        "--model_variant", "smoke", "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "2",
        "--max_train_steps", str(steps), "--output_dir", out,
        "--checkpointing_steps", str(ckpt_every), "--log_every", "2",
        "--seed", "11",
    ]
    if resume:
        argv += ["--resume_from_checkpoint", "latest"]
    train_cli.main(argv)


def test_batch_iterator_fast_forward():
    """start_step=k replays exactly the batches an uninterrupted run sees from k."""
    from controllora_tpu.data import Fill50kSynthetic
    from controllora_tpu.data.registry import batch_iterator
    from controllora_tpu.data.tokenizer import HashTokenizer

    ds = Fill50kSynthetic(HashTokenizer(), resolution=32, size=20, seed=0)
    full = batch_iterator(ds, 4, seed=3)
    skipped = [next(full) for _ in range(9)][5:]  # batches 5..8 of the full stream
    resumed = batch_iterator(ds, 4, seed=3, start_step=5)
    for want in skipped:
        got = next(resumed)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k])


def test_native_batcher_fast_forward():
    from controllora_tpu.data import Fill50kSynthetic
    from controllora_tpu.data.fastloader import NativeFill50kBatcher, native_available
    from controllora_tpu.data.tokenizer import HashTokenizer

    if not native_available():
        pytest.skip("native loader unavailable")
    ds = Fill50kSynthetic(HashTokenizer(), resolution=32, size=20, seed=0)
    full = iter(NativeFill50kBatcher(ds, 4, seed=3))
    want = [next(full) for _ in range(5)][3:]
    resumed = iter(NativeFill50kBatcher(ds, 4, seed=3, start_step=3))
    for w in want:
        g = next(resumed)
        for k in w:
            np.testing.assert_array_equal(w[k], g[k])


def test_sigterm_graceful_checkpoint(tmp_path):
    """A real SIGTERM mid-run (what a TPU-VM maintenance event or batch scheduler
    delivers) must finish the in-flight step, commit a resumable checkpoint, and
    exit 0 — then `--resume_from_checkpoint latest` continues the run. The
    reference has no failure handling beyond resume-latest (SURVEY §5); this is
    the beyond-reference preemption-safe path in scripts/train.py."""
    import re
    import signal
    import subprocess
    import time

    out = str(tmp_path / "preempted")
    log_path = str(tmp_path / "log.txt")
    argv = [
        "--model_variant", "smoke", "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "1",
        "--output_dir", out, "--checkpointing_steps", "0",
        "--log_every", "1", "--seed", "11",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(SCRIPTS)
    env["JAX_PLATFORMS"] = "cpu"
    with open(log_path, "w") as logf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(SCRIPTS, "train.py"),
             "--max_train_steps", "100000"] + argv,
            env=env, stdout=logf, stderr=subprocess.STDOUT,
        )
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None or "step 1:" in open(log_path).read():
                break
            time.sleep(0.5)
        assert proc.poll() is None, open(log_path).read()
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    txt = open(log_path).read()
    assert rc == 0, txt
    m = re.search(r"preempted at step (\d+)", txt)
    assert m, txt
    at = int(m.group(1))
    # committed (async save drained before exit) and carries the sampleable artifact
    assert os.path.isdir(os.path.join(out, f"checkpoint-{at}", "state")), txt
    assert os.path.exists(os.path.join(
        out, f"checkpoint-{at}", "control_lora", "config.json"))

    # supervisor relaunch: resume-latest picks the run up and finishes it
    import train as train_cli

    train_cli.main(argv + ["--max_train_steps", str(at + 1),
                           "--resume_from_checkpoint", "latest"])
    assert os.path.exists(os.path.join(out, "diffusion_pytorch_model.safetensors"))


def test_num_train_epochs_derives_steps(tmp_path, capsys):
    """Without --max_train_steps the step budget derives from --num_train_epochs
    (reference train:190-195, 669-690)."""
    import train as train_cli

    out = str(tmp_path / "epochs")
    train_cli.main([
        "--model_variant", "smoke", "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "2",
        "--max_train_samples", "4", "--num_train_epochs", "2",
        "--output_dir", out, "--checkpointing_steps", "0",
        "--log_every", "2", "--seed", "11",
    ])
    # epoch length depends on the device count (per-device batch 2 over the mesh)
    import math

    import jax

    steps = 2 * max(math.ceil(4 / (2 * len(jax.devices()))), 1)
    assert f"training 2 epochs = {steps} steps" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out, "diffusion_pytorch_model.safetensors"))


def _make_instance_dir(tmp_path, n=3):
    from PIL import Image

    d = tmp_path / "instance"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (72, 72, 3)).astype(np.uint8), "RGB"
        ).save(d / f"img{i}.png")
    return str(d)


def _train_db(out, instance_dir, steps, resume=False, extra=()):
    import train_dreambooth as db_cli

    argv = [
        "--model_variant", "smoke", "--instance_data_dir", instance_dir,
        "--instance_prompt", "a sks toy", "--resolution", "64",
        "--train_batch_size", "1", "--max_train_steps", str(steps),
        "--output_dir", out, "--checkpointing_steps", "2",
        "--lr_warmup_steps", "0", "--log_every", "2", "--seed", "7",
    ] + list(extra)
    if resume:
        argv += ["--resume_from_checkpoint", "latest"]
    db_cli.main(argv)


def test_dreambooth_train_resume_and_checkpoint_artifact(tmp_path):
    """DreamBooth kill/resume parity (reference train_dreambooth_lora.py:846-867):
    the resumed run must reproduce the uninterrupted run's final LoRA exactly
    (optimizer state restored + data stream fast-forwarded), and every
    mid-training checkpoint must carry the loadable attn-procs artifact."""
    from controllora_tpu.utils.torch_compat import load_state_dict

    inst = _make_instance_dir(tmp_path)
    run_a = str(tmp_path / "straight")
    run_b = str(tmp_path / "resumed")
    _train_db(run_a, inst, steps=4)
    _train_db(run_b, inst, steps=2)
    assert os.path.exists(os.path.join(
        run_b, "checkpoint-2", "pytorch_lora_weights.safetensors"))
    _train_db(run_b, inst, steps=4, resume=True)
    a = load_state_dict(os.path.join(run_a, "pytorch_lora_weights.safetensors"))
    b = load_state_dict(os.path.join(run_b, "pytorch_lora_weights.safetensors"))
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-7)
    # a LoRA actually trained: weights moved away from zero-product init
    assert any(np.abs(np.asarray(v)).max() > 0 for k, v in a.items()
               if ".up." in k)

    # reference DreamBooth eval path (test_dreambooth_lora.py:824-886): sample
    # from the mid-training checkpoint and re-save the run-root artifact
    import sample as sample_cli

    os.remove(os.path.join(run_b, "pytorch_lora_weights.bin"))
    out = str(tmp_path / "db-eval")
    sample_cli.main([
        "--model_variant", "smoke", "--lora_weights", run_b,
        "--resume_from_checkpoint", "2", "--prompt", "a sks toy",
        "--num_validation_images", "1", "--num_inference_steps", "2",
        "--resolution", "64", "--output_dir", out, "--seed", "5",
    ])
    assert os.path.exists(os.path.join(out, "0.png"))
    assert os.path.exists(os.path.join(run_b, "pytorch_lora_weights.bin"))


def test_dreambooth_accum_prior_validation(tmp_path):
    """--gradient_accumulation_steps consumes N micro-batches per optimizer
    update (reference sync_gradients accounting, :913-924); prior preservation
    doubles the batch; --validation_prompt renders per-epoch images and the
    final test pass (:940-963, :997-1013)."""
    inst = _make_instance_dir(tmp_path, n=2)
    cls = str(tmp_path / "class")
    os.makedirs(cls, exist_ok=True)
    from PIL import Image

    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8), "RGB"
        ).save(os.path.join(cls, f"c{i}.png"))
    out = str(tmp_path / "db")
    _train_db(out, inst, steps=2, extra=[
        "--gradient_accumulation_steps", "2",
        "--with_prior_preservation", "--class_data_dir", cls,
        "--class_prompt", "a toy", "--prior_loss_weight", "0.5",
        "--validation_prompt", "a sks toy", "--num_validation_images", "1",
        "--validation_epochs", "2",
    ])
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.bin"))
    import glob

    # one per-epoch validation image (epoch 0) + one final test image
    pngs = glob.glob(os.path.join(out, "images", "*.png"))
    assert len(pngs) >= 2, pngs


def test_build_serving_mesh_parse():
    import sample as sample_cli

    assert sample_cli.build_serving_mesh(None) is None
    # latency-only spec: data stays 1 so a batch-1 render shards freely
    m = sample_cli.build_serving_mesh("cfg,model=2")
    assert dict(m.shape) == {"data": 1, "cfg": 2, "model": 2}
    m = sample_cli.build_serving_mesh("data,cfg,model=2")
    assert dict(m.shape) == {"data": 2, "cfg": 2, "model": 2}
    m = sample_cli.build_serving_mesh("data")
    assert dict(m.shape) == {"data": 8}
    with pytest.raises(SystemExit, match="unknown serving mesh axis"):
        sample_cli.build_serving_mesh("bogus")


def test_sample_serving_mesh_flag(tmp_path):
    """--serving_mesh routes the eval through the multi-chip sampler (here the
    full three-axis data×cfg×model composition on the 8-device test mesh)."""
    import sample as sample_cli
    import train as train_cli

    out = str(tmp_path / "run")
    train_cli.main([
        "--model_variant", "smoke", "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "1", "--max_train_steps", "1",
        "--output_dir", out, "--checkpointing_steps", "0",
        "--log_every", "1", "--seed", "3",
    ])
    odir = str(tmp_path / "s")
    sample_cli.main([
        "--model_variant", "smoke", "--control_lora_dir", out,
        "--resolution", "64", "--num_inference_steps", "2",
        "--num_validation_images", "1", "--serving_mesh", "cfg,model=2",
        "--output_dir", odir, "--seed", "4",
    ])
    assert os.path.exists(os.path.join(odir, "0.png"))


@pytest.mark.parametrize("variant", ["smoke2", "smokexl"])
def test_new_family_train_and_sample_cli(tmp_path, variant):
    """SD2/SDXL-shaped stacks through the real CLIs: 2 train steps (bucket
    layout re-derived for the family), then guided sampling from the saved
    artifact — plus the img2img/inpaint flags on the sample path."""
    import sample as sample_cli
    import train as train_cli
    from PIL import Image

    out = str(tmp_path / "run")
    train_cli.main([
        "--model_variant", variant, "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "1", "--max_train_steps", "2",
        "--output_dir", out, "--checkpointing_steps", "0",
        "--log_every", "1", "--seed", "5",
    ])
    init = str(tmp_path / "init.png")
    Image.fromarray(
        (np.random.RandomState(0).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    ).save(init)
    maskp = str(tmp_path / "mask.png")
    m = np.zeros((64, 64), np.uint8)
    m[:, :32] = 255
    Image.fromarray(m).save(maskp)
    odir = str(tmp_path / "s")
    sample_cli.main([
        "--model_variant", variant, "--control_lora_dir", out,
        "--resolution", "64", "--num_inference_steps", "2",
        "--num_validation_images", "1",
        "--init_image", init, "--mask_image", maskp, "--strength", "0.7",
        "--output_dir", odir, "--seed", "6",
    ])
    assert os.path.exists(os.path.join(odir, "0.png"))


def test_refiner_two_stage_cli(tmp_path):
    """--refiner_variant: the base (smokexl) renders [0, split) and the
    smokeref refiner continues the latent trajectory to the final image."""
    import sample as sample_cli
    import train as train_cli

    out = str(tmp_path / "run")
    train_cli.main([
        "--model_variant", "smokexl", "--dataset_name", "process/fill50k",
        "--resolution", "64", "--train_batch_size", "1", "--max_train_steps", "1",
        "--output_dir", out, "--checkpointing_steps", "0",
        "--log_every", "1", "--seed", "9",
    ])
    odir = str(tmp_path / "s")
    sample_cli.main([
        "--model_variant", "smokexl", "--control_lora_dir", out,
        "--resolution", "64", "--num_inference_steps", "4",
        "--num_validation_images", "1", "--refiner_variant", "smokeref",
        "--denoising_split", "0.5", "--output_dir", odir, "--seed", "7",
    ])
    assert os.path.exists(os.path.join(odir, "0.png"))


def test_train_kill_resume_and_sample(tmp_path):
    from controllora_tpu.training.checkpoint import load_control_lora

    run_a = str(tmp_path / "uninterrupted")
    run_b = str(tmp_path / "resumed")

    _train(run_a, steps=6, ckpt_every=100)       # straight 6-step run
    _train(run_b, steps=4, ckpt_every=2)         # "killed" after step 4
    assert os.path.isdir(os.path.join(run_b, "checkpoint-4"))
    # each checkpoint carries a directly sampleable reference-format artifact
    assert os.path.exists(os.path.join(
        run_b, "checkpoint-4", "control_lora", "config.json"))
    _train(run_b, steps=6, resume=True)          # resume 4 -> 6

    pa, _ = load_control_lora(run_a)
    pb, _ = load_control_lora(run_b)
    import jax

    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        # identical params: resume restores exact fp32 state AND fast-forwards the
        # data stream, so steps 5-6 consume the same batches + noise as run A
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # sample from the mid-training checkpoint (reference eval path)
    import sample as sample_cli

    out = str(tmp_path / "eval")
    sample_cli.main([
        "--model_variant", "smoke", "--control_lora_dir", run_b,
        "--resume_from_checkpoint", "4", "--num_validation_images", "1",
        "--num_inference_steps", "2", "--resolution", "64",
        "--output_dir", out, "--seed", "5",
    ])
    assert os.path.exists(os.path.join(out, "0.png"))
    # eval re-saved the run-root artifact from the checkpoint (reference parity)
    assert os.path.exists(os.path.join(run_b, "diffusion_pytorch_model.safetensors"))
