"""CLI-entry smoke tests: the MAD family and the 3-D BTCV MagicNet pipeline
run end-to-end from ``python -m mamba_unet_tpu.cli.train`` (VERDICT r1 #5:
'Done = both run in a smoke test from the CLI entry')."""

import os

import pytest

from mamba_unet_tpu.cli.train import main


def _run(argv):
    assert main(argv) == 0


def test_cli_mad_pretrain_and_finetune(tmp_path):
    snap = str(tmp_path / "mad_pre")
    _run([
        "--method", "mad_pretrain", "--model", "unet", "--synthetic",
        "--synthetic_spec", "2", "4", "1", "0", "32",
        "--patch_size", "32", "32", "--batch_size", "8",
        "--max_iterations", "3", "--eval_every", "1000",
        "--num_classes", "4", "--snapshot_dir", snap,
    ])
    # finetune warm-starts the denoisers from the pretrain snapshot
    _run([
        "--method", "mad_finetune", "--model", "unet", "--mad_model", "unet",
        "--synthetic", "--synthetic_spec", "2", "4", "1", "0", "32",
        "--patch_size", "32", "32", "--batch_size", "8",
        "--max_iterations", "3", "--eval_every", "1000",
        "--num_classes", "4", "--mad_ckpt", snap,
    ])


def test_cli_btcv_3d_magicnet(tmp_path):
    _run([
        "--dataset", "btcv", "--method", "magicnet", "--model", "magicnet",
        "--synthetic", "--patch_size", "32", "32", "32", "--cube_size", "16",
        "--batch_size", "8", "--labeled_bs", "2", "--max_iterations", "2",
        "--eval_every", "1000", "--num_classes", "14",
    ])


def test_cli_resume_roundtrip(tmp_path):
    """--resume picks up the latest periodic checkpoint (the kill-and-resume
    contract used by benchmarks/evidence3_resume.sh)."""
    snap = str(tmp_path / "snap")
    base = [
        "--method", "fully_supervised", "--model", "unet", "--synthetic",
        "--synthetic_spec", "2", "4", "1", "0", "32",
        "--patch_size", "32", "32", "--batch_size", "8",
        "--eval_every", "1000", "--num_classes", "4",
        "--snapshot_dir", snap, "--ckpt_every", "2",
    ]
    _run(base + ["--max_iterations", "3"])
    assert os.path.isdir(os.path.join(snap, "state_2"))
    # second invocation resumes at step 2 and must write the step-4 periodic
    _run(base + ["--max_iterations", "5", "--resume"])
    assert os.path.isdir(os.path.join(snap, "state_4"))
