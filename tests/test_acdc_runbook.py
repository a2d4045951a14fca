"""Dry smoke for the real-data drop-in gate (scripts/acdc_reproduce.sh).

Builds a tiny synthetic RAW ACDC nii.gz tree whose patient numbers land in
all three reference split buckets, then runs the actual runbook script
(preprocess -> train -> test, supervised config, 2 iterations) so the day
the real ACDC tree is available, Dice parity is one invocation away with a
command path that is already exercised end-to-end.
"""

import os
import subprocess

import numpy as np
import pytest

from mamba_unet_tpu.data.nifti import write_nifti
from mamba_unet_tpu.data.preprocess import (
    REFERENCE_TEST_PATIENTS,
    REFERENCE_VAL_PATIENTS,
    convert_acdc,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_raw_tree(root, rng, patients=(1, 2, 3, 4), n_slices=4, size=64):
    for p in patients:
        d = os.path.join(root, f"patient{p:03d}")
        os.makedirs(d, exist_ok=True)
        for frame in (1, 2):
            img = rng.uniform(0, 500, size=(size, size, n_slices)).astype(
                np.float32)
            lab = np.zeros((size, size, n_slices), np.uint8)
            c = size // 2
            lab[c - 8:c + 8, c - 8:c + 8] = 1
            lab[c - 4:c + 4, c - 4:c + 4] = 2
            lab[c - 2:c + 2, c - 2:c + 2] = 3
            base = os.path.join(d, f"patient{p:03d}_frame{frame:02d}")
            write_nifti(base + ".nii.gz", img)
            write_nifti(base + "_gt.nii.gz", lab)


def test_reference_split_lists(tmp_path, rng):
    raw = str(tmp_path / "raw")
    # patient001 -> test, patient002 -> val, patient003/004 -> train
    _make_raw_tree(raw, rng)
    out = str(tmp_path / "out")
    convert_acdc(raw, out, splits="reference")
    lists = {}
    for name in ("train", "val", "test"):
        with open(os.path.join(out, f"{name}.list")) as f:
            lists[name] = f.read().split()
    assert lists["val"] == ["patient002_frame01", "patient002_frame02"]
    assert lists["test"] == ["patient001_frame01", "patient001_frame02"]
    assert lists["train"] == [f"patient{p:03d}_frame{f:02d}"
                              for p in (3, 4) for f in (1, 2)]
    with open(os.path.join(out, "train_slices.list")) as f:
        ids = f.read().split()
    assert len(ids) == 4 * 4  # 4 train frames x 4 slices, no val/test leak
    assert all(i.startswith(("patient003", "patient004")) for i in ids)
    # slices exist only for train patients
    assert not os.path.exists(os.path.join(
        out, "data", "slices", "patient001_frame01_slice_0.h5"))
    # the split constants stay disjoint and reference-sized
    assert len(REFERENCE_VAL_PATIENTS) == 10
    assert len(REFERENCE_TEST_PATIENTS) == 20
    assert not (REFERENCE_VAL_PATIENTS & REFERENCE_TEST_PATIENTS)


@pytest.mark.slow
def test_runbook_script_dry(tmp_path, rng):
    """The actual shell script, tiny: preprocess -> 2-iter supervised train
    -> test on the synthetic raw tree."""
    raw = str(tmp_path / "raw")
    _make_raw_tree(raw, rng, patients=(1, 2, 3, 4), n_slices=4)
    work = str(tmp_path / "work")
    env = dict(
        os.environ,
        ACDC_RAW=raw,
        ITERS="2", BATCH="2", PATCH="64", EVAL_EVERY="2",
        CONFIGS="supervised",
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        # pytest's conftest forces an 8-device virtual CPU mesh; the tiny
        # batch-2 smoke must see ONE device or data sharding rejects it
        XLA_FLAGS="",
    )
    # the smoke replaces ViM_seg with unet via the script's own train/test
    # path? No — run the script as shipped but with the cheap env knobs; the
    # supervised config's model is part of the protocol, so keep ViM_seg and
    # accept the small compile (64^2 input, 2 iters).
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "acdc_reproduce.sh"), work],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert os.path.exists(os.path.join(
        work, "mambaunet_supervised_test.log"))
    with open(os.path.join(work, "mambaunet_supervised_test.log")) as f:
        log = f.read()
    assert "dice" in log.lower()
