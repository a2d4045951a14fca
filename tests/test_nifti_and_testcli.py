"""NIfTI round-trip + test-CLI end-to-end on synthetic data."""

import os

import numpy as np
import pytest

from mamba_unet_tpu.data.nifti import read_nifti, write_nifti


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
@pytest.mark.parametrize("gz", [False, True])
def test_nifti_roundtrip(tmp_path, rng, dtype, gz):
    data = (rng.uniform(0, 100, size=(7, 9, 4))).astype(dtype)
    path = str(tmp_path / ("vol.nii.gz" if gz else "vol.nii"))
    write_nifti(path, data, spacing=(1.0, 1.0, 10.0))
    back, spacing = read_nifti(path)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(spacing, [1.0, 1.0, 10.0])


def test_preprocess_roundtrip(tmp_path, rng):
    from mamba_unet_tpu.data.preprocess import convert_case
    import h5py

    img = rng.uniform(0, 500, size=(12, 14, 3)).astype(np.float32)
    lab = rng.integers(0, 4, size=(12, 14, 3)).astype(np.uint8)
    write_nifti(str(tmp_path / "img.nii.gz"), img)
    write_nifti(str(tmp_path / "lab.nii.gz"), lab)
    n = convert_case(str(tmp_path / "img.nii.gz"), str(tmp_path / "lab.nii.gz"),
                     "case01", str(tmp_path))
    assert n == 3
    with h5py.File(str(tmp_path / "data" / "case01.h5")) as f:
        vol = np.asarray(f["image"])
        assert vol.shape == (3, 12, 14)
        assert 0.0 <= vol.min() and vol.max() <= 1.0
    assert os.path.exists(str(tmp_path / "data" / "slices" / "case01_slice_2.h5"))


def test_cli_test_end_to_end(tmp_path, rng):
    from mamba_unet_tpu.cli.test import build_parser, run_inference
    from mamba_unet_tpu.data import make_synthetic_acdc
    import h5py

    root = make_synthetic_acdc(str(tmp_path / "acdc"), n_train_cases=1,
                               slices_per_case=3, n_val_cases=0,
                               n_test_cases=2, size=32)
    args = build_parser().parse_args([
        "--root_path", root, "--model", "unet", "--patch_size", "32", "32",
        "--split", "test", "--save_nii_dir", str(tmp_path / "nii"),
        "--write_pred_key", "pred_test",
    ])
    result = run_inference(args)
    assert result["per_case"].shape == (2, 3, 3)
    assert np.isfinite(result["mean"]).all()
    assert os.path.exists(str(tmp_path / "nii" / "test_patient000_pred.nii.gz"))
    with h5py.File(os.path.join(root, "data", "test_patient000.h5")) as f:
        assert "pred_test" in f
        assert f["pred_test"].shape == (3, 32, 32)


def test_cli_test_stacked_denoiser(tmp_path, rng):
    """Stacked seg->denoiser inference (--denoiser_model): both raw and
    denoised metric tables come back finite (the Inference_seg_ema_model /
    Inference_mad_model protocol, test_2D_fully.py:172-308)."""
    from mamba_unet_tpu.cli.test import build_parser, run_inference
    from mamba_unet_tpu.data import make_synthetic_acdc

    root = make_synthetic_acdc(str(tmp_path / "acdc"), n_train_cases=1,
                               slices_per_case=3, n_val_cases=0,
                               n_test_cases=1, size=32)
    args = build_parser().parse_args([
        "--root_path", root, "--model", "unet", "--patch_size", "32", "32",
        "--split", "test", "--denoiser_model", "unet",
    ])
    result = run_inference(args)
    assert result["per_case"].shape == (1, 3, 3)
    assert result["per_case_denoised"].shape == (1, 3, 3)
    assert np.isfinite(result["mean"]).all()
    assert np.isfinite(result["mean_denoised"]).all()


def test_preprocess_scribble_tree(tmp_path, rng):
    """convert_acdc picks up WSL4MIS *_scribble.nii.gz files: scribble lands
    in the h5s, and the scribble nii is NOT mistaken for an image frame."""
    import h5py

    from mamba_unet_tpu.data.preprocess import convert_acdc

    raw = tmp_path / "raw" / "patient001"
    raw.mkdir(parents=True)
    img = rng.uniform(0, 500, size=(12, 14, 3)).astype(np.float32)
    lab = rng.integers(0, 4, size=(12, 14, 3)).astype(np.uint8)
    scr = np.full((12, 14, 3), 4, np.uint8)
    scr[4:6, 4:8] = 1
    write_nifti(str(raw / "patient001_frame01.nii.gz"), img)
    write_nifti(str(raw / "patient001_frame01_gt.nii.gz"), lab)
    write_nifti(str(raw / "patient001_frame01_scribble.nii.gz"), scr)
    out = str(tmp_path / "out")
    convert_acdc(str(tmp_path / "raw"), out, splits="all")

    with open(os.path.join(out, "all_cases.list")) as f:
        assert f.read().split() == ["patient001_frame01"]
    with h5py.File(os.path.join(out, "data", "slices",
                                "patient001_frame01_slice_0.h5")) as f:
        np.testing.assert_array_equal(np.asarray(f["scribble"]), scr[:, :, 0])
    with h5py.File(os.path.join(out, "data", "patient001_frame01.h5")) as f:
        assert f["scribble"].shape == (3, 12, 14)
