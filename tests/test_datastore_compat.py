"""HDF5 stores read both our own layout and reference-style files
(where candidates are (N, 1) vlen-str arrays and frequencies uint8)."""

import h5py
import numpy as np

from pepper_tpu.io.datastore import ImageStore, PredictionStore


def write_reference_style_images(path):
    """Emulates the reference DataStore.write_summary layout
    (DataStore.py:54-71): candidates as an (N, 1) vlen-str dataset."""
    dt = h5py.special_dtype(vlen=str)
    with h5py.File(path, "w") as f:
        grp = "summaries/chr1_0_100"
        f[f"{grp}/contigs"] = np.array([b"chr1", b"chr1"], dtype="S")
        f[f"{grp}/positions"] = np.array([10, 20], np.int32)
        f[f"{grp}/depths"] = np.array([30, 40], np.uint8)
        f[f"{grp}/candidates"] = np.array([["1T"], ["2AG"]], dtype=dt)
        f[f"{grp}/candidate_frequency"] = np.array([[12], [8]], np.uint8)
        f[f"{grp}/images"] = np.zeros((2, 33, 26), np.int8)
        f[f"{grp}/base_labels"] = np.array([1, 2], np.uint8)
        f[f"{grp}/type_label"] = np.array([1, 1], np.uint8)


def write_reference_style_predictions(path):
    dt = h5py.special_dtype(vlen=str)
    with h5py.File(path, "w") as f:
        grp = "predictions/batch_0"
        f[f"{grp}/contigs"] = np.array([b"chr1"], dtype="S")
        f[f"{grp}/positions"] = np.array([10], np.int32)
        f[f"{grp}/depths"] = np.array([30], np.uint8)
        f[f"{grp}/candidates"] = np.array([["1T"]], dtype=dt)
        f[f"{grp}/candidate_frequency"] = np.array([[12]], np.uint8)
        f[f"{grp}/base_prediction"] = np.array([[0.1, 0.8, 0.1]], np.float64)


def test_read_reference_style_image_file(tmp_path):
    path = str(tmp_path / "ref_style.hdf5")
    write_reference_style_images(path)
    with ImageStore(path, "r") as store:
        names = store.summary_names()
        assert names == ["chr1_0_100"]
        windows = store.read_summary(names[0])
    assert [w.candidates for w in windows] == [["1T"], ["2AG"]]
    assert [w.candidate_frequency for w in windows] == [[12], [8]]
    assert windows[0].depth == 30 and windows[1].position == 20


def test_read_reference_style_prediction_file(tmp_path):
    path = str(tmp_path / "ref_pred.hdf")
    write_reference_style_predictions(path)
    with PredictionStore(path, "r") as store:
        batch = store.read_batch("batch_0")
    assert batch[0].candidates == ["1T"]
    assert batch[0].candidate_frequency == [12]
    np.testing.assert_allclose(batch[0].prediction_base, [0.1, 0.8, 0.1])
