"""Training-image merge helpers (utils/merge_images.py vs reference
helper/merge_train_images.py): flat index build/resolve and physical merge."""

import h5py
import numpy as np

from pepper_tpu.utils.merge_images import (
    image_files_in,
    merge_image_index,
    merge_image_stores,
    read_indexed_record,
)


def write_store(path, regions):
    dt = h5py.special_dtype(vlen=str)
    with h5py.File(path, "w") as f:
        for name, n in regions:
            grp = f"summaries/{name}"
            f[f"{grp}/contigs"] = np.array([b"chr1"] * n, dtype="S")
            f[f"{grp}/positions"] = np.arange(n, dtype=np.int32)
            f[f"{grp}/depths"] = np.full(n, 30, np.uint8)
            f[f"{grp}/candidates"] = np.array([["1T"]] * n, dtype=dt)
            f[f"{grp}/candidate_frequency"] = np.array([[9]] * n, np.uint8)
            f[f"{grp}/images"] = np.zeros((n, 33, 26), np.int8)


def test_merge_index_and_resolve(tmp_path):
    d = tmp_path / "images"
    d.mkdir()
    write_store(str(d / "a.hdf5"), [("chr1_0_100", 3)])
    write_store(str(d / "b.hdf"), [("chr1_100_200", 2), ("chr1_200_300", 1)])
    (d / "notes.txt").write_text("ignored")

    assert len(image_files_in(str(d))) == 2
    index_path = str(tmp_path / "merged_index.hdf")
    total = merge_image_index(str(d), index_path)
    assert total == 6

    # every record resolves to a real (file, region, image) triple
    seen = set()
    for rid in range(total):
        path, region, image_index = read_indexed_record(index_path, rid)
        with h5py.File(path, "r") as fh:
            assert image_index < fh["summaries"][region]["images"].shape[0]
        seen.add((path, region, image_index))
    assert len(seen) == 6


def test_merge_stores_physical(tmp_path):
    d = tmp_path / "images"
    d.mkdir()
    write_store(str(d / "a.hdf5"), [("r1", 2)])
    write_store(str(d / "b.hdf5"), [("r1", 4)])   # same region name
    out = str(tmp_path / "merged.hdf5")
    copied = merge_image_stores(str(d), out)
    assert copied == 2
    with h5py.File(out, "r") as fh:
        names = sorted(fh["summaries"].keys())
        assert names == ["f0_r1", "f1_r1"]
        assert fh["summaries/f0_r1/images"].shape == (2, 33, 26)
        assert fh["summaries/f1_r1/images"].shape == (4, 33, 26)
