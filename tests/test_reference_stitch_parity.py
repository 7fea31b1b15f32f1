"""External cross-validation: run the REFERENCE's own polish stitcher
(`/root/reference/pepper/modules/python/Stitch.py:36-128`) against this
package's `polish/stitch.py` + `polish/pipeline.perform_stitch` on shared
prediction HDF5s (our PolishPredictionStore writes the reference's
predictions/<contig>/<contig-start-end>/<chunk>/... layout).

Covers the quirks that matter: lexical (string) chunk-key sort deciding
override order for conflicting overlap predictions with 10+ chunks, the
2*MIN_IMAGE_OVERLAP buffer drop for regions with _st > 0, and negative
position/index filtering."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from pepper_tpu.polish.datastore import PolishPredictionStore
from pepper_tpu.polish.pipeline import perform_stitch

REF_STITCH = "/root/reference/pepper/modules/python/Stitch.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_STITCH),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_stitch():
    """Import the reference Stitch module with its Options dependency
    stubbed; keep it importable by name so its functions can be pickled
    into fork-started pool workers."""
    options = types.ModuleType("pepper.modules.python.Options")

    class ImageSizeOptions:
        MIN_IMAGE_OVERLAP = 100

    options.ImageSizeOptions = ImageSizeOptions
    stubs = {
        "pepper": types.ModuleType("pepper"),
        "pepper.modules": types.ModuleType("pepper.modules"),
        "pepper.modules.python": types.ModuleType("pepper.modules.python"),
        "pepper.modules.python.Options": options,
    }
    saved = {key: sys.modules.get(key) for key in stubs}
    sys.modules.update(stubs)
    added_np_int = False
    if not hasattr(np, "int"):  # removed in numpy>=1.24; Stitch.py predates
        np.int = int
        added_np_int = True
    try:
        spec = importlib.util.spec_from_file_location("reference_stitch",
                                                      REF_STITCH)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        sys.modules["reference_stitch"] = module
        yield module
    finally:
        sys.modules.pop("reference_stitch", None)
        for key, original in saved.items():
            if original is None:
                sys.modules.pop(key, None)
            else:
                sys.modules[key] = original
        if added_np_int:
            del np.int


def _write_predictions(path, contig, regions, rng, n_chunks=12,
                       with_negatives=True):
    """Overlapping chunks (40-position overlap, independently-random labels
    so overlaps CONFLICT and override order is observable) across regions
    whose mutual overlap is absorbed by the reference's buffer drop."""
    with PolishPredictionStore(path, "w") as store:
        for start, end in regions:
            for chunk_id in range(n_chunks):
                chunk_start = start + chunk_id * 80
                pos_rows, idx_rows = [], []
                for pos in range(chunk_start, chunk_start + 120):
                    pos_rows.append(pos)
                    idx_rows.append(0)
                    if pos % 37 == 0:  # insert columns
                        pos_rows.append(pos)
                        idx_rows.append(1)
                        pos_rows.append(pos)
                        idx_rows.append(2)
                if with_negatives and chunk_id == 3:
                    pos_rows.extend([-1, chunk_start])
                    idx_rows.extend([0, -1])
                labels = rng.randint(0, 5, size=len(pos_rows))
                phred = rng.randint(0, 60, size=len(pos_rows))
                store.write_prediction(contig, start, end, chunk_id,
                                       pos_rows, idx_rows, labels, phred)


def test_stitch_matches_reference(ref_stitch, tmp_path):
    rng = np.random.RandomState(5)
    prediction_dir = str(tmp_path / "preds")
    os.makedirs(prediction_dir)
    path = os.path.join(prediction_dir, "polish_pred_0.hdf")
    regions = [(0, 1200), (1100, 2300)]
    _write_predictions(path, "ctg1", regions, rng)

    # reference consensus (its own process-pool path, threads=2)
    chunk_keys = [(path, f"ctg1-{start}-{end}", start, end)
                  for start, end in regions]
    expected = ref_stitch.create_consensus_sequence("ctg1", chunk_keys,
                                                    threads=2)

    fasta = perform_stitch(prediction_dir, str(tmp_path / "out"))
    with open(fasta) as f:
        lines = f.read().splitlines()
    assert lines[0] == ">ctg1"
    actual = lines[1]

    assert len(expected) > 1000  # label 0 decodes to '' (~1/5 dropped)
    assert actual == expected


def test_stitch_matches_reference_multifile(ref_stitch, tmp_path):
    """Two prediction files (the sharded layout: one per host/worker), two
    contigs; the reference stitches per contig over all files."""
    rng = np.random.RandomState(9)
    prediction_dir = str(tmp_path / "preds")
    os.makedirs(prediction_dir)
    path_a = os.path.join(prediction_dir, "polish_pred_0.hdf")
    path_b = os.path.join(prediction_dir, "polish_pred_1.hdf")
    _write_predictions(path_a, "ctg1", [(0, 1200)], rng)
    with PolishPredictionStore(path_b, "w") as store:
        for chunk_id in range(11):
            start = 1100
            chunk_start = start + chunk_id * 80
            pos_rows = list(range(chunk_start, chunk_start + 120))
            labels = rng.randint(0, 5, size=len(pos_rows))
            store.write_prediction("ctg1", start, 2300, chunk_id, pos_rows,
                                   [0] * len(pos_rows), labels,
                                   np.zeros(len(pos_rows), np.uint8))
        store.write_prediction("ctg2", 0, 500,  0, list(range(0, 400)),
                               [0] * 400, rng.randint(1, 5, size=400),
                               np.zeros(400, np.uint8))

    expected = {}
    expected["ctg1"] = ref_stitch.create_consensus_sequence(
        "ctg1", [(path_a, "ctg1-0-1200", 0, 1200),
                 (path_b, "ctg1-1100-2300", 1100, 2300)], threads=2)
    expected["ctg2"] = ref_stitch.create_consensus_sequence(
        "ctg2", [(path_b, "ctg2-0-500", 0, 500)], threads=2)

    fasta = perform_stitch(prediction_dir, str(tmp_path / "out"))
    actual = {}
    with open(fasta) as f:
        name = None
        for line in f.read().splitlines():
            if line.startswith(">"):
                name = line[1:]
            else:
                actual[name] = line
    assert set(actual) == {"ctg1", "ctg2"}
    for contig in actual:
        assert actual[contig] == expected[contig], contig
