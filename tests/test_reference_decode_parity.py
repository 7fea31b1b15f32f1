"""External cross-validation: run the REFERENCE's own pure-Python decoder
(`/root/reference/pepper_variant/modules/python/CandidateFinder.py:356-581`)
against this package's `decode/candidate_finder.py` on identical prediction
sets, across all five platform presets and repeat/non-repeat contexts.

The reference module is imported with small stubs for its two non-stdlib
dependencies (its Options constants and the PEPPER_VARIANT pybind module)
plus an h5py shim that restores h5py-2.x semantics (vlen-str datasets read
back as `str`, which the reference's string-parsing relies on)."""

import importlib.util
import os
import sys
import types

import h5py
import numpy as np
import pytest

from pepper_tpu.decode.candidate_finder import (decode_predictions,
                                                find_candidates,
                                                repeat_annotation,
                                                CandidatePrediction)
from pepper_tpu.io.bam_writer import write_fasta
from pepper_tpu.io.datastore import PredictionStore
from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters

REF_CF = "/root/reference/pepper_variant/modules/python/CandidateFinder.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CF),
                                reason="reference checkout not present")

PRESETS = ["ont_r9_guppy5_sup", "ont_r9_guppy4_hac", "ont_r10_q20", "hifi",
           "clr"]


# ---------------------------------------------------------------- stubs ---

class _StubFastaHandler:
    """PEPPER_VARIANT.FASTA_handler equivalent over our FastaReader."""

    def __init__(self, path):
        self._reader = FastaReader(path)

    def get_reference_sequence(self, contig, start, stop):
        return self._reader.get_reference_sequence(contig, start, stop)


class _StubCandidateImagePrediction:
    """Pickle-able stand-in for the pybind CandidateImagePrediction
    (region_summary.h:114-136) — plain attribute bag."""

    def __init__(self, contig, position, depth, candidates,
                 candidate_frequency, prediction_base, prediction_type):
        self.contig = contig
        self.position = position
        self.depth = depth
        self.candidates = candidates
        self.candidate_frequency = candidate_frequency
        self.prediction_base = prediction_base
        self.prediction_type = prediction_type


class _H5Dataset:
    def __init__(self, dataset):
        self._dataset = dataset

    def __getitem__(self, key):
        info = h5py.check_string_dtype(self._dataset.dtype)
        if info is not None and info.length is None:
            return self._dataset.asstr()[key]  # h5py-2.x style str
        return self._dataset[key]


class _H5Node:
    def __init__(self, node):
        self._node = node

    def keys(self):
        return self._node.keys()

    def __getitem__(self, key):
        child = self._node[key]
        if isinstance(child, h5py.Dataset):
            return _H5Dataset(child)
        return _H5Node(child)


class _H5File(_H5Node):
    def __init__(self, path, mode="r"):
        self._file = h5py.File(path, mode)
        super().__init__(self._file)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._file.close()


@pytest.fixture(scope="module")
def ref_decode():
    stub_names = ["pepper_variant", "pepper_variant.modules",
                  "pepper_variant.modules.python",
                  "pepper_variant.modules.python.Options",
                  "pepper_variant.build"]
    saved = {name: sys.modules.get(name) for name in stub_names}

    pkg = types.ModuleType("pepper_variant")
    pkg.__path__ = []
    modules_pkg = types.ModuleType("pepper_variant.modules")
    modules_pkg.__path__ = []
    python_pkg = types.ModuleType("pepper_variant.modules.python")
    python_pkg.__path__ = []
    options_mod = types.ModuleType("pepper_variant.modules.python.Options")

    class PEPPERVariantCandidateFinderOptions:
        MOST_ALLOWED_CANDIDATES_PER_SITE = 2  # reference Options.py:78

    class ImageSizeOptions:
        pass

    options_mod.PEPPERVariantCandidateFinderOptions = \
        PEPPERVariantCandidateFinderOptions
    options_mod.ImageSizeOptions = ImageSizeOptions
    build_mod = types.ModuleType("pepper_variant.build")
    build_mod.PEPPER_VARIANT = types.SimpleNamespace(
        FASTA_handler=_StubFastaHandler,
        CandidateImagePrediction=_StubCandidateImagePrediction)

    sys.modules.update({
        "pepper_variant": pkg,
        "pepper_variant.modules": modules_pkg,
        "pepper_variant.modules.python": python_pkg,
        "pepper_variant.modules.python.Options": options_mod,
        "pepper_variant.build": build_mod,
    })
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_candidate_finder", REF_CF)
        module = importlib.util.module_from_spec(spec)
        sys.modules["reference_candidate_finder"] = module
        spec.loader.exec_module(module)
    finally:
        for name, original in saved.items():
            if original is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = original
    module.h5py = types.SimpleNamespace(File=_H5File)
    return module


# --------------------------------------------------------------- fixture --

def _build_reference_sequence():
    """~4kb contig with designed homopolymer runs, an N patch, and normal
    sequence, so candidate positions hit both repeat branches."""
    rng = np.random.RandomState(1234)
    bases = np.array(list("ACGT"))
    seq = list("".join(rng.choice(bases, 4000)))
    # break up accidental homopolymer runs >= 4 in the random background
    for i in range(3, len(seq)):
        if seq[i] == seq[i - 1] == seq[i - 2] == seq[i - 3]:
            seq[i] = "ACGT"[("ACGT".index(seq[i]) + 1) % 4]
    for start in range(200, 3800, 400):         # repeat contexts
        for k in range(6):
            seq[start + k] = "A"
    seq[1000:1003] = list("NNN")                 # invalid ref bases
    return "".join(seq)


def _simulated_predictions(ref, n=400, seed=77):
    """Randomized candidate windows hitting every decode branch: all three
    alt types, valid/invalid alleles, genotypes 0/1/2 (incl. ties),
    low/high non-alt probabilities, VAF-override freqs, delete chains."""
    rng = np.random.RandomState(seed)
    predictions = []
    for i in range(n):
        kind = rng.randint(0, 5)
        if kind == 0:                            # inside a homopolymer run
            position = int(rng.choice(range(200, 3800, 400))) + \
                int(rng.randint(0, 6))
        elif kind == 1:                          # N reference base
            position = 1000 + int(rng.randint(0, 3))
        elif kind == 2:                          # near contig edges
            position = int(rng.choice([1, 3, 7, 3995, 3998]))
        else:
            position = int(rng.randint(20, 3980))
        depth = int(rng.randint(8, 200))
        n_alleles = int(rng.randint(1, 4))
        candidates, frequencies = [], []
        for _ in range(n_alleles):
            alt_type = str(rng.randint(1, 4))
            length = 1 if alt_type == "1" else int(rng.randint(2, 6))
            allele = "".join(rng.choice(list("ACGT"), length))
            if rng.random_sample() < 0.15:       # invalid allele branch
                allele = allele[:-1] + rng.choice(list("N*R"))
            candidates.append(alt_type + allele)
            frequencies.append(int(rng.randint(1, depth + 1)))
        # probability vector: sometimes exact ties, sometimes peaked
        style = rng.randint(0, 4)
        if style == 0:
            prediction = np.array([0.4, 0.4, 0.2])
        elif style == 1:
            prediction = np.array([1.0, 0.0, 0.0])
        else:
            prediction = rng.dirichlet([1.0, 1.0, 1.0])
        predictions.append(CandidatePrediction(
            contig="ctg", position=position, depth=depth,
            candidates=candidates, candidate_frequency=frequencies,
            prediction_base=np.asarray(prediction, np.float64)))
    # deterministic positional ordering like the production path
    predictions.sort(key=lambda p: p.position)
    return predictions


def _normalize(value):
    if isinstance(value, np.ndarray):
        return tuple(float(x) for x in value)
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, (list, tuple)):
        return tuple(_normalize(v) for v in value)
    return value


def _options_for(preset, fasta_path):
    options = PepperOptions()
    setattr(options, preset, True)
    options.sub_command = "find_candidates"
    options = set_parameters(options)
    options.fasta = fasta_path
    return options


@pytest.fixture(scope="module")
def decode_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ref_parity")
    ref = _build_reference_sequence()
    fasta_path = str(tmp / "ref.fa")
    write_fasta(fasta_path, {"ctg": ref})
    predictions = _simulated_predictions(ref)
    h5_path = str(tmp / "predictions.hdf5")
    with PredictionStore(h5_path, "w") as store:
        store.write_prediction(0, predictions)
    return fasta_path, h5_path, predictions


# ----------------------------------------------------------------- tests --

def test_repeat_annotation_matches_reference(ref_decode):
    rng = np.random.RandomState(5)
    for _ in range(30):
        sequence = "".join(rng.choice(list("ACGT"),
                                      int(rng.randint(1, 40))))
        for kmer in (1, 2, 3):
            assert repeat_annotation(sequence, kmer) == \
                ref_decode.repeat_annotation(sequence, kmer), \
                (sequence, kmer)


@pytest.mark.parametrize("preset", PRESETS)
def test_decode_parity_all_presets(ref_decode, decode_fixture, preset):
    fasta_path, h5_path, predictions = decode_fixture
    options = _options_for(preset, fasta_path)

    ref_margin, ref_deepvariant = ref_decode.small_chunk_stitch(
        options, [(h5_path, "batch_0")])

    with PredictionStore(h5_path, "r") as store:
        roundtrip = store.read_batch("batch_0")
    my_margin, my_deepvariant = decode_predictions(
        options, roundtrip, FastaReader(fasta_path))

    assert len(my_margin) == len(ref_margin) > 0
    assert len(my_deepvariant) == len(ref_deepvariant) > 0
    for mine, theirs in zip(my_margin, ref_margin):
        assert _normalize(mine) == _normalize(theirs)
    for mine, theirs in zip(my_deepvariant, ref_deepvariant):
        assert _normalize(mine) == _normalize(theirs)


def test_decode_parity_vaf_override_branch(ref_decode, decode_fixture):
    """All presets ship report_*_above_freq=0, which disables the
    VAF-override gates (CandidateFinder.py:492-520 `elif 0 < ... <= vaf`);
    force them on to cross-validate those branches too — including the
    delete quirk where the override appends the deleted ref sequence as
    the alt."""
    fasta_path, h5_path, _ = decode_fixture
    options = _options_for("ont_r9_guppy5_sup", fasta_path)
    options.snp_p_value = options.insert_p_value = options.delete_p_value = 2.0
    options.snp_p_value_in_lc = options.insert_p_value_in_lc = 2.0
    options.delete_p_value_in_lc = 2.0           # p-gates never pass
    options.report_snp_above_freq = 0.2
    options.report_indel_above_freq = 0.3        # only VAF overrides fire

    ref_margin, ref_deepvariant = ref_decode.small_chunk_stitch(
        options, [(h5_path, "batch_0")])
    with PredictionStore(h5_path, "r") as store:
        roundtrip = store.read_batch("batch_0")
    my_margin, my_deepvariant = decode_predictions(
        options, roundtrip, FastaReader(fasta_path))

    assert len(my_deepvariant) == len(ref_deepvariant) > 0
    for mine, theirs in zip(my_margin, ref_margin):
        assert _normalize(mine) == _normalize(theirs)
    for mine, theirs in zip(my_deepvariant, ref_deepvariant):
        assert _normalize(mine) == _normalize(theirs)


def test_find_candidates_dedup_parity(ref_decode, decode_fixture):
    """The global sort + positional (ref, alt) dedup merge
    (CandidateFinder.py:549-581) must agree with ours."""
    fasta_path, h5_path, predictions = decode_fixture
    options = _options_for("ont_r9_guppy5_sup", fasta_path)

    ref_margin, ref_deepvariant = ref_decode.small_chunk_stitch(
        options, [(h5_path, "batch_0")])
    my_margin, my_deepvariant = decode_predictions(
        options, predictions, FastaReader(fasta_path))

    contigs, margin_dict, dv_dict = find_candidates(my_margin,
                                                    my_deepvariant)

    # replicate the reference merge body on its own lists
    ref_margin = sorted(ref_margin, key=lambda x: (x[0], x[1]))
    ref_deepvariant = sorted(ref_deepvariant, key=lambda x: (x[0], x[1]))
    seen = {}
    ref_margin_dict = {}
    for candidate in ref_margin:
        key = (candidate[0], candidate[1])
        ref_alt = (candidate[3], candidate[4][0])
        if ref_alt in seen.setdefault(key, []):
            continue
        seen[key].append(ref_alt)
        ref_margin_dict.setdefault(key, []).append(candidate)
    seen = {}
    ref_contigs = []
    ref_dv_dict = {}
    for candidate in ref_deepvariant:
        if candidate[0] not in ref_contigs:
            ref_contigs.append(candidate[0])
        key = (candidate[0], candidate[1])
        ref_alt = (candidate[3], candidate[4][0])
        if ref_alt in seen.setdefault(key, []):
            continue
        seen[key].append(ref_alt)
        ref_dv_dict.setdefault(key, []).append(candidate)

    assert contigs == ref_contigs
    assert {(k, tuple(_normalize(c) for c in v))
            for k, v in margin_dict.items()} == \
           {(_normalize(k), tuple(_normalize(c) for c in v))
            for k, v in ref_margin_dict.items()}
    assert {(k, tuple(_normalize(c) for c in v))
            for k, v in dv_dict.items()} == \
           {(_normalize(k), tuple(_normalize(c) for c in v))
            for k, v in ref_dv_dict.items()}
