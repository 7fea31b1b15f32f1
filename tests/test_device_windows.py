"""Golden test: the fused on-device window path (Pallas histogram ->
device gather + injection -> classifier) must reproduce the host pipeline's
windows and probabilities exactly."""

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.ops.device_windows import (
    classify_region_device, descriptors_from_candidates,
    descriptors_to_tree, extract_windows_device)
from pepper_tpu.ops.pileup_ref import (
    EventMatrix, RegionalSummary, encode_reference_values)

from test_pileup import REF, THRESHOLDS, match_read


def build_scene(tmp_path):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads += [match_read(f"s{i}", flag=(0x10 if i % 2 else 0), seq=snp_seq)
              for i in range(4)]
    ins_seq = REF[:11] + "GG" + REF[11:]
    reads += [BamRecord(f"i{i}", 0, 0, 60, "11M2I29M", ins_seq, [30] * 42)
              for i in range(3)]
    del_seq = REF[:30] + REF[33:]
    reads += [BamRecord(f"d{i}", 0, 0, 60, "30M3D7M", del_seq, [30] * 37)
              for i in range(3)]
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / "fused.bam")
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, 39)


def test_fused_device_path_matches_host(tmp_path):
    import jax

    from pepper_tpu.models.transducer import (TransducerConfig,
                                              init_transducer_params,
                                              transducer_apply)

    batch = build_scene(tmp_path)

    # host golden windows
    host = RegionalSummary("chr1", 0, 39, REF)
    host.generate_max_insert_summary(batch)
    host_windows = host.generate_summary(batch, **THRESHOLDS)
    assert len(host_windows) >= 3  # snp + insert + delete

    # event stream via the recording matrix (same walker)
    recorder = RegionalSummary("chr1", 0, 39, REF,
                               matrix_backend="unused")
    recorder.generate_max_insert_summary(batch)
    recorder.matrix_backend = lambda rows, cols, deltas, shape: (
        setattr(recorder, "_events", (rows, cols, deltas))
        or np.zeros(shape, np.int64))
    recorder.generate_summary(batch, **THRESHOLDS)
    rows, cols, deltas = recorder._events

    # descriptors from the host windows (position, candidate, fwd, rev):
    # recover fwd/rev from the injected mid-row support columns
    candidates = []
    for w in host_windows:
        mid = w.image[16]
        digit = int(w.candidates[0][0])
        fwd_col, rev_col = {1: (5, 16), 2: (6, 17), 3: (7, 18)}[digit]
        candidates.append((w.position, w.candidates[0],
                           int(mid[fwd_col]), int(mid[rev_col])))
    descriptors = descriptors_from_candidates(candidates, host)

    # 1) device windows == host windows
    region_rows = 41
    image = np.zeros((region_rows, 26), np.int64)
    np.add.at(image, (rows, cols), deltas)
    image[:40, 0] += encode_reference_values(REF)
    image[:40, 11:25] = np.clip(image[:40, 11:25], -125, 125)
    device_windows = np.asarray(extract_windows_device(
        image.astype(np.int32), descriptors_to_tree(descriptors)))
    for i, w in enumerate(host_windows):
        np.testing.assert_array_equal(device_windows[i].astype(np.int32),
                                      w.image, err_msg=str(w.candidates))

    # 2) full fused path (Pallas histogram inside) == host model probs
    config = TransducerConfig(hidden=32, linear_size=64)
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    fused_probs = np.asarray(classify_region_device(
        params, rows, cols, deltas, encode_reference_values(REF),
        descriptors, region_rows))
    host_probs = np.asarray(transducer_apply(
        params, np.stack([w.image for w in host_windows])
        .astype(np.float32)))
    np.testing.assert_allclose(fused_probs, host_probs, atol=1e-5)
