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


def _region_scene(tmp_path, seed, name):
    """One region's BAM batch with snp/ins/del reads at varied positions."""
    rng = np.random.RandomState(seed)
    reads = [match_read(f"{name}m{i}") for i in range(6)]
    p = int(rng.randint(15, 25))
    snp_seq = REF[:p] + ("T" if REF[p] != "T" else "A") + REF[p + 1:]
    reads += [match_read(f"{name}s{i}", flag=(0x10 if i % 2 else 0),
                         seq=snp_seq) for i in range(4)]
    q = int(rng.randint(8, 14))
    ins_seq = REF[:q] + "GG" + REF[q:]
    reads += [BamRecord(f"{name}i{i}", 0, 0, 60, f"{q}M2I{40 - q}M",
                        ins_seq, [30] * 42) for i in range(3)]
    d = int(rng.randint(26, 33))
    del_seq = REF[:d] + REF[d + 3:]
    reads += [BamRecord(f"{name}d{i}", 0, 0, 60, f"{d}M3D{37 - d}M",
                        del_seq, [30] * 37) for i in range(3)]
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / f"{name}.bam")
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, 39)


def test_fused_batched_flows_match_host(tmp_path):
    """Both batched single-dispatch flows (native-image and event-stream)
    must reproduce the host pipeline's window probabilities across a batch
    of regions with different expanded sizes."""
    import jax

    from pepper_tpu.models.transducer import (TransducerConfig,
                                              init_transducer_params,
                                              transducer_apply)
    from pepper_tpu.ops.device_windows import (classify_regions_events,
                                               classify_regions_images)

    config = TransducerConfig(hidden=32, linear_size=64)
    params = init_transducer_params(jax.random.PRNGKey(1), config)

    host_windows_all = []
    images, event_list, ref_channels = [], [], []
    descriptor_list, region_sizes = [], []
    for seed in (3, 4, 5):
        batch = _region_scene(tmp_path, seed, f"r{seed}")
        host = RegionalSummary("chr1", 0, 39, REF)
        host.generate_max_insert_summary(batch)
        host_windows = host.generate_summary(batch, **THRESHOLDS)
        assert len(host_windows) >= 3
        host_windows_all.extend(host_windows)
        images.append(host.image_int8)
        region_sizes.append(host.region_rows)
        descriptor_list.append(
            descriptors_from_candidates(
                [(pos, cand, fwd, rev)
                 for pos, cand, fwd, rev in host.descriptor_rows], host))

        recorder = RegionalSummary("chr1", 0, 39, REF,
                                   matrix_backend="unused")
        recorder.generate_max_insert_summary(batch)
        recorder.matrix_backend = lambda rows, cols, deltas, shape: (
            setattr(recorder, "_events", (rows, cols, deltas))
            or np.zeros(shape, np.int64))
        recorder.generate_summary(batch, **THRESHOLDS)
        event_list.append(recorder._events)
        n_ref = 40
        ref_values = np.asarray(encode_reference_values(REF))
        if recorder.total_observed_insert_bases:
            ref_channel = np.repeat(
                ref_values, 1 + recorder.max_observed_insert[:n_ref])
        else:
            ref_channel = ref_values
        ref_channels.append(ref_channel)

    host_probs = np.asarray(transducer_apply(
        params,
        np.stack([w.image for w in host_windows_all]).astype(np.float32)))

    image_probs = np.asarray(classify_regions_images(
        params, images, descriptor_list, region_sizes))
    np.testing.assert_allclose(image_probs, host_probs, atol=1e-5)

    event_probs = np.asarray(classify_regions_events(
        params, event_list, ref_channels, descriptor_list, region_sizes))
    np.testing.assert_allclose(event_probs, host_probs, atol=1e-5)
