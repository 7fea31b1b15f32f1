"""Inference-runner upload/pipeline semantics: int8 window images ship to
the device as int8 (4x less host->device traffic) and must be bit-identical
to the old float32 host upcast, and the dispatch/resolve split used by the
streaming pipeline must reproduce predict() exactly, in order."""

import numpy as np

from pepper_tpu.infer.runner import InferenceRunner
from pepper_tpu.models.transducer import (TransducerConfig,
                                          init_transducer_params)
from pepper_tpu.ops.pileup_ref import CandidateWindow


def _params(seed=0):
    import jax

    return init_transducer_params(jax.random.PRNGKey(seed),
                                  TransducerConfig())


def _windows(n, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        img = rng.integers(-125, 126, (33, 26)).astype(np.int8)
        out.append(CandidateWindow(
            contig="chr1", position=100 + i, depth=30,
            candidates=[f"{i % 4}T"], candidate_frequency=[9], image=img))
    return out


def test_int8_upload_bit_identical_to_float32():
    """predict_images(int8) == predict_images(float32) bitwise, for both
    the plain and the static-int8 runner (all lstm paths cast the input
    inside jit; |v|<=125 is exact in bfloat16)."""
    params = _params()
    images8 = np.stack([w.image for w in _windows(13)])
    images32 = images8.astype(np.float32)
    for kwargs in ({}, {"quantized": True},
                   {"quantized": True, "quantize_mode": "dynamic"},
                   {"compute_dtype": "bfloat16"}):
        runner = InferenceRunner(params, batch_size=8, **kwargs)
        p8 = runner.predict_images(images8)
        p32 = runner.predict_images(images32)
        np.testing.assert_array_equal(p8, p32)


def test_bucket_padding_invariance():
    """Probabilities are independent of the padded batch size (batch rows
    are independent through every layer), so bucket-padding partial
    batches — which cuts the upload of trailing chunks — cannot change
    results; and the bucket respects mesh divisibility."""
    params = _params()
    images = np.stack([w.image for w in _windows(10)])
    big = InferenceRunner(params, batch_size=4096)
    mid = InferenceRunner(params, batch_size=256)
    # at or above the 256-row bucket floor the padded batch size does not
    # change XLA's per-row numerics — bitwise equal
    np.testing.assert_array_equal(big.predict_images(images),
                                  mid.predict_images(images))
    # tiny (test-sized) batches may see reduction-order drift; close only
    small = InferenceRunner(params, batch_size=16)
    np.testing.assert_allclose(big.predict_images(images),
                               small.predict_images(images), atol=1e-5)
    assert big._bucket(10) == 256          # floor
    assert big._bucket(300) == 512         # next pow2
    assert big._bucket(4000) == 4096       # capped at batch_size
    assert small._bucket(10) == 16         # cap below floor


def test_dispatch_resolve_matches_predict():
    """The async dispatch/resolve pair used by the streaming drain must
    return exactly what the synchronous predict() returns."""
    params = _params()
    runner = InferenceRunner(params, batch_size=8)
    windows = _windows(8, seed=2)
    sync = runner.predict(windows)

    handle = runner.dispatch(windows)
    piped = runner.resolve(handle)
    assert len(piped) == len(sync)
    for a, b in zip(piped, sync):
        assert (a.contig, a.position, a.candidates) == \
            (b.contig, b.position, b.candidates)
        np.testing.assert_array_equal(a.prediction_base, b.prediction_base)

    # oversized chunk falls back to the multi-batch loop inside dispatch
    big = _windows(20, seed=3)
    handle = runner.dispatch(big)
    piped = runner.resolve(handle)
    sync = runner.predict(big)
    for a, b in zip(piped, sync):
        np.testing.assert_array_equal(a.prediction_base, b.prediction_base)

    # empty dispatch resolves to an empty list
    assert runner.resolve(runner.dispatch([])) == []


def test_stream_pipeline_order_and_values(tmp_path):
    """_stream_predictions with a pipelining runner preserves stream order
    and produces the same predictions as the non-pipelined path."""
    from pepper_tpu.pipeline.call_variant import _stream_predictions

    params = _params()
    runner = InferenceRunner(params, batch_size=4)
    windows = _windows(11, seed=4)

    class Opts:
        threads = 1
        batch_size = 4
        dry = False
        use_hp_info = False
        device_pileup = False
        bam = None
        fasta = None

    # monkeypatch create_region_summary via the single-interval path:
    # feed the windows through the sequential branch by calling the
    # pipelined drain directly on a fake interval worker
    import pepper_tpu.pipeline.call_variant as cv

    orig = cv.create_region_summary
    cv.create_region_summary = lambda *a, **k: windows
    orig_bam, orig_fasta = cv.BamReader, cv.FastaReader
    cv.BamReader = cv.FastaReader = lambda path: None
    try:
        preds, total = _stream_predictions(
            Opts(), [("chr1", 0, 1000)], [], runner.predict)
    finally:
        cv.create_region_summary = orig
        cv.BamReader, cv.FastaReader = orig_bam, orig_fasta

    assert total == len(windows)
    expected = runner.predict(windows)
    assert [p.position for p in preds] == [w.position for w in windows]
    for a, b in zip(preds, expected):
        np.testing.assert_array_equal(a.prediction_base, b.prediction_base)
