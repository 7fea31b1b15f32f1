"""Legacy HP sliding-window predictor (infer/hp_sliding.py): the lax.scan
must equal the reference's explicit window loop (hidden carry + ×10000
truncated softmax votes), and the HP prediction HDF5 layout must
round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from pepper_tpu.infer.hp_sliding import (
    TRAIN_WINDOW, VOTE_SCALE, WINDOW_JUMP, hp_votes_scan, predict_hp)
from pepper_tpu.io.datastore import PredictionStore
from pepper_tpu.models.polish_gru import PolishConfig, init_polish_params, \
    polish_forward


def reference_window_loop(params, images):
    """Literal re-statement of predict_hp_distributed_cpu.py:54-95: python
    loop, hidden carry, int-truncated scaled softmax, zero-pad add."""
    B, L, _ = images.shape
    C = params["output"]["w"].shape[1]
    hidden = jnp.zeros((B, 2, 128), images.dtype)
    votes = np.zeros((B, L, C), np.int64)
    for i in range(0, L, WINDOW_JUMP):
        if i + TRAIN_WINDOW > L:
            break
        logits, hidden = polish_forward(params, images[:, i:i + TRAIN_WINDOW],
                                        hidden)
        probs = jax.nn.softmax(np.asarray(logits, np.float32), axis=2)
        chunk = (np.asarray(probs) * VOTE_SCALE).astype(np.int64)
        votes[:, i:i + TRAIN_WINDOW] += chunk
    return votes


def test_scan_equals_window_loop():
    config = PolishConfig(image_features=12, hidden=128, num_classes=5)
    params = init_polish_params(jax.random.PRNGKey(0), config)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 300, 12))
    got = np.asarray(hp_votes_scan(params, images, allow_kernel=False))
    want = reference_window_loop(params, images)
    np.testing.assert_array_equal(got, want)
    # interior positions receive exactly two windows' votes
    interior = got[:, TRAIN_WINDOW:-TRAIN_WINDOW].sum(axis=2)
    assert interior.min() >= 2 * (VOTE_SCALE - 5)   # truncation slack
    assert interior.max() <= 2 * VOTE_SCALE


def test_predict_hp_pair():
    config = PolishConfig(image_features=8, hidden=128, num_classes=5)
    params = init_polish_params(jax.random.PRNGKey(2), config)
    im1 = jax.random.normal(jax.random.PRNGKey(3), (2, 200, 8))
    im2 = jax.random.normal(jax.random.PRNGKey(4), (2, 200, 8))
    v1, v2 = predict_hp(params, im1, im2, allow_kernel=False)
    assert v1.shape == v2.shape == (2, 200, 5)
    assert v1.dtype == np.int32
    # same model, different images -> different votes
    assert (v1 != v2).any()
    # identical inputs -> bit-identical votes (deterministic merge property)
    v1b, _ = predict_hp(params, im1, im2, allow_kernel=False)
    np.testing.assert_array_equal(v1, v1b)


def test_predict_hp_mesh_matches_single_device():
    """Mesh-sharded HP prediction (batch DP over the 8-device mesh, the
    predict_hp_distributed_gpu.py fan-out) must equal single-device votes
    bit-for-bit — the integer vote scaling makes the merge deterministic."""
    from pepper_tpu.parallel.mesh import get_mesh

    config = PolishConfig(image_features=8, hidden=128, num_classes=5)
    params = init_polish_params(jax.random.PRNGKey(5), config)
    # batch 5: not a multiple of 8 devices -> exercises pad + unpad
    im1 = jax.random.normal(jax.random.PRNGKey(6), (5, 200, 8))
    im2 = jax.random.normal(jax.random.PRNGKey(7), (5, 200, 8))
    v1, v2 = predict_hp(params, im1, im2, allow_kernel=False)
    mesh = get_mesh()
    m1, m2 = predict_hp(params, np.asarray(im1), np.asarray(im2),
                        allow_kernel=False, mesh=mesh)
    np.testing.assert_array_equal(m1, v1)
    np.testing.assert_array_equal(m2, v2)


def test_hp_prediction_store_roundtrip(tmp_path):
    path = str(tmp_path / "pred_hp.hdf5")
    position = np.arange(100, 300, dtype=np.int32)
    index = np.zeros(200, np.int32)
    votes1 = np.random.default_rng(0).integers(0, 20000, (200, 5))
    votes2 = np.random.default_rng(1).integers(0, 20000, (200, 5))
    with PredictionStore(path, "w") as store:
        store.write_prediction_hp("chr1", 100, 300, 0, position, index,
                                  votes1, votes2)
        store.write_prediction_hp("chr1", 100, 300, 1, position, index,
                                  votes2, votes1)
        # duplicate write is a no-op (resume semantics)
        store.write_prediction_hp("chr1", 100, 300, 0, position, index,
                                  votes2, votes2)
    with PredictionStore(path, "r") as store:
        keys = sorted(store.hp_chunk_keys())
        assert keys == [("chr1", 100, 300, 0), ("chr1", 100, 300, 1)]
        pos, idx, v1, v2 = store.read_prediction_hp("chr1", 100, 300, 0)
        np.testing.assert_array_equal(pos, position)
        np.testing.assert_array_equal(v1, votes1.astype(np.int16))
        np.testing.assert_array_equal(v2, votes2.astype(np.int16))
        assert v1.dtype == np.int16
