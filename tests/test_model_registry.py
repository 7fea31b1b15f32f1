"""Model-family registry: every family trains through train_model, records
its family in checkpoint metadata, reloads through the auto-detecting
inference runner, and refuses cross-family retraining."""

import os

import h5py
import numpy as np
import pytest

from pepper_tpu.models.checkpoint import load_params
from pepper_tpu.models.registry import MODEL_TYPES, make_family


def write_labeled_images(path, n=96, seed=0):
    """Synthetic labeled windows where the type label is recoverable from
    the image (mean of channel 0 row): a learnable toy task."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 3, n).astype(np.uint8)
    images = rng.integers(-5, 5, (n, 33, 26)).astype(np.int8)
    images[:, :, 0] = (labels[:, None].astype(np.int8) * 40) - 40
    dt = h5py.special_dtype(vlen=str)
    with h5py.File(path, "w") as f:
        grp = "summaries/synth"
        f[f"{grp}/contigs"] = np.array([b"chr1"] * n, dtype="S")
        f[f"{grp}/positions"] = np.arange(n, dtype=np.int32)
        f[f"{grp}/depths"] = np.full(n, 30, np.uint8)
        f[f"{grp}/candidates"] = np.array([["1T"]] * n, dtype=dt)
        f[f"{grp}/candidate_frequency"] = np.array([[9]] * n, np.uint8)
        f[f"{grp}/images"] = images
        f[f"{grp}/base_labels"] = labels
        f[f"{grp}/type_label"] = labels
    return images, labels


@pytest.mark.parametrize("model_type", ["no_cnn", "transformer"])
def test_family_trains_and_infers(model_type, tmp_path):
    from pepper_tpu.infer.runner import InferenceRunner
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.train.trainer import train_model

    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_labeled_images(str(image_dir / "synth.hdf5"))

    out_dir = str(tmp_path / f"train_{model_type}")
    options = PepperOptions(batch_size=24)
    # the post-LN transformer diverges at 3e-3; it trains at 1e-3
    lr, epochs = ((1e-3, 8) if model_type == "transformer" else (3e-3, 6))
    model_path, accuracy = train_model(
        options, str(image_dir), out_dir, epochs=epochs, learning_rate=lr,
        step_size=10_000, batch_size=24, holdout_fraction=0.25, seed=0,
        model_type=model_type)

    params, meta = load_params(model_path)
    assert meta["model_type"] == model_type
    if model_type == "no_cnn":
        # the LSTM family learns the toy task quickly; the 6-layer post-LN
        # transformer needs warmup/longer schedules (as upstream's
        # experimental model would), so only the plumbing is asserted there
        assert accuracy > 60.0
    if model_type == "transformer":
        # BatchNorm running stats must be calibrated into the checkpoint
        # (not the init zeros/ones) so inference normalization matches what
        # the trained weights saw
        assert np.abs(np.asarray(params["bn1"]["mean"])).sum() > 0
        assert accuracy > 35.0    # above the 33% chance floor

    runner = InferenceRunner(params, batch_size=16, model_type=model_type)
    images = np.zeros((5, 33, 26), np.float32)
    images[:, :, 0] = 40.0   # class-2 signature
    probs = runner.predict_images(images)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)

    # cross-family retraining is refused with a named error
    with pytest.raises(ValueError, match="model_type"):
        train_model(options, str(image_dir), out_dir, epochs=1,
                    retrain_model_path=model_path, model_type="lstm")


def test_registry_families_uniform_surface():
    import jax

    for name in MODEL_TYPES:
        family = make_family(name)
        params = family.init(jax.random.PRNGKey(0))
        x = np.zeros((2, 33, 26), np.float32)
        logits = family.logits(params, x, False, None)
        assert logits.shape == (2, 3)
        probs = np.asarray(family.infer(params, x))
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    with pytest.raises(ValueError, match="unknown model_type"):
        make_family("bogus")


def test_quantized_rejects_non_lstm():
    import jax

    from pepper_tpu.infer.runner import InferenceRunner

    family = make_family("no_cnn")
    params = family.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="quantized"):
        InferenceRunner(params, quantized=True, model_type="no_cnn")
