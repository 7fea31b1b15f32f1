"""Multi-chip inference: batch sharded over an 8-device mesh must produce
the same probabilities as single-device."""

import jax
import numpy as np

from pepper_tpu.infer.runner import InferenceRunner
from pepper_tpu.models.transducer import init_transducer_params
from pepper_tpu.parallel.mesh import get_mesh


def test_sharded_inference_matches_single_device():
    params = init_transducer_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = rng.randint(-125, 126, size=(37, 33, 26)).astype(np.float32)

    single = InferenceRunner(params, batch_size=16)
    mesh = get_mesh()
    assert len(mesh.devices.ravel()) == 8
    sharded = InferenceRunner(params, batch_size=16, mesh=mesh)
    # batch size rounded up to a device multiple
    assert sharded.batch_size % 8 == 0

    expected = single.predict_images(images)
    actual = sharded.predict_images(images)
    np.testing.assert_allclose(actual, expected, atol=1e-5)
