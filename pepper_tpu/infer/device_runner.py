"""Fused device-window inference: native int8 region images ship to HBM
and the window gather + feature injection + classifier run as ONE jitted
dispatch per region batch (ops/device_windows.py).  Selectable with
`--device_pileup`; the host default assembles window images in the
summarizer instead (PERFORMANCE.md records the measured rates for both).

Shapes are bucketed (stride, padded region count, padded window count) by
the shared helpers in ops/device_windows.py so repeated dispatches reuse
one compilation per bucket.
"""

from __future__ import annotations

import numpy as np

from ..decode.candidate_finder import CandidatePrediction
from ..ops.device_windows import classify_regions_images


class DeviceRegionRunner:
    """Consumes RegionPackage batches, returns CandidatePrediction lists
    (the same contract as InferenceRunner.predict over windows)."""

    def __init__(self, params, compute_dtype: str = "float32",
                 region_batch: int = 32, features: int = 26):
        import jax.numpy as jnp

        self.params = params
        self.compute_dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                              else jnp.float32)
        self.region_batch = region_batch
        self.features = features

    def predict(self, packages) -> list[CandidatePrediction]:
        predictions: list[CandidatePrediction] = []
        for i in range(0, len(packages), self.region_batch):
            predictions.extend(self._predict_batch(
                packages[i:i + self.region_batch]))
        return predictions

    def _predict_batch(self, packages):
        if not packages:
            return []
        probs = np.asarray(classify_regions_images(
            self.params, [p.image for p in packages],
            [p.descriptors for p in packages],
            [p.region_rows for p in packages],
            compute_dtype=self.compute_dtype,
            pad_regions=self.region_batch))

        predictions = []
        index = 0
        for package in packages:
            for window in package.windows:
                predictions.append(CandidatePrediction(
                    contig=window.contig, position=window.position,
                    depth=window.depth, candidates=window.candidates,
                    candidate_frequency=window.candidate_frequency,
                    prediction_base=probs[index].astype(np.float64)))
                index += 1
        assert index == len(probs)
        return predictions
