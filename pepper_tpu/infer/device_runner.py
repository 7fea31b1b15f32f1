"""Fused device-window inference: native int8 region images ship to HBM
and the window gather + feature injection + classifier run as ONE jitted
dispatch per region batch (ops/device_windows.py).  Selectable with
`--device_pileup`; the host default assembles window images in the
summarizer instead (PERFORMANCE.md records the measured rates for both).

Shapes are bucketed (stride, padded region count, padded window count) so
repeated dispatches reuse one compilation per bucket.
"""

from __future__ import annotations

import numpy as np

from ..decode.candidate_finder import CandidatePrediction
from ..ops.device_windows import HALF, _fused_images_classify

_DESCRIPTOR_NAMES = ("base_index", "type_digit", "type_value", "depth_fwd",
                     "depth_rev", "flip_fwd_col", "flip_rev_col",
                     "star_fwd_col", "star_rev_col", "del_len")


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


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
        # stride bucket: margins + tallest region, rounded so repeated
        # dispatches share a compilation
        rows_max = max(p.region_rows for p in packages)
        stride = _round_up(rows_max + 2 * HALF, 256)
        n_regions = self.region_batch
        stacked = np.zeros((n_regions * stride, self.features), np.int8)
        k_total = 0
        for r, package in enumerate(packages):
            offset = r * stride + HALF
            stacked[offset:offset + package.image.shape[0]] = package.image
            k_total += len(package.descriptors.base_index)
        k_padded = max(128, _round_up(k_total, 128))
        merged = {}
        for name in _DESCRIPTOR_NAMES:
            parts = []
            for r, package in enumerate(packages):
                values = np.asarray(getattr(package.descriptors, name),
                                    np.int32)
                if name == "base_index":
                    values = values + np.int32(r * stride + HALF)
                parts.append(values)
            column = np.concatenate(parts) if parts else \
                np.zeros(0, np.int32)
            padded = np.zeros(k_padded, np.int32)
            padded[:k_total] = column
            if name == "type_digit":
                padded[k_total:] = 1  # harmless snp-shaped dummies
            merged[name] = padded
        probs = np.asarray(_fused_images_classify(
            self.params, stacked, merged,
            compute_dtype=self.compute_dtype))[:k_total]

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
        assert index == k_total
        return predictions
