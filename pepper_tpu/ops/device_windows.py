"""Device-side candidate-window extraction + feature injection.

Completes the north-star on-device region flow: the region image (built by
the Pallas histogram kernel from the host event stream) never leaves HBM —
windows are gathered with vmapped dynamic slices and the per-candidate
type-specific features (region_summary.cpp:848-904: type/length columns,
fwd/rev support, sign flips, delete-span fill) are injected with one-hot
masks, then fed straight to the classifier.

Host-side prep is tiny: per candidate, a dozen scalars
(CandidateDescriptors).  Golden-tested against the host windows from
RegionalSummary.generate_summary.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..options import ImageOptions

MAX_COLOR = ImageOptions.MAX_COLOR_VALUE


@dataclass
class CandidateDescriptors:
    """Per-candidate injection scalars, all (K,) int32."""

    base_index: np.ndarray      # expanded row of the candidate
    type_digit: np.ndarray      # 1 snp / 2 insert / 3 delete
    type_value: np.ndarray      # col1 alt value (snp) or len-1 (indel)
    depth_fwd: np.ndarray       # clamped fwd support
    depth_rev: np.ndarray
    flip_fwd_col: np.ndarray    # supporting-observation column to sign-flip
    flip_rev_col: np.ndarray
    star_fwd_col: np.ndarray    # '*' columns for the delete span fill
    star_rev_col: np.ndarray
    del_len: np.ndarray         # candidate length - 1 (0 for snp)


def descriptors_from_candidates(candidates, summary):
    """Build CandidateDescriptors from (position, candidate_string,
    allele_fwd, allele_rev) tuples + a RegionalSummary (for ref bases)."""
    from .pileup_ref import get_feature_index, get_reference_feature_value

    rows = {name: [] for name in ("base_index", "type_digit", "type_value",
                                  "depth_fwd", "depth_rev", "flip_fwd_col",
                                  "flip_rev_col", "star_fwd_col",
                                  "star_rev_col", "del_len")}
    for position, candidate, fwd, rev in candidates:
        ref_base = summary.reference_sequence[position - summary.ref_start]
        type_digit = int(candidate[0])
        if type_digit == 1:
            type_value = get_reference_feature_value(candidate[1])
            flip_f = get_feature_index(ref_base, candidate[1], False)
            flip_r = get_feature_index(ref_base, candidate[1], True)
        elif type_digit == 2:
            type_value = min(len(candidate) - 1, MAX_COLOR)
            flip_f = get_feature_index(ref_base, "I", False)
            flip_r = get_feature_index(ref_base, "I", True)
        else:
            type_value = min(len(candidate) - 1, MAX_COLOR)
            flip_f = get_feature_index(ref_base, "D", False)
            flip_r = get_feature_index(ref_base, "D", True)
        rows["base_index"].append(summary._base_index(position))
        rows["type_digit"].append(type_digit)
        rows["type_value"].append(type_value)
        rows["depth_fwd"].append(min(fwd, MAX_COLOR))
        rows["depth_rev"].append(min(rev, MAX_COLOR))
        rows["flip_fwd_col"].append(flip_f)
        rows["flip_rev_col"].append(flip_r)
        rows["star_fwd_col"].append(get_feature_index(ref_base, "*", False))
        rows["star_rev_col"].append(get_feature_index(ref_base, "*", True))
        rows["del_len"].append(len(candidate) - 1 if type_digit == 3 else 0)
    return CandidateDescriptors(**{
        name: np.asarray(values, np.int32) for name, values in rows.items()
    })


@partial(jax.jit, static_argnames=("window_size",))
def extract_windows_device(image, descriptors, window_size=32):
    """image: (R, F) int32 region matrix (already clamped).  Returns
    (K, window_size+1, F) float32 candidate windows with injections."""
    F = image.shape[1]
    half = window_size // 2
    padded = jnp.pad(image, ((half, half), (0, 0)))

    def one(base_index, type_digit, type_value, depth_fwd, depth_rev,
            flip_fwd, flip_rev, star_fwd, star_rev, del_len):
        window = jax.lax.dynamic_slice(
            padded, (base_index, 0), (window_size + 1, F)).astype(jnp.int32)
        rows = jnp.arange(window_size + 1)[:, None]
        cols = jnp.arange(F)[None, :]
        mid = half

        is_mid = rows == mid
        # type column: 1 for snp, 2 insert, 3 delete
        type_col = jnp.where(type_digit == 1, 1,
                             jnp.where(type_digit == 2, 2, 3))
        fwd_col = jnp.where(type_digit == 1, 5,
                            jnp.where(type_digit == 2, 6, 7))
        rev_col = jnp.where(type_digit == 1, 16,
                            jnp.where(type_digit == 2, 17, 18))

        window = jnp.where(is_mid & (cols == type_col), type_value, window)
        window = jnp.where(is_mid & (cols == fwd_col), depth_fwd, window)
        window = jnp.where(is_mid & (cols == rev_col), depth_rev, window)
        flip_mid = is_mid & ((cols == flip_fwd) | (cols == flip_rev))
        window = jnp.where(flip_mid, -window, window)

        # delete span fill (region_summary.cpp:895-904)
        end_index = jnp.minimum(mid + del_len - 1, window_size - 1)
        in_span = (type_digit == 3) & (rows > mid) & (rows <= end_index)
        window = jnp.where(in_span & (cols == 3), type_value, window)
        window = jnp.where(in_span & (cols == 7), depth_fwd, window)
        window = jnp.where(in_span & (cols == 18), depth_rev, window)
        span_flip = in_span & ((cols == star_fwd) | (cols == star_rev))
        window = jnp.where(span_flip, -window, window)
        return window

    windows = jax.vmap(one)(
        descriptors["base_index"], descriptors["type_digit"],
        descriptors["type_value"], descriptors["depth_fwd"],
        descriptors["depth_rev"], descriptors["flip_fwd_col"],
        descriptors["flip_rev_col"], descriptors["star_fwd_col"],
        descriptors["star_rev_col"], descriptors["del_len"])
    return windows.astype(jnp.float32)


def descriptors_to_tree(descriptors: CandidateDescriptors) -> dict:
    return {name: jnp.asarray(getattr(descriptors, name))
            for name in ("base_index", "type_digit", "type_value",
                         "depth_fwd", "depth_rev", "flip_fwd_col",
                         "flip_rev_col", "star_fwd_col", "star_rev_col",
                         "del_len")}


def classify_region_device(params, rows, cols, deltas, ref_values,
                           descriptors: CandidateDescriptors,
                           region_rows: int, compute_dtype=jnp.float32):
    """The fused on-device region flow:
    event stream -> Pallas histogram -> clamp -> window gather + injection
    -> window classifier.  Returns (K, 3) probabilities.

    rows/cols/deltas: pileup events; ref_values: (region_rows,) col-0
    encoding; region_rows = region_size + 1."""
    from ..models.transducer import transducer_apply
    from .pileup_kernel import accumulate_pallas

    image = accumulate_pallas(rows, cols, deltas, (region_rows, 26))
    image = jnp.asarray(image, jnp.int32)
    image = image.at[:ref_values.shape[0], 0].add(
        jnp.asarray(ref_values, jnp.int32))
    cs, ce = ImageOptions.CLAMP_COL_START, ImageOptions.CLAMP_COL_END
    clamped = jnp.clip(image[:region_rows - 1, cs:ce],
                       ImageOptions.MIN_COLOR_VALUE, MAX_COLOR)
    image = image.at[:region_rows - 1, cs:ce].set(clamped)

    windows = extract_windows_device(image, descriptors_to_tree(descriptors))
    return transducer_apply(
        jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params),
        windows.astype(compute_dtype), train=False)
