"""Benchmark: window-classifier inference throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is pileup windows/s per chip through the flagship variant-mode
model (bi-LSTM window classifier, 33x26 inputs -> 3-class probs), the same
quantity the reference reports from its inference stage logs
(predict_distributed_cpu.py:215-219: elapsed time over total windows).

Methodology: N distinct batches are classified inside ONE jitted dispatch
(lax.scan with per-iteration input perturbation), and only a scalar
checksum is fetched — this defeats any execution caching in the device
transport and amortizes dispatch latency, so the number is real sustained
model throughput.  Two scan lengths are timed and the marginal rate is
reported (fixed dispatch overhead subtracted).

vs_baseline: the reference has no published windows/s number (BASELINE.md),
so we compare against a measured torch-CPU run of the equivalent model in
this same process when available, else report 0.
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.5")

from pepper_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def bench_jax(batch=4096, n_short=10, n_long=50, compute_dtype="bfloat16",
              mode=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pepper_tpu.models.transducer import (
        TransducerConfig, init_transducer_params, transducer_apply)

    # Default serving config for the headline: static-scale int8 (round 3) —
    # measured 1.10M windows/s vs 942k bf16 on the same chip/day; VCF output
    # equality with the bf16 path is asserted on a trained model in
    # tests/test_trained_e2e.py.  The reference's own recommended CPU serving
    # is its quantized ONNX mode (CallVariantsArguments.py:204-208), so the
    # quantized config is the apples-to-apples flagship.  Override with
    # PEPPER_BENCH_MODE=bf16|int8_dynamic|int8_static.
    if mode is None:
        mode = os.environ.get("PEPPER_BENCH_MODE", "int8_static")
    config = TransducerConfig()
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    params = init_transducer_params(jax.random.PRNGKey(0), config,
                                    jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-125, 126,
                                size=(batch, config.window,
                                      config.image_features)), dtype)

    if mode == "int8_static":
        from pepper_tpu.models.quantize import (
            quantize_params_static, transducer_infer_static)

        tree = jax.tree_util.tree_map(jnp.asarray,
                                      quantize_params_static(params))
        forward = partial(transducer_infer_static, compute_dtype=dtype)
        params = tree
    elif mode == "int8_dynamic":
        from pepper_tpu.models.quantize import (
            quantize_params, transducer_infer_quantized)

        q, s = quantize_params(params)
        q = jax.tree_util.tree_map(jnp.asarray, q)
        forward = lambda p, xi: transducer_infer_quantized(  # noqa: E731
            p, s, xi, dtype)
        params = q
    else:
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        forward = lambda p, xi: transducer_apply(p, xi)  # noqa: E731

    @partial(jax.jit, static_argnames=("iters",))
    def run(params, x, iters):
        def body(acc, i):
            # perturb the input so every iteration is a distinct execution
            xi = x + i.astype(x.dtype)
            probs = forward(params, xi)
            return acc + jnp.sum(probs.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.),
                                jnp.arange(iters, dtype=jnp.int32))
        return total

    def timed(iters):
        float(run(params, x, iters))  # compile warmup
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            float(run(params, x, iters))
            best = min(best, time.perf_counter() - start)
        return best

    t_short = timed(n_short)
    t_long = timed(n_long)
    marginal = (t_long - t_short) / (n_long - n_short)
    if marginal <= 0:  # degenerate timing; fall back to raw long-run rate
        return batch * n_long / t_long
    return batch / marginal


def bench_torch_cpu(batch=512, iters=3):
    """Reference-equivalent torch model on CPU as the local baseline proxy."""
    try:
        import torch
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        # the reference's own torch class (parity tests import it the same
        # way; the hand-written twin was retired in round 2)
        from test_model_parity import (
            REF_VARIANT_MODEL, _variant_stubs, load_reference_module)
        module = load_reference_module(REF_VARIANT_MODEL,
                                       "bench_reference_variant_model",
                                       _variant_stubs())
    except Exception:
        return None
    torch.set_num_threads(os.cpu_count() or 1)
    model = module.TransducerGRU(image_features=26, gru_layers=1,
                                 hidden_size=256, num_classes=28,
                                 num_classes_type=3).eval()
    x = torch.randint(-125, 126, (batch, 33, 26)).float()
    with torch.no_grad():
        model(x)  # warmup
        start = time.perf_counter()
        for _ in range(iters):
            model(x)
        elapsed = time.perf_counter() - start
    return batch * iters / elapsed


def main():
    windows_per_s = bench_jax()
    baseline = None
    if os.environ.get("PEPPER_BENCH_SKIP_TORCH") != "1":
        baseline = bench_torch_cpu()
    vs_baseline = round(windows_per_s / baseline, 3) if baseline else 0
    print(json.dumps({
        "metric": "pileup windows/s per chip (window-classifier inference)",
        "value": round(windows_per_s, 1),
        "unit": "windows/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
