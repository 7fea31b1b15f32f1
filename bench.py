"""Benchmark: window-classifier inference throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is pileup windows/s per chip through the flagship variant-mode
model (bi-LSTM window classifier, 33x26 inputs -> 3-class probs), the same
quantity the reference reports from its inference stage logs
(predict_distributed_cpu.py:215-219: elapsed time over total windows).

vs_baseline: the reference has no published windows/s number (BASELINE.md),
so we compare against a measured torch-CPU run of the equivalent model in
this same process when available, else report 0.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.5")


def bench_jax(batch=2048, iters=20, warmup=3, compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pepper_tpu.models.transducer import (
        TransducerConfig, init_transducer_params, transducer_infer)

    config = TransducerConfig()
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-125, 126,
                                size=(batch, config.window,
                                      config.image_features)),
                    jnp.float32)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    for _ in range(warmup):
        out = transducer_infer(params, x, dtype)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(iters):
        out = transducer_infer(params, x, dtype)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return batch * iters / elapsed


def bench_torch_cpu(batch=512, iters=3):
    """Reference-equivalent torch model on CPU as the local baseline proxy."""
    try:
        import torch
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        from test_model_parity import TorchTransducer
    except Exception:
        return None
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchTransducer().eval()
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
