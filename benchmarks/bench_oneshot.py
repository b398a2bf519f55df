#!/usr/bin/env python
"""Oneshot CALIBRATION throughput — the pipeline the reference actually ships.

The reference's only published performance numbers are calibration costs
(`BASELINE.md` reference-observed rows): the GPTQ stage of a ~24B model
takes **~8 h on an RTX 5090** at 2048 samples x 4096 seq with ~107 GB of
host RAM for Hessians (`scripts/old_scripts/main_devstral-gptq.py:40-42`),
and AWQ's activation capture grows past **1 TB of host RAM** at
128 x 2048 (`main_devstral-gptq.py:50-52` — llmcompressor materializes
every captured activation on the host). This bench times OUR layer-
sequential engine (`quantizers_tpu/oneshot/engine.py`) on a full
Qwen3-4B-shaped model on one TPU chip and reports:

* wall-clock + stage split (capture / solve / propagate) for an AWQ W4A16
  run at the reference's dense-model calibration size (64 x 2048,
  `calibrate_software_engineer.yaml:29-36` rationale) and a GPTQ W4A16
  run at the same size;
* a projection of the GPTQ leg to the reference's 2048 x 4096 workload
  (capture+propagate scale linearly with calibration tokens; the
  per-site solves are token-count-independent), set against the 8 h
  reference number — `vs_baseline` is that speedup ratio;
* the engine's bounded memory story: Hessians/activation stats live on
  DEVICE (f32 XtX accumulated on the MXU, `oneshot/gptq.py:_hess_accum`;
  AWQ keeps a (K,)-mean + <=512 sample rows, `oneshot/awq.py:_observe_stats`)
  so host RAM never sees the >1 TB blow-up — peak HBM is printed.

Model weights are synthetic (calibration speed is content-independent).
Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

# surface the engine's per-layer INFO progress lines — a 36-layer TPU
# calibration run is minutes-long and should not look hung
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax  # noqa: E402

if os.environ.get("QTPU_BENCH_FORCE_CPU") == "1":
    # env JAX_PLATFORMS does not stick under the axon sitecustomize; only
    # the config update before first backend use forces CPU (see bench.py).
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from quantizers_tpu.models import ModelSpec  # noqa: E402
from quantizers_tpu.models.transformer import init_params  # noqa: E402
from quantizers_tpu.oneshot.engine import make_batches, oneshot  # noqa: E402
from quantizers_tpu.recipes import parse_recipe  # noqa: E402

# reference-observed GPTQ cost: ~8 h for the GPTQ stage at 2048 x 4096
# on an RTX 5090 (`main_devstral-gptq.py:40-42`; ~24B model — we note the
# size mismatch in the JSON rather than pretending it away).
REF_GPTQ_S = 8 * 3600.0
REF_GPTQ_TOKENS = 2048 * 4096

AWQ_RECIPE = """
quant_stage:
  quant_modifiers:
    AWQModifier:
      duo_scaling: true
      config_groups:
        group_0:
          targets: ["Linear"]
          weights: {num_bits: 4, type: int, symmetric: true,
                    strategy: group, group_size: 32}
      ignore: ["lm_head"]
"""

GPTQ_RECIPE = """
quant_stage:
  quant_modifiers:
    GPTQModifier:
      dampening_frac: 0.01
      config_groups:
        group_0:
          targets: ["Linear"]
          weights: {num_bits: 4, type: int, symmetric: false,
                    strategy: group, group_size: 128}
      ignore: ["lm_head"]
"""


def synth_batches(spec, n_samples: int, seq: int, batch_size: int):
    rng = np.random.default_rng(0)
    rows = [list(rng.integers(1, spec.vocab_size, size=seq))
            for _ in range(n_samples)]
    return make_batches(rows, max_seq_length=seq, batch_size=batch_size)


def peak_hbm_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:  # noqa: BLE001 - memory_stats is backend-optional
        return None


def run_leg(name, spec, recipe_yaml, batches):
    """Fresh params -> oneshot -> (wall, stage split). Params rebuilt per
    leg (oneshot mutates them in place)."""
    params = jax.block_until_ready(init_params(spec, jax.random.PRNGKey(0)))
    recipe = parse_recipe(recipe_yaml)
    t0 = time.time()
    result = oneshot(spec, params, recipe, batches,
                     moe_calibrate_all_experts=False)
    # stats are host-side wall-clock; block to be safe
    jax.block_until_ready(result.params["layers"][0])
    wall = time.time() - t0
    st = result.stats
    n_records = len(result.records)
    log(f"[{name}] total {wall:.1f}s  capture {st.get('capture_s', 0):.1f}s  "
        f"solve {st.get('solve_s', 0):.1f}s  propagate {st.get('propagate_s', 0):.1f}s  "
        f"({n_records} tensors quantized)  peak HBM {peak_hbm_gb()} GB")
    del params, result
    return {
        "wall_s": round(wall, 1),
        "capture_s": round(st.get("capture_s", 0.0), 1),
        "solve_s": round(st.get("solve_s", 0.0), 1),
        "propagate_s": round(st.get("propagate_s", 0.0), 1),
        "tensors": n_records,
        "peak_hbm_gb": peak_hbm_gb(),
    }


def main() -> None:
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend={backend}")

    if on_tpu:
        spec = ModelSpec(
            vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
            num_kv_heads=8, head_dim=128, intermediate_size=9728,
            qk_norm=True, tie_word_embeddings=True, model_type="qwen3",
        )
        n_samples = int(os.environ.get("QTPU_ONESHOT_SAMPLES", "64"))
        seq = int(os.environ.get("QTPU_ONESHOT_SEQ", "2048"))
        batch_size = 4
        kind = "qwen3_4b"
    else:
        spec = ModelSpec.tiny(num_layers=2, hidden_size=128, num_heads=8,
                              num_kv_heads=4, head_dim=16,
                              intermediate_size=256, vocab_size=1024)
        n_samples, seq, batch_size = 8, 64, 4
        kind = "tiny_cpu_fallback"

    batches = synth_batches(spec, n_samples, seq, batch_size)
    calib_tokens = n_samples * seq
    log(f"calibration: {n_samples} samples x {seq} seq "
        f"({len(batches)} batches of {batch_size})")

    awq = run_leg("awq_w4a16", spec, AWQ_RECIPE, batches)
    gptq = run_leg("gptq_w4a16", spec, GPTQ_RECIPE, batches)

    # Project GPTQ to the reference workload: token-linear stages scale,
    # the per-site solves don't (they depend only on weight shapes).
    token_linear_s = gptq["capture_s"] + gptq["propagate_s"]
    projected_s = (token_linear_s * (REF_GPTQ_TOKENS / max(calib_tokens, 1))
                   + gptq["solve_s"])
    vs = REF_GPTQ_S / projected_s if projected_s > 0 else None

    print(json.dumps({
        "metric": f"oneshot_gptq_calibration_projected_s_{kind}",
        "value": round(projected_s, 1),
        "unit": "s (projected to the reference 2048x4096 GPTQ workload)",
        # speedup over the reference's ~8 h GPTQ stage. Caveat printed
        # honestly: the reference number is a ~24B model on an RTX 5090;
        # ours is a 4B-shaped model on one v5e chip — ~6x fewer weights,
        # so divide by ~6 for a like-for-like reading.
        "vs_baseline": None if vs is None else round(vs, 2),
        "ref_baseline_s": REF_GPTQ_S,
        "ref_model_size_ratio": "~6x larger reference model — scale accordingly",
        "calib_tokens": calib_tokens,
        "awq": awq,
        "gptq": gptq,
        "calib_tokens_per_s_awq": round(calib_tokens / awq["wall_s"], 1),
        "calib_tokens_per_s_gptq": round(calib_tokens / gptq["wall_s"], 1),
    }))


if __name__ == "__main__":
    main()
