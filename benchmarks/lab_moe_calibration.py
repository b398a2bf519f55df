#!/usr/bin/env python
"""Lab: MoE calibration cost at Qwen3-30B-A3B per-layer geometry, 1 chip.

The serving side of the MoE north star is covered by bench_moe; this lab
pins the CALIBRATION side: experts-only NVFP4 RTN (the
recipe_moe_rtn_nvfp4 shape) and experts-only AWQ, with all-expert
capture (`moe_calibrate_all_experts=True` — the reference's
`do_oneshot.py:186` / `docs/quantization_tips_and_tricks.md:79-98`), at
the real per-layer geometry (D=2048, E=64-of-128 experts depth-scaled,
Fe=768), depth-scaled to QTPU_MOE_CAL_LAYERS (default 2) so the stack
fits beside the calibration state on one chip. Layer times extrapolate
linearly (layers are processed independently).

Round-5 trail at this geometry: per-expert RTN loop 11.5 s/layer →
vmapped expert-stack quantize 3.6 s/layer (oneshot/modifiers.py:
_quantize_expert_stack).

Prints one JSON line. Run: python benchmarks/lab_moe_calibration.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from quantizers_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from quantizers_tpu.models import ModelSpec, init_params  # noqa: E402
from quantizers_tpu.oneshot import make_batches, oneshot  # noqa: E402
from quantizers_tpu.recipes import parse_recipe  # noqa: E402

FULL_LAYERS = 48  # Qwen3-30B-A3B depth

NVFP4_EXPERTS = {"quant_stage": {"quant_modifiers": {"QuantizationModifier": {
    "ignore": ["lm_head"], "config_groups": {"group_0": {
        "targets": ["re:.*mlp\\.experts.*"],
        "weights": {"num_bits": 4, "type": "float", "symmetric": True,
                    "strategy": "tensor_group", "group_size": 16}}}}}}}

AWQ_EXPERTS = {"quant_stage": {"quant_modifiers": {"AWQModifier": {
    "ignore": ["lm_head"], "duo_scaling": True, "config_groups": {"group_0": {
        "targets": ["re:.*mlp\\.experts.*"],
        "weights": {"num_bits": 4, "type": "int", "symmetric": True,
                    "strategy": "group", "group_size": 32}}}}}}}


def main() -> None:
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    n_layers = int(os.environ.get("QTPU_MOE_CAL_LAYERS", "2" if on_tpu else "1"))
    if on_tpu:
        spec = ModelSpec(
            vocab_size=8192, hidden_size=2048, num_layers=n_layers,
            num_heads=32, num_kv_heads=4, head_dim=128,
            intermediate_size=6144, num_experts=64, num_experts_per_tok=8,
            moe_intermediate_size=768, qk_norm=True, model_type="qwen3_moe")
        samples, seq, bs = 16, 1024, 4
    else:
        spec = ModelSpec.tiny(moe=True)
        samples, seq, bs = 4, 32, 2

    rng = np.random.default_rng(0)
    rows = [list(rng.integers(1, spec.vocab_size, seq)) for _ in range(samples)]
    out = {"metric": "moe_calibration_s_per_layer_qwen3_30b_a3b_geometry"
           if on_tpu else "moe_calibration_tiny_cpu_fallback",
           "unit": "s/layer (steady-state; 64 experts, all-expert capture)",
           "layers_measured": n_layers, "full_layers": FULL_LAYERS}
    for name, recipe_dict in (("rtn_nvfp4", NVFP4_EXPERTS), ("awq_w4", AWQ_EXPERTS)):
        params = jax.block_until_ready(init_params(spec, jax.random.PRNGKey(0)))
        batches = make_batches(rows, max_seq_length=seq, batch_size=bs)
        t0 = time.time()
        res = oneshot(spec, params, parse_recipe(recipe_dict), batches,
                      moe_calibrate_all_experts=True)
        jax.block_until_ready(res.params["layers"][0])
        wall = time.time() - t0
        layer_s = res.stats.get("layer_s", [])
        steady = (sum(layer_s[1:]) / len(layer_s[1:])) if len(layer_s) > 1 \
            else (layer_s[0] if layer_s else wall)
        out[name] = {"wall_s": round(wall, 1), "layer_s": layer_s,
                     "steady_s_per_layer": round(steady, 2),
                     "projected_full_depth_s": round(
                         (layer_s[0] if layer_s else 0.0)
                         + steady * (FULL_LAYERS - 1), 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
