"""The pinned perplexity protocol must be DISCRIMINATIVE: on a fitted tiny
model, quantization strictly raises on-train PPL and recipe ordering holds
(AWQ damage <= RTN damage at equal bit-width). BASELINE.md quality row;
round-2 verdict weakness #5."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_protocol_positive_ordered_deltas():
    # one retry: the subprocess runs a fit + three oneshots and can be
    # killed by memory/CPU pressure when the whole suite runs alongside
    # (observed once under a parallel full-suite run; passes standalone)
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, str(REPO / "benchmarks" / "ppl_protocol.py")],
            capture_output=True, text=True, timeout=1500,
            cwd=REPO,
        )
        if proc.returncode == 0:
            break
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])

    assert result["delta_w4a16_rtn"] > 0, result
    assert result["delta_w4a16_awq"] > 0, result
    assert result["delta_w4a16_gptq"] > 0, result
    assert result["delta_w4a16_ar"] > 0, result
    assert result["delta_nvfp4"] > 0, result
    # calibrated methods must not do worse than plain RTN at the same
    # bit-width (the reason they exist); AutoRound gets signSGD noise slack
    assert result["w4a16_awq"] <= result["w4a16_rtn"], result
    assert result["w4a16_gptq"] <= result["w4a16_rtn"], result
    assert result["w4a16_ar"] <= result["w4a16_rtn"] * 1.02, result
    # 8-bit families and the w8 logits head (serving default) are
    # near-lossless: well under the 4-bit weight deltas
    assert abs(result["delta_w8_head"]) < 0.25 * result["delta_w4a16_awq"], result
    assert abs(result["delta_fp8_block"]) < 0.25 * result["delta_w4a16_awq"], result
    assert abs(result["delta_w8a8"]) < 0.5 * result["delta_w4a16_awq"], result
    # fp8 KV cache: carried-cache (decode-semantics) scoring delta in nats
    assert abs(result["delta_kv8_nats"]) < 0.01, result
    # the w8pc fused expert serving layout costs a small fraction of the
    # NVFP4 quantization damage itself (round-4 serving default)
    assert result["delta_moe_nvfp4"] > 0, result
    assert (abs(result["delta_w8pc_vs_nvfp4"])
            < 0.25 * result["delta_moe_nvfp4"]), result
    assert result["ordering_ok"] is True, result
