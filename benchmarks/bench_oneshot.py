#!/usr/bin/env python
"""Oneshot CALIBRATION throughput — the pipeline the reference actually ships.

The reference's only published performance numbers are calibration costs
(`BASELINE.md` reference-observed rows): the GPTQ stage of a ~24B model
takes **~8 h on an RTX 5090** at 2048 samples x 4096 seq with ~107 GB of
host RAM for Hessians (`scripts/old_scripts/main_devstral-gptq.py:40-42`),
and AWQ's activation capture grows past **1 TB of host RAM** at
128 x 2048 (`main_devstral-gptq.py:50-52` — llmcompressor materializes
every captured activation on the host). This bench times OUR layer-
sequential engine (`quantizers_tpu/oneshot/engine.py`) on a Qwen3-4B-shaped
model on one TPU chip and reports:

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
  so host RAM never sees the >1 TB blow-up.

Each leg runs in its own SUBPROCESS: the tunneled TPU server does not
promptly reclaim a dead/OOMed client's memory, so leg isolation keeps one
leg's residue from starving the next. Since round 5 the driver sweep runs
every leg at FULL depth (36/36 — device-resident records made that ~2-4
minutes) and the GPTQ leg adds a second smaller run in the same process
for a measured two-point token fit; reduced-depth runs remain supported
via QTPU_{GPTQ,AWQ,AR}_LAYERS with an overhead-aware projection.

Model weights are synthetic (calibration speed is content-independent).
Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

import numpy as np

# surface the engine's per-layer INFO progress lines — a 36-layer TPU
# calibration run is minutes-long and should not look hung
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# reference-observed GPTQ cost: ~8 h for the GPTQ stage at 2048 x 4096
# on an RTX 5090 (`main_devstral-gptq.py:40-42`; ~24B model — we note the
# size mismatch in the JSON rather than pretending it away).
REF_GPTQ_S = 8 * 3600.0
REF_GPTQ_TOKENS = 2048 * 4096

FULL_LAYERS = 36

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

AR_RECIPE = """
quant_stage:
  quant_modifiers:
    AutoRoundModifier:
      iters: 200
      config_groups:
        group_0:
          targets: ["re:.*mlp\\\\.(gate|up|down)_proj$"]
          weights: {num_bits: 4, type: int, symmetric: true,
                    strategy: group, group_size: 32}
      ignore: ["lm_head"]
"""  # MLP-only targets + 200 iters: the reference recipe_AR_W4A16G32.yaml

LEGS = {"awq": AWQ_RECIPE, "gptq": GPTQ_RECIPE, "ar": AR_RECIPE}


def _leg_layers(leg: str, on_tpu: bool) -> int:
    if not on_tpu:
        return 2
    if leg == "gptq":
        return int(os.environ.get("QTPU_GPTQ_LAYERS", "18"))
    if leg == "ar":
        return int(os.environ.get("QTPU_AR_LAYERS", str(FULL_LAYERS)))
    return int(os.environ.get("QTPU_AWQ_LAYERS", str(FULL_LAYERS)))


def _make_spec(on_tpu: bool, num_layers: int):
    from quantizers_tpu.models import ModelSpec

    if on_tpu:
        return ModelSpec(
            vocab_size=151936, hidden_size=2560, num_layers=num_layers,
            num_heads=32, num_kv_heads=8, head_dim=128,
            intermediate_size=9728, qk_norm=True, tie_word_embeddings=True,
            model_type="qwen3",
        )
    return ModelSpec.tiny(num_layers=num_layers, hidden_size=128, num_heads=8,
                          num_kv_heads=4, head_dim=16,
                          intermediate_size=256, vocab_size=1024)


def _calib_size(on_tpu: bool):
    if on_tpu:
        return (int(os.environ.get("QTPU_ONESHOT_SAMPLES", "64")),
                int(os.environ.get("QTPU_ONESHOT_SEQ", "2048")), 4)
    return 8, 64, 4


def run_leg_worker(leg: str) -> None:
    """Subprocess body: run one leg, print its JSON to stdout."""
    t_worker = time.time()
    import jax

    if os.environ.get("QTPU_BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from quantizers_tpu.utils import enable_persistent_cache

    enable_persistent_cache()  # tunnel compiles are 1-40 s; cache loads ~0.1 s

    from quantizers_tpu.models.transformer import init_params
    from quantizers_tpu.oneshot.engine import make_batches, oneshot
    from quantizers_tpu.recipes import parse_recipe

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    n_layers = _leg_layers(leg, on_tpu)
    spec = _make_spec(on_tpu, n_layers)
    n_samples, seq, batch_size = _calib_size(on_tpu)
    recipe = parse_recipe(LEGS[leg])
    rng = np.random.default_rng(0)

    def one_run(samples: int) -> dict:
        rows = [list(rng.integers(1, spec.vocab_size, size=seq))
                for _ in range(samples)]
        batches = make_batches(rows, max_seq_length=seq, batch_size=batch_size)
        log(f"[{leg}] backend={backend} layers={n_layers} "
            f"calibration {samples}x{seq} ({len(batches)} batches)")
        params = jax.block_until_ready(init_params(spec, jax.random.PRNGKey(0)))
        t0 = time.time()
        result = oneshot(spec, params, recipe, batches,
                         moe_calibrate_all_experts=False)
        jax.block_until_ready(result.params["layers"][0])
        wall = time.time() - t0
        st = result.stats
        return {"wall_s": round(wall, 1), "stats": st,
                "tensors": len(result.records),
                "calib_tokens": samples * seq}

    r1 = one_run(n_samples)
    wall, st = r1["wall_s"], r1["stats"]
    scale = FULL_LAYERS / n_layers if on_tpu else 1.0
    # Overhead-aware depth projection: layer 0 carries the jit compiles
    # and each leg pays fixed init (model build, embedding) once, so a
    # naive wall*(FULL/n) overestimates — by +43% at n=3 against the
    # measured 36-layer run (lab_gptq_fulldepth.py, round 5). Projecting
    # fixed + layer0 + mean-marginal*(FULL-1) uses the stable per-layer
    # cost the full run actually repeats. (At n_layers == FULL the scale
    # is exactly 1: the run IS the full-depth measurement.)
    layer_s = st.get("layer_s", [])
    if n_layers == FULL_LAYERS or not on_tpu or len(layer_s) < 2:
        full_wall = wall * scale
        eff_scale = scale
    else:
        marginal = sum(layer_s[1:]) / len(layer_s[1:])
        fixed = max(wall - sum(layer_s), 0.0)
        full_wall = fixed + layer_s[0] + marginal * (FULL_LAYERS - 1)
        eff_scale = full_wall / wall if wall > 0 else scale
    out = {
        "leg": leg,
        "layers": n_layers,
        "depth_scale": round(eff_scale, 2),
        "wall_s": wall,
        "capture_s": round(st.get("capture_s", 0.0), 1),
        "solve_s": round(st.get("solve_s", 0.0), 1),
        "propagate_s": round(st.get("propagate_s", 0.0), 1),
        "layer_s": layer_s,
        "full_depth_wall_s": round(full_wall, 1),
        "tensors": r1["tensors"],
        "calib_tokens": r1["calib_tokens"],
    }
    # Two-point token fit (QTPU_ONESHOT_TWO_POINT=<samples2>): a second
    # run at a different calibration size in the SAME process (compiles
    # cached) separates token-linear cost from fixed+solve cost
    # empirically — wall(t) = a + b*t — robust to the async-dispatch
    # smearing that makes per-stage attribution unreliable. The fit is
    # what the reference-workload projection should use.
    two_point = os.environ.get("QTPU_ONESHOT_TWO_POINT")
    leg_budget = float(os.environ.get("QTPU_ONESHOT_LEG_TIMEOUT", "2400"))
    if two_point and leg_budget and (time.time() - t_worker) > 0.55 * leg_budget:
        # cold-cache runs spend the budget on compiles in run 1; emitting
        # the single-run record beats a leg timeout that loses everything
        # (the main() projection falls back to the stage split)
        log(f"[{leg}] skipping two-point run: {time.time()-t_worker:.0f}s "
            f"of {leg_budget:.0f}s budget spent")
        two_point = None
    if two_point:
        samples2 = max(int(two_point), batch_size)
        r2 = one_run(samples2)
        t1, t2 = r1["calib_tokens"], r2["calib_tokens"]
        if t1 != t2:
            b = (r1["wall_s"] - r2["wall_s"]) / (t1 - t2)
            a = r1["wall_s"] - b * t1
            out["two_point"] = {
                "wall2_s": r2["wall_s"], "calib_tokens2": t2,
                "fixed_s": round(a, 1),
                "s_per_token": round(b, 6),
            }
    log(f"[{leg}] {json.dumps(out)}")
    print(json.dumps(out), flush=True)


def _spawn_leg(leg: str, timeout_s: int):
    env = dict(os.environ, QTPU_ONESHOT_WORKER_LEG=leg)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired as e:
        tail = e.stderr or b""
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-3000:])
        return {"leg": leg, "error": f"timeout after {timeout_s}s",
                "stderr_tail": tail[-400:]}
    sys.stderr.write(proc.stderr[-3000:])
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return {"leg": leg, "error": f"rc={proc.returncode}; "
            f"stderr tail: {proc.stderr[-300:]}"}


def main() -> None:
    timeout_s = int(os.environ.get("QTPU_ONESHOT_LEG_TIMEOUT", "2400"))
    legs = os.environ.get("QTPU_ONESHOT_LEGS", "awq,gptq").split(",")
    results = {leg: _spawn_leg(leg, timeout_s) for leg in legs}
    awq, gptq = results.get("awq"), results.get("gptq")

    on_cpu = os.environ.get("QTPU_BENCH_FORCE_CPU") == "1"
    kind = "tiny_cpu_fallback" if on_cpu else "qwen3_4b"

    projected_s = vs = None
    if gptq and "error" not in gptq:
        scale = gptq["depth_scale"]
        tp = gptq.get("two_point")
        if tp and tp["s_per_token"] > 0 and tp["fixed_s"] >= 0:
            # empirical token fit wall(t) = fixed + rate*t from two runs in
            # one process — robust to async-dispatch smearing of the
            # per-stage split (round-5 finding: capture_s absorbs solve
            # execution once records stopped force-syncing every site)
            projected_s = (tp["fixed_s"]
                           + tp["s_per_token"] * REF_GPTQ_TOKENS) * scale
        else:
            # stage-split fallback: token-linear stages scale with tokens,
            # per-site solves don't; depth scales layer-linearly
            token_linear_s = (gptq["capture_s"] + gptq["propagate_s"]) * scale
            solve_s = gptq["solve_s"] * scale
            projected_s = (token_linear_s
                           * (REF_GPTQ_TOKENS / max(gptq["calib_tokens"], 1))
                           + solve_s)
        vs = REF_GPTQ_S / projected_s if projected_s > 0 else None

    ar = results.get("ar")
    if gptq is None and awq is None and ar is not None and "error" not in ar:
        # AutoRound-only slot: measured full-depth wall at the reference
        # recipe's MLP-only targets + 200 iters; no reference wall-time
        # baseline exists for AutoRound.
        print(json.dumps({
            "metric": f"oneshot_autoround_calibration_full_depth_s_{kind}",
            "value": ar["full_depth_wall_s"],
            "unit": f"s ({ar['layers']} layers, {ar['calib_tokens']} tokens, "
                    "200 iters, MLP-only per the reference recipe)",
            "vs_baseline": None,
            "ar": ar,
        }))
        return

    if (gptq is None and awq is not None and "error" not in awq):
        # AWQ-only invocation (the driver sweep's second oneshot slot):
        # the reference publishes no AWQ wall-time baseline (only the
        # >1 TB host-RAM failure mode), so the measured full-depth wall
        # IS the record — no vs_baseline.
        out = {
            "metric": f"oneshot_awq_calibration_full_depth_s_{kind}",
            "value": awq["full_depth_wall_s"],
            "unit": f"s ({awq['layers']} layers, {awq['calib_tokens']} tokens)",
            "vs_baseline": None,
            "ref_baseline": ">1 TB host RAM for AWQ capture at 128x2048 "
                            "(main_devstral-gptq.py:50-52); stats here are "
                            "device-resident and bounded",
            "awq": awq,
        }
        if ar is not None:  # a combined awq,ar run must not drop the leg
            out["ar"] = ar
        print(json.dumps(out))
        return

    print(json.dumps({
        "metric": f"oneshot_gptq_calibration_projected_s_{kind}",
        "value": None if projected_s is None else round(projected_s, 1),
        "unit": "s (projected to the reference 2048x4096 GPTQ workload)",
        # speedup over the reference's ~8 h GPTQ stage. Caveat printed
        # honestly: the reference number is a ~24B model on an RTX 5090;
        # ours is a 4B-shaped model on one v5e chip — ~6x fewer weights,
        # so divide by ~6 for a like-for-like reading.
        "vs_baseline": None if vs is None else round(vs, 2),
        "ref_baseline_s": REF_GPTQ_S,
        "ref_model_size_ratio": "~6x larger reference model — scale accordingly",
        "awq": awq,
        "gptq": gptq,
        **({"ar": ar} if ar is not None else {}),
    }))


if __name__ == "__main__":
    leg = os.environ.get("QTPU_ONESHOT_WORKER_LEG")
    if leg:
        run_leg_worker(leg)
    else:
        main()
