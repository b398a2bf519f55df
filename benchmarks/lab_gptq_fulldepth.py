#!/usr/bin/env python
"""Anchor the GPTQ depth projection with ONE measured full-depth run.

bench_oneshot's driver-sweep GPTQ leg runs at reduced depth and projects
to 36 layers layer-linearly (every engine stage processes layers
independently). The round-4 verdict (#4) asked for that scaling argument
to be validated once against a measured 36/36-layer run — outside the
driver sweep, in its own subprocess with a generous timeout.

This lab runs BOTH legs through the exact bench_oneshot leg worker
(same code path the sweep certifies):

* slice:  QTPU_GPTQ_LAYERS=<slice> (default 4 — the sweep's setting)
* full:   QTPU_GPTQ_LAYERS=36

and reports measured-vs-projected error plus the reference-workload
(2048x4096 tokens) projection re-anchored on the measured full-depth
stage times. Reference baseline: the ~8 h GPTQ stage of
`scripts/old_scripts/main_devstral-gptq.py:40-42` (a ~24B model on an
RTX 5090 — ~6x more weights than Qwen3-4B; the JSON carries that caveat
rather than pretending it away).

Run: python benchmarks/lab_gptq_fulldepth.py       (~8 min on one v5e
     since the round-5 device-resident-records change; ~25 min before)
Env: QTPU_GPTQ_SLICE (default 4), QTPU_GPTQ_FULL (default 36),
     QTPU_ONESHOT_SAMPLES (default 16), QTPU_FULLDEPTH_TIMEOUT (s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_GPTQ_S = 8 * 3600.0
REF_GPTQ_TOKENS = 2048 * 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_leg(layers: int, timeout_s: int) -> dict:
    env = dict(os.environ, QTPU_ONESHOT_WORKER_LEG="gptq",
               QTPU_GPTQ_LAYERS=str(layers),
               QTPU_ONESHOT_SAMPLES=os.environ.get("QTPU_ONESHOT_SAMPLES", "16"))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "bench_oneshot.py")],
        env=env, capture_output=True, text=True, timeout=timeout_s, cwd=ROOT)
    log(f"[fulldepth] layers={layers} rc={proc.returncode} "
        f"({time.time()-t0:.0f}s)\n{proc.stderr[-600:]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"leg layers={layers} produced no JSON; "
                       f"stderr tail: {proc.stderr[-300:]}")


def main() -> None:
    slice_layers = int(os.environ.get("QTPU_GPTQ_SLICE", "4"))
    full_layers = int(os.environ.get("QTPU_GPTQ_FULL", "36"))
    timeout_s = int(os.environ.get("QTPU_FULLDEPTH_TIMEOUT", "3600"))

    sl = run_leg(slice_layers, timeout_s=max(900, timeout_s // 3))
    fl = run_leg(full_layers, timeout_s=timeout_s)

    # the leg's own (overhead-aware) projection — fixed + layer0 +
    # median-marginal*(FULL-1); naive wall*(36/slice) overestimated +43%
    projected_full = sl["full_depth_wall_s"]
    naive_projected = sl["wall_s"] * (full_layers / slice_layers)
    measured_full = fl["wall_s"]
    err = (projected_full - measured_full) / measured_full

    # reference-workload projection, anchored on the MEASURED full run:
    # capture+propagate scale with calibration tokens; solves don't
    token_linear_s = fl["capture_s"] + fl["propagate_s"]
    ref_projected_s = (token_linear_s * (REF_GPTQ_TOKENS / fl["calib_tokens"])
                       + fl["solve_s"])

    print(json.dumps({
        "metric": "gptq_fulldepth_anchor_qwen3_4b",
        "slice_layers": slice_layers,
        "slice_wall_s": sl["wall_s"],
        "full_layers": full_layers,
        "full_wall_s": measured_full,
        "full_stage_s": {"capture": fl["capture_s"], "solve": fl["solve_s"],
                         "propagate": fl["propagate_s"]},
        "projected_full_from_slice_s": round(projected_full, 1),
        "naive_linear_projection_s": round(naive_projected, 1),
        "projection_error_pct": round(err * 100.0, 1),
        "ref_workload_projected_s_measured_anchor": round(ref_projected_s, 1),
        "ref_baseline_s": REF_GPTQ_S,
        "vs_ref_baseline": round(REF_GPTQ_S / ref_projected_s, 2),
        "ref_model_size_ratio": "~6x larger reference model — scale accordingly",
    }))


if __name__ == "__main__":
    main()
