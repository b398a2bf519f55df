#!/usr/bin/env python
"""Multi-host scaling benchmark — the BASELINE.md >=85% 2-host north star.

Run ONE copy per host (the launch recipe in docs/parallelism.md):

  # host 0                                   # host 1
  python benchmarks/bench_pod_scaling.py \\
      --coordinator 10.0.0.1:8476 --num-hosts 2 --host-index 0   # (and 1)

Each host contributes its local chips to a dp(hosts) x tp(local) hybrid
mesh (dp rides DCN, tp rides ICI — ``make_pod_mesh``), the W4A16
Qwen3-4B-shaped decode scan runs dp-sharded, and host 0 prints one JSON
line with global tokens/s. Measure 1 host first, then 2 hosts with
``--baseline-tok-s <1-host number>`` to get the efficiency directly:

  efficiency = tok_s(2 hosts) / (2 x tok_s(1 host))   # target >= 0.85

``--selftest`` runs the whole thing locally as two CPU processes of 4
virtual devices each (tiny model) — the same code path with real process
boundaries, minus the hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_bench(args) -> None:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _quantize_params_rtn

    from quantizers_tpu.models import KVCache, ModelSpec, init_params
    from quantizers_tpu.models.transformer import fuse_for_decode
    from quantizers_tpu.parallel import activation_pspec, shard_params
    from quantizers_tpu.parallel.distributed import initialize, make_pod_mesh
    from quantizers_tpu.serve.engine import _decode_scan, prefill

    multi = initialize(coordinator_address=args.coordinator,
                       num_processes=args.num_hosts,
                       process_id=args.host_index)
    n_proc = jax.process_count() if multi else 1
    local = len(jax.local_devices())
    log(f"process {jax.process_index() if multi else 0}/{n_proc}, "
        f"{local} local devices, backend={jax.default_backend()}")

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        spec = ModelSpec(
            vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
            num_kv_heads=8, head_dim=128, intermediate_size=9728,
            qk_norm=True, tie_word_embeddings=True, model_type="qwen3")
        B_per_dp, T_prefill, steps, max_len = 8, 128, 128, 512
    else:
        spec = ModelSpec.tiny(num_layers=2, hidden_size=128, num_heads=8,
                              num_kv_heads=4, head_dim=16,
                              intermediate_size=256, vocab_size=512)
        B_per_dp, T_prefill, steps, max_len = 2, 16, 8, 64

    mesh = make_pod_mesh({"dp": n_proc, "tp": local}, dcn_axes=("dp",))
    params = init_params(spec, jax.random.PRNGKey(0))
    params = _quantize_params_rtn(spec, params,
                                  expert_scheme="W4A16_G32")
    params = fuse_for_decode(spec, params)
    params = shard_params(spec, params, mesh)

    B = B_per_dp * n_proc  # global batch scales with hosts (throughput mode)
    ids = jnp.asarray((np.arange(B * T_prefill, dtype=np.int32)
                       .reshape(B, T_prefill) * 97 + 1) % spec.vocab_size)
    ids = jax.device_put(ids, NamedSharding(mesh, activation_pspec(mesh, 2)))

    with mesh:
        caches = KVCache.init(spec, B, max_len)
        last, caches = prefill(params, spec, ids, caches)
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)
        key = jax.random.PRNGKey(1)

        t0 = time.time()
        toks, _ = _decode_scan(params, spec, caches, first, key, steps=steps,
                               temperature=0.0, top_k=0)
        # replicated scalar: addressable on every process
        _ = float(jnp.sum(toks.astype(jnp.int64)))
        log(f"decode compile+first {time.time()-t0:.0f}s")

        best = float("inf")
        for i in range(3):
            t0 = time.time()
            toks, _ = _decode_scan(params, spec, caches, first + i, key,
                                   steps=steps, temperature=0.0, top_k=0)
            _ = float(jnp.sum(toks.astype(jnp.int64)))
            best = min(best, time.time() - t0)
            log(f"run {i}: {(time.time()-t0)*1e3:.0f} ms / {steps} steps")

    tok_s = B * steps / best
    if (jax.process_index() if multi else 0) == 0:
        out = {
            "metric": "pod_decode_tokens_per_s",
            "value": round(tok_s, 1),
            "unit": "tok/s",
            "hosts": n_proc,
            "global_batch": B,
        }
        if args.baseline_tok_s:
            # computed from the ROUNDED value so the record is internally
            # consistent (selftest + tests recompute it from `value`)
            out["scaling_efficiency"] = round(
                out["value"] / (n_proc * args.baseline_tok_s), 3)
        print(json.dumps(out), flush=True)


def _selftest_attempt(baseline: float) -> tuple:
    """One 2-process run. Returns (launch_ok, checks_ok, record_line)."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-hosts", "2", "--host-index", str(pid),
             "--platform", "cpu",
             "--baseline-tok-s", str(baseline)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    launch_ok, checks_ok, record = True, True, None
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=600)
            log(f"--- selftest process {pid} (rc={p.returncode}) ---\n{out}")
            launch_ok &= p.returncode == 0
            if pid == 0:
                last = [ln for ln in out.splitlines() if ln.startswith("{")]
                if not last:
                    checks_ok = False
                    continue
                record = last[-1]
                rec = json.loads(record)
                checks_ok &= rec["hosts"] == 2
                eff = rec.get("scaling_efficiency")
                expect = round(rec["value"] / (2 * baseline), 3)
                if eff is None or abs(eff - expect) >= 1e-9:
                    log(f"selftest: scaling_efficiency wrong: {eff} != {expect}")
                    checks_ok = False
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return launch_ok, checks_ok, record


def selftest() -> int:
    """Two local CPU processes, 4 virtual devices each — the exact code
    path with real process boundaries.

    Launch failures (coordinator-connect timeout under host load, the
    pick-port-then-bind race) get ONE retry with a fresh port; failures of
    the scaling_efficiency arithmetic checks never retry — those are bugs,
    not weather."""
    # a known 1-host baseline exercises the scaling_efficiency arithmetic
    # itself (the >=85% north-star formula: tok_s / (hosts * baseline)) so
    # the reporting path is under test before real hardware ever runs it
    baseline = 100.0
    for attempt in range(2):
        launch_ok, checks_ok, record = _selftest_attempt(baseline)
        if launch_ok:
            if record is not None:
                print(record)
            return 0 if checks_ok else 1
        log(f"selftest attempt {attempt}: launch failed"
            + (", retrying with a fresh port" if attempt == 0 else ""))
    return 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-index", type=int, default=None)
    p.add_argument("--baseline-tok-s", type=float, default=None,
                   help="1-host tok/s; prints scaling_efficiency")
    p.add_argument("--platform", default=None)
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()
    if args.selftest:
        return selftest()
    run_bench(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
