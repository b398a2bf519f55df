"""Multi-host bring-up dry run: two REAL OS processes, hybrid DCN mesh.

The reference has no distributed backend at all (SURVEY.md §5: no
NCCL/MPI/Gloo anywhere); this is the TPU-native capability the north star
adds. Hardware multi-host can't run on this box, so the test exercises the
exact production code path — ``parallel.distributed.initialize`` +
``make_pod_mesh`` + ``shard_params`` + a jitted sharded forward — over
``jax.distributed`` with two CPU processes of 4 virtual devices each:
process boundaries are real, collectives cross them, and the dp axis is
laid out on the "DCN" (cross-process) dimension by
``mesh_utils.create_hybrid_device_mesh``.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")  # beat the axon sitecustomize

sys.path.insert(0, os.environ["QTPU_REPO"])
from quantizers_tpu.parallel.distributed import initialize, make_pod_mesh

assert initialize() is True, "expected multi-process init from QTPU_* env"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding

from __graft_entry__ import _quantize_params_rtn
from quantizers_tpu.models import ModelSpec, forward, init_params
from quantizers_tpu.parallel import activation_pspec, shard_params

mesh = make_pod_mesh({"dp": 2, "tp": 4}, dcn_axes=("dp",))
# dp must be the cross-process axis: each mesh row lives on one process
procs = [[d.process_index for d in row.ravel()] for row in mesh.devices]
assert all(len(set(row)) == 1 for row in procs), procs
assert {row[0] for row in procs} == {0, 1}, procs

spec = ModelSpec(
    vocab_size=512, hidden_size=128, num_layers=2, num_heads=8,
    num_kv_heads=4, head_dim=16, intermediate_size=256, qk_norm=True,
    model_type="qwen3",
)
params = init_params(spec, jax.random.PRNGKey(0))
params = _quantize_params_rtn(spec, params, expert_scheme="W4A16_G32")
params = shard_params(spec, params, mesh)

B, T = 4, 16
ids = jnp.asarray((np.arange(B * T, dtype=np.int32).reshape(B, T) * 17 + 1)
                  % spec.vocab_size)
ids = jax.device_put(ids, NamedSharding(mesh, activation_pspec(mesh, 2)))

def step(params, ids):
    logits, _ = forward(params, spec, ids)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    return -jnp.take_along_axis(logp, tgt[..., None], axis=-1).mean()

with mesh:
    loss = jax.jit(step)(params, ids)

val = float(loss)  # loss is fully replicated -> addressable everywhere
assert np.isfinite(val), val
print(f"MULTIHOST_OK process={jax.process_index()} loss={val:.4f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_hybrid_mesh_forward(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "QTPU_REPO": repo,
            "QTPU_COORDINATOR": f"127.0.0.1:{port}",
            "QTPU_NUM_PROCESSES": "2",
            "QTPU_PROCESS_ID": str(pid),
            # keep the subprocesses off the tunneled TPU and off any
            # inherited test-session device-count flags
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"process {pid} output:\n{out}"

    # both processes computed the same global loss
    losses = {line.split("loss=")[1] for out in outs for line in out.splitlines()
              if "MULTIHOST_OK" in line}
    assert len(losses) == 1, losses


@pytest.mark.slow
def test_pod_scaling_selftest_asserts_efficiency():
    """The 2-process pod-scaling selftest must pass AND its printed record
    must carry a correctly-computed scaling_efficiency (the >=85% north-star
    formula, under test before hardware — round-3 verdict item #8)."""
    import json as _json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "benchmarks" / "bench_pod_scaling.py"),
         "--selftest"],
        capture_output=True, text=True, timeout=700, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-1500:]
    last = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    rec = _json.loads(last)
    assert rec["hosts"] == 2
    # the selftest passes --baseline-tok-s 100, so efficiency must equal
    # value / (2 * 100) exactly (the selftest itself also asserts this)
    assert rec["scaling_efficiency"] == round(rec["value"] / 200.0, 3)
