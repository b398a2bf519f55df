#!/usr/bin/env python
"""Hardware smoke of the FULL CLI product path, on whatever backend is up.

make_tiny_model -> do_oneshot (the shipped AWQ W4A16 recipe + the offline
fixture calibration set) -> validate_config -> eval_ppl -> serve
(ContinuousBatcher session). The CPU test suite runs this flow hermetically
(tests/test_cli.py); this script is the same flow pointed at the real
chip — first executed round 5 on the tunneled v5e (backend "tpu",
serve session decode through the session serving_layout).

Must run from the repo root (the fixture calibration set resolves its
dataset paths relative to cwd, mirroring the reference's behavior).

Run: python benchmarks/smoke_cli_tpu.py [workdir]
"""

from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    from quantizers_tpu.cli.do_oneshot import main as do_oneshot_main
    from quantizers_tpu.cli.eval_ppl import main as eval_ppl_main
    from quantizers_tpu.cli.make_tiny_model import main as make_tiny_main
    from quantizers_tpu.cli.serve import main as serve_main
    from quantizers_tpu.cli.validate_config import main as validate_main
    import jax

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    repo = pathlib.Path(__file__).resolve().parent.parent
    root = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else \
        pathlib.Path(tempfile.mkdtemp(prefix="qtpu_cli_smoke_"))
    root.mkdir(parents=True, exist_ok=True)
    model = root / "model"

    assert make_tiny_main([str(model), "--vocab", "300"]) == 0
    run_cfg = root / "run.yaml"
    run_cfg.write_text(f"""
model:
  name: {model}
quantization:
  recipe: {repo}/configs/recipes/recipe_awq_w4a16.yaml
calibration_set: {repo}/configs/calibration_sets/test-calibrate_quick.yaml
""")
    out = root / "out"
    assert do_oneshot_main([
        "--config", str(run_cfg), "--output", str(out),
        "--cache-dir", str(root / "cache"), "--max-seq-length", "64"]) == 0
    assert validate_main([str(out)]) == 0
    sample = root / "sample.txt"
    sample.write_text("hello quantized world " * 200)
    assert eval_ppl_main([str(out), str(sample), "--window", "128",
                          "--max-windows", "2"]) == 0
    assert serve_main([str(out), "--prompt", "hello world", "--prompt", "abc",
                       "--max-new-tokens", "8", "--max-batch", "2",
                       "--max-len", "64"]) == 0
    print("CLI E2E OK", file=sys.stderr)
    if len(sys.argv) <= 1:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
