"""Declarative-asset parity tests: every YAML shipped under configs/ must
parse, and every recipe must run through the tiny-model oneshot pipeline
(the reference's config tests: tests/t_consolidated_config.py plus the
diverse-columns sweep tests/t_diverse_columns.py)."""

import os
from pathlib import Path

import numpy as np
import pytest

from quantizers_tpu.data import CalibrationSet, CalibrationSetConfig
from quantizers_tpu.recipes import parse_recipe

REPO = Path(__file__).resolve().parent.parent
CONFIGS = REPO / "configs"


def all_yaml(subdir: str):
    return sorted((CONFIGS / subdir).glob("*.yaml")) if subdir else sorted(
        p for p in CONFIGS.glob("*.yaml"))


class TestCalibrationSetAssets:
    @pytest.mark.parametrize("path", all_yaml("calibration_sets"),
                             ids=lambda p: p.name)
    def test_parses_and_validates(self, path):
        cfg = CalibrationSetConfig.from_file(str(path))
        cfg.validate()
        assert cfg.datasets
        # static Jinja modulus validation already ran at construction;
        # every entry must carry a known formatter
        from quantizers_tpu.data.formatters import get_formatter

        for e in cfg.datasets:
            assert get_formatter(e.formatter) is not None

    def test_reference_set_roster(self):
        """Every calibration set the reference ships has a named counterpart."""
        names = {p.stem for p in all_yaml("calibration_sets")}
        for expected in (
            "calibrate_software_engineer",
            "calibrate_creative_writing",
            "test-calibrate_quick",
            "test-calibrate_multi_format",
            "test-calibrate_code",
            "test-calibrate_toolace",
            "test-calibrate-code-anchor",
        ):
            assert expected in names, f"missing calibration set {expected}"

    def test_software_engineer_full_mix(self):
        """Entry-count / category parity with the reference's flagship
        production asset (33 distinct datasets across 15 domain categories;
        reference configs/calibration_sets/calibrate_software_engineer.yaml)."""
        cfg = CalibrationSetConfig.from_file(
            str(CONFIGS / "calibration_sets" / "calibrate_software_engineer.yaml"))
        assert len(cfg.datasets) >= 30, len(cfg.datasets)
        assert len({e.dataset for e in cfg.datasets}) >= 30
        total = sum(e.num_samples for e in cfg.datasets)
        assert total == 590, total  # reference header: 590 samples
        code_markers = ("code", "stack", "humaneval", "euler",
                        "kubernetes", "Competitive-Programming")
        code = sum(e.num_samples for e in cfg.datasets
                   if any(m.lower() in str(e.dataset).lower()
                          for m in code_markers))
        assert code / total > 0.5, (code, total)  # code-dominated mix
        # the per-row language-injection templates must survive the port
        prefixes = [e.formatter_params.get("prefix", "")
                    for e in cfg.datasets if e.formatter_params]
        assert any("% 60" in p for p in prefixes)   # 60 programming languages
        assert any("% 12" in p for p in prefixes)   # 12 spoken languages
        assert cfg.max_seq_length == 8192 and cfg.seed == 42 and cfg.shuffle

    def test_toolace_runs_offline(self, tmp_path, monkeypatch):
        """The ToolACE set resolves against the local fixture end-to-end."""
        monkeypatch.chdir(REPO)
        cfg = CalibrationSetConfig.from_file(
            str(CONFIGS / "calibration_sets" / "test-calibrate_toolace.yaml"))
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs.total_num_samples >= 1
        roles = [m["role"] for row in cs._untokenized_calibration_set
                 for m in row["formatted"]]
        assert "system" in roles  # sysprompt column mapped to a system turn
        assert "user" in roles and "assistant" in roles


class TestDiverseColumnsSweep:
    """All formatters x column-name variants against offline fixtures
    (reference: tests/test_datasets/t_calibrate_diverse_columns.yaml)."""

    def test_full_sweep(self, tmp_path, monkeypatch):
        monkeypatch.chdir(REPO)
        cfg = CalibrationSetConfig.from_file(
            str(REPO / "tests" / "fixtures" / "t_calibrate_diverse_columns.yaml"))
        assert len(cfg.datasets) == 12
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs.total_num_samples == 24
        roles_seen = set()
        for row in cs._untokenized_calibration_set:
            msgs = row["formatted"]
            assert isinstance(msgs, list) and msgs
            for m in msgs:
                assert set(m) >= {"role", "content"}
                roles_seen.add(m["role"])
        assert {"user", "assistant"} <= roles_seen
        assert "system" in roles_seen  # toolace + sharegpt system turns

    def test_jinja_prefix_applied(self, tmp_path, monkeypatch):
        monkeypatch.chdir(REPO)
        cfg = CalibrationSetConfig.from_file(
            str(REPO / "tests" / "fixtures" / "t_calibrate_diverse_columns.yaml"))
        only = [e for e in cfg.datasets
                if str(e.dataset).endswith("humaneval_rust")]
        cfg2 = CalibrationSetConfig(
            max_seq_length=cfg.max_seq_length, shuffle=False, seed=1,
            datasets=only)
        cs = CalibrationSet.from_config(cfg2, cache_dir=str(tmp_path))
        for row in cs._untokenized_calibration_set:
            assert row["formatted"][0]["content"].startswith("Solve this in ")


class TestRecipeAssets:
    @pytest.mark.parametrize("path", all_yaml("recipes"), ids=lambda p: p.name)
    def test_parses(self, path):
        recipe = parse_recipe(str(path))
        assert recipe.modifiers

    def test_reference_recipe_roster(self):
        names = {p.stem for p in all_yaml("recipes")}
        for expected in (
            "recipe_awq_w4a16",
            "recipe_ar_w4a16g32",
            "recipe_dense_nvfp4",
            "recipe_moe_rtn_nvfp4",
            "recipe_mixed_fp8_int4",
            "recipe_minimax_awq_mixedprec",
            "recipe_minimax_experts_only_awq",
        ):
            assert expected in names, f"missing recipe {expected}"


class TestRunConfigAssets:
    @pytest.mark.parametrize("path", all_yaml(""), ids=lambda p: p.name)
    def test_parses(self, path, monkeypatch):
        monkeypatch.chdir(REPO)
        from quantizers_tpu.config import load_quantization_config

        cfg = load_quantization_config(str(path))
        assert cfg.model.name
        assert cfg.quantization.recipe


class TestMiniMaxDialect:
    """The MiniMax/Mixtral module dialect (block_sparse_moe / w1 w2 w3)
    resolves onto the native expert stacks: the experts-only recipe must
    compress exactly the expert projections of a tiny MoE model."""

    @pytest.fixture(scope="class")
    def result(self):
        import jax

        from quantizers_tpu.models import ModelSpec, init_params
        from quantizers_tpu.oneshot import make_batches, oneshot

        spec = ModelSpec.tiny(moe=True)
        params = init_params(spec, jax.random.PRNGKey(0))
        recipe = parse_recipe(str(CONFIGS / "recipes" /
                                  "recipe_minimax_experts_only_awq.yaml"))
        rng = np.random.default_rng(0)
        batches = make_batches(
            [list(rng.integers(1, spec.vocab_size, 12)) for _ in range(4)],
            max_seq_length=16, batch_size=2, pad_to_multiple=8)
        return oneshot(spec, params, recipe, batches)

    def test_experts_compressed(self, result):
        expert_records = [k for k in result.records if ".experts." in k]
        assert expert_records, sorted(result.records)
        for k in expert_records:
            assert result.records[k].args.num_bits == 4

    def test_attention_untouched(self, result):
        assert not any("self_attn" in k for k in result.records)

    def test_mixedprec_recipe_groups(self):
        recipe = parse_recipe(str(CONFIGS / "recipes" /
                                  "recipe_minimax_awq_mixedprec.yaml"))
        groups = recipe.modifiers[0].config_groups
        assert set(groups) == {"self_attention_projections",
                               "mlp_experts_projections"}
        assert groups["mlp_experts_projections"].weights.num_bits == 4
        assert groups["self_attention_projections"].weights.num_bits == 8


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


class TestJitCache:
    def test_enable_persistent_cache(self, tmp_path, monkeypatch):
        import jax

        import quantizers_tpu.utils.jitcache as jc

        old = jax.config.jax_compilation_cache_dir
        monkeypatch.setattr(jc, "_DONE", False)
        d = str(tmp_path / "cache")
        try:
            assert jc.enable_persistent_cache(d) == d
            import os

            assert os.path.isdir(d)
            # idempotent second call
            assert jc.enable_persistent_cache(d) is not None
        finally:  # tmp_path dies with the test; don't leave jax pointed at it
            jax.config.update("jax_compilation_cache_dir", old)
            monkeypatch.setattr(jc, "_DONE", False)

    def test_disable_via_env(self, tmp_path, monkeypatch):
        import quantizers_tpu.utils.jitcache as jc

        monkeypatch.setattr(jc, "_DONE", False)
        monkeypatch.setenv("QTPU_JIT_CACHE", "0")
        assert jc.enable_persistent_cache(str(tmp_path / "x")) is None

    def test_cli_entry_points_enable_cache(self):
        import pathlib

        cli = pathlib.Path(__file__).resolve().parent.parent / "quantizers_tpu" / "cli"
        for name in ("do_oneshot", "serve", "eval_ppl", "model_free"):
            assert "enable_persistent_cache" in (cli / f"{name}.py").read_text(), name


def test_bench_weight_bytes_counts_subbyte_dtypes():
    """Roofline denominator: jnp.int4 leaves report itemsize 1 but hold
    half a byte per element — weight_bytes must halve them or the w4
    roofline goes 2x off on real TPUs where serving_layout keeps the
    signed-int4 at-rest layout (round-5 review finding)."""
    import sys

    import jax.numpy as jnp
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import weight_bytes

    tree = {"a": jnp.zeros((64, 128), jnp.int4),
            "b": jnp.zeros((64, 128), jnp.int8),
            "c": jnp.zeros((64,), jnp.bfloat16)}
    assert weight_bytes(tree) == 64 * 128 // 2 + 64 * 128 + 64 * 2
