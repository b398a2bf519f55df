"""Byte-exact mixed-precision config parity with the reference.

GOLDEN below is a hand-vendored transcription of the literal
``quantization_config`` the reference's
``scripts/recombine_weights_MiniMax-M2.1.py:75-138``
(``create_mixed_precision_config``) writes into the hybrid model's
``config.json``.  Everything except the ``ignore`` list is hardcoded in the
reference; ``ignore`` is copied from the compressed (W4A16) model's config,
which the fixture below feeds identically.

These tests pin the ecosystem contract (the exact compressed-tensors config
schema vLLM reads) beyond our own first-party schema reading.
"""

import copy
import json
from pathlib import Path

import pytest

from quantizers_tpu.tools.recombine import ModelMerger

GOLDEN_IGNORE = ["lm_head", "re:.*block_sparse_moe\\.gate$"]

GOLDEN = {
    "quant_method": "compressed-tensors",
    "format": "mixed-precision",
    "quantization_status": "compressed",
    "config_groups": {
        "group_0": {  # FP8 for most layers
            "targets": ["Linear"],
            "weights": {
                "type": "float",
                "num_bits": 8,
                "strategy": "block",
                "block_structure": [128, 128],
                "symmetric": True,
                "dynamic": False,
            },
            "input_activations": {
                "type": "float",
                "num_bits": 8,
                "strategy": "token",
                "symmetric": True,
                "dynamic": True,
            },
            "format": "float-quantized",
        },
        "group_1": {  # W4A16 for MoE experts
            "format": "pack-quantized",
            "input_activations": None,
            "output_activations": None,
            "targets": [
                "Linear",
                "re:.*block_sparse_moe\\.experts\\.\\d+\\.(w1|w2|w3)$",
            ],
            "weights": {
                "actorder": None,
                "block_structure": None,
                "dynamic": False,
                "group_size": 32,
                "num_bits": 4,
                "observer": "minmax",
                "observer_kwargs": {},
                "strategy": "group",
                "symmetric": True,
                "type": "int",
            },
        },
    },
    "ignore": GOLDEN_IGNORE,
    "kv_cache_scheme": None,
    "global_compression_ratio": None,
    "sparsity_config": {},
    "transform_config": {},
    "version": "0.13.1.dev0+g797d301.d20251228",
}


def _write_cfg(d: Path, cfg: dict) -> None:
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(cfg))


@pytest.fixture()
def merged_config(tmp_path):
    """Run ModelMerger's config writer over fixture checkpoints whose
    configs carry exactly what the reference's two input models carried."""
    # primary = FP8 model: its producer wrote group_0's body verbatim
    _write_cfg(tmp_path / "fp8", {
        "model_type": "minimax",
        "hidden_size": 3072,
        "torch_dtype": "bfloat16",
        "quantization_config": {
            "quant_method": "compressed-tensors",
            "format": "float-quantized",
            "quantization_status": "compressed",
            "config_groups": {
                "group_0": copy.deepcopy(GOLDEN["config_groups"]["group_0"]),
            },
            "ignore": [],
            "version": GOLDEN["version"],
        },
    })
    # secondary = W4A16 pack-quantized experts model; the reference copies
    # ITS ignore list into the hybrid config
    _write_cfg(tmp_path / "w4", {
        "model_type": "minimax",
        "quantization_config": {
            "quant_method": "compressed-tensors",
            "format": "pack-quantized",
            "quantization_status": "compressed",
            "config_groups": {
                "group_0": copy.deepcopy(GOLDEN["config_groups"]["group_1"]),
            },
            "ignore": list(GOLDEN_IGNORE),
            "version": GOLDEN["version"],
        },
    })
    out = tmp_path / "hybrid"
    out.mkdir()
    merger = ModelMerger(tmp_path / "fp8", tmp_path / "w4", out)
    merger._write_config()
    return json.loads((out / "config.json").read_text())


class TestMergerGoldenParity:
    def test_quantization_config_key_for_key(self, merged_config):
        got = merged_config["quantization_config"]
        assert set(got) == set(GOLDEN), (
            f"extra={set(got) - set(GOLDEN)} missing={set(GOLDEN) - set(got)}")
        for key in GOLDEN:
            assert got[key] == GOLDEN[key], (key, got[key], GOLDEN[key])
        assert got == GOLDEN

    def test_group_bodies_verbatim(self, merged_config):
        """Nested config_groups values survive the merge byte-for-byte —
        no re-normalization of what the source producers wrote."""
        groups = merged_config["quantization_config"]["config_groups"]
        assert list(groups) == ["group_0", "group_1"]
        assert groups["group_0"] == GOLDEN["config_groups"]["group_0"]
        assert groups["group_1"] == GOLDEN["config_groups"]["group_1"]
        # key SETS also match exactly (the two reference groups deliberately
        # carry different weight-dict key sets; they must not be unified)
        assert set(groups["group_0"]["weights"]) == set(
            GOLDEN["config_groups"]["group_0"]["weights"])
        assert set(groups["group_1"]["weights"]) == set(
            GOLDEN["config_groups"]["group_1"]["weights"])

    def test_base_config_carried_from_primary(self, merged_config):
        assert merged_config["model_type"] == "minimax"
        assert merged_config["hidden_size"] == 3072
        assert merged_config["torch_dtype"] == "bfloat16"


class TestFirstPartySchemaParity:
    def test_build_quantization_config_top_level_keys(self):
        """Our own writer emits the same top-level schema the reference's
        hybrid config uses (same key set, same constant values)."""
        from quantizers_tpu.core.scheme import QuantScheme
        from quantizers_tpu.formats.compressed_tensors import (
            build_quantization_config,
        )

        groups = {
            "group_0": QuantScheme.from_dict(GOLDEN["config_groups"]["group_0"]),
            "group_1": QuantScheme.from_dict(GOLDEN["config_groups"]["group_1"]),
        }
        got = build_quantization_config(groups, GOLDEN_IGNORE)
        assert set(got) == set(GOLDEN)
        for key in ("quant_method", "format", "quantization_status",
                    "ignore", "kv_cache_scheme", "global_compression_ratio",
                    "sparsity_config", "transform_config"):
            assert got[key] == GOLDEN[key], key

    @pytest.mark.parametrize("gname", ["group_0", "group_1"])
    def test_scheme_roundtrip_preserves_golden_values(self, gname):
        """Parsing a golden group body into QuantScheme and re-emitting must
        preserve every key/value the golden specifies (our emitter writes the
        normalized superset schema; golden keys are the contract)."""
        from quantizers_tpu.core.scheme import QuantScheme

        golden_body = GOLDEN["config_groups"][gname]
        emitted = QuantScheme.from_dict(golden_body).to_dict()

        def check(gold, got, path=""):
            if isinstance(gold, dict):
                assert isinstance(got, dict), path
                for k, v in gold.items():
                    assert k in got, f"{path}.{k} dropped"
                    check(v, got[k], f"{path}.{k}")
            else:
                assert got == gold, (path, got, gold)

        check(golden_body, emitted)
