"""Recipe-parser tests: every dialect in the reference's configs/recipes
must parse into the right modifier specs."""

import pytest

from quantizers_tpu.recipes import (
    DEFAULT_AWQ_MAPPINGS,
    Recipe,
    parse_recipe,
    resolve_recipe_path,
)

AR_RECIPE = """
default_stage:
  default_modifiers:
    AutoRoundModifier:
      iters: 200
      config_groups:
        group_0:
          targets: ["re:.*mlp\\\\.(down_proj|gate_proj|up_proj)$"]
          weights:
            num_bits: 4
            type: int
            symmetric: true
            group_size: 32
            strategy: group
      ignore:
        - "lm_head"
"""

NVFP4_RECIPE = """
default_stage:
  default_modifiers:
    QuantizationModifier:
      scheme: NVFP4
      targets: "Linear"
      ignore: ["lm_head"]
"""

MOE_NVFP4_RECIPE = """
default_stage:
  default_modifiers:
    QuantizationModifier:
      scheme: NVFP4
      targets:
        - "re:.*mlp\\\\.experts\\\\.\\\\d+\\\\.(down_proj|gate_proj|up_proj)$"
"""

AWQ_LIST_FORM = """
quantization_scheme:
  type: W4A16
  targets: ["Linear"]

modifiers:
  - name: AWQModifier
    config_groups:
      group_0:
        targets: ["Linear"]
        weights:
          num_bits: 4
          type: int
          symmetric: true
          group_size: 32
          strategy: group
          dynamic: false
          observer: memoryless_minmax
    ignore:
      - "lm_head"
    duo_scaling: true
"""

MIXED_TWO_MODIFIERS = """
quant_stage:
  quant_modifiers:
    QuantizationModifier:
      targets: r"re:.*self_attn\\\\.(k|q|o|v)_proj.*"
      scheme: FP8_BLOCK
    AWQModifier:
      mlp_experts_projections:
        group_0:
          targets: ["re:.*(down|gate|up)_proj.*"]
          weights:
            num_bits: 4
            type: int
            symmetric: true
            group_size: 32
            strategy: group
            dynamic: false
            observer: memoryless_minmax
      ignore:
        - "lm_head"
      duo_scaling: true
      mappings:
        - smooth_layer: re:.*post_attention_layernorm$
          balance_layers: ["re:.*gate_proj$", "re:.*up_proj$"]
        - smooth_layer: re:.*up_proj$
          balance_layers: ["re:.*down_proj$"]
"""

MIXEDPREC_TWO_GROUPS = """
default_stage:
  default_modifiers:
    AWQModifier:
      config_groups:
        self_attention_projections:
          targets: ["re:.*self_attn\\\\.(k_proj|o_proj|q_proj|v_proj)$"]
          weights:
            num_bits: 8
            type: float
            symmetric: true
            group_size: 32
            strategy: group
            dynamic: false
            observer: memoryless_minmax
        mlp_experts_projections:
          targets: ["re:.*block_sparse_moe\\\\.experts\\\\.\\\\d+\\\\.(w1|w2|w3)$"]
          weights:
            num_bits: 4
            type: int
            symmetric: true
            group_size: 32
            strategy: group
            dynamic: false
            observer: minmax
      mappings:
        - smooth_layer: re:.*input_layernorm$
          balance_layers: ['re:.*q_proj$', 're:.*k_proj$', 're:.*v_proj$']
        - smooth_layer: re:.*v_proj$
          balance_layers: ['re:.*o_proj$']
      duo_scaling: true
"""

GPTQ_RECIPE = """
quant_stage:
  quant_modifiers:
    GPTQModifier:
      dampening_frac: 0.1
      config_groups:
        group_0:
          targets: ["Linear"]
          weights:
            num_bits: 4
            type: int
            symmetric: false
            group_size: 128
            strategy: group
            actorder: group
      ignore: ["lm_head"]
"""

KV_CACHE_RECIPE = """
quant_stage:
  quant_modifiers:
    QuantizationModifier:
      scheme: FP8_BLOCK
      targets: ["Linear"]
      kv_cache_scheme:
        num_bits: 8
        type: float
        strategy: tensor
        symmetric: true
        dynamic: false
"""


class TestDialects:
    def test_autoround(self):
        r = parse_recipe(AR_RECIPE)
        assert len(r.modifiers) == 1
        m = r.modifiers[0]
        assert m.name == "AutoRoundModifier"
        assert m.iters == 200
        assert m.ignore == ["lm_head"]
        w = m.config_groups["group_0"].weights
        assert w.num_bits == 4 and w.group_size == 32

    def test_nvfp4_preset(self):
        r = parse_recipe(NVFP4_RECIPE)
        m = r.modifiers[0]
        scheme = m.config_groups["group_0"]
        assert scheme.targets == ("Linear",)
        assert scheme.weights.strategy.value == "tensor_group"
        assert scheme.weights.group_size == 16

    def test_moe_nvfp4_expert_targets(self):
        r = parse_recipe(MOE_NVFP4_RECIPE)
        scheme = r.modifiers[0].config_groups["group_0"]
        assert scheme.targets[0].startswith("re:")

    def test_awq_list_form(self):
        r = parse_recipe(AWQ_LIST_FORM)
        m = r.modifiers[0]
        assert m.name == "AWQModifier"
        assert m.duo_scaling is True
        assert m.config_groups["group_0"].weights.observer == "memoryless_minmax"
        # no explicit mappings -> defaults applied
        assert m.mappings == DEFAULT_AWQ_MAPPINGS

    def test_mixed_two_modifiers_in_one_stage(self):
        r = parse_recipe(MIXED_TWO_MODIFIERS)
        names = [m.name for m in r.modifiers]
        assert names == ["QuantizationModifier", "AWQModifier"]
        fp8 = r.modifiers[0].config_groups["group_0"]
        assert fp8.weights.strategy.value == "block"
        assert fp8.targets[0].startswith("re:")  # r"..." cleaned
        awq = r.modifiers[1]
        assert "mlp_experts_projections.group_0" in awq.config_groups
        assert len(awq.mappings) == 2

    def test_two_config_groups(self):
        r = parse_recipe(MIXEDPREC_TWO_GROUPS)
        m = r.modifiers[0]
        assert set(m.config_groups) == {"self_attention_projections", "mlp_experts_projections"}
        assert m.config_groups["self_attention_projections"].weights.type.value == "float"
        assert m.config_groups["mlp_experts_projections"].weights.type.value == "int"
        assert m.mappings[0].smooth_layer == "re:.*input_layernorm$"

    def test_gptq(self):
        r = parse_recipe(GPTQ_RECIPE)
        m = r.modifiers[0]
        assert m.dampening_frac == 0.1
        w = m.config_groups["group_0"].weights
        assert not w.symmetric
        assert w.actorder.value == "group"

    def test_kv_cache_scheme(self):
        r = parse_recipe(KV_CACHE_RECIPE)
        kv = r.kv_cache_scheme()
        assert kv is not None and kv.num_bits == 8 and kv.type.value == "float"

    def test_empty_recipe_rejected(self):
        with pytest.raises(ValueError, match="no modifiers"):
            parse_recipe({"not_a_stage": {}})

    def test_file_path(self, tmp_path):
        p = tmp_path / "r.yaml"
        p.write_text(NVFP4_RECIPE)
        r = parse_recipe(str(p))
        assert r.modifiers[0].name == "QuantizationModifier"

    def test_missing_file(self):
        with pytest.raises(ValueError, match="not found"):
            parse_recipe("/no/such/recipe.yaml")


class TestRecipePathResolution:
    def test_fallback_to_recipes_subdir(self, tmp_path):
        (tmp_path / "recipes").mkdir()
        target = tmp_path / "recipes" / "r.yaml"
        target.write_text(NVFP4_RECIPE)
        run_cfg = tmp_path / "run.yaml"
        run_cfg.write_text("x: 1")
        got = resolve_recipe_path("r.yaml", str(run_cfg))
        assert got == str(target)

    def test_direct_path(self, tmp_path):
        p = tmp_path / "direct.yaml"
        p.write_text(NVFP4_RECIPE)
        assert resolve_recipe_path(str(p)) == str(p)

    def test_not_found(self):
        with pytest.raises(ValueError, match="not found"):
            resolve_recipe_path("missing.yaml")
