"""Calibration-set engine tests: config validation, cache-key determinism,
offline consolidation against fixture datasets, Jinja templating, and the
cache round trip. (Reference strategy: tests/t_calibration_sets.py,
t_cache.py, t_dataloading.py — all hermetic/offline.)"""

import os

import pytest

from quantizers_tpu.data import (
    CalibrationSet,
    CalibrationSetConfig,
    DatasetEntryConfig,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def fx(name: str) -> str:
    return os.path.join(FIXTURES, name)


def entry(**kw) -> DatasetEntryConfig:
    base = dict(dataset=fx("qa_pairs"), formatter="prompt_answer", split="train",
                columns=["question", "answer"], num_samples=2)
    base.update(kw)
    return DatasetEntryConfig(**base)


class TestEntryConfig:
    def test_valid(self):
        e = entry()
        assert e.num_samples == 2

    def test_missing_dataset(self):
        with pytest.raises(ValueError, match="Dataset is required"):
            DatasetEntryConfig.from_dict({"formatter": "raw_text", "split": "train",
                                          "columns": ["x"], "num_samples": 1})

    def test_missing_split(self):
        with pytest.raises(ValueError, match="Split is required"):
            DatasetEntryConfig.from_dict({"dataset": "d", "formatter": "raw_text",
                                          "columns": ["x"], "num_samples": 1})

    def test_missing_formatter(self):
        with pytest.raises(ValueError, match="formatter is required"):
            DatasetEntryConfig.from_dict({"dataset": "d", "split": "train",
                                          "columns": ["x"], "num_samples": 1})

    def test_missing_num_samples(self):
        with pytest.raises(ValueError, match="num_samples is required"):
            DatasetEntryConfig.from_dict({"dataset": "d", "split": "train",
                                          "formatter": "raw_text", "columns": ["x"]})

    @pytest.mark.parametrize("bad", [0, -3, "some", 1.5, True])
    def test_bad_num_samples(self, bad):
        with pytest.raises(ValueError):
            DatasetEntryConfig.from_dict({"dataset": "d", "split": "train", "formatter": "raw_text",
                                          "columns": ["x"], "num_samples": bad})

    def test_all_is_accepted(self):
        e = DatasetEntryConfig.from_dict({"dataset": "d", "split": "train", "formatter": "raw_text",
                                          "columns": ["x"], "num_samples": "all"})
        assert e.num_samples == "all"

    def test_columns_must_be_list(self):
        with pytest.raises(ValueError, match="columns must be a list"):
            DatasetEntryConfig.from_dict({"dataset": "d", "split": "train", "formatter": "raw_text",
                                          "columns": "x", "num_samples": 1})

    def test_empty_columns_rejected(self):
        with pytest.raises(ValueError, match="columns list cannot be empty"):
            entry(columns=[])

    def test_template_modulus_static_validation(self):
        bad = "{{ ['a', 'b'][hash(row|string) % 5] }}"
        with pytest.raises(ValueError, match="List index error"):
            entry(formatter="raw_text", columns=["text"], formatter_params={"prefix": bad})

    def test_template_modulus_ok(self):
        good = "{{ ['a', 'b', 'c', 'd', 'e'][hash(row|string) % 5] }}"
        e = entry(formatter="raw_text", columns=["text"], formatter_params={"prefix": good})
        assert "prefix" in e.formatter_params

    def test_resolve_caps_at_dataset_size(self):
        e = entry(num_samples=500)
        assert e.resolve_num_samples("d", list(range(7))) == 7

    def test_resolve_all_uses_length(self):
        e = entry(num_samples="all")
        assert e.resolve_num_samples("d", list(range(9))) == 9

    def test_resolve_all_streaming_default(self):
        class NoLen:
            def __len__(self):
                raise TypeError

        e = entry(num_samples="all", streaming=True)
        assert e.resolve_num_samples("d", NoLen()) == 256


class TestSetConfig:
    def test_requires_root_key(self):
        with pytest.raises(ValueError, match="calibration_set"):
            CalibrationSetConfig.from_dict({"datasets": []})

    def test_defaults(self):
        cfg = CalibrationSetConfig.from_dict({"calibration_set": {"datasets": [
            {"dataset": "d", "split": "train", "formatter": "raw_text", "columns": ["x"], "num_samples": 1}
        ]}})
        assert cfg.max_seq_length == 4096 and cfg.shuffle and cfg.seed == 42

    def test_from_missing_file(self):
        with pytest.raises(ValueError, match="not found"):
            CalibrationSetConfig.from_file("/nonexistent/x.yaml")

    def test_empty_datasets_invalid(self):
        cfg = CalibrationSetConfig()
        with pytest.raises(ValueError, match="at least one dataset"):
            cfg.validate()

    def test_yaml_file_roundtrip(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            "calibration_set:\n"
            "  max_seq_length: 2048\n"
            "  seed: 7\n"
            "  datasets:\n"
            f"    - dataset: \"{fx('plain_text')}\"\n"
            "      split: train\n"
            "      columns: [text]\n"
            "      formatter: raw_text\n"
            "      num_samples: 2\n"
        )
        cfg = CalibrationSetConfig.from_file(str(p))
        assert cfg.max_seq_length == 2048 and cfg.seed == 7
        assert cfg.datasets[0].formatter == "raw_text"


class TestCacheKey:
    def cfg(self, **kw):
        base = dict(max_seq_length=1024, shuffle=True, seed=1, datasets=[entry()])
        base.update(kw)
        return CalibrationSetConfig(**base)

    def test_deterministic(self):
        assert CalibrationSet.compute_cache_key(self.cfg()) == CalibrationSet.compute_cache_key(self.cfg())

    def test_key_format(self):
        key = CalibrationSet.compute_cache_key(self.cfg())
        stem, ext = key.rsplit(".", 1)
        hx, total = stem.split("-")
        assert ext == "parquet" and len(hx) == 7 and total == "2"

    def test_differs_on_seed(self):
        assert CalibrationSet.compute_cache_key(self.cfg(seed=1)) != CalibrationSet.compute_cache_key(self.cfg(seed=2))

    def test_differs_on_entry(self):
        other = self.cfg(datasets=[entry(num_samples=3)])
        assert CalibrationSet.compute_cache_key(self.cfg()) != CalibrationSet.compute_cache_key(other)

    def test_all_marks_tbd(self):
        key = CalibrationSet.compute_cache_key(self.cfg(datasets=[entry(num_samples="all")]))
        assert "length_TBD" in key

    def test_order_insensitive_hash(self):
        a = self.cfg(datasets=[entry(), entry(dataset=fx("plain_text"), formatter="raw_text", columns=["text"])])
        b = self.cfg(datasets=[entry(dataset=fx("plain_text"), formatter="raw_text", columns=["text"]), entry()])
        assert CalibrationSet.compute_cache_key(a) == CalibrationSet.compute_cache_key(b)


class TestConsolidation:
    def test_direct_construction_guard(self):
        with pytest.raises(RuntimeError, match="from_config"):
            CalibrationSet(CalibrationSetConfig(datasets=[entry()]))

    def test_from_config_offline(self, tmp_path):
        cfg = CalibrationSetConfig(shuffle=False, datasets=[entry()])
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs.total_num_samples == 2
        row = cs._untokenized_calibration_set[0]
        assert row["formatted"][0]["role"] == "user"

    def test_multi_entry_concat_and_shuffle(self, tmp_path):
        cfg = CalibrationSetConfig(
            seed=3,
            datasets=[
                entry(),
                entry(dataset=fx("plain_text"), formatter="raw_text", columns=["text"], num_samples=3),
                entry(dataset=fx("sharegpt_conv"), formatter="sharegpt", columns=["conversations"], num_samples=4),
            ],
        )
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs.total_num_samples == 9

    def test_num_samples_cap(self, tmp_path):
        cfg = CalibrationSetConfig(datasets=[entry(num_samples=100)])
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs.total_num_samples == 5  # qa_pairs has 5 rows

    def test_jinja_prefix_rendering(self, tmp_path):
        tpl = "Answer in {{ ['French', 'German'][hash(row|string) % 2] }}:"
        cfg = CalibrationSetConfig(
            shuffle=False,
            datasets=[entry(dataset=fx("plain_text"), formatter="raw_text", columns=["text"],
                            num_samples=3, formatter_params={"prefix": tpl})],
        )
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        for row in cs._untokenized_calibration_set:
            first = row["formatted"][0]
            assert first["role"] == "user"
            assert first["content"] in ("Answer in French:", "Answer in German:")

    def test_static_formatter_params(self, tmp_path):
        cfg = CalibrationSetConfig(
            shuffle=False,
            datasets=[entry(dataset=fx("plain_text"), formatter="raw_text", columns=["text"],
                            num_samples=1, formatter_params={"prefix": "Fixed:"})],
        )
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        assert cs._untokenized_calibration_set[0]["formatted"][0]["content"] == "Fixed:"

    def test_toolace_fixture(self, tmp_path):
        cfg = CalibrationSetConfig(
            shuffle=False,
            datasets=[entry(dataset=fx("toolace_style"), formatter="chat_completion_with_sysprompt",
                            columns=["system", "conversations"], num_samples=2)],
        )
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        roles0 = [m["role"] for m in cs._untokenized_calibration_set[0]["formatted"]]
        assert roles0 == ["system", "user", "assistant", "tool", "assistant"]


class MockTokenizer:
    """Fixed-output tokenizer: no model download needed (reference pattern,
    tests/t_calibration_sets.py:34-63)."""

    def apply_chat_template(self, messages, tokenize=False):
        return " \n".join(f"<{m['role']}>{m['content']}" for m in messages)

    def __call__(self, text, padding=False, max_length=None, truncation=True, add_special_tokens=False):
        ids = [ord(c) % 1000 for c in text][: max_length or 16]
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}


class TestTokenizationAndCache:
    def test_get_tokenized(self, tmp_path):
        cfg = CalibrationSetConfig(shuffle=False, max_seq_length=8, datasets=[entry()])
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        tok = cs.get_tokenized(MockTokenizer())
        assert len(tok) == 2
        assert all(len(r["input_ids"]) <= 8 for r in tok)

    def test_get_tokenized_before_load_raises(self, tmp_path):
        cfg = CalibrationSetConfig(datasets=[entry()])
        inst = CalibrationSet(cfg, str(tmp_path), _from_factory=True)
        with pytest.raises(RuntimeError, match="not loaded"):
            inst.get_tokenized(MockTokenizer())

    def test_cache_round_trip(self, tmp_path):
        cfg = CalibrationSetConfig(shuffle=False, datasets=[entry()])
        assert not CalibrationSet.is_cached(cfg, str(tmp_path))
        built = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        built.save_to_cache()
        assert CalibrationSet.is_cached(cfg, str(tmp_path))

        loaded = CalibrationSet.from_cache(cfg, cache_dir=str(tmp_path))
        assert loaded.total_num_samples == built.total_num_samples
        assert loaded._untokenized_calibration_set[0] == built._untokenized_calibration_set[0]

    def test_from_cache_missing_raises(self, tmp_path):
        cfg = CalibrationSetConfig(datasets=[entry(num_samples=1)])
        with pytest.raises(FileNotFoundError, match="is_cached"):
            CalibrationSet.from_cache(cfg, cache_dir=str(tmp_path))

    def test_iter_token_batches_static_shapes(self, tmp_path):
        cfg = CalibrationSetConfig(shuffle=False, max_seq_length=8, datasets=[entry(num_samples=3)])
        cs = CalibrationSet.from_config(cfg, cache_dir=str(tmp_path))
        batches = list(cs.iter_token_batches(MockTokenizer(), batch_size=2, pad_to=8))
        assert batches[0][0].shape == (2, 8)
        assert batches[1][0].shape == (1, 8)
        assert batches[0][1].dtype.kind == "b"


class TestRunConfig:
    def test_load_run_config(self, tmp_path):
        calib = tmp_path / "calibration_sets" / "mini.yaml"
        calib.parent.mkdir()
        calib.write_text(
            "calibration_set:\n  datasets:\n"
            f"    - dataset: \"{fx('qa_pairs')}\"\n"
            "      split: train\n      columns: [question, answer]\n"
            "      formatter: prompt_answer\n      num_samples: 2\n"
        )
        run = tmp_path / "run.yaml"
        run.write_text(
            "model:\n  name: test/model\n  revision: abc\n"
            "quantization:\n  recipe: recipes/r.yaml\n"
            "calibration_set: calibration_sets/mini\n"  # no .yaml suffix on purpose
        )
        from quantizers_tpu import load_quantization_config

        cfg = load_quantization_config(str(run))
        assert cfg.model.name == "test/model"
        assert cfg.model.revision == "abc"
        assert cfg.quantization.recipe == "recipes/r.yaml"
        assert len(cfg.calibration_set_config.datasets) == 1

    def test_configs_prefix_dedup(self, tmp_path):
        (tmp_path / "calibration_sets").mkdir()
        (tmp_path / "calibration_sets" / "c.yaml").write_text(
            "calibration_set:\n  datasets:\n"
            f"    - dataset: \"{fx('plain_text')}\"\n"
            "      split: train\n      columns: [text]\n"
            "      formatter: raw_text\n      num_samples: 1\n"
        )
        run = tmp_path / "run.yaml"
        run.write_text(
            "model:\n  name: m\n"
            "quantization:\n  recipe: r.yaml\n"
            "calibration_set: configs/calibration_sets/c.yaml\n"
        )
        from quantizers_tpu import load_quantization_config

        cfg = load_quantization_config(str(run))
        assert cfg.calibration_set_config is not None

    def test_model_name_required(self):
        from quantizers_tpu.config import QuantizationRunConfig

        run = QuantizationRunConfig.from_dict({"model": {}, "quantization": {"recipe": "r"}})
        with pytest.raises(ValueError, match="Model name"):
            run.validate()
