"""Formatter unit tests (mirrors the reference's test strategy: pure-function
role/content assertions, strict column-count errors, KeyError on missing
columns — reference tests/t_formatters*.py)."""

import pytest

from quantizers_tpu.data.formatters import (
    DatasetFmt,
    available_formatters,
    get_formatter,
)


class TestRegistry:
    def test_all_six_registered(self):
        names = available_formatters()
        for expected in [
            "sharegpt",
            "prompt_answer",
            "chat_completion",
            "chat_completion_with_sysprompt",
            "raw_text",
            "deepmind_code_contests",
        ]:
            assert expected in names

    def test_unknown_formatter_raises(self):
        with pytest.raises(ValueError, match="Unknown formatter"):
            get_formatter("nope")

    def test_namespace_compat(self):
        assert DatasetFmt.get_formatter("sharegpt") is DatasetFmt.sharegpt


class TestShareGPT:
    def test_role_mapping(self):
        row = {
            "conv": [
                {"from": "system", "value": "sys"},
                {"from": "human", "value": "hi"},
                {"from": "gpt", "value": "hello"},
            ]
        }
        msgs = DatasetFmt.sharegpt(["conv"], row)
        assert [m["role"] for m in msgs] == ["system", "user", "assistant"]
        assert msgs[1]["content"] == "hi"

    def test_unknown_sender_defaults_to_user(self):
        msgs = DatasetFmt.sharegpt(["c"], {"c": [{"from": "alien", "value": "x"}]})
        assert msgs == [{"role": "user", "content": "x"}]

    def test_invalid_entries_skipped(self):
        msgs = DatasetFmt.sharegpt(
            ["c"], {"c": ["not-a-dict", {"from": "human"}, {"from": "gpt", "value": "ok"}]}
        )
        assert msgs == [{"role": "assistant", "content": "ok"}]

    def test_column_count_enforced(self):
        with pytest.raises(ValueError, match="exactly 1"):
            DatasetFmt.sharegpt(["a", "b"], {})

    def test_missing_column_keyerror(self):
        with pytest.raises(KeyError):
            DatasetFmt.sharegpt(["missing"], {"other": []})

    def test_empty_conversation(self):
        assert DatasetFmt.sharegpt(["c"], {"c": []}) == []


class TestPromptAnswer:
    def test_basic(self):
        msgs = DatasetFmt.prompt_answer(["q", "a"], {"q": "Q?", "a": "A."})
        assert msgs == [
            {"role": "user", "content": "Q?"},
            {"role": "assistant", "content": "A."},
        ]

    def test_arbitrary_column_names(self):
        msgs = DatasetFmt.prompt_answer(["instruction", "output"], {"instruction": "do", "output": "did"})
        assert msgs[0]["content"] == "do"

    def test_empty_prompt_dropped(self):
        msgs = DatasetFmt.prompt_answer(["q", "a"], {"q": "", "a": "A."})
        assert msgs == [{"role": "assistant", "content": "A."}]

    def test_empty_answer_dropped(self):
        msgs = DatasetFmt.prompt_answer(["q", "a"], {"q": "Q?", "a": ""})
        assert msgs == [{"role": "user", "content": "Q?"}]

    def test_column_count(self):
        with pytest.raises(ValueError, match="exactly 2"):
            DatasetFmt.prompt_answer(["only_one"], {})


class TestChatCompletion:
    def test_passthrough(self):
        chat = [{"role": "user", "content": "u"}, {"role": "assistant", "content": "a"}]
        assert DatasetFmt.chat_completion(["m"], {"m": chat}) == chat

    def test_reasoning_folded_into_think_tags(self):
        chat = [
            {"role": "user", "content": "u"},
            {"role": "assistant", "content": "ans", "reasoning_content": "because"},
        ]
        msgs = DatasetFmt.chat_completion(["m"], {"m": chat})
        assert msgs[1]["content"] == "<think>because</think>\nans"
        assert "reasoning_content" not in msgs[1]

    def test_none_reasoning_kept_plain(self):
        chat = [{"role": "assistant", "content": "a", "reasoning_content": None}]
        msgs = DatasetFmt.chat_completion(["m"], {"m": chat})
        assert msgs == [{"role": "assistant", "content": "a"}]

    def test_reasoning_on_non_assistant_raises(self):
        chat = [{"role": "user", "content": "u", "reasoning_content": "r"}]
        with pytest.raises(AssertionError):
            DatasetFmt.chat_completion(["m"], {"m": chat})

    def test_column_count(self):
        with pytest.raises(ValueError, match="exactly 1"):
            DatasetFmt.chat_completion([], {})


class TestChatCompletionWithSysprompt:
    def test_toolace_from_value(self):
        row = {
            "sys": "tools available",
            "conv": [
                {"from": "user", "value": "call it"},
                {"from": "assistant", "value": "{}"},
                {"from": "tool", "value": "{\"ok\":1}"},
            ],
        }
        msgs = DatasetFmt.chat_completion_with_sysprompt(["sys", "conv"], row)
        assert msgs[0] == {"role": "system", "content": "tools available"}
        assert [m["role"] for m in msgs] == ["system", "user", "assistant", "tool"]

    def test_role_content_shape(self):
        row = {"s": None, "c": [{"role": "user", "content": "hi"}]}
        msgs = DatasetFmt.chat_completion_with_sysprompt(["s", "c"], row)
        assert msgs == [{"role": "user", "content": "hi"}]

    def test_unknown_roles_skipped(self):
        row = {"s": "", "c": [{"from": "narrator", "value": "skip"}, {"from": "user", "value": "ok"}]}
        msgs = DatasetFmt.chat_completion_with_sysprompt(["s", "c"], row)
        assert msgs == [{"role": "user", "content": "ok"}]

    def test_empty_system_dropped(self):
        row = {"s": "", "c": [{"from": "user", "value": "x"}]}
        msgs = DatasetFmt.chat_completion_with_sysprompt(["s", "c"], row)
        assert msgs[0]["role"] == "user"

    def test_column_count(self):
        with pytest.raises(ValueError, match="exactly 2"):
            DatasetFmt.chat_completion_with_sysprompt(["one"], {})


class TestRawText:
    def test_assistant_turn(self):
        msgs = DatasetFmt.raw_text(["text"], {"text": "lorem"})
        assert msgs == [{"role": "assistant", "content": "lorem"}]

    def test_prefix_becomes_user_turn(self):
        msgs = DatasetFmt.raw_text(["t"], {"t": "body"}, prefix="Write in French:")
        assert msgs == [
            {"role": "user", "content": "Write in French:"},
            {"role": "assistant", "content": "body"},
        ]

    def test_empty_prefix_omitted(self):
        msgs = DatasetFmt.raw_text(["t"], {"t": "body"}, prefix="")
        assert len(msgs) == 1

    def test_column_count(self):
        with pytest.raises(ValueError, match="exactly 1"):
            DatasetFmt.raw_text(["a", "b"], {})


class TestDeepMindCodeContests:
    def test_description_and_first_solution(self):
        row = {
            "whole": {
                "description": "Count pairs.",
                "solutions": {"solution": ["print(1)", "print(2)"]},
            }
        }
        msgs = DatasetFmt.deepmind_code_contests(["whole"], row)
        assert msgs == [
            {"role": "user", "content": "Count pairs."},
            {"role": "assistant", "content": "print(1)"},
        ]

    def test_string_column_falls_back_to_row(self):
        row = {
            "name": "prob-1",
            "description": "Desc here.",
            "solutions": {"solution": ["s"]},
        }
        msgs = DatasetFmt.deepmind_code_contests(["name"], row)
        assert msgs[0]["content"] == "Desc here."

    def test_no_solutions(self):
        row = {"d": {"description": "only desc", "solutions": {"solution": []}}}
        msgs = DatasetFmt.deepmind_code_contests(["d"], row)
        assert msgs == [{"role": "user", "content": "only desc"}]

    def test_column_count(self):
        with pytest.raises(ValueError, match="exactly 1"):
            DatasetFmt.deepmind_code_contests([], {})
