"""Native tekken tokenizer (Mistral) — the reference's mistral-common
integration (``main_devstral-gptq.py:13-14,145-148``) rebuilt first-party.

Fixture: a synthetic tekken.json with a byte-complete base vocab plus a
few merged tokens, exercising greedy rank-ordered BPE, round-trip decode,
the chat template, and the directory-loader dispatch."""

import base64
import json

from quantizers_tpu.data.simple_tokenizer import load_tokenizer
from quantizers_tpu.data.tekken import TekkenTokenizer


def _mk_tekken(path, merges=()):
    vocab = []
    # byte-complete base vocabulary (ranks 0..255), then merges by rank
    for b in range(256):
        vocab.append({"rank": b,
                      "token_bytes": base64.b64encode(bytes([b])).decode(),
                      "token_str": chr(b) if 32 <= b < 127 else None})
    for m in merges:
        vocab.append({"rank": len(vocab),
                      "token_bytes": base64.b64encode(m.encode()).decode(),
                      "token_str": m})
    data = {
        "config": {"default_num_special_tokens": 10,
                   "default_vocab_size": 10 + len(vocab)},
        "vocab": vocab,
        "special_tokens": [
            {"rank": 0, "token_str": "<unk>"},
            {"rank": 1, "token_str": "<s>"},
            {"rank": 2, "token_str": "</s>"},
        ],
    }
    (path / "tekken.json").write_text(json.dumps(data))


class TestTekken:
    def test_roundtrip_and_merges(self, tmp_path):
        _mk_tekken(tmp_path, merges=["he", "ll", "hell", "hello"])
        tok = TekkenTokenizer(tmp_path / "tekken.json")
        ids = tok.encode("hello world")
        # "hello" must merge to the single highest-merge token
        hello_id = tok.num_special + 256 + 3
        assert ids[0] == hello_id, ids
        assert tok.decode(ids) == "hello world"
        # byte fallback for unmerged text
        assert tok.decode(tok.encode("xyz!")) == "xyz!"

    def test_bos_and_call_truncation(self, tmp_path):
        _mk_tekken(tmp_path)
        tok = TekkenTokenizer(tmp_path / "tekken.json")
        out = tok("abcdef", max_length=4, truncation=True)
        assert len(out["input_ids"]) == 4
        assert out["input_ids"][0] == tok.bos_id
        out2 = tok("abc", add_special_tokens=False)
        assert out2["input_ids"] == [tok.num_special + ord(c) for c in "abc"]

    def test_chat_template(self, tmp_path):
        _mk_tekken(tmp_path)
        tok = TekkenTokenizer(tmp_path / "tekken.json")
        text = tok.apply_chat_template([
            {"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
        ])
        assert text == "[INST] be brief\n\nhi [/INST]yo</s>"
        ids = tok.apply_chat_template([{"role": "user", "content": "hi"}],
                                      tokenize=True)
        assert ids[0] == tok.bos_id

    def test_loader_dispatch(self, tmp_path):
        _mk_tekken(tmp_path)
        tok = load_tokenizer(str(tmp_path))
        assert isinstance(tok, TekkenTokenizer)
        assert tok.decode(tok.encode("ok")) == "ok"
