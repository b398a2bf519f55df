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

    def test_chat_template_emits_special_ids(self, tmp_path):
        """Tokenized templates must use reserved special ids for markers
        and eos — byte-BPE-ing '[INST]'/'</s>' would be off-distribution."""
        import base64 as b64
        import json as js

        _mk_tekken(tmp_path)
        data = js.loads((tmp_path / "tekken.json").read_text())
        data["special_tokens"] += [{"rank": 3, "token_str": "[INST]"},
                                   {"rank": 4, "token_str": "[/INST]"}]
        (tmp_path / "tekken.json").write_text(js.dumps(data))
        tok = TekkenTokenizer(tmp_path / "tekken.json")
        ids = tok.apply_chat_template(
            [{"role": "user", "content": "hi"},
             {"role": "assistant", "content": "yo"}], tokenize=True)
        assert ids[0] == tok.bos_id
        assert 3 in ids and 4 in ids          # marker special ids
        assert ids[-1] == tok.eos_id          # terminator is eos, not bytes
        assert all(i != ord("[") + tok.num_special for i in ids)

    def test_long_text_encodes_fast(self, tmp_path):
        """Pre-tokenization keeps BPE near-linear: a 40 KB document must
        encode in well under a second (whole-string greedy BPE is O(n^2)
        and takes minutes)."""
        import time

        _mk_tekken(tmp_path, merges=["th", "the", " the"])
        tok = TekkenTokenizer(tmp_path / "tekken.json")
        text = ("the quick brown fox jumps over the lazy dog " * 1000)
        t0 = time.time()
        ids = tok.encode(text)
        assert time.time() - t0 < 2.0
        assert tok.decode(ids) == text
