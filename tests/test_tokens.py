"""Tokenizer and phrase-index tests."""

import json

import pytest

from lmdx.text import tokens as toklib


def test_word_tokenizer_basics():
    tok = toklib.WordTokenizer()
    ids = tok.encode("A photo of a cat", pad_to=77)
    assert len(ids) == 77
    assert ids[0] == toklib.BOS_ID
    assert toklib.EOS_ID in ids
    # Deterministic
    assert ids == tok.encode("A photo of a cat", pad_to=77)


def test_phrase_indices_basic():
    tok = toklib.WordTokenizer()
    out = toklib.get_phrase_indices(
        tok, "a realistic scene with a red cube and a blue ball",
        ["a red cube", "a blue ball"], words=["cube", "ball"])
    # "a realistic scene with" = 4 tokens + bos -> "a red cube" starts at 5.
    assert out.object_positions[0] == [5, 6, 7]
    assert out.word_token_indices[0] == 7
    assert out.object_positions[1] == [9, 10, 11]
    assert out.word_token_indices[1] == 11


def test_phrase_indices_suffix():
    tok = toklib.WordTokenizer()
    out = toklib.get_phrase_indices(
        tok, "an empty scene", ["a dragon"], words=["dragon"],
        add_suffix_if_not_found=True)
    assert out.prompt.endswith("| a dragon")
    # Suffix tokens follow the original prompt tokens.
    assert out.word_token_indices[0] == len(tok.token_map("an empty scene")) - 2 + 3


def test_phrase_not_found_raises():
    tok = toklib.WordTokenizer()
    with pytest.raises(ValueError):
        toklib.get_phrase_indices(tok, "an empty scene", ["a dragon"])


@pytest.fixture
def bpe_tokenizer(tmp_path):
    # Tiny BPE: characters + merges building "cat</w>" and "dog</w>".
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
              ("a", "</w>")]
    vocab_tokens = ["c", "a", "t", "d", "o", "g", "t</w>", "g</w>", "a</w>",
                    "ca", "cat</w>", "do", "dog</w>",
                    "<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(vocab_tokens)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return toklib.ClipBpeTokenizer.from_dir(str(tmp_path))


def test_bpe_merges(bpe_tokenizer):
    assert bpe_tokenizer.tokenize("cat dog") == ["cat</w>", "dog</w>"]
    assert bpe_tokenizer.tokenize("a cat") == ["a</w>", "cat</w>"]
    # Unmergeable sequences decompose into chars with a </w> tail.
    assert bpe_tokenizer.tokenize("tac") == ["t", "a", "c</w>"] or \
        bpe_tokenizer.tokenize("tac")[-1].endswith("</w>")


def test_bpe_phrase_indices(bpe_tokenizer):
    out = toklib.get_phrase_indices(
        bpe_tokenizer, "a cat a dog", ["cat", "dog"], words=["cat", "dog"])
    assert out.object_positions == [[2], [4]]
    assert out.word_token_indices == [2, 4]
