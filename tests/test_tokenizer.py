"""CLIP BPE tokenizer parity vs transformers' CLIPTokenizer over the same
vocab/merges files (transformers is available in the image; the actual
openai vocab is not, so parity runs on a constructed vocab with real
merges — exercising the BPE loop, byte-encoder, cleaning and padding)."""

import json
import os

import numpy as np
import pytest

from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    from reflecting_reality_tpu.data.tokenizer import _bytes_to_unicode

    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    # real merges so the BPE loop runs: build common English bigrams/words
    merges = []
    for pair in [("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
                 ("i", "n"), ("o", "n</w>"), ("r", "e"), ("e", "r</w>"),
                 ("m", "i"), ("mi", "r"), ("mir", "r"), ("mirr", "o"),
                 ("mirro", "r</w>")]:
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = len(vocab)
        merges.append(pair)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


PROMPTS = [
    "A perfect plane mirror reflection of a red chair",
    "the mirror, and   the THE Mirror!",
    "",
    "word-with-dash & symbols #42 (parens)",
    "ünïcödé tëxt",
]


def test_parity_with_transformers(vocab_dir):
    transformers = pytest.importorskip("transformers")
    theirs = transformers.CLIPTokenizer(
        vocab_file=os.path.join(vocab_dir, "vocab.json"),
        merges_file=os.path.join(vocab_dir, "merges.txt"),
    )
    ours = CLIPTokenizer.from_pretrained(vocab_dir)
    for prompt in PROMPTS:
        got = ours([prompt])[0]
        exp = theirs(prompt, max_length=77, padding="max_length",
                     truncation=True)["input_ids"]
        np.testing.assert_array_equal(got, np.asarray(exp, np.int32),
                                      err_msg=f"prompt={prompt!r}")


def test_truncation(vocab_dir):
    ours = CLIPTokenizer.from_pretrained(vocab_dir)
    ids = ours(["word " * 200])[0]
    assert ids.shape == (77,)
    assert ids[0] == ours.bos_token_id and ids[-1] == ours.eos_token_id
