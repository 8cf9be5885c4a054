"""BpeTokenizer must match transformers.CLIPTokenizer token-for-token.

The reference serves text through transformers.CLIPTokenizer
(`/root/reference/seesaw/models/embeddings.py:435-441`). We train a
deterministic synthetic vocab (seesaw_tpu.models.bpe_train), instantiate the
REAL HF CLIPTokenizer on those files, and assert id-level equality across
text shapes: ascii, contractions, punctuation runs, numbers, accents,
NFC/NFD forms, CJK, emoji, control chars, whitespace soup, long texts
(truncation), and empty strings.
"""
import numpy as np
import pytest

CORPUS = [
    "a photo of a dog playing in the park",
    "the quick brown fox jumps over the lazy dog",
    "an aerial photograph of city traffic at night",
    "two cats sitting on a red couch, looking at the camera",
    "it's a bird! it's a plane! no, it's a very fast train",
    "wheelchairs, bicycles and fire hydrants near crosswalks 123 456",
    "café naïve résumé coöperate søster straße",
    "seesaw interactive image search with vision-language models",
]

TEST_STRINGS = [
    "a photo of a dog",
    "A PHOTO OF A DOG",
    "it's the fox's plan, isn't it? we'll see...",
    "hello,,,world!!!  multiple   spaces\tand\ttabs\nnewlines",
    "numbers 123 456789 0",
    "café CAFÉ café",  # NFC vs NFD composition
    "日本語のテキスト and english mixed 中文",
    "emoji 🐕 and symbols © ® ™",
    "weird bytes \x00� control\x07chars",
    "   leading and trailing   ",
    "",
    "x",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "a " * 200 + "very long text that must truncate",
    "punctuation-hyphen_underscore.dot/slash\\backslash",
    "quotes \"double\" and 'single' and `backtick`",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    from seesaw_tpu.models.bpe_train import write_artifacts

    out = tmp_path_factory.mktemp("clip_vocab")
    return write_artifacts(out, CORPUS, n_merges=400)


@pytest.fixture(scope="module")
def tokenizers(vocab_files):
    from transformers import CLIPTokenizer

    from seesaw_tpu.models.tokenizer import BpeTokenizer

    vocab_path, merges_path = vocab_files
    hf = CLIPTokenizer(str(vocab_path), str(merges_path), model_max_length=77)
    ours = BpeTokenizer(str(vocab_path), str(merges_path), context_length=77)
    return hf, ours


@pytest.mark.parametrize("text", TEST_STRINGS)
def test_token_for_token(tokenizers, text):
    hf, ours = tokenizers
    hf_ids = hf(text, truncation=True, max_length=77)["input_ids"]
    out = ours.encode(text)
    # our encode zero-pads after EOT; compare the live prefix
    n = int(np.argmax(out == ours.eot)) + 1
    assert out[n:].sum() == 0
    assert list(out[:n]) == hf_ids, f"{text!r}: {list(out[:n])} != {hf_ids}"


def test_specials_and_determinism(tokenizers, vocab_files):
    hf, ours = tokenizers
    assert ours.sot == hf.bos_token_id
    assert ours.eot == hf.eos_token_id

    from seesaw_tpu.models.bpe_train import write_artifacts

    # retraining on the same corpus reproduces byte-identical artifacts
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        v2, m2 = write_artifacts(d, CORPUS, n_merges=400)
        v1, m1 = vocab_files
        assert Path(v1).read_text() == Path(v2).read_text()
        assert Path(m1).read_text() == Path(m2).read_text()


def test_default_tokenizer_picks_bpe(vocab_files, tmp_path):
    from seesaw_tpu.models.tokenizer import BpeTokenizer, default_tokenizer

    tok = default_tokenizer(77, 49408, vocab_dir=vocab_files[0].parent)
    assert isinstance(tok, BpeTokenizer)
    ids = tok.encode("a photo of a dog")
    assert ids[0] == tok.sot and tok.eot in ids
