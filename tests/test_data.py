"""Data-layer tests: tokenizers, vocab round-trips, static-shape batching."""

import os

import numpy as np
import pytest

from itrx.data import precomp, synthetic, tokenization, vocab
from itrx.data.treebank import word_tokenize


def test_treebank_basic():
    assert word_tokenize("A man, riding a horse.") == [
        "A", "man", ",", "riding", "a", "horse", ".",
    ]
    assert word_tokenize("don't stop") == ["do", "n't", "stop"]
    assert word_tokenize('He said "hi there"') == [
        "He", "said", "``", "hi", "there", "''",
    ]


def test_wordpiece_matches_known_behavior(tmp_path):
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able", "want", "hello"]) + "\n")
    tok = tokenization.FullTokenizer(vocab_file=str(vpath))
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("unwanted") == ["[UNK]"]
    assert tok.convert_tokens_to_ids(["hello", "want"]) == [8, 7]


def test_convert_to_feature_sep_placement(tmp_path):
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "dog", "runs"]) + "\n")
    tok = tokenization.FullTokenizer(vocab_file=str(vpath))
    tokens, ids, mask, type_ids = tokenization.convert_to_feature("a dog runs", 8, tok)
    # reference quirk: [SEP] inserted before the final wordpiece
    assert tokens == ["[CLS]", "a", "dog", "[SEP]", "runs"]
    assert mask == [1, 1, 1, 1, 1, 0, 0, 0]
    assert len(ids) == 8 and ids[5:] == [0, 0, 0]


def test_vocab_roundtrip(tmp_path):
    v = vocab.build_vocab(["a dog runs fast"] * 5 + ["a cat sits"] * 5, threshold=4)
    assert v("<pad>") == 0 and v("<start>") == 1 and v("<end>") == 2 and v("<unk>") == 3
    assert v("dog") > 3
    assert v("zebra") == 3  # unk
    p = tmp_path / "v.json"
    vocab.serialize_vocab(v, str(p))
    v2 = vocab.deserialize_vocab(str(p))
    assert v2("dog") == v("dog") and len(v2) == len(v)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return synthetic.generate(str(d), n_images=16, img_dim=32)


def _config(synth_dir, **kw):
    cfg = {
        "name": "VSE_PP",
        "data_path": os.path.dirname(synth_dir),
        "data_name": os.path.basename(synth_dir),
        "vocab_path": os.path.join(synth_dir, "vocab"),
        "vocab_type": "json",
        "text_encoder": "gru",
        "use_bbox": False,
        "max_words": 32,
        "pad_words": 96,
        "max_len": 60,
    }
    cfg.update(kw)
    return cfg


def test_precomp_loading_and_batching(synth_dir):
    cfg = _config(synth_dir)
    dpath = synth_dir
    ds = precomp.PrecompDataset(dpath, "train", cfg)
    assert ds.im_div == 5
    assert len(ds) == 16 * 5
    assert ds.cap_ids.shape[0] == 80
    assert ds.cap_ids.shape[1] % 8 == 0

    batches = list(ds.train_batches(batch_size=8, seed=0))
    assert len(batches) == 10
    b = batches[0]
    assert b["images"].shape == (8, 36, 32)
    assert b["cap_ids"].shape == (8, ds.cap_ids.shape[1])
    assert b["cap_mask"].sum() > 0
    # shuffling differs across epochs
    b2 = next(iter(ds.train_batches(batch_size=8, seed=0, epoch=1)))
    assert not np.array_equal(b["ids"], b2["ids"])


def test_eval_batches_pad_final(synth_dir):
    cfg = _config(synth_dir)
    ds = precomp.PrecompDataset(synth_dir, "dev", cfg)
    bs = 7
    batches = list(ds.eval_batches(batch_size=bs))
    assert all(b["images"].shape[0] == bs for b in batches)
    total = sum(b["n_valid"] for b in batches)
    assert total == len(ds)


def test_vsrn_padding_quirk(synth_dir):
    cfg = _config(synth_dir, name="VSRN", max_len=12)
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    assert ds.cap_ids.shape[1] == 13
    # encoder mask is all ones (parity quirk); label mask marks real tokens
    assert ds.cap_mask.min() == 1.0
    assert ds.label_mask.sum() < ds.label_mask.size


def test_use_bbox(synth_dir):
    cfg = _config(synth_dir, use_bbox=True)
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    b = next(iter(ds.train_batches(batch_size=4)))
    assert b["boxes"].shape == (4, 36, 4)
    assert b["imgs_wh"].shape == (4, 2)


def test_bert_dataset(synth_dir, tmp_path):
    vpath = synthetic.write_tiny_bert_vocab(str(tmp_path / "bert_vocab.txt"))
    cfg = _config(synth_dir, text_encoder="bert", vocab_file=vpath, name="SAEM")
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    assert ds.cap_ids.shape == (80, 32)
    assert ds.type_ids is not None
    assert ds.vocab_size == 32  # 5 specials + 27 words


def test_train_batches_trim_to_batch_max(synth_dir):
    cfg = _config(synth_dir)
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    # force a long static pad, then check batches trim back down
    L = ds.cap_ids.shape[1]
    ds.cap_ids = np.pad(ds.cap_ids, ((0, 0), (0, 40)))
    ds.cap_mask = np.pad(ds.cap_mask, ((0, 0), (0, 40)))
    b = next(iter(ds.train_batches(batch_size=8, seed=0)))
    assert b["cap_ids"].shape[1] <= L  # trimmed to batch max (rounded to 8)
    assert b["cap_ids"].shape[1] % 8 == 0
    np.testing.assert_array_equal(
        b["cap_mask"].sum(1), ds.cap_mask[b["ids"]].sum(1)
    )


def test_vsrn_batches_not_trimmed(synth_dir):
    cfg = _config(synth_dir, name="VSRN", max_len=12)
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    b = next(iter(ds.train_batches(batch_size=8)))
    assert b["cap_ids"].shape[1] == 13  # fixed max_len+1 layout preserved


def test_vocab_pkl_config_falls_back_to_json(synth_dir):
    """vocab_type='pkl' with only a JSON vocab on disk must load it
    (review fix: the alt-extension path was corrupted for .pkl)."""
    cfg = _config(synth_dir, vocab_type="pkl")
    ds = precomp.PrecompDataset(synth_dir, "train", cfg)
    ds2 = precomp.PrecompDataset(synth_dir, "train", _config(synth_dir))
    np.testing.assert_array_equal(ds.cap_ids, ds2.cap_ids)


def test_shipped_reference_vocabs():
    """The two reference vocab data files ship with itrx (VERDICT item 3):
    documented sizes and the four special tokens at ids 0-3."""
    import itrx

    vdir = os.path.join(os.path.dirname(itrx.__file__), "vocab")
    for name, size in (("coco_precomp", 11353), ("f30k_precomp", 8481)):
        v = vocab.deserialize_vocab(os.path.join(vdir, f"{name}_vocab.json"))
        assert len(v) == size, (name, len(v))
        for tok, idx in ((vocab.PAD, 0), (vocab.START, 1), (vocab.END, 2), (vocab.UNK, 3)):
            assert v(tok) == idx


def test_shipped_vocab_loads_from_any_cwd(tmp_path):
    """With no vocab at vocab_path, the packaged reference vocab is used
    (never a silently rebuilt incompatible one)."""
    d = synthetic.generate(str(tmp_path / "f30k_precomp"), n_images=8, img_dim=32)
    cfg = _config(d, vocab_path=str(tmp_path / "nonexistent"))
    assert cfg["data_name"] == "f30k_precomp"
    ds = precomp.PrecompDataset(d, "train", cfg)
    assert ds.vocab_size == 8481


def test_treebank_matches_nltk_goldens():
    """Golden outputs of nltk.word_tokenize (Penn Treebank rules) on
    representative caption text — contractions, quotes, punctuation,
    currency, dashes (VERDICT weak #6: tokenizer parity)."""
    from itrx.data.treebank import word_tokenize

    goldens = {
        "a man, who isn't tall, doesn't play.":
            ["a", "man", ",", "who", "is", "n't", "tall", ",", "does", "n't",
             "play", "."],
        '"hello," she said.':
            ["``", "hello", ",", "''", "she", "said", "."],
        "can't won't it's they're we'll i'm gonna":
            ["ca", "n't", "wo", "n't", "it", "'s", "they", "'re", "we", "'ll",
             "i", "'m", "gon", "na"],
        "a dog--a big one--runs; fast, really fast... yes!":
            ["a", "dog", "--", "a", "big", "one", "--", "runs", ";", "fast",
             ",", "really", "fast", "...", "yes", "!"],
        "the man's hat (a red one) costs $5.50, right?":
            ["the", "man", "'s", "hat", "(", "a", "red", "one", ")", "costs",
             "$", "5.50", ",", "right", "?"],
    }
    for text, want in goldens.items():
        assert word_tokenize(text) == want, text


def test_tokenized_caption_hits_shipped_vocab():
    """A real f30k caption tokenizes onto in-vocab ids (not <unk>)."""
    import itrx
    from itrx.data.treebank import word_tokenize

    vdir = os.path.join(os.path.dirname(itrx.__file__), "vocab")
    v = vocab.deserialize_vocab(os.path.join(vdir, "f30k_precomp_vocab.json"))
    caption = "Two young guys with shaggy hair look at their hands while hanging out in the yard."
    toks = word_tokenize(caption.lower())
    unk = v("<unk>")
    ids = [v(t) for t in toks]
    assert sum(i == unk for i in ids) == 0, [t for t, i in zip(toks, ids) if i == unk]
