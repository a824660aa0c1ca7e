import numpy as np

from deepmusicgeneration_tpu.vocab import (
    ACCEP_INS,
    DUR_SIZE,
    MAX_NOTE_DUR,
    SEP_INS_VAL,
    MusicVocab,
    genre_prefix_token,
)


def test_vocab_layout_genre(vocab):
    # reference runtime-confirmed size (notebook cell 75)
    assert len(vocab) == 324
    assert vocab.itos[:12] == (
        "xxbos", "xxpad", "xxeos", "xxmask",
        "xxelec", "xxfolk", "xxfunk", "xxjazz", "xxpop", "xxrock",
        "xxni", "xxsep",
    )
    assert vocab.itos[12] == "n0" and vocab.itos[139] == "n127"
    assert vocab.itos[140] == "d0" and vocab.itos[300] == "d160"
    assert vocab.itos[301] == "i0" and vocab.itos[307] == "i6"
    assert vocab.itos[308] == "mt0" and vocab.itos[317] == "mt9"
    assert vocab.itos[318] == "dummy0" and vocab.itos[323] == "dummy5"
    assert vocab.note_range == (12, 140)
    assert vocab.dur_range == (140, 301)
    assert vocab.ins_range == (301, 308)
    assert vocab.npenc_range == (10, 308)
    assert vocab.sep_idx == 11 and vocab.ni_idx == 10


def test_vocab_layout_s2s_is_302(s2s_vocab):
    # deep_music_s2s.py:901-905: itos = SPECIAL_TOKS + NOTE_TOKS + DUR_TOKS
    # + INS_TOKS with the dummy-padding block commented out →
    # 6 specials + 128 + 161 + 7 = 302 tokens exactly, NO dummies.
    assert len(s2s_vocab) == 302
    assert s2s_vocab.itos[:6] == ("xxbos", "xxpad", "xxeos", "xxmask", "xxni", "xxsep")
    assert s2s_vocab.sep_idx == 5 and s2s_vocab.ni_idx == 4
    assert s2s_vocab.itos[6] == "n0" and s2s_vocab.itos[133] == "n127"
    assert s2s_vocab.itos[134] == "d0" and s2s_vocab.itos[294] == "d160"
    assert s2s_vocab.itos[295] == "i0" and s2s_vocab.itos[301] == "i6"
    assert not any(t.startswith("dummy") for t in s2s_vocab.itos)


def test_constants():
    assert DUR_SIZE == 161
    assert MAX_NOTE_DUR == 128
    assert SEP_INS_VAL == -291
    assert ACCEP_INS == {
        "Piano": 0, "Guitar": 1, "Bass": 2, "WoodwindInstrument": 3,
        "BrassInstrument": 4, "StringInstrument": 5, "Misc": 6,
    }


def test_predicates(vocab):
    assert vocab.is_note(vocab.sep_idx)          # reference quirk: sep is "note"
    assert vocab.is_ins(vocab.ni_idx)
    assert vocab.is_duration(vocab.dur_range[0])
    assert vocab.is_duration_or_pad(vocab.pad_idx)
    assert not vocab.is_note(vocab.dur_range[0])


def test_textify_roundtrip(vocab):
    ids = [0, 1, 11, 12, 140, 301, 323]
    text = vocab.textify(ids)
    assert vocab.numericalize(text.split(" ")) == ids


def test_genre_prefix():
    assert genre_prefix_token("Electronic music") == "xxelec"
    assert genre_prefix_token(" JAZZ ") == "xxjazz"
    assert genre_prefix_token("unknown") == "xxbos"


def test_save_load(tmp_path, vocab):
    p = tmp_path / "vocab.json"
    vocab.save(p)
    v2 = MusicVocab.load(p)
    assert v2.itos == vocab.itos and v2.layout == vocab.layout
