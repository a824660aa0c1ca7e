import json
import os

import numpy as np
import pytest

from conftest import FIXTURES, random_npenc
from deepmusicgeneration_tpu.codec.decode import npenc2midibytes
from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.midi.score import (
    classify_program,
    compress_score,
    is_empty_midi,
    load_score,
    quantize_ql,
)
from deepmusicgeneration_tpu.midi.smf import (
    parse_midi_bytes,
    parse_midi_file,
    render_midi_bytes,
)

# Golden prefix from the reference evaluation notebook
# (Transformer_Genre_Evaluation.ipynb cell 79 output): Megalovania seed,
# trim_to_beat(64), genre token set to xxelec.
GOLDEN_MEGALOVANIA = (
    "xxelec xxpad n62 d2 i0 xxsep d2 xxni n62 d2 i0 xxsep d2 xxni n74 d4 i0 "
    "xxsep d4 xxni n69 d6 i0 xxsep d6 xxni n68 d4 i0 xxsep d4 xxni n67 d4 i0 "
    "xxsep d4 xxni n65 d4 i0 xxsep d4 xxni n62 d2 i0 xxsep d2 xxni n65 d2 i0 "
    "xxsep d2 xxni n67 d2 i0 xxsep d2 xxni n60 d2 i0 xxsep d2 xxni n60 d2 i0 "
    "xxsep d2 xxni n74 d4 i0 xxsep d4 xxni n69 d6 i0 xxsep d6 xxni n68 d4 i0 "
    "xxsep d4 xxni n67 d4 i0 xxsep d4 xxni n65 d4 i0 xxsep d4 xxni n62 d2 i0 "
    "xxsep d2 xxni n65 d2 i0 xxsep d2 xxni n67 d2 i0 xxsep d2 xxni n59 d2 i0 "
    "xxsep d2 xxni n59 d2 i0 xxsep d2 xxni n74 d4 i0 xxsep d4 xxni n69 d6 i0 "
    "xxsep d6 xxni n68 d4 i0"
)


def test_golden_megalovania_tokens(vocab):
    item = MusicItem.from_file("/root/reference/Undertale_-_Megalovania.mid", vocab,
                               genre="electronic")
    seed = item.trim_to_beat(64)
    text = seed.to_text()
    assert text.startswith(GOLDEN_MEGALOVANIA)


@pytest.mark.parametrize("fp", FIXTURES)
def test_parse_fixtures(fp, vocab):
    score = load_score(fp)
    assert score.accepted_parts(), fp
    item = MusicItem.from_file(fp, vocab)
    assert len(item) > 100
    # After one canonicalising pass (instrument column now holds class ids,
    # not part indices) the npenc ↔ idxenc round trip is exactly stable.
    npenc = MusicItem.from_npenc(item.to_npenc(), vocab).to_npenc()
    item2 = MusicItem.from_npenc(npenc, vocab)
    np.testing.assert_array_equal(item2.to_npenc(), npenc)


def test_midi_write_read_roundtrip(vocab, tmp_path):
    rng = np.random.default_rng(7)
    npenc = random_npenc(rng, n_groups=30)
    from deepmusicgeneration_tpu.codec.index import sort_instruments
    npenc = sort_instruments(npenc, vocab)
    data = npenc2midibytes(npenc, bpm=120)
    # re-parse our own MIDI bytes and re-encode: note content must survive
    item = MusicItem.from_npenc(npenc, vocab)
    item2 = MusicItem.from_score(
        __import__("deepmusicgeneration_tpu.midi.score", fromlist=["x"]).midifile_to_score(
            parse_midi_bytes(data)
        ),
        vocab,
    )
    n1, n2 = item.to_npenc(), item2.to_npenc()
    # decoded instrument lanes are grouped by class id so note rows correspond
    notes1 = n1[n1[:, 0] >= 0]
    notes2 = n2[n2[:, 0] >= 0]
    assert len(notes1) == len(notes2)
    np.testing.assert_array_equal(np.sort(notes1[:, 0]), np.sort(notes2[:, 0]))


def test_smf_render_parse_identity(tmp_path):
    mf = parse_midi_file("/root/reference/fur_elise.mid")
    data = render_midi_bytes(mf)
    mf2 = parse_midi_bytes(data)
    notes1 = sorted((e.tick, e.data[0]) for t in mf.tracks for e in t.events
                    if e.type == "note_on" and e.data[1] > 0)
    notes2 = sorted((e.tick, e.data[0]) for t in mf2.tracks for e in t.events
                    if e.type == "note_on" and e.data[1] > 0)
    assert notes1 == notes2


def test_is_empty_midi():
    assert not is_empty_midi("/root/reference/fur_elise.mid")
    assert not is_empty_midi(None)


def test_classify_program():
    assert classify_program(0) == "Piano"
    assert classify_program(25) == "Guitar"
    assert classify_program(33) == "Bass"
    assert classify_program(73) == "WoodwindInstrument"
    assert classify_program(57) == "BrassInstrument"
    assert classify_program(40) == "StringInstrument"
    assert classify_program(81) == "Misc"
    assert classify_program(0, channel=9) is None   # percussion channel
    assert classify_program(118) is None            # percussive program
    assert classify_program(None) == "Misc"


def test_quantize_ql():
    assert quantize_ql(0.26) == 0.25
    assert abs(quantize_ql(0.34) - 1 / 3) < 1e-9
    assert quantize_ql(1.0) == 1.0


def test_compress_score():
    score = load_score("/root/reference/Undertale_-_Megalovania.mid")
    small = compress_score(score, cutoff=1)
    assert small is not None and len(small.parts) == 1
    # keeps the part with the most pitch variety
    best = max(score.accepted_parts(), key=lambda p: len(set(p.notes[:, 0].tolist())))
    assert len(small.parts[0].notes) == len(best.notes)


def test_smf_parser_never_crashes_on_garbage():
    """Fuzz: arbitrary bytes either parse or raise ValueError — no hangs or
    unexpected exceptions (host-facing input safety)."""
    import numpy as np
    from deepmusicgeneration_tpu.midi.smf import parse_midi_bytes
    rng = np.random.default_rng(0)
    with open("/root/reference/fur_elise.mid", "rb") as f:
        real = bytearray(f.read())
    for trial in range(30):
        data = bytearray(real)
        n_flips = rng.integers(1, 50)
        for _ in range(n_flips):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        try:
            mf = parse_midi_bytes(bytes(data))
            assert mf.tracks is not None
        except (ValueError, IndexError):
            pass  # clean rejection is fine


def test_decoder_never_crashes_on_malformed_idxenc(vocab):
    """Random token soup must decode to npenc/MIDI without exceptions."""
    import numpy as np
    from deepmusicgeneration_tpu.codec.index import idxenc2npenc
    from deepmusicgeneration_tpu.codec.decode import npenc2midibytes
    rng = np.random.default_rng(1)
    for trial in range(20):
        idx = rng.integers(0, len(vocab), size=rng.integers(1, 200))
        npenc = idxenc2npenc(idx, vocab)
        data = npenc2midibytes(npenc)
        assert data[:4] == b"MThd"
