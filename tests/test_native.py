"""Native C++ tokenizer: bit-parity with the Python pipeline."""

import numpy as np
import pytest

from conftest import FIXTURES
from deepmusicgeneration_tpu.codec.item import MusicItem, score_to_npenc
from deepmusicgeneration_tpu.midi.native import ensure_built, tokenize_file_native
from deepmusicgeneration_tpu.midi.score import load_score

native_ok = ensure_built()

pytestmark = pytest.mark.skipif(not native_ok, reason="native lib not built")

ALL_FIXTURES = FIXTURES + [
    "/root/reference/The Chainsmokers & Coldplay - Something Just Like This "
    " (midi by Carlo Prato) (www.cprato.com).mid",
]


@pytest.mark.parametrize("fp", ALL_FIXTURES)
def test_native_bit_parity(fp):
    npenc_nat, ins_nat = tokenize_file_native(fp)
    npenc_py, ins_py = score_to_npenc(load_score(fp))
    np.testing.assert_array_equal(npenc_nat, npenc_py)
    assert ins_nat == ins_py


def test_native_used_by_from_file(vocab, monkeypatch):
    item_native = MusicItem.from_file(FIXTURES[0], vocab)
    monkeypatch.setenv("DMG_NO_NATIVE", "1")
    item_python = MusicItem.from_file(FIXTURES[0], vocab)
    np.testing.assert_array_equal(item_native.data, item_python.data)


def test_native_rejects_garbage():
    from deepmusicgeneration_tpu.midi.native import tokenize_midi_native
    assert tokenize_midi_native(b"not a midi file at all") is None


def test_native_bytes_input():
    from deepmusicgeneration_tpu.midi.native import tokenize_midi_native
    with open(FIXTURES[0], "rb") as f:
        data = f.read()
    npenc, ins = tokenize_midi_native(data)
    assert len(npenc) > 100 and ins
