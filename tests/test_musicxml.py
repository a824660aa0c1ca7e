"""MusicXML input breadth: the reference accepts anything music21 parses
(file2stream, core/encodings.py:170-177); our dependency-free reader covers
the MusicXML constructs the tokenizer consumes, dispatched by content sniff
through the same load_score entry as SMF."""

import io
import zipfile

import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.midi.musicxml import is_musicxml, musicxml_to_score
from deepmusicgeneration_tpu.midi.score import load_score
from deepmusicgeneration_tpu.vocab import MusicVocab


def _doc(parts_xml: str, part_list: str) -> bytes:
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<score-partwise version="3.1">
  <part-list>{part_list}</part-list>
  {parts_xml}
</score-partwise>""".encode()


def _note(step, octave, dur, chord=False, tie=None, alter=None):
    c = "<chord/>" if chord else ""
    a = f"<alter>{alter}</alter>" if alter is not None else ""
    t = f'<tie type="{tie}"/>' if tie else ""
    return (f"<note>{c}<pitch><step>{step}</step>{a}"
            f"<octave>{octave}</octave></pitch>"
            f"<duration>{dur}</duration>{t}</note>")


PIANO_PART = ('<score-part id="P1"><part-name>Piano</part-name>'
              '<midi-instrument id="P1-I1"><midi-channel>1</midi-channel>'
              '<midi-program>1</midi-program></midi-instrument></score-part>')
BASS_PART = ('<score-part id="P2"><part-name>Bass</part-name>'
             '<midi-instrument id="P2-I1"><midi-channel>2</midi-channel>'
             '<midi-program>34</midi-program></midi-instrument></score-part>')


def two_part_doc():
    p1 = ("<part id=\"P1\"><measure number=\"1\">"
          "<attributes><divisions>4</divisions></attributes>"
          "<direction><sound tempo=\"96\"/></direction>"
          + _note("C", 5, 4) + _note("E", 5, 4) + _note("G", 5, 8)
          + "</measure></part>")
    p2 = ("<part id=\"P2\"><measure number=\"1\">"
          "<attributes><divisions>4</divisions></attributes>"
          + _note("C", 3, 16) + "</measure></part>")
    return _doc(p1 + p2, PIANO_PART + BASS_PART)


def test_two_parts_programs_and_notes():
    score = musicxml_to_score(two_part_doc())
    assert score.bpm == 96.0
    assert [p.ins_class for p in score.parts] == ["Piano", "Bass"]
    piano, bass = score.parts
    # divisions=4 → one division = a 16th = one SAMPLE_FREQ step
    np.testing.assert_array_equal(
        piano.notes, [[72, 0, 4], [76, 4, 4], [79, 8, 8]])
    np.testing.assert_array_equal(bass.notes, [[48, 0, 16]])


def test_load_score_sniffs_musicxml_and_item_roundtrip():
    vocab = MusicVocab.create()
    data = two_part_doc()
    assert is_musicxml(data)
    score = load_score(data)          # same entry as SMF
    assert len(score.accepted_parts()) == 2
    item = MusicItem.from_score(score, vocab)
    assert len(item.data) > 4
    text = item.to_text()
    assert text.startswith("xxbos xxpad")
    assert "i0" in text and "i2" in text  # Piano + Bass lanes


def test_chords_share_onset():
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>2</divisions></attributes>"
         + _note("C", 4, 4) + _note("E", 4, 4, chord=True)
         + _note("G", 4, 4, chord=True) + _note("D", 4, 2)
         + "</measure></part>")
    score = musicxml_to_score(_doc(p, PIANO_PART))
    notes = score.parts[0].notes
    # triad at step 0 (4 divisions at div=2 → 2 ql → 8 steps... 4/2=2ql=8 steps)
    starts = sorted(notes[:, 1].tolist())
    assert starts == [0, 0, 0, 8]
    assert set(notes[notes[:, 1] == 0][:, 0]) == {60, 64, 67}


def test_ties_merge_durations():
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>4</divisions></attributes>"
         + _note("A", 4, 16, tie="start") + "</measure>"
         "<measure number=\"2\">" + _note("A", 4, 8, tie="stop")
         + _note("B", 4, 8) + "</measure></part>")
    score = musicxml_to_score(_doc(p, PIANO_PART))
    notes = score.parts[0].notes
    assert len(notes) == 2
    a = notes[notes[:, 0] == 69][0]
    assert a[1] == 0 and a[2] == 24          # 16+8 divisions = 6 ql = 24 steps
    b = notes[notes[:, 0] == 71][0]
    assert b[1] == 24 and b[2] == 8   # follows the tied continuation (6 ql)


def test_backup_voices():
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>4</divisions></attributes>"
         + _note("C", 5, 16)
         + "<backup><duration>16</duration></backup>"
         + _note("C", 3, 8) + _note("G", 3, 8)
         + "</measure></part>")
    score = musicxml_to_score(_doc(p, PIANO_PART))
    notes = score.parts[0].notes
    assert len(notes) == 3
    assert notes[notes[:, 0] == 72][0][1] == 0     # melody at onset 0
    assert notes[notes[:, 0] == 48][0][1] == 0     # voice 2 back at onset 0
    assert notes[notes[:, 0] == 55][0][1] == 8


def test_rests_and_alter_advance_time():
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>1</divisions></attributes>"
         + _note("C", 4, 1)
         + "<note><rest/><duration>1</duration></note>"
         + _note("F", 4, 1, alter=1)
         + "</measure></part>")
    score = musicxml_to_score(_doc(p, PIANO_PART))
    notes = score.parts[0].notes
    np.testing.assert_array_equal(notes, [[60, 0, 4], [66, 8, 4]])


def test_mxl_container():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("META-INF/container.xml",
                   '<?xml version="1.0"?><container><rootfiles>'
                   '<rootfile full-path="score.xml"/></rootfiles></container>')
        z.writestr("score.xml", two_part_doc())
    data = buf.getvalue()
    assert is_musicxml(data)
    score = load_score(data)
    assert [p.ins_class for p in score.parts] == ["Piano", "Bass"]


def test_name_fallback_classing():
    part_list = ('<score-part id="P1"><part-name>Violoncello</part-name>'
                 "</score-part>")
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>1</divisions></attributes>"
         + _note("C", 3, 4) + "</measure></part>")
    score = musicxml_to_score(_doc(p, part_list))
    assert score.parts[0].ins_class == "StringInstrument"
    # and the class must be a real ACCEP_INS key so tokenization keeps it
    from deepmusicgeneration_tpu.vocab import ACCEP_INS
    assert score.parts[0].ins_class in ACCEP_INS


def test_smf_equivalence():
    """The same music through MusicXML and through SMF tokenizes identically."""
    from deepmusicgeneration_tpu.codec.item import score_to_npenc
    from deepmusicgeneration_tpu.midi.score import Part, Score
    xml_score = musicxml_to_score(two_part_doc())
    manual = Score(parts=[
        Part(notes=np.array([[72, 0, 4], [76, 4, 4], [79, 8, 8]]), ins_class="Piano"),
        Part(notes=np.array([[48, 0, 16]]), ins_class="Bass"),
    ], bpm=96.0)
    np.testing.assert_array_equal(score_to_npenc(xml_score)[0],
                                  score_to_npenc(manual)[0])


def test_divisions_change_mid_part():
    p = ("<part id=\"P1\"><measure number=\"1\">"
         "<attributes><divisions>4</divisions></attributes>"
         + _note("C", 4, 16) + "</measure>"
         "<measure number=\"2\">"
         "<attributes><divisions>8</divisions></attributes>"
         + _note("D", 4, 8) + "</measure></part>")
    score = musicxml_to_score(_doc(p, PIANO_PART))
    notes = score.parts[0].notes
    # measure 2 starts at 4 ql = 16 steps regardless of the divisions change
    d = notes[notes[:, 0] == 62][0]
    assert d[1] == 16 and d[2] == 4


def test_measure_resync_after_short_second_voice():
    m1 = ("<measure number=\"1\">"
          "<attributes><divisions>4</divisions></attributes>"
          + _note("C", 5, 16)
          + "<backup><duration>16</duration></backup>"
          + _note("C", 3, 8) + "</measure>")     # voice 2 ends mid-measure
    m2 = "<measure number=\"2\">" + _note("D", 5, 4) + "</measure>"
    score = musicxml_to_score(_doc(f'<part id="P1">{m1}{m2}</part>', PIANO_PART))
    notes = score.parts[0].notes
    # measure 2's note starts at 4 ql (the furthest point reached), not 2 ql
    assert notes[notes[:, 0] == 74][0][1] == 16


def test_chord_onset_after_tie_merge():
    m1 = ("<measure number=\"1\">"
          "<attributes><divisions>4</divisions></attributes>"
          + _note("C", 4, 8, tie="start") + _note("E", 4, 8, chord=True)
          + "</measure>")
    m2 = ("<measure number=\"2\">"
          + _note("C", 4, 4, tie="stop")        # merged, appends no row
          + _note("E", 4, 4, chord=True)        # re-attack: onset = C-stop's
          + "</measure>")
    score = musicxml_to_score(_doc(f'<part id="P1">{m1}{m2}</part>', PIANO_PART))
    notes = score.parts[0].notes
    e_notes = notes[notes[:, 0] == 64]
    assert sorted(e_notes[:, 1].tolist()) == [0, 8]  # NOT both at 0
