"""Exhaustive GM-program instrument-classing audit (all 128 programs).

The reference classifies parts through music21's class hierarchy
(core/encodings.py:202-235): KeyboardInstrument → Piano; instrumentName
Guitar variants → Guitar; Guitar-class + "Bass" in the name → Bass;
otherwise the intersection of the music21 class list with ACCEP_INS
{Piano, Guitar, Bass, WoodwindInstrument, BrassInstrument, StringInstrument,
Misc}; a nameless Instrument → Misc; no intersection → part rejected.

This repo re-derives that outcome per GM program without music21
(midi/score.py:31-67). The table below pins every program's class as the
framework's contract. Rows marked DIVERGENCE document where this table
intentionally differs from a literal music21 walk (music21 is not installed
in this environment; rationale given per row):

* 22 Harmonica → WoodwindInstrument. music21 defines Harmonica as a wind
  instrument; classing it Woodwind keeps it tokenizable (the reference's
  set-intersection would reject it if music21 reported only WindInstrument).
* 48-51 string ensembles → StringInstrument. music21 has no specific class
  for GM ensemble programs; the parts are string sections, and rejecting
  them would drop the most common orchestral pads in Lakh MIDI.
* 109 Bagpipe / 111 Shanai → WoodwindInstrument (wind instruments without a
  music21 WoodwindInstrument subclass in some versions).
* 10 Music Box / 55 Orchestra Hit / 108 Kalimba → Misc: music21 has no
  mapping, so the reference's nameless-Instrument branch (encodings.py:234)
  yields Misc.
"""

import pytest

from deepmusicgeneration_tpu.midi.score import CLASS_TO_PROGRAM, classify_program

P = "Piano"
G = "Guitar"
B = "Bass"
W = "WoodwindInstrument"
BR = "BrassInstrument"
S = "StringInstrument"
M = "Misc"
X = None  # rejected part

# Expected class per GM program 0..127 (0-based, matching SMF program bytes).
EXPECTED = (
    # 0-7 pianos (KeyboardInstrument → Piano, encodings.py:211-213)
    [P] * 8
    # 8 celesta (keyboard) / 9 glockenspiel (pitched percussion → reject)
    + [P, X]
    # 10 music box (no music21 class → nameless Instrument → Misc)
    + [M]
    # 11-14 vibraphone/marimba/xylophone/tubular bells (pitched percussion)
    + [X] * 4
    # 15 dulcimer (StringInstrument subclass)
    + [S]
    # 16-21 organs + accordion (KeyboardInstrument family)
    + [P] * 6
    # 22 harmonica (DIVERGENCE: wind → Woodwind, see module docstring)
    + [W]
    # 23 tango accordion (keyboard)
    + [P]
    # 24-31 guitars (name-based Guitar branch, encodings.py:215-217)
    + [G] * 8
    # 32-39 basses (Guitar class + "Bass" in name, encodings.py:218-220)
    + [B] * 8
    # 40-46 violin/viola/cello/contrabass/tremolo/pizzicato/harp
    + [S] * 7
    # 47 timpani (pitched percussion)
    + [X]
    # 48-51 string ensembles (DIVERGENCE: kept as StringInstrument)
    + [S] * 4
    # 52-54 choir/voice (Vocalist → not in ACCEP_INS → reject)
    + [X] * 3
    # 55 orchestra hit (unmapped → Misc)
    + [M]
    # 56-63 trumpet/trombone/tuba/horns/brass sections
    + [BR] * 8
    # 64-71 saxes + double reeds, 72-79 pipes/flutes
    + [W] * 16
    # 80-103 synth leads/pads/fx (unmapped → nameless → Misc)
    + [M] * 24
    # 104-107 sitar/banjo/shamisen/koto
    + [S] * 4
    # 108 kalimba (unmapped → Misc)
    + [M]
    # 109 bagpipe (DIVERGENCE: wind → Woodwind)
    + [W]
    # 110 fiddle (violin)
    + [S]
    # 111 shanai (DIVERGENCE: wind → Woodwind)
    + [W]
    # 112-119 percussive (tinkle bell/agogo/steel drums/woodblock/taiko/toms)
    + [X] * 8
    # 120-127 sound effects
    + [M] * 8
)


def test_expected_table_is_exhaustive():
    assert len(EXPECTED) == 128


@pytest.mark.parametrize("program", range(128))
def test_classify_program_pin(program):
    assert classify_program(program) == EXPECTED[program], (
        f"GM program {program}: classify_program returned "
        f"{classify_program(program)!r}, table pins {EXPECTED[program]!r}")


def test_percussion_channel_always_rejected():
    # GM channel 10 (0-based 9) is percussion regardless of program
    for program in (0, 24, 40, 56, 127):
        assert classify_program(program, channel=9) is None


def test_nameless_instrument_is_misc():
    # reference encodings.py:234-236: Instrument with no name → Misc
    assert classify_program(None) == "Misc"


def test_out_of_range_program_is_misc():
    assert classify_program(128) == "Misc"
    assert classify_program(-1) == "Misc"


def test_class_to_program_round_trips():
    """Decode-side programs map back into their own class (encodings.py:343-367)."""
    for cls, prog in CLASS_TO_PROGRAM.items():
        if cls == "Misc":
            continue  # Misc renders as piano by design
        assert classify_program(prog) == cls
