"""Humdrum **kern → Score: the last member of the reference's input breadth.

music21's `converter.parse` (the reference's `file2stream`,
core/encodings.py:170-177) also reads Humdrum kern files (the musicology
corpus format — Bach chorales, Essen folk collection). This covers the core
**kern constructs the tokenizer can represent, emitting the shared
:class:`~.score.Score` IR:

* one Part per ``**kern`` spine (columns are tab-separated; other exclusive
  interpretations — ``**dynam``, ``**text`` … — are ignored),
* recip rhythms (``4`` = quarter, ``2.`` dotted half, ``12`` triplet
  eighth, ``0`` breve), pitch tokens (``c`` = C4 rising with repetition
  ``cc`` = C5; ``C`` = C3 falling with ``CC`` = C2), ``#``/``-`` accidentals
  (absolute in kern — no key-signature inference needed), ``n`` naturals,
* chords (space-separated notes inside one data token share onset),
* ties (``[`` opens, ``]`` closes — durations merged), rests (``r``),
* tandem interpretations: ``*MM`` tempo, ``*I'``/``*I`` instrument names
  (name-classified), everything else skipped,
* spine splits/joins/exchanges (``*^`` ``*v`` ``*x``) are NOT tracked — the
  sub-spine's notes merge into the parent part (onset-correct, which is all
  the piano-roll codec keeps anyway).

Durations/onsets accumulate per spine in quarter-lengths and quantize
through the same ``quantize_ql`` grid as every other reader.
"""

from __future__ import annotations

import re
from fractions import Fraction
from typing import Dict, List, Optional, Tuple

import numpy as np

from .score import Part, Score, quantize_ql
from ..vocab import SAMPLE_FREQ

_STEP_SEMIS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}

# instrument-name → ACCEP_INS class (subset of the musicxml fallback table)
_NAME_CLASSES = [
    ("piano", "Piano"), ("organ", "Piano"), ("harpsi", "Piano"),
    ("clavi", "Piano"), ("guitar", "Guitar"), ("lute", "Guitar"),
    ("bass", "Bass"), ("cello", "String"), ("violon", "String"),
    ("viol", "String"), ("flute", "Woodwind"), ("oboe", "Woodwind"),
    ("clarin", "Woodwind"), ("bassoon", "Woodwind"), ("recorder", "Woodwind"),
    ("trump", "Brass"), ("horn", "Brass"), ("tromb", "Brass"),
    ("tuba", "Brass"), ("sax", "Brass"), ("voice", "Woodwind"),
    ("sopran", "Woodwind"), ("alto", "Woodwind"), ("tenor", "Woodwind"),
]


def is_kern(data: bytes) -> bool:
    try:
        head = data[:4096].decode("utf-8", "replace")
    except Exception:
        return False
    return "**kern" in head


def _recip_ql(tok: str) -> Optional[Fraction]:
    """kern recip → quarter-length: 4 → 1, 2. → 3, 12 → 1/3, 0 → 8.
    Searched (not anchored): tie/slur/beam prefixes like ``[2c`` are legal."""
    m = re.search(r"(\d+)(\.*)", tok)
    if not m:
        return None
    n = int(m.group(1))
    base = Fraction(8) if n == 0 else Fraction(4, n)
    ql = base
    add = base
    for _ in m.group(2):
        add = add / 2
        ql += add
    return ql


def _pitch_midi(tok: str) -> Optional[int]:
    m = re.search(r"([a-gA-G])\1*", tok)
    if not m:
        return None
    seq = m.group(0)
    letter = seq[0]
    reps = len(seq)
    if letter.islower():                      # c=C4, cc=C5, ccc=C6 …
        octave = 4 + (reps - 1)
    else:                                     # C=C3, CC=C2 …
        octave = 3 - (reps - 1)
    alter = tok.count("#") - tok.count("-")
    if "n" in tok:
        alter = 0
    return 12 * (octave + 1) + _STEP_SEMIS[letter.upper()] + alter


def _classify_name(name: str) -> Optional[str]:
    low = (name or "").lower()
    for frag, cls in _NAME_CLASSES:
        if frag in low:
            return cls
    return "Piano"   # kern corpora are keyboard/choral-dominated


class _Spine:
    def __init__(self):
        self.pos = Fraction(0)
        self.events: List[Tuple[int, Fraction, Fraction]] = []
        self.open_ties: Dict[int, int] = {}
        self.name = ""


def kern_to_score(data: bytes, quantize: bool = True) -> Score:
    text = data.decode("utf-8", "replace")
    bpm = 120.0
    spines: List[Optional[_Spine]] = []   # None for non-kern spines
    started = False

    for raw in text.splitlines():
        line = raw.rstrip()
        if not line or line.startswith("!"):
            continue
        cols = line.split("\t")
        if not started:
            if cols[0].startswith("**"):
                spines = [(_Spine() if c == "**kern" else None) for c in cols]
                started = True
            continue
        if cols[0].startswith("*"):
            # tandem interpretations; spine splits keep column→part mapping
            # approximate (module docstring)
            for ci, c in enumerate(cols):
                sp = spines[ci] if ci < len(spines) else None
                mm = re.match(r"\*MM(\d+(?:\.\d+)?)", c)
                if mm:
                    bpm = float(mm.group(1))
                im = re.match(r"\*I'?([A-Za-z ]+)", c)
                if im and sp is not None and not sp.name:
                    sp.name = im.group(1).strip()
            if "*-" in cols:
                break
            continue
        if cols[0].startswith("="):
            continue
        for ci, c in enumerate(cols):
            sp = spines[ci] if ci < len(spines) else None
            if sp is None or c == ".":
                continue
            notes = c.split()            # chord: space-separated subtokens
            longest = Fraction(0)
            for nt in notes:
                ql = _recip_ql(nt)
                if ql is None:
                    continue
                longest = max(longest, ql)
                if "r" in nt:
                    continue
                midi = _pitch_midi(nt)
                if midi is None or not (0 <= midi < 128):
                    continue
                if "]" in nt and midi in sp.open_ties:
                    ei = sp.open_ties.pop(midi)
                    p, on, d = sp.events[ei]
                    sp.events[ei] = (p, on, d + ql)
                    if "[" in nt:        # tie continues
                        sp.open_ties[midi] = ei
                    continue
                sp.events.append((midi, sp.pos, ql))
                if "[" in nt:
                    sp.open_ties[midi] = len(sp.events) - 1
            sp.pos += longest

    score = Score(bpm=bpm)
    for sp in spines:
        if sp is None or not sp.events:
            continue
        rows = []
        for midi, on, dur in sp.events:
            onf, durf = float(on), float(dur)
            if quantize:
                onf, durf = quantize_ql(onf), quantize_ql(durf)
            rows.append((midi, int(round(onf * SAMPLE_FREQ)),
                         max(int(round(durf * SAMPLE_FREQ)), 1)))
        arr = np.array(sorted(rows, key=lambda r: (r[1], r[2])), dtype=np.int64)
        score.parts.append(Part(notes=arr, ins_class=_classify_name(sp.name),
                                program=0, name=sp.name))
    return score
