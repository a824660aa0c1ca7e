"""ABC notation → Score: input breadth beyond SMF/MusicXML.

The reference accepts anything music21 parses (`file2stream`,
core/encodings.py:170-177); after MIDI and MusicXML, ABC is the most common
member of that long tail (folk/session tune collections). This is a
dependency-free reader for the ABC constructs the tokenizer can represent,
emitting the shared :class:`~.score.Score` / :class:`~.score.Part` IR so
everything downstream (chordarr, npenc, vocab) is identical to the other
input paths.

Supported (the music21 abcFormat feature set that survives tokenization):

* header fields: ``X:`` ``T:`` ``M:`` ``L:`` (unit note length, defaulted
  from the meter as the standard prescribes), ``Q:`` (tempo, fraction=bpm or
  bare bpm), ``K:`` (key — major/minor/modal, mapped to its accidental set),
  ``V:`` voice declarations; later inline ``[K:..]``/``[L:..]`` changes,
* body: notes with octave marks (``C,``/``c'``), accidentals (``^ _ =`` —
  persisting to the end of the measure, as in standard notation), duration
  multipliers/divisors (``A2  A3/2  A/  A//  A/4``), broken rhythm
  (``A>B  A<B``), rests (``z x Z``), multi-note chords (``[CEG]``), ties
  (``-``), bar lines (reset measure accidentals), simple repeats
  (``|: ... :|`` expanded once, first/second endings ``[1``/``[2`` applied),
* ``%%MIDI program n`` per voice (else parts default to piano classing,
  music21's ABC default instrument).

Skipped without error: grace notes ``{...}``, chord symbols ``"Am"``,
decorations ``!trill!``/``+trill+``, ornaments ``~HLMOPSTuv``, slurs
``( )``, tuplet markers ``(3`` (notes kept at written length — the 16th-step
grid cannot hold nested tuplets the quantizer would not also fold).
"""

from __future__ import annotations

import re
from fractions import Fraction
from typing import Dict, List, Optional, Tuple

import numpy as np

from .score import Part, Score, classify_program, quantize_ql
from ..vocab import SAMPLE_FREQ

_STEP_SEMIS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}

# key signature → set of altered steps: +1 sharp, -1 flat. Circle of fifths.
_SHARP_ORDER = "FCGDAEB"
_FLAT_ORDER = "BEADGCF"
# major-key signature counts (negative = flats); modes shift relative to them
_MAJOR_SIG = {"C": 0, "G": 1, "D": 2, "A": 3, "E": 4, "B": 5, "F#": 6,
              "C#": 7, "F": -1, "Bb": -2, "Eb": -3, "Ab": -4, "Db": -5,
              "Gb": -6, "Cb": -7}
_MODE_SHIFT = {"": 0, "maj": 0, "ion": 0, "min": -3, "m": -3, "aeo": -3,
               "dor": -2, "phr": -4, "lyd": 1, "mix": -1, "loc": -5}


def is_abc(data: bytes) -> bool:
    """Sniff: an ABC tune body must contain ``X:`` and ``K:`` header lines."""
    try:
        head = data[:4096].decode("utf-8", "replace")
    except Exception:
        return False
    return (re.search(r"^X\s*:", head, re.M) is not None
            and re.search(r"^K\s*:", head, re.M) is not None)


def _key_accidentals(key: str) -> Dict[str, int]:
    """'G', 'Em', 'Ador', 'Bb', 'F#mix' → {step: ±1} signature map."""
    m = re.match(r"\s*([A-Ga-g])([#b]?)\s*([A-Za-z]*)", key or "C")
    if not m:
        return {}
    tonic = m.group(1).upper() + m.group(2)
    mode = m.group(3).lower()[:3]
    shift = _MODE_SHIFT.get(mode, _MODE_SHIFT.get(mode[:1], 0) if mode[:1] == "m" else 0)
    sig = _MAJOR_SIG.get(tonic)
    if sig is None:
        return {}
    sig += shift
    if sig >= 0:
        return {s: 1 for s in _SHARP_ORDER[:sig]}
    return {s: -1 for s in _FLAT_ORDER[:-sig]}


def _default_unit(meter: str) -> Fraction:
    """ABC standard: unit note length is 1/16 if the meter is < 3/4, else 1/8."""
    if meter in ("C", "C|"):
        return Fraction(1, 8)
    m = re.match(r"(\d+)\s*/\s*(\d+)", meter or "4/4")
    if m and Fraction(int(m.group(1)), int(m.group(2))) < Fraction(3, 4):
        return Fraction(1, 16)
    return Fraction(1, 8)


_NOTE_RE = re.compile(r"""
    (?P<acc>\^{1,2}|_{1,2}|=)?          # accidental
    (?P<step>[A-Ga-g])                  # pitch letter
    (?P<oct>[,']*)                      # octave marks
    (?P<len>\d+(?:/\d*)?|/+\d*)?        # length: 2, 3/2, /2, //, /
    (?P<tie>-?)                         # tie to next same pitch
""", re.X)
_REST_RE = re.compile(r"(?P<kind>[zxZ])(?P<len>\d+(?:/\d*)?|/+\d*)?")


def _parse_len(tok: Optional[str]) -> Fraction:
    if not tok:
        return Fraction(1)
    if tok.startswith("/"):
        slashes = len(tok) - len(tok.lstrip("/"))
        rest = tok[slashes:]
        den = int(rest) if rest else 2 ** slashes
        return Fraction(1, den)
    if "/" in tok:
        num, den = tok.split("/", 1)
        return Fraction(int(num), int(den) if den else 2)
    return Fraction(int(tok))


def _strip_inline(body: str) -> str:
    """Remove constructs we skip: strings, graces, decorations, comments."""
    body = re.sub(r'"[^"]*"', "", body)            # chord symbols / annotations
    body = re.sub(r"\{[^}]*\}", "", body)          # grace notes
    body = re.sub(r"![^!]*!", "", body)            # !decorations!
    body = re.sub(r"\+[a-zA-Z]+\+", "", body)      # +decorations+ (abc 2.0)
    body = re.sub(r"%.*", "", body)                # trailing comments
    body = re.sub(r"\(\d+", "", body)              # tuplet markers (see module doc)
    return body


class _Voice:
    def __init__(self):
        self.events: List[Tuple[int, Fraction, Fraction]] = []  # (midi, onset_ql, dur_ql)
        self.pos = Fraction(0)          # in quarter-lengths
        self.program: Optional[int] = None
        self.name = ""
        self.open_ties: Dict[int, int] = {}   # midi → event index


def _expand_repeats(line_toks: List[str]) -> List[str]:
    """One-level |: ... :| expansion with [1/[2 endings (music21 parity for
    the common session-tune forms; nested repeats play once)."""
    out: List[str] = []
    start = 0
    i = 0
    while i < len(line_toks):
        t = line_toks[i]
        if t == "|:":
            start = len(out)
            i += 1
            continue
        if t in (":|", ":||"):
            seg = out[start:]
            # locate a first-ending marker in the segment
            for j, s in enumerate(seg):
                if s == "[1":
                    out.extend(seg[:j])        # repeat up to the [1 ending
                    break
            else:
                out.extend(seg)
            start = len(out)
            i += 1
            # a following [2 ending just continues in the stream
            continue
        if t in ("[1", "[2", "|1", "|2"):
            out.append("[1" if t in ("[1", "|1") else "[2")
            i += 1
            continue
        out.append(t)
        i += 1
    return [t for t in out if t not in ("[1", "[2")]


def abc_to_score(data: bytes, quantize: bool = True) -> Score:
    """Parse the FIRST tune of an ABC file/tunebook into a Score."""
    text = data.decode("utf-8", "replace")
    lines = text.splitlines()

    meter = "4/4"
    unit: Optional[Fraction] = None
    bpm = 120.0
    key_sig: Dict[str, int] = {}
    voices: Dict[str, _Voice] = {}
    order: List[str] = []
    cur_id = "1"
    in_body = False
    pending_program: Optional[int] = None
    seen_x = False

    def voice(vid: str) -> _Voice:
        if vid not in voices:
            voices[vid] = _Voice()
            order.append(vid)
        return voices[vid]

    def parse_q(val: str) -> float:
        m = re.search(r"(\d+)\s*/\s*(\d+)\s*=\s*(\d+(?:\.\d+)?)", val)
        if m:  # beats of len num/den at the given rate → quarter bpm
            return float(m.group(3)) * float(Fraction(int(m.group(1)), int(m.group(2))) * 4)
        m = re.search(r"(\d+(?:\.\d+)?)", val)
        return float(m.group(1)) if m else 120.0

    body_lines: List[Tuple[str, str]] = []   # (voice_id, line)
    for raw in lines:
        line = raw.rstrip("\n")
        mp = re.match(r"^%%MIDI\s+program\s+(?:\d+\s+)?(\d+)", line)
        if mp:
            pending_program = int(mp.group(1))
            continue
        if line.startswith("%"):
            continue
        hm = re.match(r"^([A-Za-z])\s*:\s*(.*)$", line)
        if hm and (not in_body or hm.group(1) in "KVLMQ"):
            f, val = hm.group(1), hm.group(2).strip()
            if f == "X":
                if seen_x and in_body:
                    break               # next tune in a tunebook: stop
                seen_x = True
            elif f == "M":
                meter = val
            elif f == "L":
                m = re.match(r"(\d+)\s*/\s*(\d+)", val)
                if m:
                    unit = Fraction(int(m.group(1)), int(m.group(2)))
            elif f == "Q":
                bpm = parse_q(val)
            elif f == "V":
                cur_id = val.split()[0] if val else cur_id
                v = voice(cur_id)
                nm = re.search(r'(?:name|nm)\s*=\s*"([^"]+)"', val)
                if nm:
                    v.name = nm.group(1)
                if pending_program is not None:
                    v.program, pending_program = pending_program, None
            elif f == "K":
                key_sig = _key_accidentals(val)
                in_body = True
            continue
        if in_body and line.strip():
            body_lines.append((cur_id, line))

    if unit is None:
        unit = _default_unit(meter)
    unit_ql = unit * 4                  # quarter-lengths per unit note

    for vid, line in body_lines:
        v = voice(vid)
        if pending_program is not None and v.program is None:
            v.program, pending_program = pending_program, None
        line = _strip_inline(line)
        # tokenize: bars/repeats, chords, notes, rests, broken rhythm
        toks = re.findall(
            r"\|:|:\|\|?|\[[12]|\|[12]|\|\]?|::|"
            r"\[(?:[^\]\[]*)\](?:\d+(?:/\d*)?|/+\d*)?|"
            r"(?:\^{1,2}|_{1,2}|=)?[A-Ga-g][,']*(?:\d+(?:/\d*)?|/+\d*)?-?|"
            r"[zxZ](?:\d+(?:/\d*)?|/+\d*)?|[><]", line)
        toks = _expand_repeats(toks)
        measure_acc: Dict[str, int] = {}
        next_scale = Fraction(1)        # broken-rhythm scale for next note
        last_note_idx: List[int] = []   # event indices of last note/chord

        def emit_note(tok: str, advance: bool = True) -> Optional[int]:
            nonlocal next_scale
            m = _NOTE_RE.fullmatch(tok)
            if not m:
                return None
            step = m.group("step")
            upper = step.upper()
            octave = 5 if step.islower() else 4      # C = middle C (C4=60)
            for ch in m.group("oct"):
                octave += 1 if ch == "'" else -1
            acc = m.group("acc")
            if acc:
                alter = {"^": 1, "^^": 2, "_": -1, "__": -2, "=": 0}[acc]
                measure_acc[step + m.group("oct")] = alter
            else:
                alter = measure_acc.get(step + m.group("oct"),
                                        key_sig.get(upper, 0))
            midi = 12 * (octave + 1) + _STEP_SEMIS[upper] + alter
            dur = _parse_len(m.group("len")) * unit_ql * next_scale
            tie_in = v.open_ties.pop(midi, None)
            if tie_in is not None:
                p, on, d = v.events[tie_in]
                v.events[tie_in] = (p, on, d + dur)
                ei = tie_in
            else:
                v.events.append((midi, v.pos, dur))
                ei = len(v.events) - 1
            if m.group("tie") == "-":
                v.open_ties[midi] = ei
            if advance:
                v.pos += dur
            return ei

        i = 0
        while i < len(toks):
            t = toks[i]
            if t in (">", "<"):
                # A>B: A (already emitted) gets 3/2, B gets 1/2 (< mirrors);
                # stretch/shrink A in place and push the cursor to abut it
                f_prev = Fraction(3, 2) if t == ">" else Fraction(1, 2)
                if last_note_idx:
                    d0 = v.events[last_note_idx[0]][2]
                    for li in last_note_idx:
                        p, on, d = v.events[li]
                        v.events[li] = (p, on, d * f_prev)
                    v.pos += d0 * (f_prev - 1)
                next_scale = Fraction(2) - f_prev
                i += 1
                continue
            if t.startswith("|") or t.startswith(":") or t == "::":
                measure_acc.clear()
                i += 1
                continue
            if t.startswith("[") and len(t) > 1 and not t[1].isdigit():
                cm = re.match(r"\[([^\]]*)\](.*)", t)
                inner = cm.group(1) if cm else t[1:-1]
                suffix = cm.group(2) if cm else ""
                km = re.match(r"K\s*:\s*(.*)", inner)
                lm = re.match(r"L\s*:\s*(\d+)\s*/\s*(\d+)", inner)
                if km:
                    key_sig = _key_accidentals(km.group(1))
                elif lm:
                    unit_ql = Fraction(int(lm.group(1)), int(lm.group(2))) * 4
                else:
                    # chord: notes share the onset; a trailing length
                    # multiplies every member; advance by the longest
                    mult = _parse_len(suffix or None)
                    start = v.pos
                    idxs = []
                    longest = Fraction(0)
                    for nt in re.findall(
                            r"(?:\^{1,2}|_{1,2}|=)?[A-Ga-g][,']*(?:\d+(?:/\d*)?|/+\d*)?-?",
                            inner):
                        v.pos = start
                        ei = emit_note(nt, advance=False)
                        if ei is not None:
                            p, on, d = v.events[ei]
                            v.events[ei] = (p, on, d * mult)
                            idxs.append(ei)
                            longest = max(longest, d * mult)
                    v.pos = start + longest
                    if idxs:
                        last_note_idx = idxs
                        next_scale = Fraction(1)
                i += 1
                continue
            rm = _REST_RE.fullmatch(t)
            if rm:
                n = _parse_len(rm.group("len"))
                if rm.group("kind") == "Z":       # whole-measure rest(s)
                    mm = re.match(r"(\d+)\s*/\s*(\d+)", meter)
                    bar_ql = (Fraction(int(mm.group(1)), int(mm.group(2))) * 4
                              if mm else Fraction(4))
                    v.pos += bar_ql * n
                else:
                    v.pos += n * unit_ql
                next_scale = Fraction(1)
                i += 1
                continue
            ei = emit_note(t)
            if ei is not None:
                last_note_idx = [ei]
                next_scale = Fraction(1)
            i += 1

    score = Score(bpm=bpm)
    for vid in order or ["1"]:
        v = voices.get(vid)
        if v is None or not v.events:
            continue
        rows = []
        for midi, on, dur in v.events:
            onf, durf = float(on), float(dur)
            if quantize:
                onf, durf = quantize_ql(onf), quantize_ql(durf)
            step = int(round(onf * SAMPLE_FREQ))
            dstep = max(int(round(durf * SAMPLE_FREQ)), 1)
            if 0 <= midi < 128:
                rows.append((midi, step, dstep))
        if not rows:
            continue
        arr = np.array(sorted(rows, key=lambda r: (r[1], r[2])), dtype=np.int64)
        program = v.program if v.program is not None else 0   # music21: Piano
        score.parts.append(Part(notes=arr, ins_class=classify_program(program),
                                program=program, name=v.name or vid))
    return score
