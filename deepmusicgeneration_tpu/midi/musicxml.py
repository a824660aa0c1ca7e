"""MusicXML → Score: widens input breadth beyond SMF.

The reference accepts anything music21 parses (`file2stream`,
core/encodings.py:170-177) — in practice MIDI plus MusicXML (.musicxml /
.xml / compressed .mxl). This is a dependency-free reader for the MusicXML
constructs the tokenizer needs, emitting the same :class:`~..midi.score.Score`
/ :class:`~..midi.score.Part` intermediate as the SMF path so everything
downstream (chordarr, npenc, vocab) is shared:

* score-partwise documents (the form every notation editor exports),
* per-part ``midi-instrument`` program/channel (1-based in MusicXML) with a
  part-name heuristic fallback mirroring music21's instrument inference
  (core/encodings.py:202-235 classes),
* notes, rests, chords (``<chord/>`` shares the previous note's onset),
  ties (start/stop merge durations), grace notes (skipped — no duration),
* multi-voice time tracking via ``backup``/``forward``,
* tempo from the first ``<sound tempo=...>``,
* compressed ``.mxl`` containers (zip + META-INF/container.xml rootfile).

Quantisation matches the SMF path exactly: quarter-lengths through
``quantize_ql`` onto the ``SAMPLE_FREQ`` grid.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from .score import Part, Score, classify_program, quantize_ql
from ..vocab import SAMPLE_FREQ

_STEP_SEMIS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}

# part-name → ACCEP_INS class fallback, music21-heuristic order: used only
# when the part has no midi-program
_NAME_CLASSES = [  # values MUST be ACCEP_INS keys (vocab.py:64-72)
    ("Piano", ("piano", "keyboard", "klavier", "celesta", "organ", "harpsichord")),
    ("Bass", ("bass",)),
    ("Guitar", ("guitar", "gitarre", "banjo", "ukulele", "lute")),
    ("WoodwindInstrument", ("flute", "clarinet", "oboe", "bassoon", "sax",
                            "recorder", "piccolo", "wind")),
    ("BrassInstrument", ("trumpet", "trombone", "horn", "tuba", "brass")),
    ("StringInstrument", ("violin", "viola", "cello", "string", "fiddle",
                          "harp")),
]


def _class_from_name(name: str) -> Optional[str]:
    low = name.lower()
    for cls, keys in _NAME_CLASSES:
        if any(k in low for k in keys):
            return cls
    return None


def _midi_pitch(note: ET.Element) -> Optional[int]:
    p = note.find("pitch")
    if p is None:
        return None
    step = p.findtext("step", "C").strip()
    alter = float(p.findtext("alter", "0") or 0)
    octave = int(p.findtext("octave", "4") or 4)
    return int((octave + 1) * 12 + _STEP_SEMIS.get(step, 0) + round(alter))


def _extract_rootfile(data: bytes) -> bytes:
    """Pull the score XML out of a compressed .mxl container."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = None
        try:
            container = ET.fromstring(z.read("META-INF/container.xml"))
            rf = container.find(".//rootfile")
            if rf is not None:
                root = rf.get("full-path")
            if root is not None and root not in z.namelist():
                root = None
        except (KeyError, ET.ParseError):
            pass
        if root is None:
            cands = [n for n in z.namelist()
                     if n.lower().endswith((".xml", ".musicxml"))
                     and not n.startswith("META-INF")]
            if not cands:
                raise ValueError("no score XML inside .mxl container")
            root = cands[0]
        return z.read(root)


def _strip_ns(root: ET.Element) -> None:
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]


def musicxml_to_score(path_or_bytes, quantize: bool = True) -> Score:
    """Parse MusicXML (.musicxml/.xml/.mxl path, or raw bytes) into a Score."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:2] == b"PK":
        data = _extract_rootfile(data)
    root = ET.fromstring(data)
    _strip_ns(root)
    if root.tag == "score-timewise":
        raise ValueError("score-timewise MusicXML is not supported "
                         "(every mainstream exporter writes score-partwise)")
    if root.tag != "score-partwise":
        raise ValueError(f"not a MusicXML score document: <{root.tag}>")

    # part-list: id → (program (0-based) | None, channel, name)
    meta: Dict[str, Tuple[Optional[int], int, str]] = {}
    for sp in root.iter("score-part"):
        pid = sp.get("id", "")
        name = (sp.findtext("part-name") or "").strip()
        program, channel = None, 0
        mi = sp.find("midi-instrument")
        if mi is not None:
            prog_txt = mi.findtext("midi-program")
            if prog_txt:
                program = max(int(prog_txt) - 1, 0)        # MusicXML is 1-based
            ch_txt = mi.findtext("midi-channel")
            if ch_txt:
                channel = max(int(ch_txt) - 1, 0)
        meta[pid] = (program, channel, name)

    bpm = 120.0
    bpm_found = False
    parts: List[Part] = []
    for part_el in root.iter("part"):
        pid = part_el.get("id", "")
        program, channel, name = meta.get(pid, (None, 0, pid))
        divisions = 1                                      # per quarter note
        cursor = 0.0                                       # in QUARTER LENGTHS
        # (ql, not divisions: a mid-part <divisions> change must not rescale
        # already-accumulated time — each duration converts at its own scale)
        rows: List[Tuple[int, float, float]] = []          # pitch, start_ql, dur_ql
        open_ties: Dict[Tuple[str, int], int] = {}         # (voice, pitch) → row
        last_onset = 0.0                                   # last sounded onset
        for measure in part_el.iter("measure"):
            measure_max = cursor
            for el in measure:
                if el.tag == "attributes":
                    d = el.findtext("divisions")
                    if d:
                        divisions = max(int(d), 1)
                elif el.tag in ("backup", "forward"):
                    dur_ql = int(el.findtext("duration", "0") or 0) / divisions
                    cursor += dur_ql if el.tag == "forward" else -dur_ql
                    measure_max = max(measure_max, cursor)
                elif el.tag == "sound" or el.tag == "direction":
                    snd = el if el.tag == "sound" else el.find(".//sound")
                    if snd is not None and snd.get("tempo") and not bpm_found:
                        bpm = float(snd.get("tempo"))
                        bpm_found = True
                elif el.tag == "note":
                    if el.find("grace") is not None:
                        continue                           # no duration
                    dur_ql = int(el.findtext("duration", "0") or 0) / divisions
                    is_chord = el.find("chord") is not None
                    pitch = _midi_pitch(el)
                    if is_chord:
                        # <chord/> shares its leading note's onset (tracked
                        # explicitly: rows[-1] is stale after a tie merge)
                        start_ql = last_onset
                    else:
                        start_ql = cursor
                        cursor += dur_ql                   # rests advance too
                        measure_max = max(measure_max, cursor)
                    if pitch is None or dur_ql <= 0:       # rest / unpitched
                        continue
                    if not is_chord:
                        last_onset = start_ql
                    voice = el.findtext("voice", "1")
                    ties = {t.get("type") for t in el.findall("tie")}
                    if "stop" in ties and (voice, pitch) in open_ties:
                        i = open_ties[(voice, pitch)]
                        rows[i] = (rows[i][0], rows[i][1], rows[i][2] + dur_ql)
                        if "start" not in ties:
                            del open_ties[(voice, pitch)]
                        continue
                    rows.append((pitch, start_ql, dur_ql))
                    if "start" in ties:
                        open_ties[(voice, pitch)] = len(rows) - 1
            # measure resync: a trailing shorter voice (backup with no
            # forward) must not shift every later measure — resume from the
            # furthest point any voice reached
            cursor = max(cursor, measure_max)

        if rows:
            arr = np.array(
                [(p,
                  int(round((quantize_ql(s) if quantize else s) * SAMPLE_FREQ)),
                  int(round((quantize_ql(d) if quantize else d) * SAMPLE_FREQ)))
                 for p, s, d in rows], dtype=np.int64)
            arr = arr[np.lexsort((arr[:, 2], arr[:, 1]))]
        else:
            arr = np.empty((0, 3), dtype=np.int64)

        if program is not None or channel == 9:
            ins_class = classify_program(program if program is not None else 0,
                                         channel)
        else:
            # music21 defaults unknown parts to Piano after name inference
            ins_class = _class_from_name(name) or "Piano"
        parts.append(Part(notes=arr, ins_class=ins_class,
                          program=program, channel=channel, name=name))
    return Score(parts=parts, bpm=bpm)


def is_musicxml(data: bytes) -> bool:
    """Sniff: zip container or an XML document with a MusicXML root."""
    if data[:2] == b"PK":
        return True
    head = data[:512]
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
    head = head.lstrip()
    return head.startswith(b"<?xml") or head.startswith(b"<score-partwise") \
        or head.startswith(b"<!DOCTYPE score-partwise")
