from .smf import MidiFile, MidiTrack, MidiEvent, parse_midi_file, parse_midi_bytes, render_midi_bytes, write_midi_file  # noqa: F401
from .score import Score, Part, load_score, midifile_to_score, is_empty_midi, compress_score  # noqa: F401
