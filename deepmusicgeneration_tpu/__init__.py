"""deepmusicgeneration_tpu — TPU-native symbolic music generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
AniketRajpoot/DeepMusicGeneration: multi-track MIDI tokenization into a
note/duration/instrument vocabulary, a Transformer-XL genre-conditioned
language model, a BERT-style mask-infill remixer, and seq2seq
melody↔accompaniment harmonization — with a single-compiled-decode-loop
sampling engine and mesh-sharded training.
"""

__version__ = "0.1.0"

from .vocab import MusicVocab, ACCEP_INS, SAMPLE_FREQ  # noqa: F401
from .codec.item import MusicItem, MultitrackItem      # noqa: F401
