"""Streamlit UI (reference app.py work-alike).

Run: ``streamlit run deepmusicgeneration_tpu/app/app.py``

Three tasks, as in the reference sidebar (app.py:110-112): Music Generation,
Instrument Interconversion (s2s — implemented here, unlike the reference,
which declared it without a UI branch), and Music remixing.
Falls back to a clear error message when streamlit isn't installed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

GENRES = ["Auto", "Electronic", "Folk", "Funk", "Jazz", "Pop", "Rock"]
INSTRUMENTS = ["Piano", "Guitar", "Bass", "Flute", "Brass", "Violin"]


def main():
    try:
        import streamlit as st
    except ImportError:
        print("streamlit is not installed in this environment; "
              "use the CLI instead: python -m deepmusicgeneration_tpu.cli --help")
        raise SystemExit(1)

    from deepmusicgeneration_tpu.app.app_utils import (
        createGenreContinuationModel,
        createRemixModel,
        createS2SModel,
        predictMaskModel,
        predictNwGenreModel,
    )
    from deepmusicgeneration_tpu.app.audio import (
        item_to_wav_bytes,
        midi_to_wav_bytes,
    )
    from deepmusicgeneration_tpu.app.piano_roll import (
        item_to_piano_roll_png,
        midi_to_piano_roll_png,
    )
    from deepmusicgeneration_tpu.tasks.harmonize import s2s_predict_from_midi

    st.set_page_config(page_title="Deep Music Generation (TPU)", layout="wide")
    st.title("Deep Music Generation — TPU native")

    task = st.sidebar.selectbox(
        "Task", ["Music Generation", "Instrument Interconversion", "Music remixing"])

    uploaded = st.file_uploader("Upload a MIDI file", type=["mid", "midi"])
    os.makedirs("tempDir", exist_ok=True)
    os.makedirs("outputs", exist_ok=True)
    mid_path = None
    if uploaded is not None:
        mid_path = os.path.join("tempDir", uploaded.name)
        with open(mid_path, "wb") as f:
            f.write(uploaded.getbuffer())
        # upload preview — the reference plays the MIDI in the browser
        # (app.py:121-127); here a built-in synth (app/audio.py) renders a
        # WAV so it is audible without a browser MIDI plugin, plus the roll
        png = midi_to_piano_roll_png(mid_path)
        if png:
            st.image(png, caption="Uploaded MIDI (piano roll)")
        wav = midi_to_wav_bytes(mid_path)
        if wav:
            st.audio(wav, format="audio/wav")

    if task == "Music Generation":
        genre = st.selectbox("Genre", GENRES)
        t_notes = st.slider("Note temperature", 0.5, 3.0, 1.8)
        t_dur = st.slider("Duration temperature", 0.5, 3.0, 1.8)
        t_ins = st.slider("Instrument temperature", 0.5, 3.0, 1.0)
        top_p = st.slider("top_p", 0.1, 1.0, 0.3)
        bpm = st.slider("Output BPM", 40, 240, 120)
        max_len = st.slider("Max generated tokens", 64, 1024, 512)
        cutoff = st.slider("Seed cutoff beat", 4, 128, 32)
        # reference caps at 2048 (app.py:158); the TPU engine's KV ring and
        # row-blocked flash prefill extend the lookback to 8192 (docs/PERF.md)
        mem_len = st.select_slider("Attention lookback (mem_len)",
                                   [512, 1024, 2048, 4096, 8192], 512)
        allowed = st.multiselect("Allowed instruments", INSTRUMENTS, [])
        if st.button("Run Prediction") and mid_path:
            model = createGenreContinuationModel()
            full = predictNwGenreModel(
                model, mid_path, genre=genre, temperature_notes=t_notes,
                temperature_duration=t_dur, temperature_ins=t_ins, top_p=top_p,
                max_len=max_len, cutoff_beat=cutoff, mem_len=mem_len,
                allowed_ins=allowed or None, output_bpm=bpm)
            out = "./outputs/genre_output.mid"
            full.write_midi(out, bpm=bpm)
            st.success(f"Wrote {out}")
            st.image(item_to_piano_roll_png(full),
                     caption="Generated continuation (piano roll)")
            st.audio(item_to_wav_bytes(full, bpm=bpm), format="audio/wav")
            st.download_button("Download MIDI", open(out, "rb").read(),
                               "genre_output.mid")

    elif task == "Music remixing":
        genre = st.selectbox("Genre", GENRES)
        t_notes = st.slider("Note temperature", 0.5, 3.0, 1.0)
        t_dur = st.slider("Duration temperature", 0.5, 3.0, 1.0)
        top_p = st.slider("top_p", 0.1, 1.0, 0.3)
        mask_pct = st.slider("Mask proportion", 0.1, 1.0, 0.6)
        bpm = st.slider("Output BPM", 40, 240, 120)
        cutoff = st.slider("Seed cutoff beat", 4, 128, 32)
        pred_type = st.radio("Remix", ["Notes", "Duration"])
        if st.button("Run Prediction") and mid_path:
            model = createRemixModel()
            pred = predictMaskModel(
                model, mid_path, genre=genre, temperature_notes=t_notes,
                temperature_duration=t_dur, top_p=top_p, cutoff_beat=cutoff,
                output_bpm=bpm, pred_type=pred_type.lower(),
                mask_proportion=mask_pct)
            out = f"./outputs/remix_{pred_type}_output.mid"
            pred.write_midi(out, bpm=bpm)
            st.success(f"Wrote {out}")
            st.image(item_to_piano_roll_png(pred),
                     caption="Remixed result (piano roll)")
            st.audio(item_to_wav_bytes(pred, bpm=bpm), format="audio/wav")
            st.download_button("Download MIDI", open(out, "rb").read(),
                               os.path.basename(out))

    else:  # Instrument Interconversion (s2s)
        direction = st.radio("Direction", ["Piano → Bass", "Bass → Piano"])
        t0 = st.slider("Temperature (durations)", 0.5, 3.0, 1.0)
        t1 = st.slider("Temperature (notes)", 0.5, 3.0, 1.0)
        bpm = st.slider("Output BPM", 40, 240, 120)
        n_words = st.slider("Max generated tokens", 64, 512, 200)
        if st.button("Run Prediction") and mid_path:
            model = createS2SModel()
            multitrack = s2s_predict_from_midi(
                model, mid_path, n_words=n_words, temperatures=(t0, t1),
                pred_melody=(direction == "Bass → Piano"))
            out = "./outputs/s2s_output.mid"
            multitrack.write_midi(out, bpm=bpm)
            st.success(f"Wrote {out}")
            st.image(item_to_piano_roll_png(multitrack),
                     caption="Harmonized result (piano roll)")
            st.audio(item_to_wav_bytes(multitrack, bpm=bpm),
                     format="audio/wav")
            st.download_button("Download MIDI", open(out, "rb").read(),
                               "s2s_output.mid")


if __name__ == "__main__":
    main()
