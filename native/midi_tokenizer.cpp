// Fast MIDI → npenc tokenizer (native path).
//
// C++ implementation of the host-side tokenization pipeline
// (deepmusicgeneration_tpu/midi/{smf,score}.py + codec/encode.py): SMF parse,
// note pairing, music21-style quantization (divisors 4,3), GM instrument
// classification, piano-roll semantics with overwrite ordering, and
// run-length npenc emission. Bit-identical to the Python path (tested), at
// native-code throughput for corpus preprocessing and the batched serving
// pipeline.
//
// C ABI (ctypes):
//   dmg_tokenize_midi(bytes, len, out_rows, max_rows, out_ins, max_parts,
//                     n_parts_out, quantize) -> n_rows (<0 = error)
//   out_rows: int32 [max_rows*3] rows of [pitch|-1, dur|wait, part|-291]
//   out_ins:  int32 [max_parts] instrument class id per part (0..6)
//
// Build: make -C native   (produces libdmg_midi.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kSampleFreq = 4;
constexpr int kMaxNoteDur = 128;   // 8 bars
constexpr int kValtSep = -1;
constexpr int kSepInsVal = -291;   // -2 - 128 - 161
constexpr int kNoteLo = 1, kNoteHi = 127;  // NOTE_RANGE

// GM program → instrument class (mirror of midi/score.py::_GM_CLASS)
// -1 = rejected part, 0..6 = ACCEP_INS class ids, 6 = Misc.
const int8_t kGmClass[128] = {
    /*0-8 keyboards*/ 0,0,0,0,0,0,0,0,0,
    /*9*/ -1, /*10 music box*/ 6, /*11-14 pitched perc*/ -1,-1,-1,-1,
    /*15 dulcimer*/ 5,
    /*16-21 organs/accordion*/ 0,0,0,0,0,0, /*22 harmonica*/ 3, /*23*/ 0,
    /*24-31 guitars*/ 1,1,1,1,1,1,1,1,
    /*32-39 basses*/ 2,2,2,2,2,2,2,2,
    /*40-46 strings*/ 5,5,5,5,5,5,5, /*47 timpani*/ -1,
    /*48-51 ensembles*/ 5,5,5,5, /*52-54 voices*/ -1,-1,-1, /*55 orch hit*/ 6,
    /*56-63 brass*/ 4,4,4,4,4,4,4,4,
    /*64-79 reeds+pipes*/ 3,3,3,3,3,3,3,3,3,3,3,3,3,3,3,3,
    /*80-103 synths*/ 6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,6,
    /*104-107 ethnic strings*/ 5,5,5,5, /*108 kalimba*/ 6,
    /*109 bagpipe*/ 3, /*110 fiddle*/ 5, /*111 shanai*/ 3,
    /*112-119 percussive*/ -1,-1,-1,-1,-1,-1,-1,-1,
    /*120-127 sfx*/ 6,6,6,6,6,6,6,6,
};

struct NoteEv {
  int pitch;
  long on_tick;
  long off_tick;
};

struct RawPart {
  int channel = 0;
  int program = -1;  // -1 = none seen
  std::vector<NoteEv> notes;
};

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t i = 0;
  bool ok = true;

  uint8_t u8() {
    if (i >= n) { ok = false; return 0; }
    return p[i++];
  }
  uint32_t u32() {
    uint32_t v = 0;
    for (int k = 0; k < 4; k++) v = (v << 8) | u8();
    return v;
  }
  uint16_t u16() {
    uint16_t v = 0;
    for (int k = 0; k < 2; k++) v = (uint16_t)((v << 8) | u8());
    return v;
  }
  uint32_t vlq() {
    uint32_t v = 0;
    for (int k = 0; k < 5; k++) {
      uint8_t b = u8();
      v = (v << 7) | (b & 0x7F);
      if (!(b & 0x80)) break;
    }
    return v;
  }
  void skip(size_t k) { i = (i + k <= n) ? i + k : n; }
};

double quantize_ql(double x) {
  // snap to the closest of the 1/4 and 1/3 grids (music21 divisors (4, 3))
  double best = x, best_err = -1;
  const int divisors[2] = {4, 3};
  for (int d : divisors) {
    double cand = (long long)std::nearbyint(x * d) / (double)d;
    double err = std::abs(cand - x);
    if (best_err < 0 || err < best_err) { best = cand; best_err = err; }
  }
  return best;
}

int tick_to_step(long tick, int tpq, bool quantize) {
  double ql = (double)tick / tpq;
  if (quantize) ql = quantize_ql(ql);
  return (int)std::nearbyint(ql * kSampleFreq);
}

int dur_to_step(long on, long off, int tpq, bool quantize) {
  double ql = (double)(off - on) / tpq;
  if (quantize) ql = quantize_ql(ql);
  return (int)std::nearbyint(ql * kSampleFreq);
}

}  // namespace

extern "C" int dmg_tokenize_midi(
    const uint8_t* bytes, int len,
    int32_t* out_rows, int max_rows,
    int32_t* out_ins, int max_parts, int32_t* n_parts_out,
    int quantize) {
  if (len < 14 || memcmp(bytes, "MThd", 4) != 0) return -1;
  Reader r{bytes, (size_t)len};
  r.skip(4);
  uint32_t hdr_len = r.u32();
  uint16_t fmt = r.u16();
  (void)fmt;
  uint16_t ntrks = r.u16();
  uint16_t division = r.u16();
  int tpq;
  if (division & 0x8000) {
    int fps = 256 - (division >> 8);
    int tpf = division & 0xFF;
    tpq = fps * tpf / 2;
  } else {
    tpq = division;
  }
  if (tpq <= 0) tpq = 1;
  r.i = 8 + hdr_len;

  std::vector<RawPart> parts;

  for (int t = 0; t < ntrks && r.ok && r.i + 8 <= r.n; t++) {
    if (memcmp(bytes + r.i, "MTrk", 4) != 0) {
      r.skip(4);
      uint32_t clen = r.u32();
      r.skip(clen);
      t--;  // not a real track
      continue;
    }
    r.skip(4);
    uint32_t trk_len = r.u32();
    size_t trk_end = std::min(r.i + trk_len, r.n);

    long tick = 0;
    uint8_t running = 0;
    // per-channel state within this track
    std::map<int, RawPart> chans;
    // open notes: (channel<<8 | pitch) → FIFO of on-ticks
    std::unordered_map<int, std::vector<long>> open;

    while (r.i < trk_end && r.ok) {
      tick += r.vlq();
      uint8_t status = bytes[r.i];
      if (status & 0x80) {
        r.i++;
        if (status < 0xF0) running = status;
      } else {
        status = running;
      }
      uint8_t kind = status & 0xF0;
      int ch = status & 0x0F;
      if (kind == 0x90 || kind == 0x80) {
        uint8_t note = r.u8(), vel = r.u8();
        bool is_on = (kind == 0x90 && vel > 0);
        int key = (ch << 8) | note;
        if (is_on) {
          open[key].push_back(tick);
        } else {
          auto it = open.find(key);
          if (it != open.end() && !it->second.empty()) {
            long on_tick = it->second.front();
            it->second.erase(it->second.begin());
            chans[ch].notes.push_back({note, on_tick, tick});
            chans[ch].channel = ch;
          }
        }
      } else if (kind == 0xC0) {
        uint8_t prog = r.u8();
        auto& part = chans[ch];
        part.channel = ch;
        if (part.program < 0) part.program = prog;
      } else if (kind == 0xD0) {
        r.skip(1);
      } else if (kind == 0xA0 || kind == 0xB0 || kind == 0xE0) {
        r.skip(2);
      } else if (status == 0xFF) {
        uint8_t meta = r.u8();
        uint32_t mlen = r.vlq();
        if (meta == 0x2F) { r.i = trk_end; break; }
        r.skip(mlen);
      } else if (status == 0xF0 || status == 0xF7) {
        uint32_t slen = r.vlq();
        r.skip(slen);
      } else {
        break;  // corrupt track; keep what we parsed
      }
    }
    r.i = trk_end;
    for (auto& kv : chans) {
      if (!kv.second.notes.empty()) parts.push_back(std::move(kv.second));
    }
  }

  // classify + quantize accepted parts
  struct QNote { int pitch, on, dur; };
  std::vector<std::vector<QNote>> accepted;
  std::vector<int> classes;
  for (auto& part : parts) {
    int cls;
    if (part.channel == 9) cls = -1;
    else if (part.program < 0) cls = 6;  // no program → Misc
    else cls = kGmClass[part.program & 127];
    if (cls < 0) continue;
    std::vector<QNote> qnotes;
    qnotes.reserve(part.notes.size());
    for (auto& nv : part.notes) {
      int on = tick_to_step(nv.on_tick, tpq, quantize != 0);
      int dur = dur_to_step(nv.on_tick, nv.off_tick, tpq, quantize != 0);
      qnotes.push_back({nv.pitch, on, dur});
    }
    // sort by (offset, dur): later/longer notes overwrite (encode.py order)
    std::stable_sort(qnotes.begin(), qnotes.end(),
                     [](const QNote& a, const QNote& b) {
                       return a.on != b.on ? a.on < b.on : a.dur < b.dur;
                     });
    accepted.push_back(std::move(qnotes));
    classes.push_back(cls);
  }
  int n_parts = (int)accepted.size();
  if (n_parts_out) *n_parts_out = n_parts;
  if (n_parts == 0) return 0;
  if (out_ins) {
    for (int pi = 0; pi < n_parts && pi < max_parts; pi++) out_ins[pi] = classes[pi];
  }

  // piano-roll semantics with exact overwrite order, sparse:
  // cell key = (step * n_parts + part) * 128 + pitch → value (dur or -2 hold)
  std::unordered_map<int64_t, int> cells;
  cells.reserve(1024);
  int max_step_seen = 0;
  for (int pi = 0; pi < n_parts; pi++) {
    for (auto& q : accepted[pi]) {
      if (q.pitch < 0 || q.pitch > 127 || q.on < 0) continue;
      int dur = std::min(q.dur, kMaxNoteDur);
      auto key = [&](int step) {
        return ((int64_t)step * n_parts + pi) * 128 + q.pitch;
      };
      cells[key(q.on)] = dur;
      for (int s = q.on + 1; s < q.on + dur; s++) cells[key(s)] = -2;
      max_step_seen = std::max(max_step_seen, q.on);
    }
  }

  // collect onset cells (value > 0, pitch in range), grouped by step
  struct Cell { int step, part, pitch, dur; };
  std::vector<Cell> onsets;
  onsets.reserve(cells.size());
  for (auto& kv : cells) {
    if (kv.second <= 0) continue;
    int64_t k = kv.first;
    int pitch = (int)(k % 128);
    int64_t sp = k / 128;
    int part = (int)(sp % n_parts);
    int step = (int)(sp / n_parts);
    if (pitch < kNoteLo || pitch >= kNoteHi) continue;
    onsets.push_back({step, part, pitch, kv.second});
  }
  // order: step asc, pitch desc, part asc (chordarr2npenc ordering)
  std::sort(onsets.begin(), onsets.end(), [](const Cell& a, const Cell& b) {
    if (a.step != b.step) return a.step < b.step;
    if (a.pitch != b.pitch) return a.pitch > b.pitch;
    return a.part < b.part;
  });

  // run-length emit with separator rows
  int n_rows = 0;
  auto emit = [&](int a, int b, int c) {
    if (n_rows >= max_rows) return false;
    out_rows[n_rows * 3 + 0] = a;
    out_rows[n_rows * 3 + 1] = b;
    out_rows[n_rows * 3 + 2] = c;
    n_rows++;
    return true;
  };
  long prev_step = -1;
  for (size_t idx = 0; idx < onsets.size();) {
    int step = onsets[idx].step;
    long wait = (prev_step < 0) ? step : step - prev_step;
    if (wait > 0) {
      if (!emit(kValtSep, (int)wait, kSepInsVal)) return n_rows;
    }
    while (idx < onsets.size() && onsets[idx].step == step) {
      if (!emit(onsets[idx].pitch, onsets[idx].dur, onsets[idx].part))
        return n_rows;
      idx++;
    }
    prev_step = step;
  }
  return n_rows;
}

extern "C" int dmg_version() { return 1; }
