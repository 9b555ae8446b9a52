"""Measured MP3 operating points (round 5): landmark-fingerprint
containment and decode SNR across re-encode bitrates, on a structured
synthetic corpus — the same artifact pattern as RECALL_minhash_r3 /
RECALL_phash_r4 (measure, don't guess; the floor is pinned in tests).

For each of 40 multi-tone bases:
- the WAV original's landmark set (ops/audiofp.audio_landmarks) must
  be CONTAINED in every MP3 re-encode's landmark set (containment is
  the dedup-relevant direction: the re-encode adds onset/tail
  transient windows of its own, so plain Jaccard under-reads), and
- decode SNR vs the original signal is recorded per bitrate.

Writes RECALL_mp3_r5.json.
Run: python tools/mp3_recall.py
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from fuzi_spark.ops.audiofp import audio_landmarks       # noqa: E402
from fuzi_spark.ops.mp3 import encode_mp3                # noqa: E402
from fuzi_spark.ops.multimodal import parse_audio        # noqa: E402

RATE = 44100
BITRATES = [96, 128, 192, 320]
N_BASES = 40


def base_signal(i: int) -> np.ndarray:
    """Deterministic multi-tone base: 3 tones at base-specific
    frequencies (spread over 300..5000 Hz), distinct per base."""
    t = np.arange(RATE // 2)
    f1 = 300 + (i * 97) % 1200
    f2 = 1500 + (i * 211) % 2000
    f3 = 3600 + (i * 139) % 1400
    sig = (0.35 * np.sin(2 * np.pi * f1 * t / RATE)
           + 0.25 * np.sin(2 * np.pi * f2 * t / RATE)
           + 0.15 * np.sin(2 * np.pi * f3 * t / RATE))
    return sig


def wav_bytes(pcm: np.ndarray) -> bytes:
    data = pcm.astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, RATE,
                                    RATE * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def snr(ref: np.ndarray, got: np.ndarray) -> float:
    e = ref - got
    den = float(np.dot(e, e))
    return 999.0 if den == 0 else 10 * np.log10(
        float(np.dot(ref, ref)) / den)


def main():
    delay = 1087
    per_br = {br: {"containment": [], "snr": []} for br in BITRATES}
    cross = []  # mp3@min-bitrate vs mp3@max-bitrate shared core
    for i in range(N_BASES):
        sig = base_signal(i)
        pcm = (sig * 32767).astype(np.int16)
        ref = set(audio_landmarks(wav_bytes(pcm))[2])
        assert ref, i
        encs = {}
        for br in BITRATES:
            enc = encode_mp3(pcm, rate=RATE, bitrate=br)
            encs[br] = enc
            got = set(audio_landmarks(enc)[2])
            per_br[br]["containment"].append(
                len(ref & got) / len(ref))
            r, ch, _b, n, p = parse_audio(enc)
            out = np.frombuffer(p, "<i2").astype(np.float64) / 32768.0
            m = min(len(sig), len(out) - delay) - 500
            per_br[br]["snr"].append(
                round(snr(sig[500:m], out[500 + delay:m + delay]), 2))
        lo = set(audio_landmarks(encs[BITRATES[0]])[2])
        hi = set(audio_landmarks(encs[BITRATES[-1]])[2])
        cross.append(len(ref & lo & hi) / len(ref))
    out = {
        "n_bases": N_BASES, "rate": RATE,
        "per_bitrate": {
            str(br): {
                "containment_mean": round(
                    float(np.mean(d["containment"])), 4),
                "containment_min": round(
                    float(np.min(d["containment"])), 4),
                "snr_mean_db": round(float(np.mean(d["snr"])), 1),
                "snr_min_db": round(float(np.min(d["snr"])), 1),
            }
            for br, d in per_br.items()
        },
        "cross_bitrate_core_containment_min": round(
            float(np.min(cross)), 4),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RECALL_mp3_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
