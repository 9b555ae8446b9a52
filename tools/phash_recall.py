"""Measured pHash image-dedup recall (the operating-point curve),
mirroring the r3 minhash/embedding recall protocol (BASELINE.md).

The `image_dedup` oracle pins planted byte-level invariants; this tool
measures what the 64-bit pHash + pigeonhole chunk join actually
delivers on the perturbations a real image-dedup pass must absorb:
JPEG recompression (quality 95 / 85, baseline AND progressive — the
progressive decode is real as of r4), and global brightness shifts
(±10). Protocol:

1. 80 deterministic structured base images (seeded low-frequency
   cosine mixtures + a seeded rectangle — smooth "natural-ish" energy
   spectra, the regime pHash is designed for; pure noise would flatter
   it);
2. each base ships as a quality-95 baseline JPEG; variants re-encode
   the DECODED base at quality 95 / 85, at quality 85 progressive, and
   re-encode brightness ±10 versions at quality 92;
3. hashes via phash_bytes (real decoders), pairs via
   phash_near_dups at max_hamming ∈ {4, 6, 8, 10};
4. recall = planted (base, variant) pairs recovered / planted;
   false-positive rate = cross-base pairs reported / cross-base pairs
   possible. Both recorded per threshold; a floor is pinned in
   tests/test_ops.py::test_phash_recall_floor.

Usage: python tools/phash_recall.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

N_BASES = 80
SIZE = 64


def base_image(i: int) -> np.ndarray:
    """Deterministic structured image i: 3-term 2-D cosine mixture
    plus one solid rectangle, per-channel phase offsets."""
    rng = np.random.RandomState(1000 + i)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float64)
    img = np.zeros((SIZE, SIZE, 3))
    for c in range(3):
        acc = np.zeros((SIZE, SIZE))
        for _ in range(3):
            fy, fx = rng.uniform(0.3, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi)
            acc += np.cos(
                2 * np.pi * (fy * yy + fx * xx) / SIZE + ph
            )
        img[:, :, c] = acc
    img = (img - img.min()) / (img.max() - img.min() + 1e-9) * 255
    y0, x0 = rng.randint(4, SIZE - 20, 2)
    hh, ww = rng.randint(8, 16, 2)
    img[y0:y0 + hh, x0:x0 + ww] = rng.randint(0, 256, 3)
    return img.astype(np.uint8)


def variants(img: np.ndarray):
    from fuzi_spark.ops.jpeg import (
        decode_baseline,
        encode_baseline,
        encode_progressive,
    )

    ship = encode_baseline(img, quality=95)
    dec = decode_baseline(ship)
    bright = np.clip(dec.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    dark = np.clip(dec.astype(np.int32) - 10, 0, 255).astype(np.uint8)
    rng = np.random.RandomState(int(dec[::16, ::16].sum()) % 100000)
    noisy = np.clip(
        dec.astype(np.float64) + rng.normal(0, 8, dec.shape), 0, 255
    ).astype(np.uint8)
    gamma = np.clip(
        255.0 * (dec.astype(np.float64) / 255.0) ** 0.8, 0, 255
    ).astype(np.uint8)
    crop = dec[2:-2, 2:-2]
    return ship, {
        "recompress_q95": encode_baseline(dec, quality=95),
        "recompress_q85": encode_baseline(dec, quality=85),
        "progressive_q85": encode_progressive(dec, quality=85, al=1),
        "brightness_plus10": encode_baseline(bright, quality=92),
        "brightness_minus10": encode_baseline(dark, quality=92),
        "noise_sigma8": encode_baseline(noisy, quality=92),
        "gamma_0.8": encode_baseline(gamma, quality=92),
        "crop_2px": encode_baseline(crop, quality=92),
    }


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "RECALL_phash_r4.json"
    )
    from pyspark.sql import SparkSession

    from fuzi_spark.ops.cache import cache_scope
    from fuzi_spark.ops.phash import phash_bytes, phash_near_dups

    rows = []
    kinds = None
    for i in range(N_BASES):
        ship, var = variants(base_image(i))
        kinds = sorted(var)
        rows.append((f"base/{i}", phash_bytes(ship)))
        for kind, enc in var.items():
            rows.append((f"{kind}/{i}", phash_bytes(enc)))
    assert all(h is not None for _, h in rows), "decode failure"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(rows, "media_ref string, phash long")

    result = {
        "protocol": (
            f"{N_BASES} structured bases; planted variants = JPEG "
            f"recompress q95/q85 (baseline + progressive) and "
            f"brightness ±10; pigeonhole phash_near_dups sweep"
        ),
        "grid": [],
    }
    planted_total = N_BASES * len(kinds)
    cross_possible = (
        len(rows) * (len(rows) - 1) // 2 - planted_total
        - N_BASES * len(kinds) * (len(kinds) - 1) // 2
    )
    for max_h in (4, 6, 8, 10):
        with cache_scope():
            pairs = {
                (r.ref_a, r.ref_b)
                for r in phash_near_dups(df, max_hamming=max_h).collect()
            }
        per_kind = {}
        fp = 0
        for a, b in pairs:
            ka, ia = a.split("/")
            kb, ib = b.split("/")
            if ia == ib:
                if "base" in (ka, kb):
                    kind = ka if kb == "base" else kb
                    per_kind[kind] = per_kind.get(kind, 0) + 1
            else:
                fp += 1
        recall = {
            k: round(per_kind.get(k, 0) / N_BASES, 4) for k in kinds
        }
        overall = round(
            sum(per_kind.get(k, 0) for k in kinds) / planted_total, 4
        )
        entry = {
            "max_hamming": max_h,
            "recall_overall": overall,
            "recall_per_kind": recall,
            "false_positive_pairs": fp,
            "fp_rate": round(fp / max(cross_possible, 1), 8),
        }
        result["grid"].append(entry)
        print(
            f"max_hamming={max_h} recall={overall} per_kind={recall} "
            f"fp={fp}"
        )
    # ---- multi-trim index (phash_near_dups_trimmed): the crop fix.
    # Index every image under symmetric border trims (0, 2, 4 px);
    # a symmetric crop variant aligns exactly with the original's
    # same-trim anchor, so the pair lands at near-exact distance.
    from fuzi_spark.ops.phash import (
        phash_from_pixels,
        phash_near_dups_trimmed,
    )
    from fuzi_spark.ops.multimodal import decode_image_pixels

    def trim_hashes(enc, trims=(0, 2, 4)):
        arr = decode_image_pixels(enc)
        out = []
        h, w = arr.shape[:2]
        for t in trims:
            if h - 2 * t < 1 or w - 2 * t < 1:
                continue
            sub = arr[t:h - t, t:w - t] if t else arr
            out.append(int(np.int64(np.uint64(phash_from_pixels(sub)))))
        return out

    mrows = []
    for i in range(N_BASES):
        ship, var = variants(base_image(i))
        for hsh in trim_hashes(ship):
            mrows.append((f"base/{i}", hsh))
        for kind, enc in var.items():
            for hsh in trim_hashes(enc):
                mrows.append((f"{kind}/{i}", hsh))
    mdf = spark.createDataFrame(mrows, "media_ref string, phash long")
    result["trimmed_grid"] = []
    for max_h in (4, 6, 8, 10):
        with cache_scope():
            pairs = {
                (r.ref_a, r.ref_b)
                for r in phash_near_dups_trimmed(
                    mdf, max_hamming=max_h
                ).collect()
            }
        per_kind = {}
        fp = 0
        for a, b in pairs:
            ka, ia = a.split("/")
            kb, ib = b.split("/")
            if ia == ib:
                if "base" in (ka, kb):
                    kind = ka if kb == "base" else kb
                    per_kind[kind] = per_kind.get(kind, 0) + 1
            else:
                fp += 1
        recall = {
            k: round(per_kind.get(k, 0) / N_BASES, 4) for k in kinds
        }
        entry = {
            "max_hamming": max_h,
            "recall_per_kind": recall,
            "false_positive_pairs": fp,
        }
        result["trimmed_grid"].append(entry)
        print(f"trimmed max_hamming={max_h} per_kind={recall} fp={fp}")

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
