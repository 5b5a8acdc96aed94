"""Wall-clock of the multimodal operator family: decode, resize, feature
extraction, perceptual image hashing, audio fingerprinting, and the
near-dup pair joins, over generated BMP/WAV media at a configurable item
count. Items/sec is the number that matters — these are the mapInPandas
(non-codegen) paths, and their throughput bounds what a 100 TB multimodal
ingest can push per core.

Usage: python scripts/perf_multimodal.py [out.json] [n_items] [n_reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from ecom_snowflake_duckdb_migration_spark import multimodal as mm
from ecom_snowflake_duckdb_migration_spark.session import get_spark


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PERF_MULTIMODAL.json"
    n_items = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark()
    par = spark.sparkContext.defaultParallelism
    imgs = mm.generate_media(
        spark, n_items, "image", partitions=par, media_format="bmp"
    ).localCheckpoint(eager=True)
    audio = mm.generate_media(
        spark, n_items, "audio", partitions=par, media_format="wav"
    ).localCheckpoint(eager=True)

    ops = {
        "decode_images": lambda: mm.decode_images(imgs),
        "resize_images": lambda: mm.resize_images(imgs, 8, 8),
        "byte_features": lambda: mm.extract_byte_features(imgs),
        "image_hashes": lambda: mm.image_hashes(imgs),
        "image_near_pairs": lambda: mm.image_near_pairs(imgs, max_hamming=3),
        "audio_hashes": lambda: mm.audio_hashes(audio),
        "audio_near_pairs": lambda: mm.audio_near_pairs(audio, max_hamming=3),
    }
    results = {}
    for name, fn in ops.items():
        fn().count()  # warm
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            n = fn().count()
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[name] = {
            "rows": n,
            "best_sec": round(best, 4),
            "items_per_sec": round(n_items / best),
        }
        print(f"{name}: {results[name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "n_items": n_items,
                "n_reps": n_reps,
                "parallelism": par,
                "note": "generated BMP (16-32px) / WAV (256-320 samples) media; "
                "items_per_sec = n_items / best_sec (pair ops: rows = pairs "
                "found among generated non-duplicate media, expected ~0)",
                "entries": results,
            },
            f,
            indent=2,
        )
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
