#!/usr/bin/env python
"""Decode-stage vs join-stage cost split for the audio-fingerprint
near-dup entry (VERDICT r10 item 5 — observability, not a rewrite).

The extended-bench floor for ``multimodal_audio_fingerprint_neardup``
is decode-dominated; this probe records the split so a future JOIN
regression is not masked by decode noise. Methodology: min-of-N

- end-to-end: the registry entry exactly as benched (decode + bands +
  capped pigeonhole pair join);
- decode stage: materialize the frame-energy frame (cache + count);
- join stage: the band/pair join alone, re-run over the CACHED
  energies (decode paid once, outside the timed region).

Run on a quiet host:  python scripts/probe_audiofp_split.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("PASSES", "5"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .appName("audiofp-split-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tfx_addons_feast_examplegen_spark.operators.multimodal import (
        attach_wav_neardup_payloads,
        audio_fingerprint_neardups,
        extract_audio_frame_energies,
    )
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"]

    def floor(fn):
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # end-to-end, exactly the registry entry's plan
    e2e = floor(
        lambda: audio_fingerprint_neardups(
            extract_audio_frame_energies(attach_wav_neardup_payloads(docs)),
            max_hamming=3,
            on_over_cap="error",
        ).count()
    )

    # decode stage alone (fresh frame each pass: unpersist first)
    def decode_only():
        e = extract_audio_frame_energies(attach_wav_neardup_payloads(docs))
        e.count()

    decode = floor(decode_only)

    # join stage alone over cached energies
    cached = extract_audio_frame_energies(
        attach_wav_neardup_payloads(docs)
    ).cache()
    cached.count()  # pay decode + cache fill outside the timed region
    join = floor(
        lambda: audio_fingerprint_neardups(
            cached, max_hamming=3, on_over_cap="error"
        ).count()
    )
    cached.unpersist()

    print(
        {
            "sf_dir": sf_dir,
            "passes": passes,
            "end_to_end_sec": e2e,
            "decode_stage_sec": decode,
            "join_stage_over_cached_sec": join,
            "load_1min": round(os.getloadavg()[0], 1),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
