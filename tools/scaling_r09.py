"""Round-9 scaling evidence: (a) the BUCKETED LSH-index probe and
(b) the multimodal probe-then-decode two-pass.

(a) SCALING.md's r08 analysis said "bucket the minhash index by its
bucket hash at write time and the probe join co-locates" — stated,
unmeasured.  This sweep writes the same index PLAIN vs BUCKETED
(``dedup.write_minhash_index_bucketed``: bucketBy(band, bhash), the
probe join's full key set) and times the recurring per-batch probe
against both at growing corpus sizes.  The bucketed plan carries ZERO
Exchange on the index side (pinned in test_bucketing); here the
wall-clock difference becomes a recorded number.

(b) The multimodal path's claimed posture is probe-then-decode: a
header-only manifest pass over every blob, then payload decode ONLY
for the probe-selected subset.  This sweep builds a mixed-format blob
corpus (90% 64x64 BMP images, 10% 1x1 PPM targets), writes it to
parquet once, and times decode-ALL vs probe-only vs
probe-then-decode(select the 10%) at growing corpus sizes.

Methodology matches tools/scaling_r08.py: each (size, op) point runs
in a FRESH subprocess (no JVM-state bleed) with one untimed warmup.

Usage: python tools/scaling_r09.py                 # both sweeps
       python tools/scaling_r09.py --point <n> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

LSH_OPS = ["probe_plain_parquet", "probe_bucketed"]
LSH_SIZES = [20_000, 80_000, 320_000]
MEDIA_OPS = ["media_decode_all", "media_probe_only", "media_probe_then_decode"]
MEDIA_SIZES = [4_000, 16_000, 64_000]


def timed(name: str, n: int, thunk, spark):
    thunk()  # warmup (steady-state, not cold-start)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"op": name, "n": n, "sec": dt, "rows": rows}),
          flush=True)


def _bmp_header(w: int, h: int) -> bytes:
    payload = w * h * 3  # stride w*3 must be 4-aligned (w % 4 == 0 here)
    return (
        b"BM" + (54 + payload).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\x00" * 20
    )


def _media_corpus(spark, n: int):
    """Mixed-format blob corpus: every 10th row a 1x1 PPM (the decode
    TARGET), the rest 64x64 gray 24bpp BMPs (12 KB payloads the
    decode-all pass must chew through).  Constructed column-side, gray
    value varies per row so blobs are not all identical."""
    from pyspark.sql import functions as F

    v = (32 + F.col("id") % 64).cast("int")  # printable -> 1-byte UTF-8
    ppm = F.encode(
        F.concat(F.lit("P6\n1 1\n255\n"), F.repeat(F.char(v), 3)), "UTF-8"
    )
    bmp = F.concat(
        F.lit(_bmp_header(64, 64)),
        F.encode(F.repeat(F.char(v), 64 * 64 * 3), "UTF-8"),
    )
    is_ppm = F.col("id") % 10 == 0
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(is_ppm, ppm).otherwise(bmp).alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.when(is_ppm, F.lit("ppm")).otherwise(F.lit("bmp")).alias(
                "format"
            ),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("uri"),
        ).alias("meta"),
    )


def run_point(n: int, op: str) -> None:
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark

    spark = get_spark("scaling-r09")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="scaling_r09_")

    if op in LSH_OPS:
        from scaling_r08 import _corpus

        from square_etl_spark.operators.dedup import (
            minhash_index,
            minhash_probe,
            write_minhash_index_bucketed,
        )

        docs = _corpus(spark, n).persist()
        docs.count()
        old = docs.filter(F.col("doc_id") % 10 != 0)
        new = docs.filter(F.col("doc_id") % 10 == 0)
        sh, idx = minhash_index(old)
        # index WRITE is the one-off ingest cost either way — both
        # variants pay it outside the timer; the timed op is the
        # recurring per-batch probe READING the stored index.
        if op == "probe_plain_parquet":
            sh.write.mode("overwrite").parquet(f"{base}/sh")
            idx.write.mode("overwrite").parquet(f"{base}/idx")
            sh_r = spark.read.parquet(f"{base}/sh")
            idx_r = spark.read.parquet(f"{base}/idx")
        else:
            sh_r, idx_r = write_minhash_index_bucketed(
                sh, idx, base, "mh_r09", num_buckets=32
            )
        timed(op, n,
              lambda: minhash_probe(sh_r, idx_r, new, threshold=0.5).count(),
              spark)
        return

    if op in MEDIA_OPS:
        from square_etl_spark.operators.multimodal import (
            decode_media,
            probe_media,
        )

        _media_corpus(spark, n).write.mode("overwrite").parquet(
            f"{base}/media"
        )
        media = spark.read.parquet(f"{base}/media")
        if op == "media_decode_all":
            timed(op, n, lambda: decode_media(media).count(), spark)
        elif op == "media_probe_only":
            timed(op, n, lambda: probe_media(media).count(), spark)
        else:

            def two_pass() -> int:
                sel = (
                    probe_media(media)
                    .filter(F.col("ok") & (F.col("detected_format") == "ppm"))
                    .select("media_id")
                )
                return decode_media(
                    media.join(sel, on="media_id", how="left_semi")
                ).count()

            timed(op, n, two_pass, spark)
        return

    raise SystemExit(f"unknown op: {op}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    me = str(Path(__file__).resolve())
    points = [(n, op) for n in LSH_SIZES for op in LSH_OPS] + [
        (n, op) for n in MEDIA_SIZES for op in MEDIA_OPS
    ]
    for n, op in points:
        r = subprocess.run(
            [sys.executable, me, "--point", str(n), op],
            capture_output=True, text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps(
                {"op": op, "n": n, "error": (r.stderr or "")[-400:]}),
                flush=True)


if __name__ == "__main__":
    main()
