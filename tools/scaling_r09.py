"""Round-9 scaling evidence: (a) the BUCKETED LSH-index probe and
(b) the multimodal probe-then-decode two-pass.

(a) SCALING.md's r08 analysis said "bucket the minhash index by its
bucket hash at write time and the probe join co-locates" — stated,
unmeasured.  The claim only matters in the regime where the index is
too big to broadcast (at 100 TB it always is), so both variants run
with the broadcast threshold disabled, a FIXED 5 000-doc ingest batch,
and a GROWING stored index: the plain-parquet index re-shuffles the
whole corpus index on every probe (corpus-proportional recurring
cost), the bucketed index moves nothing but the batch
(batch-proportional).  First-measurement findings folded back into
the design: (1) the v1 bucketed writer emits one file per
(task, bucket) — 32x32 = 1 024 small files gated the scan until
`write_minhash_index_bucketed` learned to repartition on the bucket
key first; (2) at toy scale with the default 64 MB threshold the
planner (correctly) broadcasts the index and bucketing is pure
overhead — the default-conf path needs no bucketing and is NOT the
regime this sweep measures.

(b) The multimodal path's claimed posture is probe-then-decode: a
header-only manifest pass over every blob, then payload decode ONLY
for the probe-selected subset.  The bulk format must have REAL decode
cost for the comparison to mean anything (the first draft used 64x64
BMPs whose numpy-vectorized decode is as cheap as probing — two-pass
showed no win); this sweep plants 90% 128x128 RLE PCX images, whose
decode is the pure-python byte-at-a-time RLE loop, and 10% 1x1 PPM
targets.  decode-ALL pays the python loop on every blob;
probe-then-decode pays header parses plus the 10% decode.

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
LSH_SIZES = [40_000, 160_000, 640_000]  # corpus docs; batch fixed at 5k
LSH_BATCH = 5_000
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


def _pcx_blob(v: int, w: int = 512, h: int = 512) -> bytes:
    """512x512 3-plane RLE PCX of the uniform gray v — decode cost is
    multimodal._parse_pcx's pure-python RLE loop (~14k iterations per
    blob, ms-scale CPU), the 'real codec work' stand-in (a 128x128
    first draft decoded in ~0.5 ms — cheaper than the Arrow blob-ship
    both passes pay, so decode-all vs two-pass measured nothing).
    Row of 512 identical bytes packs as runs 63x8 + 8."""
    hdr = bytearray(128)
    hdr[0] = 0x0A  # manufacturer
    hdr[1] = 5     # version
    hdr[2] = 1     # RLE
    hdr[3] = 8     # bits per pixel per plane
    hdr[8:10] = (w - 1).to_bytes(2, "little")   # xmax
    hdr[10:12] = (h - 1).to_bytes(2, "little")  # ymax
    hdr[65] = 3    # planes
    hdr[66:68] = w.to_bytes(2, "little")        # bytes per line
    full, rem = divmod(w, 63)
    run = bytes([0xC0 | 63, v]) * full + (
        bytes([0xC0 | rem, v]) if rem else b""
    )
    return bytes(hdr) + run * (h * 3)


def _media_corpus(spark, n: int):
    """Mixed-format blob corpus: every 10th row a 1x1 PPM (the decode
    TARGET), the rest RLE PCX images (python-loop decode cost); eight
    gray variants so the parquet files are not one dictionary entry."""
    from pyspark.sql import functions as F

    v = (32 + F.col("id") % 64).cast("int")  # printable -> 1-byte UTF-8
    ppm = F.encode(
        F.concat(F.lit("P6\n1 1\n255\n"), F.repeat(F.char(v), 3)), "UTF-8"
    )
    pcx_variants = F.array(*[F.lit(_pcx_blob(40 + 8 * k)) for k in range(8)])
    pcx = F.element_at(pcx_variants, (F.col("id") % 8 + 1).cast("int"))
    is_ppm = F.col("id") % 10 == 0
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(is_ppm, ppm).otherwise(pcx).alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.when(is_ppm, F.lit("ppm")).otherwise(F.lit("pcx")).alias(
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

        # batch = LSH_BATCH docs spread evenly through the id range
        # (a contiguous id block would contain its own planted dup
        # neighbors and produce zero new x old pairs — measured)
        step = max(n // LSH_BATCH, 1)
        docs = _corpus(spark, n)
        old = docs.filter(F.col("doc_id") % step != 0)
        new = docs.filter(F.col("doc_id") % step == 0).persist()
        new.count()
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
        # the 100 TB regime: the corpus index CANNOT broadcast — what
        # separates the variants is whether the probe join must
        # re-shuffle the stored index (plain) or only the batch
        # (bucketed).  At toy scale the default threshold would
        # broadcast the index in both variants and measure nothing.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
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
