"""Media-decode scale smoke: real PNG pixel + WAV PCM + baseline-JPEG
+ GIF decode as distributed Arrow-batched scans.

Payloads are synthesized deterministically per id (ops.media_decode
fixtures — real pixels, real samples, filter types cycled per row so
every unfilter path is hot), then decoded by decode_image_pixels /
decode_audio_pcm. Verification is analytic and total where the truth
is closed-form — (height, width, channels) and (rate, channels,
n_samples) are formulas of the id, compared distributed on EVERY row —
plus exact pixel/sample-stat checks on a 200-row driver-side sample.

The plan under test is the 100-TB shape: one scan → mapInPandas →
aggregate, no shuffle, per-task memory bounded by the Arrow batch.
Decode is per-blob Python/numpy (the honest cost of a format zlib
can't hand to the JVM); throughput scales with cores × batch flow,
which is exactly what the two-level run in BASELINE §9 evidences for
the rest of the engine.

Usage: python tools/media_smoke.py [n_images] [n_wavs] [n_jpegs]
[n_videos] [n_gifs] (defaults 300_000 / 300_000 / n_images//3 /
n_jpegs//4 / n_images//3 — JPEG decode does real per-coefficient
Huffman work and GIF LZW is a per-code dictionary loop, so their
per-blob cost is higher by nature; each MJPEG video carries 2-6 JPEG
frames). Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from lucene_spark.ops.media_decode import (  # noqa: E402
    decode_audio_pcm,
    decode_image_pixels,
    fixture_pixels,
    fixture_samples,
    synth_jpeg_pixels,
    synth_png_pixels,
    synth_wav_pcm,
)
from lucene_spark.session import get_spark  # noqa: E402

_PAYLOAD_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("payload", BinaryType())]
)


def _attach(df, synth):
    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {"id": ids.to_numpy(), "payload": [synth(int(i)) for i in ids]}
            )

    return df.mapInPandas(kernel, _PAYLOAD_SCHEMA)


def main():
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_wav = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="media_smoke", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    report = {"n_images": n_img, "n_wavs": n_wav, "cpus": cpus}

    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="media_smoke_")

    # --- images: decode + closed-form dims check on every row ----------
    # payloads are materialized to parquet BEFORE the clock so the
    # decode number isn't polluted by fixture PNG *encoding*
    _attach(spark.range(n_img).repartition(4 * cpus), synth_png_pixels) \
        .write.parquet(d + "/img", mode="overwrite")
    imgs = spark.read.parquet(d + "/img")
    t0 = time.time()
    out = decode_image_pixels(imgs)
    # fixture_pixels: h = 2 + i%24, w = 2 + (i*5)%24, c = (1,2,3,4)[i%4]
    bad = out.where(
        (F.col("height") != 2 + F.col("id") % 24)
        | (F.col("width") != 2 + (F.col("id") * 5) % 24)
        | (
            F.col("channels")
            != F.element_at(
                F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
                (F.col("id") % 4 + 1).cast("int"),
            )
        )
        | F.col("px_mean").isNull()
        | (F.col("px_min") < 0)
        | (F.col("px_max") > 250)  # fixture pixels are mod 251
    ).count()
    t_img = time.time() - t0
    assert bad == 0, f"{bad} image rows disagree with the closed form"
    report["images"] = {
        "sec": round(t_img, 1),
        "images_per_sec": round(n_img / t_img),
        "mismatches": bad,
    }
    print("images:", report["images"], flush=True)

    # exact stats on a driver-verifiable sample
    sample = out.where(F.col("id") < 200).collect()
    assert len(sample) == min(200, n_img)
    for r in sample:
        px = fixture_pixels(int(r["id"])).astype(np.float64)
        assert abs(r["px_mean"] - px.mean()) < 1e-9, r
        assert abs(r["px_std"] - px.std()) < 1e-9, r

    # --- audio ----------------------------------------------------------
    _attach(spark.range(n_wav).repartition(4 * cpus), synth_wav_pcm) \
        .write.parquet(d + "/wav", mode="overwrite")
    wavs = spark.read.parquet(d + "/wav")
    t0 = time.time()
    aout = decode_audio_pcm(wavs)
    # fixture_audio: rate = [8000,16000,22050,44100][i%4],
    # channels = 1 + i%2, n_samples = 256 + (i*13)%1024
    abad = aout.where(
        (
            F.col("sample_rate")
            != F.element_at(
                F.array(*[F.lit(v) for v in (8000, 16000, 22050, 44100)]),
                (F.col("id") % 4 + 1).cast("int"),
            )
        )
        | (F.col("channels") != 1 + F.col("id") % 2)
        | (F.col("n_samples") != 256 + (F.col("id") * 13) % 1024)
        | F.col("rms").isNull()
    ).count()
    t_wav = time.time() - t0
    assert abad == 0, f"{abad} audio rows disagree with the closed form"
    report["audio"] = {
        "sec": round(t_wav, 1),
        "wavs_per_sec": round(n_wav / t_wav),
        "mismatches": abad,
    }
    print("audio:", report["audio"], flush=True)

    asample = aout.where(F.col("id") < 200).collect()
    for r in asample:
        samples, _ = fixture_samples(int(r["id"]))
        f = samples.astype(np.float64)
        assert abs(r["rms"] - float(np.sqrt((f * f).mean()))) < 1e-9, r
        assert r["peak"] == int(np.abs(samples).max()), r

    # --- JPEG: full baseline decode (Huffman + IDCT in numpy) -----------
    # fixtures cycle grayscale / RGB 4:4:4 / RGB 4:2:0, quality 70..100,
    # restart markers on odd ids — every decoder MCU shape is hot.
    # Dims are closed-form-checked on EVERY row; a 200-row driver sample
    # must match a driver-side decode of the same bytes exactly (the
    # codec's pixel accuracy itself is pinned by tests/test_jpeg.py's
    # hand-crafted spec streams).
    n_jpg = int(sys.argv[3]) if len(sys.argv) > 3 else max(n_img // 3, 1)
    _attach(spark.range(n_jpg).repartition(4 * cpus), synth_jpeg_pixels) \
        .write.parquet(d + "/jpg", mode="overwrite")
    jpgs = spark.read.parquet(d + "/jpg")
    t0 = time.time()
    jout = decode_image_pixels(jpgs)
    jbad = jout.where(
        (F.col("height") != 2 + F.col("id") % 24)
        | (F.col("width") != 2 + (F.col("id") * 5) % 24)
        | (
            F.col("channels")  # fixture c 1/2 -> gray, 3/4 -> RGB
            != F.element_at(
                F.array(F.lit(1), F.lit(1), F.lit(3), F.lit(3)),
                (F.col("id") % 4 + 1).cast("int"),
            )
        )
        | F.col("px_mean").isNull()
    ).count()
    t_jpg = time.time() - t0
    assert jbad == 0, f"{jbad} JPEG rows disagree with the closed form"
    report["jpeg"] = {
        "sec": round(t_jpg, 1),
        "jpegs_per_sec": round(n_jpg / t_jpg),
        "mismatches": jbad,
    }
    print("jpeg:", report["jpeg"], flush=True)

    from lucene_spark.ops.jpeg import decode_baseline_jpeg

    jsample = jout.where(F.col("id") < 200).collect()
    assert len(jsample) == min(200, n_jpg)
    for r in jsample:
        px = decode_baseline_jpeg(synth_jpeg_pixels(int(r["id"])))
        f = px.astype(np.float64)
        assert (r["height"], r["width"], r["channels"]) == px.shape, r
        assert abs(r["px_mean"] - f.mean()) < 1e-9, r
        assert abs(r["px_std"] - f.std()) < 1e-9, r

    # --- GIF: LZW + palette + compositing --------------------------------
    # fixtures cycle interlacing and add a transparent second frame on
    # every third id; decode_image_pixels reports frame 0's composite,
    # which is a full-canvas opaque plane -> dims/channels are pure
    # formulas of the id, checked on EVERY row.
    from lucene_spark.ops.gif import (
        decode_gif,
        fixture_gif_indices,
        fixture_gif_palette,
        synth_gif_pixels,
    )

    n_gif = int(sys.argv[5]) if len(sys.argv) > 5 else max(n_img // 3, 1)
    _attach(spark.range(n_gif).repartition(4 * cpus), synth_gif_pixels) \
        .write.parquet(d + "/gif", mode="overwrite")
    gifs = spark.read.parquet(d + "/gif")
    t0 = time.time()
    gout = decode_image_pixels(gifs)
    gbad = gout.where(
        (F.col("height") != 2 + F.col("id") % 24)
        | (F.col("width") != 2 + (F.col("id") * 5) % 24)
        | (F.col("channels") != 3)  # frame 0 covers the canvas opaquely
        | F.col("px_mean").isNull()
        | (F.col("px_min") < 0)
        | (F.col("px_max") > 250)  # palette entries are mod 251
    ).count()
    t_gif = time.time() - t0
    assert gbad == 0, f"{gbad} GIF rows disagree with the closed form"
    report["gif"] = {
        "sec": round(t_gif, 1),
        "gifs_per_sec": round(n_gif / t_gif),
        "mismatches": gbad,
    }
    print("gif:", report["gif"], flush=True)

    gsample = gout.where(F.col("id") < 200).collect()
    assert len(gsample) == min(200, n_gif)
    for r in gsample:
        i = int(r["id"])
        want = fixture_gif_palette(i)[fixture_gif_indices(i)]
        assert np.array_equal(decode_gif(synth_gif_pixels(i)), want), i
        f = want.astype(np.float64)
        assert abs(r["px_mean"] - f.mean()) < 1e-9, r
        assert abs(r["px_std"] - f.std()) < 1e-9, r

    # --- MJPEG video: MP4 demux + per-frame JPEG decode -----------------
    # fixture videos carry 2-6 real JPEG frames each; every frame of
    # every video is decoded; frame COUNT is closed-form-checked per id
    # and a 100-video driver sample is matched frame-exactly.
    from lucene_spark.ops.mjpeg import (
        decode_mjpeg_mp4,
        decode_video_frames,
        fixture_n_frames,
        synth_mjpeg_mp4,
    )

    n_vid = int(sys.argv[4]) if len(sys.argv) > 4 else max(n_jpg // 4, 1)
    _attach(spark.range(n_vid).repartition(4 * cpus), synth_mjpeg_mp4) \
        .write.parquet(d + "/vid", mode="overwrite")
    vids = spark.read.parquet(d + "/vid")
    t0 = time.time()
    vout = decode_video_frames(vids)
    vrow = (  # one decode pass: per-id frame counts -> total + mismatches
        vout.groupBy("id")
        .count()
        .agg(
            F.sum("count").alias("frames"),
            F.sum(
                F.when(F.col("count") != 2 + F.col("id") % 5, 1).otherwise(0)
            ).alias("bad"),  # fixture_n_frames closed form
        )
        .collect()[0]
    )
    vbad, n_frames_total = int(vrow["bad"]), int(vrow["frames"])
    t_vid = time.time() - t0
    assert vbad == 0, f"{vbad} videos decoded the wrong frame count"
    report["mjpeg_video"] = {
        "sec": round(t_vid, 1),
        "videos": n_vid,
        "frames": n_frames_total,
        "frames_per_sec": round(n_frames_total / t_vid),
        "mismatches": vbad,
    }
    print("mjpeg_video:", report["mjpeg_video"], flush=True)

    vsample = {}
    for r in vout.where(F.col("id") < 100).collect():
        vsample.setdefault(int(r["id"]), []).append(r)
    for i, rows in vsample.items():
        truth = dict(decode_mjpeg_mp4(synth_mjpeg_mp4(i)))
        assert len(rows) == fixture_n_frames(i)
        for r in rows:
            px = truth[int(r["frame_idx"])]
            f = px.astype(np.float64)
            assert (r["height"], r["width"], r["channels"]) == px.shape, r
            assert abs(r["px_mean"] - f.mean()) < 1e-9, r

    shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
