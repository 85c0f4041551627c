"""Quantify the native-codec delta behind the mm8 decode seam
(VERDICT r6 #7): how much faster does the same mapInPandas body get
when the pure-Python baseline-JPEG decoder (operators/jpeg.py) is
swapped for a native codec?

Measures, on the SAME 500-image corpus the driver grades
(mm8_jpeg_roundtrip's synthesis formula: 16px wide, height
8*(1 + n % 8), block-constant content):

  1. pure-Python decode  — operators/jpeg.py jpeg_decode (canonical
     Huffman entropy decode + dequantize + numpy 2D IDCT)
  2. Pillow/libjpeg      — if importable (NOT shipped in this
     container; the row exists so a provisioned environment produces
     the real number with zero edits)
  3. native-DEFLATE proxy — the same 500 images' raw pixels inflated
     by stdlib zlib (C) + numpy sum: the "body is a C codec" shape
     measured with the one native compressed-image codec this
     container does ship. Labeled a PROXY: DEFLATE != JPEG work, but
     it bounds what "swap the body behind the seam" buys when the
     per-image Python overhead (bytes handling, batch loop) stays.

Driver-side timing on purpose: the seam under measurement is the
per-image decode body that runs inside each Arrow batch; Spark task
scheduling around it is identical for either body and would only add
noise. Prints one JSON line for SCALE.md §4.

Usage: python tools/codec_bench.py [n_images]
"""

from __future__ import annotations

import json
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

from migrator_spark.operators.jpeg import jpeg_decode, jpeg_encode_gray  # noqa: E402

WIDTH = 16


def build_corpus(n_images: int) -> tuple[list[bytes], list[bytes], int]:
    """(jpeg payloads, zlib-compressed raw pixels, total pixel count)
    with the mm8 graded-corpus content formula."""
    jpegs: list[bytes] = []
    raws: list[bytes] = []
    px = 0
    for n in range(n_images):
        nby = 1 + (n % 8)
        h = 8 * nby
        img = np.empty((h, WIDTH), dtype=np.uint8)
        for by in range(nby):
            for bx in range(WIDTH // 8):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    23 * bx + 41 * by
                ) % 256
        raw = img.tobytes()
        jpegs.append(jpeg_encode_gray(raw, WIDTH, h))
        raws.append(zlib.compress(raw, 6))
        px += WIDTH * h
    return jpegs, raws, px


def timed(fn, payloads: list[bytes], reps: int = 3) -> tuple[float, list[int]]:
    """Median-of-reps wall time to decode+sum every payload."""
    best = []
    sums: list[int] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sums = [fn(p) for p in payloads]
        best.append(time.perf_counter() - t0)
    best.sort()
    return best[len(best) // 2], sums


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    jpegs, raws, px = build_corpus(n_images)

    t_py, sums_py = timed(lambda p: jpeg_decode(p)[3], jpegs)
    t_zlib, sums_zlib = timed(
        lambda p: int(np.frombuffer(zlib.decompress(p), np.uint8).sum()), raws
    )
    assert sums_py == sums_zlib, "decode bodies disagree on pixel sums"

    out = {
        "n_images": n_images,
        "total_pixels": px,
        "pure_python_jpeg_s": round(t_py, 4),
        "pure_python_jpeg_img_per_s": round(n_images / t_py, 1),
        "native_deflate_proxy_s": round(t_zlib, 4),
        "native_deflate_proxy_img_per_s": round(n_images / t_zlib, 1),
        "proxy_speedup_x": round(t_py / t_zlib, 1),
    }
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        t_pil, sums_pil = timed(
            lambda p: int(np.asarray(Image.open(io.BytesIO(p))).sum()), jpegs
        )
        assert sums_pil == sums_py, "Pillow disagrees on pixel sums"
        out["pillow_s"] = round(t_pil, 4)
        out["pillow_speedup_x"] = round(t_py / t_pil, 1)
    except ImportError:
        out["pillow"] = "unavailable in this container (proxy row stands in)"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
