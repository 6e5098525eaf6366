"""The real stdlib media codecs (functions/media_codecs.py) and the
Spark stages built on them (operators/multimodal.py): PNG encode/decode
round-trips including all five scanline filters, JPEG/GIF/WAV/MP4
parses on hand-crafted genuine files, and the distributed
decode / image-stats / resize stages over real payloads."""

import struct
import zlib

import numpy as np
import pytest

from onto_text_tag_spark.functions import media_codecs as mc

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _gradient(h, w, c=3, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    if c == 1:
        return ((xx * 3 + yy * 5 + seed) % 256).astype(np.uint8)
    return np.stack(
        [(xx * 3 + yy * 5 + seed + k * 7) % 256 for k in range(c)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4)])
def test_png_roundtrip(shape):
    px = _gradient(shape[0], shape[1],
                   1 if len(shape) == 2 else shape[2])
    payload = mc.encode_png(px)
    info = mc.png_info(payload)
    assert (info["width"], info["height"]) == (7, 5)
    assert info["bit_depth"] == 8
    got = mc.decode_png(payload)
    assert got.shape == px.shape
    assert np.array_equal(got, px)


def test_png_unfilters_all_filter_types():
    """Hand-build a PNG whose five scanlines use filter types 0-4
    (forward-filtered here per the spec); decode must invert each."""
    px = _gradient(5, 6, 3, seed=11).astype(np.int16)
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, dtype=np.int16),
                               cur[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int16),
                                 prev[:-c]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = (cur - left) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            filt = (cur - ((left + prev) // 2)) % 256
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where(
                (pa <= pb) & (pa <= pc), left,
                np.where(pb <= pc, prev, upleft))
            filt = (cur - pred) % 256
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (mc.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    got = mc.decode_png(payload)
    assert np.array_equal(got, px.astype(np.uint8))


def test_png_crc_mismatch_raises():
    payload = bytearray(mc.encode_png(_gradient(3, 3)))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_png(bytes(payload))


def test_png_info_palette_type():
    # IHDR-only palette PNG: info parse works even without pixel decode
    ihdr = struct.pack(">IIBBBBB", 10, 4, 8, 3, 0, 0, 0)
    body = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    info = mc.png_info(mc.PNG_SIGNATURE + body)
    assert info == {"width": 10, "height": 4, "bit_depth": 8,
                    "color_type": 3, "channels": 1, "interlace": 0}
    with pytest.raises(NotImplementedError, match="color type"):
        mc.decode_png(mc.PNG_SIGNATURE + body)


def test_resize_nearest():
    px = _gradient(8, 8, 3)
    small = mc.resize_nearest(px, 4, 2)
    assert small.shape == (2, 4, 3)
    assert np.array_equal(small, px[::4][:, ::2])


# ---------------------------------------------------------------------------
# JPEG / GIF
# ---------------------------------------------------------------------------


def _minimal_jpeg(w, h, ncomp=3, sof=0xC0):
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + bytes(
        b for i in range(ncomp) for b in (i + 1, 0x11, 0))
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sof_body))
        + sof_body
        + b"\xff\xd9"
    )


def test_jpeg_info_baseline_and_progressive():
    assert mc.jpeg_info(_minimal_jpeg(640, 480)) == {
        "width": 640, "height": 480, "channels": 3}
    assert mc.jpeg_info(_minimal_jpeg(31, 17, ncomp=1, sof=0xC2)) == {
        "width": 31, "height": 17, "channels": 1}
    with pytest.raises(ValueError, match="SOI"):
        mc.jpeg_info(b"nope")


def test_gif_info():
    payload = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert mc.gif_info(payload) == {
        "width": 320, "height": 200, "version": "89a"}
    with pytest.raises(ValueError):
        mc.gif_info(b"GIF00a" + b"\x00" * 10)


# ---------------------------------------------------------------------------
# WAV / MP4
# ---------------------------------------------------------------------------


def test_wav_roundtrip():
    samples = ((np.arange(1234) * 7) % 2003 - 1001).astype(np.int16)
    payload = mc.encode_wav(samples, 8000)
    info = mc.wav_info(payload)
    assert info["channels"] == 1
    assert info["sample_rate"] == 8000
    assert info["bit_depth"] == 16
    assert info["n_frames"] == 1234
    assert info["duration_ms"] == 1234 * 1000 // 8000
    with pytest.raises(ValueError, match="RIFF"):
        mc.wav_info(b"RIFX" + payload[4:])


def test_mp4_roundtrip_and_v1():
    payload = mc.encode_mp4_stub(12_500, timescale=1000)
    assert mc.mp4_info(payload) == {"timescale": 1000,
                                    "duration_ms": 12_500}

    # hand-build a version-1 mvhd (64-bit times) inside moov
    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    mvhd_v1 = box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)              # creation/modification
        + struct.pack(">IQ", 90_000, 90_000 * 7)  # timescale, duration
        + b"\x00" * 80,
    )
    v1 = mc.encode_mp4_stub(1)[:24] + box(b"moov", mvhd_v1)  # reuse ftyp
    assert mc.mp4_info(v1)["duration_ms"] == 7000
    with pytest.raises(ValueError, match="ftyp"):
        mc.mp4_info(box(b"moov", mvhd_v1))


# ---------------------------------------------------------------------------
# Spark stages over real payloads
# ---------------------------------------------------------------------------


def test_real_media_features_match_formulas(spark):
    from onto_text_tag_spark.operators.multimodal import (
        extract_media_features,
        synthesize_real_media,
    )

    docs = spark.range(0, 30).toDF("doc_id")
    feats = {
        int(r["media_id"]): r
        for r in extract_media_features(
            synthesize_real_media(docs)).collect()
    }
    assert len(feats) == 30
    for i, r in feats.items():
        if i % 3 == 0:
            assert (r["kind"], r["format"]) == ("image", "png")
            assert r["width"] == 16 + i % 16
            assert r["height"] == 8 + i % 8
            assert r["channels"] == 3
        elif i % 3 == 1:
            assert (r["kind"], r["format"]) == ("audio", "wav")
            assert r["sample_rate"] == 8000
            assert r["duration_ms"] == 10 * (1 + i % 30)
        else:
            assert (r["kind"], r["format"]) == ("video", "mp4")
            assert r["duration_ms"] == (1 + i % 30) * 1000


def test_image_stats_and_resize_over_real_pngs(spark):
    from onto_text_tag_spark.operators.multimodal import (
        image_stats,
        resize_images,
        synthesize_real_media,
    )

    docs = spark.range(0, 9).toDF("doc_id")
    media = synthesize_real_media(docs)
    stats = {int(r["media_id"]): r for r in image_stats(media).collect()}
    assert set(stats) == {0, 3, 6}  # the image rows
    for i, r in stats.items():
        w, h = 16 + i % 16, 8 + i % 8
        px = np.stack(
            [(np.add.outer(np.arange(h) * 5, np.arange(w) * 3) + i + c * 7)
             % 256 for c in range(3)], axis=2)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        flat = px.reshape(-1)
        assert r["mean_luma"] == int(flat.sum() * 1000 // flat.size)
        assert r["min_px"] == int(flat.min())
        assert r["max_px"] == int(flat.max())

    resized = resize_images(media, 8, 4)
    out = {int(r["media_id"]): r for r in image_stats(resized).collect()}
    assert all((out[i]["width"], out[i]["height"]) == (8, 4)
               for i in (0, 3, 6))
    # non-image payloads pass through byte-identical
    orig_audio = {r["media_id"]: bytes(r["payload"])
                  for r in media.where("kind = 'audio'").collect()}
    new_audio = {r["media_id"]: bytes(r["payload"])
                 for r in resized.where("kind = 'audio'").collect()}
    assert orig_audio == new_audio


def test_wav_corrupt_fmt_chunk_raises_valueerror():
    """A zeroed fmt chunk (channels=0 / bit_depth<8) must reject as
    ValueError per the decode contract, never ZeroDivisionError."""
    import struct

    import pytest

    from onto_text_tag_spark.functions import media_codecs as mc

    import numpy as np

    good = mc.encode_wav(
        np.zeros(80, dtype=np.int16), sample_rate=8000
    )
    assert mc.wav_info(good)["channels"] >= 1

    # fmt chunk fields start at byte 20; channels is the H at offset 22
    zero_channels = bytearray(good)
    zero_channels[22:24] = struct.pack("<H", 0)
    with pytest.raises(ValueError, match="bad WAV fmt chunk"):
        mc.wav_info(bytes(zero_channels))

    zero_bits = bytearray(good)
    zero_bits[34:36] = struct.pack("<H", 0)
    with pytest.raises(ValueError, match="bad WAV fmt chunk"):
        mc.wav_info(bytes(zero_bits))


# ---------------------------------------------------------------------------
# Baseline JPEG codec
# ---------------------------------------------------------------------------


def test_jpeg_flat_block_roundtrips_exactly():
    """A flat image quantizes to a DC-only stream whose dequantized IDCT
    reproduces the input EXACTLY when 8*(v-128) divides the scaled DC
    quantum — hand-derivable: at quality 90 the Annex K DC step 16
    scales to (16*20+50)//100 = 3, so v=200 gives DC=round(576/3)=192,
    decode 192*3/8+128 = 200."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    flat = np.full((16, 24), 200, dtype=np.uint8)
    payload = mc.encode_jpeg(flat, quality=90)
    assert mc.jpeg_info(payload) == {
        "width": 24, "height": 16, "channels": 1}
    out = mc.decode_jpeg(payload)
    assert out.shape == (16, 24) and (out == 200).all()


def test_jpeg_roundtrip_tolerance_gray_rgb_420_and_odd_sizes():
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    yy, xx = np.mgrid[0:24, 0:40]
    smooth = np.stack(
        [((xx * 2 + yy) % 200 + 20) for _ in range(3)], axis=2
    ).astype(np.uint8)
    for kwargs in ({"quality": 92}, {"quality": 92, "subsample": True}):
        out = mc.decode_jpeg(mc.encode_jpeg(smooth, **kwargs))
        assert out.shape == smooth.shape
        d = np.abs(out.astype(int) - smooth.astype(int))
        assert d.max() <= 8 and d.mean() <= 2.0, (kwargs, d.max())

    odd = ((xx[:13, :19] * 7 + yy[:13, :19] * 3) % 256).astype(np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(odd, quality=95))
    assert out.shape == (13, 19)  # padding cropped away


def test_jpeg_progressive_and_garbage_rejected():
    import numpy as np
    import pytest

    from onto_text_tag_spark.functions import media_codecs as mc

    payload = bytearray(mc.encode_jpeg(np.full((8, 8), 99, np.uint8)))
    sof = payload.find(b"\xFF\xC0")
    payload[sof + 1] = 0xC2  # rebadge as progressive
    with pytest.raises(ValueError, match="progressive"):
        mc.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="not a JPEG"):
        mc.decode_jpeg(b"\x00\x01\x02")


def test_decode_image_dispatches_by_signature():
    import numpy as np
    import pytest

    from onto_text_tag_spark.functions import media_codecs as mc

    flat = np.full((8, 8), 128, dtype=np.uint8)
    assert mc.decode_image(mc.encode_jpeg(flat)).shape == (8, 8)
    assert mc.decode_image(mc.encode_png(flat)).shape == (8, 8)
    with pytest.raises(ValueError, match="unknown image format"):
        mc.decode_image(b"GIF89a......")


def test_jpeg_chroma_content_survives_420():
    """Color (not just luma) must survive the subsampled path — a
    decoder that drops/mixes Cb/Cr would still pass gray tests."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :8] = [200, 40, 40]   # red-ish left half
    img[:, 8:] = [40, 40, 200]   # blue-ish right half
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=95, subsample=True))
    left = out[4:12, 2:6].reshape(-1, 3).mean(axis=0)
    right = out[4:12, 10:14].reshape(-1, 3).mean(axis=0)
    assert left[0] > left[2] + 80   # red dominates
    assert right[2] > right[0] + 80  # blue dominates


def test_image_stats_and_resize_over_jpegs(spark):
    """The pixel kernels must accept baseline JPEG payloads end-to-end:
    stats via decode_image, resize re-encoding JPEG → JPEG."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        image_stats,
        resize_images,
    )

    flat = np.full((16, 16, 3), 200, dtype=np.uint8)
    rows = [
        ("j1", "image", "jpeg", mc.encode_jpeg(flat, quality=90)),
        ("j2", "image", "jpeg",
         mc.encode_jpeg(flat, quality=90, subsample=True)),
        ("p1", "image", "png", mc.encode_png(flat)),
        ("v1", "video", "mp4", mc.encode_mp4_stub(1000)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )
    stats = {r["media_id"]: r for r in image_stats(media).collect()}
    assert set(stats) == {"j1", "j2", "p1"}  # video skipped
    for mid in ("j1", "j2", "p1"):
        assert (stats[mid]["width"], stats[mid]["height"]) == (16, 16)
        assert stats[mid]["channels"] == 3
        # flat 200 decodes exactly through both codecs at q90
        assert stats[mid]["min_px"] == stats[mid]["max_px"] == 200

    resized = resize_images(media, 8, 4)
    out = {r["media_id"]: r for r in resized.collect()}
    assert mc.jpeg_info(bytes(out["j1"]["payload"]))["width"] == 8
    assert mc.png_info(bytes(out["p1"]["payload"]))["width"] == 8
    assert bytes(out["v1"]["payload"]) == rows[3][3]  # passthrough


def _jpeg_marker(payload: bytes, m: int) -> bool:
    return bytes([0xFF, m]) in payload


def test_image_dhash_python_twin_and_near_duplicates(spark):
    """Perceptual dedup: dHash matches a from-scratch python twin, a
    planted near-duplicate pair (tiny pixel perturbation survives
    re-encode) is found, and unrelated images are not paired."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        image_dhash,
        image_near_duplicates,
    )

    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(xx * 5 + yy * 3 + c * 7) % 256
                     for c in range(3)], axis=2).astype(np.uint8)
    near = base.copy()
    near[2, 3] = (near[2, 3] + 4) % 256      # one-pixel nudge
    other = np.stack([(xx * 91 + yy * 57 + c * 13 + 128) % 256
                      for c in range(3)], axis=2).astype(np.uint8)
    rows = [
        ("a", "image", "png", mc.encode_png(base)),
        ("b", "image", "png", mc.encode_png(near)),
        ("c", "image", "png", mc.encode_png(other)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )

    sigs = {r["media_id"]: list(r["sig"])
            for r in image_dhash(media).collect()}

    def twin(px):
        luma = px.astype(np.int64).sum(axis=2) // 3
        ys = [y * px.shape[0] // 8 for y in range(8)]
        xs = [x * px.shape[1] // 9 for x in range(9)]
        r = [[int(luma[y][x]) for x in xs] for y in ys]
        sig = []
        for b in range(4):
            v = 0
            for dy in range(2):
                for x in range(8):
                    if r[2 * b + dy][x + 1] > r[2 * b + dy][x]:
                        v |= 1 << (dy * 8 + x)
            sig.append(v)
        return sig

    assert sigs["a"] == twin(base)
    assert sigs["b"] == twin(near)
    assert sigs["c"] == twin(other)

    def ham(s1, s2):
        return sum(bin(a ^ b).count("1") for a, b in zip(s1, s2))

    assert ham(sigs["a"], sigs["b"]) <= 2   # perceptual: tiny nudge
    assert ham(sigs["a"], sigs["c"]) > 10   # different structure

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_near_duplicates(
               media, max_dist=10, max_bucket_size=None).collect()}
    assert ("a", "b") in got and got[("a", "b")] == ham(
        sigs["a"], sigs["b"])
    assert ("a", "c") not in got and ("b", "c") not in got


def test_audio_dhash_python_twin_and_near_duplicates(spark):
    """Audio perceptual dedup: block-energy dHash matches a from-
    scratch python twin, an amplitude-scaled near-copy pairs with its
    source, unrelated waveforms do not."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        audio_dhash,
        audio_near_duplicates,
    )

    n = 1300
    t = np.arange(n)
    base = ((t * 7) % 2003 - 1001).astype(np.int16)
    # near-dup: 5% quieter + tiny dither — envelope shape preserved
    near = (base.astype(np.int64) * 95 // 100
            + (t % 3) - 1).astype(np.int16)
    other = ((t * t * 13 + t * 5) % 1777 - 888).astype(np.int16)
    rows = [
        ("a", "audio", "wav", mc.encode_wav(base, 8000)),
        ("b", "audio", "wav", mc.encode_wav(near, 8000)),
        ("c", "audio", "wav", mc.encode_wav(other, 8000)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )

    # decode twin: samples round-trip exactly
    got = mc.decode_wav_samples(mc.encode_wav(base, 8000))
    assert np.array_equal(got, base)

    sigs = {r["media_id"]: list(r["sig"])
            for r in audio_dhash(media).collect()}

    def twin(samples):
        s = np.abs(samples.astype(np.int64))
        m = len(s)
        e = []
        for j in range(65):
            lo, hi = j * m // 65, (j + 1) * m // 65
            e.append(int(s[lo:hi].sum()) // (hi - lo) if hi > lo else 0)
        sig = []
        for b in range(4):
            v = 0
            for k in range(16):
                j = 16 * b + k
                if e[j + 1] > e[j]:
                    v |= 1 << k
            sig.append(v)
        return sig

    assert sigs["a"] == twin(base)
    assert sigs["b"] == twin(near)
    assert sigs["c"] == twin(other)

    def ham(s1, s2):
        return sum(bin(a ^ b).count("1") for a, b in zip(s1, s2))

    assert ham(sigs["a"], sigs["b"]) <= 6
    assert ham(sigs["a"], sigs["c"]) > 8

    got_pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in audio_near_duplicates(
                     media, max_dist=8, max_bucket_size=None).collect()}
    assert ("a", "b") in got_pairs
    assert got_pairs[("a", "b")] == ham(sigs["a"], sigs["b"])
    assert ("a", "c") not in got_pairs and ("b", "c") not in got_pairs


def test_avi_roundtrip_and_info():
    """AVI codec: uncompressed-DIB encode→decode roundtrips frame
    pixels bit-exactly (bottom-up BGR rows + 4-byte padding undone);
    MJPG frames decode through the baseline JPEG codec to within
    quantization error; header walk reports dimensions/fps/frames."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc

    ff, yy, xx = np.mgrid[0:4, 0:6, 0:9]  # w=9 → padded rows
    frames = np.stack(
        [(xx * 3 + yy * 5 + ff * 11 + c * 7) % 256 for c in range(3)],
        axis=3,
    ).astype(np.uint8)

    avi = mc.encode_avi(frames, fps=10)
    info = mc.avi_info(avi)
    assert (info["width"], info["height"], info["n_frames"]) == (9, 6, 4)
    assert info["codec"] == "dib" and info["fps"] == 10
    assert info["duration_ms"] == 400
    assert np.array_equal(mc.decode_avi_frames(avi), frames)

    mjpg = mc.encode_avi(frames, fps=10, codec="mjpg")
    assert mc.avi_info(mjpg)["codec"] == "mjpg"
    got = mc.decode_avi_frames(mjpg)
    assert got.shape == frames.shape
    err = np.abs(got.astype(np.int64) - frames.astype(np.int64))
    assert float(err.mean()) < 4.0

    with pytest.raises(ValueError):
        mc.avi_info(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        mc.encode_avi(frames[0], fps=10)  # not (n, h, w, 3)
    with pytest.raises(ValueError):
        mc.encode_avi(frames, codec="h264")


def test_video_dhash_python_twin_and_near_duplicates(spark):
    """Video perceptual dedup: the temporal luma-envelope dHash matches
    a from-scratch python twin, survives MJPG re-encode AND linear
    brightness scaling of the same footage (byte digests catch
    neither), and unrelated footage does not pair."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        video_dhash,
        video_near_duplicates,
    )

    nf, h, w = 80, 8, 12
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    base = np.stack(
        [(xx * 3 + yy * 5 + ff * ff % 97 + c * 7) % 256
         for c in range(3)],
        axis=3,
    ).astype(np.uint8)
    dimmed = (base.astype(np.int64) * 3 // 4).astype(np.uint8)
    other = np.stack(
        [(xx * 13 + yy * 11 + (nf - ff) * 29 + c * 7) % 256
         for c in range(3)],
        axis=3,
    ).astype(np.uint8)
    rows = [
        ("a", "video", "avi", mc.encode_avi(base, fps=10)),
        ("b", "video", "avi", mc.encode_avi(base, fps=10, codec="mjpg")),
        ("c", "video", "avi", mc.encode_avi(dimmed, fps=10)),
        ("d", "video", "avi", mc.encode_avi(other, fps=10)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )

    sigs = {r["media_id"]: list(r["sig"])
            for r in video_dhash(media).collect()}

    def twin(frames):
        n = frames.shape[0]
        hh, ww = frames.shape[1], frames.shape[2]
        luma = frames.astype(np.int64).sum(axis=3) // 3
        means = [int(luma[f].sum()) // (ww * hh) for f in range(n)]
        env = [means[t * n // 65] for t in range(65)]
        sig = []
        for b in range(4):
            v = 0
            for k in range(16):
                j = 16 * b + k
                if env[j + 1] > env[j]:
                    v |= 1 << k
            sig.append(v)
        return sig

    assert sigs["a"] == twin(base)
    assert sigs["c"] == twin(dimmed)
    assert sigs["d"] == twin(other)

    def ham(s1, s2):
        return sum(bin(x ^ y).count("1") for x, y in zip(s1, s2))

    # linear brightness scaling preserves the frame-mean ORDER, so the
    # hash is near-invariant; MJPG re-encode shifts means only by
    # quantization error
    assert ham(sigs["a"], sigs["b"]) <= 6
    assert ham(sigs["a"], sigs["c"]) <= 6
    assert ham(sigs["a"], sigs["d"]) > 8

    got_pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in video_near_duplicates(
                     media, max_dist=8, max_bucket_size=None).collect()}
    assert ("a", "b") in got_pairs and ("a", "c") in got_pairs
    assert got_pairs[("a", "b")] == ham(sigs["a"], sigs["b"])
    assert not any("d" in p for p in got_pairs)


def test_synthesize_real_media_avi_videos_decode(spark):
    """synthesize_real_media(video_format='avi') emits genuine AVI
    payloads whose decoded frames match the documented deterministic
    gradient — the device the mm_video_dups oracle replays in SQL."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        synthesize_real_media,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(9)], "doc_id long, text string"
    )
    media = {r["media_id"]: r for r in
             synthesize_real_media(docs, video_format="avi").collect()}
    vids = [i for i in range(9) if i % 3 == 2]
    assert all(media[str(i)]["format"] == "avi" for i in vids)
    for i in vids:
        frames = mc.decode_avi_frames(bytes(media[str(i)]["payload"]))
        nf, w, h = 6 + i % 10, 8 + i % 8, 6 + i % 6
        assert frames.shape == (nf, h, w, 3)
        ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
        want = np.stack(
            [(xx * 3 + yy * 5 + ff * 11 + i + c * 7) % 256
             for c in range(3)], axis=3,
        ).astype(np.uint8)
        assert np.array_equal(frames, want)


def test_video_shared_frames_planted_clips(spark):
    """Frame-granular video dedup: per-frame hashes match a python
    twin, videos re-embedding a 3-frame clip of an earlier video pair
    with exactly that video (n_shared_frames=3, hamming 0), avalanche
    noise frames never pair, and frame_stride subsamples the planted
    clip."""
    import numpy as np
    from pyspark.sql import functions as F

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        synthesize_footage_media,
        video_frame_hashes,
        video_shared_frames,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(15)], "doc_id long, text string"
    )
    media = synthesize_footage_media(docs)

    # python twin of the per-frame hash, from the decoded payload
    payload = bytes(
        media.where(F.col("media_id") == "4").collect()[0]["payload"])
    frames = mc.decode_avi_frames(payload)
    got = {
        (r["media_id"], r["frame_idx"]): list(r["sig"])
        for r in video_frame_hashes(media).collect()
    }
    for f in range(frames.shape[0]):
        luma = frames[f].astype(np.int64).sum(axis=2) // 3
        r = mc.resize_nearest(luma, 9, 8)
        bits = (r[:, 1:] > r[:, :-1]).astype(np.int64)
        sig = []
        for b in range(4):
            v = 0
            for dy in range(2):
                for x in range(8):
                    v |= int(bits[2 * b + dy, x]) << (dy * 8 + x)
            sig.append(v)
        assert got[("4", f)] == sig
    # the planted clip: frames 0-2 of video 4 ARE frames 0-2 of video 2
    for f in range(3):
        assert got[("4", f)] == got[("2", f)]

    pairs = {
        (r["id_a"], r["id_b"]): (r["n_shared_frames"], r["min_hamming"])
        for r in video_shared_frames(
            media, max_dist=4, min_frames=2,
            max_bucket_size=None).collect()
    }
    assert pairs == {("2", "4"): (3, 0), ("7", "9"): (3, 0),
                     ("12", "14"): (3, 0)}

    # stride=2 keeps planted frames 0 and 2 — still >= min_frames
    strided = {
        (r["id_a"], r["id_b"]): r["n_shared_frames"]
        for r in video_shared_frames(
            media, max_dist=4, min_frames=2, frame_stride=2,
            max_bucket_size=None).collect()
    }
    assert strided == {("2", "4"): 2, ("7", "9"): 2, ("12", "14"): 2}

    with pytest.raises(ValueError, match="frame_stride"):
        video_frame_hashes(media, frame_stride=0)


def test_audio_shared_segments_planted_excerpt(spark):
    """Segment-granular audio dedup: a clip that re-broadcasts the
    first two 800-sample segments of another (different tail) pairs
    with it at n_shared_segments=2; an amplitude-scaled full copy
    shares all three segments; unrelated audio never pairs; partial
    trailing segments are dropped."""
    import numpy as np

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        audio_segment_sigs,
        audio_shared_segments,
    )

    t = np.arange(2400, dtype=np.int64)
    base = ((t * 7 + t * t % 613) % 2003 - 1001).astype(np.int16)
    # re-broadcast: segments 0-1 verbatim, then a different tail
    excerpt = base.copy()
    excerpt[1600:] = ((t[1600:] * 13) % 1777 - 888).astype(np.int16)
    scaled = (base.astype(np.int64) * 95 // 100).astype(np.int16)
    other = ((t * t * 11 + t * 3) % 1873 - 936).astype(np.int16)
    rows = [
        ("a", "audio", "wav", mc.encode_wav(base, 8000)),
        ("b", "audio", "wav", mc.encode_wav(excerpt, 8000)),
        ("c", "audio", "wav", mc.encode_wav(scaled, 8000)),
        ("d", "audio", "wav", mc.encode_wav(other, 8000)),
        # 900 samples -> exactly ONE full segment, remainder dropped
        ("e", "audio", "wav", mc.encode_wav(base[:900], 8000)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )

    sigs = {r["media_id"]: list(r["sig"])
            for r in audio_segment_sigs(media).collect()}
    assert {k for k in sigs} == {
        "a#0", "a#1", "a#2", "b#0", "b#1", "b#2",
        "c#0", "c#1", "c#2", "d#0", "d#1", "d#2", "e#0",
    }
    assert sigs["a#0"] == sigs["b#0"] == sigs["e#0"]
    assert sigs["a#1"] == sigs["b#1"]
    assert sigs["a#2"] != sigs["b#2"]

    pairs = {
        (r["id_a"], r["id_b"]): (r["n_shared_segments"],
                                 r["min_hamming"])
        for r in audio_shared_segments(
            media, max_dist=4, min_segments=2,
            max_bucket_size=None).collect()
    }
    assert pairs[("a", "b")][0] == 2
    assert pairs[("a", "c")][0] == 3  # scaling preserves block order
    assert pairs[("b", "c")][0] == 2
    assert not any("d" in p for p in pairs)
    assert not any("e" in p for p in pairs)  # 1 shared seg < min 2

    with pytest.raises(ValueError, match="segment_samples"):
        audio_segment_sigs(media, segment_samples=64)


def test_avi_roundtrip_fuzz():
    """Property: ANY uint8 RGB frame stack roundtrips bit-exactly
    through the uncompressed-DIB AVI codec, across widths that do and
    do not need 4-byte row padding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        nf=st.integers(1, 6),
        h=st.integers(1, 12),
        w=st.integers(1, 13),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(nf, h, w, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(
            0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        payload = mc.encode_avi(frames, fps=7)
        info = mc.avi_info(payload)
        assert (info["width"], info["height"], info["n_frames"]) == \
            (w, h, nf)
        assert np.array_equal(mc.decode_avi_frames(payload), frames)

    roundtrip()


def test_image_shared_tiles_planted_region(spark):
    """Tile-granular image dedup: images re-embedding the top tile row
    of an earlier image pair with it at n_shared_tiles=2 (hamming 0),
    avalanche-noise tiles never pair, per-tile hashes match a python
    twin."""
    import numpy as np
    from pyspark.sql import functions as F

    from onto_text_tag_spark.functions import media_codecs as mc
    from onto_text_tag_spark.operators.multimodal import (
        image_shared_tiles,
        image_tile_sigs,
        synthesize_tiled_media,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(15)], "doc_id long, text string"
    )
    media = synthesize_tiled_media(docs)

    sigs = {r["media_id"]: list(r["sig"])
            for r in image_tile_sigs(media).collect()}
    # python twin for one image's tiles, from the decoded payload
    payload = bytes(
        media.where(F.col("media_id") == "4").collect()[0]["payload"])
    px = mc.decode_png(payload)
    luma = px.astype(np.int64).sum(axis=2) // 3
    for t in range(4):
        ty, tx = divmod(t, 2)
        tile = luma[ty * 8:(ty + 1) * 8, tx * 12:(tx + 1) * 12]
        r = mc.resize_nearest(tile, 9, 8)
        bits = (r[:, 1:] > r[:, :-1]).astype(np.int64)
        sig = []
        for b in range(4):
            v = 0
            for dy in range(2):
                for x in range(8):
                    v |= int(bits[2 * b + dy, x]) << (dy * 8 + x)
            sig.append(v)
        assert sigs[f"4#{t}"] == sig
    # the planted region: tiles 0-1 of image 4 ARE tiles 0-1 of image 2
    assert sigs["4#0"] == sigs["2#0"] and sigs["4#1"] == sigs["2#1"]
    assert sigs["4#2"] != sigs["2#2"]

    pairs = {
        (r["id_a"], r["id_b"]): (r["n_shared_tiles"], r["min_hamming"])
        for r in image_shared_tiles(
            media, max_dist=4, min_tiles=2,
            max_bucket_size=None).collect()
    }
    assert pairs == {("2", "4"): (2, 0), ("7", "9"): (2, 0),
                     ("12", "14"): (2, 0)}

    with pytest.raises(ValueError, match="grid"):
        image_tile_sigs(media, grid=(0, 2))


def test_thumbnail_links_cross_modal(spark):
    """Cross-modal linking: a PNG pixel-identical to a video's frame 0
    links (image_id, video_id, 0, hamming 0) through the shared
    banded pass; unrelated images and frames never link; same-modal
    pairs are excluded from the output."""
    from pyspark.sql import functions as F

    from onto_text_tag_spark.operators.multimodal import (
        synthesize_thumb_media,
        thumbnail_links,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(20)], "doc_id long, text string"
    )
    media = synthesize_thumb_media(docs)
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert kinds["2"] == "video" and kinds["0"] == "image"
    assert "1" not in kinds  # audio slots skipped in this corpus

    links = {
        (r["image_id"], r["video_id"]): (r["frame_idx"], r["hamming"])
        for r in thumbnail_links(
            media, max_dist=4, max_bucket_size=None).collect()
    }
    # one link per image whose video exists: 0->2, 3->5, ..., 15->17
    assert links == {
        (str(i), str(i + 2)): (0, 0) for i in range(0, 16, 3)
    }


def test_banded_pairs_hash_kernel_runs_once(spark):
    """Scale regression pin: the fused banding+verify path must plan
    exactly ONE decode+hash Python stage per operator — the
    compose-then-join form re-evaluated the Arrow kernel up to three
    times (banding + both verify join sides), re-decoding the whole
    payload corpus at 100 TB."""
    from onto_text_tag_spark.operators.multimodal import (
        image_near_duplicates,
        video_shared_frames,
    )

    rows = [(str(i), "image", "png", mc.encode_png(_gradient(8, 9, 3, i)))
            for i in range(4)]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, format string, payload binary"
    )
    plan = image_near_duplicates(media, max_dist=10)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan

    frames = ((np.mgrid[0:3, 0:6, 0:8][0] * 11) % 256).astype(np.uint8)
    frames = np.stack([frames] * 3, axis=3)
    vrows = [(str(i), "video", "avi", mc.encode_avi(frames))
             for i in range(3)]
    vmedia = spark.createDataFrame(
        vrows, "media_id string, kind string, format string, payload binary"
    )
    vplan = video_shared_frames(vmedia, max_dist=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert vplan.count("MapInPandas") == 1, vplan
