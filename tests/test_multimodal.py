"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, frame-sample fan-out, and the NotImplementedError gate."""

from __future__ import annotations

import hashlib

import pytest

from information_extraction_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media, deterministic_fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    # Digest matches the payload bytes (plumbing is real).
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in rows.items():
        assert r["digest"] == hashlib.md5(src[mid]).hexdigest()
        assert r["n_bytes"] == len(src[mid])
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        if r["kind"] == "image":
            assert r["n_frames"] == 1
        else:
            assert r["n_frames"] >= 1
    # Determinism under re-run and different partitioning.
    again = {
        r["media_id"]: r
        for r in extract_features(media.repartition(7), True).collect()
    }
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_real_decode_path_is_gated(spark):
    media = synthetic_media(spark, n=3)
    feats = extract_features(media, deterministic_fake=False)
    with pytest.raises(Exception) as exc_info:
        feats.collect()
    assert "NotImplementedError" in str(exc_info.value) or "decoder" in str(
        exc_info.value
    )


def test_bmp_parser_known_bytes():
    """parse_bmp against bytes assembled field-by-field from the
    published BITMAPINFOHEADER layout (not via make_bmp — independent
    construction)."""
    import struct

    from information_extraction_spark.operators.multimodal import parse_bmp

    w, h = 7, 5
    row = ((w * 3 + 3) // 4) * 4
    payload = (
        b"BM"
        + struct.pack("<IHHI", 54 + row * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h,
                      0, 0, 0, 0)
        + b"\x00" * (row * h)
    )
    assert parse_bmp(payload) == (7, 5)
    # top-down BMP: negative height, dimension is |height|
    payload_td = payload[:22] + struct.pack("<i", -h) + payload[26:]
    assert parse_bmp(payload_td) == (7, 5)
    with pytest.raises(ValueError):
        parse_bmp(b"PNG" + payload[3:])
    with pytest.raises(ValueError):
        parse_bmp(payload[:40])


def test_wav_parser_known_bytes_and_chunk_walk():
    """parse_wav against an independently assembled RIFF file with an
    extra LIST chunk (odd-sized, so the word-alignment rule is
    exercised) before fmt/data."""
    import struct

    from information_extraction_spark.operators.multimodal import parse_wav

    rate, ch, frames = 22050, 2, 9
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    odd_chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    body = (
        b"WAVE"
        + odd_chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", frames * block)
        + b"\x00" * (frames * block)
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_wav(payload) == (rate, ch, frames)
    with pytest.raises(ValueError):
        parse_wav(b"RIFX" + payload[4:])
    with pytest.raises(ValueError):
        parse_wav(payload[:20])  # fmt/data chunks truncated away


def test_wav_parser_untrusted_chunk_sizes():
    """Declared chunk sizes are untrusted: a truncated fmt body must
    raise ValueError (not struct.error), and an oversized declared
    data size must clamp n_frames to the bytes actually present."""
    import struct

    from information_extraction_spark.operators.multimodal import (
        make_wav,
        parse_wav,
    )

    full = make_wav(10, 8000, 1, seed=3)
    # Cut mid-fmt: the fmt chunk still claims 16 bytes but the payload
    # ends before they exist (header 12 + 'fmt '+size 8 + 6 bytes).
    with pytest.raises(ValueError, match="fmt chunk truncated"):
        parse_wav(full[:26])
    # Inflate the declared data size 100x: frame count must come from
    # the real remaining bytes (10 frames), not the declared size.
    data_off = full.index(b"data")
    inflated = (
        full[: data_off + 4]
        + struct.pack("<I", 10 * 2 * 100)
        + full[data_off + 8 :]
    )
    assert parse_wav(inflated) == (8000, 1, 10)


def test_native_codecs_through_spark_path(spark):
    """BMP and WAV payloads decode NATIVELY (deterministic_fake=False)
    through the full mapInPandas path, mixed with a fake-gated row to
    prove dispatch is per-payload."""
    from information_extraction_spark.operators.multimodal import (
        MEDIA,
        make_bmp,
        make_wav,
    )

    rows = [
        (1, "image", bytearray(make_bmp(12, 8, seed=4)), None, "t"),
        (2, "audio", bytearray(make_wav(33, 16000, 2, seed=5)), None, "t"),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    got = {
        r["media_id"]: r
        for r in extract_features(media, deterministic_fake=False).collect()
    }
    bmp = got[1]
    assert (bmp["width"], bmp["height"], bmp["n_frames"]) == (12, 8, 1)
    assert bmp["sample_rate"] is None and bmp["channels"] is None
    wav = got[2]
    assert (wav["sample_rate"], wav["channels"], wav["n_frames"]) == (
        16000, 2, 33,
    )
    assert wav["width"] is None and wav["height"] is None
    assert wav["n_bytes"] == 44 + 33 * 2 * 2


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, deterministic_fake=True)
    frames = sample_frames(feats, every_k=5)
    got = frames.groupBy("media_id").count().collect()
    by_id = {r["media_id"]: r["count"] for r in got}
    expected = {
        r["media_id"]: len(range(0, max(r["n_frames"] - 1, 0) + 1, 5))
        for r in feats.collect()
    }
    assert by_id == expected


def test_audio_energy_windows_stereo_and_partial(spark):
    """Hand WAV: stereo, 30 frames, window=25 -> window 0 has 50
    samples, window 1 the trailing 10; energy equals the python
    recomputation of the deterministic byte pattern; a mono payload
    windows per-frame."""
    import numpy as np

    from information_extraction_spark.operators.multimodal import (
        MEDIA,
        audio_energy_windows,
        make_wav,
        wav_samples,
    )

    pay_stereo = make_wav(30, sample_rate=8000, channels=2, seed=3)
    pay_mono = make_wav(26, sample_rate=8000, channels=1, seed=4)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(pay_stereo), None, "t"),
            (2, "audio", bytearray(pay_mono), None, "t"),
        ],
        schema=MEDIA,
    )
    got = {
        (r["media_id"], r["window_idx"]): (r["n_samples"], r["energy"])
        for r in audio_energy_windows(media, window_frames=25).collect()
    }

    def expect(payload, channels):
        samples, ch = wav_samples(payload)
        assert ch == channels
        step = 25 * channels
        sq = samples.astype(np.int64) ** 2
        return [
            (len(sq[w * step : (w + 1) * step]),
             int(sq[w * step : (w + 1) * step].sum()))
            for w in range((len(sq) + step - 1) // step)
        ]

    es = expect(pay_stereo, 2)
    em = expect(pay_mono, 1)
    assert got[(1, 0)] == es[0] and got[(1, 0)][0] == 50
    assert got[(1, 1)] == es[1] and got[(1, 1)][0] == 10
    assert got[(2, 0)] == em[0] and got[(2, 0)][0] == 25
    assert got[(2, 1)] == em[1] and got[(2, 1)][0] == 1
    assert len(got) == 4
    # sanity: the hand recomputation isn't trivially zero.
    assert got[(1, 0)][1] > 0


def test_bmp_pixels_decodes_padded_bottom_up_rows():
    """Pins the pixel decode against a hand fold of make_bmp's byte
    formula: width 3 (stride 12 — 3 padding bytes per row, excluded),
    bottom-up storage (decoded row 0 = last stored row)."""
    import numpy as np

    from information_extraction_spark.operators.multimodal import (
        bmp_pixels,
        make_bmp,
    )

    w, h, seed = 3, 4, 9
    px = bmp_pixels(make_bmp(w, h, seed=seed))
    assert px.shape == (h, w, 3)
    stride = ((w * 3 + 3) // 4) * 4
    for rt in range(h):
        for c in range(w):
            for k in range(3):
                i = (h - 1 - rt) * stride + c * 3 + k
                assert px[rt, c, k] == (seed * 31 + i * 7) % 256
    # truncated pixel data and non-24bpp both fail as ValueError
    full = make_bmp(w, h, seed=seed)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bmp_pixels(full[:-5])
    bad = bytearray(full)
    bad[28] = 8  # bpp field
    with _pytest.raises(ValueError):
        bmp_pixels(bytes(bad))
    assert np.issubdtype(px.dtype, np.uint8)


def test_image_tiles_lattice_and_sums(spark):
    """Odd dims split 'floor to the first tile': h=3 rows -> ty
    [0,0,1], w=5 cols -> tx [0,0,0,1,1]; tile sums recomputed by
    hand from the decoded array."""
    import numpy as np
    import pandas as pd

    from information_extraction_spark.operators.multimodal import (
        MEDIA,
        bmp_pixels,
        image_tiles,
        make_bmp,
    )

    pay = make_bmp(5, 3, seed=2)
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 7,
                    "kind": "image",
                    "payload": bytearray(pay),
                    "mime": "image/bmp",
                    "source": "t",
                }
            ],
            columns=[f.name for f in MEDIA.fields],
        ),
        schema=MEDIA,
    )
    got = {
        (r["ty"], r["tx"]): (r["n_px"], r["intensity_sum"])
        for r in image_tiles(media, grid=2).collect()
    }
    inten = bmp_pixels(pay).astype(np.int64).sum(axis=2)
    exp = {
        (0, 0): inten[:2, :3],
        (0, 1): inten[:2, 3:],
        (1, 0): inten[2:, :3],
        (1, 1): inten[2:, 3:],
    }
    assert got == {
        k: (int(v.size), int(v.sum())) for k, v in exp.items()
    }
    assert got[(0, 0)][0] == 6 and got[(0, 1)][0] == 4
    assert got[(1, 0)][0] == 3 and got[(1, 1)][0] == 2


def test_average_hash_collapses_copies_and_detects_change(spark):
    """Byte-identical payloads hash identically; a single-byte pixel
    perturbation does NOT move the hash (the robustness that makes it
    a NEAR-dup fingerprint, not a checksum); a different image does;
    an image shorter than the 8x8 grid emits '0' bits for its empty
    cells (never an error)."""
    import pandas as pd

    from information_extraction_spark.operators.multimodal import (
        MEDIA,
        average_hash,
        make_bmp,
    )

    pay = make_bmp(9, 7, seed=3)
    changed = bytearray(pay)
    changed[-1] = (changed[-1] + 128) % 256
    other = make_bmp(9, 7, seed=4)  # same dims, different content
    tiny = make_bmp(4, 3, seed=1)  # h=3 < grid: most cells empty
    rows = [
        (1, "image", bytearray(pay), "image/bmp", "t"),
        (2, "image", bytearray(pay), "image/bmp", "t"),
        (3, "image", changed, "image/bmp", "t"),
        (4, "image", bytearray(tiny), "image/bmp", "t"),
        (5, "image", bytearray(other), "image/bmp", "t"),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA.fields]),
        schema=MEDIA,
    )
    got = {
        r["media_id"]: r["phash"] for r in average_hash(media).collect()
    }
    assert got[1] == got[2] and len(got[1]) == 64
    assert set(got[1]) <= {"0", "1"} and "1" in got[1]
    assert got[3] == got[1]  # near-dup robustness, not a checksum
    assert got[5] != got[1]  # different content separates
    # tiny image: rows hit cells {0,2,5}, cols {0,2,4,6} -> at most
    # 12 populated cells; all 52 empty cells must read '0'.
    assert got[4].count("1") <= 12


def test_spectral_windows_channel0_partial_and_per_sample_loop(spark):
    """spectral_windows vs an independent per-sample Python loop:
    stereo payloads must use CHANNEL 0 only (de-interleaved), the
    trailing partial window truncates the table to its true length,
    and every value (re, im, power) is the exact integer the x100
    tables produce. Also pins a pure-tone case: a signal built FROM
    the bin-2 cosine table concentrates its power in bin 2."""
    import struct

    import numpy as np

    from information_extraction_spark.operators.multimodal import (
        MEDIA,
        dft_tables,
        make_wav,
        spectral_windows,
        wav_samples,
    )

    tabs = dft_tables(32, (1, 2, 4))

    def ref(payload):
        samples, channels = wav_samples(payload)
        ch0 = list(samples[::channels])
        out = {}
        for w in range(0, (len(ch0) + 31) // 32):
            chunk = ch0[w * 32 : (w + 1) * 32]
            for k, (cs, ss) in tabs.items():
                re = sum(int(v) * cs[i] for i, v in enumerate(chunk))
                im = sum(int(v) * ss[i] for i, v in enumerate(chunk))
                out[(w, k)] = (len(chunk), re, im, re * re + im * im)
        return out

    # stereo 40 frames (one full + one 8-frame partial window) and a
    # pure bin-2 tone: 64 mono frames whose samples are 100x the
    # bin-2 cosine table
    pay_stereo = make_wav(40, channels=2, seed=9)
    tone = [100 * c for c in tabs[2][0]] * 2
    data = b"".join(struct.pack("<h", v) for v in tone)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    pay_tone = b"RIFF" + struct.pack("<I", len(body)) + body

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(pay_stereo), None, "t"),
            (2, "audio", bytearray(pay_tone), None, "t"),
        ],
        schema=MEDIA,
    )
    got = {
        (r["media_id"], r["window_idx"], r["bin"]): (
            r["n_frames"], r["re_c"], r["im_c"], r["power_c2"]
        )
        for r in spectral_windows(media).collect()
    }
    for mid, pay in ((1, pay_stereo), (2, pay_tone)):
        expect = ref(pay)
        for (w, k), v in expect.items():
            assert got[(mid, w, k)] == v, (mid, w, k)
    # partial window: stereo 40 frames -> window 1 has 8 frames
    assert got[(1, 1, 1)][0] == 8
    # tone concentration: per full window, bin 2 dominates 1 and 4
    for w in (0, 1):
        p1, p2, p4 = (got[(2, w, k)][3] for k in (1, 2, 4))
        assert p2 > 100 * max(p1, p4)


def test_resize_nearest_downsample_and_upsample(spark):
    """Floor-mapping semantics pinned by hand on one 8x2 image that
    exercises BOTH directions at once: H=2 -> 4 output rows duplicate
    source rows (0,0,1,1 — upsample), W=8 -> 4 output cols stride the
    source (0,2,4,6 — downsample); every sampled byte must equal
    bmp_pixels' decode at the mapped coordinate."""
    from information_extraction_spark.operators.multimodal import (
        bmp_pixels,
        make_bmp,
        resize_nearest,
        synthetic_media,
    )

    w, h, seed = 8, 2, 9
    payload = make_bmp(w, h, seed=seed)
    px = bmp_pixels(payload)

    import pandas as pd

    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/bmp", "t")],
        "media_id long, kind string, payload binary, mime string,"
        " source string",
    )
    got = {
        (r.oy, r.ox): (r.b, r.g, r.r)
        for r in resize_nearest(media, out=4).collect()
    }
    assert len(got) == 16
    for oy in range(4):
        for ox in range(4):
            sr, sc = oy * h // 4, ox * w // 4
            assert got[(oy, ox)] == tuple(int(v) for v in px[sr, sc])
    # upsample duplication: output rows 0,1 sample source row 0
    assert got[(0, 0)] == got[(1, 0)]
    # downsample stride: distinct source columns 0,2,4,6
    assert len({got[(0, ox)] for ox in range(4)}) >= 2


def test_vad_segments_islands_and_strict_gate(spark):
    """Hand-built energy windows: media 1 has mean 25 over
    [10, 40, 40, 10, 60]; actives are idx 1,2 (run) and 4 (singleton)
    -> two segments; a window EXACTLY at the mean (media 2, all
    equal) is inactive under the strict gate -> no segments."""
    from information_extraction_spark.operators.multimodal import (
        vad_segments,
    )

    rows = [
        (1, 0, 25, 10),
        (1, 1, 25, 40),
        (1, 2, 25, 40),
        (1, 3, 25, 10),
        (1, 4, 25, 60),
        # media 2: all windows equal -> energy * n == sum, never >
        (2, 0, 25, 7),
        (2, 1, 25, 7),
    ]
    e = spark.createDataFrame(
        rows, "media_id long, window_idx long, n_samples long, energy long"
    )
    got = sorted(
        (r.media_id, r.seg_start, r.seg_end, r.n_windows, r.seg_energy)
        for r in vad_segments(e).collect()
    )
    assert got == [(1, 1, 2, 2, 80), (1, 4, 4, 1, 60)]


def test_png_jpeg_header_parse_roundtrip_and_truncation():
    """PNG IHDR / JPEG SOFn dimension parse (round-5: no codec
    library needed for header-level dims): round-trips the
    format-conformant builders, rejects truncation and wrong magic
    as ValueError (never struct.error), and the fake-path stub now
    fires only for genuinely compressed formats."""
    import pytest

    from information_extraction_spark.operators.multimodal import (
        _decode_payload,
        make_jpeg,
        make_png,
        parse_jpeg,
        parse_png,
    )

    for w, h, s in [(1, 1, 0), (8, 5, 3), (241, 123, 7), (300, 2, 9)]:
        assert parse_png(make_png(w, h, s)) == (w, h)
        assert parse_jpeg(make_jpeg(w, h, s)) == (w, h)
    assert _decode_payload(make_png(12, 9, 2), "image", False) == (
        12, 9, 1, None, None,
    )
    assert _decode_payload(make_jpeg(33, 21, 2), "image", False) == (
        33, 21, 1, None, None,
    )
    with pytest.raises(ValueError):
        parse_png(make_png(4, 4)[:20])  # truncated before dims
    with pytest.raises(ValueError):
        parse_png(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIDAT" + b"z" * 12)
    with pytest.raises(ValueError):
        parse_jpeg(make_jpeg(4, 4)[:6])  # truncated inside APP0
    with pytest.raises(ValueError):
        parse_jpeg(b"\xff\xd8\xff\xda\x00\x0a" + b"\x00" * 10)  # SOS first
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x00\x01\x02\x03" * 8, "video", False)
