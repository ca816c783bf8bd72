"""Multimodal plumbing tests: binary columns + mapInPandas decode stages."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators import multimodal as mm
from tidyvec_spark.sources.binary import read_binary_dir, with_synthetic_binary


@pytest.fixture(scope="module")
def media(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    return with_synthetic_binary(docs, "text").select("doc_id", "content")


def test_synthetic_binary_is_utf8(media, spark):
    row = media.withColumn("t2", F.decode("content", "UTF-8")).first()
    assert isinstance(row["content"], (bytes, bytearray))


def test_image_meta_matches_fake_formula(media):
    out = mm.decode_image_meta(media, "content", fake=True).collect()
    assert len(out) == 50
    for r in out:
        w, h, c, fmt = mm.fake_image_meta(r["n_bytes"])
        assert (r["width"], r["height"], r["channels"], r["format"]) == (w, h, c, fmt)


def test_image_meta_null_content(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)], "doc_id INT, content BINARY"
    )
    rows = {r["doc_id"]: r for r in mm.decode_image_meta(df, fake=True).collect()}
    assert rows[1]["n_bytes"] == 3 and rows[1]["width"] is not None
    assert rows[2]["n_bytes"] == 0 and rows[2]["width"] is None


def test_real_decode_raises_without_pil(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        mm.decode_image_meta(media, "content", fake=False)


def test_audio_meta(media):
    out = mm.decode_audio_meta(media, "content").collect()
    for r in out:
        sr, ch, dur = mm.fake_audio_meta(r["n_bytes"])
        assert (r["sample_rate"], r["channels"]) == (sr, ch)
        assert abs(r["duration_s"] - dur) < 1e-12


def test_frame_sample_fanout(media):
    out = mm.sample_frames(media, "content", "doc_id", stride=30)
    rows = out.collect()
    # every media row produces >= 1 frame row; frame indices stride-aligned
    assert len({r["doc_id"] for r in rows}) == 50
    assert len(rows) >= 50
    for r in rows:
        assert r["frame_idx"] % 30 == 0
        assert 0 <= r["frame_idx"] < r["n_frames"] <= 240


def test_read_binary_dir(spark, tmp_path):
    p = tmp_path / "blobs"
    p.mkdir()
    (p / "a.bin").write_bytes(b"hello")
    (p / "b.bin").write_bytes(b"world!!")
    (p / "skip.txt").write_bytes(b"no")
    df = read_binary_dir(spark, str(p), glob="*.bin")
    rows = sorted(df.collect(), key=lambda r: r["path"])
    assert len(rows) == 2
    assert rows[0]["length"] == 5 and bytes(rows[0]["content"]) == b"hello"


def test_binary_embed_nearest_end_to_end(media, spark):
    """Multimodal spine: binary content -> multimodal embedder (bytes
    route to the image branch, strings to the text branch; fake encoder
    mirrors both) -> VecFrame -> nearest by an image query vector."""
    from tidyvec_spark import vec
    from tidyvec_spark.embedders.hf import HFEmbedder

    emb = HFEmbedder("fake/clip", modality="multimodal", fake_dim=16)
    vf = vec(media.select("doc_id", "content"), embedding_fn=emb).embed("content")
    rows = vf.df.select("doc_id", "embedding", "content").collect()
    assert all(r["embedding"] is not None and len(r["embedding"]) == 16
               for r in rows)
    # query with the raw bytes of one document: its own row must score ~1
    target = rows[0]
    qvec = emb.embed_query(bytes(target["content"]))
    res = vf.nearest(qvec, n=1, as_embedding=True, tiebreak="doc_id")
    top = res.df.select("doc_id", "similarity").first()
    assert top["doc_id"] == target["doc_id"]
    assert abs(top["similarity"] - 1.0) < 1e-5


def test_parse_image_header_real_formats():
    import struct

    from tidyvec_spark.operators.multimodal import parse_image_header

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4)
    assert parse_image_header(png) == (640, 480, "PNG")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert parse_image_header(gif) == (320, 200, "GIF")
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 8
    assert parse_image_header(bmp) == (100, 50, "BMP")
    # JPEG: SOI, APP0 segment, then SOF0
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 768, 1024) + b"\x03" + b"\x00" * 2)
    assert parse_image_header(jpeg) == (1024, 768, "JPEG")
    assert parse_image_header(b"not an image at all") == (None, None, None)
    assert parse_image_header(None) == (None, None, None)


def test_image_header_meta_operator(spark):
    import struct

    from tidyvec_spark.operators.multimodal import image_header_meta

    def png(w, h):
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4)

    df = spark.createDataFrame(
        [(1, bytearray(png(12, 34))), (2, bytearray(b"junk")), (3, None)],
        "id bigint, content binary",
    )
    got = {r["id"]: (r["width"], r["height"], r["format"], r["n_bytes"])
           for r in image_header_meta(df).collect()}
    assert got[1] == (12, 34, "PNG", 33)
    assert got[2] == (None, None, None, 4)
    assert got[3] == (None, None, None, 0)


def _wav(rate=16000, ch=1, bits=16, n_frames=100):
    import struct

    data_size = n_frames * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_size) + b"\x00" * data_size)
    return b"RIFF" + struct.pack("<I", 4 + len(body) - 4) + body


def test_parse_wav_header():
    from tidyvec_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(_wav(44100, 2, 16, 441)) == (44100, 2, 441)
    assert parse_wav_header(_wav(8000, 1, 8, 12345)) == (8000, 1, 12345)
    assert parse_wav_header(b"ID3\x03junk mp3-ish") == (None, None, None)
    assert parse_wav_header(None) == (None, None, None)
    # sub-byte frame width (4-bit IMA-ADPCM, 1-bit): (ch*bits)//8 == 0
    # must yield n_samples=None, not a ZeroDivisionError that would
    # kill the whole mapInPandas task
    assert parse_wav_header(_wav(8000, 1, 4, 0)) == (8000, 1, None)
    assert parse_wav_header(_wav(8000, 1, 1, 0)) == (8000, 1, None)


def test_audio_header_meta_operator(spark):
    from tidyvec_spark.operators.multimodal import audio_header_meta

    df = spark.createDataFrame(
        [(1, bytearray(_wav(16000, 1, 16, 320))), (2, bytearray(b"nope"))],
        "id bigint, content binary",
    )
    got = {r["id"]: (r["sample_rate"], r["channels"], r["n_samples"])
           for r in audio_header_meta(df).collect()}
    assert got[1] == (16000, 1, 320)
    assert got[2] == (None, None, None)


def _mp4(timescale=600, duration=12000, ver=0):
    import struct

    if ver == 0:
        mvhd_body = (bytes([0]) + b"\x00" * 3 + b"\x00" * 8
                     + struct.pack(">I", timescale) + struct.pack(">I", duration)
                     + b"\x00" * 80)
    else:
        mvhd_body = (bytes([1]) + b"\x00" * 3 + b"\x00" * 16
                     + struct.pack(">I", timescale) + struct.pack(">Q", duration)
                     + b"\x00" * 80)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    return ftyp + moov


def test_parse_mp4_header():
    from tidyvec_spark.operators.multimodal import parse_mp4_header

    assert parse_mp4_header(_mp4(600, 12000)) == (600, 12000, "isom")
    assert parse_mp4_header(_mp4(90000, 2**33, ver=1)) == (90000, 2**33, "isom")
    assert parse_mp4_header(b"RIFF....WAVE") == (None, None, None)
    assert parse_mp4_header(None) == (None, None, None)


def test_video_header_meta_operator(spark):
    from tidyvec_spark.operators.multimodal import video_header_meta

    df = spark.createDataFrame(
        [(1, bytearray(_mp4(1000, 42000))), (2, bytearray(b"not a video"))],
        "id bigint, content binary",
    )
    got = {r["id"]: (r["timescale"], r["duration_units"], r["brand"])
           for r in video_header_meta(df).collect()}
    assert got[1] == (1000, 42000, "isom")
    assert got[2] == (None, None, None)


def _wav_pcm16(samples, rate=16000, ch=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                rate * ch * 2, ch * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def test_decode_pcm16_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 5]
    arr = mm.decode_pcm16(_wav_pcm16(samples))
    assert list(arr) == samples
    # non-PCM (format 3 = float) refuses rather than mis-decoding
    import struct

    b = bytearray(_wav_pcm16(samples))
    b[20:22] = struct.pack("<H", 3)
    assert mm.decode_pcm16(bytes(b)) is None
    assert mm.decode_pcm16(b"garbage") is None
    assert mm.decode_pcm16(None) is None


def test_audio_pcm_stats_operator(spark):
    samples = [0, 50, -200, 32500, -32768, 100]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(samples))), (2, None),
         (3, bytearray(b"not a wav"))],
        "doc_id INT, content BINARY",
    )
    rows = {r["doc_id"]: r for r in mm.audio_pcm_stats(df).collect()}
    r = rows[1]
    assert r["n_samples"] == 6
    assert r["peak"] == 32768
    assert r["sum_abs"] == sum(abs(s) for s in samples)
    assert r["n_clipped"] == 2      # |s| >= 32000
    assert r["n_silence"] == 3      # |s| <= 100
    assert rows[2]["n_samples"] is None
    assert rows[3]["n_samples"] is None


def _bmp24(gray_rows, scale=1):
    """Build an uncompressed 24bpp BMP whose mean-gray equals
    gray_rows (top-down), optionally upscaled by an integer factor so
    the pooling path gets exercised. Rows are stored bottom-up, like
    every real BMP writer."""
    import struct

    h = len(gray_rows) * scale
    w = len(gray_rows[0]) * scale
    stride = ((w * 3 + 3) // 4) * 4
    px = bytearray()
    for r in range(h - 1, -1, -1):          # bottom-up
        row = bytearray()
        for c in range(w):
            g = gray_rows[r // scale][c // scale]
            row += bytes((g, g, g))          # B=G=R=g
        row += b"\x00" * (stride - len(row))
        px += row
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                      0, 0, 0, 0)
    )
    return bytes(hdr) + bytes(px)


def test_decode_bmp_gray_exact():
    rows = [[(r * 8 + c) % 256 for c in range(8)] for r in range(8)]
    g = mm.decode_bmp_gray(_bmp24(rows))
    assert g.shape == (8, 8)
    assert g.tolist() == rows
    assert mm.decode_bmp_gray(b"BMxx") is None
    assert mm.decode_bmp_gray(None) is None


def test_image_ahash_operator_and_pooling(spark):
    rows = [[255 if (r + c) % 2 else 0 for c in range(8)] for r in range(8)]
    flat = [v for row in rows for v in row]
    total = sum(flat)
    expect = "".join("1" if 64 * v > total else "0" for v in flat)
    df = spark.createDataFrame(
        [(1, bytearray(_bmp24(rows))),            # native 8x8
         (2, bytearray(_bmp24(rows, scale=2))),   # 16x16, pooled
         (3, bytearray(b"\x00\x01")), (4, None)],
        "doc_id INT, content BINARY",
    )
    out = {r["doc_id"]: r for r in mm.image_ahash(df).collect()}
    assert out[1]["ahash"] == expect
    assert out[2]["ahash"] == expect          # pooling preserves blocks
    assert out[1]["sum_gray"] == total and out[1]["n_px"] == 64
    assert out[3]["ahash"] is None and out[4]["ahash"] is None


def test_image_near_dup_pairs(spark):
    from tidyvec_spark.operators.dedup import image_near_dup_pairs

    base = [[(r * 7 + c * 13) % 256 for c in range(8)] for r in range(8)]
    tweak = [row[:] for row in base]
    tweak[3][4] = (tweak[3][4] + 128) % 256      # one-pixel edit
    other = [[(255 - (r * 31 + c * 3)) % 256 for c in range(8)]
             for r in range(8)]
    df = spark.createDataFrame(
        [(1, bytearray(_bmp24(base))), (2, bytearray(_bmp24(tweak))),
         (3, bytearray(_bmp24(other))), (4, None)],
        "doc_id INT, content BINARY",
    )
    pairs = image_near_dup_pairs(df, "content", "doc_id",
                                 bands=8, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert all(k == (1, 2) for k in got)  # the unrelated image stays out

    import pytest

    with pytest.raises(ValueError):
        image_near_dup_pairs(df, "content", "doc_id", bands=5,
                             max_hamming=3)
    # completeness law: max_hamming >= bands is only probabilistic
    # recall past bands-1 bits, so it raises unless opted into
    with pytest.raises(ValueError):
        image_near_dup_pairs(df, "content", "doc_id", bands=4,
                             max_hamming=6)
    lossy = image_near_dup_pairs(df, "content", "doc_id", bands=4,
                                 max_hamming=6, complete=False).collect()
    assert {(r["id_a"], r["id_b"]) for r in lossy} == {(1, 2)}


def test_audio_envelope_hash_and_near_dup(spark):
    from tidyvec_spark.operators.dedup import audio_near_dup_pairs
    from tidyvec_spark.operators import multimodal as mm2

    # two near-identical tracks (one window boosted), one noise track
    base = [(i * 997) % 16000 for i in range(128)]
    tweak = base[:]
    tweak[10] += 2000
    tweak[11] += 2000
    other = [((i * 53 + 7) ** 2) % 30000 for i in range(128)]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(base))), (2, bytearray(_wav_pcm16(tweak))),
         (3, bytearray(_wav_pcm16(other))), (4, None),
         (5, bytearray(_wav_pcm16(base[:32])))],   # shorter than windows
        "doc_id INT, content BINARY",
    )
    env = {r["doc_id"]: r for r in
           mm2.audio_envelope_hash(df, windows=64).collect()}
    assert len(env[1]["envelope"]) == 64
    assert env[4]["envelope"] is None
    assert env[5]["envelope"] is None and env[5]["n_samples"] == 32
    # constant-gain invariance: doubling every sample keeps the bits
    doubled = [s * 2 for s in base if True]
    df2 = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(base))), (2, bytearray(_wav_pcm16(doubled)))],
        "doc_id INT, content BINARY",
    )
    env2 = {r["doc_id"]: r["envelope"] for r in
            mm2.audio_envelope_hash(df2, windows=64).collect()}
    assert env2[1] == env2[2]

    pairs = audio_near_dup_pairs(df, "content", "doc_id",
                                 windows=64, bands=8, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert all(k == (1, 2) for k in got)

    import pytest

    with pytest.raises(ValueError):
        mm2.audio_envelope_hash(df, windows=0)


def test_media_type_of_sniffs_all_modalities(spark):
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
    gif = b"GIF89a" + b"\x00" * 10
    jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 10
    bmp = _bmp24([[0] * 8 for _ in range(8)])
    wav = _wav_pcm16([0, 1, 2])
    avi = b"RIFF" + struct.pack("<I", 100) + b"AVI " + b"\x00" * 20
    mp4 = b"\x00\x00\x00\x10ftypisom" + b"\x00" * 8
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(jpg)),
         (4, bytearray(bmp)), (5, bytearray(wav)), (6, bytearray(mp4)),
         (7, bytearray(avi)), (8, bytearray(b"plain text")), (9, None)],
        "doc_id INT, content BINARY",
    )
    got = {r["doc_id"]: r["m"] for r in
           df.select("doc_id", mm.media_type_of("content").alias("m")).collect()}
    assert got[1] == got[2] == got[3] == got[4] == "image"
    assert got[5] == "audio"
    assert got[6] == "video"
    assert got[7] == "unknown"   # RIFF but not WAVE
    assert got[8] == "unknown" and got[9] == "unknown"


def test_sniff_matches_expression_and_quarantine(spark):
    import struct

    samples = [
        (1, bytes.fromhex(
            "89504E470D0A1A0A0000000D49484452"
            "0000001000000010080200000000000000")),
        (2, _wav_pcm16([1, 2, 3])),
        (3, b"\x89PNG\r\n\x1a\n"),                 # truncated
        (4, b"RIFF" + struct.pack("<I", 8) + b"AVI "),
        (5, b"not media"),
        (6, None),
        (7, b""),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None) for i, b in samples],
        "doc_id INT, content BINARY",
    )
    # python sniff == expression sniff, row for row
    expr = {r["doc_id"]: r["m"] for r in
            df.select("doc_id", mm.media_type_of("content").alias("m"))
              .collect()}
    for i, b in samples:
        assert mm.sniff_media_type(b) == expr[i], i

    rows = {r["doc_id"]: r for r in mm.media_quarantine(df).collect()}
    assert rows[1]["status"] == "ok" and rows[1]["reason"] is None
    assert rows[2]["status"] == "ok" and rows[2]["modality"] == "audio"
    assert rows[3]["status"] == "quarantined"
    assert rows[3]["reason"] == "parse_failed"
    assert rows[4]["reason"] == "unknown_format"  # RIFF but not WAVE
    assert rows[5]["reason"] == "unknown_format"
    assert rows[6]["reason"] == "empty" and rows[7]["reason"] == "empty"


def test_image_quality_stats_and_flags(spark):
    from tidyvec_spark.operators.multimodal import (
        image_quality_flags,
        image_quality_stats,
    )

    full = [[(r * 29 + c * 31) % 256 for c in range(8)] for r in range(8)]
    blank = [[128] * 8 for _ in range(8)]
    lowc = [[100 + (r + c) % 8 for c in range(8)] for r in range(8)]
    dark = [[(r + c) % 20 for c in range(8)] for r in range(8)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_bmp24(full))),
            (2, bytearray(_bmp24(blank))),
            (3, bytearray(_bmp24(lowc))),
            (4, bytearray(_bmp24(dark))),
            (5, None),
        ],
        "doc_id INT, content BINARY",
    )
    out = {
        r["doc_id"]: r
        for r in image_quality_flags(image_quality_stats(df)).collect()
    }
    # integer-exact stats on the full-range image
    flat = [v for row in full for v in row]
    assert out[1]["n_px"] == 64 and out[1]["sum_gray"] == sum(flat)
    assert out[1]["min_gray"] == min(flat) and out[1]["max_gray"] == max(flat)
    assert out[1]["sum_sq_gray"] == sum(v * v for v in flat)
    assert out[1]["keep"] is True
    assert out[2]["is_blank"] is True and out[2]["keep"] is False
    assert out[3]["low_contrast"] is True and out[3]["is_blank"] is False
    assert out[4]["too_dark"] is True and out[4]["keep"] is False
    # non-decodable payload: NULL stats, keep=False (one-side-of-split)
    assert out[5]["n_px"] is None and out[5]["keep"] is False


def test_image_quality_is_one_scan(spark):
    from tidyvec_spark import plans
    from tidyvec_spark.operators.multimodal import (
        image_quality_flags,
        image_quality_stats,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_bmp24([[0] * 8] * 8)))], "doc_id INT, content BINARY"
    )
    out = image_quality_flags(image_quality_stats(df))
    assert plans.num_shuffles(out) == 0
