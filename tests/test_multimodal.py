"""Multimodal plumbing tests: schema, Arrow batch shape, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classic_fcd_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    decode_stub,
    extract_features,
    frame_sample_offsets,
    synthetic_media_from_documents,
)
from tests.conftest import SF_SMALL


class TestDecodeStub:
    def test_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            decode_stub(b"bytes", "image")

    def test_fake_is_deterministic(self):
        a = decode_stub(b"bytes", "image", deterministic_fake=True)
        b = decode_stub(b"bytes", "image", deterministic_fake=True)
        assert a == b and set(a) == {"luma_mean", "luma_std", "entropy"}


class TestMediaPipeline:
    def test_features_schema_and_dim(self, spark):
        media = synthetic_media_from_documents(spark, SF_SMALL)
        feats = extract_features(media)
        rows = feats.limit(5).collect()
        assert rows and all(len(r["features"]) == FEATURE_DIM for r in rows)
        assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])

    def test_metadata_query_prunes_content(self, spark, tmp_path):
        # write media to parquet, query metadata only, assert the scan's
        # ReadSchema excludes the heavy binary column (column pruning)
        media = synthetic_media_from_documents(spark, SF_SMALL)
        path = str(tmp_path / "media")
        media.write.parquet(path)
        q = spark.read.parquet(path).filter(F.col("kind") == "video").select(
            "media_id", "meta.duration_ms"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan

    def test_frame_sampling(self, spark):
        media = synthetic_media_from_documents(spark, SF_SMALL)
        frames = frame_sample_offsets(media, every_ms=1000)
        one = (
            frames.groupBy("media_id")
            .agg(F.count("*").alias("n"), F.max("frame_offset_ms").alias("mx"))
            .join(media.filter(F.col("kind") == "video"), "media_id")
            .select("n", "mx", "meta.duration_ms")
            .limit(10)
            .collect()
        )
        assert one
        for r in one:
            assert r["mx"] < r["duration_ms"]
            assert r["n"] == (r["duration_ms"] + 999) // 1000


class TestResize:
    def test_resize_rewrites_images_only(self, spark):
        from classic_fcd_spark.multimodal.binary_ops import (
            resize_images,
            resize_stub,
            synthetic_media_from_documents,
        )
        from tests.conftest import SF_SMALL

        media = synthetic_media_from_documents(spark, SF_SMALL).limit(30)
        out = resize_images(media, 64, 32).collect()
        src = {r["media_id"]: r for r in media.collect()}
        assert out
        for r in out:
            if r["kind"] == "image":
                # bytes rewritten deterministically, meta pinned to target
                assert bytes(r["content"]) == resize_stub(
                    bytes(src[r["media_id"]]["content"]), 64, 32, True
                )
                assert (r["meta"]["width"], r["meta"]["height"]) == (64, 32)
                assert len(bytes(r["content"])) == (64 * 32) // 64
            else:
                # non-image rows pass through untouched
                assert bytes(r["content"]) == bytes(src[r["media_id"]]["content"])

    def test_resize_stub_raises_without_fake(self):
        import pytest

        from classic_fcd_spark.multimodal.binary_ops import resize_stub

        with pytest.raises(NotImplementedError):
            resize_stub(b"xx", 8, 8, deterministic_fake=False)

    def test_resize_composes(self, spark):
        """Output schema == input schema: chained resizes must run."""
        from classic_fcd_spark.multimodal.binary_ops import (
            resize_images,
            synthetic_media_from_documents,
        )
        from tests.conftest import SF_SMALL

        media = synthetic_media_from_documents(spark, SF_SMALL).limit(10)
        out = resize_images(resize_images(media, 128, 64), 64, 32)
        imgs = [r for r in out.collect() if r["kind"] == "image"]
        assert imgs and all(
            (r["meta"]["width"], r["meta"]["height"]) == (64, 32) for r in imgs
        )


class TestHeaderSniffing:
    """Container-header parsing is byte arithmetic, not decoding — these
    bytes are hand-built from the public format specs."""

    PNG = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )
    # JPEG: SOI, APP0 (16 bytes), SOF0 with height=333 width=222
    JPEG = (
        b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (333).to_bytes(2, "big") + (222).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    GIF = b"GIF89a" + (12).to_bytes(2, "little") + (34).to_bytes(2, "little") + b"\x00" * 4
    BMP = (
        b"BM" + b"\x00" * 16
        + (800).to_bytes(4, "little") + (-600).to_bytes(4, "little", signed=True)
    )
    WAV = (
        b"RIFF" + b"\x00" * 4 + b"WAVE" + b"fmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little")
    )

    def test_pure_python_sniffing(self):
        from classic_fcd_spark.multimodal.binary_ops import sniff_media_header

        assert sniff_media_header(self.PNG) == ("png", 640, 480, None)
        assert sniff_media_header(self.JPEG) == ("jpeg", 222, 333, None)
        assert sniff_media_header(self.GIF) == ("gif", 12, 34, None)
        # BMP: negative height means top-down rows; magnitude is the height
        assert sniff_media_header(self.BMP) == ("bmp", 800, 600, None)
        assert sniff_media_header(self.WAV) == ("wav", None, None, 44100)
        assert sniff_media_header(b"") == (None, None, None, None)
        assert sniff_media_header(b"\x89PNG\r\n\x1a") == (None, None, None, None)
        assert sniff_media_header(b"garbage bytes here") == (None, None, None, None)

    def test_with_header_meta_over_mixed_batch(self, spark):
        from classic_fcd_spark.multimodal.binary_ops import with_header_meta

        rows = [
            (0, "image", bytearray(self.PNG)),
            (1, "image", bytearray(self.JPEG)),
            (2, "audio", bytearray(self.WAV)),
            (3, "image", bytearray(b"not a real file")),
        ]
        df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
        got = {
            r["media_id"]: (
                r["sniffed"]["format"],
                r["sniffed"]["width"],
                r["sniffed"]["height"],
                r["sniffed"]["sample_rate"],
            )
            for r in with_header_meta(df).collect()
        }
        assert got == {
            0: ("png", 640, 480, None),
            1: ("jpeg", 222, 333, None),
            2: ("wav", None, None, 44100),
            3: (None, None, None, None),
        }

    def test_geometry_filter_runs_without_codec(self, spark):
        """The LAION-style 'drop tiny images' filter — real header math,
        no decode, no NotImplementedError."""
        from pyspark.sql import functions as F

        from classic_fcd_spark.multimodal.binary_ops import with_header_meta

        small_png = (
            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + (16).to_bytes(4, "big") + (16).to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
        )
        df = spark.createDataFrame(
            [(0, "image", bytearray(self.PNG)), (1, "image", bytearray(small_png))],
            "media_id long, kind string, content binary",
        )
        kept = [
            r["media_id"]
            for r in with_header_meta(df)
            .filter(
                (F.col("sniffed.width") >= 64) & (F.col("sniffed.height") >= 64)
            )
            .collect()
        ]
        assert kept == [0]

    def test_jpeg_fill_bytes_before_sof(self):
        from classic_fcd_spark.multimodal.binary_ops import sniff_media_header

        # 0xFF padding before the SOF marker is legal JPEG; the walker
        # must not consume it as a marker code
        jpeg = (
            b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xff\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (99).to_bytes(2, "big") + (77).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
        )
        assert sniff_media_header(jpeg) == ("jpeg", 77, 99, None)


class TestVideoAudioContainerSniffing:
    """r8: the FLAC / OGG-Vorbis / ISO-BMFF (MP4) header walks — the
    audio/video side of the no-codec boundary.  Bytes hand-built per
    RFC 9639 §8.1 (FLAC STREAMINFO), the Vorbis I spec §4.2.2
    (identification header), and ISO 14496-12 §8.3.2 (tkhd 16.16
    fixed-point geometry)."""

    @staticmethod
    def _flac(rate: int) -> bytes:
        # marker + STREAMINFO block header (type 0, len 34) + 34-byte body
        body = bytearray(34)
        # sample rate is 20 bits starting at body byte 10 (stream byte 18)
        body[10] = (rate >> 12) & 0xFF
        body[11] = (rate >> 4) & 0xFF
        body[12] = (rate & 0xF) << 4
        return b"fLaC" + b"\x00" + (34).to_bytes(3, "big") + bytes(body)

    @staticmethod
    def _ogg(rate: int) -> bytes:
        # 27-byte page header with 1 segment, then the Vorbis id packet
        header = b"OggS" + b"\x00" * 22 + b"\x01" + b"\x1e"
        pkt = (
            b"\x01vorbis"
            + (0).to_bytes(4, "little")  # vorbis_version
            + b"\x02"  # channels
            + rate.to_bytes(4, "little")
            + b"\x00" * 14
        )
        return header + pkt

    @staticmethod
    def _box(typ: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + typ + payload

    @classmethod
    def _mp4(cls, w: int, h: int, with_audio_track: bool = True) -> bytes:
        def tkhd(width, height):
            # version0 tkhd: 4 (ver/flags) + 80 body bytes; geometry is
            # the LAST 8 bytes as 16.16 fixed point
            body = bytearray(84)
            body[-8:-4] = (width << 16).to_bytes(4, "big")
            body[-4:] = (height << 16).to_bytes(4, "big")
            return cls._box(b"tkhd", bytes(body))

        traks = b""
        if with_audio_track:
            traks += cls._box(b"trak", tkhd(0, 0))  # audio: 0x0 geometry
        traks += cls._box(b"trak", tkhd(w, h))
        moov = cls._box(b"moov", cls._box(b"mvhd", b"\x00" * 100) + traks)
        ftyp = cls._box(b"ftyp", b"isom" + b"\x00" * 8)
        return ftyp + moov

    def test_flac_sample_rate(self):
        from classic_fcd_spark.multimodal.binary_ops import sniff_media_header

        assert sniff_media_header(self._flac(44100)) == ("flac", None, None, 44100)
        assert sniff_media_header(self._flac(96000)) == ("flac", None, None, 96000)
        # truncated marker-only content stays null-safe
        assert sniff_media_header(b"fLaC") == (None, None, None, None)

    def test_ogg_vorbis_sample_rate(self):
        from classic_fcd_spark.multimodal.binary_ops import sniff_media_header

        assert sniff_media_header(self._ogg(48000)) == ("ogg", None, None, 48000)
        # an Ogg page wrapping a non-Vorbis codec sniffs as ogg, rate
        # unknown (no misread)
        opus = b"OggS" + b"\x00" * 22 + b"\x01" + b"\x10" + b"OpusHead" + b"\x00" * 8
        assert sniff_media_header(opus) == ("ogg", None, None, None)

    def test_mp4_video_geometry_skips_audio_track(self):
        from classic_fcd_spark.multimodal.binary_ops import sniff_media_header

        assert sniff_media_header(self._mp4(1920, 1080)) == ("mp4", 1920, 1080, None)
        assert sniff_media_header(self._mp4(640, 360, with_audio_track=False)) == (
            "mp4", 640, 360, None,
        )
        # ftyp with no moov: format detected, geometry unknown
        assert sniff_media_header(self._box(b"ftyp", b"isom" + b"\x00" * 8)) == (
            "mp4", None, None, None,
        )
        # corrupt box size must not loop or raise
        bad = self._box(b"ftyp", b"isom") + b"\x00\x00\x00\x03moov"
        assert sniff_media_header(bad) == ("mp4", None, None, None)

    def test_mixed_media_batch_via_map_in_pandas(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.multimodal.binary_ops import with_header_meta

        rows = [
            (0, "video", bytearray(self._mp4(1280, 720))),
            (1, "audio", bytearray(self._flac(22050))),
            (2, "audio", bytearray(self._ogg(8000))),
        ]
        df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
        got = {
            r["media_id"]: (
                r["sniffed"]["format"], r["sniffed"]["width"],
                r["sniffed"]["height"], r["sniffed"]["sample_rate"],
            )
            for r in with_header_meta(df).collect()
        }
        assert got == {
            0: ("mp4", 1280, 720, None),
            1: ("flac", None, None, 22050),
            2: ("ogg", None, None, 8000),
        }
        # the no-codec quality gate now spans audio too: drop low-rate
        n = (
            with_header_meta(df)
            .filter(F.col("sniffed.sample_rate") >= 16000)
            .count()
        )
        assert n == 1
