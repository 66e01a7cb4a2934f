"""D5 media decode: exact-value tests for the REAL stdlib parsers
(PNG/GIF/BMP/JPEG header decode, WAV via the wave module) on generated
fixtures, plus corrupt-input hardening."""

import struct

import pytest

from event_streamer_spark.operators.multimodal import (
    decode_media,
    make_png,
    make_wav,
)


class TestImageDecode:
    def test_png_round_trip(self):
        d = decode_media(make_png(5, 3))
        assert (d["format"], d["width"], d["height"], d["channels"]) == (
            "png", 5, 3, 3,
        )

    def test_png_dims_exact(self):
        for w, h in [(1, 1), (64, 48), (640, 480)]:
            d = decode_media(make_png(w, h))
            assert (d["width"], d["height"]) == (w, h)

    def test_gif_header(self):
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
        d = decode_media(gif)
        assert (d["format"], d["width"], d["height"]) == ("gif", 320, 200)

    def test_bmp_header_negative_height(self):
        # top-down BMPs store negative height; decode reports magnitude
        bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 8
        d = decode_media(bmp)
        assert (d["format"], d["width"], d["height"]) == ("bmp", 640, 480)

    def test_jpeg_sof_scan(self):
        jpeg = (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"  # APP0
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"      # SOF0
            + struct.pack(">HH", 240, 360) + b"\x03" + b"\x00" * 6
        )
        d = decode_media(jpeg)
        assert (d["format"], d["width"], d["height"], d["channels"]) == (
            "jpeg", 360, 240, 3,
        )


class TestAudioDecode:
    def test_wav_round_trip(self):
        d = decode_media(make_wav(1234, sample_rate=16000))
        assert (d["format"], d["channels"], d["sample_rate"], d["n_frames"]) == (
            "wav", 1, 16000, 1234,
        )


class TestHardening:
    def test_corrupt_and_unknown_inputs(self):
        for payload in (
            b"", None, b"hello world", b"\x89PNG\r\n\x1a\nXXXX",
            b"RIFFxxxxWAVEbroken", b"\xff\xd8\x00garbage",
        ):
            d = decode_media(payload)
            assert d["format"] == "unknown" and d["width"] is None


class TestPixelPath:
    """Real pixel decode / resize on a NON-uniform image — the uniform
    fixture in d5_image_resize can't catch row/column transposition."""

    def _gradient_png(self, w, h):
        import struct
        import zlib

        from event_streamer_spark.operators.multimodal import _png_chunk

        rows = [
            b"\x00"
            + b"".join(
                bytes((x * 10 % 256, y * 20 % 256, (x + y) % 256))
                for x in range(w)
            )
            for y in range(h)
        ]
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _png_chunk(b"IEND", b"")
        )

    def test_decode_matches_generator(self):
        from event_streamer_spark.operators.multimodal import decode_png_pixels

        w, h = 7, 5
        dw, dh, rows = decode_png_pixels(self._gradient_png(w, h))
        assert (dw, dh) == (w, h)
        # spot pixels: (x=3, y=2) → (30, 40, 5)
        assert rows[2][9:12] == [30, 40, 5]
        assert rows[4][18:21] == [60, 80, 10]  # (x=6, y=4)

    def test_nearest_resize_picks_expected_sources(self):
        from event_streamer_spark.operators.multimodal import (
            decode_png_pixels,
            resize_nearest,
        )

        w, h = 8, 4
        _, _, rows = decode_png_pixels(self._gradient_png(w, h))
        out = resize_nearest(rows, w, h, 4, 2)
        # output (ox, oy) samples source (ox*w//4, oy*h//2)
        for oy in range(2):
            for ox in range(4):
                sx, sy = ox * w // 4, oy * h // 2
                assert out[oy][ox * 3 : ox * 3 + 3] == rows[sy][sx * 3 : sx * 3 + 3]

    def test_unsupported_formats_raise(self):
        import pytest as _pytest

        from event_streamer_spark.operators.multimodal import decode_png_pixels

        with _pytest.raises(NotImplementedError):
            decode_png_pixels(b"\xff\xd8jpeg-ish")


def _fake_opus_codec(payload):
    """Pretend Opus decoder: claims Ogg payloads only."""
    if payload[:4] != b"OggS":
        return None
    return {"format": "opus", "channels": 2, "sample_rate": 48000, "n_frames": 960}


def _fake_jpeg_pixel_codec(payload):
    """Pretend JPEG pixel decoder: claims JPEG magic only."""
    if payload[:2] != b"\xff\xd8":
        return None
    return (2, 1, [[1, 2, 3, 4, 5, 6]])


class TestPluggableCodecs:
    """Injectable decoder callables extend decode coverage where codec
    libraries exist, leaving stdlib PNG/WAV paths as the default."""

    def teardown_method(self):
        from event_streamer_spark.operators.multimodal import (
            clear_registered_codecs,
        )

        clear_registered_codecs()

    def test_media_codec_argument(self):
        d = decode_media(b"OggS....", codecs=[_fake_opus_codec])
        assert (d["format"], d["channels"], d["sample_rate"]) == (
            "opus", 2, 48000,
        )
        assert d["width"] is None  # unclaimed keys stay null

    def test_media_codec_declines_falls_through_to_stdlib(self):
        d = decode_media(make_png(5, 3), codecs=[_fake_opus_codec])
        assert (d["format"], d["width"], d["height"]) == ("png", 5, 3)

    def test_media_codec_registry(self):
        from event_streamer_spark.operators.multimodal import (
            register_media_codec,
        )

        register_media_codec(_fake_opus_codec)
        assert decode_media(b"OggS....")["format"] == "opus"
        # stdlib path unaffected for payloads the codec declines
        assert decode_media(make_wav(10))["format"] == "wav"

    def test_media_codec_exception_treated_as_decline(self):
        def exploding(payload):
            raise RuntimeError("boom")

        d = decode_media(make_png(4, 4), codecs=[exploding])
        assert (d["format"], d["width"]) == ("png", 4)

    def test_pixel_codec_argument_claims_jpeg(self):
        from event_streamer_spark.operators.multimodal import decode_png_pixels

        w, h, rows = decode_png_pixels(
            b"\xff\xd8jpeg-ish", codecs=[_fake_jpeg_pixel_codec]
        )
        assert (w, h, rows) == (2, 1, [[1, 2, 3, 4, 5, 6]])

    def test_pixel_codec_declines_keeps_stdlib_png_path(self):
        from event_streamer_spark.operators.multimodal import decode_png_pixels

        w, h, rows = decode_png_pixels(
            make_png(3, 2, gray=9), codecs=[_fake_jpeg_pixel_codec]
        )
        assert (w, h) == (3, 2)
        assert rows[0][:3] == [9, 9, 9]

    def test_pixel_codec_registry_and_unclaimed_raise(self):
        import pytest as _pytest

        from event_streamer_spark.operators.multimodal import (
            decode_png_pixels,
            register_pixel_codec,
        )

        register_pixel_codec(_fake_jpeg_pixel_codec)
        assert decode_png_pixels(b"\xff\xd8x")[0] == 2
        with _pytest.raises(NotImplementedError):
            decode_png_pixels(b"not-any-known-format")


class TestPerceptualHashDedup:
    """aHash invariances: brightness shift doesn't move bits; a pattern
    change does."""

    def test_brightness_invariant_pattern_sensitive(self):
        from event_streamer_spark.operators.multimodal import (
            ahash_64,
            make_patterned_png,
        )

        def png(pattern, offset):
            # the REAL fixture generator — a private copy here would
            # let the operator and test drift apart silently
            return make_patterned_png(0, pattern=pattern, offset=offset)

        assert ahash_64(png(3, 0)) == ahash_64(png(3, 2))  # shift-invariant
        assert ahash_64(png(3, 0)) != ahash_64(png(4, 0))  # pattern-sensitive
        hashes = {ahash_64(png(p, 0)) for p in range(10)}
        assert len(hashes) == 10  # all fixture groups distinct

    def test_uniform_images_hash_by_level(self):
        from event_streamer_spark.operators.multimodal import ahash_64, make_png

        white = ahash_64(make_png(8, 8, 250))
        black = ahash_64(make_png(8, 8, 10))
        assert white != black  # solid colors are NOT perceptual dups
        assert white.startswith("uniform-")
        # small brightness shift within the quantization bucket
        assert ahash_64(make_png(8, 8, 96)) == ahash_64(make_png(8, 8, 98))


class TestAudioFingerprint:
    def test_dc_invariant_waveform_sensitive(self):
        from event_streamer_spark.operators.multimodal import (
            audio_fingerprint,
            make_patterned_wav,
        )

        # doc_ids 0 and 8: same group (n frames), different DC offsets
        assert audio_fingerprint(make_patterned_wav(0)) == audio_fingerprint(
            make_patterned_wav(8 * 5)  # same %8 group, different %5 offset
        )
        # different groups → different lengths → different fingerprints
        assert audio_fingerprint(make_patterned_wav(0)) != audio_fingerprint(
            make_patterned_wav(1)
        )


class TestGifCodec:
    """d5_gif_frames support: stdlib GIF89a encoder/decoder (VERDICT r6 #3)."""

    def test_round_trip_non_uniform_frames(self):
        from event_streamer_spark.operators.multimodal_gif import (
            GIF_H,
            GIF_W,
            decode_gif,
            gif_pixel,
            make_patterned_gif,
        )

        g = decode_gif(make_patterned_gif(11))
        assert (g["width"], g["height"], g["n_frames"]) == (GIF_W, GIF_H, 11)
        for f in (0, 5, 10):
            fr = g["frames"][f]
            # every pixel matches first principles (NOT a uniform frame:
            # the pattern varies in x, y, and f)
            assert [
                fr[y * GIF_W + x] for y in range(GIF_H) for x in range(GIF_W)
            ] == [
                gif_pixel(f, x, y) for y in range(GIF_H) for x in range(GIF_W)
            ]
            assert len(set(fr)) > 1, "frame must not be uniform"
        # frames differ from each other
        assert g["frames"][0] != g["frames"][1]
        # grayscale palette: index i → (i, i, i)
        assert g["palette"][3 * 7 : 3 * 8] == bytes([7, 7, 7])

    def test_frame_delays_parsed(self):
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            make_patterned_gif,
        )

        g = decode_gif(make_patterned_gif(3, delay_cs=12))
        assert g["delays_cs"] == [12, 12, 12]

    def test_interlace_row_order(self):
        from event_streamer_spark.operators.multimodal_gif import (
            interlace_row_order,
        )

        # GIF89a §20 worked example for 8 rows
        assert interlace_row_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
        # every height is a permutation of range(h)
        for h in (1, 2, 3, 5, 7, 11, 16):
            assert sorted(interlace_row_order(h)) == list(range(h))

    def test_interlaced_decodes_equal_to_progressive_twin(self):
        """VERDICT r7 #3: an interlaced encoding of the same animation
        decodes to the SAME top-down frames as its non-interlaced twin
        (wire layout differs, displayed image does not)."""
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            keyframe_sums,
            make_patterned_gif,
        )

        plain = decode_gif(make_patterned_gif(9))
        inter = decode_gif(make_patterned_gif(9, interlace=True))
        assert inter["frames"] == plain["frames"]
        # and the dedup fingerprint is layout-invariant
        assert keyframe_sums(inter) == keyframe_sums(plain)

    def test_interlaced_round_trip_odd_geometries(self):
        """Interlace permutation at heights hitting each pass-count
        edge (h=1 → pass 1 only, h=2 → passes 1+4, h=3,5 partial
        pass 3, h=11 all four passes with ragged tails)."""
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            make_patterned_gif,
        )

        for w, h in ((1, 1), (3, 2), (4, 3), (2, 5), (5, 11)):
            plain = decode_gif(make_patterned_gif(3, w=w, h=h))
            inter = decode_gif(
                make_patterned_gif(3, w=w, h=h, interlace=True)
            )
            assert inter["frames"] == plain["frames"], (w, h)

    def test_local_color_table_round_trip(self):
        """VERDICT r7 #3 (second half): frames carrying a LOCAL color
        table — a rotated grayscale, so raw indices differ from the
        displayed grays — decode to the same DISPLAYED image and the
        same keyframe fingerprint as the global-palette twin."""
        from event_streamer_spark.operators.multimodal_gif import (
            GIF_H,
            GIF_W,
            decode_gif,
            frame_gray,
            gif_pixel,
            keyframe_sums,
            make_patterned_gif,
        )

        plain = decode_gif(make_patterned_gif(5))
        lct = decode_gif(make_patterned_gif(5, local_rot=77))
        assert all(p is not None for p in lct["frame_palettes"])
        # raw index bytes DIFFER (the palette indirection is real) …
        assert lct["frames"][0] != plain["frames"][0]
        # … but the displayed grays match first principles per frame
        for f in range(5):
            assert frame_gray(lct, f) == bytes(
                gif_pixel(f, x, y) for y in range(GIF_H) for x in range(GIF_W)
            )
        # and the palette-aware fingerprint is identical
        assert keyframe_sums(lct) == keyframe_sums(plain)

    def test_truncated_payload_raises_valueerror(self):
        """ADVICE r7: truncation is a DATA error — ValueError, never a
        bare IndexError — at every cut point of the container."""
        from event_streamer_spark.operators.multimodal_gif import (
            count_gif_frames,
            decode_gif,
            make_patterned_gif,
        )

        payload = make_patterned_gif(3)
        for cut in (8, 12, 300, 785, 790, 800, len(payload) - 2):
            chopped = payload[:cut]
            with pytest.raises(ValueError):
                decode_gif(chopped)
            try:
                count_gif_frames(chopped)
            except ValueError:
                pass  # allowed; IndexError is not

    def test_lzw_coincidental_eoi_tail_rejected(self):
        """ADVICE r7: a stream truncated mid-code whose leftover bits
        happen to spell EOI must raise, not silently return truncated
        pixels — the zero-extended EOI is only legal at the encoder's
        (width-1)-bit width."""
        from event_streamer_spark.operators.multimodal_gif import (
            _lzw_decode,
        )

        # mcs=2: clear=4, eoi=5, width starts at 3. Emit clear + 14
        # literals, mirroring the decoder's table growth so the width
        # reaches 5 and the bit count lands 3 short of a byte boundary;
        # then a 3-bit 0b101 tail (== eoi) byte-aligns the stream with
        # NO flush padding, leaving the decoder nbits=3 < width-1=4.
        # The old `nbits > 0` check accepted it, returning truncated
        # data; the tightened check must raise.
        acc = nbits = 0
        out = bytearray()

        def emit(code, width):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        width, next_code, total = 3, 6, 0

        def emit_t(code):
            nonlocal total
            emit(code, width)
            total += width

        emit_t(4)  # CLEAR
        for i in range(14):
            emit_t(i % 4)
            if i > 0:  # first post-clear code adds no table entry
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
        assert width == 5 and total % 8 == 5, (width, total)
        emit(5, 3)  # truncated tail that coincidentally spells EOI
        assert nbits == 0, "stream must byte-align with no flush padding"
        with pytest.raises(ValueError, match="EOI"):
            _lzw_decode(bytes(out), 2)

    def test_skips_unknown_extensions(self):
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            make_patterned_gif,
        )

        payload = bytearray(make_patterned_gif(2))
        # splice a comment extension right before the trailer
        assert payload[-1] == 0x3B
        comment = b"\x21\xfe\x05hello\x00"
        payload = payload[:-1] + comment + b"\x3b"
        g = decode_gif(bytes(payload))
        assert g["n_frames"] == 2

    def test_lzw_decoder_handles_general_streams(self):
        from event_streamer_spark.operators.multimodal_gif import (
            _lzw_decode,
            _lzw_encode,
        )

        # literal-only round trips at both palette widths
        data = bytes([1, 1, 1, 1, 2, 2, 2, 2] * 300)
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
        small = bytes([0, 1, 2, 3] * 10)
        assert _lzw_decode(_lzw_encode(small, 2), 2) == small
        # hand-packed KwKwK stream (code == next_code): clear,1,6 at 3
        # bits; decoding 6 adds entry 6 and next_code hits 7 = 2^3 - 1,
        # so the decoder widens EARLY and the EOI is a 4-bit code
        acc = 0
        nbits = 0
        out = bytearray()
        for c, w in ((4, 3), (1, 3), (6, 3), (5, 4)):
            acc |= c << nbits
            nbits += w
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        assert _lzw_decode(bytes(out), 2) == bytes([1, 1, 1])
        # truncated stream (no EOI) must raise, not return silently
        with pytest.raises(ValueError, match="EOI"):
            _lzw_decode(_lzw_encode(data, 8)[:-2] + b"", 8)

    def test_count_frames_and_decode_media_integration(self):
        from event_streamer_spark.operators.multimodal import decode_media
        from event_streamer_spark.operators.multimodal_gif import (
            GIF_H,
            GIF_W,
            count_gif_frames,
            make_patterned_gif,
        )

        payload = make_patterned_gif(17)
        assert count_gif_frames(payload) == 17
        meta = decode_media(payload)
        assert meta["format"] == "gif"
        assert (meta["width"], meta["height"]) == (GIF_W, GIF_H)
        assert meta["n_frames"] == 17
        # truncated payload → count_gif_frames raises (no-trailer input
        # is a data error, round 8) and decode_media maps that to
        # n_frames=None; header fields survive either way
        meta2 = decode_media(payload[: len(payload) // 2])
        assert meta2["format"] == "gif"
        assert meta2["n_frames"] is None or meta2["n_frames"] < 17

    def test_gce_scope_is_single_frame(self):
        """A GCE governs only the block that follows it (GIF89a §23):
        a frame WITHOUT its own GCE gets delay 0, not the previous
        frame's."""
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            make_patterned_gif,
        )

        payload = make_patterned_gif(2, delay_cs=50)
        gce = b"\x21\xF9\x04\x00" + (50).to_bytes(2, "little") + b"\x00\x00"
        assert payload.count(gce) == 2
        # drop the SECOND frame's GCE
        first = payload.index(gce)
        second = payload.index(gce, first + 1)
        stripped = payload[:second] + payload[second + len(gce):]
        g = decode_gif(stripped)
        assert g["n_frames"] == 2
        assert g["delays_cs"] == [50, 0]


class TestLzwProperty:
    """The shipped decoder is a GENERAL table-building LZW; the fixture
    encoder is literal-only. Round-trip it against a textbook
    COMPRESSING encoder too, so table growth, width growth (9→12 bits),
    the 12-bit cap with deferred clear, and KwKwK all get exercised by
    machine-generated streams, not just hand-built ones."""

    @staticmethod
    def _compress(indices: bytes, min_code_size: int) -> bytes:
        """Textbook GIF-LZW: greedy longest-match table build, width
        grows one code EARLY per the GIF convention (when next_code hits
        2^width), CLEAR emitted when the table fills at 4096."""
        clear = 1 << min_code_size
        eoi = clear + 1
        width = min_code_size + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        out = bytearray()
        acc = 0
        nbits = 0

        def emit(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        def reset() -> None:
            nonlocal table, next_code, width
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1

        emit(clear)
        w = b""
        for b in indices:
            wc = w + bytes([b])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            else:
                emit(clear)
                reset()
            w = bytes([b])
        if w:
            emit(table[w])
        emit(eoi)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def test_round_trip_random_streams(self):
        import random

        from event_streamer_spark.operators.multimodal_gif import (
            _lzw_decode,
        )

        for seed in range(30):
            rng = random.Random(f"lzw:{seed}")
            mcs = rng.choice([2, 3, 4, 8])
            alphabet = 1 << mcs
            n = rng.randint(1, 6000)
            # mix runs (compressible, triggers KwKwK) and noise
            data = bytearray()
            while len(data) < n:
                if rng.random() < 0.5:
                    data += bytes([rng.randrange(alphabet)]) * rng.randint(
                        1, 40
                    )
                else:
                    data += bytes(
                        rng.randrange(alphabet)
                        for _ in range(rng.randint(1, 20))
                    )
            data = bytes(data[:n])
            comp = self._compress(data, mcs)
            assert _lzw_decode(comp, mcs) == data, (seed, mcs, n)

    def test_width_growth_to_cap(self):
        """A long low-entropy stream at mcs=2 forces the encoder through
        every code width up to the 12-bit cap and a mid-stream CLEAR."""
        import random

        from event_streamer_spark.operators.multimodal_gif import (
            _lzw_decode,
        )

        rng = random.Random("cap")
        data = bytes(rng.randrange(4) for _ in range(120_000))
        comp = self._compress(data, 2)
        assert _lzw_decode(comp, 2) == data

    def test_hypothesis_round_trip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from event_streamer_spark.operators.multimodal_gif import (
            _lzw_decode,
        )

        @settings(max_examples=200, deadline=None)
        @given(
            st.binary(min_size=1, max_size=2000).map(
                lambda b: bytes(x & 0x0F for x in b)
            )
        )
        def check(data):
            assert _lzw_decode(self._compress(data, 4), 4) == data

        check()


class TestGifSignatureUdf:
    def test_corrupt_payload_yields_null_not_poison_pill(self, spark):
        """ADVICE r7: one corrupt GIF in a micro-batch must map to a
        NULL signature (dead-letterable), not raise inside the pandas
        UDF and wedge the stream on deterministic retry."""
        import pyspark.sql.functions as F

        from event_streamer_spark.operators.multimodal_gif import (
            gif_signature_udf,
            make_patterned_gif,
        )

        good = make_patterned_gif(4)
        rows = [
            (1, bytearray(good)),
            (2, bytearray(good[: len(good) // 2])),  # truncated
            (3, bytearray(b"not a gif at all")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
        out = {
            r["doc_id"]: r["sig"]
            for r in df.select(
                "doc_id", gif_signature_udf()(F.col("payload")).alias("sig")
            ).collect()
        }
        assert out[1] is not None and len(out[1]) == 32
        assert out[2] is None and out[3] is None and out[4] is None


class TestCodecHypothesis:
    """VERDICT r7 #8: the GIF LZW property round-trip caught a real
    decoder bug the fixtures masked — give the PNG and WAV codecs the
    same treatment: machine-generated parameter grids (dims, pixel
    content, sample counts/rates/values) through a full encode→decode
    round trip with exact equality."""

    def test_png_pixel_round_trip_hypothesis(self):
        import struct
        import zlib

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from event_streamer_spark.operators.multimodal import (
            _png_chunk,
            decode_png_pixels,
        )

        @settings(max_examples=60, deadline=None)
        @given(
            w=st.integers(1, 32),
            h=st.integers(1, 24),
            data=st.binary(min_size=1, max_size=512),
        )
        def check(w, h, data):
            # cycle the hypothesis bytes into w*h RGB pixels — arbitrary
            # non-uniform content, exact expected rows known a priori
            need = w * h * 3
            pix = (data * (need // len(data) + 1))[:need]
            rows = [
                list(pix[y * w * 3 : (y + 1) * w * 3]) for y in range(h)
            ]
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(
                    b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                )
                + _png_chunk(
                    b"IDAT",
                    zlib.compress(
                        b"".join(
                            b"\x00" + bytes(r) for r in rows
                        )
                    ),
                )
                + _png_chunk(b"IEND", b"")
            )
            dw, dh, drows = decode_png_pixels(payload)
            assert (dw, dh) == (w, h)
            assert drows == rows

        check()

    def test_png_multi_idat_round_trip(self):
        """The inflater must concatenate split IDAT chunks (any real
        encoder splits at 8-64 KiB) — the fixture's single-IDAT path
        can't catch a bug there."""
        import struct
        import zlib

        from event_streamer_spark.operators.multimodal import (
            _png_chunk,
            decode_png_pixels,
        )

        w, h = 9, 7
        rows = [
            [((x * 13 + y * 7 + c) % 251) for x in range(w) for c in range(3)]
            for y in range(h)
        ]
        raw = zlib.compress(b"".join(b"\x00" + bytes(r) for r in rows))
        cut = len(raw) // 3
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", raw[:cut])
            + _png_chunk(b"IDAT", raw[cut : 2 * cut])
            + _png_chunk(b"IDAT", raw[2 * cut :])
            + _png_chunk(b"IEND", b"")
        )
        dw, dh, drows = decode_png_pixels(payload)
        assert (dw, dh, drows) == (w, h, rows)

    def test_wav_round_trip_hypothesis(self):
        import io
        import struct
        import wave

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from event_streamer_spark.operators.multimodal import decode_media

        @settings(max_examples=60, deadline=None)
        @given(
            samples=st.lists(
                st.integers(-(1 << 15), (1 << 15) - 1),
                min_size=1,
                max_size=400,
            ),
            rate=st.sampled_from([8000, 16000, 22050, 44100]),
        )
        def check(samples, rate):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(rate)
                wv.writeframes(
                    b"".join(struct.pack("<h", s) for s in samples)
                )
            payload = buf.getvalue()
            meta = decode_media(payload)
            assert (
                meta["format"],
                meta["channels"],
                meta["sample_rate"],
                meta["n_frames"],
            ) == ("wav", 1, rate, len(samples))
            # full sample-level read-back through the frame-sampling
            # read path (seek + exact little-endian decode)
            with wave.open(io.BytesIO(payload), "rb") as wv:
                for off in {0, len(samples) // 2, len(samples) - 1}:
                    wv.setpos(off)
                    (v,) = struct.unpack("<h", wv.readframes(1))
                    assert v == samples[off]

        check()


class TestGifHardeningRound8:
    """Review r8: corruption classes that escaped the ValueError
    normalization (struct.error from a short GCE, IndexError from a
    too-small color table, silent partial results on missing-trailer
    input) — each is now a ValueError at the decoder and a NULL at the
    streaming signature UDF."""

    def test_short_gce_raises_valueerror_not_struct_error(self):
        from event_streamer_spark.operators.multimodal_gif import (
            decode_gif,
            make_patterned_gif,
        )

        payload = bytearray(make_patterned_gif(3))
        idx = payload.find(b"\x21\xF9\x04")
        assert idx > 0
        payload[idx + 2] = 0x02  # GCE declares 2 bytes: delay truncated
        with pytest.raises(ValueError):  # used to escape as struct.error
            decode_gif(bytes(payload))

    def test_missing_trailer_raises(self):
        from event_streamer_spark.operators.multimodal_gif import (
            count_gif_frames,
            decode_gif,
            make_patterned_gif,
        )

        payload = make_patterned_gif(3)
        assert payload[-1] == 0x3B
        # cut at the exact block boundary before the trailer: every
        # block walks cleanly, but the stream never terminates — a
        # partial frame count used to return as if valid
        chopped = payload[:-1]
        with pytest.raises(ValueError, match="truncated"):
            count_gif_frames(chopped)
        with pytest.raises(ValueError, match="truncated"):
            decode_gif(chopped)
        # cut inside the 768-byte global color table: the GCT skip
        # jumps past end-of-payload and the walk loop never runs —
        # count_gif_frames used to return 0 as if the GIF had no frames
        with pytest.raises(ValueError, match="truncated"):
            count_gif_frames(payload[:300])

    def test_palette_index_out_of_range_is_valueerror(self):
        from event_streamer_spark.operators.multimodal_gif import frame_gray

        decoded = {
            "frames": [bytes([0, 1, 5])],  # index 5 vs 2-entry palette
            "frame_palettes": [None],
            "palette": bytes(6),
        }
        with pytest.raises(ValueError, match="palette"):
            frame_gray(decoded, 0)

    def test_signature_udf_dead_letters_short_gce(self, spark):
        import pyspark.sql.functions as F

        from event_streamer_spark.operators.multimodal_gif import (
            gif_signature_udf,
            make_patterned_gif,
        )

        bad = bytearray(make_patterned_gif(4))
        idx = bad.find(b"\x21\xF9\x04")
        bad[idx + 2] = 0x02
        rows = [(1, bytearray(make_patterned_gif(4))), (2, bad)]
        df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
        out = {
            r["doc_id"]: r["sig"]
            for r in df.select(
                "doc_id", gif_signature_udf()(F.col("payload")).alias("sig")
            ).collect()
        }
        assert out[1] is not None
        assert out[2] is None  # dead-letter, not a poison pill


class TestBmpCodec:
    def _encode(self, w, h, grays, top_down=False):
        """Test-local 24-bit BMP encoder (independent of the fixture
        generator): grays is w*h values in top-down pixel order."""
        import struct

        stride = (3 * w + 3) & ~3
        row_ids = range(h) if top_down else range(h - 1, -1, -1)
        data = b"".join(
            b"".join(
                bytes((grays[y * w + x],) * 3) for x in range(w)
            ).ljust(stride, b"\x00")
            for y in row_ids
        )
        fh = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        ih = struct.pack(
            "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
            len(data), 2835, 2835, 0, 0,
        )
        return fh + ih + data

    def test_hypothesis_round_trip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from event_streamer_spark.operators.multimodal import decode_bmp

        @settings(max_examples=60, deadline=None)
        @given(
            w=st.integers(1, 12),
            h=st.integers(1, 8),
            data=st.data(),
            top_down=st.booleans(),
        )
        def run(w, h, data, top_down):
            grays = data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h, max_size=w * h
                )
            )
            out = decode_bmp(self._encode(w, h, grays, top_down))
            assert out["width"] == w and out["height"] == h
            assert out["pixel_sum"] == 3 * sum(grays)

        run()

    def test_fixture_matches_formula(self):
        from event_streamer_spark.operators.multimodal import (
            decode_bmp,
            make_patterned_bmp,
        )

        for doc_id in (0, 1, 7, 123, 9999):
            w, h = 8 + doc_id % 5, 6 + doc_id % 4
            expect = 3 * sum(
                (x * 7 + y * 11 + doc_id) % 256
                for y in range(h)
                for x in range(w)
            )
            out = decode_bmp(make_patterned_bmp(doc_id))
            assert (out["width"], out["height"]) == (w, h)
            assert out["pixel_sum"] == expect

    def test_truncation_and_variants_raise(self):
        import pytest

        from event_streamer_spark.operators.multimodal import (
            decode_bmp,
            make_patterned_bmp,
        )

        good = make_patterned_bmp(5)
        with pytest.raises(ValueError, match="truncated BMP"):
            decode_bmp(good[: len(good) - 4])
        with pytest.raises(ValueError, match="truncated BMP"):
            decode_bmp(good[:20])
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"PNG" + good[3:])
        # 8-bpp variant must be rejected, not mis-decoded
        bad_bpp = bytearray(good)
        bad_bpp[28] = 8
        with pytest.raises(ValueError, match="unsupported BMP variant"):
            decode_bmp(bytes(bad_bpp))


def test_decoders_survive_generated_hostility():
    """Round-10 hostile-payload fuzz (VERDICT r9 #7): every corruption
    of a valid payload — truncation at EVERY boundary class, byte
    flips, header+garbage, wrong depth/filter bytes, empty — must hit
    the decoders' declared contracts: ``decode_media`` ALWAYS returns
    a metadata dict (never raises), and the strict pixel decoders
    raise only ``ValueError`` (corrupt) / ``NotImplementedError``
    (valid-but-unsupported) — never a raw struct/zlib/Index error."""
    import random

    from event_streamer_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_png_pixels,
        make_patterned_bmp,
        make_patterned_png,
        make_patterned_wav,
        make_png,
        make_wav,
    )
    from event_streamer_spark.operators.multimodal_gif import (
        decode_gif,
        make_patterned_gif,
    )

    rng = random.Random(20260816)
    valids = [
        make_png(5, 4),
        make_patterned_png(7),
        make_wav(100, pattern=True),
        make_patterned_wav(3),
        make_patterned_bmp(11),
        make_patterned_gif(2),
    ]

    def corruptions(p: bytes):
        yield b""
        yield p[:1]
        # truncations: every header-ish prefix + sampled deep cuts
        for k in range(2, min(len(p), 32)):
            yield p[:k]
        for _ in range(24):
            yield p[: rng.randrange(1, len(p))]
        # byte flips at sampled offsets (headers + body)
        for _ in range(24):
            i = rng.randrange(len(p))
            b = bytearray(p)
            b[i] ^= 0xFF
            yield bytes(b)
        # valid magic + garbage body
        yield p[:8] + bytes(rng.randrange(256) for _ in range(40))
        # pure garbage
        yield bytes(rng.randrange(256) for _ in range(64))

    n_checked = 0
    for valid in valids:
        # sanity: the uncorrupted payload decodes as SOMETHING known
        assert decode_media(valid)["format"] != "unknown"
        for bad in corruptions(valid):
            meta = decode_media(bad)  # must never raise
            assert isinstance(meta, dict) and "format" in meta
            for strict in (decode_png_pixels, decode_bmp, decode_gif):
                try:
                    strict(bad)
                except (ValueError, NotImplementedError):
                    pass  # the declared contract
                # anything else (struct.error, zlib.error, IndexError,
                # KeyError, MemoryError from a bogus length field...)
                # propagates and fails the test
            n_checked += 1
    assert n_checked > 400
