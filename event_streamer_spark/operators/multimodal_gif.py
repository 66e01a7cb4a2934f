"""D5 multi-frame VISUAL media: animated GIF (87a/89a) frame sampling.

Round-6 gap: ``d5_frame_sample`` (``multimodal.py``) seeks frames in WAV
audio only — a VLM pipeline samples keyframes from a multi-frame visual
medium. GIF is the one animated image format that is fully decodable
from first principles with the stdlib (no codec libraries): LZW with
variable code width is specified in GIF89a appendix F, and the encoder
here uses the classic "uncompressed GIF" trick (emit a CLEAR code before
the string table can grow past 9-bit codes) so the fixture writer stays
~30 lines while the DECODER is a general table-building LZW that handles
output from any real encoder.

Fixture recipe (same shape as ``make_patterned_wav``): frame ``f`` holds
pixel ``(x, y) = (f*31 + x*7 + y) % 251`` — non-uniform in both axes and
frame-dependent, so the per-frame pixel SUM recomputes from first
principles in the DuckDB oracle and any seek/LZW/palette bug breaks the
value hash.

Reference parity note: the reference (comparaonline/event-streamer) has
no media surface at all; this extends SURVEY §2.D D5 per BASELINE.json's
multimodal mandate.
"""

from __future__ import annotations

import functools
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# ---------------------------------------------------------------------------
# GIF-flavored LZW (spec: GIF89a appendix F)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """LZW-encode palette indices, literal-only: every pixel is emitted
    as its 9-bit literal code, with a CLEAR before the decoder's string
    table can force a 10th bit. ~12% size overhead vs real compression,
    zero table bookkeeping — fixture writer, not a production encoder.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
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

    emit(clear)
    # the decoder adds one string-table entry per code after the first
    # and widens EARLY at next_code == 2^width - 1 (see _lzw_decode) —
    # reset so the CLEAR itself still lands within the 9-bit window
    budget = (1 << width) - clear - 3
    count = 0
    for px in indices:
        emit(px)
        count += 1
        if count >= budget:
            emit(clear)
            count = 0
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """General GIF LZW decoder: variable code width (grows at table size
    2^width, 12-bit cap per spec), CLEAR resets, the KwKwK case
    (``code == next_code``). LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    acc = 0
    nbits = 0
    out = bytearray()
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                # first code after CLEAR must be a literal
                if code not in table:
                    raise ValueError(f"corrupt LZW stream: code {code}")
                entry = table[code]
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]  # KwKwK
                else:
                    raise ValueError(f"corrupt LZW stream: code {code}")
                if next_code < 4096:  # table frozen when full (GIF cap)
                    table[next_code] = prev + entry[:1]
                    next_code += 1
                # the decoder adds its k-th entry one CODE after the
                # encoder added the same entry (the first code after a
                # CLEAR adds nothing), so it must widen one slot EARLY —
                # at 2^width - 1, not 2^width — to read the encoder's
                # first wider code at the right width. (Found by the
                # property round-trip against a real compressing
                # encoder; the literal-only fixture encoder never grows
                # the width and masked this.)
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
            out += entry
            prev = entry
    # EOI boundary quirk: when the final data code lands the decoder
    # exactly on a width-growth boundary, the encoder (which adds no
    # table entry after its last data code) emits the EOI one bit
    # NARROWER than the decoder now expects. The zero padding of the
    # encoder's byte flush normally absorbs the difference — unless the
    # EOI ends exactly on a byte boundary and no padding byte exists.
    # Zero-extend the remaining partial code, exactly as the flush
    # would, and accept it ONLY when the leftover bits can hold the
    # encoder's (width-1)-bit EOI; a shorter tail that coincidentally
    # spells EOI is a truncation, not a valid terminator.
    if nbits >= width - 1 and acc == eoi:
        return bytes(out)
    raise ValueError("LZW stream ended without EOI")


# ---------------------------------------------------------------------------
# container: encoder (fixture) + decoder (operator)
# ---------------------------------------------------------------------------

GIF_W, GIF_H = 4, 8  # fixture frame geometry (32 px/frame)

# GIF89a §20 interlace: four passes over the rows, coarsest first
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def interlace_row_order(h: int) -> list[int]:
    """The row indices of an ``h``-row interlaced frame in STORAGE
    order: pass 1 rows 0,8,16…, pass 2 rows 4,12…, pass 3 rows 2,6…,
    pass 4 rows 1,3,5… (GIF89a §20). Shared by the encoder (permute
    before LZW) and the decoder (un-permute after), so a one-sided
    mistake cannot round-trip."""
    return [
        r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
    ]


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    """Un-permute an interlaced frame's rows back to top-down order."""
    out = bytearray(w * h)
    for stored, actual in enumerate(interlace_row_order(h)):
        out[actual * w : (actual + 1) * w] = idx[stored * w : (stored + 1) * w]
    return bytes(out)


def gif_pixel(frame: int, x: int, y: int) -> int:
    """The fixture's first-principles pixel value (mod-251 keeps the
    pattern non-uniform across frames AND within each frame)."""
    return (frame * 31 + x * 7 + y) % 251


def make_patterned_gif(
    n_frames: int,
    w: int = GIF_W,
    h: int = GIF_H,
    delay_cs: int = 4,
    interlace: bool = False,
    local_rot: int | None = None,
) -> bytes:
    """Animated GIF89a: global 256-gray palette, one Graphic Control
    Extension (frame delay in centiseconds) + image block per frame.

    ``interlace=True`` stores each frame's rows in the 4-pass §20 order
    with the interlace flag set — same displayed image, different wire
    layout. ``local_rot=r`` gives every frame a LOCAL color table whose
    entry ``j`` is gray ``(j + r) % 256`` and writes index
    ``(pixel - r) % 256``, so the raw indices differ from the pixel
    values but the displayed grays are identical — exercising the LCT
    path end-to-end."""
    out = bytearray(b"GIF89a")
    # logical screen: global color table, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))  # grayscale GCT
    for f in range(n_frames):
        out += b"\x21\xF9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        packed = 0
        if interlace:
            packed |= 0x40
        if local_rot is not None:
            packed |= 0x87  # LCT present, 256 entries
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, packed)
        if local_rot is not None:
            out += bytes(
                v
                for j in range(256)
                for v in ((j + local_rot) % 256,) * 3
            )
        out.append(8)  # LZW minimum code size
        rows = [
            bytes(gif_pixel(f, x, y) for x in range(w)) for y in range(h)
        ]
        if local_rot is not None:
            rows = [
                bytes((px - local_rot) % 256 for px in row) for row in rows
            ]
        if interlace:
            rows = [rows[r] for r in interlace_row_order(h)]
        comp = _lzw_encode(b"".join(rows), 8)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # image data terminator
    out += b"\x3B"  # trailer
    return bytes(out)


def _u8(payload: bytes, pos: int) -> int:
    """One bounds-checked byte: truncated input is a data error
    (``ValueError``), not an ``IndexError`` programming error — direct
    callers (tests, future operators) get a consistent exception type
    while ``decode_media``'s lenient wrapper behaves as before."""
    if pos >= len(payload):
        raise ValueError("truncated GIF")
    return payload[pos]


def _skip_subblocks(payload: bytes, pos: int) -> int:
    """Advance past a chain of length-prefixed data sub-blocks
    (bounds-checked); returns the position after the 0 terminator."""
    while True:
        size = _u8(payload, pos)
        pos += 1
        if size == 0:
            return pos
        if pos + size > len(payload):
            raise ValueError("truncated GIF")
        pos += size


def count_gif_frames(payload: bytes) -> int:
    """Header-level frame count: walk the block structure (skipping data
    sub-blocks by their length prefixes) and count image descriptors —
    no LZW decode, O(#blocks) not O(#pixels). Used by
    ``multimodal.decode_media`` to fill ``n_frames`` for GIFs as cheaply
    as the WAV header path does for audio. Truncated input raises
    ``ValueError('truncated GIF')`` — including input that runs out
    BEFORE the 0x3B trailer (a partial count would read as valid)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = _u8(payload, 10)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 ** ((packed & 0x07) + 1))
    n = 0
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:
            return n
        if b0 == 0x21:
            pos = _skip_subblocks(payload, pos + 1)  # +1 skips the label
        elif b0 == 0x2C:
            ip = _u8(payload, pos + 8)
            pos += 9
            if ip & 0x80:
                pos += 3 * (2 ** ((ip & 0x07) + 1))
            pos = _skip_subblocks(payload, pos + 1)  # +1 skips min code size
            n += 1
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("truncated GIF")  # ran out before the 0x3B trailer


def decode_gif(payload: bytes) -> dict:
    """Parse a GIF87a/89a payload: header, global/local color tables,
    extension blocks (Graphic Control delay kept, others skipped), one
    LZW-decoded index frame per image block. Interlaced frames
    (flag 0x40) are de-interlaced via the §20 4-pass row permutation;
    a frame's local color table, when present, is kept per-frame.

    Returns ``{"width", "height", "n_frames", "frames", "delays_cs",
    "palette", "frame_palettes"}`` where each frame is ``bytes`` of
    palette indices in row-major TOP-DOWN order (post-deinterlace) and
    ``frame_palettes[f]`` is the frame's local color table or ``None``
    (→ use the global ``palette``). Truncated input raises
    ``ValueError('truncated GIF')``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[bytes] = []
    delays: list[int] = []
    palettes: list[bytes | None] = []
    pending_delay = 0
    saw_trailer = False
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            saw_trailer = True
            break
        if b0 == 0x21:  # extension block
            label = _u8(payload, pos)
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = _u8(payload, pos)
                if size < 3:  # delay lives in bytes 1:3 (spec size: 4)
                    raise ValueError("malformed GCE")
                if pos + 1 + size > len(payload):
                    raise ValueError("truncated GIF")
                block = payload[pos + 1 : pos + 1 + size]
                pending_delay = struct.unpack("<H", block[1:3])[0]
                pos += 1 + size
                if _u8(payload, pos) != 0:
                    raise ValueError("unterminated GCE")
                pos += 1
            else:  # comment/plain-text/application: skip sub-blocks
                pos = _skip_subblocks(payload, pos)
        elif b0 == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF")
            _l, _t, fw, fh, ip = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            lct = None
            if ip & 0x80:  # local color table overrides the GCT
                n = 2 ** ((ip & 0x07) + 1)
                if pos + 3 * n > len(payload):
                    raise ValueError("truncated GIF")
                lct = payload[pos : pos + 3 * n]
                pos += 3 * n
            mcs = _u8(payload, pos)
            pos += 1
            data = bytearray()
            while True:
                size = _u8(payload, pos)
                pos += 1
                if size == 0:
                    break
                if pos + size > len(payload):
                    raise ValueError("truncated GIF")
                data += payload[pos : pos + size]
                pos += size
            idx = _lzw_decode(bytes(data), mcs)
            if len(idx) < fw * fh:
                raise ValueError("short GIF frame")
            idx = idx[: fw * fh]
            if ip & 0x40:  # interlaced: un-permute rows (GIF89a §20)
                idx = _deinterlace(idx, fw, fh)
            frames.append(idx)
            palettes.append(lct)
            delays.append(pending_delay)
            # a GCE governs only the single block that follows it
            # (GIF89a §23): frames without their own GCE get delay 0,
            # not the previous frame's
            pending_delay = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    if not saw_trailer:
        raise ValueError("truncated GIF")  # partial frames are not a GIF
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "frames": frames,
        "delays_cs": delays,
        "palette": gct,
        "frame_palettes": palettes,
    }


def frame_gray(decoded: dict, f: int) -> bytes:
    """Frame ``f``'s DISPLAYED gray levels: map each palette index
    through the frame's applicable color table (local if present, else
    global) and take the red channel — the fixtures' palettes are
    grayscale, so red == luma. This is what makes the keyframe
    fingerprint palette-aware: two frames with different index bytes
    but the same displayed image (e.g. a rotated local palette)
    fingerprint identically."""
    pal = decoded["frame_palettes"][f] or decoded["palette"]
    if pal is None:
        raise ValueError("GIF frame has no color table")
    frame = decoded["frames"][f]
    if frame and 3 * max(frame) >= len(pal):
        # a pixel indexes past the color table: data error, same
        # ValueError contract as the decoder (not an IndexError)
        raise ValueError("GIF palette index out of range")
    return bytes(pal[3 * i] for i in frame)


# ---------------------------------------------------------------------------
# the registered operator
# ---------------------------------------------------------------------------


def keyframe_sums(decoded: dict) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(offsets, per-frame pixel sums) for the 8 evenly spaced keyframes
    of a DECODED gif — THE one copy of the sampling rule, shared by
    ``d5_gif_frames``, ``d5_gif_keyframe_dedup``, and the streaming
    signature UDF so the dedup fingerprint can never drift from the
    sampled frames. Sums are of DISPLAYED gray levels (indices mapped
    through the applicable color table, :func:`frame_gray`), so two
    encodings of the same image — interlaced or not, global or rotated
    local palette — fingerprint identically; with the fixtures'
    identity grayscale GCT this equals the raw index sum, keeping the
    DuckDB oracle's first-principles formula unchanged."""
    n = decoded["n_frames"]
    offsets = tuple(i * n // 8 for i in range(min(n, 8)))
    return offsets, tuple(sum(frame_gray(decoded, off)) for off in offsets)


@functools.lru_cache(maxsize=64)
def _keyframe_sums(n: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """:func:`keyframe_sums` of the ``n``-frame FIXTURE gif. Cached:
    only 40 distinct ``n`` values exist (``1 + n_chars % 40``), so each
    executor worker decodes 40 GIFs total instead of one per document —
    the decode is a REAL encode+LZW round trip, kept honest by the
    cache rather than by skipping it."""
    return keyframe_sums(decode_gif(make_patterned_gif(n)))


def gif_signature_udf():
    """Arrow-batched UDF: animated-GIF payload bytes → md5 keyframe
    signature, the ``hash_expr`` plug for the durable incremental dedup
    index (``streaming.exact_dedup_batch``) — the video-dedup analog of
    ``multimodal.ahash_udf``. Decodes the REAL payload (no fixture
    shortcut), so it works on any GIF the decoder accepts; equals the
    batch ``d5_gif_keyframe_dedup`` fingerprint by construction (same
    :func:`keyframe_sums`, same md5-of-joined-sums string).

    A corrupt/truncated payload maps to NULL instead of raising: a
    deterministic decode error would otherwise fail the same
    micro-batch on every retry — a poison pill for the streaming dedup
    query. Callers filter/dead-letter the NULLs (same contract as
    ``decode_media``'s lenient wrapper)."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _sig(payloads: pd.Series) -> pd.Series:
        def one(b):
            try:
                _, sums = keyframe_sums(decode_gif(bytes(b)))
            except Exception:
                # corrupt payload → dead-letter, not a wedge. Decode
                # errors are normalized to ValueError, but THIS catch
                # must be total: any corruption class that slipped the
                # normalization would otherwise fail the micro-batch
                # deterministically on every retry — a poison pill
                return None
            return hashlib.md5(
                ",".join(str(s) for s in sums).encode()
            ).hexdigest()

        return payloads.map(one)

    return _sig


@query(
    "d5_gif_frames",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, 1 + n_chars % 40 AS n FROM documents
      WHERE n_chars >= 0)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_frames,
           list_transform(range(0, LEAST(n, 8)),
                          i -> CAST(i * n // 8 AS BIGINT)) AS offsets,
           list_transform(range(0, LEAST(n, 8)),
                          i -> CAST(list_sum(list_transform(range(0, {GIF_W * GIF_H}),
                               p -> (i * n // 8 * 31 + (p % {GIF_W}) * 7
                                     + p // {GIF_W}) % 251)) AS BIGINT))
             AS frame_sums
    FROM t
    """,
)
def d5_gif_frames(spark: SparkSession, sf: str) -> DataFrame:
    """D5: frame sampling on a multi-frame VISUAL medium — decode an
    animated GIF (stdlib-only LZW, :func:`decode_gif`), take 8 evenly
    spaced keyframes, and emit each sampled frame's exact pixel sum.
    The fixture writes pixel ``(f,x,y) = (f*31 + x*7 + y) % 251``, so
    the oracle recomputes every sampled sum from first principles — a
    frame-indexing, LZW, or palette bug breaks the hash. Same
    mapInPandas plumbing as ``d5_frame_sample`` (WAV): for codec-bound
    video, swap :func:`decode_gif` for a codec-backed reader.

    Every 8th doc takes the PAYLOAD leg: the GIF bytes flow through a
    real ``binary`` column (pandas-UDF encode stage → mapInPandas
    decode stage), so a payload-side corruption breaks THIS oracle,
    not just the streaming ``gif_signature_udf``. The remaining docs
    use the per-``n`` decode cache (``_keyframe_sums`` — same
    encode→LZW→decode round trip, run once per distinct frame count).
    Both legs are narrow map stages; the union adds no shuffle.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    out_schema = (
        "doc_id long, n_frames long, offsets array<long>,"
        " frame_sums array<long>"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, offs, sums = [], [], [], []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                n = 1 + int(nc) % 40
                o, s = _keyframe_sums(n)
                ids.append(int(did))
                nfr.append(n)
                offs.append(list(o))
                sums.append(list(s))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfr,
                    "offsets": offs,
                    "frame_sums": sums,
                }
            )

    @pandas_udf("binary")
    def encode(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        def one(did, nc):
            # rotate the sampled docs through the three wire layouts —
            # progressive, interlaced, rotated-local-palette — so the
            # batch oracle exercises deinterlacing and LCT resolution
            # on REAL payload bytes (decoded frames are identical by
            # the codec round-trip tests, so the oracle is unchanged)
            k = int(did) // 8
            return make_patterned_gif(
                1 + int(nc) % 40,
                interlace=(k % 3 == 1),
                local_rot=77 if k % 3 == 2 else None,
            )

        return pd.Series(
            [one(d, n) for d, n in zip(doc_id, n_chars)]
        )

    def sample_payload(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, offs, sums = [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                g = decode_gif(bytes(payload))
                o, s = keyframe_sums(g)
                ids.append(int(did))
                nfr.append(g["n_frames"])
                offs.append(list(o))
                sums.append(list(s))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfr,
                    "offsets": offs,
                    "frame_sums": sums,
                }
            )

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus); the oracle carries the same WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    sampled = F.col("doc_id") % 8 == 0
    via_payload = (
        d.filter(sampled)
        .withColumn("payload", encode("doc_id", "n_chars"))
        .drop("n_chars")
        .mapInPandas(sample_payload, out_schema)
    )
    via_cache = d.filter(~sampled).mapInPandas(sample, out_schema)
    return via_payload.unionByName(via_cache)


@query(
    "d5_gif_keyframe_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, 1 + n_chars % 40 AS n FROM documents
      WHERE n_chars >= 0),
    f AS (
      SELECT doc_id,
             md5(array_to_string(list_transform(range(0, LEAST(n, 8)),
                 i -> CAST(list_sum(list_transform(range(0, {GIF_W * GIF_H}),
                      p -> (i * n // 8 * 31 + (p % {GIF_W}) * 7
                            + p // {GIF_W}) % 251)) AS BIGINT)), ',')) AS fp
      FROM t)
    SELECT fp AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           MIN(doc_id) AS keeper_id
    FROM f GROUP BY fp
    """,
)
def d5_gif_keyframe_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D5×D2: VIDEO-dedup analog on the multi-frame visual medium — a
    keyframe signature (md5 over the 8 sampled frames' decoded pixel
    sums) groups perceptually-identical animations; one shuffle on the
    16-byte fingerprint, min-id keeper per group. Two GIFs share a
    fingerprint iff their sampled keyframe CONTENT matches (the fixture
    makes that exactly the ``1 + n_chars % 40`` frame-count classes, so
    the oracle recomputes every group from first principles). For real
    video, swap :func:`decode_gif` for a codec-backed keyframe reader
    and the per-frame sum for the aHash already used by
    ``d5_image_phash_dedup`` — the Spark shape (mapInPandas fingerprint
    → groupBy) is identical.
    """
    from pyspark.sql import functions as F

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                n = 1 + int(nc) % 40
                _, sums = _keyframe_sums(n)
                ids.append(int(did))
                fps.append(",".join(str(s) for s in sums))
            yield pd.DataFrame({"doc_id": ids, "sig": fps})

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus); the oracle carries the same WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    sigs = d.mapInPandas(fingerprint, "doc_id long, sig string")
    return (
        sigs.select("doc_id", F.md5("sig").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
        )
    )
