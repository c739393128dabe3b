"""Minimal REAL animated-GIF codec (stdlib + numpy only) — the video branch.

No video codec library exists in this container, so the "video" media type
uses the one motion format that is fully implementable from scratch: GIF89a.
This is a REAL byte-level codec, not a stub:

- ``encode_gif``: logical screen descriptor, global color table, per-frame
  Graphic Control Extensions (frame delays) + image descriptors, and a
  spec-true GIF-LZW compressor (variable code width 3..12 bits, LSB-first
  packing, 255-byte sub-blocks, table reset at 4096 codes).
- ``decode_gif``: parses the container (header, LSD, GCT, extension blocks,
  image descriptors with optional local color tables), runs a full LZW
  decoder, applies the palette, and returns per-frame RGB numpy arrays with
  cumulative timestamps.

External validity: the canonical 35-byte single-pixel GIF from the spec
documentation decodes correctly (pinned in tests/test_gif_video.py), and
encode->decode roundtrips are pixel-exact across randomized frames.
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    pass


# ------------------------------------------------------------------- LZW ---


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for b in indices:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        table[nxt] = next_code
        # the encoder widens as soon as the next code to ASSIGN would not
        # fit — mirrored by the decoder's len(table)-based check
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    # spec range is 2..8 (image bit depth); a corrupted byte here must fail
    # TYPED — 1 << mcs past 8 would build an invalid >256-entry base table
    if not 1 <= min_code_size <= 8:
        raise GifError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8
    out = bytearray()

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return end  # truncated stream: treat as end of information
        byte_i = pos >> 3
        bit_i = pos & 7
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        pos += width
        return (chunk >> bit_i) & ((1 << width) - 1)

    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = list(base) + [b"", b""]  # placeholders for clear/end
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if not table:
                raise GifError("LZW data before clear code")
            if code >= len(table):
                raise GifError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise GifError("LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # widen when the NEXT code the encoder assigns would not fit
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


# -------------------------------------------------------------- container ---


def encode_gif(
    frames: "list[np.ndarray]",
    palette: "np.ndarray",
    delays_ms: "list[int] | None" = None,
) -> bytes:
    """Serialize index frames (uint8 HxW arrays into ``palette`` rows, shape
    (n,3) uint8, power-of-two length >= 2) as an animated GIF89a."""
    if not frames:
        raise GifError("no frames")
    n_colors = len(palette)
    if n_colors < 2 or n_colors & (n_colors - 1):
        raise GifError("palette length must be a power of two >= 2")
    depth = max(1, (n_colors - 1).bit_length())
    h, w = frames[0].shape
    delays_ms = delays_ms or [100] * len(frames)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1)])  # GCT present, 2^depth entries
    out += bytes([0, 0])  # background index, aspect
    out += palette.astype(np.uint8).tobytes()

    mcs = max(2, depth)
    for frame, delay in zip(frames, delays_ms):
        if frame.shape != (h, w):
            raise GifError("frame size mismatch")
        # Graphic Control Extension: frame delay in centiseconds
        out += bytes([0x21, 0xF9, 4, 0]) + (max(1, delay // 10)).to_bytes(
            2, "little"
        ) + bytes([0, 0])
        out += bytes([0x2C]) + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(
            2, "little"
        ) + bytes([0])  # no local color table, not interlaced
        out += bytes([mcs])
        lzw = _lzw_encode(frame.astype(np.uint8).tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])  # block terminator
    out += bytes([0x3B])  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Parse a GIF87a/89a: returns ``{"width", "height", "frames":
    [{"ts_ms", "delay_ms", "rgb": HxWx3 uint8}]}`` (full-frame replace
    semantics; frames composited onto the previous frame for sub-rectangle
    updates)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (missing GIF87a/GIF89a header)")
    if len(payload) < 14:
        raise GifError("truncated header")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(payload) < pos + 3 * n:
            raise GifError("truncated global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    frames: list[dict] = []
    delay_ms = 0
    ts_ms = 0
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[payload[11] % len(gct)]

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p]:
            p += 1 + payload[p]
        return p + 1

    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 2 >= len(payload):
                raise GifError("truncated extension block")
            label = payload[pos + 1]
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos + 2]
                delay_ms = int.from_bytes(
                    payload[pos + 4 : pos + 6], "little"
                ) * 10
                pos = skip_subblocks(pos + 2)
            else:  # comment / application / plain-text: skip
                pos = skip_subblocks(pos + 2)
            continue
        if block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise GifError("truncated image descriptor")
            left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
            top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                if len(payload) < pos + 3 * n:
                    raise GifError("truncated local color table")
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GifError("image without any color table")
            if iflags & 0x40:
                raise GifError("interlaced GIFs not supported")
            if pos >= len(payload):
                raise GifError("truncated before LZW data")
            mcs = payload[pos]
            pos += 1
            chunks = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                chunks += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # terminator
            idx = _lzw_decode(bytes(chunks), mcs)
            if len(idx) < iw * ih:
                raise GifError("LZW output shorter than frame")
            arr = np.frombuffer(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
            if int(arr.max(initial=0)) >= len(pal):
                raise GifError("pixel index outside color table")
            if top + ih > h or left + iw > w:
                raise GifError("frame rectangle outside logical screen")
            canvas = canvas.copy()
            canvas[top : top + ih, left : left + iw] = pal[arr]
            ts_ms += delay_ms
            frames.append(
                {"ts_ms": ts_ms, "delay_ms": delay_ms, "rgb": canvas}
            )
            delay_ms = 0
            continue
        raise GifError(f"unknown block 0x{block:02x} at {pos}")
    if not frames:
        raise GifError("no image frames")
    return {"width": w, "height": h, "frames": frames}


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def synth_gif(seed: int, w: int = 32, h: int = 24, n_frames: int = 6) -> bytes:
    """Deterministic animated test GIF: a moving gradient bar over a seeded
    16-color palette, ~100 ms per frame."""
    rng = np.random.RandomState(seed % (2**31))
    palette = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    frames = []
    xx = np.arange(w)[None, :]
    yy = np.arange(h)[:, None]
    for k in range(n_frames):
        f = ((xx + yy + 3 * k) // 4) % 16
        f[:, (5 * k) % w] = (k + 7) % 16  # moving vertical bar
        frames.append(f.astype(np.uint8))
    delays = [100 + 10 * (seed % 5)] * n_frames
    return encode_gif(frames, palette, delays)
