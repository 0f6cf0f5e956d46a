#!/usr/bin/env python3
"""Generate FOREIGN-byte codec conformance fixtures.

Every decoder in graft.ops otherwise only sees bytes its own Scala
encoder produced (no PIL/libjpeg/flac binaries exist in this
container).  This script closes that self-consistency loophole for the
formats an INDEPENDENT implementation exists for in the CPython
standard library:

  - PNG        — a from-scratch pure-python chunk writer over CPython's
                 bundled zlib (a different DEFLATE implementation from
                 the JDK one the Scala codec inflates with), covering
                 gray / truecolor / palette / 16-bit and row filters
                 None + Sub.
  - WAV PCM    — the stdlib `wave` module's own RIFF writer.
  - G.711      — `audioop.lin2ulaw` / `lin2alaw`: CPython's C
                 companding tables, wrapped in a hand-built fmt-tag-6/7
                 RIFF container.  The Scala decoder must invert them
                 byte-exactly (G.711 is a fixed published table).

All content derives from the documented deterministic signal/pixel
formulas below, so R18ConformanceSpec recomputes the expected values
in Scala — no expectation files needed.  Run once; outputs are
committed under tools/fixtures/codec/.
"""
import os
import struct
import sys
import wave
import zlib

try:
    import audioop  # removed in 3.13; present here
except ImportError:
    audioop = None
try:
    import aifc
    import sunau  # both removed in 3.13; present here
except ImportError:
    aifc = sunau = None

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "codec")


# ---- deterministic content formulas (mirrored in R18ConformanceSpec) ----

def pixel(x, y):
    """8-bit gray value at (x, y) — documented fixture formula."""
    return (x * 37 + y * 61 + 23) % 256


def sample(i):
    """16-bit PCM sample i — documented fixture formula."""
    return ((i * 2731 + 809) % 32003) - 16001


# ---- pure-python PNG writer (independent of the Scala encoder) ----------

def png_chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def write_png(path, w, h, color_type, depth=8, row_filter=0, palette=None):
    if color_type == 0:
        bpp = depth // 8
        def row_bytes(y):
            out = bytearray()
            for x in range(w):
                v = pixel(x, y)
                if depth == 8:
                    out.append(v)
                else:  # high byte = value, low byte deliberately different
                    out += bytes((v, (v * 131 + 17) % 256))
            return bytes(out)
    elif color_type == 2:
        bpp = 3 * depth // 8
        def row_bytes(y):
            out = bytearray()
            for x in range(w):
                v = pixel(x, y)
                trip = (v, (v * 3) % 256, (v * 7) % 256)
                for c in trip:
                    if depth == 8:
                        out.append(c)
                    else:
                        out += bytes((c, (c * 131 + 17) % 256))
            return bytes(out)
    else:  # palette: index = pixel, table = inverted gray
        bpp = 1
        def row_bytes(y):
            return bytes(pixel(x, y) for x in range(w))
    raw = bytearray()
    prev = b"\x00" * (w * bpp)
    for y in range(h):
        r = row_bytes(y)
        if row_filter == 0:
            raw.append(0)
            raw += r
        else:  # Sub: cur - left (byte distance bpp)
            raw.append(1)
            raw += bytes((r[i] - (r[i - bpp] if i >= bpp else 0)) % 256
                         for i in range(len(r)))
        prev = r
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    body = png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        tbl = bytearray()
        for i in range(256):
            g = 255 - i
            tbl += bytes((g, g, g))
        body += png_chunk(b"PLTE", bytes(tbl))
    body += png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
    body += png_chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + body)


# ---- WAV writers ---------------------------------------------------------

def write_wav_pcm(path, n):
    pcm = b"".join(struct.pack("<h", sample(i)) for i in range(n))
    w = wave.open(path, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(pcm)
    w.close()


def write_wav_g711(path, n, law):
    """fmt tag 7 (ulaw) / 6 (alaw) RIFF wrapping audioop-companded
    bytes — the container is hand-built (18-byte fmt with cbSize 0,
    the compressed-format convention) + a fact chunk."""
    pcm = b"".join(struct.pack("<h", sample(i)) for i in range(n))
    if law == "ulaw":
        data, tag = audioop.lin2ulaw(pcm, 2), 7
    else:
        data, tag = audioop.lin2alaw(pcm, 2), 6
    fmt = struct.pack("<HHIIHHH", tag, 1, 16000, 16000, 1, 8, 0)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"fact" + struct.pack("<II", 4, n) +
            b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        body += b"\x00"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def write_aiff(path, n):
    """stdlib aifc writer: big-endian PCM + the 80-bit extended rate."""
    pcm = b"".join(struct.pack(">h", sample(i)) for i in range(n))
    f = aifc.open(path, "wb")
    f.setnchannels(1)
    f.setsampwidth(2)
    f.setframerate(16000)
    f.writeframes(pcm)
    f.close()


def write_au(path, n, ulaw):
    """stdlib sunau writer: .snd header + BE PCM or companded bytes."""
    f = sunau.open(path, "wb")
    f.setnchannels(1)
    f.setframerate(16000)
    if ulaw:
        f.setsampwidth(1)
        f.setcomptype("ULAW", "")  # str, not bytes, in this stdlib
        pcm = b"".join(struct.pack("<h", sample(i)) for i in range(n))
        f.writeframes(audioop.lin2ulaw(pcm, 2))
    else:
        f.setsampwidth(2)
        f.setcomptype("NONE", "")  # sunau DEFAULTS to ULAW
        pcm = b"".join(struct.pack(">h", sample(i)) for i in range(n))
        f.writeframesraw(pcm)
    f.close()


def main():
    os.makedirs(OUT, exist_ok=True)
    write_png(os.path.join(OUT, "gray8.png"), 13, 9, 0)
    write_png(os.path.join(OUT, "color8_sub.png"), 11, 7, 2, row_filter=1)
    write_png(os.path.join(OUT, "palette_inv.png"), 10, 6, 3)
    write_png(os.path.join(OUT, "gray16.png"), 9, 8, 0, depth=16)
    write_png(os.path.join(OUT, "color16_sub.png"), 8, 5, 2, depth=16,
              row_filter=1)
    write_wav_pcm(os.path.join(OUT, "pcm16.wav"), 300)
    if audioop is not None:
        write_wav_g711(os.path.join(OUT, "g711_ulaw.wav"), 257, "ulaw")
        write_wav_g711(os.path.join(OUT, "g711_alaw.wav"), 257, "alaw")
        # the full G.711 decode tables, one code byte each 0..255:
        # Scala must invert CPython's C tables value-for-value
        with open(os.path.join(OUT, "ulaw_table.bin"), "wb") as f:
            f.write(audioop.ulaw2lin(bytes(range(256)), 2))
        with open(os.path.join(OUT, "alaw_table.bin"), "wb") as f:
            f.write(audioop.alaw2lin(bytes(range(256)), 2))
    if aifc is not None:
        write_aiff(os.path.join(OUT, "pcm16.aiff"), 260)
    if sunau is not None:
        write_au(os.path.join(OUT, "pcm16.au"), 250, ulaw=False)
        if audioop is not None:
            write_au(os.path.join(OUT, "ulaw.au"), 255, ulaw=True)
    print("fixtures written to", OUT)


if __name__ == "__main__":
    sys.exit(main())
