#!/usr/bin/env python3
"""Generate a directory of REAL media FILES for the ingestion tier.

The codec conformance fixtures (tools/fixtures/codec/) close the
self-consistency loophole per FORMAT; this directory closes it for the
INGESTION path: actual .png/.bmp/.gif/.wav/.y4m/.avi files on disk,
read through Spark's distributed `binaryFile` source
(graft.sources.MediaDirSource) and decoded pixel/sample-exactly by the
Scala codecs (R20MediaIngestSpec).  Every byte here is written by an
independent implementation — CPython's zlib DEFLATE for PNG, the
stdlib `wave` RIFF writer, and from-scratch pure-python writers for
BMP/GIF/Y4M/AVI (the GIF LZW stream uses the spec's CLEAR-code-reset
form: a clear before every literal keeps the code width fixed — a
shape no table-building encoder emits, so a decoder that mishandles
mid-stream clears cannot pass).

Content follows the documented formulas below; the Scala spec
recomputes expectations — no expectation files.  Run once; outputs are
committed under tools/fixtures/media/.  Also writes media.parquet via
tools/media_dir_to_parquet.py so the driver-side converter's output is
itself a committed, spec-checked artifact.
"""
import os
import struct
import subprocess
import sys
import wave
import zlib

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "media")


# ---- deterministic content formulas (mirrored in R20MediaIngestSpec) ----

def pixel(x, y):
    """8-bit gray value at (x, y) — the codec-fixture formula."""
    return (x * 37 + y * 61 + 23) % 256


def fpixel(f, x, y):
    """frame f's gray value — the video formula (shifted per frame)."""
    return (x * 37 + y * 61 + 23 + 11 * f) % 256


def sample(i):
    """16-bit PCM sample i — the codec-fixture formula."""
    return ((i * 2731 + 809) % 32003) - 16001


# ---- PNG (CPython zlib DEFLATE — foreign to the JDK inflater) -----------

def png_chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def write_png(path, w, h):
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter None
        for x in range(w):
            raw.append(pixel(x, y))
    body = (png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + png_chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + body)


# ---- BMP (bottom-up 24-bit, 4-byte padded rows) --------------------------

def write_bmp(path, w, h):
    row = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        r = bytearray()
        for x in range(w):
            v = pixel(x, y)
            r += bytes((v, v, v))  # BGR, gray
        r += b"\x00" * (row - len(r))
        data += r
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) +
           struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0))
    with open(path, "wb") as f:
        f.write(hdr + data)


# ---- GIF87a (from-scratch LZW: CLEAR before every literal) ---------------

def write_gif(path, w, h):
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes((0xF7, 0, 0))  # global palette, 8-bit, 256 entries
    for i in range(256):
        out += bytes((i, i, i))  # grayscale palette: index == value
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes((8,))  # LZW min code size
    # code stream: CLEAR lit CLEAR lit ... END, all 9-bit (the table
    # never grows because every literal is preceded by a reset)
    clear, end = 256, 257
    codes = []
    for y in range(h):
        for x in range(w):
            codes.append(clear)
            codes.append(pixel(x, y))
    codes.append(end)
    acc = 0
    nbits = 0
    packed = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    for i in range(0, len(packed), 255):
        blk = packed[i:i + 255]
        out += bytes((len(blk),)) + blk
    out += b"\x00\x3b"  # block terminator + trailer
    with open(path, "wb") as f:
        f.write(out)


# ---- WAV (stdlib wave writer) --------------------------------------------

def write_wav(path, n=240, rate=8000):
    wv = wave.open(path, "wb")
    wv.setnchannels(1)
    wv.setsampwidth(2)
    wv.setframerate(rate)
    wv.writeframes(b"".join(struct.pack("<h", sample(i)) for i in range(n)))
    wv.close()


# ---- Y4M (raw planes; C420 with junk chroma the decoder must walk) -------

def write_y4m(path, w, h, frames):
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n"
                    .encode("ascii"))
    for f in range(frames):
        out += b"FRAME\n"
        for y in range(h):
            for x in range(w):
                out.append(fpixel(f, x, y))
        # chroma planes: arbitrary bytes (the decoder walks, never reads)
        out += bytes(((x * 3 + f) % 256) for x in range(2 * (w // 2) * (h // 2)))
    with open(path, "wb") as f_:
        f_.write(out)


# ---- AVI (DIB frames, rec-grouped movi + JUNK padding: the real-muxer
#      grammar, written independently of the Scala encoder) ---------------

def write_avi(path, w, h, frames, fps=25):
    row = (w * 3 + 3) & ~3

    def frame_bytes(f):
        data = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up BGR
            r = bytearray()
            for x in range(w):
                v = fpixel(f, x, y)
                r += bytes((v, v, v))
            r += b"\x00" * (row - len(r))
            data += r
        return bytes(data)

    fbs = [frame_bytes(f) for f in range(frames)]

    def chunk(tag, payload):
        out = tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            out += b"\x00"
        return out

    def lst(tag, payload):
        return chunk(b"LIST", tag + payload)

    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIiIIII", 0, 0, 0, 0,
            1, fps, 0, len(fbs), max(len(b) for b in fbs), 0, 0) +
            struct.pack("<HHHH", 0, 0, w, h))
    avih = struct.pack("<IIIIIIIIIIIIII", 1000000 // fps, 0, 0, 0,
                       len(fbs), 0, 1, max(len(b) for b in fbs), w, h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    # movi: frames grouped two per 'rec ' list, each preceded by JUNK
    movi_body = b""
    for i in range(0, len(fbs), 2):
        grp = b""
        for fb in fbs[i:i + 2]:
            grp += chunk(b"JUNK", b"\x00" * 4) + chunk(b"00db", fb)
        movi_body += lst(b"rec ", grp)
    movi = lst(b"movi", movi_body)
    riff = b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + \
        b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(riff)


def main():
    os.makedirs(OUT, exist_ok=True)
    write_png(os.path.join(OUT, "gray.png"), 13, 9)
    write_bmp(os.path.join(OUT, "gray.bmp"), 10, 6)
    write_gif(os.path.join(OUT, "gray.gif"), 9, 7)
    write_wav(os.path.join(OUT, "tone.wav"))
    write_y4m(os.path.join(OUT, "clip.y4m"), 8, 8, 3)
    write_avi(os.path.join(OUT, "clip.avi"), 8, 8, 3)
    # filename EDGE-RULE fixtures (R20MediaIngestSpec): hidden-prefix
    # names are staging conventions (Spark's FileIndex hidden-file
    # rule, mirrored by the converter) and a dotless name has no
    # extension — BOTH ingest paths must drop all three, so they are
    # planted BEFORE the converter runs and the committed media.parquet
    # proves the Python side drops them too.
    for name, blurb in (("_staged.png", b"not landed yet"),
                        (".sync.wav", b"sync sidecar"),
                        ("png", b"dotless sidecar")):
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(blurb)
    # the driver-side converter's output is itself a committed artifact
    subprocess.check_call([sys.executable,
                           os.path.join(os.path.dirname(__file__),
                                        "media_dir_to_parquet.py"),
                           OUT, os.path.join(OUT, "media.parquet")])
    for n in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, n)
        if os.path.isfile(p):
            print(f"{n}: {os.path.getsize(p)} bytes")


if __name__ == "__main__":
    main()
