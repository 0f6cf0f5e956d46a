#!/usr/bin/env python3
"""Minimal pure-Python read-only HDF5 parser with an h5py-shaped surface.

``h5ad_to_parquet.py`` falls back to this module when ``h5py`` is not
installed, so the REAL ``.h5ad`` branch (HDF5 groups/datasets/attributes,
not the --selftest synthesizer) is exercisable — and tested against the
committed ``tools/fixtures/*.h5ad`` binaries — in environments without
libhdf5.

Supported subset (the layout libhdf5 emits for an uncompressed
``anndata.write_h5ad`` with default/earliest settings, and what
``gen_h5ad_fixture.py`` writes):

  - superblock version 0, 8-byte offsets/lengths
  - old-style groups: v1 object headers + symbol-table message
    (v1 B-tree over SNOD symbol nodes + local heap), any nesting depth
  - datasets: contiguous layout AND chunked layout (v1 chunk B-tree)
    with no filter, the deflate filter, or shuffle+deflate (what
    ``anndata.write_h5ad(compression="gzip")`` produces), little-endian
    int8..64 / uint / float32 / float64 / fixed-size strings, 0-2
    dimensional, including partial edge chunks
  - attributes (v1 messages): scalar + 1-D, same datatypes, plus
    variable-length strings resolved through global heap collections
  - symbol-table entries with cached (cache_type 1) or uncached group
    metadata

  - filters: deflate (id 1), byte-shuffle (id 2), LZF (id 32000,
    h5py's no-dependency default alternative; decompressor written from
    the public LZF format description in liblzf's lzf.h), and szip
    (id 4, CCSDS 121.0-B extended-Rice coding — see the profile notes
    at szip_decompress; REAL-archive interop is untested because no
    foreign szip encoder exists in this environment)

NOT supported (fail loudly):
v2+ object headers, fractal-heap "new style" groups, big-endian data.

Everything here is implemented from the public HDF5 File Format
Specification (v1.x, hdfgroup.org); no HDF5 code was consulted.
"""
import math
import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
SIG = b"\x89HDF\r\n\x1a\n"


class Mini5Error(RuntimeError):
    pass


class Dataset:
    """Read-only dataset: ``d[...]`` / ``d[a:b]`` return numpy arrays."""

    def __init__(self, arr, attrs):
        self._arr = arr
        self.attrs = attrs

    def __getitem__(self, key):
        return self._arr[key]

    @property
    def shape(self):
        return self._arr.shape

    @property
    def dtype(self):
        return self._arr.dtype


class Group:
    def __init__(self, links, attrs):
        self._links = links
        self.attrs = attrs

    def keys(self):
        return self._links.keys()

    def __contains__(self, name):
        return name in self._links

    def __getitem__(self, name):
        cur = self
        for part in name.split("/"):
            if part == "":
                continue
            cur = cur._links[part]
        return cur


class File(Group):
    def __init__(self, path, mode="r"):
        if mode != "r":
            raise Mini5Error("minih5 is read-only")
        with open(path, "rb") as fh:
            self._buf = fh.read()
        if self._buf[:8] != SIG:
            raise Mini5Error(f"{path}: not an HDF5 file")
        ver = self._buf[8]
        if ver != 0:
            raise Mini5Error(f"{path}: superblock v{ver}; only v0 supported")
        if self._buf[13] != 8 or self._buf[14] != 8:
            raise Mini5Error("only 8-byte offsets/lengths supported")
        # root symbol-table entry sits at offset 24+32 = 56 in a v0
        # superblock: 24 fixed bytes then base/freespace/eof/driver
        root_oh = struct.unpack_from("<Q", self._buf, 56 + 8)[0]
        root = _read_object(self._buf, root_oh)
        super().__init__(root._links, root.attrs)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass


# ---- low-level parsing ---------------------------------------------------

def _u(buf, off, n):
    return int.from_bytes(buf[off:off + n], "little")


def _parse_datatype(buf, off):
    """Returns (numpy dtype or ('vlen-str',) marker, byte size)."""
    cls = buf[off] & 0x0F
    version = buf[off] >> 4
    if version not in (1, 2, 3):
        raise Mini5Error(f"datatype version {version} unsupported")
    bits0 = buf[off + 1]
    size = _u(buf, off + 4, 4)
    if cls == 0:  # fixed-point
        if bits0 & 0x01:
            raise Mini5Error("big-endian integers unsupported")
        signed = bool(bits0 & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}"), size
    if cls == 1:  # float
        if bits0 & 0x01:
            raise Mini5Error("big-endian floats unsupported")
        if size not in (4, 8):
            raise Mini5Error(f"float{size * 8} unsupported")
        return np.dtype(f"<f{size}"), size
    if cls == 3:  # fixed-size string
        return np.dtype(f"S{size}"), size
    if cls == 9:  # variable-length
        base_cls = buf[off + 8] & 0x0F
        if (bits0 & 0x0F) == 1 and base_cls == 3:  # vlen string
            return ("vlen-str",), size
        raise Mini5Error("only vlen STRINGS supported")
    raise Mini5Error(f"datatype class {cls} unsupported")


def _parse_dataspace(buf, off):
    version = buf[off]
    if version == 1:
        rank = buf[off + 1]
        dims_off = off + 8
    elif version == 2:
        rank = buf[off + 1]
        dims_off = off + 4
    else:
        raise Mini5Error(f"dataspace version {version} unsupported")
    return [_u(buf, dims_off + 8 * i, 8) for i in range(rank)]


def _global_heap_str(buf, addr, index):
    if buf[addr:addr + 4] != b"GCOL":
        raise Mini5Error("bad global heap signature")
    end = addr + _u(buf, addr + 8, 8)
    off = addr + 16
    while off < end:
        idx = _u(buf, off, 2)
        osize = _u(buf, off + 8, 8)
        if idx == 0:  # free space marker terminates the collection
            break
        if idx == index:
            return buf[off + 16:off + 16 + osize]
        off += 16 + (osize + 7) // 8 * 8
    raise Mini5Error(f"global heap object {index} not found")


def _attr_value(buf, data_off, dtype, dims):
    n = int(np.prod(dims)) if dims else 1
    if dtype == ("vlen-str",):
        # per element: length(4) + gcol address(8) + object index(4)
        vals = []
        for i in range(n):
            o = data_off + 16 * i
            length = _u(buf, o, 4)
            gaddr = _u(buf, o + 4, 8)
            gidx = _u(buf, o + 12, 4)
            vals.append(_global_heap_str(buf, gaddr, gidx)[:length])
        return vals if dims else vals[0]
    arr = np.frombuffer(buf, dtype=dtype, count=n, offset=data_off)
    if not dims:
        v = arr[0]
        return bytes(v) if dtype.kind == "S" else v
    return arr.reshape(dims)


def _parse_attribute(buf, off):
    version = buf[off]
    if version != 1:
        raise Mini5Error(f"attribute message v{version} unsupported")
    name_size = _u(buf, off + 2, 2)
    dt_size = _u(buf, off + 4, 2)
    ds_size = _u(buf, off + 6, 2)
    p = off + 8
    name = buf[p:p + name_size].split(b"\x00")[0].decode()
    p += (name_size + 7) // 8 * 8
    dtype, _ = _parse_datatype(buf, p)
    p += (dt_size + 7) // 8 * 8
    dims = _parse_dataspace(buf, p)
    p += (ds_size + 7) // 8 * 8
    value = _attr_value(buf, p, dtype, dims)
    return name, value


def _local_heap(buf, addr):
    if buf[addr:addr + 4] != b"HEAP":
        raise Mini5Error("bad local heap signature")
    data_addr = _u(buf, addr + 24, 8)

    def name_at(offset):
        end = buf.index(b"\x00", data_addr + offset)
        return buf[data_addr + offset:end].decode()
    return name_at


def _btree_snod_entries(buf, btree_addr, heap_name):
    """Yield (name, object header addr) across a v1 group B-tree."""
    sig = buf[btree_addr:btree_addr + 4]
    if sig != b"TREE":
        raise Mini5Error("bad B-tree signature")
    node_type = buf[btree_addr + 4]
    level = buf[btree_addr + 5]
    n = _u(buf, btree_addr + 6, 2)
    if node_type != 0:
        raise Mini5Error("non-group B-tree node")
    # children sit between keys: key0 child0 key1 child1 ... keyN
    p = btree_addr + 24 + 8  # skip sig/type/level/entries/siblings + key0
    for _ in range(n):
        child = _u(buf, p, 8)
        p += 16  # child + next key
        if level > 0:
            yield from _btree_snod_entries(buf, child, heap_name)
            continue
        if buf[child:child + 4] != b"SNOD":
            raise Mini5Error("bad symbol node signature")
        nsym = _u(buf, child + 6, 2)
        for i in range(nsym):
            e = child + 8 + 40 * i
            name_off = _u(buf, e, 8)
            oh_addr = _u(buf, e + 8, 8)
            yield heap_name(name_off), oh_addr


def _chunk_btree_entries(buf, addr, rank):
    """Yield (offsets, stored_size, filter_mask, data_addr) across a v1
    CHUNK B-tree (node type 1)."""
    if buf[addr:addr + 4] != b"TREE":
        raise Mini5Error("bad chunk B-tree signature")
    if buf[addr + 4] != 1:
        raise Mini5Error("expected a raw-data (type 1) B-tree node")
    level = buf[addr + 5]
    n = _u(buf, addr + 6, 2)
    key_size = 8 + 8 * (rank + 1)  # size(4)+mask(4)+offsets
    p = addr + 24
    for _ in range(n):
        stored = _u(buf, p, 4)
        mask = _u(buf, p + 4, 4)
        offs = [_u(buf, p + 8 + 8 * d, 8) for d in range(rank)]
        child = _u(buf, p + key_size, 8)
        p += key_size + 8
        if level > 0:
            yield from _chunk_btree_entries(buf, child, rank)
        else:
            yield offs, stored, mask, child


def lzf_decompress(raw):
    """Decompress one LZF stream (Marc Lehmann's liblzf format, as used
    by h5py's filter id 32000).  Format, from the public lzf.h/lzf_c.c
    description: a control byte < 0x20 introduces a literal run of
    ctrl+1 bytes; otherwise the top 3 bits are the match length − 2
    (7 ⇒ one extension byte follows), and the low 5 bits are the high
    bits of the back-reference distance whose low byte follows.
    Back-references may overlap the output being built, so the copy is
    byte-sequential by construction."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        ctrl = raw[i]
        i += 1
        if ctrl < 0x20:               # literal run of ctrl+1 bytes
            j = i + ctrl + 1
            if j > n:
                raise Mini5Error("lzf: literal run past end of stream")
            out += raw[i:j]
            i = j
        else:                         # back-reference
            ln = ctrl >> 5
            if ln == 7:               # length extension byte
                ln += raw[i]
                i += 1
            ln += 2
            ref = len(out) - (((ctrl & 0x1F) << 8) | raw[i]) - 1
            i += 1
            if ref < 0:
                raise Mini5Error("lzf: back-reference before stream start")
            for _ in range(ln):      # may self-overlap: stay sequential
                out.append(out[ref])
                ref += 1
    return bytes(out)


# ---- szip (HDF5 filter id 4): CCSDS 121.0-B extended-Rice coding ------
#
# Implemented from the published CCSDS 121.0-B-2 standard (the
# "Adaptive Entropy Coder" szlib/libaec realize) plus HDF5's public
# filter contract (H5Zszip: a little-endian uint32 uncompressed byte
# count precedes the raw coded stream; client data = [options_mask,
# pixels_per_block, bits_per_pixel, pixels_per_scanline]).  Profile
# supported — the configuration HDF5 emits — and everything else fails
# loudly:
#
#   - RAW stream (no SZ header), EC or NN (unit-delay nearest-neighbor
#     preprocessor) coding, LSB (little-endian) or MSB sample bytes,
#     8/16/32-bit samples; CHIP mode rejected.
#   - scanlines of `pixels_per_scanline` samples; each scanline is an
#     independent prediction run (NN: its first sample is a raw
#     reference), blocks of `pixels_per_block` samples, the last block
#     of a scanline padded by replicating the final sample; zero-block
#     segments are 64 blocks aligned to the scanline start; the coded
#     stream is continuous (no per-scanline byte alignment).
#
# Option IDs (width 3/4/5 bits for 8/16/32-bit samples): all-zeros
# introduces the low-entropy pair — one more bit picks zero-block (0)
# or second-extension (1); all-ones is the uncompressed block; k+1
# otherwise selects split-sample k (unary fundamental-sequence MSB
# parts for the whole block, then k LSBs per sample).  The golden
# bitstreams in R20SzipSpec pin each option against hand-coded bytes
# derived from the standard's rules, and gen_h5ad_fixture.szip_compress
# is the round-trip twin.  NOTE: no foreign szip encoder exists in this
# environment, so real-archive interop is untested — the seam is
# documented, not silent.

_SZ_ALLOW_K13, _SZ_CHIP, _SZ_EC = 1, 2, 4
_SZ_LSB, _SZ_MSB, _SZ_NN, _SZ_RAW = 8, 16, 32, 128


class _BitsMSB:
    """MSB-first bit reader over bytes (the coded stream's bit order)."""

    def __init__(self, data):
        self.total = 8 * len(data)
        self.big = int.from_bytes(data, "big")
        self.pos = 0

    def get(self, n):
        if self.pos + n > self.total:
            raise Mini5Error("szip: coded stream overrun")
        self.pos += n
        return (self.big >> (self.total - self.pos)) & ((1 << n) - 1)

    def fs(self):
        """Fundamental-sequence (unary) value: count of 0s before a 1."""
        rest = self.big & ((1 << (self.total - self.pos)) - 1)
        if rest == 0:
            raise Mini5Error("szip: coded stream overrun in FS value")
        zeros = (self.total - self.pos) - rest.bit_length()
        self.pos += zeros + 1
        return zeros


def szip_decompress(raw, out_pixels, bpp, ppb, pps, options):
    """Decode `out_pixels` unsigned `bpp`-bit samples from a raw szip
    stream under the profile documented above."""
    if options & _SZ_CHIP:
        raise Mini5Error("szip: CHIP mode unsupported")
    if bool(options & _SZ_EC) == bool(options & _SZ_NN):
        raise Mini5Error("szip: exactly one of EC/NN must be set")
    if bpp not in (8, 16, 32):
        raise Mini5Error(f"szip: {bpp}-bit samples unsupported (8/16/32)")
    if ppb < 2 or pps < ppb:
        raise Mini5Error(f"szip: bad block/scanline geometry {ppb}/{pps}")
    pre = bool(options & _SZ_NN)
    F = 3 if bpp <= 8 else (4 if bpp <= 16 else 5)
    uncomp_id = (1 << F) - 1
    nmax = (1 << bpp) - 1
    br = _BitsMSB(raw)
    out = []
    while len(out) < out_pixels:
        line_pixels = min(pps, out_pixels - len(out))
        blocks = -(-line_pixels // ppb)
        # tokens: slot 0 holds the RAW reference sample under NN; every
        # other slot holds the mapped residual (EC: raw values in every
        # slot).  Padding slots past line_pixels are decoded and dropped.
        toks = []
        b = 0
        while b < blocks:
            ref = 1 if (pre and b == 0) else 0
            bid = br.get(F)
            if bid == uncomp_id:
                toks.extend(br.get(bpp) for _ in range(ppb))
                b += 1
            elif bid == 0:
                sub = br.get(1)
                if ref:
                    toks.append(br.get(bpp))
                if sub == 0:          # zero-block run
                    z = br.fs() + 1
                    seg_end = min((b // 64 + 1) * 64, blocks)
                    if z == 5:        # ROS: rest of the 64-block segment
                        run = seg_end - b
                    else:             # literal runs: 1..4 ⇒ z−... see
                        run = z - 1 if z > 5 else z  # encoder contract
                        if b + run > seg_end:
                            raise Mini5Error(
                                "szip: zero-block run crosses a segment")
                    toks.extend([0] * (run * ppb - ref))
                    b += run
                else:                 # second extension: FS-coded pairs
                    i = ref
                    while i < ppb:
                        m = br.fs()
                        ms = (math.isqrt(8 * m + 1) - 1) // 2
                        d1 = m - ms * (ms + 1) // 2
                        if i % 2 == 0:
                            toks.append(ms - d1)
                            toks.append(d1)
                            i += 2
                        else:         # ref occupies the pair's first slot
                            toks.append(d1)
                            i += 1
                    b += 1
            else:                     # split-sample k = bid - 1
                k = bid - 1
                if ref:
                    toks.append(br.get(bpp))
                msbs = [br.fs() for _ in range(ppb - ref)]
                toks.extend((hi << k) | br.get(k) if k else hi
                            for hi in msbs)
                b += 1
        if pre:                       # NN inverse, sequential by need
            prev = None
            for idx in range(line_pixels):
                if idx == 0:
                    x = toks[0]
                else:
                    p = prev
                    theta = p if p <= nmax - p else nmax - p
                    m = toks[idx]
                    if m <= 2 * theta:
                        x = p + (m // 2 if m % 2 == 0 else -((m + 1) // 2))
                    else:
                        x = p + (m - theta if theta == p else theta - m)
                if not 0 <= x <= nmax:
                    raise Mini5Error("szip: sample out of range after "
                                     "prediction inverse")
                out.append(x)
                prev = x
        else:
            for idx in range(line_pixels):
                if toks[idx] > nmax:
                    raise Mini5Error("szip: sample exceeds bits_per_pixel")
                out.append(toks[idx])
    return out


def szip_chunk_decompress(raw, cds, dtype):
    """HDF5 H5Zszip chunk: LE uint32 uncompressed byte count, then the
    raw coded stream, decoded under the filter's 4 client values."""
    if len(cds) < 4:
        raise Mini5Error(f"szip: expected 4 client values, got {len(cds)}")
    mask, ppb, bpp, pps = cds[0], cds[1], cds[2], cds[3]
    if len(raw) < 4:
        raise Mini5Error("szip: chunk shorter than its length header")
    if not mask & _SZ_RAW:
        raise Mini5Error("szip: non-RAW (SZ-header) streams unsupported")
    nbytes = int.from_bytes(raw[:4], "little")
    if bpp % 8 or dtype.itemsize != bpp // 8:
        raise Mini5Error(
            f"szip: bits_per_pixel {bpp} vs {dtype.itemsize}-byte dtype")
    order = "<" if mask & _SZ_LSB else ">"
    if (dtype.byteorder in ("<", "=")) != (order == "<"):
        raise Mini5Error("szip: sample byte order does not match dtype")
    samples = szip_decompress(raw[4:], nbytes // (bpp // 8), bpp,
                              ppb, pps, mask)
    return np.array(samples,
                    dtype=f"{order}u{bpp // 8}").tobytes()


def _read_chunked(buf, btree_addr, chunk_dims, dims, dtype, filters):
    arr = np.zeros([int(d) for d in dims], dtype=dtype)
    rank = len(dims)
    csize = int(np.prod(chunk_dims)) * dtype.itemsize
    for offs, stored, mask, addr in _chunk_btree_entries(
            buf, btree_addr, rank):
        raw = buf[addr:addr + stored]
        # undo the pipeline in reverse; the mask's bit i marks filter i
        # as SKIPPED for this chunk
        for i in range(len(filters) - 1, -1, -1):
            if mask & (1 << i):
                continue
            fid, cds = filters[i]
            if fid == 1:
                raw = zlib.decompress(raw)
            elif fid == 32000:
                raw = lzf_decompress(raw)
            elif fid == 4:
                raw = szip_chunk_decompress(raw, cds, dtype)
            elif fid == 2:
                # byte shuffle: stored as all byte-0s, all byte-1s, ...
                # of each element; undo by transposing back.  A tail
                # shorter than one element stays unshuffled (HDF5 rule).
                b = dtype.itemsize
                if b > 1:
                    n = len(raw) // b
                    body = np.frombuffer(raw[:n * b], dtype=np.uint8)
                    raw = body.reshape(b, n).T.tobytes() + raw[n * b:]
            else:
                raise Mini5Error(
                    f"filter id {fid} unsupported (deflate/"
                    "shuffle/lzf/szip only — rewrite with "
                    "compression='gzip')")
        if len(raw) < csize:
            raise Mini5Error("short chunk after decompression")
        chunk = np.frombuffer(raw[:csize], dtype=dtype).reshape(chunk_dims)
        # clip the chunk to the dataset bounds (edge chunks are stored
        # full-size)
        sel = tuple(slice(offs[d], min(offs[d] + chunk_dims[d], dims[d]))
                    for d in range(rank))
        src = tuple(slice(0, sel[d].stop - sel[d].start)
                    for d in range(rank))
        arr[sel] = chunk[src]
    return arr


def _read_object(buf, oh_addr):
    """Parse a v1 object header into a Group or Dataset."""
    if buf[oh_addr] != 1:
        raise Mini5Error(
            f"object header v{buf[oh_addr]} at {oh_addr}; only v1 supported"
            " (file written with libver='latest'?)")
    nmsgs = _u(buf, oh_addr + 2, 2)
    hdr_size = _u(buf, oh_addr + 8, 4)
    attrs = {}
    dtype = dims = None
    data_addr = data_size = None
    chunk_btree = chunk_dims = None
    filters = []
    st_btree = st_heap = None
    blocks = [(oh_addr + 16, oh_addr + 16 + hdr_size)]
    seen = 0
    while blocks and seen < nmsgs:
        off, end = blocks.pop(0)
        while off + 8 <= end and seen < nmsgs:
            mtype = _u(buf, off, 2)
            msize = _u(buf, off + 2, 2)
            body = off + 8
            seen += 1
            if mtype == 0x0001:
                dims = _parse_dataspace(buf, body)
            elif mtype == 0x0003:
                dtype, _ = _parse_datatype(buf, body)
            elif mtype == 0x0008:
                v = buf[body]
                if v != 3:
                    raise Mini5Error(f"data layout v{v} unsupported")
                lclass = buf[body + 1]
                if lclass == 1:  # contiguous
                    data_addr = _u(buf, body + 2, 8)
                    data_size = _u(buf, body + 10, 8)
                elif lclass == 2:  # chunked: dimensionality, btree, dims
                    crank = buf[body + 2] - 1  # stored rank includes elem dim
                    chunk_btree = _u(buf, body + 3, 8)
                    chunk_dims = [_u(buf, body + 11 + 4 * d, 4)
                                  for d in range(crank)]
                else:
                    raise Mini5Error("compact dataset layout unsupported")
            elif mtype == 0x000B:  # filter pipeline
                nf = buf[body + 1]
                p = body + 8
                for _ in range(nf):
                    fid = _u(buf, p, 2)
                    name_len = _u(buf, p + 2, 2)
                    ncd = _u(buf, p + 6, 2)
                    cd_off = p + 8 + (name_len + 7) // 8 * 8
                    cds = tuple(_u(buf, cd_off + 4 * c, 4)
                                for c in range(ncd))
                    filters.append((fid, cds))
                    p = cd_off + 4 * ncd
                    if ncd % 2 == 1:
                        p += 4  # client data padded to 8
            elif mtype == 0x0011:
                st_btree = _u(buf, body, 8)
                st_heap = _u(buf, body + 8, 8)
            elif mtype == 0x000C:
                name, value = _parse_attribute(buf, body)
                attrs[name] = value
            elif mtype == 0x0010:  # continuation block
                blocks.append((_u(buf, body, 8),
                               _u(buf, body, 8) + _u(buf, body + 8, 8)))
            # 0x0000 NIL, 0x0005 fill, 0x000A group info, etc.: skip
            off = body + msize
    if st_btree is not None:
        links = {}
        for name, child_addr in _btree_snod_entries(
                buf, st_btree, _local_heap(buf, st_heap)):
            links[name] = _read_object(buf, child_addr)
        return Group(links, attrs)
    if dtype is None or dims is None:
        return Group({}, attrs)  # empty/attribute-only node
    if dtype == ("vlen-str",):
        raise Mini5Error("vlen-string DATASETS unsupported (attrs only)")
    if chunk_btree is not None:
        if chunk_btree == UNDEF:
            arr = np.zeros([int(d) for d in dims], dtype=dtype)
        else:
            arr = _read_chunked(buf, chunk_btree, chunk_dims, dims, dtype,
                                filters)
    elif data_addr is None or data_addr == UNDEF:
        arr = np.zeros([int(d) for d in dims], dtype=dtype)
    else:
        n = int(np.prod(dims)) if dims else 1
        arr = np.frombuffer(
            buf[data_addr:data_addr + n * dtype.itemsize], dtype=dtype,
            count=n).reshape([int(d) for d in dims] if dims else ())
    return Dataset(arr, attrs)
