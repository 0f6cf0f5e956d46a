#!/usr/bin/env python3
"""Generate the committed ``.h5ad`` HDF5 binary fixtures under
``tools/fixtures/`` — spec-conformant files exercising the REAL HDF5
branch of ``h5ad_to_parquet.py`` (via ``minih5`` where h5py is absent).

Written from the public HDF5 File Format Specification v1.x: superblock
v0, v1 object headers, old-style symbol-table groups (v1 B-tree + SNOD +
local heap), contiguous little-endian datasets, v1 attribute messages
with fixed-size strings — the layout libhdf5 emits for an uncompressed
default write, so a reader that handles these fixtures handles the
common real-world file shape.

Fixture content (two plates sharing one 12-gene panel — the multi-plate
concatenation path):
  plate0.h5ad: 5 cells;  plate1.h5ad: 3 cells
  /X            group, attrs encoding-type='csr_matrix', shape=[n,12]
    indptr i8, indices i4, data f4
  /obs          group
    cell_type   categorical group (codes i8 + categories S4 — the
                current anndata >=0.2 encoding)
    n_counts    f8 dataset
  /var          group, attr _index='var_names'
    var_names   S8 dataset

Deterministic: fixed arrays, no RNG — regenerating must reproduce the
committed bytes (gen + sha256 asserted in R15IngestSpec).
"""
import os
import struct
import sys

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def pad8(b):
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def lzf_compress(data):
    """Greedy LZF compression (Marc Lehmann's liblzf format, h5py filter
    id 32000) — written from the public format description: literal runs
    of ≤ 32 bytes under a control byte < 0x20; back-references of length
    3..264 at distance ≤ 8191 encoded as (len−2) in the top 3 control
    bits (7 ⇒ extension byte) and the distance−1 split 5+8 bits.  Any
    stream this emits round-trips through minih5.lzf_decompress;
    deterministic (dict-based last-position table, no randomness)."""
    n = len(data)
    out = bytearray()
    lit = bytearray()

    def flush():
        p = 0
        while p < len(lit):
            run = lit[p:p + 32]
            out.append(len(run) - 1)
            out.extend(run)
            p += 32
        del lit[:]

    table = {}
    i = 0
    while i < n:
        if i + 3 <= n:
            key = bytes(data[i:i + 3])
            ref = table.get(key, -1)
            table[key] = i
            dist = i - ref - 1
            if ref >= 0 and dist <= 0x1FFF:
                ln = 3
                maxlen = min(n - i, 264)  # (7 + 255) + 2
                while ln < maxlen and data[ref + ln] == data[i + ln]:
                    ln += 1
                flush()
                enc = ln - 2
                if enc < 7:
                    out.append((enc << 5) | (dist >> 8))
                else:
                    out.append((7 << 5) | (dist >> 8))
                    out.append(enc - 7)
                out.append(dist & 0xFF)
                i += ln
                continue
        lit.append(data[i])
        i += 1
    flush()
    return bytes(out)


# ---- szip (filter id 4): CCSDS 121.0-B extended-Rice encoder ------------
#
# The round-trip twin of minih5.szip_decompress (see the profile notes
# there: RAW stream, NN/EC, MSB-first coded bits, scanline reference
# samples, replicate-last-sample block padding, 64-block zero segments).
# Option selection per block is cost-exact over split k / second
# extension / zero-block runs / uncompressed.  R20SzipSpec pins the
# emitted conventions against hand-coded golden bitstreams derived from
# the standard's rules.

SZ_ALLOW_K13, SZ_EC, SZ_LSB, SZ_NN, SZ_RAW = 1, 4, 8, 32, 128


class _SzBitsOut:
    def __init__(self):
        self.bits = []

    def put(self, val, n):
        self.bits.append((val, n))

    def fs(self, v):
        self.bits.append((1, v + 1))  # v zeros then a closing 1

    def tobytes(self):
        big, total = 0, 0
        for val, n in self.bits:
            big = (big << n) | val
            total += n
        pad = (-total) % 8
        return (big << pad).to_bytes((total + pad) // 8, "big")


def _sz_nn_map(x, p, nmax):
    delta = x - p
    theta = p if p <= nmax - p else nmax - p
    if 0 <= delta <= theta:
        return 2 * delta
    if -theta <= delta < 0:
        return -2 * delta - 1
    return theta + abs(delta)


def szip_compress(samples, bpp, ppb, pps, options):
    """Encode unsigned `bpp`-bit samples as a raw szip coded stream."""
    pre = bool(options & SZ_NN)
    F = 3 if bpp <= 8 else (4 if bpp <= 16 else 5)
    uncomp_id = (1 << F) - 1
    kmax = uncomp_id - 2          # ids 1..2^F−2 carry split k = id−1
    if not (options & SZ_ALLOW_K13) and bpp == 16:
        kmax = min(kmax, 12)      # k13 disallowed: drop the last split
    nmax = (1 << bpp) - 1
    out = _SzBitsOut()
    n, pos = len(samples), 0
    while pos < n:
        line = samples[pos:pos + min(pps, n - pos)]
        pos += len(line)
        blocks = -(-len(line) // ppb)
        # token domain: slot 0 raw reference under NN, mapped residuals
        # after; short last block padded by replicating the last sample
        # (mapped 0 under NN)
        if pre:
            toks = [line[0]] + [_sz_nn_map(line[i], line[i - 1], nmax)
                                for i in range(1, len(line))]
            toks += [0] * (blocks * ppb - len(line))
        else:
            toks = list(line) + [line[-1]] * (blocks * ppb - len(line))
        b = 0
        while b < blocks:
            ref = 1 if (pre and b == 0) else 0
            blk = toks[b * ppb:(b + 1) * ppb]
            body = blk[ref:]
            if all(t == 0 for t in body):
                seg_end = min((b // 64 + 1) * 64, blocks)
                run = 1
                while (b + run < seg_end and
                       all(t == 0 for t in
                           toks[(b + run) * ppb:(b + run + 1) * ppb])):
                    run += 1
                out.put(0, F)
                out.put(0, 1)
                if ref:
                    out.put(blk[0], bpp)
                if b + run == seg_end and run >= 5:
                    out.fs(4)     # ROS: rest of the 64-block segment
                else:             # literal runs: 1..4 ⇒ fs run−1,
                    out.fs(run - 1 if run <= 4 else run)  # ≥5 ⇒ fs run
                b += run
                continue
            best = ("uncomp", None, F + ppb * bpp)
            refc = bpp if ref else 0
            for k in range(kmax + 1):
                cost = (F + refc + sum((t >> k) + 1 for t in body) +
                        k * len(body))
                if cost < best[2]:
                    best = ("split", k, cost)
            # second extension: FS-coded pairs; under NN the reference
            # occupies the first pair's slot (phantom first value 0)
            se_ms, i, ok = [], ref, True
            cost = F + 1 + refc
            while i < ppb and ok:
                if i % 2 == 1:
                    d1 = blk[i]
                    m = d1 * (d1 + 1) // 2 + d1
                    i += 1
                else:
                    ms = blk[i] + blk[i + 1]
                    m = ms * (ms + 1) // 2 + blk[i + 1]
                    i += 2
                cost += m + 1
                se_ms.append(m)
                if cost >= best[2]:
                    ok = False
            if ok and cost < best[2]:
                best = ("se", se_ms, cost)
            kind, arg, _ = best
            if kind == "uncomp":
                out.put(uncomp_id, F)
                for t in blk:
                    out.put(t, bpp)
            elif kind == "split":
                out.put(arg + 1, F)
                if ref:
                    out.put(blk[0], bpp)
                for t in body:   # all FS (MSB) parts, then all k LSBs
                    out.fs(t >> arg)
                for t in body:
                    if arg:
                        out.put(t & ((1 << arg) - 1), arg)
            else:
                out.put(0, F)
                out.put(1, 1)
                if ref:
                    out.put(blk[0], bpp)
                for m in arg:
                    out.fs(m)
            b += 1
    return out.tobytes()


def szip_chunk_compress(raw, itemsize, ppb, pps, mask):
    """One HDF5 szip chunk: LE uint32 uncompressed byte count + the raw
    coded stream (H5Zszip's public layout) over little-endian samples."""
    samples = np.frombuffer(raw, dtype=f"<u{itemsize}").tolist()
    stream = szip_compress(samples, 8 * itemsize, ppb, pps, mask)
    return len(raw).to_bytes(4, "little") + stream


# ---- message payload builders -------------------------------------------

def dataspace(dims):
    if not dims:
        return pad8(struct.pack("<BBB5x", 1, 0, 0))
    return pad8(struct.pack("<BBB5x", 1, len(dims), 0) +
                b"".join(struct.pack("<Q", d) for d in dims))


def dt_int(size, signed=True):
    return pad8(struct.pack("<BBBBIHH", (1 << 4) | 0,
                            0x08 if signed else 0x00, 0, 0, size,
                            0, size * 8))


def dt_float(size):
    if size == 4:
        sign_loc, exp_loc, exp_sz, man_sz, bias = 31, 23, 8, 23, 127
    else:
        sign_loc, exp_loc, exp_sz, man_sz, bias = 63, 52, 11, 52, 1023
    return pad8(struct.pack("<BBBBIHHBBBBI", (1 << 4) | 1, 0x20, sign_loc,
                            0, size, 0, size * 8, exp_loc, exp_sz, 0,
                            man_sz, bias))


def dt_str(size):
    # null-terminated padding, ASCII charset
    return pad8(struct.pack("<BBBBI", (1 << 4) | 3, 0, 0, 0, size))


def message(mtype, payload, flags=0):
    return struct.pack("<HHB3x", mtype, len(payload), flags) + payload


def attribute(name, dt, ds, raw):
    nb = name.encode() + b"\x00"
    payload = struct.pack("<BxHHH", 1, len(nb), len(dt), len(ds))
    payload += pad8(nb) + pad8(dt) + pad8(ds) + raw
    return message(0x000C, pad8(payload))


class Writer:
    def __init__(self):
        self.buf = bytearray(b"\x00" * 96)  # superblock placeholder

    def alloc(self, data):
        addr = len(self.buf)
        self.buf += data
        return addr

    def dataset(self, arr, attrs=(), chunks=None, gzip=None,
                shuffle=False, lzf=False, szip=None):
        """Write data + a v1 object header; returns OH address.

        ``chunks`` (a shape tuple) switches to the chunked layout (v1
        chunk B-tree); ``gzip`` (a level) additionally deflates every
        chunk through a filter-pipeline message — the layout
        ``anndata.write_h5ad(compression='gzip')`` produces;
        ``shuffle`` prepends the byte-shuffle filter (id 2) to the
        pipeline — h5py's ``shuffle=True`` default companion of gzip;
        ``lzf`` instead compresses chunks with the LZF filter
        (id 32000, named filter + h5py's 3 client values) — the
        ``compression='lzf'`` layout; ``szip`` (pixels_per_block)
        compresses chunks with the szip filter (id 4, NN + allow-k13 +
        LSB + RAW — the H5Pset_szip(H5_SZIP_NN_OPTION_MASK, ppb)
        layout for little-endian data, pixels_per_scanline derived the
        way H5Z_set_local_szip derives it for a 1-D chunk)."""
        arr = np.ascontiguousarray(arr)
        if arr.dtype.kind in "iu":
            dt = dt_int(arr.dtype.itemsize, arr.dtype.kind == "i")
        elif arr.dtype.kind == "f":
            dt = dt_float(arr.dtype.itemsize)
        elif arr.dtype.kind == "S":
            dt = dt_str(arr.dtype.itemsize)
        else:
            raise ValueError(f"dtype {arr.dtype}")
        msgs = [message(0x0001, dataspace(list(arr.shape))),
                message(0x0003, dt, flags=1)]
        if chunks is None:
            daddr = self.alloc(pad8(arr.tobytes()))
            msgs.append(message(0x0008, pad8(struct.pack(
                "<BBQQ", 3, 1, daddr, arr.nbytes))))
        else:
            rank = arr.ndim
            import itertools
            import zlib
            if szip is not None:
                # pps the way H5Z_set_local_szip derives it for a 1-D
                # chunk: the fastest-varying dimension, capped at the
                # szlib scanline limits (2048 pixels, 128 blocks)
                szip_mask = SZ_ALLOW_K13 | SZ_LSB | SZ_NN | SZ_RAW
                szip_pps = min(int(chunks[-1]), 2048, 128 * szip)
            entries = []
            grid = [range(0, arr.shape[d], chunks[d]) for d in range(rank)]
            for offs in itertools.product(*grid):
                # edge chunks are stored FULL-SIZE (zero-padded)
                full = np.zeros(chunks, dtype=arr.dtype)
                sel = tuple(slice(offs[d], min(offs[d] + chunks[d],
                                               arr.shape[d]))
                            for d in range(rank))
                src = tuple(slice(0, sel[d].stop - sel[d].start)
                            for d in range(rank))
                full[src] = arr[sel]
                raw = full.tobytes()
                if shuffle:
                    # byte shuffle: all byte-0s, then all byte-1s, ...
                    b = arr.dtype.itemsize
                    n = len(raw) // b
                    raw = np.frombuffer(raw, dtype=np.uint8).reshape(
                        n, b).T.tobytes()
                if gzip is not None:
                    raw = zlib.compress(raw, gzip)
                if lzf:
                    raw = lzf_compress(raw)
                if szip is not None:
                    raw = szip_chunk_compress(raw, arr.dtype.itemsize,
                                              szip, szip_pps, szip_mask)
                entries.append((offs, len(raw), self.alloc(pad8(raw))))
            # chunk B-tree: one leaf (fixtures stay within one node)
            key_sz = 8 + 8 * (rank + 1)

            def key(offs, stored):
                return struct.pack("<II", stored, 0) + b"".join(
                    struct.pack("<Q", o) for o in offs) + struct.pack(
                        "<Q", 0)
            bt = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(entries),
                                       UNDEF, UNDEF)
            for offs, stored, addr in entries:
                bt += key(offs, stored) + struct.pack("<Q", addr)
            past = tuple((arr.shape[d] + chunks[d] - 1) // chunks[d] *
                         chunks[d] for d in range(rank))
            bt += key(past, 0)
            bt_addr = self.alloc(pad8(bt))
            layout = struct.pack("<BBB", 3, 2, rank + 1)
            layout += struct.pack("<Q", bt_addr)
            layout += b"".join(struct.pack("<I", c) for c in chunks)
            layout += struct.pack("<I", arr.dtype.itemsize)
            msgs.append(message(0x0008, pad8(layout)))
            if gzip is not None or lzf or szip is not None:
                # filter pipeline v1 in APPLICATION order (shuffle
                # before deflate); one client value each, padded to 8
                nf = (1 if gzip is not None else 0) + \
                     (1 if shuffle else 0) + (1 if lzf else 0) + \
                     (1 if szip is not None else 0)
                filt = struct.pack("<BB6x", 1, nf)
                if shuffle:
                    filt += struct.pack("<HHHHI4x", 2, 0, 0, 1,
                                        arr.dtype.itemsize)
                if gzip is not None:
                    filt += struct.pack("<HHHHI4x", 1, 0, 0, 1, gzip)
                if szip is not None:
                    # built-in filter (id < 256): no name; the 4 client
                    # values H5Z_set_local_szip stores (even count — no
                    # pad word)
                    filt += struct.pack("<HHHHIIII", 4, 0, 0, 4,
                                        szip_mask, szip,
                                        8 * arr.dtype.itemsize, szip_pps)
                if lzf:
                    # registered filter (id >= 256) carries its name —
                    # the v1 pipeline spec requires the DECLARED name
                    # length be a multiple of eight (h5py writes 8;
                    # libhdf5 rejects anything else) — + h5py's 3 client
                    # values (filter version, liblzf version, chunk
                    # nbytes); odd count pads 4
                    csz = int(np.prod(chunks)) * arr.dtype.itemsize
                    filt += struct.pack("<HHHH", 32000, 8, 1, 3)
                    filt += b"lzf\x00" + b"\x00" * 4
                    filt += struct.pack("<III4x", 1, 261, csz)
                msgs.append(message(0x000B, pad8(filt)))
        msgs += list(attrs)
        return self.object_header(msgs)

    def object_header(self, msgs):
        body = b"".join(msgs)
        hdr = struct.pack("<BxHII4x", 1, len(msgs), 1, len(body))
        return self.alloc(hdr + body)

    def group(self, links, attrs=()):
        """links: ordered (name, oh_addr); returns group OH address."""
        # local heap: names at 8-aligned offsets, offset 0 left empty
        heap_data = bytearray(b"\x00" * 8)
        offsets = []
        for name, _ in links:
            offsets.append(len(heap_data))
            heap_data += pad8(name.encode() + b"\x00")
        heap_data_addr = self.alloc(bytes(heap_data))
        heap_addr = self.alloc(b"HEAP" + struct.pack(
            "<B3xQQQ", 0, len(heap_data), 1, heap_data_addr))
        # one SNOD with every entry, name-sorted (HDF5 requirement)
        order = sorted(range(len(links)), key=lambda i: links[i][0])
        snod = b"SNOD" + struct.pack("<BxH", 1, len(links))
        for i in order:
            snod += struct.pack("<QQI4x16x", offsets[i], links[i][1], 0)
        snod_addr = self.alloc(pad8(snod))
        # B-tree: single leaf pointing at the SNOD
        btree = (b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF) +
                 struct.pack("<QQQ", 0, snod_addr,
                             offsets[order[-1]] if links else 0))
        btree_addr = self.alloc(pad8(btree))
        msgs = [message(0x0011, pad8(struct.pack("<QQ", btree_addr,
                                                 heap_addr)))]
        msgs += list(attrs)
        return self.object_header(msgs)

    def finish(self, root_oh):
        sb = b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
        sb += struct.pack("<HHI", 4, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol-table entry, cache_type 0 (reader walks the OH)
        sb += struct.pack("<QQI4x16x", 0, root_oh, 0)
        assert len(sb) == 96, len(sb)
        self.buf[:96] = sb
        return bytes(self.buf)


def str_attr(name, value):
    vb = value.encode()
    return attribute(name, dt_str(len(vb) + 1), dataspace([]),
                     pad8(vb + b"\x00"))


def shape_attr(n_obs, n_var):
    return attribute("shape", dt_int(8), dataspace([2]),
                     struct.pack("<QQ", n_obs, n_var))


def build_plate(indptr, indices, data, cell_types, n_counts, n_var,
                categories, gzip_chunks=None, shuffle=False, lzf=False,
                szip=None):
    w = Writer()

    def xds(a):
        if gzip_chunks is None and not lzf and szip is None:
            return w.dataset(a)
        if szip is not None:
            # szip applies to the 8/16/32-bit datasets only (the filter
            # has no 64-bit mode — libhdf5 likewise skips it there), so
            # the i8 indptr stays contiguous in the szip plate
            if a.dtype.itemsize > 4:
                return w.dataset(a)
            return w.dataset(a, chunks=(max(2, len(a) // 3),), szip=szip)
        # multiple chunks + deflate (optionally byte-shuffled) or LZF:
        # the compressed-anndata file shapes
        return w.dataset(a, chunks=(max(2, len(a) // 3),),
                         gzip=6 if gzip_chunks else None,
                         shuffle=shuffle, lzf=lzf)
    x = w.group([
        ("data", xds(np.asarray(data, dtype="<f4"))),
        ("indices", xds(np.asarray(indices, dtype="<i4"))),
        ("indptr", xds(np.asarray(indptr, dtype="<i8"))),
    ], attrs=[str_attr("encoding-type", "csr_matrix"),
              shape_attr(len(indptr) - 1, n_var)])
    cat = w.group([
        ("categories", w.dataset(np.asarray(categories, dtype="S4"))),
        ("codes", w.dataset(np.asarray(cell_types, dtype="<i8"))),
    ], attrs=[str_attr("encoding-type", "categorical")])
    obs = w.group([
        ("cell_type", cat),
        ("n_counts", w.dataset(np.asarray(n_counts, dtype="<f8"))),
    ])
    var = w.group([
        ("var_names", w.dataset(np.asarray(
            [f"GENE{g}".encode() for g in range(n_var)], dtype="S8"))),
    ], attrs=[str_attr("_index", "var_names")])
    root = w.group([("X", x), ("obs", obs), ("var", var)])
    return w.finish(root)


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    n_var = 12
    plates = {
        "plate0.h5ad": dict(
            indptr=[0, 3, 5, 5, 9, 11],
            indices=[0, 4, 7, 1, 11, 2, 3, 5, 10, 0, 6],
            data=[1.5, 2.0, 0.5, 3.25, 1.0, 4.0, 0.75, 2.5, 1.25, 6.0, 0.1],
            cell_types=[0, 1, 2, 0, 1],
            n_counts=[10.5, 20.25, 0.0, 31.75, 7.5]),
        "plate1.h5ad": dict(
            indptr=[0, 2, 6, 7],
            indices=[3, 9, 0, 1, 2, 8, 11],
            data=[5.0, 2.25, 1.0, 1.0, 2.0, 3.5, 0.5],
            cell_types=[2, 2, 0],
            n_counts=[12.0, 44.5, 3.25]),
        # plate2: X stored CHUNKED + gzip — the compressed-anndata shape
        "plate2.h5ad": dict(
            indptr=[0, 4, 5, 9, 12],
            indices=[1, 3, 5, 7, 10, 0, 2, 4, 6, 8, 9, 11],
            data=[0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5,
                  10.5, 11.5],
            cell_types=[1, 0, 2, 1],
            n_counts=[1.0, 2.0, 3.0, 4.0],
            gzip=True),
        # plate3: gzip + SHUFFLE — h5py's default compression companion
        "plate3.h5ad": dict(
            indptr=[0, 2, 3],
            indices=[2, 5, 7],
            data=[1.25, 2.75, 3.5],
            cell_types=[0, 2],
            n_counts=[4.0, 6.25],
            gzip=True, shuf=True),
    }
    # lzf/: a separate plate set (h5py's compression='lzf' layout) so the
    # four-plate concatenation fixtures above keep their committed counts.
    # Repetitive data values make the LZF back-reference path actually
    # fire (not just literal runs).
    plates["lzf/plate_lzf.h5ad"] = dict(
        indptr=[0, 4, 8, 10],
        indices=[0, 2, 4, 6, 1, 3, 5, 7, 9, 11],
        data=[1.5, 1.5, 1.5, 1.5, 2.5, 2.5, 2.5, 0.25, 1.5, 2.5],
        cell_types=[1, 0, 2],
        n_counts=[6.0, 7.75, 1.75],
        lzf=True)
    # szip/: its own plate set (the CCSDS-121 extended-Rice filter,
    # id 4); smooth-ish values so the NN predictor + split options all
    # fire, spread over several chunks and scanlines
    plates["szip/plate_szip.h5ad"] = dict(
        indptr=[0, 6, 12, 18, 24],
        indices=[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
                 0, 2, 4, 6, 8, 10, 1, 3, 5, 7, 9, 11],
        data=[1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0,
              3.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 4.25, 4.25, 4.25,
              4.25, 4.25, 8.5],
        cell_types=[2, 0, 1, 0],
        n_counts=[10.0, 19.0, 3.0, 25.75],
        szip=8)
    os.makedirs(os.path.join(out_dir, "lzf"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "szip"), exist_ok=True)
    for fname, p in plates.items():
        blob = build_plate(p["indptr"], p["indices"], p["data"],
                           p["cell_types"], p["n_counts"], n_var,
                           ["T", "B", "NK"],
                           gzip_chunks=p.get("gzip"),
                           shuffle=p.get("shuf", False),
                           lzf=p.get("lzf", False),
                           szip=p.get("szip"))
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(blob)
        print(f"wrote {fname}: {len(blob)} bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "fixtures"))
