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
                shuffle=False, lzf=False):
        """Write data + a v1 object header; returns OH address.

        ``chunks`` (a shape tuple) switches to the chunked layout (v1
        chunk B-tree); ``gzip`` (a level) additionally deflates every
        chunk through a filter-pipeline message — the layout
        ``anndata.write_h5ad(compression='gzip')`` produces;
        ``shuffle`` prepends the byte-shuffle filter (id 2) to the
        pipeline — h5py's ``shuffle=True`` default companion of gzip;
        ``lzf`` instead compresses chunks with the LZF filter
        (id 32000, named filter + h5py's 3 client values) — the
        ``compression='lzf'`` layout."""
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
            if gzip is not None or lzf:
                # filter pipeline v1 in APPLICATION order (shuffle
                # before deflate); one client value each, padded to 8
                nf = (1 if gzip is not None else 0) + \
                     (1 if shuffle else 0) + (1 if lzf else 0)
                filt = struct.pack("<BB6x", 1, nf)
                if shuffle:
                    filt += struct.pack("<HHHHI4x", 2, 0, 0, 1,
                                        arr.dtype.itemsize)
                if gzip is not None:
                    filt += struct.pack("<HHHHI4x", 1, 0, 0, 1, gzip)
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
                categories, gzip_chunks=None, shuffle=False, lzf=False):
    w = Writer()

    def xds(a):
        if gzip_chunks is None and not lzf:
            return w.dataset(a)
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
    os.makedirs(os.path.join(out_dir, "lzf"), exist_ok=True)
    for fname, p in plates.items():
        blob = build_plate(p["indptr"], p["indices"], p["data"],
                           p["cell_types"], p["n_counts"], n_var,
                           ["T", "B", "NK"],
                           gzip_chunks=p.get("gzip"),
                           shuffle=p.get("shuf", False),
                           lzf=p.get("lzf", False))
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(blob)
        print(f"wrote {fname}: {len(blob)} bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "fixtures"))
