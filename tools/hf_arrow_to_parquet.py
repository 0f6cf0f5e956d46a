#!/usr/bin/env python3
"""Convert a HuggingFace-datasets Arrow directory (the ``.arrow`` IPC
files a ``datasets.Dataset`` saves — the reference's second format
adapter, reference src/scdataset/transforms.py:137-226 HF fetch path)
into parquet for graft.

A saved HF dataset directory holds one or more Arrow IPC stream files
(``data-00000-of-00003.arrow`` …) plus json metadata.  Each IPC file is
a sequence of record batches with a common schema; this tool streams
every batch straight to a parquet writer — no pandas materialization,
columns and types pass through unchanged, and an optional positional
``row_idx`` (global across files, in filename order) is attached so the
output drops into ``ScCollection.fromParquet(..., orderBy=["row_idx"])``
with the same ordered-concatenation semantics as the h5ad converter's
plate offsets.

Usage:
  python3 tools/hf_arrow_to_parquet.py <in.arrow | dir> <out.parquet> [--row-id]
  python3 tools/hf_arrow_to_parquet.py --selftest <out_dir>

Needs only pyarrow (present wherever Spark drivers run).  ``--selftest``
writes a 3-file Arrow dataset in memory, converts it through the SAME
batch-streaming core, and checks row order + row_id contiguity.
"""
import os
import sys

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq


def iter_batches(path):
    """Yield record batches from one .arrow file, handling both the IPC
    STREAM layout (what `datasets` writes) and the FILE layout."""
    with open(path, "rb") as fh:
        try:
            reader = ipc.open_stream(fh)
        except pa.ArrowInvalid:
            fh.seek(0)
            reader = ipc.open_file(fh)
            for i in range(reader.num_record_batches):
                yield reader.get_batch(i)
            return
        for batch in reader:
            yield batch


def convert(files, out_path, with_row_id):
    writer, offset = None, 0
    for f in files:
        for batch in iter_batches(f):
            table = pa.Table.from_batches([batch])
            if with_row_id:
                rid = pa.array(range(offset, offset + len(table)),
                               type=pa.int64())
                table = table.append_column("row_idx", rid)
            if writer is None:
                writer = pq.ParquetWriter(out_path, table.schema)
            writer.write_table(table)
            offset += len(table)
    if writer is None:
        raise SystemExit("no record batches found")
    writer.close()
    return offset


def selftest(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema([("text", pa.string()), ("label", pa.int64())])
    files = []
    n_total = 0
    for i, n in enumerate((40, 25, 35)):
        p = os.path.join(out_dir, f"data-{i:05d}-of-00003.arrow")
        with ipc.new_stream(p, schema) as w:
            # two batches per file to exercise batch streaming
            for half in (0, 1):
                lo = n_total + half * (n // 2)
                hi = n_total + (n if half else n // 2)
                w.write_batch(pa.record_batch([
                    pa.array([f"doc {j}" for j in range(lo, hi)]),
                    pa.array(list(range(lo, hi)), type=pa.int64()),
                ], schema=schema))
        files.append(p)
        n_total += n
    out = os.path.join(out_dir, "docs.parquet")
    rows = convert(files, out, with_row_id=True)
    assert rows == n_total == 100
    t = pq.read_table(out)
    assert t.column("row_idx").to_pylist() == list(range(100)), \
        "row_id must be the global positional range in file order"
    assert t.column("label").to_pylist() == list(range(100)), \
        "row order must be file order then batch order"
    print(f"SELFTEST OK: 3 arrow files, {rows} rows -> {out}")


def main(argv):
    if len(argv) == 3 and argv[1] == "--selftest":
        selftest(argv[2])
        return 0
    if len(argv) < 3:
        print(__doc__)
        return 2
    src, out = argv[1], argv[2]
    with_row_id = "--row-id" in argv[3:]
    files = ([os.path.join(src, f) for f in sorted(os.listdir(src))
              if f.endswith(".arrow")] if os.path.isdir(src) else [src])
    if not files:
        raise SystemExit(f"no .arrow files under {src}")
    rows = convert(files, out, with_row_id)
    print(f"converted {len(files)} arrow file(s), {rows} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
