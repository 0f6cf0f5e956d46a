#!/usr/bin/env python3
"""Driver-side media-directory → parquet converter.

Reads a directory of real media files (.png/.gif/.bmp/.ppm/.pgm/.pbm/
.tif/.jpg/.wav/.au/.aiff/.flac/.y4m/.avi …) into the engine's binary
payload-column layout:

    doc_id    BIGINT   — xxhash64-style stable id of the file name
    file_name STRING
    modality  STRING   — image / audio / video by extension
    byte_len  BIGINT
    payload   BINARY   — the raw file bytes, opaque to this tool

This is the h5ad_to_parquet pattern applied to media crawls: a one-shot
landing tool for local corpora.  The CLUSTER-scale path is
graft.sources.MediaDirSource (Spark's distributed `binaryFile` source —
same columns, same modality routing, file reads spread across
executors); this tool and that reader must agree, which
R20MediaIngestSpec asserts over the committed fixture directory.

Usage: media_dir_to_parquet.py <media_dir> <out.parquet>
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# mirrored in graft.sources.MediaDirSource.ModalityByExt
MODALITY = {
    "png": "image", "gif": "image", "bmp": "image", "ppm": "image",
    "pgm": "image", "pbm": "image", "tif": "image", "tiff": "image",
    "jpg": "image", "jpeg": "image",
    "wav": "audio", "au": "audio", "aiff": "audio", "aif": "audio",
    "flac": "audio",
    "y4m": "video", "avi": "video",
}


def stable_id(name):
    """64-bit FNV-1a of the file name — mirrored in MediaDirSource so
    the two ingest paths assign identical ids."""
    h = 0xCBF29CE484222325
    for b in name.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, out = sys.argv[1], sys.argv[2]
    rows = []
    for name in sorted(os.listdir(src)):
        path = os.path.join(src, name)
        # Spark's FileIndex hidden-file rule, mirrored so the two ingest
        # paths cannot diverge: '.'/'_'-prefixed names are staging
        # conventions ("not landed yet"), never ingested.
        if name.startswith(".") or name.startswith("_"):
            continue
        ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
        if not os.path.isfile(path) or ext not in MODALITY:
            continue
        with open(path, "rb") as f:
            payload = f.read()
        rows.append((stable_id(name), name, MODALITY[ext], len(payload),
                     payload))
    if not rows:
        sys.exit(f"no media files under {src}")
    cols = list(zip(*rows))
    table = pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "file_name": pa.array(cols[1], pa.string()),
        "modality": pa.array(cols[2], pa.string()),
        "byte_len": pa.array(cols[3], pa.int64()),
        "payload": pa.array(cols[4], pa.binary()),
    })
    pq.write_table(table, out)
    print(f"wrote {table.num_rows} rows to {out}")


if __name__ == "__main__":
    main()
