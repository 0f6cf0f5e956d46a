#!/usr/bin/env python3
"""Convert AnnData ``.h5ad`` files — the reference engine's first-touch
input format (reference: src/scdataset/transforms.py:29-135 AnnData fetch
path; benchmarks/evaluate_scdataset.py:70-93 backed="r" open) — into the
parquet layout graft reads through ``ScCollection.fromParquet``.

Schema mapping (one output row per cell):

  cell_id      int64   plate_offset + row index.  For a DIRECTORY of
                       .h5ad files the offsets are cumulative n_obs in
                       filename order — the reference's plate-
                       concatenation convention (a global positional id
                       across plates, transforms.py:228-265).
  genes        list<int32>   column ids of the row's nonzero entries,
                       ascending (CSR ``indices`` slice).
  expressions  list<float>   matching nonzero values (CSR ``data`` slice).
  <obs keys>   one flat column per ``obs`` column; categoricals are
                       decoded to their string labels.

Sidecars, one per output directory:
  var.parquet   the gene vocabulary (gene_id int32, var_name string) —
                 row order = CSR column id, so downstream joins can
                 densify ``genes`` back to names.
  plates.json   filename → (plate_offset, n_obs) for provenance.

The dense row is reconstructable as: dense[genes[i]] = expressions[i],
zero elsewhere — exactly the sparse→dense contract of
``graft.functions.SparseToDense`` (U6), so a converted file drops
straight into the sampling pipeline.

Usage:
  python3 tools/h5ad_to_parquet.py <in.h5ad | dir-of-h5ad> <out_dir>
  python3 tools/h5ad_to_parquet.py --selftest <out_dir>

Reading .h5ad requires ``h5py`` (pure-HDF5; anndata NOT required — the
CSR arrays and obs columns are read straight from the HDF5 groups).
``--selftest`` needs only numpy+pyarrow: it synthesizes a two-plate CSR
fixture in memory and pushes it through the SAME row-building core, so
the conversion logic is testable (and tested, R14IngestSpec) in
environments without h5py.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def csr_rows_table(indptr, indices, data, n_obs, obs_cols, plate_offset):
    """The conversion core: CSR slices + obs columns -> one arrow table.

    Shared verbatim between the h5py path and --selftest so the selftest
    exercises the real row-building logic.
    """
    genes = [np.asarray(indices[indptr[i]:indptr[i + 1]], dtype=np.int32)
             for i in range(n_obs)]
    exprs = [np.asarray(data[indptr[i]:indptr[i + 1]], dtype=np.float32)
             for i in range(n_obs)]
    cols = {
        "cell_id": pa.array(plate_offset + np.arange(n_obs, dtype=np.int64)),
        "genes": pa.array(genes, type=pa.list_(pa.int32())),
        "expressions": pa.array(exprs, type=pa.list_(pa.float32())),
    }
    for name, values in obs_cols.items():
        cols[name] = pa.array(values)
    return pa.table(cols)


def _decode_obs_column(h5obs, key):
    """Decode one obs column across the two h5ad encodings: legacy
    (dataset + __categories sidecar) and current (group with
    codes/categories)."""
    node = h5obs[key]
    if hasattr(node, "keys") and "codes" in node:  # encoding-version >= 0.2
        cats = [c.decode() if isinstance(c, bytes) else str(c)
                for c in node["categories"][...]]
        return [cats[i] if i >= 0 else None for i in node["codes"][...]]
    vals = node[...]
    if vals.dtype.kind == "S":
        return [v.decode() for v in vals]
    if vals.dtype.kind == "i" and "__categories" in h5obs \
            and key in h5obs["__categories"]:
        cats = [c.decode() if isinstance(c, bytes) else str(c)
                for c in h5obs["__categories"][key][...]]
        return [cats[i] if i >= 0 else None for i in vals]
    return vals.tolist()


def convert_one(path, plate_offset):
    try:
        import h5py
    except ImportError:
        # pure-Python fallback (tools/minih5.py): superblock v0, v1
        # object headers, symbol-table groups, contiguous AND chunked
        # datasets under the deflate (gzip), byte-shuffle, LZF, and
        # szip (CCSDS 121.0-B extended-Rice) filters — the default,
        # compression='gzip', compression='lzf', and szip anndata
        # layouts.  libver='latest' files need real h5py; minih5 fails
        # loudly on them.  Exercised against the committed
        # tools/fixtures/*.h5ad (+ fixtures/lzf/, fixtures/szip/).
        import minih5 as h5py
    with h5py.File(path, "r") as f:
        X = f["X"]
        if isinstance(X, h5py.Dataset):
            raise SystemExit(
                f"{path}: dense X — this converter handles the CSR layout "
                "the reference reads (X/data, X/indices, X/indptr)")
        enc = dict(X.attrs).get("encoding-type", b"csr_matrix")
        enc = enc.decode() if isinstance(enc, bytes) else str(enc)
        if "csr" not in enc:
            raise SystemExit(f"{path}: X encoding {enc!r}; expected CSR "
                             "(convert with .tocsr() first)")
        n_obs, n_var = X.attrs["shape"]
        indptr = X["indptr"][...]
        indices = X["indices"]
        data = X["data"]
        obs_cols = {}
        if "obs" in f:
            obs = f["obs"]
            keys = [k for k in obs.keys()
                    if k not in ("_index", "__categories")]
            for k in keys:
                obs_cols[k] = _decode_obs_column(obs, k)
        table = csr_rows_table(indptr, indices, data, int(n_obs), obs_cols,
                               plate_offset)
        var_names = None
        if "var" in f and "_index" in f["var"].attrs:
            idx = f["var"].attrs["_index"]
            idx = idx.decode() if isinstance(idx, bytes) else idx
            var_names = [v.decode() if isinstance(v, bytes) else str(v)
                         for v in f["var"][idx][...]]
        return table, int(n_obs), int(n_var), var_names


def write_var(out_dir, var_names):
    pq.write_table(pa.table({
        "gene_id": pa.array(np.arange(len(var_names), dtype=np.int32)),
        "var_name": pa.array(var_names),
    }), os.path.join(out_dir, "var.parquet"))


def selftest(out_dir):
    """Two synthetic plates through the real conversion core."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    plates, offset = {}, 0
    tables = []
    n_var = 50
    for plate, n_obs in (("plateA", 120), ("plateB", 80)):
        # build a CSR matrix by hand: ~8 nonzeros per row
        indptr = [0]
        indices, data = [], []
        for _ in range(n_obs):
            nnz = int(rng.integers(1, 16))
            cols = np.sort(rng.choice(n_var, size=nnz, replace=False))
            indices.extend(cols.tolist())
            data.extend(np.round(rng.random(nnz) * 10, 3).tolist())
            indptr.append(len(indices))
        obs_cols = {
            "cell_type": [["T", "B", "NK"][int(i) % 3]
                          for i in range(n_obs)],
            "n_counts": np.round(rng.random(n_obs) * 1000, 2).tolist(),
        }
        tables.append(csr_rows_table(
            np.array(indptr), np.array(indices, dtype=np.int32),
            np.array(data, dtype=np.float32), n_obs, obs_cols, offset))
        plates[plate] = {"plate_offset": offset, "n_obs": n_obs}
        offset += n_obs
    pq.write_table(pa.concat_tables(tables),
                   os.path.join(out_dir, "cells.parquet"))
    write_var(out_dir, [f"GENE{g}" for g in range(n_var)])
    with open(os.path.join(out_dir, "plates.json"), "w") as fh:
        json.dump(plates, fh, indent=2)
    # invariants the Scala side re-checks: ids are the 0..n-1 positional
    # range, and every genes list is strictly ascending within [0, n_var)
    t = pq.read_table(os.path.join(out_dir, "cells.parquet"))
    ids = t.column("cell_id").to_pylist()
    assert ids == list(range(offset)), "cell_id must be positional"
    for gl in t.column("genes").to_pylist():
        assert all(0 <= g < n_var for g in gl) and gl == sorted(gl)
    print(f"SELFTEST OK: {offset} cells, 2 plates -> {out_dir}")


def main(argv):
    if len(argv) == 3 and argv[1] == "--selftest":
        selftest(argv[2])
        return 0
    if len(argv) != 3:
        print(__doc__)
        return 2
    src, out_dir = argv[1], argv[2]
    os.makedirs(out_dir, exist_ok=True)
    files = ([os.path.join(src, f) for f in sorted(os.listdir(src))
              if f.endswith(".h5ad")] if os.path.isdir(src) else [src])
    if not files:
        raise SystemExit(f"no .h5ad files under {src}")
    plates, offset, tables, var_names, n_var = {}, 0, [], None, None
    for p in files:
        table, n_obs, file_n_var, names = convert_one(p, offset)
        # plates must share ONE gene panel: concatenated CSR column ids
        # are only meaningful against a common var axis, and a silent
        # mismatch would densify/join every later plate's genes to the
        # wrong names
        if n_var is None:
            n_var = file_n_var
        elif file_n_var != n_var:
            raise SystemExit(
                f"{p}: n_var {file_n_var} != first file's {n_var} — "
                "plates must share one gene panel")
        if names is not None:
            if var_names is None:
                var_names = names
            elif names != var_names:
                raise SystemExit(
                    f"{p}: var names differ from the first file's — "
                    "plates must share one gene panel")
        tables.append(table)
        plates[os.path.basename(p)] = {"plate_offset": offset,
                                       "n_obs": n_obs}
        offset += n_obs
    pq.write_table(pa.concat_tables(tables),
                   os.path.join(out_dir, "cells.parquet"))
    if var_names:
        write_var(out_dir, var_names)
    with open(os.path.join(out_dir, "plates.json"), "w") as fh:
        json.dump(plates, fh, indent=2)
    print(f"converted {len(files)} file(s), {offset} cells -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
