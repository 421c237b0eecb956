"""Pure-Python NetCDF-3 *classic* reader/writer (SURVEY §2.1 S2).

The reference scans NetCDF granules via GDAL
(odin_gdal/src/lib.rs:431-472: open dataset → pick variable → read a
masked 2-D slice); this container has no netCDF4/h5py/GDAL, but the
NetCDF-3 classic file format is a small, fully public struct layout
(Unidata "NetCDF Classic Format Specification"): a big-endian header
(magic ``CDF\\x01``/``CDF\\x02``, dim/attr/var lists with 4-byte-padded
names) followed by row-major big-endian variable data. ~150 lines of
``struct`` decode turn S2 from a stubbed seam into a real end-to-end
byte path — no blocked library involved.

Scope: classic CDF-1/CDF-2 files, fixed and record variables, all six
classic types. Not HDF5-backed NetCDF-4 (a different container format
that genuinely needs h5py; the deployment swap point is unchanged).

Scale shape (`netcdf_grid_cells`): one binary-file scan → `mapInPandas`
decode per granule → the standard cell DataFrame (x, y, value[, …]).
Granules are independent rows, so 10⁶ granules fan out embarrassingly;
the mask predicate is applied INSIDE the decode kernel on the numpy
array (the pushed-filter parity of the reference's masked read), so
masked-out cells never materialize as Spark rows.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (struct/numpy dtype, size)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_REV_TYPES = {np.dtype("int8"): 1, np.dtype("int16"): 3, np.dtype("int32"): 4,
              np.dtype("float32"): 5, np.dtype("float64"): 6}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF-3 file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(n).decode("utf-8")
        self.take(_pad4(n))
        return s

    def attr_values(self, nc_type: int, nelems: int):
        dt, size = _TYPES[nc_type]
        raw = self.take(nelems * size)
        self.take(_pad4(nelems * size))
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=dt).tolist()

    def att_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        if tag == 0 and n == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag}")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.i4()
            k = self.i4()
            out[nm] = self.attr_values(t, k)
        return out


def parse_netcdf3(buf: bytes) -> dict:
    """Decode a classic NetCDF-3 byte string → header + full variable
    arrays. Returns {"dims": [(name, length)], "numrecs": int,
    "attrs": {...}, "vars": {name: {"dims", "shape", "attrs", "data"}}}
    with data as numpy arrays in native byte order.

    Error contract: EVERY malformed input raises ValueError (struct /
    index / overflow errors are wrapped) — a 100 TB scan wants one
    catchable exception type per corrupt granule, not whatever a
    truncated buffer happens to trip (see `netcdf_grid_cells`
    on_error="skip")."""
    try:
        return _parse_netcdf3(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError, OverflowError…
        raise ValueError(f"corrupt NetCDF-3 file: {exc}") from exc


def _parse_netcdf3(buf: bytes) -> dict:
    c = _Cursor(buf)
    if c.take(3) != b"CDF":
        raise ValueError("not a NetCDF classic file (bad magic)")
    version = c.take(1)[0]
    if version not in (1, 2):
        raise ValueError(f"unsupported NetCDF version byte {version} (classic only)")
    offs = c.i8 if version == 2 else c.i4
    numrecs = c.i4()

    dims: list[tuple[str, int]] = []
    tag, n = c.i4(), c.i4()
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dims.append((c.name(), c.i4()))
    elif not (tag == 0 and n == 0):
        raise ValueError(f"bad dimension-list tag {tag}")

    gattrs = c.att_list()

    variables: dict[str, dict] = {}
    rec_vars: list[str] = []
    tag, n = c.i4(), c.i4()
    if tag == _NC_VARIABLE:
        for _ in range(n):
            nm = c.name()
            ndims = c.i4()
            dimids = [c.i4() for _ in range(ndims)]
            vattrs = c.att_list()
            nc_type = c.i4()
            vsize = c.i4()
            begin = offs()
            variables[nm] = {
                "dimids": dimids,
                "attrs": vattrs,
                "nc_type": nc_type,
                "vsize": vsize,
                "begin": begin,
            }
            if dimids and dims[dimids[0]][1] == 0:
                rec_vars.append(nm)
    elif not (tag == 0 and n == 0):
        raise ValueError(f"bad variable-list tag {tag}")

    recsize = sum(variables[v]["vsize"] for v in rec_vars)
    if numrecs == -1:
        # STREAMING sentinel (0xFFFFFFFF = numrecs unknown, spec: derive
        # from file size). Read as signed i4 this is -1; without this
        # branch it surfaced later as a wrapped 'negative dimensions'
        # error instead of being computed.
        if rec_vars and recsize > 0:
            first_begin = min(variables[v]["begin"] for v in rec_vars)
            numrecs = max(0, (len(buf) - first_begin) // recsize)
        else:
            numrecs = 0
    elif numrecs < 0:
        raise ValueError(f"corrupt NetCDF-3 file: negative numrecs {numrecs}")
    if rec_vars and numrecs * max(recsize, 1) > len(buf):
        # bound the per-record chunk loop by the buffer: a corrupt
        # numrecs (mutated int32) would otherwise iterate billions of
        # times building empty slices — the unbounded-loop class the
        # GRIB2 section-length fuzzer caught
        raise ValueError(
            f"corrupt NetCDF-3 file: numrecs={numrecs} exceeds the file size"
        )
    out_vars: dict[str, dict] = {}
    for nm, v in variables.items():
        dt, size = _TYPES[v["nc_type"]]
        dim_names = [dims[i][0] for i in v["dimids"]]
        shape = [dims[i][1] for i in v["dimids"]]
        if nm in rec_vars:
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            chunks = [
                np.frombuffer(
                    buf[v["begin"] + r * recsize : v["begin"] + r * recsize + per_rec * size],
                    dtype=dt,
                )
                for r in range(numrecs)
            ]
            data = (
                np.concatenate(chunks).reshape(shape)
                if chunks
                else np.empty(shape, dtype=dt)
            )
        else:
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            if v["begin"] + count * size > len(buf):
                raise ValueError(
                    f"truncated NetCDF-3 file: variable {nm!r} data section "
                    f"ends past EOF"
                )
            data = np.frombuffer(
                buf[v["begin"] : v["begin"] + count * size], dtype=dt
            ).reshape(shape)
        if v["nc_type"] != 2:
            data = data.astype(data.dtype.newbyteorder("="))
        out_vars[nm] = {"dims": dim_names, "shape": shape, "attrs": v["attrs"], "data": data}
    return {"dims": dims, "numrecs": numrecs, "attrs": gattrs, "vars": out_vars}


def write_netcdf3(
    path: str,
    dims: list[tuple[str, int]],
    variables: dict[str, tuple[list[str], np.ndarray]],
    attrs: dict | None = None,
) -> None:
    """Minimal classic CDF-1 writer (fixed-size variables only) — the
    fixture generator and the K-side product twin of the reader. Data is
    written big-endian row-major with 4-byte padding, exactly per spec,
    so any standard NetCDF tool reads the output."""
    dim_index = {nm: i for i, (nm, _) in enumerate(dims)}

    def name_bytes(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))

    # layout pass: header size, then assign begins
    header = b"CDF\x01" + struct.pack(">i", 0)  # numrecs=0 (no record vars)
    header += struct.pack(">ii", _NC_DIMENSION, len(dims)) if dims else struct.pack(">ii", 0, 0)
    for nm, ln in dims:
        header += name_bytes(nm) + struct.pack(">i", ln)
    header += struct.pack(">ii", 0, 0)  # no global attrs (kept minimal)
    if attrs:
        raise NotImplementedError("writer keeps the header minimal: no attrs")
    header += struct.pack(">ii", _NC_VARIABLE, len(variables))

    bodies = []
    var_heads = []
    for nm, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        nc_type = _REV_TYPES[arr.dtype.newbyteorder("=")]
        dt, size = _TYPES[nc_type]
        raw = arr.astype(dt).tobytes()
        vsize = len(raw) + _pad4(len(raw))
        vh = name_bytes(nm)
        vh += struct.pack(">i", len(vdims))
        for d in vdims:
            vh += struct.pack(">i", dim_index[d])
        vh += struct.pack(">ii", 0, 0)  # no var attrs
        vh += struct.pack(">ii", nc_type, vsize)
        var_heads.append(vh)
        bodies.append(raw + b"\x00" * _pad4(len(raw)))

    fixed = len(header) + sum(len(h) + 4 for h in var_heads)  # +4: begin i4
    begins = []
    pos = fixed
    for b in bodies:
        begins.append(pos)
        pos += len(b)

    with open(path, "wb") as f:
        f.write(header)
        for vh, bg in zip(var_heads, begins):
            f.write(vh + struct.pack(">i", bg))
        for b in bodies:
            f.write(b)


NC_GRID_CELL_SCHEMA = "path string, x int, y int, value double, mask double"


def netcdf_decode_errors(files_df):
    """Dead-letter audit for a granule scan: one (path, error) row per
    file that fails to parse — the countable record a skip-mode
    pipeline pairs with (same philosophy as `lsh_oversized_buckets`:
    never drop silently, always emit the audit)."""
    import pandas as pd

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            paths, errs = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    parse_netcdf3(bytes(content))
                except ValueError as exc:
                    paths.append(path)
                    errs.append(str(exc)[:500])
            yield pd.DataFrame({"path": paths, "error": errs})

    return files_df.select("path", "content").mapInPandas(
        probe, "path string, error string"
    )


def netcdf_grid_cells(
    files_df,
    value_var: str,
    mask_var: str | None = None,
    x_dim: str = "x",
    y_dim: str = "y",
    mask_min: float | None = None,
    on_error: str = "raise",
):
    """S2 — binary .nc granules → the standard cell DataFrame.

    `files_df` is ``spark.read.format("binaryFile")`` output (or any DF
    with `path` + `content`); each granule decodes independently in
    `mapInPandas`, emitting (path, x, y, value, mask) rows for the 2-D
    `value_var` (dims [y_dim, x_dim], row-major). When `mask_min` is
    given, the mask predicate runs on the numpy array INSIDE the kernel
    — the reference's masked read (odin_gdal/src/lib.rs:431-472) — so
    excluded cells never become rows.

    `on_error`: "raise" (default) fails the task on a corrupt granule;
    "skip" drops it — pair with `netcdf_decode_errors` for the audit
    (at 10⁶ granules one bad file must not kill the scan, but it must
    stay countable)."""
    import pandas as pd

    from odin_rs_spark.deploy import ensure_shipped

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    # the decode closure references module-level parsers (pickled by
    # reference): ship the package so binaryFile-only pipelines work on
    # external-cwd harnesses that never touched load_table
    ensure_shipped(files_df.sparkSession)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    nc = parse_netcdf3(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                v = nc["vars"][value_var]
                if v["dims"] != [y_dim, x_dim]:
                    raise ValueError(
                        f"{value_var} dims {v['dims']} != [{y_dim}, {x_dim}]"
                    )
                val = np.asarray(v["data"], dtype=np.float64)
                h, w = val.shape
                if mask_var is not None:
                    msk = np.asarray(nc["vars"][mask_var]["data"], dtype=np.float64)
                else:
                    msk = np.ones_like(val)
                yy, xx = np.mgrid[0:h, 0:w]
                keep = (
                    np.ones(val.shape, dtype=bool)
                    if mask_min is None
                    else (msk >= mask_min)
                )
                yield pd.DataFrame(
                    {
                        "path": path,
                        "x": xx[keep].astype(np.int32),
                        "y": yy[keep].astype(np.int32),
                        "value": val[keep],
                        "mask": msk[keep],
                    }
                )

    return files_df.select("path", "content").mapInPandas(
        decode, NC_GRID_CELL_SCHEMA
    )
