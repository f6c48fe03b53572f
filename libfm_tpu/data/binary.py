"""Binary file-format interop with the reference tooling.

Three binary formats are reproduced byte-for-byte so that files produced by
the reference's `convert` / `transpose` tools load here and vice versa:

1. Sparse matrix (`.x` / `.xt` / `.data` / `.datat`):
   a 24-byte header `file_header{uint id; uint float_size; uint64
   num_values; uint num_rows; uint num_cols}` with id==2
   (/root/reference/src/util/fmatrix.h:32,44-50), followed per row by
   `uint size` then `size` packed `sparse_entry{uint id; float value}`
   records (/root/reference/src/util/fmatrix.h:124-143).

2. Dense vector (`.y` / `.target`): `uint id(==1); uint type_size; uint
   num_rows` then the raw values (/root/reference/src/util/matrix.h:32,
   344-358).

3. Dense matrix: `dmatrix_file_header{uint id(==1001); uint type_size;
   uint num_rows; uint num_cols}` then row-major values
   (/root/reference/src/util/matrix.h:33-40,219-254).
"""

from __future__ import annotations

import struct

import numpy as np

FMATRIX_FILE_ID = 2
DVECTOR_FILE_ID = 1
DMATRIX_FILE_ID = 1001

# uint id, uint float_size, uint64 num_values, uint num_rows, uint num_cols
_FMATRIX_HEADER = struct.Struct("<IIQII")
_DVECTOR_HEADER = struct.Struct("<III")
_DMATRIX_HEADER = struct.Struct("<IIII")


def read_sparse_binary(path: str):
    """Read a reference-format binary sparse matrix.

    Returns (indptr[int64], cols[int32], vals[float32], num_rows, num_cols).
    """
    with open(path, "rb") as f:
        buf = f.read()
    fid, float_size, num_values, num_rows, num_cols = _FMATRIX_HEADER.unpack_from(
        buf, 0
    )
    if fid != FMATRIX_FILE_ID:
        raise ValueError(f"{path}: bad sparse-matrix file id {fid}")
    if float_size != 4:
        raise ValueError(f"{path}: unsupported float size {float_size}")
    indptr = np.zeros(num_rows + 1, dtype=np.int64)
    cols = np.empty(num_values, dtype=np.int32)
    vals = np.empty(num_values, dtype=np.float32)
    off = _FMATRIX_HEADER.size
    pos = 0
    u32 = np.dtype("<u4")
    for i in range(num_rows):
        (size,) = struct.unpack_from("<I", buf, off)
        off += 4
        if size:
            entries = np.frombuffer(buf, dtype=u32, count=2 * size, offset=off)
            cols[pos : pos + size] = entries[0::2].astype(np.int32)
            vals[pos : pos + size] = entries[1::2].view("<f4")
            off += 8 * size
            pos += size
        indptr[i + 1] = pos
    if pos != num_values:
        raise ValueError(f"{path}: header says {num_values} values, read {pos}")
    return indptr, cols, vals, num_rows, num_cols


def write_sparse_binary(path: str, indptr, cols, vals, num_cols: int) -> None:
    """Write CSR arrays in the reference binary sparse-matrix format."""
    num_rows = len(indptr) - 1
    num_values = int(indptr[-1])
    cols = np.ascontiguousarray(cols, dtype="<u4")
    vals = np.ascontiguousarray(vals, dtype="<f4")
    with open(path, "wb") as f:
        f.write(
            _FMATRIX_HEADER.pack(
                FMATRIX_FILE_ID, 4, num_values, num_rows, int(num_cols)
            )
        )
        for i in range(num_rows):
            s, e = int(indptr[i]), int(indptr[i + 1])
            size = e - s
            f.write(struct.pack("<I", size))
            if size:
                interleaved = np.empty(2 * size, dtype="<u4")
                interleaved[0::2] = cols[s:e]
                interleaved[1::2] = vals[s:e].view("<u4")
                f.write(interleaved.tobytes())


_DTYPE_BY_SIZE = {4: None, 8: None}  # resolved per call with float/int hint


def read_dvector_binary(path: str, dtype=None):
    """Read a reference-format binary dense vector.

    dtype defaults to float32 for 4-byte elements and float64 for 8-byte;
    pass an explicit dtype (e.g. np.uint32) to override interpretation.
    """
    with open(path, "rb") as f:
        buf = f.read()
    fid, type_size, num_rows = _DVECTOR_HEADER.unpack_from(buf, 0)
    if fid != DVECTOR_FILE_ID:
        raise ValueError(f"{path}: bad dvector file id {fid}")
    if dtype is None:
        dtype = {4: np.float32, 8: np.float64}[type_size]
    dtype = np.dtype(dtype)
    if dtype.itemsize != type_size:
        raise ValueError(
            f"{path}: element size {type_size} != dtype {dtype} size"
        )
    return np.frombuffer(
        buf, dtype=dtype.newbyteorder("<"), count=num_rows, offset=_DVECTOR_HEADER.size
    ).astype(dtype)


def write_dvector_binary(path: str, arr) -> None:
    arr = np.asarray(arr)
    with open(path, "wb") as f:
        f.write(_DVECTOR_HEADER.pack(DVECTOR_FILE_ID, arr.dtype.itemsize, len(arr)))
        f.write(np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<")).tobytes())


def is_dvector_binary(path: str, type_size: int) -> bool:
    """Sniff whether a file is a binary DVector with the given element size.

    Mirrors RelationJoin::load's format autodetection
    (/root/reference/src/libfm/src/relation.h:127-140).
    """
    try:
        with open(path, "rb") as f:
            head = f.read(8)
        if len(head) < 8:
            return False
        fid, tsize = struct.unpack("<II", head)
        return fid == DVECTOR_FILE_ID and tsize == type_size
    except OSError:
        return False


def read_dmatrix_binary(path: str, dtype=None):
    with open(path, "rb") as f:
        buf = f.read()
    fid, type_size, num_rows, num_cols = _DMATRIX_HEADER.unpack_from(buf, 0)
    if fid != DMATRIX_FILE_ID:
        raise ValueError(f"{path}: bad dmatrix file id {fid}")
    if dtype is None:
        dtype = {4: np.float32, 8: np.float64}[type_size]
    dtype = np.dtype(dtype)
    out = np.frombuffer(
        buf,
        dtype=dtype.newbyteorder("<"),
        count=num_rows * num_cols,
        offset=_DMATRIX_HEADER.size,
    ).astype(dtype)
    return out.reshape(num_rows, num_cols)


def write_dmatrix_binary(path: str, arr) -> None:
    arr = np.asarray(arr)
    assert arr.ndim == 2
    with open(path, "wb") as f:
        f.write(
            _DMATRIX_HEADER.pack(
                DMATRIX_FILE_ID, arr.dtype.itemsize, arr.shape[0], arr.shape[1]
            )
        )
        f.write(np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<")).tobytes())
