"""Transpose a binary sparse matrix (.x -> .xt).

Equivalent of the reference `transpose` tool
(/root/reference/src/libfm/tools/transpose.cpp:53-170), same flags
(--ifile, --ofile; --cache_size accepted for compatibility). Uses the
native C++ counting-sort transpose when available.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="libfm-tpu-transpose")
    p.add_argument("--ifile", required=True)
    p.add_argument("--ofile", required=True)
    p.add_argument("--cache_size", default=None, help="compat only (unused)")
    args = p.parse_args(argv)

    from libfm_tpu.data import binary as binio
    from libfm_tpu.data.dataset import _csr_transpose

    indptr, cols, vals, num_rows, num_cols = binio.read_sparse_binary(args.ifile)
    print(
        f"num_rows={num_rows}\tnum_values={int(indptr[-1])}\t"
        f"num_features={num_cols}"
    )
    try:
        from libfm_tpu.native import fastdata

        if fastdata.available():
            t_indptr, t_rows, t_vals = fastdata.csr_transpose(
                indptr, cols, vals, num_rows, num_cols
            )
        else:
            raise ImportError
    except ImportError:
        t_indptr, t_rows, t_vals = _csr_transpose(
            indptr, cols, vals, num_rows, num_cols
        )
    binio.write_sparse_binary(args.ofile, t_indptr, t_rows, t_vals, num_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
