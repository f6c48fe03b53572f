"""Convert libFM text data to the binary .x/.y format.

Equivalent of the reference `convert` tool
(/root/reference/src/libfm/tools/convert.cpp:55-205): same flags
(--ifile, --ofilex, --ofiley), same on-disk formats (sparse file_header
matrix + DVector targets), interop-tested against the reference binary.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="libfm-tpu-convert")
    p.add_argument("--ifile", required=True, help="input libFM text file")
    p.add_argument("--ofilex", required=True, help="output binary sparse matrix")
    p.add_argument("--ofiley", required=True, help="output binary targets")
    args = p.parse_args(argv)

    import numpy as np

    from libfm_tpu.data import binary as binio
    from libfm_tpu.data.text import parse_libfm_text

    indptr, cols, vals, target, num_features = parse_libfm_text(args.ifile)
    print(
        f"num_rows={len(target)}\tnum_values={int(indptr[-1])}\t"
        f"num_features={num_features}\t"
        f"min_target={target.min() if len(target) else 0}\t"
        f"max_target={target.max() if len(target) else 0}"
    )
    binio.write_sparse_binary(args.ofilex, indptr, cols, vals, num_features)
    binio.write_dvector_binary(args.ofiley, np.asarray(target, dtype=np.float32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
