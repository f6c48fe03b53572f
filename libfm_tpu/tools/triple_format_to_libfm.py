"""Convert triple/tuple files (id1 id2 ... target) to libFM text format.

Equivalent of the reference Perl script
(/root/reference/scripts/triple_format_to_libfm.pl:29-117): assigns dense
one-hot feature ids per (column, value) pair, shared across all input
files; optional --outmeta writes one group id per created attribute
(the group = the post-delete column index). Flags mirror the script:
--in (comma/semicolon list), --header, --target_column, --delete_column,
--offset, --separator, --outmeta.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="libfm-tpu-triple-format")
    p.add_argument("--in", dest="infiles", required=True)
    p.add_argument("--header", type=int, default=0)
    p.add_argument("--target_column", type=int, required=True)
    p.add_argument("--delete_column", default="")
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--separator", default=" ")
    p.add_argument("--outmeta", default=None)
    args = p.parse_args(argv)

    files = [f for f in args.infiles.replace(";", ",").split(",") if f]
    delete = {
        int(c) for c in args.delete_column.replace(";", ",").split(",") if c
    }
    ids: dict[tuple[int, str], int] = {}
    id_cntr = args.offset
    groups_out = open(args.outmeta, "w") if args.outmeta else None

    for fname in files:
        fout = fname + ".libfm"
        print(f"transforming file {fname} to {fout}...")
        with open(fname) as fin, open(fout, "w") as out:
            if args.header:
                fin.readline()
            for lineno, line in enumerate(fin):
                line = line.rstrip("\n")
                if not line:
                    continue
                data = line.split(args.separator)
                if len(data) <= args.target_column:
                    raise ValueError(
                        f"not enough values in line {lineno}, expected at "
                        f"least {args.target_column} values\nfound {line}"
                    )
                parts = [data[args.target_column]]
                out_col_id = 0  # post-delete column index == group id
                for i, v in enumerate(data):
                    if i == args.target_column or i in delete:
                        continue
                    key = (out_col_id, v)
                    fid = ids.get(key)
                    if fid is None:
                        fid = ids[key] = id_cntr
                        id_cntr += 1
                        if groups_out is not None:
                            groups_out.write(f"{out_col_id}\n")
                    parts.append(f"{fid}:1")
                    out_col_id += 1
                out.write(" ".join(parts) + "\n")

    if groups_out is not None:
        groups_out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
