"""Convert the dump_rom.cpp binary container into an npz of int32 arrays."""

import struct
import sys

import numpy as np


def read_dump(path):
    tables = {}
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic == b"ROMDUMP1", magic
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            (name_len,) = struct.unpack("<I", hdr)
            name = f.read(name_len).decode()
            (ndim,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{ndim}I", f.read(4 * ndim))
            n = int(np.prod(dims)) if ndim else 1
            data = np.frombuffer(f.read(4 * n), dtype="<i4").reshape(dims)
            tables[name] = data
    return tables


def main():
    src, dst = sys.argv[1], sys.argv[2]
    tables = read_dump(src)
    np.savez_compressed(dst, **tables)
    print(f"{dst}: {len(tables)} tables")


if __name__ == "__main__":
    main()
