"""sozip analog: create a Seek-Optimized ZIP (SOZip) archive.

    python scripts/sozip.py out.zip FILE [FILE ...]
        [--chunk-size 32768] [--enable-sozip auto|yes|no] [--num-cpus N]

Reference surface: apps/sozip.cpp over port/cpl_vsil_gzip.cpp's SOZip
writer (public spec at sozip.org: each member's deflate stream is cut
into independently-decompressible chunks — every chunk starts with a
fresh dictionary and ends on a byte boundary via a sync flush — and a
hidden stored member `.<name>.sozip.idx` records the chunk offsets so
readers can seek).  The archive is a fully standard ZIP: stdlib
`zipfile` reads every member back byte-identical.

Distributed shape: chunks compress in PARALLEL, one Ray task per
~64-chunk span (fresh `zlib.compressobj` per chunk is exactly what
makes chunks independent, so parallel compression is lossless);
per-chunk CRC32s fold with crc32_combine driver-side.

Index layout (32-byte header + uint64 little-endian offset per chunk
boundary, chunk i >= 1): version=1 u32 | chunk_size u32 |
uncompressed_size u64 | compressed_size u64 | n_offsets u32 | pad u32.
"""

import argparse
import json
import os
import struct
import sys
import time
import zlib

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")


def _crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """zlib's crc32_combine (GF(2) matrix trick, public zlib
    algorithm): combined CRC of A+B from crc(A), crc(B), len(B)."""
    def times(mat, vec):
        out = 0
        i = 0
        while vec:
            if vec & 1:
                out ^= mat[i]
            vec >>= 1
            i += 1
        return out

    def square(mat):
        return [times(mat, m) for m in mat]

    if len2 <= 0:
        return crc1
    odd = [0xEDB88320] + [1 << (i - 1) for i in range(1, 32)]  # 1 bit
    even = square(odd)   # 2 zero bits
    odd = square(even)   # 4 zero bits
    # first square in the loop makes even = 8 zero bits (one byte);
    # len2 is in bytes, exactly zlib's crc32_combine_ loop
    while True:
        even = square(odd)
        if len2 & 1:
            crc1 = times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        odd = square(even)
        if len2 & 1:
            crc1 = times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break
    return crc1 ^ crc2


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("archive")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--chunk-size", type=int, default=32768)
    ap.add_argument("--enable-sozip", default="auto",
                    choices=["auto", "yes", "no"])
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()
        cs = args.chunk_size

        @ray.remote
        def compress_span(path: str, start: int, end: int, cs: int,
                          final: bool):
            """Compress chunks [start, end) of the file; each chunk is
            an independent raw-deflate segment ending on a byte
            boundary (sync flush), so any reader can start at a chunk
            offset with a fresh inflater."""
            out, sizes, crcs, lens = [], [], [], []
            with open(path, "rb") as f:
                f.seek(start)
                pos = start
                while pos < end:
                    data = f.read(min(cs, end - pos))
                    if not data:
                        break
                    pos += len(data)
                    co = zlib.compressobj(6, zlib.DEFLATED, -15)
                    seg = co.compress(data)
                    if final and pos >= end:
                        seg += co.flush(zlib.Z_FINISH)
                    else:
                        seg += co.flush(zlib.Z_SYNC_FLUSH)
                    out.append(seg)
                    sizes.append(len(seg))
                    crcs.append(zlib.crc32(data))
                    lens.append(len(data))
            return b"".join(out), sizes, crcs, lens

        members = []   # (name, crc, comp_size, uncomp_size, cdata, idx)
        for path in args.files:
            name = os.path.basename(path)
            usize = os.path.getsize(path)
            use_sozip = (args.enable_sozip == "yes" or
                         (args.enable_sozip == "auto" and usize > cs))
            span = max(cs * 64, cs)
            starts = list(range(0, max(usize, 1), span))
            futs = [compress_span.remote(
                path, s, min(s + span, usize), cs,
                s + span >= usize) for s in starts]
            cdata_parts, all_sizes, crc, ulen = [], [], 0, 0
            for part, sizes, crcs, lens in ray.get(futs):
                cdata_parts.append(part)
                all_sizes.extend(sizes)
                for c, ln in zip(crcs, lens):
                    crc = _crc32_combine(crc, c, ln)
                    ulen += ln
            cdata = b"".join(cdata_parts)
            idx = None
            if use_sozip and len(all_sizes) > 1:
                offsets = []
                acc = 0
                for s in all_sizes[:-1]:
                    acc += s
                    offsets.append(acc)
                idx = (struct.pack("<IIQQII", 1, cs, ulen, len(cdata),
                                   len(offsets), 0)
                       + b"".join(struct.pack("<Q", o) for o in offsets))
            members.append((name, crc & 0xFFFFFFFF, cdata, ulen, idx))

        # write the zip: local headers + data, then central directory
        out = open(args.archive + ".tmp", "wb")
        central = []

        def write_member(name: str, data: bytes, method: int,
                         crc: int, usize: int):
            off = out.tell()
            nb = name.encode()
            out.write(struct.pack("<IHHHHHIII", 0x04034B50, 20, 0,
                                  method, 0, 0x21, crc, len(data),
                                  usize) + struct.pack("<HH", len(nb), 0))
            out.write(nb)
            out.write(data)
            central.append(struct.pack(
                "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, method,
                0, 0x21, crc, len(data), usize, len(nb), 0, 0, 0, 0,
                0, off) + nb)

        n_sozip = 0
        for name, crc, cdata, usize, idx in members:
            write_member(name, cdata, 8, crc, usize)
            if idx is not None:
                write_member(f".{name}.sozip.idx", idx, 0,
                             zlib.crc32(idx) & 0xFFFFFFFF, len(idx))
                n_sozip += 1
        cd_off = out.tell()
        for c in central:
            out.write(c)
        cd_size = out.tell() - cd_off
        out.write(struct.pack("<IHHHHIIH", 0x06054B50, 0, 0,
                              len(central), len(central), cd_size,
                              cd_off, 0))
        out.close()
        os.replace(args.archive + ".tmp", args.archive)
        print(json.dumps({"archive": args.archive,
                          "n_members": len(members),
                          "n_sozip": n_sozip, "chunk_size": cs,
                          "bytes": os.path.getsize(args.archive),
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
