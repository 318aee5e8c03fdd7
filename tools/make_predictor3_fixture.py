#!/usr/bin/env python3
"""Generate a deflate + predictor-3 (floating-point horizontal differencing)
tiled float32 GeoTIFF fixture with an INDEPENDENT encoder implementation
(written from TIFF Technical Note 3), so GeoTiff.undiffRowsFP is checked
against bytes it did not produce itself. This is the exact profile the
reference writes for every NDVI product (compute_ndvi.py:82-84: deflate,
predictor 3, 256x256 tiles, nodata -9999).

Pixel contract (mirrored in GeoTiffSpec "external predictor-3 fixture"):
  320x272 float32, value(i) = -9999.0 if i % 37 == 0
                              else (i % 4096) * 0.125 - 256.0
  (both branches exactly representable in float32), 256-px tiles
  (2x2 grid, edge tiles clipped on decode), little-endian, EPSG 32635,
  pixel scale (30, 30), tiepoint (0,0,0 -> 600000, 6700000),
  GDAL_NODATA "-9999".

Predictor 3, per tile row (TIFF TechNote 3): split each float32 into its
4 bytes in big-endian order and group them into byte planes (all MSBs
first, then the next byte, ...), then apply byte-wise horizontal
differencing over the reordered row. Deflate compresses the result.

Usage: python3 tools/make_predictor3_fixture.py src/test/resources/graft/external_pred3.tif
"""
import struct, sys, zlib

W, H, TS = 320, 272, 256
EPSG = 32635
NODATA = -9999.0


def value(i):
    return NODATA if i % 37 == 0 else (i % 4096) * 0.125 - 256.0


def predict_row(samples):
    """float list -> predictor-3 bytes for one row: big-endian byte-plane
    split, then horizontal byte delta."""
    be = b"".join(struct.pack(">f", v) for v in samples)
    n = len(samples)
    planes = bytearray(4 * n)
    for s in range(n):
        for b in range(4):
            planes[b * n + s] = be[4 * s + b]
    out = bytearray(planes)
    for i in range(len(out) - 1, 0, -1):
        out[i] = (out[i] - out[i - 1]) & 0xFF
    return bytes(out)


def main(path):
    tiles_across = (W + TS - 1) // TS
    tiles_down = (H + TS - 1) // TS
    payloads = []
    for tr in range(tiles_down):
        for tc in range(tiles_across):
            rows = []
            for r in range(TS):
                row = []
                for c in range(TS):
                    gr, gc = tr * TS + r, tc * TS + c
                    inside = gr < H and gc < W
                    row.append(value(gr * W + gc) if inside else 0.0)
                rows.append(predict_row(row))
            payloads.append(zlib.compress(b"".join(rows), 6))

    # --- assemble little-endian classic TIFF ------------------------------
    tile_off = []
    pos = 8
    body = bytearray()
    for p in payloads:
        tile_off.append(pos)
        body += p
        pos += len(p)

    geokeys = [1, 1, 0, 1, 3072, 0, 1, EPSG]
    entries = [  # (tag, type, raw value bytes, count) — ascending tag order
        (256, 3, struct.pack("<H", W), 1),
        (257, 3, struct.pack("<H", H), 1),
        (258, 3, struct.pack("<H", 32), 1),
        (259, 3, struct.pack("<H", 8), 1),    # Compression = deflate
        (262, 3, struct.pack("<H", 1), 1),
        (277, 3, struct.pack("<H", 1), 1),
        (317, 3, struct.pack("<H", 3), 1),    # Predictor = floating point
        (322, 3, struct.pack("<H", TS), 1),
        (323, 3, struct.pack("<H", TS), 1),
        (324, 4, b"".join(struct.pack("<I", o) for o in tile_off), len(tile_off)),
        (325, 4, b"".join(struct.pack("<I", len(p)) for p in payloads), len(payloads)),
        (339, 3, struct.pack("<H", 3), 1),    # SampleFormat = IEEE float
        (33550, 12, struct.pack("<3d", 30.0, 30.0, 0.0), 3),
        (33922, 12, struct.pack("<6d", 0, 0, 0, 600000.0, 6700000.0, 0), 6),
        (34735, 3, b"".join(struct.pack("<H", k) for k in geokeys), len(geokeys)),
        (42113, 2, b"-9999\x00", 6),          # GDAL_NODATA
    ]

    ext_base = pos
    ext = bytearray()
    fields = []
    for tag, typ, raw, cnt in entries:
        if len(raw) <= 4:
            fields.append((tag, typ, cnt, raw + b"\x00" * (4 - len(raw))))
        else:
            fields.append((tag, typ, cnt, struct.pack("<I", ext_base + len(ext))))
            ext += raw
    pos += len(ext)
    ifd_off = pos

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += body
    out += ext
    out += struct.pack("<H", len(fields))
    for tag, typ, cnt, val4 in fields:
        out += struct.pack("<HHI", tag, typ, cnt) + val4
    out += struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(out)
    comp = sum(len(p) for p in payloads)
    print(f"wrote {path}: {len(out)} bytes, {len(payloads)} tiles, "
          f"{comp} compressed / {tiles_across*tiles_down*TS*TS*4} raw")


if __name__ == "__main__":
    main(sys.argv[1])
