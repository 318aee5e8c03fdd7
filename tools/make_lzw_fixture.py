#!/usr/bin/env python3
"""Generate an LZW-compressed strip-layout GeoTIFF fixture with an
INDEPENDENT encoder implementation (written from the TIFF 6.0 spec,
section 13), so GeoTiff.lzwDecode is checked against bytes it did not
produce itself (the round-trip tests only prove self-consistency).

Pixel contract (mirrored in GeoTiffSpec "external LZW fixture"):
  64x40 uint16, value(i) = (i*i // 7 + 13*i) % 9973  for i in 0..2559
  rows_per_strip = 16 (3 strips), little-endian,
  EPSG 32633, pixel scale (30, 30), tiepoint (0,0,0 -> 500000, 4000000),
  GDAL_NODATA "0".

Usage: python3 tools/make_lzw_fixture.py src/test/resources/graft/external_lzw.tif
"""
import struct, sys

W, H, RPS = 64, 40, 16
EPSG = 32633


def pixels():
    return [((i * i) // 7 + 13 * i) % 9973 for i in range(W * H)]


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: 9->12 bit codes, MSB-first packing, ClearCode 256,
    EOI 257, early change (width grows when the NEXT code to be assigned
    equals (1<<width)-1), table reset via ClearCode when full."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    emit(256, width)  # leading ClearCode (spec-recommended)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = c
        if next_code >= 4094:  # table full: flush w, reset
            emit(table[w], width)
            emit(256, width)
            table = fresh()
            next_code = 258
            width = 9
            w = b""
    if w:
        emit(table[w], width)
    emit(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def main(path):
    px = pixels()
    strips = []
    for s0 in range(0, H, RPS):
        rows = px[s0 * W:(s0 + min(RPS, H - s0)) * W]
        raw = b"".join(struct.pack("<H", v) for v in rows)
        strips.append(lzw_encode(raw))

    # --- assemble little-endian classic TIFF ------------------------------
    # layout: header(8) | strip data | external values | IFD
    strip_off = []
    pos = 8
    body = bytearray()
    for s in strips:
        strip_off.append(pos)
        body += s
        pos += len(s)

    geokeys = [1, 1, 0, 1, 3072, 0, 1, EPSG]
    entries = [  # (tag, type, raw value bytes) — ascending tag order
        (256, 3, struct.pack("<H", W), 1),
        (257, 3, struct.pack("<H", H), 1),
        (258, 3, struct.pack("<H", 16), 1),
        (259, 3, struct.pack("<H", 5), 1),    # Compression = LZW
        (262, 3, struct.pack("<H", 1), 1),    # Photometric = BlackIsZero
        (273, 4, b"".join(struct.pack("<I", o) for o in strip_off), len(strip_off)),
        (277, 3, struct.pack("<H", 1), 1),
        (278, 3, struct.pack("<H", RPS), 1),
        (279, 4, b"".join(struct.pack("<I", len(s)) for s in strips), len(strips)),
        (339, 3, struct.pack("<H", 1), 1),    # SampleFormat = unsigned int
        (33550, 12, struct.pack("<3d", 30.0, 30.0, 0.0), 3),
        (33922, 12, struct.pack("<6d", 0, 0, 0, 500000.0, 4000000.0, 0), 6),
        (34735, 3, b"".join(struct.pack("<H", k) for k in geokeys), len(geokeys)),
        (42113, 2, b"0\x00", 2),              # GDAL_NODATA "0"
    ]

    # external value area for fields wider than 4 bytes
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
    out += struct.pack("<I", 0)               # next-IFD = none

    with open(path, "wb") as f:
        f.write(out)
    comp = sum(len(s) for s in strips)
    print(f"wrote {path}: {len(out)} bytes, {len(strips)} strips, "
          f"{comp} compressed / {W*H*2} raw")


if __name__ == "__main__":
    main(sys.argv[1])
