"""Delta Lake deletion-vector codec — public-spec implementation.

Drill reads Delta through delta-standalone, which resolves deletion
vectors inside the library (reference: contrib/format-deltalake/
src/main/java/org/apache/drill/exec/store/delta/DeltaRowGroupScan.java).
No connector jar ships in this environment, so this module implements
the protocol's published deletion-vector format directly
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format"):

- a DV is a set of 64-bit row indexes into one data file, stored as a
  *RoaringBitmapArray*: ``magic 1681511377 (4B LE)`` + ``number of
  32-bit bitmaps (8B LE)`` + that many standard-format 32-bit Roaring
  bitmaps concatenated; bitmap ``i`` holds the low 32 bits of indexes
  whose high 32 bits equal ``i``.
- the 32-bit bitmaps use the public Roaring interchange format
  (https://github.com/RoaringBitmap/RoaringFormatSpec): cookie 12347
  (no run containers, container count follows) or 12346 (run-container
  bitset follows, count in the cookie's high 16 bits), a descriptive
  header of (key, cardinality-1) pairs, an optional offset header, then
  array (sorted u16 list), bitset (8 KiB), or run (count + start/len
  pairs) containers.
- on disk a DV file starts with a format-version byte (1); each vector
  sits at its descriptor ``offset`` as ``size (4B big-endian)`` +
  ``data`` + ``CRC-32(data) (4B big-endian)``, where ``data`` is the
  serialized RoaringBitmapArray and ``size == sizeInBytes`` from the
  descriptor.
- descriptors address storage as ``storageType`` "u" (path =
  ``<optional random prefix><20-char Z85-encoded UUID>`` relative to
  the table root, file named ``deletion_vector_<uuid>.bin``), "i"
  (the data itself Z85-inlined into the descriptor), or "p" (absolute
  path).

Pure Python over ``struct``/``zlib`` — the decode runs driver-side
once per snapshot (DV descriptors are table metadata, like the rest of
the transaction log), and the expansion to row indexes happens on
executors (see readers/delta.py).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12347
_SERIAL_COOKIE_RUN = 12346
_NO_OFFSET_THRESHOLD = 4

# --- Z85 (ZeroMQ base-85, the alphabet the Delta spec names) ---------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 encodes 4-byte groups")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 decodes 5-char groups")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


# --- 32-bit Roaring bitmap (interchange format) ----------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted distinct u32 values; array containers up to and
    including 4096 cardinality (the spec's array/bitset boundary — the
    reader side uses ``card <= 4096``), bitset containers above (we
    never emit run containers — cookie 12347 says so, any reader must
    accept it)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    bodies = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
    offsets = []
    pos = len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    return head + desc + struct.pack(f"<{n}I", *offsets) + b"".join(bodies)


def _deserialize_roaring32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one 32-bit bitmap starting at ``base``; returns (values,
    end offset). Accepts array, bitset, and run containers under either
    cookie."""
    cookie = struct.unpack_from("<I", buf, base)[0]
    pos = base + 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        nrun_bytes = (n + 7) // 8
        run_flags = buf[pos : pos + nrun_bytes]
        pos += nrun_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    desc = [struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offset header — sequential decode doesn't need it
    out: list[int] = []
    for i, (key, card_m1) in enumerate(desc):
        card = card_m1 + 1
        hi = key << 16
        if run_flags[i >> 3] & (1 << (i & 7)):
            nruns = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            for _ in range(nruns):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(hi | (wi << 6) | low.bit_length() - 1)
                    w ^= low
    return out, pos


# --- RoaringBitmapArray (the 64-bit form Delta serializes) -----------------


def serialize_bitmap_array(row_indexes) -> bytes:
    """64-bit row indexes -> magic + bitmap-count + 32-bit bitmaps."""
    groups: dict[int, list[int]] = {}
    for v in sorted(set(int(v) for v in row_indexes)):
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    if groups and sorted(groups) != list(range(max(groups) + 1)):
        # the portable format indexes bitmaps densely from 0
        for i in range(max(groups) + 1):
            groups.setdefault(i, [])
    parts = [struct.pack("<iq", DV_MAGIC, len(groups))]
    for i in sorted(groups):
        parts.append(_serialize_roaring32(groups[i]))
    return b"".join(parts)


def deserialize_bitmap_array(data: bytes) -> list[int]:
    magic, nbitmaps = struct.unpack_from("<iq", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(nbitmaps):
        vals, pos = _deserialize_roaring32(data, pos)
        out.extend((i << 32) | v for v in vals)
    return out


# --- DV files + descriptors ------------------------------------------------


def write_dv_file(table_path: str, row_indexes) -> dict:
    """Serialize one DV into a fresh ``deletion_vector_<uuid>.bin`` under
    the table root (storageType "u", no random prefix) and return its
    ``deletionVector`` descriptor."""
    data = serialize_bitmap_array(row_indexes)
    uid = _uuid.uuid4()
    fname = f"deletion_vector_{uid}.bin"
    payload = (
        b"\x01"
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    with open(os.path.join(table_path, fname), "wb") as f:
        f.write(payload)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(uid.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(set(int(v) for v in row_indexes)),
    }


def read_descriptor(table_path: str, desc: dict) -> list[int]:
    """Resolve a ``deletionVector`` descriptor to its 64-bit row indexes."""
    st = desc["storageType"]
    if st == "i":
        return deserialize_bitmap_array(z85_decode(desc["pathOrInlineDv"]))
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uid_part = enc[:-20], enc[-20:]
        uid = _uuid.UUID(bytes=z85_decode(uid_part))
        fpath = os.path.join(table_path, prefix, f"deletion_vector_{uid}.bin")
    elif st == "p":
        fpath = desc["pathOrInlineDv"]
        if fpath.startswith("file:"):
            fpath = fpath[len("file:") :]
    else:
        raise NotImplementedError(f"deletion-vector storageType {st!r}")
    with open(fpath, "rb") as f:
        blob = f.read()
    off = desc.get("offset", 1)
    size = struct.unpack_from(">i", blob, off)[0]
    data = blob[off + 4 : off + 4 + size]
    if desc.get("sizeInBytes") not in (None, size):
        raise ValueError("deletion-vector sizeInBytes mismatch")
    crc = struct.unpack_from(">I", blob, off + 4 + size)[0]
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion-vector checksum mismatch")
    return deserialize_bitmap_array(data)


def descriptor_unique_id(desc: dict | None) -> str | None:
    """The spec's DV unique id — add/remove reconciliation key part."""
    if not desc:
        return None
    uid = f"{desc['storageType']}{desc['pathOrInlineDv']}"
    if desc.get("offset") is not None:
        uid += f"@{desc['offset']}"
    return uid


def descriptor_relative_path(desc: dict) -> str | None:
    """Table-relative file path of a DV descriptor, or None when the DV
    is inline (storageType "i") or absolute ("p") — used by VACUUM to
    keep live DV files."""
    if not desc or desc.get("storageType") != "u":
        return None
    enc = desc["pathOrInlineDv"]
    prefix, uid_part = enc[:-20], enc[-20:]
    uid = _uuid.UUID(bytes=z85_decode(uid_part))
    rel = f"deletion_vector_{uid}.bin"
    return os.path.join(prefix, rel) if prefix else rel
