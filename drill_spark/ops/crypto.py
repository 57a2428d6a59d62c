"""MD2 (RFC 1319) — the one digest in the reference's CryptoFunctions
(contrib/udfs/.../CryptoFunctions.java) that Spark has no builtin for.
From-scratch implementation of the published RFC; md5/sha*/aes ride on
Catalyst builtins in drill_spark.functions.
"""

from __future__ import annotations

# RFC 1319 appendix: the 256-byte substitution table derived from pi
_S = bytes([
    41, 46, 67, 201, 162, 216, 124, 1, 61, 54, 84, 161, 236, 240, 6, 19,
    98, 167, 5, 243, 192, 199, 115, 140, 152, 147, 43, 217, 188, 76, 130,
    202, 30, 155, 87, 60, 253, 212, 224, 22, 103, 66, 111, 24, 138, 23,
    229, 18, 190, 78, 196, 214, 218, 158, 222, 73, 160, 251, 245, 142,
    187, 47, 238, 122, 169, 104, 121, 145, 21, 178, 7, 63, 148, 194, 16,
    137, 11, 34, 95, 33, 128, 127, 93, 154, 90, 144, 50, 39, 53, 62, 204,
    231, 191, 247, 151, 3, 255, 25, 48, 179, 72, 165, 181, 209, 215, 94,
    146, 42, 172, 86, 170, 198, 79, 184, 56, 210, 150, 164, 125, 182, 118,
    252, 107, 226, 156, 116, 4, 241, 69, 157, 112, 89, 100, 113, 135, 32,
    134, 91, 207, 101, 230, 45, 168, 2, 27, 96, 37, 173, 174, 176, 185,
    246, 28, 70, 97, 105, 52, 64, 126, 15, 85, 71, 163, 35, 221, 81, 175,
    58, 195, 92, 249, 206, 186, 197, 234, 38, 44, 83, 13, 110, 133, 40,
    132, 9, 211, 223, 205, 244, 65, 129, 77, 82, 106, 220, 55, 200, 108,
    193, 171, 250, 36, 225, 123, 8, 12, 189, 177, 74, 120, 136, 149, 139,
    227, 99, 232, 109, 233, 203, 213, 254, 59, 0, 29, 57, 242, 239, 183,
    14, 102, 88, 208, 228, 166, 119, 114, 248, 235, 117, 75, 10, 49, 68,
    80, 180, 143, 237, 31, 26, 219, 153, 141, 51, 159, 17, 131, 20,
])


def hadoop_vlong_decode(b: bytes) -> int:
    """Hadoop WritableUtils.readVLong wire format."""
    b = bytes(b)
    fb = b[0] - 256 if b[0] >= 128 else b[0]
    if fb >= -112:
        return fb
    neg = fb < -120
    ln = (-119 - fb) if neg else (-111 - fb)
    i = 0
    for c in b[1:ln]:
        i = (i << 8) | c
    return ~i if neg else i


def hadoop_vlong_encode(i: int) -> bytes:
    """Hadoop WritableUtils.writeVLong wire format."""
    if -112 <= i <= 127:
        return bytes([i & 0xFF])
    ln = -112
    if i < 0:
        i = ~i
        ln = -120
    tmp = i
    while tmp:
        tmp >>= 8
        ln -= 1
    n = -(ln + 120) if ln < -120 else -(ln + 112)
    out = bytearray([ln & 0xFF])
    for idx in range(n, 0, -1):
        out.append((i >> (8 * (idx - 1))) & 0xFF)
    return bytes(out)


def md2_hex(data: bytes) -> str:
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad

    checksum = bytearray(16)
    l = 0
    for off in range(0, len(data), 16):
        for j in range(16):
            l = checksum[j] = checksum[j] ^ _S[data[off + j] ^ l]
    data += bytes(checksum)

    x = bytearray(48)
    for off in range(0, len(data), 16):
        block = data[off:off + 16]
        x[16:32] = block
        for j in range(16):
            x[32 + j] = x[j] ^ block[j]
        t = 0
        for j in range(18):
            for k in range(48):
                t = x[k] = x[k] ^ _S[t]
            t = (t + j) % 256
    return bytes(x[:16]).hex()
