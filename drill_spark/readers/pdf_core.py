"""PDF object layer — public-spec (ISO 32000-1) implementation.

The reference reads PDFs through PDFBox + tabula
(contrib/format-pdf/src/main/java/org/apache/drill/exec/store/pdf/
PdfUtils.java); no PDF library ships in this environment, so this
module parses the file format directly: the object syntax (ISO 32000-1
§7.3), classic xref tables and xref streams (§7.5), object streams
(§7.5.7), stream filters (§7.4: Flate with PNG predictors, LZW,
ASCIIHex, ASCII85, RunLength), and the standard security handler
(§7.6.3, RC4 revisions 2/3; empty- or user-password decryption).

Only driver-side metadata-scale work happens here: a PDF is a
document, not a data lake — the Spark-side parallelism is one task
per file/page (see readers/pdf.py).
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib


class PdfRef:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"

    def __eq__(self, other):
        return isinstance(other, PdfRef) and (self.num, self.gen) == (other.num, other.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class PdfName(str):
    """A /Name — distinct from a string value."""


class PdfStream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Lexer:
    """Tokenizer over the raw bytes at a movable position."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_object(self):
        """Parse one object at pos (after whitespace)."""
        self._skip_ws()
        d = self.data
        c = d[self.pos]
        if c == 0x2F:  # /
            return self._parse_name()
        if c == 0x28:  # (
            return self._parse_literal_string()
        if c == 0x3C:  # < or <<
            if d[self.pos + 1] == 0x3C:
                return self._parse_dict_or_stream()
            return self._parse_hex_string()
        if c == 0x5B:  # [
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        m = re.match(rb"(true|false|null)", d[self.pos:self.pos + 5])
        if m:
            self.pos += len(m.group(1))
            return {b"true": True, b"false": False, b"null": None}[m.group(1)]
        # bare keyword (endobj / endstream misalignment guard)
        m = re.match(rb"[A-Za-z]+", d[self.pos:self.pos + 16])
        if m:
            self.pos += m.end()
            return PdfName(m.group(0).decode("latin-1"))
        raise ValueError(f"pdf parse error at {self.pos}: {d[self.pos:self.pos+20]!r}")

    def _parse_name(self) -> PdfName:
        d = self.data
        self.pos += 1
        start = self.pos
        n = len(d)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return PdfName(raw.decode("utf-8", "replace"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\x0c"}[e]
                    self.pos += 1
                elif e in b"01234567":
                    oct_digits = d[self.pos:self.pos + 3]
                    m = re.match(rb"[0-7]{1,3}", oct_digits)
                    out.append(int(m.group(0), 8) & 0xFF)
                    self.pos += len(m.group(0))
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        d = self.data
        end = d.index(b">", self.pos)
        hexs = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos + 1:end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))

    def _parse_dict_or_stream(self):
        d = self.data
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if d[self.pos] == 0x3E and d[self.pos + 1] == 0x3E:
                self.pos += 2
                break
            key = self._parse_name() if d[self.pos] == 0x2F else self.parse_object()
            out[str(key)] = self.parse_object()
        # a stream keyword may follow
        save = self.pos
        self._skip_ws()
        if d[self.pos:self.pos + 6] == b"stream":
            self.pos += 6
            if d[self.pos:self.pos + 2] == b"\r\n":
                self.pos += 2
            elif d[self.pos] in b"\n\r":
                self.pos += 1
            length = out.get("Length")
            if isinstance(length, int):
                raw = d[self.pos:self.pos + length]
                endpos = self.pos + length
                # tolerate slightly-wrong /Length
                if d[endpos:endpos + 11].lstrip(b"\r\n ")[:9] != b"endstream":
                    e = d.find(b"endstream", self.pos)
                    raw = d[self.pos:e].rstrip(b"\r\n")
                    endpos = e
            else:  # indirect /Length resolved later by the document; scan
                e = d.find(b"endstream", self.pos)
                raw = d[self.pos:e].rstrip(b"\r\n")
                endpos = e
            e = d.find(b"endstream", endpos)
            self.pos = (e if e >= 0 else endpos) + 9
            return PdfStream(out, raw)
        self.pos = save
        return out

    def _parse_number_or_ref(self):
        d = self.data
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", d[self.pos:self.pos + 32])
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # lookahead for "G R" (indirect reference)
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])", d[self.pos:self.pos + 24])
        if m2 and val >= 0:
            self.pos += m2.end()
            return PdfRef(val, int(m2.group(1)))
        self.pos = save
        return val


# ---------------------------------------------------------------- filters


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    stride = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    while pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode (§7.4.4, early-change variant)."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, acc, nbits = 9, 0, 0
    prev = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:
                table = table[:258]
                bits = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << bits) and bits < 12:
                bits += 1
    return bytes(out)


def _a85_decode(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data)
    if data.endswith(b"~>"):
        data = data[:-2]
    out = bytearray()
    i = 0
    while i < len(data):
        if data[i:i + 1] == b"z":
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        chunk = data[i:i + 5]
        pad = 5 - len(chunk)
        chunk += b"u" * pad
        n = 0
        for c in chunk:
            n = n * 85 + (c - 33)
        quad = n.to_bytes(4, "big")
        out += quad[:4 - pad]
        i += 5
    return bytes(out)


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1:i + 2 + l]
            i += 2 + l
        else:
            out += data[i + 1:i + 2] * (257 - l)
            i += 2
    return bytes(out)


def apply_filters(stream: PdfStream, resolve) -> bytes:
    """Decode a stream's content through its /Filter chain."""
    d = stream.dict
    filters = resolve(d.get("Filter"))
    if filters is None:
        return stream.raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = resolve(d.get("DecodeParms", d.get("DP")))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = stream.raw
    for f, p in zip(filters, parms):
        f = str(resolve(f))
        p = resolve(p) or {}
        if f == "FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                data = zlib.decompressobj().decompress(data)  # tolerate junk tail
        elif f == "LZWDecode":
            data = _lzw_decode(data)
        elif f == "ASCIIHexDecode":
            data = bytes.fromhex(
                re.sub(rb"[^0-9A-Fa-f]", b"", data.rstrip(b">")).decode()
            )
        elif f == "ASCII85Decode":
            data = _a85_decode(data)
        elif f == "RunLengthDecode":
            data = _rl_decode(data)
        elif f in ("DCTDecode", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode"):
            return data  # image codecs: keep raw, not needed for text
        else:
            raise NotImplementedError(f"PDF filter {f}")
        pred = resolve(p.get("Predictor", 1)) if isinstance(p, dict) else 1
        if pred and pred >= 10:
            data = _png_predictor(
                data,
                resolve(p.get("Colors", 1)),
                resolve(p.get("BitsPerComponent", 8)),
                resolve(p.get("Columns", 1)),
            )
        elif pred == 2:
            raise NotImplementedError("TIFF predictor")
    return data


# ------------------------------------------------------------- encryption


_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


class StandardSecurity:
    """Standard security handler, RC4 revisions 2 and 3 (§7.6.3)."""

    def __init__(self, enc: dict, first_id: bytes, password: str = ""):
        self.rev = enc.get("R", 2)
        if enc.get("V", 1) not in (1, 2) or self.rev not in (2, 3):
            raise NotImplementedError(
                f"PDF encryption V={enc.get('V')} R={self.rev} (only RC4 rev 2/3)"
            )
        self.length = enc.get("Length", 40) // 8
        o = enc["O"]
        p = enc["P"] & 0xFFFFFFFF
        pw = password.encode("latin-1")[:32]
        padded = pw + _PAD[:32 - len(pw)]
        h = hashlib.md5()
        h.update(padded)
        h.update(o[:32])
        h.update(struct.pack("<I", p))
        h.update(first_id)
        key = h.digest()
        if self.rev >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:self.length]).digest()
        self.key = key[:self.length]
        # verify against /U (user password check, algorithm 6)
        u = enc.get("U", b"")
        if self.rev == 2:
            ok = _rc4(self.key, _PAD) == u[:32]
        else:
            h2 = hashlib.md5(_PAD + first_id).digest()
            test = _rc4(self.key, h2)
            for i in range(1, 20):
                test = _rc4(bytes(b ^ i for b in self.key), test)
            ok = test == u[:16]
        if not ok:
            raise PermissionError("wrong PDF password")

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        k = self.key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
        k = hashlib.md5(k).digest()[:min(len(self.key) + 5, 16)]
        return _rc4(k, data)


# --------------------------------------------------------------- document


class PdfDocument:
    """A parsed PDF: xref-driven object access + page tree walk."""

    def __init__(self, data: bytes, password: str = ""):
        self.data = data
        self.xref: dict[int, tuple] = {}  # num -> ("f", offset) | ("s", stmnum, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._parse_xrefs()
        self.security = None
        enc = self.trailer.get("Encrypt")
        if enc is not None:
            self._encrypt_ref = enc if isinstance(enc, PdfRef) else None
            enc = self.resolve(enc)
            if str(self.resolve(enc.get("Filter"))) != "Standard":
                raise NotImplementedError("non-Standard PDF security handler")
            ids = self.trailer.get("ID") or [b""]
            self.security = StandardSecurity(
                {k: self.resolve(v) for k, v in enc.items()}, ids[0], password
            )

    # ---- xref parsing ----

    def _parse_xrefs(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        seen = set()
        queue = [int(m.group(1))] if m else []
        while queue:
            off = queue.pop(0)
            if off in seen or off >= len(self.data):
                continue
            seen.add(off)
            lex = Lexer(self.data, off)
            lex._skip_ws()
            if self.data[lex.pos:lex.pos + 4] == b"xref":
                trailer = self._parse_xref_table(lex.pos + 4)
            else:
                trailer = self._parse_xref_stream(off)
            if trailer is None:
                continue
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            for key in ("XRefStm", "Prev"):
                nxt = trailer.get(key)
                if isinstance(nxt, int):
                    queue.append(nxt)
        if not self.xref or "Root" not in self.trailer:
            self._scan_all_objects()

    def _parse_xref_table(self, pos: int):
        lex = Lexer(self.data, pos)
        while True:
            lex._skip_ws()
            if self.data[lex.pos:lex.pos + 7] == b"trailer":
                lex.pos += 7
                return lex.parse_object()
            m = re.match(rb"(\d+)\s+(\d+)", self.data[lex.pos:lex.pos + 40])
            if not m:
                return {}
            start, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            lex._skip_ws()
            for i in range(count):
                entry = self.data[lex.pos:lex.pos + 20]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", entry)
                if em:
                    if em.group(3) == b"n":
                        self.xref.setdefault(start + i, ("f", int(em.group(1))))
                    lex.pos += em.end()
                    while self.data[lex.pos] in b"\r\n ":
                        lex.pos += 1
                else:
                    break

    def _parse_xref_stream(self, off: int):
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[off:off + 40])
        if not m:
            return None
        lex = Lexer(self.data, off + m.end())
        obj = lex.parse_object()
        if not isinstance(obj, PdfStream):
            return None
        content = apply_filters(obj, self.resolve)
        w = [self.resolve(x) for x in self.resolve(obj.dict["W"])]
        size = self.resolve(obj.dict["Size"])
        index = self.resolve(obj.dict.get("Index", [0, size]))
        index = [self.resolve(x) for x in index]
        rowlen = sum(w)
        pos = 0
        for i in range(0, len(index), 2):
            start, count = index[i], index[i + 1]
            for num in range(start, start + count):
                if pos + rowlen > len(content):
                    break
                fields = []
                for width in w:
                    fields.append(int.from_bytes(content[pos:pos + width], "big") if width else None)
                    pos += width
                ftype = fields[0] if w[0] else 1
                if ftype == 1:
                    self.xref.setdefault(num, ("f", fields[1]))
                elif ftype == 2:
                    self.xref.setdefault(num, ("s", fields[1], fields[2]))
        return dict(obj.dict)

    def _scan_all_objects(self) -> None:
        """Fallback: find every `N G obj` in the file (repair mode)."""
        for m in re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", self.data):
            self.xref[int(m.group(1))] = ("f", m.start())
        if "Root" not in self.trailer:
            for m in re.finditer(rb"trailer", self.data):
                lex = Lexer(self.data, m.end())
                try:
                    t = lex.parse_object()
                except Exception:
                    continue
                if isinstance(t, dict):
                    for k, v in t.items():
                        self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            # last resort: any object with /Type /Catalog
            for num in self.xref:
                try:
                    obj = self.get_object(num)
                except Exception:
                    continue
                if isinstance(obj, dict) and str(obj.get("Type")) == "Catalog":
                    self.trailer["Root"] = PdfRef(num, 0)
                    break

    # ---- object access ----

    def resolve(self, obj):
        while isinstance(obj, PdfRef):
            obj = self.get_object(obj.num, obj.gen)
        return obj

    def get_object(self, num: int, gen: int = 0):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None:
            return None
        if entry[0] == "f":
            m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[entry[1]:entry[1] + 40])
            if not m or int(m.group(1)) != num:
                # stale offset — repair by scanning
                self._scan_all_objects()
                entry = self.xref.get(num)
                m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[entry[1]:entry[1] + 40])
            lex = Lexer(self.data, entry[1] + m.end())
            obj = lex.parse_object()
            if isinstance(obj, PdfStream) and not isinstance(obj.dict.get("Length"), int):
                length = self.resolve(obj.dict.get("Length"))
                if isinstance(length, int):
                    obj.dict["Length"] = length
            obj = self._decrypt_object(obj, num, int(m.group(2)))
        else:
            obj = self._objstm_object(entry[1], entry[2])
        self._cache[num] = obj
        return obj

    def _decrypt_object(self, obj, num: int, gen: int):
        if self.security is None:
            return obj
        if getattr(self, "_encrypt_ref", None) and self._encrypt_ref.num == num:
            return obj

        def walk(o):
            if isinstance(o, bytes):
                return self.security.decrypt(o, num, gen)
            if isinstance(o, list):
                return [walk(x) for x in o]
            if isinstance(o, PdfStream):
                return PdfStream({k: walk(v) for k, v in o.dict.items()},
                                 self.security.decrypt(o.raw, num, gen))
            if isinstance(o, dict):
                return {k: walk(v) for k, v in o.items()}
            return o

        return walk(obj)

    def _objstm_object(self, stm_num: int, idx: int):
        if stm_num not in self._objstm_cache:
            stm = self.get_object(stm_num)
            content = apply_filters(stm, self.resolve)
            n = self.resolve(stm.dict["N"])
            first = self.resolve(stm.dict["First"])
            headers = content[:first].split()
            objs = []
            for i in range(n):
                onum = int(headers[2 * i])
                ooff = int(headers[2 * i + 1])
                lex = Lexer(content, first + ooff)
                objs.append((onum, lex.parse_object()))
            self._objstm_cache[stm_num] = objs
        objs = self._objstm_cache[stm_num]
        if idx < len(objs):
            return objs[idx][1]
        return None

    def stream_data(self, obj) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, PdfStream):
            raise ValueError("not a stream")
        return apply_filters(obj, self.resolve)

    # ---- structure ----

    def catalog(self) -> dict:
        return self.resolve(self.trailer["Root"])

    def info(self) -> dict:
        info = self.resolve(self.trailer.get("Info")) or {}
        return {k: self.resolve(v) for k, v in info.items()} if isinstance(info, dict) else {}

    def pages(self) -> list[dict]:
        """Flattened page list with inherited attributes resolved."""
        out: list[dict] = []
        root = self.resolve(self.catalog().get("Pages"))
        inheritable = ("Resources", "MediaBox", "CropBox", "Rotate")

        def walk(node, inherited, depth=0):
            if node is None or depth > 64:
                return
            node = self.resolve(node)
            merged = dict(inherited)
            for k in inheritable:
                if k in node:
                    merged[k] = node[k]
            if str(node.get("Type")) == "Page" or ("Kids" not in node and "Contents" in node):
                page = dict(node)
                for k, v in merged.items():
                    page.setdefault(k, v)
                out.append(page)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, merged, depth + 1)

        walk(root, {})
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, list):
            return b"\n".join(self.stream_data(x) for x in c)
        return self.stream_data(c)


def pdf_string_to_text(b) -> str:
    """A PDF text-string value (§7.9.2): UTF-16BE with BOM, else PDFDoc."""
    if isinstance(b, str):
        return b
    if not isinstance(b, bytes):
        return str(b)
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


def parse_pdf_date(s) -> "int | None":
    """D:YYYYMMDDHHmmSSOHH'mm' -> epoch millis (UTC)."""
    import datetime

    if s is None:
        return None
    s = pdf_string_to_text(s).strip()
    m = re.match(
        r"(?:D:)?(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?([Zz+-])?(\d{2})?'?(\d{2})?",
        s,
    )
    if not m:
        # prose dates from old producers ("Monday, March 03, 1997
        # 3:30:00 PM") — PDFBox's DateConverter accepts these too
        for fmt in (
            "%A, %B %d, %Y %I:%M:%S %p",
            "%B %d, %Y %I:%M:%S %p",
            "%a %b %d %H:%M:%S %Y",
        ):
            try:
                dt = datetime.datetime.strptime(s, fmt).replace(
                    tzinfo=datetime.timezone.utc
                )
                return int(dt.timestamp() * 1000)
            except ValueError:
                continue
        return None
    parts = [int(x) if x else d for x, d in zip(m.groups()[:6], (1970, 1, 1, 0, 0, 0))]
    try:
        dt = datetime.datetime(*parts, tzinfo=datetime.timezone.utc)
    except ValueError:
        return None
    off = 0
    if m.group(7) in ("+", "-"):
        off = int(m.group(8) or 0) * 3600 + int(m.group(9) or 0) * 60
        if m.group(7) == "-":
            off = -off
    return int(dt.timestamp() * 1000) - off * 1000
