"""PDF content-stream interpreter: positioned text + ruling lines.

Implements the ISO 32000-1 text-showing model (§9.4): graphics-state
CTM stack, text matrix/line matrix, Tf/Tc/Tw/Tz/TL/Ts state, and the
glyph-advance formula, emitting one positioned element per shown
string-segment glyph. Character decoding follows §9.10: /ToUnicode
CMaps first, then /Encoding (base + /Differences glyph names via an
Adobe-Glyph-List subset), then Latin-1. Path operators (§8.5) feed the
ruling-line collector used by lattice table extraction.

The reference gets the same geometry from PDFBox's PDFTextStripper
inside tabula's ObjectExtractor (contrib/format-pdf PdfUtils.java);
coordinates here are converted to tabula's top-left-origin convention
so the extraction layer can mirror its clustering rules.
"""

from __future__ import annotations

import re

from drill_spark.readers.pdf_core import Lexer, PdfDocument, PdfName, PdfStream


class TextEl:
    """One shown string segment: device-space box + unicode text."""

    __slots__ = ("x", "top", "width", "height", "text", "space_w", "font_size")

    def __init__(self, x, top, width, height, text, space_w, font_size):
        self.x = x
        self.top = top
        self.width = width
        self.height = height
        self.text = text
        self.space_w = space_w
        self.font_size = font_size

    def __repr__(self):
        return f"<{self.text!r} x={self.x:.1f} top={self.top:.1f} w={self.width:.1f}>"


class Ruling:
    __slots__ = ("x1", "y1", "x2", "y2")

    def __init__(self, x1, y1, x2, y2):
        self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2

    @property
    def vertical(self):
        return abs(self.x2 - self.x1) < 0.1

    @property
    def horizontal(self):
        return abs(self.y2 - self.y1) < 0.1


# ------------------------------------------------------------- encodings

# WinAnsi (cp1252) differences from latin-1 in 0x80-0x9F
_WINANSI = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "'", 0x92: "'", 0x93: "“", 0x94: "”",
    0x95: "•", 0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š",
    0x9B: "›", 0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

# Adobe Glyph List subset: the names that appear in /Differences arrays
# of ordinary latin documents (full AGL is 4千 entries; uniXXXX and
# single-letter names are handled algorithmically).
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "'",
    "quoteright": "'", "quotedblleft": "“", "quotedblright": "”",
    "bullet": "•", "endash": "–", "emdash": "—", "ellipsis": "…",
    "fi": "ﬁ", "fl": "ﬂ", "dagger": "†", "daggerdbl": "‡",
    "periodcentered": "·", "paragraph": "¶", "section": "§",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "multiply": "×", "divide": "÷",
    "agrave": "à", "aacute": "á", "acircumflex": "â", "atilde": "ã",
    "adieresis": "ä", "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý", "ydieresis": "ÿ",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â", "Atilde": "Ã",
    "Adieresis": "Ä", "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Egrave": "È", "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Ugrave": "Ù", "Uacute": "Ú",
    "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "oslash": "ø", "Oslash": "Ø", "germandbls": "ß", "exclamdown": "¡",
    "questiondown": "¿", "cent": "¢", "sterling": "£", "yen": "¥",
    "euro": "€", "florin": "ƒ", "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›", "quotesinglbase": "‚",
    "quotedblbase": "„", "perthousand": "‰", "scaron": "š", "Scaron": "Š",
    "zcaron": "ž", "Zcaron": "Ž", "oe": "œ", "OE": "Œ", "mu": "µ",
    "middot": "·", "nbspace": " ", "minus": "−", "tilde": "˜",
    "circumflex": "ˆ",
}


def _glyph_to_unicode(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    if len(name) == 1:
        return name
    m = re.match(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.match(r"u([0-9A-Fa-f]{4,6})$", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.match(r"g?\d+$", name)
    if m:
        return ""  # unnamed glyph id — no unicode without ToUnicode
    return ""


# ------------------------------------------------------------- CMaps


def parse_tounicode(data: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap -> code->text."""
    out: dict[int, str] = {}

    def u16(b: bytes) -> str:
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return b.decode("utf-16-be", "ignore")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for cm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>", m.group(1)):
            src = int(cm.group(1), 16)
            dst = bytes.fromhex(cm.group(2).decode()) if cm.group(2) else b""
            out[src] = u16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        # <lo> <hi> <dst>  |  <lo> <hi> [<d1> <d2> ...]
        pos = 0
        pat = re.compile(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[(?:\s*<[0-9A-Fa-f]*>)+\s*\]|<[0-9A-Fa-f]*>)"
        )
        for cm in pat.finditer(body):
            lo, hi = int(cm.group(1), 16), int(cm.group(2), 16)
            dst = cm.group(3)
            if dst.startswith(b"["):
                items = re.findall(rb"<([0-9A-Fa-f]*)>", dst)
                for i, item in enumerate(items):
                    if lo + i > hi:
                        break
                    out[lo + i] = u16(bytes.fromhex(item.decode()))
            else:
                base = dst.strip(b"<>")
                bb = bytes.fromhex(base.decode()) if base else b""
                if len(bb) >= 2:
                    start = int.from_bytes(bb, "big")
                    for i in range(hi - lo + 1):
                        try:
                            out[lo + i] = chr(start + i) if (start + i) < 0x110000 else ""
                        except ValueError:
                            out[lo + i] = ""
    return out


# ------------------------------------------------------------- fonts


class Font:
    """Decoded font state: byte-width, code->unicode, code->glyph width."""

    def __init__(self, doc: PdfDocument, fdict: dict):
        r = doc.resolve
        fdict = r(fdict) or {}
        self.subtype = str(r(fdict.get("Subtype")) or "")
        self.two_byte = False
        self.tounicode: dict[int, str] = {}
        self.encoding_map: dict[int, str] = {}
        self.widths: dict[int, float] = {}
        self.default_width = 500.0

        tu = fdict.get("ToUnicode")
        if tu is not None:
            try:
                self.tounicode = parse_tounicode(doc.stream_data(tu))
            except Exception:
                pass

        if self.subtype == "Type0":
            self.two_byte = True  # Identity-H/V; CMap-coded others degrade
            desc = r(fdict.get("DescendantFonts"))
            dfont = r(desc[0]) if desc else {}
            self.default_width = float(r(dfont.get("DW", 1000)) or 1000)
            warr = r(dfont.get("W")) or []
            i = 0
            warr = [r(x) for x in warr]
            while i < len(warr):
                c = warr[i]
                nxt = warr[i + 1] if i + 1 < len(warr) else None
                if isinstance(nxt, list):
                    for j, w in enumerate(r(nxt)):
                        self.widths[int(c) + j] = float(r(w))
                    i += 2
                else:
                    w = warr[i + 2]
                    for code in range(int(c), int(nxt) + 1):
                        self.widths[code] = float(w)
                    i += 3
        else:
            fc = r(fdict.get("FirstChar"))
            ws = r(fdict.get("Widths"))
            if isinstance(ws, list) and fc is not None:
                for i, w in enumerate(ws):
                    w = r(w)
                    if w:
                        self.widths[int(fc) + i] = float(w)
            base = str(r(fdict.get("BaseFont")) or "")
            if "Courier" in base or "Mono" in base:
                self.default_width = 600.0
            # /Encoding: name or dict with BaseEncoding + Differences
            enc = r(fdict.get("Encoding"))
            base_enc = None
            diffs = None
            if isinstance(enc, PdfName) or isinstance(enc, str):
                base_enc = str(enc)
            elif isinstance(enc, dict):
                base_enc = str(r(enc.get("BaseEncoding")) or "") or None
                diffs = r(enc.get("Differences"))
            self.base_encoding = base_enc
            if diffs:
                code = 0
                for item in diffs:
                    item = r(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    else:
                        self.encoding_map[code] = _glyph_to_unicode(str(item))
                        code += 1

    def _base_decode(self, code: int) -> str:
        enc = getattr(self, "base_encoding", None)
        if enc == "WinAnsiEncoding":
            ch = _WINANSI.get(code)
            if ch is None:
                ch = bytes([code]).decode("cp1252", "replace")
            return "" if ch == "�" else ch
        if enc == "MacRomanEncoding":
            ch = bytes([code]).decode("mac_roman", "replace")
            return "" if ch == "�" else ch
        return chr(code) if 32 <= code < 127 or code >= 160 else ""

    def decode(self, raw: bytes):
        """Yield (code, text, width/1000) per glyph code in the string."""
        if self.two_byte:
            for i in range(0, len(raw) - 1, 2):
                code = (raw[i] << 8) | raw[i + 1]
                text = self.tounicode.get(code)
                if text is None:
                    text = ""
                yield code, text, self.widths.get(code, self.default_width) / 1000.0
        else:
            for code in raw:
                text = self.tounicode.get(code)
                if text is None:
                    text = self.encoding_map.get(code)
                if text is None:
                    text = self._base_decode(code)
                yield code, text, self.widths.get(code, self.default_width) / 1000.0


# ------------------------------------------------------- the interpreter


def _mat_mul(a, b):
    """3x3 affine as 6-tuple (a b c d e f): row-vector convention."""
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


def _apply(m, x, y):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


_IDENT = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _tokenize_content(data: bytes):
    """Yield operands+operator tuples from a content stream."""
    lex = Lexer(data)
    operands = []
    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if c in b"/<([+-.0123456789":
            try:
                operands.append(lex.parse_object())
            except Exception:
                lex.pos += 1
            continue
        m = re.match(rb"[A-Za-z'\"*01]{1,3}", data[lex.pos:lex.pos + 3])
        if not m:
            lex.pos += 1
            continue
        op = m.group(0).decode("latin-1")
        lex.pos += m.end()
        if op == "BI":  # inline image: skip to EI
            e = data.find(b"EI", lex.pos)
            lex.pos = (e + 2) if e >= 0 else n
            operands = []
            continue
        yield operands, op
        operands = []


def extract_page(doc: PdfDocument, page: dict):
    """Interpret one page -> (elements, rulings, width, height).

    Coordinates are top-left-origin (y grows downward), matching the
    tabula/PDFBox convention the extraction layer mirrors."""
    r = doc.resolve
    mb = [float(r(v)) for v in (r(page.get("MediaBox")) or [0, 0, 612, 792])]
    page_w = mb[2] - mb[0]
    page_h = mb[3] - mb[1]
    rotate = int(r(page.get("Rotate")) or 0) % 360

    # base transform: PDF bottom-left -> top-left origin (+ rotation)
    if rotate == 90:
        base = (0.0, 1.0, 1.0, 0.0, -mb[1], -mb[0])
        page_w, page_h = page_h, page_w
    elif rotate == 270:
        base = (0.0, -1.0, -1.0, 0.0, mb[3], mb[2])
        page_w, page_h = page_h, page_w
    elif rotate == 180:
        base = (-1.0, 0.0, 0.0, 1.0, mb[2], -mb[1])
    else:
        base = (1.0, 0.0, 0.0, -1.0, -mb[0], mb[3])

    els: list[TextEl] = []
    rulings: list[Ruling] = []
    font_cache: dict[int, Font] = {}

    def run(content: bytes, res: dict, base_ctm, depth: int = 0):
        if depth > 8:
            return
        res = r(res) or {}
        font_dicts = r(res.get("Font")) or {}
        fonts: dict[str, Font] = {}

        def get_font(name: str) -> Font:
            if name not in fonts:
                fd = font_dicts.get(name)
                key = id(fd)
                if key not in font_cache:
                    font_cache[key] = Font(doc, fd) if fd is not None else Font(doc, {})
                fonts[name] = font_cache[key]
            return fonts[name]

        ctm = base_ctm
        stack: list[tuple] = []
        tm = tlm = _IDENT
        font: Font | None = None
        fsize = char_sp = word_sp = rise = 0.0
        leading = 0.0
        hscale = 1.0
        render_mode = 0
        path_pts: list[tuple] = []
        path_start = cur = None
        rects: list[tuple] = []

        def show(raw: bytes):
            nonlocal tm
            if font is None or not isinstance(raw, bytes) or not raw:
                return
            for code, text, w0 in font.decode(raw):
                adv = (w0 * fsize + char_sp) * hscale
                if code == 32 and not font.two_byte:
                    adv += word_sp * hscale
                trm = _mat_mul((fsize * hscale, 0.0, 0.0, fsize, 0.0, rise),
                               _mat_mul(tm, ctm))
                x0, y0 = _apply(trm, 0.0, 0.0)
                x1, y1 = _apply(trm, w0, 1.0)
                if text and render_mode != 3:
                    h = abs(y1 - y0) or fsize
                    sp_w = max(abs(trm[0]) * 0.25, 1.0)
                    els.append(TextEl(
                        min(x0, x1), min(y0, y1),
                        abs(x1 - x0) or adv * abs(ctm[0]),
                        h, text, sp_w, fsize,
                    ))
                tm = _mat_mul((1.0, 0.0, 0.0, 1.0, adv, 0.0), tm)

        def flush_path(stroke: bool, fill: bool):
            nonlocal path_pts, path_start, cur, rects
            if stroke or fill:
                for (xa, ya, wd, ht) in rects:
                    x0, y0 = _apply(ctm, xa, ya)
                    x1, y1 = _apply(ctm, xa + wd, ya + ht)
                    lo_x, hi_x = min(x0, x1), max(x0, x1)
                    lo_y, hi_y = min(y0, y1), max(y0, y1)
                    if fill and (hi_x - lo_x < 3.0 or hi_y - lo_y < 3.0):
                        # a thin filled rect IS a ruling line
                        midx, midy = (lo_x + hi_x) / 2, (lo_y + hi_y) / 2
                        if hi_x - lo_x < 3.0:
                            rulings.append(Ruling(midx, lo_y, midx, hi_y))
                        else:
                            rulings.append(Ruling(lo_x, midy, hi_x, midy))
                    else:
                        rulings.append(Ruling(lo_x, lo_y, hi_x, lo_y))
                        rulings.append(Ruling(lo_x, hi_y, hi_x, hi_y))
                        rulings.append(Ruling(lo_x, lo_y, lo_x, hi_y))
                        rulings.append(Ruling(hi_x, lo_y, hi_x, hi_y))
                for (pa, pb) in path_pts:
                    x0, y0 = _apply(ctm, *pa)
                    x1, y1 = _apply(ctm, *pb)
                    if abs(x1 - x0) < 0.5 or abs(y1 - y0) < 0.5:
                        rulings.append(Ruling(x0, y0, x1, y1))
            path_pts = []
            rects = []
            path_start = cur = None

        for operands, op in _tokenize_content(content):
            try:
                if op == "q":
                    stack.append(ctm)
                elif op == "Q":
                    if stack:
                        ctm = stack.pop()
                elif op == "cm" and len(operands) >= 6:
                    ctm = _mat_mul(tuple(float(v) for v in operands[-6:]), ctm)
                elif op == "BT":
                    tm = tlm = _IDENT
                elif op == "Tf" and len(operands) >= 2:
                    font = get_font(str(operands[-2]))
                    fsize = float(operands[-1])
                elif op == "Td" and len(operands) >= 2:
                    tlm = _mat_mul((1, 0, 0, 1, float(operands[-2]), float(operands[-1])), tlm)
                    tm = tlm
                elif op == "TD" and len(operands) >= 2:
                    leading = -float(operands[-1])
                    tlm = _mat_mul((1, 0, 0, 1, float(operands[-2]), float(operands[-1])), tlm)
                    tm = tlm
                elif op == "Tm" and len(operands) >= 6:
                    tm = tlm = tuple(float(v) for v in operands[-6:])
                elif op == "T*":
                    tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                    tm = tlm
                elif op == "TL":
                    leading = float(operands[-1])
                elif op == "Tc":
                    char_sp = float(operands[-1])
                elif op == "Tw":
                    word_sp = float(operands[-1])
                elif op == "Tz":
                    hscale = float(operands[-1]) / 100.0
                elif op == "Ts":
                    rise = float(operands[-1])
                elif op == "Tr":
                    render_mode = int(operands[-1])
                elif op == "Tj":
                    show(operands[-1])
                elif op == "'":
                    tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                    tm = tlm
                    show(operands[-1])
                elif op == '"' and len(operands) >= 3:
                    word_sp = float(operands[-3])
                    char_sp = float(operands[-2])
                    tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                    tm = tlm
                    show(operands[-1])
                elif op == "TJ" and operands and isinstance(operands[-1], list):
                    for item in operands[-1]:
                        if isinstance(item, bytes):
                            show(item)
                        elif isinstance(item, (int, float)):
                            adv = (-float(item) / 1000.0) * fsize * hscale
                            tm = _mat_mul((1, 0, 0, 1, adv, 0.0), tm)
                # ---- path ops for rulings ----
                elif op == "m" and len(operands) >= 2:
                    cur = (float(operands[-2]), float(operands[-1]))
                    path_start = cur
                elif op == "l" and len(operands) >= 2:
                    p2 = (float(operands[-2]), float(operands[-1]))
                    if cur is not None:
                        path_pts.append((cur, p2))
                    cur = p2
                elif op in ("c", "v", "y"):
                    if len(operands) >= 2:
                        cur = (float(operands[-2]), float(operands[-1]))
                elif op == "h":
                    if cur is not None and path_start is not None:
                        path_pts.append((cur, path_start))
                        cur = path_start
                elif op == "re" and len(operands) >= 4:
                    rects.append(tuple(float(v) for v in operands[-4:]))
                    cur = path_start = (float(operands[-4]), float(operands[-3]))
                elif op in ("S", "s"):
                    flush_path(True, False)
                elif op in ("f", "F", "f*"):
                    flush_path(False, True)
                elif op in ("b", "b*", "B", "B*"):
                    flush_path(True, True)
                elif op == "n":
                    flush_path(False, False)
                elif op == "Do":
                    xobjs = r(res.get("XObject")) or {}
                    xo = r(xobjs.get(str(operands[-1])))
                    if isinstance(xo, PdfStream) and str(r(xo.dict.get("Subtype"))) == "Form":
                        sub_ctm = ctm
                        mtx = r(xo.dict.get("Matrix"))
                        if mtx:
                            sub_ctm = _mat_mul(tuple(float(r(v)) for v in mtx), ctm)
                        run(doc.stream_data(xo), xo.dict.get("Resources", res),
                            sub_ctm, depth + 1)
            except (ValueError, TypeError, IndexError, KeyError):
                continue

    run(doc.page_content(page), page.get("Resources") or {}, base)
    return _suppress_duplicates(els), rulings, page_w, page_h


def _suppress_duplicates(els: list[TextEl]) -> list[TextEl]:
    """Drop re-drawn glyphs at (nearly) the same spot — the fake-bold /
    fake-outline overdraw PDFBox's suppressDuplicateOverlappingText
    handles; tolerance is a third of the glyph width."""
    grid: dict[tuple, list[TextEl]] = {}
    out: list[TextEl] = []
    for e in els:
        tol = max(e.width / 3.0, 0.7)
        cx, cy = int(e.x // 4), int(e.top // 4)
        dup = False
        for nx in (cx - 1, cx, cx + 1):
            for ny in (cy - 1, cy, cy + 1):
                for o in grid.get((nx, ny), ()):
                    if o.text == e.text and abs(o.x - e.x) < tol and abs(o.top - e.top) < 1.0:
                        dup = True
                        break
                if dup:
                    break
            if dup:
                break
        if not dup:
            grid.setdefault((cx, cy), []).append(e)
            out.append(e)
    return out
