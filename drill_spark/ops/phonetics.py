"""Phonetic encoders for the reference's PhoneticFunctions surface
(contrib/udfs/src/main/java/org/apache/drill/exec/udfs/PhoneticFunctions.java,
commons-codec-backed there). Pure-Python implementations of the PUBLISHED
algorithms — Caverphone 1.0/2.0 (David Hood, Univ. of Otago tech papers),
Koelner Phonetik (Postel 1969), NYSIIS (Taft 1970), Match Rating Approach
(Moore et al., Western Airlines 1977), Refined Soundex, Metaphone
(Philips, CACM 1990), Double Metaphone (Philips, C/C++ Users Journal
2000) and Daitch-Mokotoff Soundex (Mokotoff, Avotaynu) — validated
against the reference's own test fixtures (TestPhoneticFunctions.java).

Exposed to SQL as vectorized pandas UDFs in drill_spark.functions —
scalar per-row string work, exactly the cost profile of the reference's
row-at-a-time Java UDFs.
"""

from __future__ import annotations

import re

_VOWELS = "AEIOU"


def _letters(s: str) -> str:
    return re.sub(r"[^A-Z]", "", s.upper())


# --------------------------------------------------------------- soundex

_REFINED = {c: d for c, d in zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                                 "01360240043788015936020505")}


def refined_soundex(s: str) -> str:
    """Refined soundex: first letter + the code of EVERY letter with
    consecutive duplicates collapsed; no length cap (Boston -> B103608)."""
    s = _letters(s)
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        d = _REFINED.get(c)
        if d is not None and d != last:
            out.append(d)
        last = d
    return "".join(out)


# ---------------------------------------------------------------- NYSIIS

_NY_FIRST = [("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
             ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")]
_NY_LAST = [("EE", "Y"), ("IE", "Y"),
            ("DT", "D"), ("RT", "D"), ("RD", "D"), ("NT", "D"), ("ND", "D")]


def nysiis(s: str, strict: bool = True) -> str:
    """NYSIIS (the strict 6-char variant the reference exposes)."""
    s = _letters(s)
    if not s:
        return ""
    for pre, rep in _NY_FIRST:
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    for suf, rep in _NY_LAST:
        if s.endswith(suf):
            s = s[: -len(suf)] + rep
            break
    key = [s[0]]
    i = 1
    n = len(s)
    while i < n:
        c = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        prev = s[i - 1]
        ln = 1
        if c == "E" and nxt == "V":
            t, ln = "AF", 2
        elif c in _VOWELS:
            t = "A"
        elif c == "Q":
            t = "G"
        elif c == "Z":
            t = "S"
        elif c == "M":
            t = "N"
        elif c == "K":
            if nxt == "N":
                t, ln = "N", 2
            else:
                t = "C"
        elif c == "S" and s[i:i + 3] == "SCH":
            t, ln = "SSS", 3
        elif c == "P" and nxt == "H":
            t, ln = "FF", 2
        elif c == "H" and (prev not in _VOWELS or (nxt and nxt not in _VOWELS)):
            t = prev
        elif c == "W" and prev in _VOWELS:
            t = prev
        else:
            t = c
        for ch in t:
            if ch != key[-1]:
                key.append(ch)
        i += ln
    if key[-1] == "S" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2:] == ["A", "Y"]:
        key[-2:] = ["Y"]
    if key[-1] == "A" and len(key) > 1:
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# --------------------------------------------------- Match Rating Approach

def match_rating_encoder(s: str) -> str:
    """MRA encoding: drop non-leading vowels, collapse doubles, and when
    longer than 6 keep first-3 + last-3 (Boston -> BSTN)."""
    s = _letters(s)
    if not s:
        return ""
    kept = s[0] + "".join(c for c in s[1:] if c not in _VOWELS)
    out = []
    for c in kept:
        if not out or out[-1] != c:
            out.append(c)
    code = "".join(out)
    if len(code) > 6:
        code = code[:3] + code[-3:]
    return code


# --------------------------------------------------------- Kölner Phonetik

def cologne_phonetic(s: str) -> str:
    """Koelner Phonetik (Postel): context-sensitive digit codes, then
    collapse duplicates and strip non-leading 0s (steve -> 823)."""
    s = _letters(s).replace("Ä", "A").replace("Ö", "O").replace("Ü", "U")
    n = len(s)
    raw = []
    for i, c in enumerate(s):
        prev = s[i - 1] if i > 0 else ""
        nxt = s[i + 1] if i + 1 < n else ""
        if c in "AEIJOUY":
            raw.append("0")
        elif c == "H":
            raw.append("-")
        elif c == "B":
            raw.append("1")
        elif c == "P":
            raw.append("3" if nxt == "H" else "1")
        elif c in "DT":
            raw.append("8" if nxt in "CSZ" else "2")
        elif c in "FVW":
            raw.append("3")
        elif c in "GKQ":
            raw.append("4")
        elif c == "C":
            if i == 0:
                raw.append("4" if nxt in "AHKLOQRUX" else "8")
            elif prev in "SZ":
                raw.append("8")
            else:
                raw.append("4" if nxt in "AHKOQUX" else "8")
        elif c == "X":
            raw.append("8" if prev in "CKQ" else "48")
        elif c == "L":
            raw.append("5")
        elif c in "MN":
            raw.append("6")
        elif c == "R":
            raw.append("7")
        elif c in "SZ":
            raw.append("8")
    code = "".join(raw)
    out = []
    for i, d in enumerate(code):
        if d == "-":
            continue
        if out and code[i - 1:i] and _cologne_prev_code(code, i) == d:
            continue
        out.append(d)
    return "".join(c for i, c in enumerate(out) if c != "0" or i == 0)


def _cologne_prev_code(code: str, i: int) -> str:
    """The previous non-H code digit (H is transparent for collapsing)."""
    j = i - 1
    while j >= 0 and code[j] == "-":
        j -= 1
    return code[j] if j >= 0 else ""


# ------------------------------------------------------------- Caverphone

_CV_COMMON = [
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"), ("tch", "2ch"),
    ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"), ("dg", "2g"),
    ("tio", "sio"), ("tia", "sia"), ("d", "t"), ("ph", "fh"), ("b", "p"),
    ("sh", "s2"), ("z", "s"),
]
_CV_GROUPS = [("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"),
              ("f+", "F"), ("m+", "M"), ("n+", "N")]


def _caverphone_core(s: str, v2: bool) -> str:
    s = re.sub(r"[^a-z]", "", s.lower())
    if not s:
        return ""
    if s.endswith("e"):
        s = s[:-1]
    for pre in (["cough", "rough", "tough", "enough"]
                + (["trough"] if v2 else [])):
        if s.startswith(pre):
            s = pre[:-2] + "2f" + s[len(pre):]
    if s.startswith("gn"):
        s = "2n" + s[2:]
    if s.endswith("mb"):
        s = s[:-1] + "2"
    for a, b in _CV_COMMON:
        s = s.replace(a, b)
    s = re.sub(r"^[aeiou]", "A", s)
    s = re.sub(r"[aeiou]", "3", s)
    if v2:
        s = s.replace("j", "y")
        if s.startswith("y3"):
            s = "Y3" + s[2:]
        elif s.startswith("y"):
            s = "A" + s[1:]
        s = s.replace("y", "3")
    s = s.replace("3gh3", "3kh3").replace("gh", "22").replace("g", "k")
    for pat, rep in _CV_GROUPS:
        s = re.sub(pat, rep, s)
    s = s.replace("w3", "W3")
    if not v2:
        s = s.replace("wy", "Wy")
    s = s.replace("wh3", "Wh3")
    if v2 and s.endswith("w"):
        s = s[:-1] + "3"
    elif not v2:
        s = s.replace("why", "Why")
    s = s.replace("w", "2")
    if s.startswith("h"):
        s = "A" + s[1:]
    s = s.replace("h", "2")
    s = s.replace("r3", "R3")
    if v2 and s.endswith("r"):
        s = s[:-1] + "3"
    elif not v2:
        s = s.replace("ry", "Ry")
    s = s.replace("r", "2")
    s = s.replace("l3", "L3")
    if v2 and s.endswith("l"):
        s = s[:-1] + "3"
    elif not v2:
        s = s.replace("ly", "Ly")
    s = s.replace("l", "2")
    if not v2:
        s = s.replace("j", "y").replace("y3", "Y3").replace("y", "2")
    s = s.replace("2", "")
    if v2 and s.endswith("3"):
        s = s[:-1] + "A"
    s = s.replace("3", "")
    return s


def caverphone1(s: str) -> str:
    """Caverphone 1.0 (jaime -> YM1111)."""
    return (_caverphone_core(s, v2=False) + "111111")[:6]


def caverphone2(s: str) -> str:
    """Caverphone 2.0 (steve -> STF1111111, Peter -> PTA1111111)."""
    return (_caverphone_core(s, v2=True) + "1111111111")[:10]


# -------------------------------------------------------------- Metaphone

def metaphone(s: str, max_len: int = 4) -> str:
    """Original Metaphone (Philips 1990), 4-char cap like the
    reference's encoder (Phoenix -> FNKS)."""
    s = _letters(s)
    if not s:
        return ""
    # initial exceptions
    if s[:2] in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[:1] == "X":
        s = "S" + s[1:]
    elif s[:2] == "WH":
        s = "W" + s[2:]
    out = []
    i = 0
    n = len(s)

    def at(j):
        return s[j] if 0 <= j < n else ""

    while i < n and len(out) < max_len:
        c = s[i]
        if c == at(i - 1) and c != "C":  # collapse doubles except CC
            i += 1
            continue
        nxt, nxt2 = at(i + 1), at(i + 2)
        prev = at(i - 1)
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                # SCH -> K, else CH -> X
                out.append("K" if prev == "S" else "X")
            elif nxt in "IEY":
                if prev != "S":
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 1  # the G is folded in
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if i + 2 < n and nxt2 not in _VOWELS:
                    pass  # silent GH (night)
                elif i + 1 == n - 1:
                    pass  # trailing GH silent (through)
                else:
                    out.append("K")
                    i += 1
            elif nxt == "N":
                pass  # GN silent
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass
            elif prev in "CSPTG":
                pass
            else:
                out.append("H")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c in "LMNR":
            out.append({"L": "L", "M": "M", "N": "N", "R": "R"}[c])
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
                i += 1
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            elif nxt == "C" and nxt2 == "H":
                pass  # TCH -> silent T
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)


# ------------------------------------------------------- Double Metaphone

_DM_VOWELS = "AEIOUY"


def double_metaphone(s: str, max_len: int = 4) -> str:
    """Double Metaphone primary code (Philips 2000) — the value the
    reference returns (DoubleMetaphone().doubleMetaphone(input))."""
    s = _letters(s)
    if not s:
        return ""
    n = len(s)
    slavo_germanic = bool(re.search(r"W|K|CZ|WITZ", s))
    pri: list[str] = []
    i = 0

    def at(j):
        return s[j] if 0 <= j < n else ""

    def m(j, *opts):
        return any(s[j:j + len(o)] == o for o in opts)

    def vowel(j):
        return at(j) in _DM_VOWELS

    # initial silent letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if at(0) == "X":
        pri.append("S")
        i = 1

    while i < n and len(pri) < max_len:
        c = at(i)
        if c in _DM_VOWELS:
            if i == 0:
                pri.append("A")
            i += 1
        elif c == "B":
            pri.append("P")
            i += 2 if at(i + 1) == "B" else 1
        elif c == "C":
            if (i > 1 and not vowel(i - 2) and m(i - 1, "ACH")
                    and at(i + 2) != "I"
                    and (at(i + 2) != "E" or m(i - 2, "BACHER", "MACHER"))):
                pri.append("K")
                i += 2
            elif i == 0 and m(i, "CAESAR"):
                pri.append("S")
                i += 2
            elif m(i, "CHIA"):
                pri.append("K")
                i += 2
            elif m(i, "CH"):
                if i > 0 and m(i, "CHAE"):
                    pri.append("K")
                elif (i == 0
                      and (m(i + 1, "HARAC", "HARIS")
                           or m(i + 1, "HOR", "HYM", "HIA", "HEM"))
                      and not m(0, "CHORE")):
                    pri.append("K")
                elif (m(0, "VAN ", "VON ") or m(0, "SCH")
                      or m(i - 2, "ORCHES", "ARCHIT", "ORCHID")
                      or at(i + 2) in "TS"
                      or ((at(i - 1) in "AOUE" or i == 0)
                          and at(i + 2) in "LRNMBHFVW ")):
                    pri.append("K")
                else:
                    pri.append("X" if i > 0 and not m(0, "MC") else
                               ("K" if i > 0 and m(0, "MC") else "X"))
                i += 2
            elif m(i, "CZ") and not m(i - 2, "WICZ"):
                pri.append("S")
                i += 2
            elif m(i + 1, "CIA"):
                pri.append("X")
                i += 3
            elif m(i, "CC") and not (i == 1 and at(0) == "M"):
                if at(i + 2) in "IEH" and not m(i + 2, "HU"):
                    if (i == 1 and at(0) == "A") or m(i - 1, "UCCEE", "UCCES"):
                        pri.append("KS")
                    else:
                        pri.append("X")
                    i += 3
                else:
                    pri.append("K")
                    i += 2
            elif m(i, "CK", "CG", "CQ"):
                pri.append("K")
                i += 2
            elif m(i, "CI", "CE", "CY"):
                pri.append("S")
                i += 2
            else:
                pri.append("K")
                if m(i + 1, " C", " Q", " G"):
                    i += 3
                elif at(i + 1) in "CKQ" and not m(i + 1, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if m(i, "DG"):
                if at(i + 2) in "IEY":
                    pri.append("J")
                    i += 3
                else:
                    pri.append("TK")
                    i += 2
            else:
                pri.append("T")
                i += 2 if m(i, "DT", "DD") else 1
        elif c == "F":
            pri.append("F")
            i += 2 if at(i + 1) == "F" else 1
        elif c == "G":
            if at(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    pri.append("K")
                elif i == 0:
                    pri.append("J" if at(i + 2) == "I" else "K")
                elif ((i > 1 and at(i - 2) in "BHD")
                      or (i > 2 and at(i - 3) in "BHD")
                      or (i > 3 and at(i - 4) in "BH")):
                    pass
                else:
                    if i > 2 and at(i - 1) == "U" and at(i - 3) in "CGLRT":
                        pri.append("F")
                    elif i > 0 and at(i - 1) != "I":
                        pri.append("K")
                i += 2
            elif at(i + 1) == "N":
                if i == 1 and vowel(0) and not slavo_germanic:
                    pri.append("KN")
                elif not m(i + 2, "EY") and at(i + 1) != "Y" and not slavo_germanic:
                    pri.append("N")
                else:
                    pri.append("KN")
                i += 2
            elif m(i + 1, "LI") and not slavo_germanic:
                pri.append("KL")
                i += 2
            elif i == 0 and (at(i + 1) == "Y"
                             or m(i + 1, "ES", "EP", "EB", "EL", "EY", "IB",
                                  "IL", "IN", "IE", "EI", "ER")):
                pri.append("K")
                i += 2
            elif ((m(i + 1, "ER") or at(i + 1) == "Y")
                  and not m(0, "DANGER", "RANGER", "MANGER")
                  and at(i - 1) not in "EI"
                  and not m(i - 1, "RGY", "OGY")):
                pri.append("K")
                i += 2
            elif at(i + 1) in "EIY" or m(i - 1, "AGGI", "OGGI"):
                if m(0, "VAN ", "VON ") or m(0, "SCH") or m(i + 1, "ET"):
                    pri.append("K")
                else:
                    pri.append("J")
                i += 2
            else:
                pri.append("K")
                i += 2 if at(i + 1) == "G" else 1
        elif c == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                pri.append("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if m(i, "JOSE") or m(0, "SAN "):
                if (i == 0 and at(i + 4) == " ") or m(0, "SAN "):
                    pri.append("H")
                else:
                    pri.append("J")
                i += 1
            else:
                if i == 0 and not m(i, "JOSE"):
                    pri.append("J")
                elif vowel(i - 1) and not slavo_germanic and at(i + 1) in "AO":
                    pri.append("J")
                elif i == n - 1:
                    pri.append("J")
                elif at(i + 1) not in "LTKSNMBZ" and at(i - 1) not in "SKL":
                    pri.append("J")
                i += 2 if at(i + 1) == "J" else 1
        elif c == "K":
            pri.append("K")
            i += 2 if at(i + 1) == "K" else 1
        elif c == "L":
            pri.append("L")
            i += 2 if at(i + 1) == "L" else 1
        elif c == "M":
            pri.append("M")
            if (m(i - 1, "UMB") and (i + 1 == n - 1 or m(i + 2, "ER"))) \
                    or at(i + 1) == "M":
                i += 2
            else:
                i += 1
        elif c == "N":
            pri.append("N")
            i += 2 if at(i + 1) == "N" else 1
        elif c == "P":
            if at(i + 1) == "H":
                pri.append("F")
                i += 2
            else:
                pri.append("P")
                i += 2 if at(i + 1) in "PB" else 1
        elif c == "Q":
            pri.append("K")
            i += 2 if at(i + 1) == "Q" else 1
        elif c == "R":
            if not (i == n - 1 and not slavo_germanic
                    and m(i - 2, "IER") and not m(i - 4, "ME", "MA")):
                pri.append("R")
            i += 2 if at(i + 1) == "R" else 1
        elif c == "S":
            if m(i - 1, "ISL", "YSL"):
                i += 1
            elif i == 0 and m(i, "SUGAR"):
                pri.append("X")
                i += 1
            elif m(i, "SH"):
                pri.append("S" if m(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ")
                           else "X")
                i += 2
            elif m(i, "SIO", "SIA"):
                pri.append("S")
                i += 3
            elif (i == 0 and at(i + 1) in "MNLW") or at(i + 1) == "Z":
                pri.append("S")
                i += 2 if at(i + 1) == "Z" else 1
            elif m(i, "SC"):
                if at(i + 2) == "H":
                    if m(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        pri.append("SK")
                    elif i == 0 and not vowel(3) and at(3) != "W":
                        pri.append("X")
                    else:
                        pri.append("X")
                elif at(i + 2) in "IEY":
                    pri.append("S")
                else:
                    pri.append("SK")
                i += 3
            else:
                if not (i == n - 1 and m(i - 2, "AI", "OI")):
                    pri.append("S")
                i += 2 if at(i + 1) in "SZ" else 1
        elif c == "T":
            if m(i, "TION") or m(i, "TIA", "TCH"):
                pri.append("X")
                i += 3
            elif m(i, "TH") or m(i, "TTH"):
                if m(i + 2, "OM", "AM") or m(0, "VAN ", "VON ") or m(0, "SCH"):
                    pri.append("T")
                else:
                    pri.append("0")
                i += 2
            else:
                pri.append("T")
                i += 2 if at(i + 1) in "TD" else 1
        elif c == "V":
            pri.append("F")
            i += 2 if at(i + 1) == "V" else 1
        elif c == "W":
            if m(i, "WR"):
                pri.append("R")
                i += 2
            else:
                if i == 0 and (vowel(i + 1) or m(i, "WH")):
                    pri.append("A" if vowel(i + 1) else "A")
                if (i == n - 1 and vowel(i - 1)) \
                        or m(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
                        or m(0, "SCH"):
                    pass
                elif m(i, "WICZ", "WITZ"):
                    pri.append("TS")
                    i += 3
                i += 1
        elif c == "X":
            if not (i == n - 1
                    and (m(i - 3, "IAU", "EAU") or m(i - 2, "AU", "OU"))):
                pri.append("KS")
            i += 2 if at(i + 1) in "CX" else 1
        elif c == "Z":
            if at(i + 1) == "H":
                pri.append("J")
                i += 2
            else:
                pri.append("S")
                i += 2 if at(i + 1) == "Z" else 1
        else:
            i += 1
    return "".join(pri)[:max_len]


# -------------------------------------------------- Daitch-Mokotoff soundex

# (pattern, code_at_start, code_before_vowel, code_otherwise); "" = not
# coded. First-listed alternative only — the reference's encode() is the
# commons no-branching form.
_DM_RULES = [
    ("SCHTSCH", "2", "4", "4"), ("SCHTSH", "2", "4", "4"),
    ("SCHTCH", "2", "4", "4"),
    ("SHTCH", "2", "4", "4"), ("SHTSH", "2", "4", "4"), ("SHCH", "2", "4", "4"),
    ("SCHT", "2", "43", "43"), ("SCHD", "2", "43", "43"),
    ("SCH", "4", "4", "4"),
    ("SHT", "2", "43", "43"), ("SH", "4", "4", "4"),
    ("STCH", "2", "4", "4"), ("STSCH", "2", "4", "4"), ("SC", "2", "4", "4"),
    ("STRZ", "2", "4", "4"), ("STRS", "2", "4", "4"), ("STSH", "2", "4", "4"),
    ("ST", "2", "43", "43"),
    ("SZCZ", "2", "4", "4"), ("SZCS", "2", "4", "4"),
    ("SZT", "2", "43", "43"), ("SHD", "2", "43", "43"),
    ("SZD", "2", "43", "43"), ("SD", "2", "43", "43"),
    ("SZ", "4", "4", "4"),
    ("ZDZH", "2", "4", "4"), ("ZHDZH", "2", "4", "4"), ("ZDZ", "2", "4", "4"),
    ("ZHD", "2", "43", "43"), ("ZD", "2", "43", "43"),
    ("ZSCH", "4", "4", "4"), ("ZSH", "4", "4", "4"),
    ("ZH", "4", "4", "4"), ("ZS", "4", "4", "4"),
    ("CHS", "5", "54", "54"), ("CSZ", "4", "4", "4"), ("CZS", "4", "4", "4"),
    ("CH", "5", "5", "5"), ("CK", "5", "5", "5"), ("CZ", "4", "4", "4"),
    ("CS", "4", "4", "4"),
    ("DRZ", "4", "4", "4"), ("DRS", "4", "4", "4"), ("DSH", "4", "4", "4"),
    ("DSZ", "4", "4", "4"), ("DZH", "4", "4", "4"), ("DZS", "4", "4", "4"),
    ("DS", "4", "4", "4"), ("DZ", "4", "4", "4"),
    ("DT", "3", "3", "3"),
    ("TTCH", "4", "4", "4"), ("TTSCH", "4", "4", "4"), ("TCH", "4", "4", "4"),
    ("TRZ", "4", "4", "4"), ("TRS", "4", "4", "4"),
    ("TSCH", "4", "4", "4"), ("TSH", "4", "4", "4"),
    ("TTSZ", "4", "4", "4"), ("TTS", "4", "4", "4"), ("TSZ", "4", "4", "4"),
    ("TZS", "4", "4", "4"), ("TTZ", "4", "4", "4"), ("TZ", "4", "4", "4"),
    ("TS", "4", "4", "4"), ("TC", "4", "4", "4"),
    ("TH", "3", "3", "3"),
    ("AI", "0", "1", ""), ("AJ", "0", "1", ""), ("AY", "0", "1", ""),
    ("AU", "0", "7", ""),
    ("EI", "0", "1", ""), ("EY", "0", "1", ""), ("EJ", "0", "1", ""),
    ("EU", "1", "1", ""),
    ("OI", "0", "1", ""), ("OJ", "0", "1", ""), ("OY", "0", "1", ""),
    ("UI", "0", "1", ""), ("UJ", "0", "1", ""), ("UY", "0", "1", ""),
    ("UE", "0", "", ""),
    ("IA", "1", "", ""), ("IE", "1", "", ""), ("IO", "1", "", ""),
    ("IU", "1", "", ""),
    ("KS", "5", "54", "54"), ("KH", "5", "5", "5"),
    ("MN", "66", "66", "66"), ("NM", "66", "66", "66"),
    ("FB", "7", "7", "7"), ("PF", "7", "7", "7"), ("PH", "7", "7", "7"),
    ("RZ", "94", "94", "94"), ("RS", "94", "94", "94"),
    ("A", "0", "", ""), ("B", "7", "7", "7"), ("C", "5", "5", "5"),
    ("D", "3", "3", "3"), ("E", "0", "", ""), ("F", "7", "7", "7"),
    ("G", "5", "5", "5"), ("H", "5", "5", ""), ("I", "0", "", ""),
    ("J", "1", "", ""), ("K", "5", "5", "5"), ("L", "8", "8", "8"),
    ("M", "6", "6", "6"), ("N", "6", "6", "6"), ("O", "0", "", ""),
    ("P", "7", "7", "7"), ("Q", "5", "5", "5"), ("R", "9", "9", "9"),
    ("S", "4", "4", "4"), ("T", "3", "3", "3"), ("U", "0", "", ""),
    ("V", "7", "7", "7"), ("W", "7", "7", "7"), ("X", "5", "54", "54"),
    ("Y", "1", "", ""), ("Z", "4", "4", "4"),
]


def dm_soundex(s: str) -> str:
    """Daitch-Mokotoff soundex, no-branching form: 6 digits, 0-padded
    (Peters -> 739400, GOLDEN -> 583600)."""
    s = _letters(s)
    if not s:
        return ""
    codes: list[str] = []
    last = None
    i = 0
    n = len(s)
    while i < n:
        for pat, at_start, before_vowel, other in _DM_RULES:
            if s.startswith(pat, i):
                j = i + len(pat)
                if i == 0:
                    code = at_start
                elif j < n and s[j] in "AEIOUJY":
                    code = before_vowel
                else:
                    code = other
                if code and code != last:
                    codes.append(code)
                last = code if code else last
                i = j
                break
        else:
            i += 1
    return ("".join(codes) + "000000")[:6]
