"""String-distance kernels for the reference's StringDistanceFunctions
surface (contrib/udfs/.../StringDistanceFunctions.java, commons-text-
backed there). The commons-text semantics, reimplemented:

- jaro_distance: 1 - Jaro-Winkler similarity (standard 0.1 prefix
  scale, 4-char prefix cap). TestStringDistanceFunctions.java:
  jaro_distance('Big car', 'red car') = 0.2857142857142857.
- fuzzy_score: one point per query character matched in order inside
  the term, +2 for each consecutive match (the Sublime-style matcher).
- longest_common_substring_distance: len(a) + len(b) - 2 * |LCS|
  over subSEQUENCES (the commons class name says substring, the
  implementation is subsequence distance).

cosine_distance / hamming_distance / levenshtein_distance /
jaccard_distance stay pure-SQL Catalyst expressions in
drill_spark.functions (no Python round-trip).
"""

from __future__ import annotations


def jaro_winkler_similarity(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched characters in order
    sa = [a[i] for i in range(la) if ma[i]]
    sb = [b[j] for j in range(lb) if mb[j]]
    t = sum(x != y for x, y in zip(sa, sb)) // 2
    jaro = (matches / la + matches / lb + (matches - t) / matches) / 3
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def jaro_distance(a: str, b: str) -> float:
    return 1.0 - jaro_winkler_similarity(a, b)


def fuzzy_score(term: str, query: str) -> int:
    term_l = term.lower()
    query_l = query.lower()
    score = 0
    pos = 0
    prev_match = -2
    for qc in query_l:
        found = term_l.find(qc, pos)
        if found < 0:
            # commons-text burns the scan pointer on a failed match:
            # later query characters cannot match anymore
            pos = len(term_l)
            continue
        score += 1
        if found == prev_match + 1:
            score += 2
        prev_match = found
        pos = found + 1
    return score


def lcs_length(a: str, b: str) -> int:
    """Longest common subsequence length, O(len(a)*len(b)) rolling row."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def lcs_distance(a: str, b: str) -> int:
    return len(a) + len(b) - 2 * lcs_length(a, b)
