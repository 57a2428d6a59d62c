"""Coordinate-reference-system transforms for ST_Transform.

The reference UDF (contrib/udfs/src/main/java/org/apache/drill/exec/
udfs/gis/STTransform.java:37) delegates to proj4j's
``BasicCoordinateTransform`` between two EPSG codes. No projection
library ships in this environment, so this module implements the
closed-form projection math for the codes a Drill user realistically
passes — the published PROJ algorithms (Snyder, "Map Projections — A
Working Manual", USGS PP 1395), which is also exactly what proj4j
implements:

- geographic CRS: EPSG:4326 (WGS84), 4269 (NAD83) — coordinates pass
  through (proj4j applies no datum shift between WGS84 and NAD83
  either: neither carries a towgs84 grid in its EPSG defaults).
- EPSG:3857 web mercator (spherical formulas on the WGS84 sphere, per
  the EPSG "Popular Visualisation Pseudo-Mercator" method 1024).
- Lambert conformal conic 2SP state-plane zones (the reference's own
  test uses EPSG:2249, NAD83 / Massachusetts Mainland in US survey
  feet) — a small parameter table, easy to extend.
- UTM: EPSG 32601-32660 / 32701-32760 (WGS84 north/south),
  26901-26923 (NAD83) and 25828-25838 (ETRS89), via the ellipsoidal
  transverse-mercator series (Snyder eq. 8-9..8-17 / 3-21), sub-mm
  inside a zone.
- Ellipsoidal Mercator 1SP (EPSG:3395 World Mercator) and Albers
  equal-area conic (EPSG:5070 CONUS, 3578 Yukon), Snyder 7-7/7-10 and
  14-1..14-21.

Any OTHER code is reachable without touching this file:
``register_epsg(code, params)`` installs parameters taken from the
public EPSG registry — given as a dict or a PROJ.4 string (e.g.
``"+proj=lcc +lat_1=49 +lat_2=44 ..."``), the format every EPSG
lookup site publishes — after which ST_Transform accepts the code.
The projection FAMILIES here (longlat, lcc, tmerc, merc, aea,
webmerc) cover the overwhelming majority of the registry; an
unregistered code or unsupported family raises NotImplementedError
naming itself, never a silently wrong transform.

Transforms run source->geographic(radians)->target, matching proj4j's
pipeline: ``inverse(src) . forward(tgt)`` with false eastings/northings
in metres and ``to_meter`` unit scaling applied outside the core math.
"""

from __future__ import annotations

import math

# ellipsoid name -> (semi-major axis a, flattening f)
_ELLPS = {
    "WGS84": (6378137.0, 1 / 298.257223563),
    "GRS80": (6378137.0, 1 / 298.257222101),
    "clrk66": (6378206.4, 1 / 294.9786982138982),
    "intl": (6378388.0, 1 / 297.0),
}

_US_FT = 0.3048006096012192  # US survey foot, metres


def _lcc(lat_1, lat_2, lat_0, lon_0, x_0, y_0, ellps, to_meter=1.0):
    return {"proj": "lcc", "lat_1": lat_1, "lat_2": lat_2, "lat_0": lat_0,
            "lon_0": lon_0, "x_0": x_0, "y_0": y_0, "ellps": ellps,
            "to_meter": to_meter}


def _utm(zone, south, ellps):
    return {"proj": "tmerc", "lat_0": 0.0, "lon_0": zone * 6 - 183,
            "k_0": 0.9996, "x_0": 500000.0,
            "y_0": 10000000.0 if south else 0.0, "ellps": ellps,
            "to_meter": 1.0}


def _aea(lat_1, lat_2, lat_0, lon_0, x_0, y_0, ellps):
    return {"proj": "aea", "lat_1": lat_1, "lat_2": lat_2, "lat_0": lat_0,
            "lon_0": lon_0, "x_0": x_0, "y_0": y_0, "ellps": ellps,
            "to_meter": 1.0}


# user-registered codes (register_epsg) — consulted before the builtins
_EPSG_REGISTRY: dict[int, dict] = {}

_UNIT_TO_METER = {"m": 1.0, "us-ft": _US_FT, "ft": 0.3048, "us-in": _US_FT / 12}


def _ellps_from_kv(kv: dict) -> str:
    """Resolve the ellipsoid of one parsed PROJ.4 string. Numeric axes
    (+a with +b or +rf, or a +R sphere) ALWAYS define the figure — even
    when no +ellps name is given (common for sphere-based registry
    CRSs) — registered under a synthetic key so the default never
    silently substitutes WGS84. A named but unknown +ellps without
    numeric axes raises by name, keeping the module's "never a silently
    wrong transform" contract."""
    a = kv.get("a", kv.get("R"))
    if a is not None:
        a = float(a)
        if "rf" in kv and float(kv["rf"]) != 0.0:
            f = 1.0 / float(kv["rf"])
        elif "b" in kv:
            f = (a - float(kv["b"])) / a
        else:
            f = 0.0  # +a alone or +R: sphere
        key = f"custom:a={a:.6f},f={f:.12g}"
        _ELLPS[key] = (a, f)
        return key
    name = kv.get("ellps", "WGS84")
    if name not in _ELLPS:
        raise NotImplementedError(
            f"proj4 ellipsoid {name!r} unknown to this module "
            f"({'/'.join(sorted(_ELLPS))}); give +a with +b or +rf instead")
    return name


def parse_proj4(s: str) -> dict:
    """A PROJ.4 definition string -> the parameter dict this module
    projects with. Supports the parameters of the implemented families
    (lcc, tmerc/utm, merc, aea, webmerc, longlat)."""
    kv: dict[str, str] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        elif tok:
            kv[tok] = ""
    proj = kv.get("proj")
    if proj in ("longlat", "latlong"):
        return {"proj": "longlat", "ellps": _ellps_from_kv(kv)}
    if proj == "utm":
        return _utm(int(kv["zone"]), "south" in kv, _ellps_from_kv(kv))
    if proj not in ("lcc", "tmerc", "merc", "aea", "webmerc"):
        raise NotImplementedError(f"proj4 projection {proj!r} not supported "
                                  "(lcc/tmerc/utm/merc/aea/webmerc/longlat)")
    p = {"proj": proj, "ellps": _ellps_from_kv(kv)}
    for name in ("lat_1", "lat_2", "lat_0", "lon_0", "x_0", "y_0", "lat_ts"):
        if name in kv:
            p[name] = float(kv[name])
    p.setdefault("lat_0", 0.0)
    p.setdefault("lon_0", 0.0)
    p.setdefault("x_0", 0.0)
    p.setdefault("y_0", 0.0)
    if "k_0" in kv or "k" in kv:
        p["k_0"] = float(kv.get("k_0", kv.get("k")))
    if "to_meter" in kv:
        p["to_meter"] = float(kv["to_meter"])
    else:
        p["to_meter"] = _UNIT_TO_METER.get(kv.get("units", "m"), 1.0)
    return p


def register_epsg(code: int, params) -> None:
    """Install projection parameters for an EPSG code from the public
    registry: a parameter dict, or the PROJ.4 string published for the
    code (epsg.io/spatialreference.org). Subsequent ST_Transform calls
    accept the code."""
    _EPSG_REGISTRY[int(code)] = (
        parse_proj4(params) if isinstance(params, str) else dict(params)
    )


def epsg_params(code: int) -> dict:
    """PROJ-style parameters for one EPSG code (builtin table +
    register_epsg extensions). Unknown codes raise NotImplementedError
    naming the code — never a silently wrong transform."""
    if code in _EPSG_REGISTRY:
        return _EPSG_REGISTRY[code]
    if code in (4326, 4269, 4258):  # WGS84 / NAD83 / ETRS89 geographic
        return {"proj": "longlat", "ellps": "WGS84" if code == 4326 else "GRS80"}
    if code == 3857:
        return {"proj": "webmerc", "ellps": "WGS84"}
    if code == 3395:  # WGS 84 / World Mercator (ellipsoidal, 1SP)
        return {"proj": "merc", "lat_0": 0.0, "lon_0": 0.0, "k_0": 1.0,
                "x_0": 0.0, "y_0": 0.0, "ellps": "WGS84", "to_meter": 1.0}
    if code == 2249:  # NAD83 / Massachusetts Mainland (ftUS) — the reference's test CRS
        return _lcc(42.68333333333333, 41.71666666666667, 41.0, -71.5,
                    200000.0001016002, 750000.0000000001, "GRS80", _US_FT)
    if code == 2263:  # NAD83 / New York Long Island (ftUS)
        return _lcc(41.03333333333333, 40.66666666666666, 40.16666666666666,
                    -74.0, 300000.0000000001, 0.0, "GRS80", _US_FT)
    if code == 2154:  # RGF93 / Lambert-93 (France)
        return _lcc(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0, "GRS80")
    if code == 5070:  # NAD83 / Conus Albers
        return _aea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0, "GRS80")
    if code == 3578:  # NAD83 / Yukon Albers (formerly the named gate)
        return _aea(61.66666666666666, 68.0, 59.0, -132.5,
                    500000.0, 500000.0, "GRS80")
    if 32601 <= code <= 32660:
        return _utm(code - 32600, False, "WGS84")
    if 32701 <= code <= 32760:
        return _utm(code - 32700, True, "WGS84")
    if 26901 <= code <= 26923:
        return _utm(code - 26900, False, "GRS80")
    if 25828 <= code <= 25838:  # ETRS89 / UTM
        return _utm(code - 25800, False, "GRS80")
    raise NotImplementedError(
        f"EPSG:{code} is not in the engine's projection table "
        "(builtin: 4326/4269/4258 geographic, 3857/3395 mercator, LCC "
        "2249/2263/2154, Albers 5070/3578, UTM 326xx/327xx/269xx/258xx); "
        "install any other code from the public registry with "
        "drill_spark.ops.crs.register_epsg(code, '+proj=...')"
    )


# ------------------------------------------------------- core math


def _tsfn(phi, sinphi, e):
    con = e * sinphi
    return math.tan(0.5 * (math.pi / 2 - phi)) / ((1 - con) / (1 + con)) ** (0.5 * e)


def _msfn(sinphi, cosphi, es):
    return cosphi / math.sqrt(1 - es * sinphi * sinphi)


def _phi2(ts, e):
    """Inverse of _tsfn by fixed-point iteration (PROJ pj_phi2)."""
    phi = math.pi / 2 - 2 * math.atan(ts)
    for _ in range(25):
        con = e * math.sin(phi)
        dphi = math.pi / 2 - 2 * math.atan(ts * ((1 - con) / (1 + con)) ** (0.5 * e)) - phi
        phi += dphi
        if abs(dphi) < 1e-14:
            break
    return phi


class _Lcc:
    """Lambert conformal conic, 2 standard parallels (Snyder 15-1..15-11)."""

    def __init__(self, p):
        self.a, f = _ELLPS[p["ellps"]]
        self.es = 2 * f - f * f
        self.e = math.sqrt(self.es)
        phi1, phi2 = math.radians(p["lat_1"]), math.radians(p["lat_2"])
        self.phi0, self.lam0 = math.radians(p["lat_0"]), math.radians(p["lon_0"])
        m1 = _msfn(math.sin(phi1), math.cos(phi1), self.es)
        m2 = _msfn(math.sin(phi2), math.cos(phi2), self.es)
        t1 = _tsfn(phi1, math.sin(phi1), self.e)
        t2 = _tsfn(phi2, math.sin(phi2), self.e)
        self.n = math.log(m1 / m2) / math.log(t1 / t2)
        self.F = m1 / (self.n * t1 ** self.n)
        t0 = _tsfn(self.phi0, math.sin(self.phi0), self.e)
        self.rho0 = self.a * self.F * t0 ** self.n

    def forward(self, lam, phi):
        rho = self.a * self.F * _tsfn(phi, math.sin(phi), self.e) ** self.n
        th = self.n * (lam - self.lam0)
        return rho * math.sin(th), self.rho0 - rho * math.cos(th)

    def inverse(self, x, y):
        y = self.rho0 - y
        rho = math.copysign(math.hypot(x, y), self.n)
        if self.n < 0:
            x, y = -x, -y
        th = math.atan2(x, y)
        ts = (rho / (self.a * self.F)) ** (1 / self.n)
        return th / self.n + self.lam0, _phi2(ts, self.e)


class _Tmerc:
    """Ellipsoidal transverse mercator (Snyder 8-9..8-17, 3-21)."""

    def __init__(self, p):
        self.a, f = _ELLPS[p["ellps"]]
        self.es = 2 * f - f * f
        self.ep2 = self.es / (1 - self.es)
        self.k0 = p.get("k_0", 1.0)
        self.lam0 = math.radians(p["lon_0"])
        self.phi0 = math.radians(p["lat_0"])
        self.m0 = self._mdist(self.phi0)

    def _mdist(self, phi):
        es = self.es
        return self.a * (
            (1 - es / 4 - 3 * es**2 / 64 - 5 * es**3 / 256) * phi
            - (3 * es / 8 + 3 * es**2 / 32 + 45 * es**3 / 1024) * math.sin(2 * phi)
            + (15 * es**2 / 256 + 45 * es**3 / 1024) * math.sin(4 * phi)
            - (35 * es**3 / 3072) * math.sin(6 * phi)
        )

    def forward(self, lam, phi):
        es, ep2, k0 = self.es, self.ep2, self.k0
        sinp, cosp, tanp = math.sin(phi), math.cos(phi), math.tan(phi)
        N = self.a / math.sqrt(1 - es * sinp * sinp)
        T = tanp * tanp
        C = ep2 * cosp * cosp
        A = cosp * (lam - self.lam0)
        M = self._mdist(phi)
        x = k0 * N * (A + (1 - T + C) * A**3 / 6
                      + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120)
        y = k0 * (M - self.m0 + N * tanp * (A * A / 2
                  + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
                  + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720))
        return x, y

    def inverse(self, x, y):
        es, ep2, k0 = self.es, self.ep2, self.k0
        e1 = (1 - math.sqrt(1 - es)) / (1 + math.sqrt(1 - es))
        M = self.m0 + y / k0
        mu = M / (self.a * (1 - es / 4 - 3 * es**2 / 64 - 5 * es**3 / 256))
        phi1 = (mu + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
                + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
                + (151 * e1**3 / 96) * math.sin(6 * mu)
                + (1097 * e1**4 / 512) * math.sin(8 * mu))
        sinp, cosp, tanp = math.sin(phi1), math.cos(phi1), math.tan(phi1)
        C1 = ep2 * cosp * cosp
        T1 = tanp * tanp
        N1 = self.a / math.sqrt(1 - es * sinp * sinp)
        R1 = self.a * (1 - es) / (1 - es * sinp * sinp) ** 1.5
        D = x / (N1 * k0)
        phi = phi1 - (N1 * tanp / R1) * (D * D / 2
              - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * ep2) * D**4 / 24
              + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * ep2 - 3 * C1 * C1) * D**6 / 720)
        lam = self.lam0 + (D - (1 + 2 * T1 + C1) * D**3 / 6
              + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * ep2 + 24 * T1 * T1) * D**5 / 120) / cosp
        return lam, phi


class _WebMerc:
    """Spherical pseudo-mercator on the WGS84 sphere (EPSG method 1024)."""

    def __init__(self, p):
        self.a = _ELLPS[p["ellps"]][0]

    def forward(self, lam, phi):
        return self.a * lam, self.a * math.log(math.tan(math.pi / 4 + phi / 2))

    def inverse(self, x, y):
        return x / self.a, 2 * math.atan(math.exp(y / self.a)) - math.pi / 2


class _Merc:
    """Ellipsoidal Mercator 1SP (Snyder 7-7 / 7-10); k_0 from lat_ts
    when given (Snyder 7-8: k_0 = m(lat_ts))."""

    def __init__(self, p):
        self.a, f = _ELLPS[p["ellps"]]
        self.es = 2 * f - f * f
        self.e = math.sqrt(self.es)
        self.lam0 = math.radians(p.get("lon_0", 0.0))
        if "lat_ts" in p:
            ts = math.radians(p["lat_ts"])
            self.k0 = _msfn(math.sin(ts), math.cos(ts), self.es)
        else:
            self.k0 = p.get("k_0", 1.0)

    def forward(self, lam, phi):
        x = self.a * self.k0 * (lam - self.lam0)
        y = -self.a * self.k0 * math.log(_tsfn(phi, math.sin(phi), self.e))
        return x, y

    def inverse(self, x, y):
        lam = self.lam0 + x / (self.a * self.k0)
        phi = _phi2(math.exp(-y / (self.a * self.k0)), self.e)
        return lam, phi


def _qsfn(sinphi, e, es):
    """Snyder 3-12: authalic q."""
    if e < 1e-12:
        return 2.0 * sinphi
    con = e * sinphi
    return (1 - es) * (sinphi / (1 - con * con)
                       - (0.5 / e) * math.log((1 - con) / (1 + con)))


class _Aea:
    """Albers equal-area conic, 2 standard parallels (Snyder
    14-1..14-21, iterative inverse 3-16)."""

    def __init__(self, p):
        self.a, f = _ELLPS[p["ellps"]]
        self.es = 2 * f - f * f
        self.e = math.sqrt(self.es)
        phi1, phi2 = math.radians(p["lat_1"]), math.radians(p["lat_2"])
        phi0 = math.radians(p["lat_0"])
        self.lam0 = math.radians(p["lon_0"])
        m1 = _msfn(math.sin(phi1), math.cos(phi1), self.es)
        m2 = _msfn(math.sin(phi2), math.cos(phi2), self.es)
        q1 = _qsfn(math.sin(phi1), self.e, self.es)
        q2 = _qsfn(math.sin(phi2), self.e, self.es)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        q0 = _qsfn(math.sin(phi0), self.e, self.es)
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n

    def forward(self, lam, phi):
        q = _qsfn(math.sin(phi), self.e, self.es)
        rho = self.a * math.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lam - self.lam0)
        return rho * math.sin(th), self.rho0 - rho * math.cos(th)

    def inverse(self, x, y):
        y = self.rho0 - y
        rho = math.hypot(x, y)
        if self.n < 0:
            rho, x, y = -rho, -x, -y
        th = math.atan2(x, y)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        phi = math.asin(max(-1.0, min(1.0, q / 2)))
        for _ in range(30):  # Snyder 3-16
            sinp = math.sin(phi)
            con = self.e * sinp
            dphi = ((1 - con * con) ** 2 / (2 * math.cos(phi))) * (
                q / (1 - self.es) - sinp / (1 - con * con)
                + (0.5 / self.e) * math.log((1 - con) / (1 + con))
            )
            phi += dphi
            if abs(dphi) < 1e-13:
                break
        return th / self.n + self.lam0, phi


def _projection(p):
    return {"lcc": _Lcc, "tmerc": _Tmerc, "webmerc": _WebMerc,
            "merc": _Merc, "aea": _Aea}[p["proj"]](p)


class CrsTransform:
    """point-wise (x, y) -> (x', y') between two EPSG codes."""

    def __init__(self, src: int, tgt: int):
        self.src_p = epsg_params(src)
        self.tgt_p = epsg_params(tgt)
        self.src = None if self.src_p["proj"] == "longlat" else _projection(self.src_p)
        self.tgt = None if self.tgt_p["proj"] == "longlat" else _projection(self.tgt_p)

    def __call__(self, x: float, y: float) -> tuple:
        if self.src is None:
            lam, phi = math.radians(x), math.radians(y)
        else:
            p = self.src_p
            xm = x * p.get("to_meter", 1.0) - p.get("x_0", 0.0)
            ym = y * p.get("to_meter", 1.0) - p.get("y_0", 0.0)
            lam, phi = self.src.inverse(xm, ym)
        if self.tgt is None:
            return math.degrees(lam), math.degrees(phi)
        p = self.tgt_p
        xm, ym = self.tgt.forward(lam, phi)
        return ((xm + p.get("x_0", 0.0)) / p.get("to_meter", 1.0),
                (ym + p.get("y_0", 0.0)) / p.get("to_meter", 1.0))
