"""HDF5 format reader — classic-layout HDF5 files as tables.

Drill reference: contrib/format-hdf5 (store/hdf5/HDF5BatchReader.java,
jhdf-backed) emits one row per object with path / data_type /
file_name / data_size / element_count / dataset_data_type /
dimensions / typed data columns (``int_data``/``long_data``/
``float_data``/``double_data``...) / is_link, and a ``defaultPath``
option that projects a single dataset as rows and ``<type>_col_N``
columns. The HDF5 on-disk structure is publicly specified (the HDF5
File Format Specification); this module implements the classic
subset those semantics need:

- superblock v0 (8-byte offsets) and v2/v3;
- v1 object headers with continuation blocks; dataspace v1/v2,
  datatype classes fixed-point / float / fixed string, data layout
  v3 (compact, contiguous, chunked) and v1/v2, filter pipeline with
  deflate, symbol-table message for old-style groups;
- group traversal: v1 B-tree (``TREE`` node type 0) → ``SNOD``
  symbol nodes → link names in the ``HEAP`` local heap;
- chunked datasets: v1 B-tree node type 1 keyed by chunk offset,
  per-chunk deflate, assembled with numpy and clipped to the
  dataspace bounds.

Vlen and compound datatypes ARE decoded (global-heap indirection and
member-wise struct unpack). Anything outside the subset (new-style v2
object headers, fractal-heap groups) raises ``NotImplementedError``
naming the structure — never silent rows.

Schema deviation from the reference, on purpose: Spark columns are
one type per column, so ``int_data``/``float_data``/... are always
``array<array<T>>`` — a 1-D dataset arrives as one inner list (the
reference writes 1-D flat and 2-D nested in the same column, which a
static schema cannot express).

Validated against the reference plugin's own .h5 fixtures (dset /
scalar / non-scalar / browsing), reproducing TestHDF5Format's rows.

Scale shape: one mapInPandas task per file (HDF5 is a pointer-dense
single-file structure; file-level parallelism is the realistic unit,
as in the reference's one-reader-per-file)."""

from __future__ import annotations

import glob as _glob
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

SIGNATURE = b"\x89HDF\r\n\x1a\n"


class _H5:
    def __init__(self, data: bytes):
        self.d = data
        if data[:8] != SIGNATURE:
            raise ValueError("not an HDF5 file (bad signature)")
        ver = data[8]
        if ver == 0:
            if data[13] != 8 or data[14] != 8:
                raise NotImplementedError("HDF5 non-8-byte offsets/lengths")
            (self.root,) = struct.unpack_from("<Q", data, 56 + 8)
        elif ver in (2, 3):
            if data[9] != 8 or data[10] != 8:
                raise NotImplementedError("HDF5 non-8-byte offsets/lengths")
            (self.root,) = struct.unpack_from("<Q", data, 36)
        else:
            raise NotImplementedError(f"HDF5 superblock version {ver}")
        self.objects: list[dict] = []
        self._seen: set[int] = set()
        self._walk(self.root, "/")

    # ------------------------------------------------------ object header
    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        d = self.d
        if d[addr : addr + 4] == b"OHDR":
            raise NotImplementedError("HDF5 v2 object headers (OHDR)")
        ver, _, nmsgs, _refs, hsize = struct.unpack_from("<BBHII", d, addr)
        if ver != 1:
            raise NotImplementedError(f"HDF5 object header version {ver}")
        blocks = [(addr + 16, hsize)]
        out: list[tuple[int, bytes]] = []
        while blocks and len(out) < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(out) < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", d, pos)
                body = d[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((coff, clen))
                else:
                    out.append((mtype, body))
        return out

    # ----------------------------------------------------------- groups
    def _heap_str(self, heap_data_addr: int, off: int) -> str:
        d = self.d
        end = d.index(b"\x00", heap_data_addr + off)
        return d[heap_data_addr + off : end].decode("utf-8")

    def _walk(self, addr: int, path: str):
        if addr >= len(self.d):  # undefined address: soft/external link
            self.objects.append({"path": path, "kind": "LINK"})
            return
        if addr in self._seen:
            return
        self._seen.add(addr)
        msgs = self._messages(addr)
        types = {t for t, _ in msgs}
        attrs = {}
        for t, b in msgs:
            if t == 0x000C:
                try:
                    k, v = self._attribute(b)
                    attrs[k] = v
                except (NotImplementedError, ValueError, struct.error):
                    pass  # attribute metadata is best-effort, never fatal
        if 0x0011 in types:  # symbol table -> group
            self.objects.append({"path": path, "kind": "GROUP", "attrs": attrs})
            (body,) = (b for t, b in msgs if t == 0x0011)
            btree, heap = struct.unpack_from("<QQ", body, 0)
            hd = self.d
            if hd[heap : heap + 4] != b"HEAP":
                raise ValueError("bad local heap signature")
            (heap_data,) = struct.unpack_from("<Q", hd, heap + 24)
            for name_off, child in self._group_entries(btree):
                name = self._heap_str(heap_data, name_off)
                child_path = (path.rstrip("/") + "/" + name) or "/"
                self._walk(child, child_path)
        elif {0x0002, 0x0006} & types:
            raise NotImplementedError("HDF5 new-style (link-message) groups")
        else:
            obj = self._dataset(path, msgs)
            obj["attrs"] = attrs
            self.objects.append(obj)

    def _group_entries(self, btree_addr: int):
        d = self.d
        sig = d[btree_addr : btree_addr + 4]
        if sig == b"SNOD":
            nsyms = struct.unpack_from("<H", d, btree_addr + 6)[0]
            for i in range(nsyms):
                e = btree_addr + 8 + i * 40
                name_off, objhdr = struct.unpack_from("<QQ", d, e)
                yield name_off, objhdr
            return
        if sig != b"TREE":
            raise ValueError(f"bad group B-tree signature {sig!r}")
        _ntype, level, nentries = struct.unpack_from("<BBH", d, btree_addr + 4)
        pos = btree_addr + 8 + 16  # skip left/right siblings
        pos += 8  # key 0
        for _ in range(nentries):
            (child,) = struct.unpack_from("<Q", d, pos)
            pos += 16  # child + next key
            yield from self._group_entries(child)

    # ----------------------------------------------------------- dataset
    def _dataset(self, path: str, msgs) -> dict:
        dims: list[int] = []
        dtype = None
        layout = None
        filters: list[int] = []
        unsupported = None
        for t, b in msgs:
            if t == 0x0001:  # dataspace
                ver, rank = b[0], b[1]
                off = 8 if ver == 1 else 4
                dims = list(struct.unpack_from(f"<{rank}Q", b, off))
            elif t == 0x0003:
                try:
                    dtype = self._datatype(b)
                except NotImplementedError as e:
                    # metadata row still emitted; data columns stay null
                    # (the honest middle between aborting the whole file
                    # and fabricating values)
                    unsupported = str(e)
            elif t == 0x0008:
                layout = self._layout(b)
            elif t == 0x000B:
                nf = b[0 if b[0] > 1 else 1]  # v1: ver, nfilters; v2: ver, nfilters
                ver = b[0]
                nfilters = b[1]
                pos = 8 if ver == 1 else 2
                for _ in range(nfilters):
                    fid, namelen, _fl, ncdv = struct.unpack_from("<HHHH", b, pos)
                    pos += 8 + (namelen + 7) // 8 * 8 if ver == 1 and namelen else 8 + namelen
                    pos += 4 * ncdv
                    if ver == 1 and ncdv % 2:
                        pos += 4
                    filters.append(fid)
        if layout is None and not dims and (dtype is not None or unsupported):
            # committed (named) datatype object — a type, not data
            return {"path": path, "kind": "DATATYPE", "dims": [], "dtype": dtype,
                    "nbytes": 0, "value": None, "unsupported": unsupported}
        value = None
        nbytes = 0
        if dtype is not None and layout is not None:
            raw = self._read_raw(layout, dims, dtype, filters)
            nbytes = len(raw)
            if dtype["class"] == "vlen":
                flat = self.decode_vlen(raw, dtype)
                value = _reshape(flat, dims)
            elif dtype["class"] == "compound":
                value = _decode_compound(raw, dims, dtype)
            else:
                value = _decode_array(raw, dims, dtype)
        return {
            "path": path, "kind": "DATASET", "dims": dims, "dtype": dtype,
            "nbytes": nbytes, "value": value, "unsupported": unsupported,
        }

    def _datatype(self, b: bytes) -> dict:
        cls = b[0] & 0x0F
        ver = b[0] >> 4
        bits0, bits1 = b[1], b[2]
        (size,) = struct.unpack_from("<I", b, 4)
        if cls == 0:  # fixed-point
            return {"class": "int", "size": size,
                    "signed": bool(bits0 & 0x08), "be": bool(bits0 & 0x01)}
        if cls == 1:
            return {"class": "float", "size": size, "be": bool(bits0 & 0x01)}
        if cls == 3:
            return {"class": "string", "size": size}
        if cls == 9:  # variable-length
            kind = bits0 & 0x0F  # 0 = sequence, 1 = string
            base = self._datatype(b[8:])
            return {"class": "vlen", "size": size, "kind": kind, "base": base}
        if cls == 8:  # enum: base datatype, then member names and values
            base = self._datatype(b[8:])
            n = bits0 | (bits1 << 8)
            pos = 8 + 8 + _dtype_prop_len(b[8], base["size"])
            names = []
            for _ in range(n):
                end = b.index(b"\x00", pos)
                names.append(b[pos:end].decode("ascii"))
                pos = (end - 8) // 8 * 8 + 16 if ver in (1, 2) else end + 1
                # v1/2 pad names to 8 bytes relative to the name start
                if ver in (1, 2):
                    pos = 8 + 8 + _dtype_prop_len(b[8], base["size"]) + sum(
                        ((len(x) + 1 + 7) // 8) * 8 for x in names
                    )
            bo = ">" if base.get("be") else "<"
            kind = "i" if base.get("signed") else "u"
            fmt = {1: "b", 2: "h", 4: "i", 8: "q"}[base["size"]]
            fmt = fmt.upper() if kind == "u" else fmt
            vals = struct.unpack_from(bo + fmt * n, b, pos)
            return {"class": "enum", "size": base["size"], "base": base,
                    "names": dict(zip(vals, names))}
        if cls == 6:  # compound
            n = bits0 | (bits1 << 8)
            members = []
            pos = 8
            for _ in range(n):
                if ver in (1, 2):
                    end = b.index(b"\x00", pos)
                    name = b[pos:end].decode("ascii")
                    pos += ((end - pos) // 8 + 1) * 8
                    (moff,) = struct.unpack_from("<I", b, pos)
                    pos += 4
                    if ver == 1:
                        pos += 1 + 3 + 4 + 4 + 16  # dims/perm/reserved block
                else:  # v3: unpadded name, minimal-byte offset
                    end = b.index(b"\x00", pos)
                    name = b[pos:end].decode("ascii")
                    pos = end + 1
                    nbytes = max(1, (max(size - 1, 1).bit_length() + 7) // 8)
                    moff = int.from_bytes(b[pos : pos + nbytes], "little")
                    pos += nbytes
                mtype = self._datatype(b[pos:])
                (msize,) = struct.unpack_from("<I", b, pos + 4)
                # advance past the member datatype message: header (8)
                # + properties — property size varies; classes we allow
                # (int/float/string) carry <= 12 property bytes
                pos += 8 + _dtype_prop_len(b[pos], msize)
                members.append({"name": name, "offset": moff, "type": mtype})
            return {"class": "compound", "size": size, "members": members}
        raise NotImplementedError(f"HDF5 datatype class {cls}")

    def _attribute(self, b: bytes) -> tuple[str, str]:
        """Attribute message (0x000C) v1-v3 -> (name, rendered value).
        Values render as strings (one map value type per column); 1-byte
        enums render true/false (the shape libhdf5 writes booleans in)."""
        ver = b[0]
        flags = b[1] if ver >= 2 else 0
        name_size, dt_size, ds_size = struct.unpack_from("<HHH", b, 2)
        pos = 8 + (1 if ver == 3 else 0)
        name = b[pos : pos + name_size].split(b"\x00", 1)[0].decode("utf-8")
        pad = (lambda n: (n + 7) // 8 * 8) if ver == 1 else (lambda n: n)
        pos += pad(name_size)
        dt_raw = b[pos : pos + dt_size]
        if flags & 1:  # shared datatype: reference to a committed datatype
            (addr,) = struct.unpack_from("<Q", dt_raw, 2)
            (dt_msg,) = (mb for mt, mb in self._messages(addr) if mt == 0x0003)
            dtype = self._datatype(dt_msg)
        else:
            dtype = self._datatype(dt_raw)
        pos += pad(dt_size)
        ds = b[pos : pos + ds_size]
        rank = ds[1]
        off = 8 if ds[0] == 1 else 4
        dims = list(struct.unpack_from(f"<{rank}Q", ds, off)) if rank else []
        pos += pad(ds_size)
        import math

        n = math.prod(dims) if dims else 1
        raw = b[pos : pos + n * dtype["size"]]
        if dtype["class"] == "vlen":
            vals = self.decode_vlen(raw, dtype)
            v = vals if dims else vals[0]
        else:
            v = _decode_array(raw, dims, dtype)
        return name, str(v)

    # ----------------------------------------------------- variable-length
    def decode_vlen(self, raw: bytes, dtype: dict) -> list:
        """Vlen elements are (size u32, global-heap addr u64, index u32)
        references; resolve each through its GCOL collection."""
        out = []
        base = dtype["base"]
        for i in range(0, len(raw), 16):
            n, addr, idx = struct.unpack_from("<IQI", raw, i)
            if addr == 0 or idx == 0:  # null vlen element
                out.append(None)
                continue
            data = self._gheap_object(addr, idx)
            if dtype["kind"] == 1 or base.get("class") == "string":
                out.append(data.split(b"\x00", 1)[0].decode("utf-8", "replace"))
            else:
                out.append(_decode_array(data[: n * base["size"]], [n], base))
        return out

    def _gheap_object(self, addr: int, want_idx: int) -> bytes:
        d = self.d
        if d[addr : addr + 4] != b"GCOL":
            raise ValueError("bad global heap signature")
        (csize,) = struct.unpack_from("<Q", d, addr + 8)
        pos = addr + 16
        end = addr + csize
        while pos + 16 <= end:
            idx, _refs = struct.unpack_from("<HH", d, pos)
            (osize,) = struct.unpack_from("<Q", d, pos + 8)
            if idx == 0:
                break
            if idx == want_idx:
                return d[pos + 16 : pos + 16 + osize]
            pos += 16 + (osize + 7) // 8 * 8
        raise ValueError(f"global heap object {want_idx} not found")

    def _layout(self, b: bytes) -> dict:
        ver = b[0]
        if ver == 3:
            cls = b[1]
            if cls == 0:  # compact
                (sz,) = struct.unpack_from("<H", b, 2)
                return {"kind": "compact", "data": b[4 : 4 + sz]}
            if cls == 1:
                addr, size = struct.unpack_from("<QQ", b, 2)
                return {"kind": "contiguous", "addr": addr, "size": size}
            if cls == 2:
                rank = b[2]
                (btree,) = struct.unpack_from("<Q", b, 3)
                cdims = list(struct.unpack_from(f"<{rank}I", b, 11))
                return {"kind": "chunked", "btree": btree, "chunk": cdims[:-1],
                        "elem": cdims[-1]}
        if ver in (1, 2):
            rank, cls = b[1], b[2]
            pos = 8
            out: dict = {}
            if cls != 0:  # contiguous/chunked carry an address first
                (addr,) = struct.unpack_from("<Q", b, pos)
                pos += 8
                out["addr"] = addr
            dims = list(struct.unpack_from(f"<{rank}I", b, pos))
            pos += 4 * rank
            if cls == 2:
                (elem,) = struct.unpack_from("<I", b, pos)
                pos += 4
                return {"kind": "chunked", "btree": out["addr"],
                        "chunk": dims[:-1] if rank > 1 else dims, "elem": elem}
            if cls == 1:
                import math

                total = math.prod(dims) if dims else 0
                return {"kind": "contiguous", "addr": out["addr"], "size": total}
            (sz,) = struct.unpack_from("<I", b, pos)
            return {"kind": "compact", "data": b[pos + 4 : pos + 4 + sz]}
        raise NotImplementedError(f"HDF5 data layout version {ver}")

    def _read_raw(self, layout: dict, dims: list[int], dtype: dict,
                  filters: list[int]) -> bytes:
        import math

        d = self.d
        total = math.prod(dims) * dtype["size"] if dims else dtype["size"]
        if layout["kind"] == "compact":
            return layout["data"][:total]
        if layout["kind"] == "contiguous":
            addr = layout["addr"]
            if addr in (0xFFFFFFFFFFFFFFFF,):  # unallocated
                return b""
            return d[addr : addr + total]
        # chunked: walk the v1 B-tree (node type 1)
        unsupported = [f for f in filters if f != 1]
        if unsupported:
            raise NotImplementedError(f"HDF5 filters {unsupported} (deflate only)")
        import numpy as np

        rank = len(dims)
        chunk = layout["chunk"]
        esize = dtype["size"]
        buf = np.zeros(math.prod(dims) * esize, dtype=np.uint8)
        arr = buf.reshape([*dims, esize]) if dims else buf

        def visit(addr):
            sig = d[addr : addr + 4]
            if sig != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            _nt, level, nentries = struct.unpack_from("<BBH", d, addr + 4)
            pos = addr + 8 + 16
            key_len = 8 + 8 * (rank + 1)
            for i in range(nentries):
                ksize, _mask = struct.unpack_from("<II", d, pos)
                offs = struct.unpack_from(f"<{rank + 1}Q", d, pos + 8)
                (child,) = struct.unpack_from("<Q", d, pos + key_len)
                pos += key_len + 8
                if level > 0:
                    visit(child)
                    continue
                raw = d[child : child + ksize]
                if 1 in filters:
                    raw = zlib.decompress(raw)
                carr = np.frombuffer(raw, dtype=np.uint8)
                cshape = [*chunk, esize]
                carr = carr[: math.prod(cshape)].reshape(cshape)
                sl = []
                for ax in range(rank):
                    start = offs[ax]
                    stop = min(start + chunk[ax], dims[ax])
                    sl.append(slice(start, stop))
                    cshape[ax] = stop - start
                arr[tuple(sl)] = carr[tuple(slice(0, c) for c in cshape[:-1])]

        visit(layout["btree"])
        return buf.tobytes()


def _dtype_prop_len(cls_byte: int, size: int) -> int:
    """Bytes of properties following a member datatype's 8-byte header
    (classes the compound decoder admits)."""
    cls = cls_byte & 0x0F
    if cls in (0, 1):  # fixed-point: offset+precision; float adds layout
        return 4 if cls == 0 else 12
    if cls == 3:
        return 0
    raise NotImplementedError(f"compound member datatype class {cls}")


def _reshape(flat: list, dims: list[int]):
    if len(dims) <= 1:
        return flat
    step = len(flat) // dims[0] if dims[0] else 0
    return [
        _reshape(flat[i * step : (i + 1) * step], dims[1:]) for i in range(dims[0])
    ]


def _decode_compound(raw: bytes, dims: list[int], dtype: dict) -> dict:
    """Compound dataset -> {member name: flat list} (numpy structured
    view over the packed records)."""
    import math

    import numpy as np

    names, formats, offsets = [], [], []
    for m in dtype["members"]:
        t = m["type"]
        bo = ">" if t.get("be") else "<"
        if t["class"] == "int":
            f = f"{bo}{'i' if t['signed'] else 'u'}{t['size']}"
        elif t["class"] == "float":
            f = f"{bo}f{t['size']}"
        else:
            f = f"S{t['size']}"
        names.append(m["name"])
        formats.append(f)
        offsets.append(m["offset"])
    nd = np.dtype({"names": names, "formats": formats, "offsets": offsets,
                   "itemsize": dtype["size"]})
    n = math.prod(dims) if dims else 1
    arr = np.frombuffer(raw[: n * dtype["size"]], dtype=nd)
    out = {}
    for m, f in zip(names, formats):
        col = arr[m]
        if f.startswith("S"):
            out[m] = [v.split(b"\x00", 1)[0].decode("utf-8", "replace") for v in col]
        else:
            out[m] = col.tolist()
    return out


def _decode_array(raw: bytes, dims: list[int], dtype: dict):
    import numpy as np

    if dtype["class"] == "enum":
        base_vals = _decode_array(raw, dims, dtype["base"])
        names = dtype["names"]

        def rename(v):
            if isinstance(v, list):
                return [rename(x) for x in v]
            n = names.get(v, str(v))
            return {"TRUE": "true", "FALSE": "false"}.get(n, n)

        return rename(base_vals)
    bo = ">" if dtype.get("be") else "<"
    if dtype["class"] == "string":
        n = dtype["size"]
        vals = [
            raw[i : i + n].split(b"\x00", 1)[0].decode("utf-8", "replace")
            for i in range(0, len(raw), n)
        ]
        a = np.array(vals, dtype=object)
    else:
        kind = ("i" if dtype["signed"] else "u") if dtype["class"] == "int" else "f"
        a = np.frombuffer(raw, dtype=f"{bo}{kind}{dtype['size']}")
    if dims:
        import math

        a = a[: math.prod(dims)].reshape(dims)
    if dims:
        return a.tolist()
    if not len(a):
        return None
    v = a[0]
    return v.item() if hasattr(v, "item") else v


def scan_hdf5(data: bytes) -> list[dict]:
    return _H5(data).objects


HDF5_SCHEMA = (
    "path string, data_type string, file_name string, data_size bigint, "
    "element_count bigint, dataset_data_type string, dimensions string, "
    "int_data array<array<bigint>>, float_data array<array<double>>, "
    "string_data array<string>, attributes map<string,string>, is_link boolean"
)


def _rows_for_file(fpath: str) -> list[dict]:
    import math

    with open(fpath, "rb") as f:
        objs = scan_hdf5(f.read())
    rows = []
    for o in objs:
        row = {
            "path": o["path"], "data_type": o["kind"],
            "file_name": os.path.basename(fpath),
            "data_size": None, "element_count": None,
            "dataset_data_type": None, "dimensions": None,
            "int_data": None, "float_data": None, "string_data": None,
            "attributes": o.get("attrs") or None,
            "is_link": o["kind"] == "LINK",
        }
        if o["kind"] == "DATASET":
            dims = o["dims"]
            dt = o["dtype"] or {}
            row["data_size"] = o["nbytes"]
            row["element_count"] = math.prod(dims) if dims else 1
            row["dataset_data_type"] = {
                "int": "int" if dt.get("size", 8) <= 4 else "long",
                "float": "float" if dt.get("size", 8) <= 4 else "double",
                "string": "string", "vlen": "string",
                "compound": "compound",
            }.get(dt.get("class"))
            row["dimensions"] = "[" + ", ".join(str(x) for x in dims) + "]"
            v = o["value"]
            # deepest-2 nesting; 1-D arrives as one inner list (see
            # module docstring on the static-schema deviation)
            nested = (
                v if dims and len(dims) > 1
                else ([v] if dims else ([[v]] if v is not None else None))
            )
            if dt.get("class") == "int" and nested is not None:
                while nested and isinstance(nested[0][0], list):
                    nested = [sum(r, []) for r in nested]
                row["int_data"] = [
                    [None if x is None else int(x) for x in r] for r in nested
                ]
            elif dt.get("class") == "float" and nested is not None:
                while nested and isinstance(nested[0][0], list):
                    nested = [sum(r, []) for r in nested]
                row["float_data"] = [
                    [None if x is None else float(x) for x in r] for r in nested
                ]
            elif dt.get("class") in ("string", "vlen") and v is not None:
                row["string_data"] = v if dims else [v]
        rows.append(row)
    return rows


def write_h5_simple(datasets: dict[str, list], path: str) -> None:
    """Minimal classic-layout HDF5 writer for tests/fixtures: a root
    group of 1-D contiguous datasets (int64 or float64), written to the
    same public layout the reader decodes. (The reference plugin is
    read-only; this exists so the oracle query can build inputs.)"""
    UNDEF = 0xFFFFFFFFFFFFFFFF
    names = list(datasets)

    def objhdr_dataset(vals: list, data_addr: int) -> bytes:
        is_f = any(isinstance(v, float) for v in vals)
        n = len(vals)
        ds = struct.pack("<BB6x", 1, 1) + struct.pack("<Q", n)  # dataspace v1
        if is_f:  # IEEE f8 LE: class 1, LE, size 8; props per spec
            dt = struct.pack("<BBBBI", 0x11, 0x20, 0x3F, 0x00, 8)
            dt += struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:  # fixed-point i8 LE signed
            dt = struct.pack("<BBBBI", 0x10, 0x08, 0x00, 0x00, 8)
            dt += struct.pack("<HH", 0, 64)
        dt += b"\x00" * ((-len(dt)) % 8)
        lay = struct.pack("<BBQQ", 3, 1, data_addr, 8 * n)
        lay += b"\x00" * ((-len(lay)) % 8)

        def msg(t, body):
            return struct.pack("<HHB3x", t, len(body), 0) + body

        msgs = msg(0x0001, ds) + msg(0x0003, dt) + msg(0x0008, lay)
        return struct.pack("<BBHII4x", 1, 0, 3, 1, len(msgs)) + msgs

    # layout: superblock(96) | heap hdr(32)+data | TREE | SNOD | per-ds
    # object headers | data blocks
    heap_data = bytearray(b"\x00")  # offset 0 = empty name (root entry)
    name_offs = []
    for nm in names:
        name_offs.append(len(heap_data))
        heap_data += nm.encode() + b"\x00"
    heap_data += b"\x00" * ((-len(heap_data)) % 8)

    pos = 96
    root_hdr = pos
    pos += 16 + 24  # v1 header (12+4 pad) + symbol-table msg (8 hdr + 16 body)
    heap_addr = pos
    heap_data_addr = heap_addr + 32
    pos = heap_data_addr + len(heap_data)
    btree_addr = pos
    pos += 48  # hdr(8) + siblings(16) + key0(8) + child(8) + key1(8): one SNOD
    snod_addr = pos
    pos += 8 + 40 * len(names)
    ds_hdrs = []
    for nm in names:
        ds_hdrs.append(pos)
        pos += len(objhdr_dataset(datasets[nm], 0))
    data_addrs = []
    for nm in names:
        data_addrs.append(pos)
        pos += 8 * len(datasets[nm])
    eof = pos

    out = bytearray()
    out += SIGNATURE
    out += struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
    out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    out += struct.pack("<QQII16x", 0, root_hdr, 0, 0)  # root symbol entry
    assert len(out) == 96
    st_msg = struct.pack("<HHB3x", 0x0011, 16, 0) + struct.pack("<QQ", btree_addr, heap_addr)
    out += struct.pack("<BBHII4x", 1, 0, 1, 1, len(st_msg)) + st_msg
    out += b"HEAP" + struct.pack("<B3x", 0)
    out += struct.pack("<QQQ", len(heap_data), len(heap_data), heap_data_addr)
    out += heap_data
    out += b"TREE" + struct.pack("<BBH", 0, 0, 1) + struct.pack("<QQ", UNDEF, UNDEF)
    out += struct.pack("<QQQ", 0, snod_addr, 0)  # key0, child, key1
    assert len(out) == snod_addr
    out += b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for i, nm in enumerate(names):
        out += struct.pack("<QQII16x", name_offs[i], ds_hdrs[i], 0, 0)
    for i, nm in enumerate(names):
        out += objhdr_dataset(datasets[nm], data_addrs[i])
    for nm in names:
        vals = datasets[nm]
        is_f = any(isinstance(v, float) for v in vals)
        fmt = "<d" if is_f else "<q"
        for v in vals:
            out += struct.pack(fmt, float(v) if is_f else int(v))
    assert len(out) == eof
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_hdf5(spark: SparkSession, path: str,
              options: dict | None = None) -> DataFrame:
    """Distributed HDF5 read. Default: the metadata/data listing (one
    row per object, HDF5BatchReader surface). ``defaultPath`` option:
    project one dataset — 2-D as ``<type>_col_N`` columns (reference
    shape), 1-D as a single ``value`` column."""
    import pandas as pd

    opts = options or {}
    default_path = opts.get("defaultPath", opts.get("default_path"))

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.h5"), recursive=True)
            + _glob.glob(os.path.join(path, "**", "*.hdf5"), recursive=True)
        )
    elif any(c in path for c in "*?["):
        files = sorted(_glob.glob(path))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no hdf5 files at {path}")

    if default_path:
        with open(files[0], "rb") as f:
            objs = scan_hdf5(f.read())
        target = next((o for o in objs if o["path"] == default_path), None)
        if target is None or target["kind"] != "DATASET":
            raise ValueError(f"defaultPath {default_path!r} is not a dataset")
        dt = target["dtype"]
        dims = target["dims"]

        def _sql_t(t: dict) -> str:
            return {"int": "bigint" if t["size"] > 4 else "int",
                    "float": "double" if t["size"] > 4 else "float",
                    "string": "string", "vlen": "string"}[t["class"]]

        if dt["class"] == "compound":
            # reference shape: one column per member, names sanitized
            members = [m["name"] for m in dt["members"]]
            cols = [m.replace(" ", "_") for m in members]
            schema = ", ".join(
                f"`{c}` {_sql_t(m['type'])}"
                for c, m in zip(cols, dt["members"])
            )

            def project(batches):
                for pdf in batches:
                    for fpath in pdf["path"]:
                        with open(fpath, "rb") as f:
                            obj = next(
                                o for o in scan_hdf5(f.read())
                                if o["path"] == default_path
                            )
                        v = obj["value"]
                        recs = list(zip(*(v[m] for m in members)))
                        yield pd.DataFrame.from_records(recs, columns=cols)
        else:
            spark_t = _sql_t(dt)
            prefix = {"int": "int" if dt["size"] <= 4 else "long",
                      "float": "float" if dt["size"] <= 4 else "double",
                      "string": "string", "vlen": "string"}[dt["class"]]
            if len(dims) > 2:
                raise NotImplementedError("defaultPath projection supports 1-D/2-D")
            if len(dims) == 2:
                cols = [f"{prefix}_col_{i}" for i in range(dims[1])]
            else:
                # 1-D / scalar: one column named after the dataset
                cols = [default_path.rsplit("/", 1)[-1]]
            schema = ", ".join(f"`{c}` {spark_t}" for c in cols)

            def project(batches):
                for pdf in batches:
                    for fpath in pdf["path"]:
                        with open(fpath, "rb") as f:
                            obj = next(
                                o for o in scan_hdf5(f.read())
                                if o["path"] == default_path
                            )
                        v = obj["value"]
                        if not dims:
                            v = [v]
                        recs = v if len(dims) == 2 else [[x] for x in v]
                        yield pd.DataFrame.from_records(recs, columns=cols)

        src = spark.createDataFrame([(f,) for f in files], "path string")
        return src.repartition(
            min(len(files), spark.sparkContext.defaultParallelism)
        ).mapInPandas(project, schema)

    meta_cols = [
        "path", "data_type", "file_name", "data_size", "element_count",
        "dataset_data_type", "dimensions", "int_data", "float_data",
        "string_data", "attributes", "is_link",
    ]

    def listing(batches):
        for pdf in batches:
            for fpath in pdf["path"]:
                yield pd.DataFrame.from_records(
                    _rows_for_file(fpath), columns=meta_cols
                )

    src = spark.createDataFrame([(f,) for f in files], "path string")
    return src.repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    ).mapInPandas(listing, HDF5_SCHEMA)
