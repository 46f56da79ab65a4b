"""Arrow-batched pandas-UDF converters for OTTL functions whose
semantics genuinely can't be expressed in Catalyst expressions:

  * ``FNV`` — FNV-1a 64-bit (hash/fnv New64a, func_fnv.go:32-46) needs
    wrap-around uint64 multiplication; Spark 4's ANSI mode makes int64
    overflow an error, so the hot loop runs in numpy uint64 (which wraps
    by definition), vectorized across the batch per byte position.
  * ``Murmur3Hash`` / ``Murmur3Hash128`` — exact-parity murmur3 Sum32 /
    x64-128 (func_murmur3_hash.go:35-47, func_murmur3_hash128.go:35-48).
    Like FNV, the block loops run numpy uint32/uint64 ops across the
    whole padded batch matrix at once (zero padding makes each tail int
    equal to its padded block — no per-tail-length cases). Exact-parity
    hashing still can't be a JVM built-in; document-ID hashing at scale
    should prefer xxhash64/md5/sha2 when byte parity isn't required.
  * ``ParseXML`` / ``ParseSimplifiedXML`` — recursive documents with
    data-dependent shape (func_parse_xml.go:63-130,
    func_parse_simplified_xml.go:50-140). The reference returns a nested
    pcommon.Map; the columnar analog here is a JSON string with the SAME
    nested structure (chain ``from_json`` with a known schema to get
    typed columns). stdlib ElementTree (C-accelerated) per batch.

Everything here transfers via Arrow batches — no row-at-a-time Python
UDFs; these run only where the user's statement calls them.
"""

from __future__ import annotations

import functools
import json
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "fnv64a_udf",
    "murmur3_128_udf",
    "parse_xml_udf",
    "parse_simplified_xml_udf",
    "mmh3_x64_128",
    "mmh3_x86_32",
    "murmur3_32_udf",
    "get_xml_udf",
    "insert_xml_udf",
    "remove_xml_udf",
    "convert_attributes_to_elements_xml_udf",
    "convert_text_to_elements_xml_udf",
]

_MASK64 = (1 << 64) - 1


def _fnv64a_batch(bts: list[bytes]) -> np.ndarray:
    """FNV-1a 64 over UTF-8 bytes, batch-vectorized: strings are padded
    into a (rows, maxlen) uint8 matrix; the per-byte-position loop runs
    numpy ops across ALL rows at once (maxlen iterations total)."""
    n = len(bts)
    h = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    maxlen = max((len(b) for b in bts), default=0)
    if maxlen:
        arr = np.zeros((n, maxlen), dtype=np.uint8)
        lens = np.fromiter((len(b) for b in bts), dtype=np.int64, count=n)
        for i, b in enumerate(bts):
            arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                active = lens > j
                h[active] = (h[active] ^ arr[active, j].astype(np.uint64)) * prime
    return h


@pandas_udf(T.LongType())
def fnv64a_udf(s: pd.Series) -> pd.Series:
    vals = s.fillna("")
    bts = [v.encode("utf-8") for v in vals]
    h = _chunked_by_length(bts, _fnv64a_batch, 1)
    out = pd.Series(h.view(np.int64), index=s.index, dtype="Int64")
    out[s.isna()] = pd.NA
    return out


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def mmh3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """Standard MurmurHash3 x64 128 (Austin Appleby's public-domain
    algorithm, as wrapped by spaolacci/murmur3 in the reference)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    length = len(key)
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(key[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(key[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = key[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


#: cap on one padded matrix (bytes). The matrix costs rows × longest
#: string, so a single 1 MB outlier in a 64k-row Arrow batch would
#: otherwise allocate ~65 GB; chunking by length keeps each matrix
#: dense AND bounded.
_PAD_MATRIX_BUDGET = 64 << 20


def _pad_matrix(bts: list[bytes], block: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack byte strings into a zero-padded (rows, width) uint8 matrix,
    width a multiple of ``block``. Zero padding makes each string's tail
    int equal to its padded block value — no per-tail-length cases."""
    n = len(bts)
    lens = np.fromiter((len(b) for b in bts), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    width = max(((maxlen + block - 1) // block) * block, block)
    arr = np.zeros((n, width), dtype=np.uint8)
    for i, b in enumerate(bts):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return arr, lens


def _chunked_by_length(bts: list[bytes], kernel, out_arrays: int):
    """Run a padded-matrix kernel over length-sorted chunks so each
    chunk's matrix stays under ``_PAD_MATRIX_BUDGET`` — total work stays
    O(total bytes)-ish instead of O(rows × longest outlier). Results are
    scattered back to input order."""
    n = len(bts)
    order = sorted(range(n), key=lambda i: len(bts[i]))
    outs = [np.zeros(n, dtype=np.uint64) for _ in range(out_arrays)]
    start = 0
    while start < n:
        end = start + 1
        # grow the chunk while rows*width fits the budget (width is set
        # by the chunk's LAST = longest row, thanks to the sort)
        while end < n:
            width = max(len(bts[order[end]]), 1)
            if (end - start + 1) * width > _PAD_MATRIX_BUDGET:
                break
            end += 1
        idx = order[start:end]
        res = kernel([bts[i] for i in idx])
        if out_arrays == 1:
            res = (res,)
        for o, r in zip(outs, res):
            o[idx] = r
        start = end
    return outs[0] if out_arrays == 1 else tuple(outs)


def _rotl32v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _rotl64v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64v(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> np.uint64(33))


def _mmh3_128_batch(bts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """mmh3_x64_128 across the whole batch: per-16-byte-block loop runs
    numpy uint64 ops over ALL rows at once (same padded-matrix shape as
    fnv64a_udf — ceil(maxlen/16) iterations total, wraparound free)."""
    n = len(bts)
    arr, lens = _pad_matrix(bts, 16)
    u64 = arr.view("<u8")
    c1 = np.uint64(0x87C37B91114253D5)
    c2 = np.uint64(0x4CF5AD432745937F)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = lens // 16
    with np.errstate(over="ignore"):
        for j in range(u64.shape[1] // 2):
            active = nblocks > j
            if not active.any():
                break
            k1 = _rotl64v(u64[active, 2 * j] * c1, 31) * c2
            a1 = h1[active] ^ k1
            a1 = (_rotl64v(a1, 27) + h2[active]) * np.uint64(5) + np.uint64(
                0x52DCE729
            )
            k2 = _rotl64v(u64[active, 2 * j + 1] * c2, 33) * c1
            a2 = h2[active] ^ k2
            a2 = (_rotl64v(a2, 31) + a1) * np.uint64(5) + np.uint64(0x38495AB5)
            h1[active] = a1
            h2[active] = a2
        tail_len = lens - nblocks * 16
        rows = np.arange(n)
        # zero padding ⇒ the padded blocks at index nblocks ARE the tail
        # ints; clamp keeps full-width rows in bounds (masked out anyway)
        i1 = np.minimum(2 * nblocks, u64.shape[1] - 2)
        t1 = u64[rows, i1]
        t2 = u64[rows, i1 + 1]
        k2 = _rotl64v(t2 * c2, 33) * c1
        h2 = np.where(tail_len > 8, h2 ^ k2, h2)
        k1 = _rotl64v(t1 * c1, 31) * c2
        h1 = np.where(tail_len > 0, h1 ^ k1, h1)
        ul = lens.astype(np.uint64)
        h1 ^= ul
        h2 ^= ul
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64v(h1)
        h2 = _fmix64v(h2)
        h1 = h1 + h2
        h2 = h2 + h1
    return h1, h2


@pandas_udf(T.StringType())
def murmur3_128_udf(s: pd.Series) -> pd.Series:
    """Murmur3Hash128 (func_murmur3_hash128.go:35-48): hex of
    little-endian h1||h2; hash math batch-vectorized in numpy."""
    vals = s.fillna("")
    bts = [v.encode("utf-8") for v in vals]
    h1, h2 = _chunked_by_length(bts, _mmh3_128_batch, 2)
    b1 = h1.astype("<u8").tobytes()
    b2 = h2.astype("<u8").tobytes()
    out = pd.Series(
        [b1[8 * i : 8 * i + 8].hex() + b2[8 * i : 8 * i + 8].hex()
         for i in range(len(bts))],
        index=s.index,
        dtype="object",
    )
    out[s.isna()] = None
    return out


# ---------------------------------------------------------------------------
# XML
# ---------------------------------------------------------------------------

def _strip_ns(tag: str) -> str:
    # ElementTree encodes namespaces as {uri}local; the reference keeps
    # Name.Local only
    return tag.rsplit("}", 1)[-1]


def _xml_into_dict(el: ET.Element) -> dict:
    """func_parse_xml.go intoMap: {tag, content?, attributes?, children?}."""
    out: dict = {"tag": _strip_ns(el.tag)}
    text = (el.text or "").strip()
    for child in el:
        text += (child.tail or "").strip()
    if text:
        out["content"] = text
    if el.attrib:
        out["attributes"] = {_strip_ns(k): v for k, v in el.attrib.items()}
    children = [_xml_into_dict(c) for c in el]
    if children:
        out["children"] = children
    return out


@pandas_udf(T.StringType())
def parse_xml_udf(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        try:
            root = ET.fromstring(v)
        except ET.ParseError:
            return None  # on_error: null flows on (no exceptions mid-job)
        return json.dumps(_xml_into_dict(root), separators=(",", ":"), sort_keys=True)

    return s.map(one)


def _simplified(el: ET.Element) -> dict:
    """func_parse_simplified_xml.go parseElement: element text only,
    repeated tags become lists, attributes/extraneous text dropped."""
    counts: dict[str, int] = {}
    for c in el:
        counts[_strip_ns(c.tag)] = counts.get(_strip_ns(c.tag), 0) + 1
    out: dict = {}
    for c in el:
        tag = _strip_ns(c.tag)
        has_el_children = len(c) > 0
        leaf = "" if has_el_children else (c.text or "").strip()
        if counts[tag] > 1:
            arr = out.setdefault(tag, [])
            if leaf:
                arr.append(leaf)
            else:
                sub = _simplified(c)
                if sub:
                    arr.append(sub)
        elif leaf:
            out[tag] = leaf
        else:
            sub = _simplified(c)
            if sub:
                out[tag] = sub
    return out


@pandas_udf(T.StringType())
def parse_simplified_xml_udf(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        try:
            root = ET.fromstring(v)
        except ET.ParseError:
            return None
        # the reference parses the document node: the root element is a
        # child of the document, so the result is {root_tag: {...}}
        wrapper = {"__doc__": None}
        has_children = len(root) > 0
        leaf = "" if has_children else (root.text or "").strip()
        tag = _strip_ns(root.tag)
        if leaf:
            wrapper = {tag: leaf}
        else:
            sub = _simplified(root)
            wrapper = {tag: sub} if sub else {}
        return json.dumps(wrapper, separators=(",", ":"), sort_keys=True)

    return s.map(one)


# ---------------------------------------------------------------------------
# XML editors (GetXML / InsertXML / RemoveXML / ConvertAttributesToElementsXML
# / ConvertTextToElementsXML — func_get_xml.go:38-75, func_insert_xml.go:42-81,
# func_remove_xml.go:42-75, func_convert_*_xml.go). xmlquery's full XPath is
# replaced by ElementTree's XPath subset (tag paths, //, *, [@attr], [tag],
# position), plus an explicit `/@name` or `/@*` attribute-selection suffix.
# Inputs may be FRAGMENTS (multiple roots), as in the reference's
# parseNodesXML; serialization uses ElementTree's canonical form (self-
# closing `<b />` where the reference writes `<b></b>` — documented
# serializer variance, not a structural one).
# ---------------------------------------------------------------------------

_WRAP = "__w__"


def _wrap_fragment(s: str) -> ET.Element:
    return ET.fromstring(f"<{_WRAP}>{s}</{_WRAP}>")


def _unwrap(w: ET.Element) -> str:
    out = ET.tostring(w, encoding="unicode")
    head, tail = f"<{_WRAP}>", f"</{_WRAP}>"
    if out.startswith(head):
        return out[len(head) : -len(tail)]
    return ""  # "<__w__ />": empty document


def _split_attr_path(xpath: str) -> tuple[str, str | None]:
    """'.//a/@id' -> ('.//a', 'id'); '//@*' -> ('.//*' incl. root, '*')."""
    if "/@" in xpath:
        elem, attr = xpath.rsplit("/@", 1)
        return (elem or "."), attr
    return xpath, None


def _et_path(p: str) -> str:
    # absolute reference paths are relative to the synthetic wrapper root
    if p.startswith("//"):
        return "." + p
    if p.startswith("/"):
        return "." + p
    return p


def _find(w: ET.Element, elem_path: str) -> list[ET.Element]:
    p = _et_path(elem_path)
    if p in (".", "./"):
        return [w]
    return w.findall(p)


@functools.lru_cache(maxsize=256)
def get_xml_udf(xpath: str):
    elem_path, attr = _split_attr_path(xpath)

    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if v == "":
                return ""
            try:
                w = _wrap_fragment(v)
            except ET.ParseError:
                return None
            parts = []
            for el in _find(w, elem_path):
                if el is w:
                    continue
                if attr is None:
                    parts.append(ET.tostring(el, encoding="unicode"))
                elif attr == "*":
                    parts.extend(el.attrib.values())
                elif attr in el.attrib:
                    parts.append(el.attrib[attr])
            return "".join(parts)

        return s.map(one)

    return run


@functools.lru_cache(maxsize=256)
def insert_xml_udf(xpath: str):
    elem_path, attr = _split_attr_path(xpath)
    if attr is not None:
        raise ValueError("InsertXML XPath must select elements, not attributes")

    @pandas_udf(T.StringType())
    def run(s: pd.Series, sub: pd.Series) -> pd.Series:
        def one(v, subdoc):
            if v is None or subdoc is None:
                return None
            try:
                w = _wrap_fragment(v)
                sw = _wrap_fragment(subdoc)
            except ET.ParseError:
                return None
            children = list(sw)
            for el in _find(w, elem_path):
                for c in children:
                    el.append(c)
            return _unwrap(w)

        return pd.Series([one(v, sv) for v, sv in zip(s, sub)], index=s.index)

    return run


@functools.lru_cache(maxsize=256)
def remove_xml_udf(xpath: str):
    elem_path, attr = _split_attr_path(xpath)

    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if v == "":
                return ""
            try:
                w = _wrap_fragment(v)
            except ET.ParseError:
                return None
            matched = _find(w, elem_path)
            if attr is not None:
                for el in matched:
                    if attr == "*":
                        el.attrib.clear()
                    else:
                        el.attrib.pop(attr, None)
            else:
                parents = {c: p for p in w.iter() for c in p}
                for el in matched:
                    if el is not w and el in parents:
                        parents[el].remove(el)
            return _unwrap(w)

        return s.map(one)

    return run


@functools.lru_cache(maxsize=256)
def convert_attributes_to_elements_xml_udf(xpath: str = "//@*"):
    elem_path, attr = _split_attr_path(xpath)

    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                w = _wrap_fragment(v)
            except ET.ParseError:
                return None
            targets = (
                list(w.iter())
                if elem_path in (".", "/", "./", "//")
                else _find(w, elem_path)
            )
            for el in targets:
                if el is w:
                    continue
                names = (
                    list(el.attrib) if attr in (None, "*") else
                    ([attr] if attr in el.attrib else [])
                )
                for name in names:
                    child = ET.SubElement(el, name)
                    child.text = el.attrib[name]
                    del el.attrib[name]
            return _unwrap(w)

        return s.map(one)

    return run


def _wrap_text_nodes(el: ET.Element, element_name: str) -> None:
    """convertTextToElementsForNode: when an element mixes text with
    child elements (or holds several text runs), each text run is wrapped
    in a dedicated <element_name> element."""
    children = list(el)
    for c in children:
        _wrap_text_nodes(c, element_name)
    value_count = int(bool(el.text and el.text.strip())) + sum(
        1 for c in children if c.tail and c.tail.strip()
    )
    if value_count == 0 or len(children) + value_count <= 1:
        return
    if el.text and el.text.strip():
        v = ET.Element(element_name)
        v.text = el.text.strip()
        el.insert(0, v)
        el.text = None
    for c in list(el):
        if c.tail and c.tail.strip():
            v = ET.Element(element_name)
            v.text = c.tail.strip()
            c.tail = None
            idx = list(el).index(c)
            el.insert(idx + 1, v)

    return


@functools.lru_cache(maxsize=256)
def convert_text_to_elements_xml_udf(xpath: str = "/", element_name: str = "value"):
    elem_path, attr = _split_attr_path(xpath)
    if attr is not None:
        raise ValueError("ConvertTextToElementsXML XPath must select elements")

    @pandas_udf(T.StringType())
    def run(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                w = _wrap_fragment(v)
            except ET.ParseError:
                return None
            roots = [w] if elem_path in (".", "/", "./") else _find(w, elem_path)
            for el in roots:
                _wrap_text_nodes(el, element_name)
            return _unwrap(w)

        return s.map(one)

    return run


def mmh3_x86_32(key: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Appleby's public-domain algorithm; the
    reference's murmur3.Sum32)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    m32 = 0xFFFFFFFF
    h = seed
    nblocks = len(key) // 4
    for i in range(nblocks):
        k = int.from_bytes(key[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & m32
        k = ((k << 15) | (k >> 17)) & m32
        k = (k * c2) & m32
        h ^= k
        h = ((h << 13) | (h >> 19)) & m32
        h = (h * 5 + 0xE6546B64) & m32
    tail = key[nblocks * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & m32
        k = ((k << 15) | (k >> 17)) & m32
        k = (k * c2) & m32
        h ^= k
    h ^= len(key)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m32
    h ^= h >> 16
    return h


def _mmh3_32_batch(bts: list[bytes], seed: int = 0) -> np.ndarray:
    """mmh3_x86_32 across the whole batch: per-4-byte-block loop runs
    numpy uint32 ops over ALL rows at once (ceil(maxlen/4) iterations)."""
    n = len(bts)
    arr, lens = _pad_matrix(bts, 4)
    u32 = arr.view("<u4")
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h = np.full(n, np.uint32(seed), dtype=np.uint32)
    nblocks = lens // 4
    with np.errstate(over="ignore"):
        for j in range(u32.shape[1]):
            active = nblocks > j
            if not active.any():
                break
            k = _rotl32v(u32[active, j] * c1, 15) * c2
            hh = h[active] ^ k
            hh = _rotl32v(hh, 13) * np.uint32(5) + np.uint32(0xE6546B64)
            h[active] = hh
        tail_len = lens - nblocks * 4
        rows = np.arange(n)
        idx = np.minimum(nblocks, u32.shape[1] - 1)
        k = _rotl32v(u32[rows, idx] * c1, 15) * c2
        h = np.where(tail_len > 0, h ^ k, h)
        h ^= lens.astype(np.uint32)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


@pandas_udf(T.StringType())
def murmur3_32_udf(s: pd.Series) -> pd.Series:
    """Murmur3Hash (func_murmur3_hash.go:35-47): hex of the LITTLE-ENDIAN
    bytes of murmur3 Sum32 over the UTF-8 input; hash math
    batch-vectorized in numpy."""
    vals = s.fillna("")
    bts = [v.encode("utf-8") for v in vals]
    h = _chunked_by_length(bts, _mmh3_32_batch, 1)
    hb = h.astype("<u4").tobytes()
    out = pd.Series(
        [hb[4 * i : 4 * i + 4].hex() for i in range(len(bts))],
        index=s.index,
        dtype="object",
    )
    out[s.isna()] = None
    return out
