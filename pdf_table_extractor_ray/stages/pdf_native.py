"""Native binary-PDF word-box parser (the real ``pdf_bytes → word
boxes`` seam).

The reference feeds real PDFs through pdfplumber ``extract_words``
(conversor_banestes.py:23-43) / camelot lattice (conversor_itau.py:99)
and consumes positioned words. The engine's other layout strategies
parse markup *analogs* of those layouts; this module closes the gap
with an actual byte-level PDF reader built on the stdlib only (no
pdfplumber/pikepdf in this container):

- object scanner with exact ``/Length``-based stream skipping (a
  naive ``endobj`` regex would tear FlateDecode streams that happen
  to contain the token),
- filter chains (``/Filter [/ASCII85Decode /FlateDecode]`` etc.):
  FlateDecode, ASCIIHexDecode, ASCII85Decode, RunLengthDecode applied
  in declared order; unknown raster codecs pass through opaque,
- inline-image (``BI … ID <binary> EI``) stripping before text
  interpretation, so raster payload bytes can't surface phantom text,
- page tree walk (``/Root → /Pages → /Kids`` order),
- content-stream text interpreter (``BT/ET Tm Td TD TL T* Tj ' " TJ``
  with literal/hex string decoding) tracking the text matrix, so each
  show op yields one word box ``(x0, top, text)`` in pdfplumber's
  top-left coordinate convention (``top = page_height − y``).

PDF 1.5 support (round 4): cross-reference STREAMS (``/Type /XRef``
with ``/W`` field widths, ``/Index`` subsections, ``/Prev`` chains and
PNG row predictors 10–15) are parsed into an object locator, and
object STREAMS (``/Type /ObjStm``) are unpacked so catalogs/page trees
packed inside them resolve — the two shapes that distinguish modern
bank PDFs from classic 1.4 files. The byte-walking scanner remains the
fallback when the xref chain is damaged or absent.

CID fonts (round 4): a page font carrying ``/ToUnicode`` gets its CMap
stream parsed (``bfchar`` singletons + scalar ``bfrange`` runs) and HEX
show strings decode as 2-byte CIDs through it — the composite-font
shape whose text is unreadable without the CMap.

Font metrics (round 4): Helvetica AFM glyph widths drive intra-``TJ``
advance — a whole LINE shown as one ``TJ`` array (strings + kerning
numbers) recovers one word box per string at its metric x position,
closing the two formerly-declared gaps (glyph advance, TJ kerning).

Declared limitations (documented, not hidden): metric advance applies
within ``TJ`` arrays under a known ``Tf`` size (independent ``Tj`` ops
still need their own ``Tm``/``Td`` positioning); widths are the core-14
Helvetica table whatever the declared font (the fixture writer uses the
same table, so round-trips are exact; foreign fonts get approximate
intra-line x); literal strings decode as Latin-1/PDFDoc (CID text must
be hex-written, as CID producers do). All three /ToUnicode shapes
parse (bfchar, scalar bfrange runs, array-form bfrange destinations);
CIDs a CMap leaves unmapped surface as U+FFFD, never misread.

The extraction strategy reuses the exact y-cluster + x-threshold
column logic of ``layout.extract_coordinate_columns`` — a PDF doc and
its word-box-markup twin produce byte-identical ``ExtractResult``s.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

from pdf_table_extractor_ray.stages.result import ExtractResult

Word = Tuple[float, float, str]  # (x0, top, text)

DEFAULT_PAGE_SIZE = (612.0, 842.0)

# ---------------------------------------------------------------------------
# writer (deterministic; used by the fixture generator and tests)

_LIT_ESCAPE = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)",
               10: "\\n", 13: "\\r", 9: "\\t"}


def _lit_string(text: str) -> str:
    raw = text.encode("latin-1", errors="replace").decode("latin-1")
    return "(" + raw.translate(_LIT_ESCAPE) + ")"


def _page_content(
    words: List[Word], h: float, positioning: str, cid_map: Optional[Dict[str, int]] = None
) -> bytes:
    """One page's content-stream body. ``positioning="tm"`` emits one
    absolutely-positioned ``Tm … Tj`` per word (print-pipeline shape);
    ``"td"`` emits relative ``Td`` advances that accumulate through the
    line matrix (multi-op-line shape — the other common way real bank
    PDFs position words). Deltas are taken between the ROUNDED
    coordinates, so the accumulated position is exact to the 2-decimal
    grid the absolute writer uses. With ``cid_map`` (CID-keyed font),
    show strings are 2-byte-CID HEX strings instead of literals — the
    composite-font shape whose text is unreadable without the font's
    /ToUnicode CMap."""

    def show(text: str) -> str:
        if cid_map is None:
            return _lit_string(text)
        return "<" + "".join(f"{cid_map[c]:04X}" for c in text) + ">"

    parts = ["BT", "/F1 10 Tf"]
    if positioning == "td":
        px = py = 0.0
        for x0, top, text in words:
            xr, yr = round(x0, 2), round(h - top, 2)
            parts.append(f"{xr - px:.2f} {yr - py:.2f} Td {show(text)} Tj")
            px, py = xr, yr
    elif positioning == "line":
        # one TJ array per LINE (words sharing a top): first word at the
        # line's Tm, later words positioned by metric glyph advance plus
        # a kerning number n = (x_after − x_next)·1000/size — the shape
        # print pipelines emit when they show whole lines, readable only
        # with font metrics (TJ numbers shift x by −n/1000·size)
        size = 10.0
        lines: Dict[float, List[Word]] = {}
        for x0, top, text in words:
            lines.setdefault(top, []).append((x0, top, text))
        for top in sorted(lines):
            ws = sorted(lines[top], key=lambda w: w[0])
            x0 = ws[0][0]
            arr: List[str] = []
            x = x0
            for j, (wx, _t, text) in enumerate(ws):
                if j > 0:
                    gap_n = (x - wx) * 1000.0 / size
                    arr.append(f"{gap_n:.4f}")
                    x -= gap_n / 1000.0 * size
                arr.append(show(text))
                x += _text_width(text, size)
            parts.append(
                f"1 0 0 1 {x0:.2f} {h - top:.2f} Tm [{' '.join(arr)}] TJ"
            )
    else:
        for x0, top, text in words:
            parts.append(f"1 0 0 1 {x0:.2f} {h - top:.2f} Tm {show(text)} Tj")
    parts.append("ET")
    return "\n".join(parts).encode("latin-1")


def _utf16_hex(ch: str) -> str:
    return ch.encode("utf-16-be").hex().upper()


def _tounicode_cmap(cid_map: Dict[str, int], style: str = "scalar") -> bytes:
    """Serialize a char→CID table as a /ToUnicode CMap stream body:
    consecutive (codepoint, CID) runs become ``bfrange`` entries,
    singletons become ``bfchar`` entries (both shapes real font
    subsetters emit), chunked at the spec's 100-entries-per-block
    limit. ``style="array"`` writes each run's destinations as the
    array form (``<lo> <hi> [<d0> <d1> …]``) instead of a scalar base
    — the third subsetter shape, exercised for parser parity."""
    items = sorted(cid_map.items(), key=lambda kv: kv[1])
    runs: List[List[Tuple[str, int]]] = [[items[0]]] if items else []
    for ch, cid in items[1:]:
        pch, pcid = runs[-1][-1]
        # only BMP single-unit chars extend a range (the range decode
        # increments one UTF-16 code unit)
        if cid == pcid + 1 and ord(ch) == ord(pch) + 1 and ord(ch) <= 0xFFFF:
            runs[-1].append((ch, cid))
        else:
            runs.append([(ch, cid)])
    chars = [r[0] for r in runs if len(r) == 1]
    ranges = [r for r in runs if len(r) > 1]
    parts = [
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /Fixture-UTF16 def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    ]
    for i in range(0, len(chars), 100):
        blk = chars[i : i + 100]
        parts.append(f"{len(blk)} beginbfchar\n".encode())
        for ch, cid in blk:
            parts.append(f"<{cid:04X}> <{_utf16_hex(ch)}>\n".encode())
        parts.append(b"endbfchar\n")
    for i in range(0, len(ranges), 100):
        blk = ranges[i : i + 100]
        parts.append(f"{len(blk)} beginbfrange\n".encode())
        for r in blk:
            if style == "array":
                dsts = " ".join(f"<{_utf16_hex(ch)}>" for ch, _cid in r)
                parts.append(f"<{r[0][1]:04X}> <{r[-1][1]:04X}> [{dsts}]\n".encode())
            else:
                parts.append(
                    f"<{r[0][1]:04X}> <{r[-1][1]:04X}> <{_utf16_hex(r[0][0])}>\n".encode()
                )
        parts.append(b"endbfrange\n")
    parts.append(b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    return b"".join(parts)


def build_pdf(
    pages: List[List[Word]],
    page_size: Tuple[float, float] = DEFAULT_PAGE_SIZE,
    compress: bool = True,
    positioning: str = "tm",
    pdf15: bool = False,
    encoding: str = "latin1",
    content_filter: Optional[str] = None,
    inline_image: bool = False,
    cmap_style: str = "scalar",
) -> bytes:
    """Serialize word boxes into a real, standards-valid PDF:
    FlateDecode content streams, and either a classic xref table
    (``pdf15=False``) or a PDF 1.5 layout — catalog/page-tree/font/page
    dicts packed into an object stream (``/Type /ObjStm``) located by a
    cross-reference STREAM (``/Type /XRef``, ``/W [1 2 2]``) instead of
    a trailer. Deterministic for fixed input (zlib level fixed), so
    fixture corpora mint identically everywhere."""
    w, h = page_size
    n_pages = max(1, len(pages))
    # object numbering: 1=Catalog 2=Pages 3=Font, then (page,content)
    # pairs; encoding="cid" appends a /ToUnicode CMap stream object
    first_page_obj = 4
    objs: Dict[int, bytes] = {}
    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
        f"/MediaBox [0 0 {w:.2f} {h:.2f}] >>"
    ).encode("latin-1")
    cid_map: Optional[Dict[str, int]] = None
    if encoding == "cid":
        chars = sorted({c for pg in pages for _x, _t, text in pg for c in text})
        cid_map = {c: i + 1 for i, c in enumerate(chars)}  # CID 0 = notdef
        touni_num = first_page_obj + 2 * n_pages
        objs[3] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
            f"/Encoding /Identity-H /ToUnicode {touni_num} 0 R >>"
        ).encode("latin-1")
        cmap = _tounicode_cmap(cid_map, cmap_style)
        cfilt = b""
        if compress:
            cmap = zlib.compress(cmap, 6)
            cfilt = b"/Filter /FlateDecode "
        objs[touni_num] = (
            b"<< " + cfilt + b"/Length " + str(len(cmap)).encode() + b" >>"
            b"\nstream\n" + cmap + b"\nendstream"
        )
    elif encoding == "latin1":
        objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    else:
        raise ValueError(f"unknown encoding {encoding!r}")
    for i in range(n_pages):
        words = pages[i] if i < len(pages) else []
        content = _page_content(words, h, positioning, cid_map)
        if inline_image:
            # BI/ID/EI inline raster whose BINARY payload deliberately
            # contains text-operator bytes — the interpreter must strip
            # the image, not show "FAKE" at (99, 720)
            content += (
                b"\nq BI /W 2 /H 2 /BPC 8 /CS /RGB ID\n"
                + b"\x01\x02( 1 0 0 1 99 720 Tm (FAKE) Tj \x03\xff"
                + b"\nEI Q"
            )
        filt = b""
        if content_filter == "a85":
            import base64

            content = base64.a85encode(zlib.compress(content, 6)) + b"~>"
            filt = b"/Filter [/ASCII85Decode /FlateDecode] "
        elif content_filter == "ahx":
            import binascii

            content = binascii.hexlify(zlib.compress(content, 6)) + b">"
            filt = b"/Filter [/ASCIIHexDecode /FlateDecode] "
        elif compress:
            content = zlib.compress(content, 6)
            filt = b"/Filter /FlateDecode "
        page_obj = first_page_obj + 2 * i
        objs[page_obj] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {page_obj + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode("latin-1")
        objs[page_obj + 1] = (
            b"<< " + filt + b"/Length " + str(len(content)).encode() + b" >>"
            b"\nstream\n" + content + b"\nendstream"
        )
    if pdf15:
        return _serialize_pdf15(objs, first_page_obj, n_pages)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_obj = max(objs)
    out += f"xref\n0 {max_obj + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _serialize_pdf15(objs: Dict[int, bytes], first_page_obj: int, n_pages: int) -> bytes:
    """PDF 1.5 serialization: every non-stream object (catalog, page
    tree, font, page dicts) is packed into ONE object stream; the
    only top-level objects are the content streams, the ObjStm and the
    cross-reference stream. There is no classic trailer — /Root and
    /Size live in the XRef stream dict."""
    packed_nums = [1, 2, 3] + [first_page_obj + 2 * i for i in range(n_pages)]
    # everything else (content streams, and the /ToUnicode CMap stream
    # when present) stays top-level — streams cannot live in an ObjStm
    stream_nums = sorted(set(objs) - set(packed_nums))
    max_obj = max(objs)
    objstm_num, xref_num = max_obj + 1, max_obj + 2

    # ObjStm payload: "num off num off ..." header, then the dicts
    body = bytearray()
    offs: List[Tuple[int, int]] = []
    for num in packed_nums:
        offs.append((num, len(body)))
        body += objs[num] + b"\n"
    header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
    payload = zlib.compress(bytes(header + body), 6)
    objstm = (
        f"<< /Type /ObjStm /N {len(packed_nums)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(payload)} >>".encode()
        + b"\nstream\n" + payload + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    top_offsets: Dict[int, int] = {}
    for num in stream_nums:
        top_offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    top_offsets[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode() + objstm + b"\nendobj\n"

    # XRef stream: /W [1 4 2] — type byte, 4-byte field2 (large fixture
    # PDFs exceed 2-byte offsets), 2-byte field3
    size = xref_num + 1
    xref_at = len(out)
    rows = bytearray()

    def row(t: int, f2: int, f3: int):
        rows.extend(bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big"))

    row(0, 0, 65535)  # obj 0: free
    for num in range(1, size):
        if num == xref_num:
            row(1, xref_at, 0)  # the xref stream locates itself
        elif num in top_offsets:
            row(1, top_offsets[num], 0)
        else:
            row(2, objstm_num, packed_nums.index(num))
    xdata = zlib.compress(bytes(rows), 6)
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R /Filter /FlateDecode /Length {len(xdata)} >>".encode()
        + b"\nstream\n" + xdata + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# object scanner

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# the negative lookahead rejects an INDIRECT length ("/Length 12 0 R"
# must not be read as literal 12 — mis-slicing the stream surfaces as a
# confusing zlib error, ADVICE r3); indirect lengths fall back to the
# endstream scan below
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def is_pdf(payload) -> bool:
    if isinstance(payload, (bytes, bytearray, memoryview)):
        return bytes(payload[:5]) == b"%PDF-"
    return False


def _scan_objects(data: bytes) -> Dict[int, Tuple[bytes, Optional[bytes]]]:
    """``{obj_num: (dict_bytes, stream_bytes | None)}`` by sequential
    scan. Streams are skipped by their declared ``/Length`` so binary
    stream content can never be misread as object structure."""
    objs: Dict[int, Tuple[bytes, Optional[bytes]]] = {}
    i = 0
    while True:
        m = _OBJ_HEAD_RE.search(data, i)
        if not m:
            break
        one = _scan_objects_one(data, m)
        if one is None:
            # missing/indirect /Length with no endstream terminator
            if data.find(b"endobj", m.end()) == -1 and data.find(b"stream", m.end()) != -1:
                raise ValueError("unterminated PDF stream")
            break
        num, head, stream, after = one
        objs[num] = (head, stream)
        e = data.find(b"endobj", after)
        if e == -1:
            break
        i = e + len(b"endobj")
    if not objs:
        raise ValueError("no PDF objects found")
    return objs


_REF_RE_T = r"(\d+)\s+\d+\s+R"
_PAGES_REF_RE = re.compile(rb"/Pages\s+" + _REF_RE_T.encode())
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+" + _REF_RE_T.encode())
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_REF_RE = re.compile(_REF_RE_T.encode())


def _page_objects(objs: Dict[int, Tuple[bytes, Optional[bytes]]]) -> List[int]:
    """Page object numbers in document order (Catalog → Pages → Kids;
    nested page trees flattened depth-first)."""
    root_pages = None
    for head, _ in objs.values():
        if b"/Type" in head and b"/Catalog" in head:
            m = _PAGES_REF_RE.search(head)
            if m:
                root_pages = int(m.group(1))
            break
    order: List[int] = []

    def walk(num: int):
        head, _ = objs.get(num, (b"", None))
        if b"/Kids" in head:
            m = _KIDS_RE.search(head)
            if m:
                for r in _REF_RE.finditer(m.group(1)):
                    walk(int(r.group(1)))
        elif b"/Page" in head:
            order.append(num)

    if root_pages is not None and root_pages in objs:
        walk(root_pages)
    if not order:  # xref-less / damaged tree: fall back to object order
        order = sorted(
            n for n, (h, _) in objs.items() if b"/Type" in h and b"/Page" in h and b"/Pages" not in h
        )
    return order


_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_STREAM_WS = b" \t\r\n\x0c\x00"


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.translate(None, delete=_STREAM_WS)
    end = body.find(b">")
    if end != -1:
        body = body[:end]
    if len(body) % 2:
        body += b"0"  # spec: odd final digit implies a trailing 0
    return bytes.fromhex(body.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = data.strip()
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end != -1:
        body = body[:end]
    return base64.a85decode(body, adobe=False, ignorechars=b" \t\r\n\x0c\x00")


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:  # EOD
            break
        if ln < 128:
            out += data[i + 1 : i + 2 + ln]
            i += 2 + ln
        else:
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    """Apply the stream's declared filter CHAIN in order. Supported:
    ASCIIHexDecode, ASCII85Decode (both Adobe framings), FlateDecode,
    RunLengthDecode — the full non-image-codec set real bank PDFs use
    (DCT/JBIG2/CCITT are raster codecs; their streams never carry text
    operators, so an unknown filter passes through untouched rather
    than failing the document)."""
    m = _FILTER_RE.search(head)
    if m:
        names = (
            re.findall(rb"/([A-Za-z0-9]+)", m.group(1)) if m.group(1) else [m.group(2)]
        )
    else:
        names = []
    out = stream
    for name in names:
        if name == b"FlateDecode" or name == b"Fl":
            # decompressobj tolerates trailing bytes (the EOL before
            # ``endstream`` when the slice came from the endstream-scan
            # fallback — indirect or missing /Length)
            d = zlib.decompressobj()
            out = d.decompress(out) + d.flush()
        elif name == b"ASCIIHexDecode" or name == b"AHx":
            out = _ascii_hex_decode(out)
        elif name == b"ASCII85Decode" or name == b"A85":
            out = _ascii85_decode(out)
        elif name == b"RunLengthDecode" or name == b"RL":
            out = _run_length_decode(out)
        else:  # raster codec / crypt filter: opaque, pass through
            break
    pred = _dict_int(head, b"Predictor")
    if pred is not None and pred >= 10:
        out = _apply_png_predictor(out, _dict_int(head, b"Columns") or 1)
    return out


# ---------------------------------------------------------------------------
# PDF 1.5: cross-reference streams + object streams

def _dict_int(head: bytes, key: bytes) -> Optional[int]:
    m = re.search(rb"/" + key + rb"\s+(\d+)\b(?!\s+\d+\s+R)", head)
    return int(m.group(1)) if m else None


def _dict_int_array(head: bytes, key: bytes) -> Optional[List[int]]:
    m = re.search(rb"/" + key + rb"\s*\[([^\]]*)\]", head)
    return [int(x) for x in m.group(1).split()] if m else None


def _apply_png_predictor(data: bytes, columns: int, bpp: int = 1) -> bytes:
    """Undo PNG row filters 0–4: each row is one filter byte +
    ``columns`` data bytes; the left neighbor sits ``bpp`` bytes back
    (1 for xref streams — 8-bit single-component; the pixel byte width
    for PNG rasters, which ``multimodal.decode_png`` shares this kernel
    with). Scalar loops are fine here by contract: xref streams are a
    few KB and the synthetic media corpus uses small rasters."""
    rowlen = columns + 1
    prev = bytearray(columns)
    out = bytearray()
    for r in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if ft == 1:  # Sub
            for i in range(bpp, columns):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                p = a + b - c
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _read_obj_at(data: bytes, off: int):
    """(num, head, stream|None, after) of the object starting at
    ``off``, or None if the offset does not address an object header."""
    m = _OBJ_HEAD_RE.match(data, off)
    if not m:
        return None
    return _scan_objects_one(data, m)


def _scan_objects_one(data: bytes, m) -> Optional[Tuple[int, bytes, Optional[bytes], int]]:
    """Shared per-object slicing of the scanner: head + /Length-based
    (or endstream-scan fallback) stream extraction. ``after`` is the
    offset just past the stream data (or past the head for dict-only
    objects) — resuming the walk there keeps binary stream content from
    ever being misread as object structure."""
    num = int(m.group(1))
    j = m.end()
    s = data.find(b"stream", j)
    e = data.find(b"endobj", j)
    if e == -1:
        return None
    if s != -1 and s < e:
        head = data[j:s]
        lm = _LENGTH_RE.search(head)
        k = s + len(b"stream")
        if data[k : k + 2] == b"\r\n":
            k += 2
        elif data[k : k + 1] == b"\n":
            k += 1
        if lm:
            end = k + int(lm.group(1))
        else:
            # missing or indirect /Length: locate the terminator
            # directly (limitation: a FlateDecode stream whose
            # compressed bytes contain literal b"endstream" would
            # be truncated — not seen in practice)
            end = data.find(b"endstream", k)
            if end == -1:
                return None
        return num, head, data[k:end], end
    return num, data[j:e], None, e


XrefEntry = Tuple[str, int, int]  # ("off", offset, 0) | ("stm", objstm_num, idx)


def _parse_xref_streams(data: bytes) -> Optional[Dict[int, XrefEntry]]:
    """PDF 1.5 object locator: follow ``startxref`` to a ``/Type /XRef``
    cross-reference stream, decode its ``/W``-packed entries (honoring
    ``/Index`` subsections and PNG predictors), and walk the ``/Prev``
    chain — later sections (visited first) take precedence, the PDF
    incremental-update rule. Returns None when the file has no parseable
    xref stream (classic table or damaged tail — the byte scanner is
    the fallback)."""
    p = data.rfind(b"startxref")
    if p == -1:
        return None
    m = re.match(rb"startxref\s+(\d+)", data[p:])
    if not m:
        return None
    entries: Dict[int, XrefEntry] = {}
    off: Optional[int] = int(m.group(1))
    seen = set()
    found_any = False
    while off is not None and off not in seen and 0 <= off < len(data):
        seen.add(off)
        obj = _read_obj_at(data, off)
        if obj is None:
            break
        _, head, stream, _ = obj
        if b"/XRef" not in head or stream is None:
            break
        found_any = True
        w = _dict_int_array(head, b"W")
        size = _dict_int(head, b"Size")
        if not w or len(w) != 3 or size is None:
            break
        index = _dict_int_array(head, b"Index") or [0, size]
        raw = _decode_stream(head, stream)
        rowlen = sum(w)
        pos = 0

        def field(buf: bytes, start: int, width: int, default: int) -> int:
            if width == 0:
                return default
            return int.from_bytes(buf[start : start + width], "big")

        for si in range(0, len(index) - 1, 2):
            first, count = index[si], index[si + 1]
            for n in range(first, first + count):
                if pos + rowlen > len(raw):
                    break
                t = field(raw, pos, w[0], 1)
                f2 = field(raw, pos + w[0], w[1], 0)
                f3 = field(raw, pos + w[0] + w[1], w[2], 0)
                pos += rowlen
                if n not in entries:  # first-seen (latest section) wins
                    if t == 1:
                        entries[n] = ("off", f2, f3)
                    elif t == 2:
                        entries[n] = ("stm", f2, f3)
        off = _dict_int(head, b"Prev")
    return entries if found_any else None


def _expand_object_streams(
    objs: Dict[int, Tuple[bytes, Optional[bytes]]],
    xref: Optional[Dict[int, XrefEntry]] = None,
) -> None:
    """Unpack every ``/Type /ObjStm`` into ``objs`` (in place). When an
    xref locator is available it is authoritative: an embedded object
    overwrites an existing entry iff the xref maps that object into this
    stream (stale incremental-update copies lose). Without an xref,
    embedded objects only fill absent numbers — a top-level object of
    the same number was seen later in the byte walk and wins."""
    for stm_num in sorted(objs):
        head, stream = objs[stm_num]
        if b"/ObjStm" not in head or stream is None:
            continue
        n, first = _dict_int(head, b"N"), _dict_int(head, b"First")
        if n is None or first is None:
            continue
        try:
            raw = _decode_stream(head, stream)
        except zlib.error:
            continue
        pairs = raw[:first].split()
        nums = [int(x) for x in pairs[0 : 2 * n : 2]]
        offs = [int(x) for x in pairs[1 : 2 * n : 2]]
        bounds = offs[1:] + [len(raw) - first]
        for i, num in enumerate(nums):
            body = raw[first + offs[i] : first + bounds[i]].strip()
            authoritative = xref is not None and xref.get(num, ("", -1, -1))[:2] == ("stm", stm_num)
            if authoritative or num not in objs:
                objs[num] = (body, None)


# ---------------------------------------------------------------------------
# content-stream text interpreter

_TOKEN_RE = re.compile(
    r"\((?:\\.|[^\\()])*\)"  # literal string
    r"|<[0-9A-Fa-f\s]*>"  # hex string
    r"|/[^\s/<>()\[\]{}%]*"  # name
    r"|[-+]?(?:\d+\.?\d*|\.\d+)"  # number
    r"|\[|\]"
    r"|[A-Za-z'\"*]+"  # operator
)

_ESC_RE = re.compile(r"\\([0-7]{1,3}|.)")
_ESC_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}


def _decode_literal(tok: str) -> str:
    def sub(m):
        g = m.group(1)
        if g[0] in "01234567":
            return chr(int(g, 8))
        return _ESC_MAP.get(g, g)

    return _ESC_RE.sub(sub, tok[1:-1])


def _decode_hex(tok: str) -> str:
    digits = re.sub(r"\s", "", tok[1:-1])
    if len(digits) % 2:
        digits += "0"
    return bytes.fromhex(digits).decode("latin-1")


def _decode_hex_cids(tok: str, cmap: Dict[int, str], memo: Optional[Dict[str, str]] = None) -> str:
    """Hex show string under a CID font: 2-byte code groups mapped
    through the font's /ToUnicode CMap (unmapped CIDs → U+FFFD, the
    same stand-in pdfminer/pdfplumber surface). ``memo`` (per-document,
    since CID assignments are per-font) short-circuits repeated show
    strings — a statement corpus re-shows the same words constantly
    (profiled ~2× on CID parses)."""
    if memo is not None:
        hit = memo.get(tok)
        if hit is not None:
            return hit
    digits = tok[1:-1]
    if not digits.isalnum():  # rare: whitespace inside the hex string
        digits = re.sub(r"\s", "", digits)
    pad = (-len(digits)) % 4
    if pad:
        digits += "0" * pad
    out = "".join(
        cmap.get(int(digits[i : i + 4], 16), "�")
        for i in range(0, len(digits), 4)
    )
    if memo is not None:
        memo[tok] = out
    return out


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_FONTDICT_REF_RE = re.compile(rb"/Font\s*<<\s*/F\d+\s+(\d+)\s+0\s+R")
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")


_CMAP_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _parse_tounicode(data: bytes) -> Dict[int, str]:
    """/ToUnicode CMap stream → {CID: unicode string}. Supports all
    three shapes font subsetters emit — ``bfchar`` singletons, scalar
    ``bfrange`` runs (destination = UTF-16BE hex, last code unit
    incremented across the run), and array-form ``bfrange``
    (``<lo> <hi> [<d0> <d1> …]`` — one explicit destination per code,
    the shape subsetters use for non-consecutive glyph→unicode maps).
    Extra array destinations beyond the range are ignored; short
    arrays leave the tail codes absent (→ U+FFFD, never misread)."""
    m: Dict[int, str] = {}
    for blk in _BFCHAR_RE.findall(data):
        toks = _CMAP_HEX_RE.findall(blk)
        for src, dst in zip(toks[0::2], toks[1::2]):
            m[int(src, 16)] = bytes.fromhex(dst.decode()).decode("utf-16-be")
    for blk in _BFRANGE_RE.findall(data):
        toks = _CMAP_TOK_RE.findall(blk)
        i = 0
        while i + 1 < len(toks):
            lo_t, hi_t = toks[i][0], toks[i + 1][0]
            if not (lo_t and hi_t):
                i += 1  # stray bracket / malformed entry: resync
                continue
            lo_i, hi_i = int(lo_t, 16), int(hi_t, 16)
            i += 2
            if i < len(toks) and toks[i][1]:  # '[' — array form
                i += 1
                k = 0
                while i < len(toks) and not toks[i][2]:
                    if toks[i][0] and lo_i + k <= hi_i:
                        m[lo_i + k] = bytes.fromhex(
                            toks[i][0].decode()
                        ).decode("utf-16-be")
                    k += 1
                    i += 1
                i += 1  # skip ']'
            elif i < len(toks) and toks[i][0]:  # scalar run
                base = bytes.fromhex(toks[i][0].decode()).decode("utf-16-be")
                head, last = base[:-1], ord(base[-1])
                for k in range(hi_i - lo_i + 1):
                    m[lo_i + k] = head + chr(last + k)
                i += 1
    return m


# Fast path: absolutely-positioned show ops — `a b c d e f Tm (s) Tj`
# — the shape print pipelines (and the fixture writer) emit. One C-speed
# findall replaces the per-token Python interpreter (~10× on large
# pages). Guard: the count of fast matches must equal the count of ALL
# show ops and no line-translate ops may appear, else fall back.
_FAST_TM_TJ_RE = re.compile(
    r"[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm\s*"
    r"(\((?:\\.|[^\\()])*\))\s*Tj"
)
def _interpret_text_fast(content: str, page_height: float) -> Optional[List[Word]]:
    if "Tm" not in content:  # C memchr pre-guard: skip the findall scan
        return None
    if "TJ" in content:  # a TJ array can never be a fast Tm-Tj match;
        return None  # skip the findall and let the TJ fast path try
    matches = _FAST_TM_TJ_RE.findall(content)
    # guards are plain substring counts (C memchr — a second regex pass
    # here measurably doubled parse cost): every show op must be a fast
    # match and no line-translate ops may appear anywhere. A string
    # literal *containing* 'Tj'/'Td'/quote chars only over-counts, which
    # fails conservative (falls back to the full interpreter).
    n_show = content.count("Tj") + content.count("TJ") + content.count("'") + content.count('"')
    if len(matches) != n_show or "Td" in content or "TD" in content or "T*" in content:
        return None
    words: List[Word] = []
    for x, y, lit in matches:
        s = _decode_literal(lit) if "\\" in lit else lit[1:-1]
        if s:
            words.append((float(x), page_height - float(y), s))
    return words


# Fast path #2: relative-positioned show ops — `dx dy Td (s) Tj` — the
# multi-op-line shape. Position is the running sum of the translates
# (Td composes with the line matrix; with one BT block and no other
# positioning ops the matrix stays a pure translation), so one findall
# + two cumsums replace the token interpreter (~4× on large pages).
_FAST_TD_TJ_RE = re.compile(
    r"([\d.+-]+)\s+([\d.+-]+)\s+Td\s*(\((?:\\.|[^\\()])*\))\s*Tj"
)


def _interpret_text_fast_td(content: str, page_height: float) -> Optional[List[Word]]:
    # guards first (C memchr substring counts, same conservative logic
    # as the Tm fast path): no other positioning ops, exactly one BT (a
    # second BT resets the matrix) — then every show op must be a match
    if "Tm" in content or "TD" in content or "T*" in content or content.count("BT") != 1:
        return None
    matches = _FAST_TD_TJ_RE.findall(content)
    if not matches:
        return None
    n_show = content.count("Tj") + content.count("TJ") + content.count("'") + content.count('"')
    if len(matches) != n_show:
        return None
    import numpy as _np

    dx = _np.cumsum(_np.array([float(m[0]) for m in matches], _np.float64))
    dy = _np.cumsum(_np.array([float(m[1]) for m in matches], _np.float64))
    words: List[Word] = []
    for i, (_, _, lit) in enumerate(matches):
        s = _decode_literal(lit) if "\\" in lit else lit[1:-1]
        if s:
            words.append((float(dx[i]), page_height - float(dy[i]), s))
    return words


# Fast path #3: absolutely-positioned CID show ops — `a b c d e f Tm
# <hex> Tj` — the composite-font twin of fast path #1. Same guards
# (every show op must match, no line-translate ops); decode goes
# through the memoized CMap lookup.
_FAST_TM_HEXTJ_RE = re.compile(
    r"[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm\s*"
    r"(<[0-9A-Fa-f\s]*>)\s*Tj"
)


def _interpret_text_fast_cid(
    content: str, page_height: float, cmap: Dict[int, str], memo: Dict[str, str]
) -> Optional[List[Word]]:
    if "Tm" not in content:
        return None
    matches = _FAST_TM_HEXTJ_RE.findall(content)
    n_show = content.count("Tj") + content.count("TJ") + content.count("'") + content.count('"')
    if len(matches) != n_show or "Td" in content or "TD" in content or "T*" in content:
        return None
    words: List[Word] = []
    for x, y, hx in matches:
        s = _decode_hex_cids(hx, cmap, memo)
        if s:
            words.append((float(x), page_height - float(y), s))
    return words


class _Str(str):
    """PDF string operand — distinct from structural tokens ('[', ']',
    '/Name' are plain str), so a literal string whose *content* happens
    to be '[' can never be mistaken for an array delimiter."""


# Helvetica AFM glyph widths (per-1000 text-space units) — the public
# Adobe core-14 metrics. Used for intra-TJ glyph advance so a whole
# LINE shown as one TJ array still yields one word box per string, each
# at its metric x position (pdfplumber does the same with the font's
# widths). Accented Latin-1 letters take their NFD base letter's width;
# unknown glyphs default to 556 (the Helvetica digit/average width).
_HELV_W = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278, "0": 556, "1": 556, "2": 556, "3": 556, "4": 556,
    "5": 556, "6": 556, "7": 556, "8": 556, "9": 556, ":": 278, ";": 278,
    "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015, "A": 667, "B": 667,
    "C": 722, "D": 722, "E": 667, "F": 611, "G": 778, "H": 722, "I": 278,
    "J": 500, "K": 667, "L": 556, "M": 833, "N": 722, "O": 778, "P": 667,
    "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
    "X": 667, "Y": 667, "Z": 611, "[": 278, "\\": 278, "]": 278, "^": 469,
    "_": 556, "`": 333, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
    "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500, "l": 222,
    "m": 833, "n": 556, "o": 556, "p": 556, "q": 556, "r": 333, "s": 500,
    "t": 278, "u": 556, "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}


def _glyph_width(ch: str) -> int:
    w = _HELV_W.get(ch)
    if w is None:
        import unicodedata

        w = _HELV_W.get(unicodedata.normalize("NFD", ch)[0], 556)
    return w


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _text_width(s: str, size: float) -> float:
    """Metric width of a shown string at ``size`` (text-space pts).
    Memoized: a statement corpus repeats a small word vocabulary
    (dates, amounts, descriptions), so the per-char sum runs once per
    distinct word — profiled 3× on line-mode parses."""
    return sum(_glyph_width(c) for c in s) * size / 1000.0


# Fast path #4: whole-LINE TJ arrays — `a b c d e f Tm [(s) n (s) …] TJ`
# per line, one Tf setting the size — the print-pipeline shape whose
# word positions only recover through glyph metrics. One findall over
# the line blocks plus one small item scan per array replaces the
# token interpreter; the metric advance reuses the memoized
# ``_text_width``. Guards: exactly one Tf, no other positioning ops,
# every show op accounted for by the matched arrays.
_FAST_TM_TJARR_RE = re.compile(
    r"([\d.+-]+)\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+([\d.+-]+)\s+([\d.+-]+)\s+Tm\s*"
    r"\[((?:\((?:\\.|[^\\()])*\)|[^\]\\(])*)\]\s*TJ"
)
_TJ_ITEM_RE = re.compile(r"(\((?:\\.|[^\\()])*\))|([\d.+-]+)")
_TF_RE = re.compile(r"/F\d+\s+([\d.+-]+)\s+Tf")


def _interpret_text_fast_line(content: str, page_height: float) -> Optional[List[Word]]:
    if "TJ" not in content or "Td" in content or "TD" in content or "T*" in content:
        return None
    sizes = _TF_RE.findall(content)
    if len(sizes) != 1:
        return None
    size = float(sizes[0])
    matches = _FAST_TM_TJARR_RE.findall(content)
    if not matches:
        return None
    n_show = content.count("Tj") + content.count("TJ") + content.count("'") + content.count('"')
    if len(matches) != n_show:
        return None
    words: List[Word] = []
    add = words.append
    item_iter = _TJ_ITEM_RE.finditer
    for a, x0, y, body in matches:
        x = float(x0)
        top = page_height - float(y)
        scale = float(a)
        for im in item_iter(body):
            lit = im.group(1)
            if lit is not None:
                s = _decode_literal(lit) if "\\" in lit else lit[1:-1]
                if s:
                    add((x, top, s))
                x += _text_width(s, size) * scale
            else:
                x -= float(im.group(2)) / 1000.0 * size * scale
    return words


def _interpret_text(
    content: str,
    page_height: float,
    cmap: Optional[Dict[int, str]] = None,
    cid_memo: Optional[Dict[str, str]] = None,
) -> List[Word]:
    """Run the text operators, emitting one word box per show op at the
    current text-matrix origin (top-left convention). With ``cmap``
    (the page font's /ToUnicode table) HEX show strings decode as
    2-byte CIDs through it; literal strings stay Latin-1 (our CID
    writer emits hex only — declared)."""
    words: List[Word] = []
    stack: List = []
    # text matrix / line matrix as affine (a, b, c, d, e, f); leading
    tm = lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    leading = 0.0
    font_size = 0.0  # set by Tf; 0 disables metric advance

    def emit(s: str):
        nonlocal tm
        if s:
            words.append((tm[4], page_height - tm[5], s))

    def emit_at(x: float, s: str):
        if s:
            words.append((x, page_height - tm[5], s))

    def translate_line(tx: float, ty: float):
        nonlocal tm, lm
        a, b, c, d, e, f = lm
        lm = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)
        tm = lm

    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        ch = tok[0]
        if ch == "(":
            stack.append(_Str(_decode_literal(tok)))
        elif ch == "<":
            stack.append(
                _Str(_decode_hex_cids(tok, cmap, cid_memo) if cmap else _decode_hex(tok))
            )
        elif ch == "/" or ch == "[" or ch == "]":
            stack.append(tok)
        elif ch in "-+.0123456789":
            stack.append(float(tok))
        else:  # operator
            if tok == "BT":
                tm = lm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
            elif tok == "Tm" and len(stack) >= 6:
                tm = lm = tuple(stack[-6:])  # type: ignore[assignment]
            elif tok == "Td" and len(stack) >= 2:
                translate_line(stack[-2], stack[-1])
            elif tok == "TD" and len(stack) >= 2:
                leading = -stack[-1]
                translate_line(stack[-2], stack[-1])
            elif tok == "TL" and stack:
                leading = stack[-1]
            elif tok == "Tf" and stack and isinstance(stack[-1], float):
                font_size = stack[-1]
            elif tok == "T*":
                translate_line(0.0, -leading)
            elif tok == "Tj" and stack:
                emit(stack[-1] if isinstance(stack[-1], _Str) else "")
            elif tok == "'" and stack:
                translate_line(0.0, -leading)
                emit(stack[-1] if isinstance(stack[-1], _Str) else "")
            elif tok == '"' and stack:
                translate_line(0.0, -leading)
                emit(stack[-1] if isinstance(stack[-1], _Str) else "")
            elif tok == "TJ":
                # strings AND kerning numbers between the enclosing
                # [ ]: each string emits at the running metric x
                # (Helvetica AFM glyph advance × Tf size), each number
                # n shifts x by −n/1000·size — so a whole line shown
                # as one TJ still yields per-word boxes at their true
                # positions. With no Tf seen (size 0) both advances
                # vanish and the legacy emit-at-origin behavior holds.
                depth_items: List = []
                for it in reversed(stack):
                    if isinstance(it, _Str) or isinstance(it, float):
                        depth_items.append(it)
                    elif it == "[":
                        break
                x = tm[4]
                scale = tm[0]  # translation-scope matrices: a = x scale
                for it in reversed(depth_items):
                    if isinstance(it, _Str):
                        emit_at(x, it)
                        x += _text_width(it, font_size) * scale
                    else:
                        x -= it / 1000.0 * font_size * scale
            stack.clear()
    return words


_BI_RE = re.compile(r"(?:^|(?<=[\s>\]]))BI\b")
_ID_RE = re.compile(r"ID[ \r\n]")
_EI_RE = re.compile(r"[ \r\n\t\x00]EI(?=[ \r\n\t\x00/\[\]<(]|$)")


def _strip_inline_images(content: str) -> str:
    """Remove ``BI … ID <binary> EI`` inline-image segments before text
    interpretation — the raster payload is raw binary and would
    otherwise be tokenized as operators/strings (a payload byte pair
    like ``(…) Tj`` would show phantom text). End-of-image detection is
    the standard heuristic (whitespace-delimited ``EI`` followed by a
    delimiter): a payload containing that exact sequence terminates
    early, same as other /Length-less inline-image parsers."""
    out = []
    pos = 0
    while True:
        m = _BI_RE.search(content, pos)
        if not m:
            out.append(content[pos:])
            break
        out.append(content[pos : m.start()])
        idm = _ID_RE.search(content, m.end())
        if not idm:
            out.append(content[m.start() :])  # malformed: keep verbatim
            break
        eim = _EI_RE.search(content, idm.end())
        if not eim:
            break  # unterminated image: drop the remainder
        pos = eim.end()
    return "".join(out)


def parse_pdf_words(data: bytes) -> List[List[Word]]:
    """``pdf bytes → [page][(x0, top, text)]`` (pdfplumber
    ``page.extract_words`` analog for absolutely-positioned text)."""
    data = bytes(data)
    if not is_pdf(data):
        raise ValueError("payload is not a PDF (missing %PDF- magic)")
    objs = _scan_objects(data)
    # PDF 1.5: unpack object streams; the xref-stream locator (when the
    # file has one) arbitrates which copy of an object is live across
    # incremental updates
    if any(b"/ObjStm" in h for h, _ in objs.values()):
        _expand_object_streams(objs, _parse_xref_streams(data))
    default_h = DEFAULT_PAGE_SIZE[1]
    # MediaBox may live on the page or be inherited from the page tree
    inherited_h = default_h
    for head, _ in objs.values():
        if b"/Type" in head and b"/Pages" in head:
            mb = _MEDIABOX_RE.search(head)
            if mb:
                inherited_h = float(mb.group(4)) - float(mb.group(2))
            break
    pages: List[List[Word]] = []
    cmap_cache: Dict[int, Optional[Dict[int, str]]] = {}
    cid_memos: Dict[int, Dict[str, str]] = {}

    def page_cmap(page_head: bytes) -> Optional[Dict[int, str]]:
        fm = _FONTDICT_REF_RE.search(page_head)
        if not fm:
            return None
        font_num = int(fm.group(1))
        if font_num not in cmap_cache:
            cmap_cache[font_num] = None
            fhead, _fs = objs.get(font_num, (b"", None))
            tm_ = _TOUNICODE_REF_RE.search(fhead)
            if tm_:
                thead, tstream = objs.get(int(tm_.group(1)), (b"", None))
                if tstream is not None:
                    cmap_cache[font_num] = _parse_tounicode(
                        _decode_stream(thead, tstream)
                    )
        return cmap_cache[font_num]

    for pnum in _page_objects(objs):
        head, _ = objs[pnum]
        mb = _MEDIABOX_RE.search(head)
        h = float(mb.group(4)) - float(mb.group(2)) if mb else inherited_h
        cm = _CONTENTS_RE.search(head)
        if not cm:
            pages.append([])
            continue
        chead, cstream = objs.get(int(cm.group(1)), (b"", None))
        if cstream is None:
            pages.append([])
            continue
        content = _decode_stream(chead, cstream).decode("latin-1")
        if "BI" in content:
            content = _strip_inline_images(content)
        cmap = page_cmap(head)
        if cmap is not None:
            # CID hex strings need the CMap — the literal-string fast
            # paths cannot apply. One decode memo per document (CID
            # assignments are per-font, pages share the font).
            memo = cid_memos.setdefault(id(cmap), {})
            fast = _interpret_text_fast_cid(content, h, cmap, memo)
            pages.append(
                fast if fast is not None else _interpret_text(content, h, cmap, memo)
            )
            continue
        fast = _interpret_text_fast(content, h)
        if fast is None:
            fast = _interpret_text_fast_td(content, h)
        if fast is None:
            fast = _interpret_text_fast_line(content, h)
        pages.append(fast if fast is not None else _interpret_text(content, h))
    return pages


# ---------------------------------------------------------------------------
# extraction strategy

def extract_pdf_native(
    data: bytes,
    date_end_x: Optional[float] = None,
    value_start_x: Optional[float] = None,
) -> ExtractResult:
    """S2/P7 over real PDF bytes: parse word boxes, then the exact
    y-cluster + x-threshold column pipeline of
    ``layout.extract_coordinate_columns`` (conversor_banestes.py:23-91
    semantics) — byte-identical output to the markup twin."""
    from pdf_table_extractor_ray.stages.layout import (
        COLUMN_DATE_END_X,
        COLUMN_VALUE_START_X,
        cluster_words_to_result,
    )

    pages = parse_pdf_words(data)
    return cluster_words_to_result(
        pages,
        COLUMN_DATE_END_X if date_end_x is None else date_end_x,
        COLUMN_VALUE_START_X if value_start_x is None else value_start_x,
    )
