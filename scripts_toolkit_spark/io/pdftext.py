"""Pure-Python PDF text-span decoder (documented SUBSET) + fixture writer.

Parses the PDF constructs that cover plain text documents — body objects,
page tree (/Pages /Kids order), per-page /Contents streams (raw or
FlateDecode via stdlib zlib), the text operators inside BT…ET blocks:
`/Fx size Tf` (font/size state), `(…) Tj`, `' `, and `[…] TJ`
(show-text), plus PDF 1.5 OBJECT STREAMS (/Type /ObjStm): dictionary
objects packed into a compressed container stream are unpacked and join
the regular object table, so files written with compressed cross-reference
("web-optimized" output from modern producers) decode too. Font tags
resolve to /BaseFont names through the page's /Resources /Font dictionary
when present.

Out of scope (raises ValueError, never silently wrong): encrypted files,
non-flate filters, CID/hex strings, inline images. Real-world arbitrary
PDFs still want PyMuPDF on the cluster (io/sources.read_pdf_spans uses
fitz when installed and falls back to this subset decoder otherwise) —
same pattern as the XPORT decoder (io/xport.py).

Reference parity: the span rows mirror reference app.py:16-38's
{text, size, font} page-dict flatten, in reading order.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+0\s+R|\[(.*?)\])", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_NUM_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTMAP_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_BASEFONT_RE = re.compile(rb"/BaseFont\s*/([^\s/<>\[\]]+)")
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# text-state + show-text operators inside a BT block
_TOK_RE = re.compile(
    rb"/(\w+)\s+([\d.]+)\s+Tf"  # font + size
    rb"|\(((?:\\.|[^()\\])*)\)\s*(Tj|')"  # literal string show
    rb"|\[((?:\\.|[^\]])*)\]\s*TJ",  # array show
    re.S,
)
_STR_IN_TJ_RE = re.compile(rb"\(((?:\\.|[^()\\])*)\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out, i = bytearray(), 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _unpack_object_streams(objs: dict[int, bytes]) -> None:
    """PDF 1.5 /Type /ObjStm containers: inflate the stream, read the
    header's N (objnum, offset) integer pairs, and slice each member
    object's body into the regular object table. Streams themselves are
    never allowed inside an ObjStm, so /Contents objects are unaffected;
    top-level objects win on number collision (spec: an uncompressed
    revision supersedes the compressed copy)."""
    for body in list(objs.values()):
        if not re.search(rb"/Type\s*/ObjStm", body):
            continue
        sm = _STREAM_RE.search(body)
        n_m, first_m = _OBJSTM_N_RE.search(body), _OBJSTM_FIRST_RE.search(body)
        if not (sm and n_m and first_m):
            raise ValueError("malformed /ObjStm (missing stream, /N or /First)")
        blob = sm.group(1)
        if b"/Filter" in body:
            if b"/FlateDecode" not in body:
                raise ValueError("unsupported /ObjStm filter (only FlateDecode)")
            blob = zlib.decompress(blob)
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = blob[:first].split()
        if len(header) < 2 * n:
            raise ValueError("/ObjStm header shorter than 2*N integers")
        pairs = [(int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)]
        for i, (objnum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(blob) - first
            objs.setdefault(objnum, blob[first + off : first + end])


def parse_pdf_spans(data: bytes) -> list[tuple[int, int, str, float, str]]:
    """PDF bytes → [(page_no, span_seq, text, size, font)] in reading
    order, one tuple per show-text operator."""
    if b"/Encrypt" in data:
        raise ValueError("encrypted PDFs are outside the subset decoder's scope")
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}
    if not objs:
        raise ValueError("no PDF objects found (not a PDF)")
    _unpack_object_streams(objs)

    # page order: /Pages node's /Kids when present, else appearance order
    page_nums = []
    for num, body in objs.items():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            kids = _KIDS_RE.search(body)
            if kids:
                page_nums = [int(m.group(1)) for m in _NUM_REF_RE.finditer(kids.group(1))]
            break
    if not page_nums:
        page_nums = [
            n for n, b in sorted(objs.items())
            if b"/Type" in b and re.search(rb"/Type\s*/Page[^s]", b)
        ]
    if not page_nums:
        raise ValueError("no page objects found")

    rows: list[tuple[int, int, str, float, str]] = []
    seq = 0
    for pno, num in enumerate(page_nums, start=1):
        body = objs.get(num, b"")
        # font tag → BaseFont map from /Resources
        fonts: dict[bytes, str] = {}
        fd = _FONTDICT_RE.search(body)
        if fd:
            for tag, ref in _FONTMAP_RE.findall(fd.group(1)):
                base = _BASEFONT_RE.search(objs.get(int(ref), b""))
                if base:
                    fonts[tag] = base.group(1).decode("latin-1")
        m = _REF_RE.search(body)
        if not m:
            continue
        content_refs = (
            [int(m.group(1))]
            if m.group(1)
            else [int(r.group(1)) for r in _NUM_REF_RE.finditer(m.group(2))]
        )
        content = b""
        for ref in content_refs:
            cbody = objs.get(ref, b"")
            sm = _STREAM_RE.search(cbody)
            if not sm:
                continue
            blob = sm.group(1)
            if b"/Filter" in cbody:
                if b"/FlateDecode" not in cbody:
                    raise ValueError("unsupported stream filter (only FlateDecode)")
                blob = zlib.decompress(blob)
            content += blob + b"\n"

        font, size = "unknown", 0.0
        for bt in _BT_RE.finditer(content):
            for tok in _TOK_RE.finditer(bt.group(1)):
                if tok.group(1):  # Tf
                    tag = tok.group(1)
                    font = fonts.get(tag, tag.decode("latin-1"))
                    size = float(tok.group(2))
                elif tok.group(4):  # Tj / '
                    seq += 1
                    rows.append((pno, seq, _unescape(tok.group(3)), size, font))
                else:  # TJ array: concatenate its strings into one span
                    text = "".join(
                        _unescape(s.group(1)) for s in _STR_IN_TJ_RE.finditer(tok.group(5))
                    )
                    seq += 1
                    rows.append((pno, seq, text, size, font))
    return rows


# ------------------------------------------------------------------ writer --
def _escape(s: str) -> bytes:
    return (
        s.encode("latin-1")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def write_pdf(pages: list[list[tuple[str, float, str]]], compress: bool = False) -> bytes:
    """Minimal single-font-per-span PDF writer for fixtures: `pages` is a
    list of pages, each a list of (text, size, font_basename) spans.
    Produces a complete, standards-shaped file (catalog, page tree, fonts,
    xref) that this module, PyMuPDF, or any PDF reader can open."""
    objects: list[bytes] = []  # 1-indexed

    font_names = sorted({f for page in pages for (_t, _s, f) in page})
    font_obj_of: dict[str, int] = {}
    # obj 1 = catalog, obj 2 = pages node; fonts next; then per page:
    # page object + content object
    next_num = 3
    for fname in font_names:
        font_obj_of[fname] = next_num
        next_num += 1
    page_obj_nums = []
    for _ in pages:
        page_obj_nums.append(next_num)
        next_num += 2  # page, content

    kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(pages))
    )  # 2
    for fname in font_names:
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /%s >>" % fname.encode("latin-1")
        )

    for page, pnum in zip(pages, page_obj_nums):
        tags = {f: b"F%d" % (i + 1) for i, f in enumerate(font_names)}
        fontrefs = b" ".join(
            b"/%s %d 0 R" % (tags[f], font_obj_of[f]) for f in font_names
        )
        parts = [b"BT"]
        y = 760
        for text, size, fname in page:
            parts.append(b"/%s %s Tf" % (tags[fname], repr(size).encode()))
            parts.append(b"1 0 0 1 72 %d Tm" % y)
            parts.append(b"(%s) Tj" % _escape(text))
            y -= 20
        parts.append(b"ET")
        stream = b"\n".join(parts)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b" /Filter /FlateDecode"
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << %s >> >> /Contents %d 0 R >>"
            % (fontrefs, pnum + 1)
        )
        objects.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(stream), filt, stream)
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)
