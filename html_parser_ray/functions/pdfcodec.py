"""Minimal REAL PDF writer + layout parser (stdlib zlib + re only).

The layout branch of the extraction pipeline (ref: north-star "PDF/layout
parse for media_refs") needs an actual byte-level decode, like the PNG/WAV
work in ``functions.codecs``. PDF libraries are not in this container, so
this module implements the subset that matters for layout extraction over
real PDF bytes:

- ``encode_pdf``: serializes a correct PDF 1.4 file — catalog / page-tree /
  page objects, per-page content streams (optionally FlateDecode-compressed),
  a shared Type1 font resource, a byte-accurate xref table and trailer.
- ``parse_pdf``: a REAL parser, not an inverse of the writer: scans the
  object table, walks /Type /Page objects, locates their /Contents streams,
  zlib-inflates FlateDecode streams, and tokenizes the content operators —
  ``Td`` positioning, ``Tf`` font size, ``(…) Tj`` / ``[…] TJ`` text-show
  (with escape and octal handling), and ``re`` rectangle ops — into an
  ordered text + box layout.

``synth_pdf`` generates deterministic multi-page documents (seeded text
blocks and rectangles) standing in for a blob store: the FETCH is the
sandbox fake, the DECODE path is real bytes all the way down.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------- writer ---


def _esc(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def encode_pdf(pages: "list[dict]", compress: bool = True) -> bytes:
    """Serialize a real PDF. Each page dict: ``{"texts": [(x, y, size, str)],
    "rects": [(x, y, w, h)], "media_box": (w, h)}`` (rects/media_box
    optional)."""
    objs: list[bytes] = []  # bodies; object number = index + 1

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )  # 2
    for i, pg in enumerate(pages):
        mw, mh = pg.get("media_box", (612, 792))
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (mw, mh, content_num, font_num)
        )
        if "raw_stream" in pg:
            # pre-serialized content stream (bytes, is_flate) — the synth
            # blob store assembles documents from a cached template pool
            data, flate = pg["raw_stream"]
        else:
            ops: list[bytes] = []
            for x, y, size, txt in pg.get("texts", ()):
                ops.append(
                    b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
                    % (size, x, y, _esc(txt.encode("utf-8")))
                )
            for x, y, w, h in pg.get("rects", ()):
                ops.append(b"%d %d %d %d re S" % (x, y, w, h))
            content = b"\n".join(ops)
            data, flate = (zlib.compress(content), True) if compress else (content, False)
        if flate:
            objs.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
                + data
                + b"\nendstream"
            )
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n" % len(data)
                + data
                + b"\nendstream"
            )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # font

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the xref free head
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------- parser ---

_RE_OBJ = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)\bendobj", re.S)
_RE_CONTENTS_KEY = re.compile(rb"/Contents\b")
_RE_MEDIABOX = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_RE_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_RE_STREAM_START = re.compile(rb"\bstream\r?\n")
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)\b")
_PDF_STRING = rb"\((?:\\.|[^\\()])*\)"
_RE_TEXTOP = re.compile(
    rb"(?:([\d.+-]+)\s+([\d.+-]+)\s+Td)"
    rb"|(?:([\d.+-]+)\s+Tf)"
    rb"|(" + _PDF_STRING + rb")\s*Tj"
    rb"|\[((?:" + _PDF_STRING + rb"|[^\]])*)\]\s*TJ"
    rb"|(?:([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+re)"
)
_RE_STRING = re.compile(_PDF_STRING, re.S)
_RE_UNESCAPE = re.compile(rb"\\([0-7]{1,3}|.)", re.S)
_RE_PAGE = re.compile(rb"/Type\s*/Page\b(?!s)")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f"}


def _unescape(raw: bytes) -> bytes:
    if b"\\" not in raw:  # overwhelmingly common: nothing to unescape
        return raw

    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g[:1] in b"01234567" and g.isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESCAPES.get(g, g)

    return _RE_UNESCAPE.sub(sub, raw)


class PdfError(ValueError):
    pass


def _content_refs(body: bytes) -> "list[int]":
    """All ``/Contents`` stream refs of a page body, in document order.

    Handles BOTH encodings the PDF spec allows: the single-ref form
    ``/Contents N 0 R`` and the array form ``/Contents [N 0 R M 0 R]``.
    A ``/Contents`` key whose value parses as neither raises ``PdfError``
    so the gap is visible instead of silently emitting an empty page.
    (The native kernel declines-to-Python on the array form, keeping
    C/Python parity on what each path actually parses.)
    """
    refs: list[int] = []
    n = len(body)
    for km in _RE_CONTENTS_KEY.finditer(body):
        pos = km.end()
        while pos < n and body[pos] in b" \t\r\n":
            pos += 1
        if body[pos : pos + 1] == b"[":
            close = body.find(b"]", pos)
            if close < 0:
                raise PdfError("unterminated /Contents array")
            inner = [int(m.group(1)) for m in _RE_OBJREF.finditer(body, pos, close)]
            if not inner:
                raise PdfError("empty /Contents array")
            refs.extend(inner)
        else:
            m = _RE_OBJREF.match(body, pos)
            if m is None:
                raise PdfError("unparsable /Contents reference")
            refs.append(int(m.group(1)))
    return refs


_RE_XREF_SUB = re.compile(rb"[ \t\r\n]*(\d+)[ \t]+(\d+)[ \t]*\r?\n")
_RE_STARTXREF = re.compile(rb"startxref[ \t\r\n]+(\d+)")
_RE_ROOT = re.compile(rb"/Root[ \t\r\n]+(\d+)\s+0\s+R")
_RE_PAGES_REF = re.compile(rb"/Pages[ \t\r\n]+(\d+)\s+0\s+R")
_RE_KIDS = re.compile(rb"/Kids[ \t\r\n]*\[([^\]]*)\]")
_RE_OBJREF = re.compile(rb"(\d+)\s+0\s+R")
_RE_TYPE_PAGES = re.compile(rb"/Type\s*/Pages\b")


def _spans_via_xref(payload: bytes) -> "dict[int, tuple[int, int]] | None":
    """Real-reader object lookup: ``startxref`` -> xref table -> body spans.

    ~3x cheaper than the full-payload ``N 0 obj (.*?) endobj`` regex scan
    because only ``bytes.find`` runs per object; returns ``None`` on any
    structural surprise (no/odd xref, offset not at an object) so the caller
    falls back to the scan — damaged files keep working, they just pay the
    slow path like a real reader's reconstruction pass."""
    t = payload.rfind(b"startxref")
    if t < 0:
        return None
    m = _RE_STARTXREF.match(payload, t)
    if m is None:
        return None
    xa = int(m.group(1))
    if not payload.startswith(b"xref", xa):
        return None  # cross-reference STREAMS (PDF 1.5+) take the scan path
    spans: dict[int, tuple[int, int]] = {}
    pos = xa + 4
    while True:
        mh = _RE_XREF_SUB.match(payload, pos)
        if mh is None:
            break
        first, count = int(mh.group(1)), int(mh.group(2))
        pos = mh.end()
        for k in range(count):
            entry = payload[pos : pos + 20]
            if len(entry) < 18:
                return None
            pos += 20
            if entry[17:18] != b"n":
                continue  # free entry
            try:
                off = int(entry[:10])
            except ValueError:
                return None
            h = payload.find(b" obj", off, off + 24)
            if h < 0:
                return None
            e = payload.find(b"endobj", h)
            if e < 0:
                return None
            spans[first + k] = (h + 4, e)
    return spans or None


def _page_numbers_via_tree(
    payload: bytes, objects: "_LazyObjects", spans: dict
) -> "list[int] | None":
    """Walk trailer ``/Root`` -> catalog ``/Pages`` -> ``/Kids`` (depth-first,
    document order) — touching ONLY tree nodes, never probing content-stream
    bodies for ``/Type /Page``. ``None`` -> caller probes every object."""
    t = payload.rfind(b"trailer")
    rm = _RE_ROOT.search(payload, t if t >= 0 else 0)
    if rm is None:
        return None
    cat = objects.get(int(rm.group(1)))
    if cat is None:
        return None
    pm = _RE_PAGES_REF.search(cat)
    if pm is None:
        return None
    ordered: list[int] = []
    seen: set[int] = set()
    stack = [int(pm.group(1))]
    while stack:
        num = stack.pop()
        if num in seen or num not in spans:
            return None  # cycle or dangling kid: let the probe path decide
        seen.add(num)
        s, e = spans[num]
        if _RE_TYPE_PAGES.search(payload, s, min(e, s + 512)) is not None:
            km = _RE_KIDS.search(payload, s, e)
            if km is None:
                return None
            kids = [int(k.group(1)) for k in _RE_OBJREF.finditer(km.group(1))]
            stack.extend(reversed(kids))  # DFS keeps document order
        elif _RE_PAGE.search(payload, s, min(e, s + 512)) is not None:
            ordered.append(num)
        else:
            return None
    return ordered if ordered else None


class _LazyObjects:
    """Object-number -> body bytes, sliced from the payload on first access."""

    __slots__ = ("_payload", "_spans", "_cache")

    def __init__(self, payload: bytes, spans: dict[int, tuple[int, int]]):
        self._payload = payload
        self._spans = spans
        self._cache: dict[int, bytes] = {}

    def __getitem__(self, num: int) -> bytes:
        body = self._cache.get(num)
        if body is None:
            s, e = self._spans[num]
            body = self._cache[num] = self._payload[s:e]
        return body

    def get(self, num: int) -> "bytes | None":
        return self[num] if num in self._spans else None


def parse_pdf(payload: bytes) -> dict:
    """Parse layout from real PDF bytes: page count, media boxes, ordered
    text spans (x, y, size, text) and rectangle ops per page."""
    if not payload.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    # object lookup, fastest available first: (a) the xref table (bytes.find
    # per object, no payload-wide regex), else (b) the full `N 0 obj ...
    # endobj` scan. Either way a span table, not a bytes table: copying every
    # body up front measured ~30% of parse time; lazy slicing copies only
    # the bodies actually read (pages + their contents).
    spans = _spans_via_xref(payload)
    if spans is None:
        spans = {int(m.group(1)): m.span(2) for m in _RE_OBJ.finditer(payload)}
    if not spans:
        raise PdfError("no objects")
    objects = _LazyObjects(payload, spans)

    # page discovery, fastest first: walk /Root -> /Pages -> /Kids (document
    # order, touches only tree nodes), else probe EVERY object for
    # /Type /Page (reconstruction pass — content-stream bodies included)
    page_nums = _page_numbers_via_tree(payload, objects, spans)
    if page_nums is None:
        page_nums = [
            num
            for num in sorted(spans)
            if _RE_PAGE.search(payload, spans[num][0], spans[num][1]) is not None
        ]

    pages = []
    for num in page_nums:
        body = objects[num]
        texts: list[tuple[float, float, float, str]] = []
        rects: list[tuple[float, float, float, float]] = []
        mb = _RE_MEDIABOX.search(body)
        media_box = (
            (float(mb.group(3)) - float(mb.group(1)), float(mb.group(4)) - float(mb.group(2)))
            if mb
            else (612.0, 792.0)
        )
        for cnum in _content_refs(body):
            cobj = objects.get(cnum)
            if cobj is None:
                raise PdfError(f"missing content object {cnum}")
            # slice the stream by /Length, the way real PDF readers do —
            # binary stream data may END in 0x0D, which a `\r?\nendstream`
            # regex would wrongly eat (1/256 of Flate streams truncate)
            sm = _RE_STREAM_START.search(cobj)
            if sm is None:
                raise PdfError("content object without stream")
            lm = _RE_LENGTH.search(cobj[: sm.start()])
            if lm is not None:
                data = cobj[sm.end() : sm.end() + int(lm.group(1))]
            else:
                tail = _RE_STREAM.search(cobj, sm.start())
                if tail is None:
                    raise PdfError("unterminated stream")
                data = tail.group(1)
            if b"/FlateDecode" in cobj[: sm.start()]:
                try:
                    data = zlib.decompress(data)
                except zlib.error as e:  # corrupt stream
                    raise PdfError(f"bad FlateDecode stream: {e}") from e
            x = y = 0.0
            size = 0.0
            for m in _RE_TEXTOP.finditer(data):
                # lastindex names the alternative that matched: 2=Td, 3=Tf,
                # 4=Tj, 5=TJ, 9=re — one attribute read replaces up to five
                # per-group None probes in the hottest loop of the parser
                li = m.lastindex
                if li == 2:
                    x, y = float(m.group(1)), float(m.group(2))
                elif li == 3:
                    size = float(m.group(3))
                elif li == 4:
                    texts.append(
                        (x, y, size, _unescape(m.group(4)[1:-1]).decode("utf-8", "replace"))
                    )
                elif li == 5:
                    for s in _RE_STRING.finditer(m.group(5)):
                        texts.append(
                            (x, y, size, _unescape(s.group(0)[1:-1]).decode("utf-8", "replace"))
                        )
                else:
                    rects.append(
                        (
                            float(m.group(6)),
                            float(m.group(7)),
                            float(m.group(8)),
                            float(m.group(9)),
                        )
                    )
        pages.append(
            {"media_box": media_box, "texts": texts, "rects": rects}
        )
    if not pages:
        raise PdfError("no /Type /Page objects")
    return {
        "version": payload[5:8].decode("ascii", "replace"),
        "num_pages": len(pages),
        "pages": pages,
    }


# ------------------------------------------------------------- synthesis ---

_WORDS = (
    "layout page block heading body figure caption table row cell margin "
    "column footer header span text extract parse stream object"
).split()


_POOL: "list[tuple[bytes, bool]] | None" = None


def _content_pool() -> "list[tuple[bytes, bool]]":
    """256 deterministic content-stream templates (built once per process):
    seeded text blocks + rectangles, 70% FlateDecode / 30% raw so both parser
    paths stay exercised."""
    global _POOL
    if _POOL is None:
        import random

        pool: list[tuple[bytes, bool]] = []
        for t in range(256):
            rng = random.Random(f"pool-{t}")
            ops: list[bytes] = []
            y = 720
            for _ in range(rng.randint(2, 6)):
                words = " ".join(
                    rng.choice(_WORDS) for _ in range(rng.randint(3, 9))
                )
                ops.append(
                    b"BT /F1 %d Tf 72 %d Td (%s) Tj ET"
                    % (rng.choice([10, 12, 14, 18]), y, _esc(words.encode()))
                )
                y -= rng.randint(24, 48)
            for _ in range(rng.randint(0, 3)):
                ops.append(
                    b"%d %d %d %d re S"
                    % (
                        rng.randint(40, 400),
                        rng.randint(40, 600),
                        rng.randint(20, 180),
                        rng.randint(10, 120),
                    )
                )
            content = b"\n".join(ops)
            flate = (t % 10) < 7
            pool.append((zlib.compress(content) if flate else content, flate))
        _POOL = pool
    return _POOL


def synth_pdf(ref: str) -> bytes:
    """Deterministic PDF payload for a media ref — the blob-store stand-in
    (in production this is an object-store FETCH, i.e. I/O that overlaps
    compute under Ray's streaming executor, so the stand-in must be cheap:
    ~20 us of assembly from the cached template pool, not a fresh ~120 us
    zlib compression per ref). Page count and the per-page content templates
    are all derived from md5(ref), so payloads stay deterministic and
    distinct across refs while the DECODE path stays byte-real."""
    import hashlib

    d = hashlib.md5(ref.encode("utf-8")).digest()
    pool = _content_pool()
    n_pages = 1 + d[0] % 4
    pages: list[dict] = [
        {"raw_stream": pool[d[1 + i]]} for i in range(n_pages)
    ]
    return encode_pdf(pages)
